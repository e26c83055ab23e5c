"""Record "sheets": schema-ordered wide export of dynamic records.

Reference: ``Record.to_dataframe`` / ``RecordSet.to_dataframe``
(``record.py:1144-1204``, ``artifact_set.py:143-322``) — records of a
dynamic type render as a sheet whose columns follow the type's Schema
feature order, values come from the per-record EAV rows, missing
schema columns appear typed-empty, and per-feature dtypes are applied.

Spark shape: EAV pivot with an explicit feature list (no
distinct-values job), per-feature `cast` from the JSON value column,
typed-null literals for absent features — one lazy plan end to end.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# lamin dtype string (SURVEY §1.2) → Spark cast target
_DTYPE_TO_SPARK = {
    "int": "long",
    "num": "double",
    "float": "double",
    "str": "string",
    "bool": "boolean",
    "datetime": "timestamp_ntz",
    "date": "date",
    "dict": "string",
    "object": "string",
    "path": "string",
    "url": "string",
}


def spark_dtype(dtype_str: str | None) -> str:
    if not dtype_str:
        return "string"
    base = dtype_str.split("[", 1)[0]
    if dtype_str.startswith("list["):
        inner = dtype_str[5:-1]
        return f"array<{_DTYPE_TO_SPARK.get(inner, 'string')}>"
    if base == "cat":
        return "string"
    return _DTYPE_TO_SPARK.get(base, "string")


def schema_feature_specs(lh, schema_id: int) -> list[tuple[str, str]]:
    """Ordered (feature_name, spark_dtype) members of a Schema."""
    bridge = lh.read_raw("schema_features").filter(F.col("schema_id") == schema_id)
    feats = lh.read_raw("feature")
    rows = (
        bridge.join(feats, bridge.feature_id == feats.id)
        .orderBy("feature_id")
        .select("name", "dtype_str")
        .collect()
    )
    return [(r["name"], spark_dtype(r["dtype_str"])) for r in rows]


def record_sheet(lh, type_name: str) -> DataFrame:
    """All records of dynamic type ``type_name`` as a wide sheet.

    Columns: ``id, name`` + the type's schema features in declared
    order (typed; missing features are typed-null). Records' EAV
    values pivot wide with a fixed feature list.
    """
    recs = lh.read("record")
    trow = recs.filter((F.col("name") == type_name) & F.col("is_type")).first()
    if trow is None:
        raise KeyError(f"no record type {type_name!r}")
    members = recs.filter(F.col("type_id") == trow["id"]).select("id", "name")
    specs = schema_feature_specs(lh, trow["schema_id"]) if trow["schema_id"] else []
    feature_names = [n for n, _ in specs]
    ann = lh.read_raw("annotation").filter(
        (F.col("entity_kind") == "record") & F.col("feature_name").isin(feature_names)
    )
    wide = (
        ann.groupBy("entity_id")
        .pivot("feature_name", feature_names)
        .agg(F.first(F.get_json_object(F.col("value_json"), "$"), ignorenulls=True))
        if feature_names
        else None
    )
    out = members
    if wide is not None:
        out = members.join(wide, members.id == wide.entity_id, "left").drop("entity_id")
    for fname, dtype in specs:
        col = F.col(fname) if fname in out.columns else F.lit(None)
        out = out.withColumn(fname, col.cast(dtype))
    return out.select("id", "name", *feature_names)
