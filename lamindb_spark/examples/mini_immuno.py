"""The "mini immuno" tutorial datasets — the engine analogue of the
reference's ``examples/datasets/mini_immuno.py`` (``get_dataset1``
``:66-146``, ``get_dataset2`` ``:148-189``), its feature/label
definition script (``define_mini_immuno_features_labels.py``) and the
two-dataset ingest script (``save_mini_immuno_datasets.py``).

Engine-shape divergences, both deliberate:

- the datasets come back as SPARK DataFrames (or the engine's
  :class:`AnnDataLong` for ``otype="AnnData"``); a Spark DataFrame
  carries no ``.attrs``, so the dataset-level metadata the reference
  hangs there is returned as an explicit second tuple element;
- bionty registries (``bt.CellType``, ``bt.ExperimentalFactor``,
  ``bt.Ethnicity``) are out of scope (declared SURVEY §2 boundary) —
  cell types become a typed ULabel family with the same names and
  synonyms, exactly the ``examples/cellxgene.py`` treatment.

Every reference toggle that injects a validation defect
(``with_typo``, ``with_cell_type_synonym`` …) is carried, because the
toggles ARE the point: the datasets exist to exercise curation."""

from __future__ import annotations

from typing import Any

from pyspark.sql import functions as F

MINI_IMMUNO_FEATURE_TYPE = "mini_immuno"

_ENSEMBL = ["ENSG00000153563", "ENSG00000010610", "ENSG00000170458"]
_SYMBOLS = ["CD8A", "CD4", "CD14"]
_ENSEMBL2 = ["ENSG00000153563", "ENSG00000010610", "ENSG00000004468"]
_SYMBOLS2 = ["CD8A", "CD4", "CD38"]


def _var_ids1(gene_symbols_in_index, with_gene_typo, with_outdated_gene):
    # Deliberate divergence from the reference's chained ternary
    # (mini_immuno/_core.py): there with_outdated_gene only takes
    # effect when with_gene_typo is ALSO set (and then wins over the
    # typo) — almost certainly a bug in the chain's precedence. Here
    # each toggle works standalone and the typo wins when both are
    # set, matching the toggles' documented intent.
    ids = list(_SYMBOLS) if gene_symbols_in_index else list(_ENSEMBL)
    if with_gene_typo:
        ids[2] = "GeneTypo"
    elif with_outdated_gene and not gene_symbols_in_index:
        ids[2] = "ENSG00000278198"
    return ids


def get_dataset1(
    spark,
    otype: str = "DataFrame",
    gene_symbols_in_index: bool = False,
    with_typo: bool = False,
    with_cell_type_synonym: bool = False,
    with_cell_type_typo: bool = False,
    with_gene_typo: bool = False,
    with_outdated_gene: bool = False,
    with_wrong_subtype: bool = False,
):
    """A small tabular dataset measuring expression & metadata
    (reference ``mini_immuno.get_dataset1``). Returns
    ``(dataset, metadata)`` — a wide Spark DataFrame (one gene column
    per measured gene + observation metadata) or an ``AnnDataLong``
    for ``otype="AnnData"`` (which drops ``donor_ethnicity``, exactly
    as the reference drops it before building the AnnData)."""
    ifng = "IFNJ" if with_typo else "IFNG"
    thing = "ulabel_but_not_perturbation" if with_wrong_subtype else "DMSO"
    var_ids = _var_ids1(gene_symbols_in_index, with_gene_typo, with_outdated_gene)
    abt = (
        "CD8-pos alpha-beta T cell"
        if with_cell_type_typo
        else "CD8-positive, alpha-beta T cell"
    )
    b_cell = "B-cell" if with_cell_type_synonym else "B cell"
    rows = [
        ("sample1", 1.0, 3.0, 5.0, "DMSO", "was ok", b_cell, "B cell",
         "EFO:0008913", "0.1%", 24, "D0001", ["Chinese", "Singaporean Chinese"]),
        ("sample2", 2.0, 4.0, 6.0, ifng, "looks naah", abt, "T cell",
         "EFO:0008913", "200 nM", 24, "D0002", ["Chinese", "Han Chinese"]),
        ("sample3", 3.0, 5.0, 7.0, thing, "pretty! 🤩", abt, "T cell",
         "EFO:0008913", "0.1%", 6, None, ["Chinese"]),
    ]
    cols = (
        ["sample_id"] + var_ids
        + ["perturbation", "sample_note", "cell_type_by_expert",
           "cell_type_by_model", "assay_oid", "concentration",
           "treatment_time_h", "donor", "donor_ethnicity"]
    )
    df = spark.createDataFrame(
        rows,
        "sample_id string, g1 double, g2 double, g3 double, "
        "perturbation string, sample_note string, cell_type_by_expert string, "
        "cell_type_by_model string, assay_oid string, concentration string, "
        "treatment_time_h long, donor string, donor_ethnicity array<string>",
    ).toDF(*cols)
    metadata: dict[str, Any] = {
        "temperature": 21.6,
        "experiment": "Experiment 1",
        "date_of_study": "2024-12-01",
        "study_note": (
            "We had a great time performing this study and the results "
            "look compelling."
        ),
    }
    if otype == "DataFrame":
        return df, metadata
    return _to_anndata_long(df, var_ids), metadata


def get_dataset2(spark, otype: str = "DataFrame", gene_symbols_in_index: bool = False):
    """The second mini immuno dataset (reference ``get_dataset2``)."""
    var_ids = list(_SYMBOLS2) if gene_symbols_in_index else list(_ENSEMBL2)
    rows = [
        ("sample4", 2.0, 3.0, 4.0, "DMSO", "B cell", "0.1%", 24, "D0003"),
        ("sample5", 3.0, 4.0, 2.0, "IFNG", "T cell", "200 nM", 24, "D0003"),
        ("sample6", 3.0, 5.0, 3.0, "IFNG", "T cell", "0.1%", 6, "D0004"),
    ]
    cols = (
        ["sample_id"] + var_ids
        + ["perturbation", "cell_type_by_model", "concentration",
           "treatment_time_h", "donor"]
    )
    df = spark.createDataFrame(
        rows,
        "sample_id string, g1 double, g2 double, g3 double, "
        "perturbation string, cell_type_by_model string, concentration string, "
        "treatment_time_h long, donor string",
    ).toDF(*cols)
    metadata: dict[str, Any] = {
        "temperature": 22.6,
        "experiment": "Experiment 2",
        "date_of_study": "2025-02-13",
    }
    if otype == "DataFrame":
        return df, metadata
    return _to_anndata_long(df, var_ids), metadata


def _to_anndata_long(df, var_ids):
    """Wide (sample × gene+metadata) → the engine's long-form
    annotated matrix: obs keeps the metadata columns (minus list-typed
    ``donor_ethnicity``, like the reference's AnnData build), var is
    the gene list, X melts the gene columns to (obs_id, var_id,
    value)."""
    from ..sources.anndata_long import AnnDataLong

    meta_cols = [
        c for c in df.columns
        if c not in var_ids and c not in ("sample_id", "donor_ethnicity")
    ]
    obs = df.select(F.col("sample_id").alias("obs_id"), *meta_cols)
    var = df.sparkSession.createDataFrame(
        [(v,) for v in var_ids], "var_id string"
    )
    x = df.select(
        F.col("sample_id").alias("obs_id"),
        F.explode(
            F.array(*[
                F.struct(F.lit(v).alias("var_id"), F.col(v).alias("value"))
                for v in var_ids
            ])
        ).alias("p"),
    ).select("obs_id", "p.var_id", "p.value")
    return AnnDataLong(obs=obs, var=var, x=x)


def define_features_labels(lh) -> dict:
    """Labels + features validating the mini immuno datasets
    (reference ``define_mini_immuno_features_labels.py``): a
    ``Perturbation`` Record type with DMSO/IFNG members, a
    ``CellType`` ULabel family (bionty stand-in, with the reference's
    synonyms), and the ``mini_immuno`` feature family. Idempotent.
    Returns {feature name: feature row}."""
    # perturbation labels: typed records, like ln.Record(type=...)
    ptype = lh.read("record").filter(
        (F.col("name") == "Perturbation") & F.col("is_type")
    ).first()
    if ptype is None:
        ptype = lh.save("record", [{"name": "Perturbation", "is_type": True}])[0]
    scoped = {
        r["name"]
        for r in lh.read("record")
        .filter(F.col("type_id") == ptype["id"])
        .select("name")
        .collect()
    }
    missing = [n for n in ("DMSO", "IFNG") if n not in scoped]
    if missing:
        lh.save(
            "record", [{"name": n, "type_id": ptype["id"]} for n in missing]
        )
    # cell types: typed ULabel family with reference synonyms
    ctype = lh.read("ulabel").filter(
        (F.col("name") == "CellType") & F.col("is_type")
    ).first()
    if ctype is None:
        ctype = lh.save("ulabel", [{"name": "CellType", "is_type": True}])[0]
    members = {
        "B cell": "B-cell|B lymphocyte",
        "T cell": "T-cell|T lymphocyte",
        "CD8-positive, alpha-beta T cell": "CD8-pos alpha-beta T cell",
    }
    present = {
        r["name"]
        for r in lh.read("ulabel")
        .filter(F.col("type_id") == ctype["id"])
        .select("name")
        .collect()
    }
    adds = [
        {"name": n, "type_id": ctype["id"], "synonyms": syn}
        for n, syn in members.items()
        if n not in present
    ]
    if adds:
        lh.save("ulabel", adds)
    # the feature family (dtype strings in the reference vocabulary),
    # via the shared typed-family helper
    from .trackers import _save_feature_family

    obs_features = {
        "perturbation": "cat[Record[Perturbation]]",
        "sample_note": "str",
        "cell_type_by_expert": "cat[ULabel[CellType]]",
        "cell_type_by_model": "cat[ULabel[CellType]]",
        "assay_oid": "str",
        "concentration": "str",
        "treatment_time_h": "num",
        "donor": "str",
        "donor_ethnicity": "list[str]",
    }
    dataset_features = {
        "temperature": "float",
        "experiment": "cat[Record]",
        "date_of_study": "date",
        "study_note": "str",
        "study_metadata": "dict",
    }
    return _save_feature_family(
        lh, MINI_IMMUNO_FEATURE_TYPE, {**obs_features, **dataset_features}
    )


def define_mini_immuno_schema_flexible(lh) -> dict:
    """The flexible mini immuno schema (reference
    ``define_mini_immuno_schema_flexible.py``: ``Schema(name="Mini
    immuno schema", features=[...], flexible=True)``) — required
    columns ``perturbation``/``cell_type_by_expert``/
    ``cell_type_by_model``/``assay_oid``/``donor``, extra columns
    allowed. Idempotent by schema-name upsert."""
    define_features_labels(lh)
    from ..curation.slots import save_feature_schema

    existing = lh.read("schema").filter(
        F.col("name") == "Mini immuno schema"
    ).first()
    if existing is not None:
        return existing.asDict()
    row = save_feature_schema(
        lh,
        "Mini immuno schema",
        {
            "perturbation": "cat[Record[Perturbation]]",
            "cell_type_by_expert": "cat[ULabel[CellType]]",
            "cell_type_by_model": "cat[ULabel[CellType]]",
            "assay_oid": "str",
            "donor": "str",
        },
        maximal_set=False,  # flexible: undeclared columns pass
    )
    row = dict(row)
    row["flexible"] = True
    return lh.save("schema", [row])[0]


def save_mini_immuno_datasets(lh, spark) -> tuple[dict, dict]:
    """Ingest both datasets as schema-validated artifacts with their
    dataset-level metadata as queryable feature values (reference
    ``save_mini_immuno_datasets.py``). Returns the two artifact rows."""
    feats = define_features_labels(lh)
    schema = define_mini_immuno_schema_flexible(lh)
    from ..curation.validate import from_values

    from_values(lh, "record", ["Experiment 1", "Experiment 2"], field="name")
    out = []
    for i, (ds, meta) in enumerate(
        (get_dataset1(spark), get_dataset2(spark)), start=1
    ):
        detail = {"detail1": "123" if i == 1 else "456", "detail2": i}
        art = lh.save_dataframe(
            ds, f"examples/dataset{i}.parquet", schema_id=schema["id"]
        )
        values = {**meta, "study_metadata": detail}
        lh.deannotate("artifact", [art["id"]], list(values))
        lh.annotate(
            "artifact",
            art["id"],
            values,
            feature_ids={n: f["id"] for n, f in feats.items() if n in values},
        )
        out.append(art)
    return out[0], out[1]
