"""Curation: validate/inspect/standardize, schema flags, dtype checks
(reference can_curate.py, curators/core.py, base/dtypes.py)."""

import pytest
from pyspark.sql import functions as F

from lamindb_spark.curation.schema_check import SchemaSpec, check_dtypes, check_schema_columns
from lamindb_spark.curation.validate import inspect_values, standardize_values, validate_values
from lamindb_spark.sources.literals import literal_table


@pytest.fixture(scope="module")
def registry(spark):
    return literal_table(
        spark,
        [
            ("T cell", "T-cell|T lymphocyte"),
            ("B cell", "B-cell"),
            ("monocyte", None),
        ],
        ["name", "synonyms"],
    )


def test_validate_flags(spark, registry):
    values = literal_table(spark, [("T cell",), ("NK cell",)], ["value"])
    got = {r["value"]: r["validated"] for r in
           validate_values(values, registry, "value", "name").collect()}
    assert got == {"T cell": True, "NK cell": False}


def test_inspect_partition(spark, registry):
    values = literal_table(spark, [("T cell",), ("B cell",), ("NK cell",)], ["value"])
    ok, bad = inspect_values(values, registry, "value", "name")
    assert sorted(r["value"] for r in ok.collect()) == ["B cell", "T cell"]
    assert [r["value"] for r in bad.collect()] == ["NK cell"]


def test_standardize_synonyms(spark, registry):
    values = literal_table(
        spark, [("T-cell",), ("T lymphocyte",), ("B cell",), ("unknown",)], ["value"]
    )
    got = {r["value"]: r["standardized"] for r in
           standardize_values(values, registry, "value", "name", "synonyms").collect()}
    assert got == {
        "T-cell": "T cell",
        "T lymphocyte": "T cell",
        "B cell": "B cell",
        "unknown": "unknown",  # pass-through (reference default)
    }


def test_schema_column_flags(spark):
    df = literal_table(spark, [(1, "x", 0.5)], ["sample_id", "cell_type", "extra"])
    spec = SchemaSpec(
        features={"sample_id": "bigint", "cell_type": "string", "n_reads": "bigint"},
        minimal_set=True,
        maximal_set=True,
    )
    res = check_schema_columns(df, spec)
    assert res["missing"] == ["n_reads"]
    assert res["unexpected"] == ["extra"]


def test_schema_ordered_set(spark):
    df = literal_table(spark, [("x", 1)], ["cell_type", "sample_id"])
    spec = SchemaSpec(
        features={"sample_id": "bigint", "cell_type": "string"}, ordered_set=True
    )
    assert check_schema_columns(df, spec)["order_errors"] == ["cell_type", "sample_id"]


def test_dtype_violation_counts(spark):
    df = literal_table(
        spark,
        [("1", "0.5"), ("abc", "bad"), (None, "2.5"), ("7", None)],
        ["n_reads", "gc"],
    )
    spec = SchemaSpec(features={"n_reads": "bigint", "gc": "double"})
    assert check_dtypes(df, spec) == {"n_reads": 1, "gc": 1}


def test_from_values_get_or_create(lakehouse):
    from lamindb_spark.curation.validate import from_values

    lakehouse.save("ulabel", [{"name": "existing"}])
    out = from_values(lakehouse, "ulabel", ["existing", "new1", "new1", "new2"])
    names = {r["name"] for r in out.collect()}
    assert names == {"existing", "new1", "new2"}
    # idempotent: second call creates nothing new
    n_before = lakehouse.read("ulabel").count()
    from_values(lakehouse, "ulabel", ["new1", "new2"])
    assert lakehouse.read("ulabel").count() == n_before


def test_dataframe_curator_end_to_end(spark, registry, lakehouse):
    import json

    from lamindb_spark.curation.curator import (
        CategoricalSpec,
        CurationError,
        DataFrameCurator,
    )

    df = literal_table(
        spark,
        [(1, "T-cell", "0.5"), (2, "NK cell", "0.6"), (3, "B cell", "bad")],
        ["sample_id", "cell_type", "gc"],
    )
    spec = SchemaSpec(
        features={"sample_id": "bigint", "cell_type": "string", "gc": "double",
                  "batch": "string"},
        minimal_set=True,
        optional=set(),
    )
    cur = DataFrameCurator(
        df, spec,
        categoricals={"cell_type": CategoricalSpec(registry, "name", "synonyms")},
        defaults={"batch": "b0"},
    )
    rep = cur.validate()
    assert not rep["is_valid"]
    assert rep["columns"]["missing"] == ["batch"]
    assert rep["dtypes"] == {"gc": 1}
    assert rep["categoricals"] == {"cell_type": ["NK cell"]}  # synonyms validate

    # fix data, standardize (fills batch, maps T-cell -> T cell), then save
    fixed = literal_table(
        spark,
        [(1, "T-cell", 0.5), (2, "monocyte", 0.6)],
        ["sample_id", "cell_type", "gc"],
    )
    cur2 = DataFrameCurator(
        fixed, spec,
        categoricals={"cell_type": CategoricalSpec(registry, "name", "synonyms")},
        defaults={"batch": "b0"},
    ).standardize()
    assert cur2.validate()["is_valid"]
    vals = {r["cell_type"] for r in cur2.df.collect()}
    assert vals == {"T cell", "monocyte"}
    art = cur2.save_artifact(lakehouse, "curated/samples.parquet")
    ann = json.loads(lakehouse.describe_artifact("curated/samples.parquet"))["features"]
    assert sorted(ann["cell_type"]) == ["T cell", "monocyte"]

    import pytest as _pytest

    with _pytest.raises(CurationError):
        DataFrameCurator(df, spec).save_artifact(lakehouse, "nope.parquet")
