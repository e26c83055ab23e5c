"""Regression pins for the round-9 targeted review of the query /
curation / lineage layer — third review batch (first: commit protocol,
`test_review_fixes_r9.py`; second: registry+sink,
`test_review_fixes_r9b.py`). One test per finding."""

import json

import pytest
from pyspark.sql import functions as F

from lamindb_spark.catalog.lakehouse import Lakehouse
from lamindb_spark.catalog.query import DoesNotExist, QuerySet
from lamindb_spark.operators.filters import Q


@pytest.fixture()
def lake(spark, tmp_path):
    lh = Lakehouse(spark, str(tmp_path / "lake"))
    for i, key in enumerate(["a.csv", "b.csv", "c.csv"]):
        p = tmp_path / key
        p.write_text(f"x\n{i}\n")
        lh.register_artifact(str(p), key=key, description=f"art{i}")
    return lh


def test_exclude_identity_lookup_does_not_leak_trash(lake):
    """exclude(uid=...) must keep the default branch visibility: the
    identity bypass exists for POSITIVE lookups; inverting the matched
    set previously exposed trash/foreign-branch rows."""
    arts = {r["key"]: r for r in lake.read_raw("artifact").collect()}
    lake.delete("artifact", [arts["c.csv"]["id"]])  # soft -> trash
    out = {
        r["key"]
        for r in QuerySet(lake, "artifact").exclude(uid=arts["a.csv"]["uid"])._df
        .select("key")
        .collect()
    }
    assert "c.csv" not in out  # trashed row must stay invisible
    assert out == {"b.csv"}


def test_q_identity_lookup_gets_branch_bypass_like_kwargs(spark, tmp_path):
    """filter(Q(uid=...)) must see all branches exactly like
    filter(uid=...) — the two forms previously diverged."""
    root = str(tmp_path / "lake")
    other = Lakehouse(spark, root, current_branch_id=3)
    p = tmp_path / "d.csv"
    p.write_text("x\n1\n")
    row = other.register_artifact(str(p), key="d.csv")
    mine = Lakehouse(spark, root, current_branch_id=2)
    kw = QuerySet(mine, "artifact").filter(uid=row["uid"])._df.count()
    qf = QuerySet(mine, "artifact").filter(Q(uid=row["uid"]))._df.count()
    assert kw == qf == 1


def test_q_object_applies_field_aliases(lake):
    """Q(version='1') must resolve through the alias map exactly like
    the kwargs form (previously: UNRESOLVED_COLUMN at action time)."""
    uid = lake.read_raw("artifact").first()["uid"]
    lake.save("artifact", [{"uid": uid, "version_tag": "1"}])
    kw = QuerySet(lake, "artifact").filter(version="1")._df.count()
    qf = QuerySet(lake, "artifact").filter(Q(version="1"))._df.count()
    assert kw == qf == 1


def test_q_object_relation_path_fails_fast_with_guidance(lake):
    with pytest.raises(ValueError, match="keyword lookup"):
        QuerySet(lake, "artifact").filter(Q(run__transform__key="x"))
    with pytest.raises(ValueError, match="Feature predicate"):
        QuerySet(lake, "artifact").filter(Q(features__gc=1))


def test_get_respects_chain_filters(lake):
    """qs.filter(...).get(uid) must apply the chain's filters — a
    fresh-QuerySet get previously matched outside them."""
    row = lake.read("artifact").filter(F.col("key") == "a.csv").first()
    hit = QuerySet(lake, "artifact").filter(key="a.csv").get(row["uid"])
    assert hit["key"] == "a.csv"
    with pytest.raises(DoesNotExist):
        QuerySet(lake, "artifact").filter(key="b.csv").get(row["uid"])


def test_standardize_values_never_fans_out_rows(spark):
    """Two registry rows claiming the same synonym: the standardize
    join must stay 1:1 (deterministic canonical winner), not duplicate
    every matching data row."""
    from lamindb_spark.curation.validate import standardize_values

    registry = spark.createDataFrame(
        [("CD4 T cell", "T cell"), ("CD8 T cell", "T cell")],
        ["name", "synonyms"],
    )
    values = spark.createDataFrame([("T cell",), ("other",)], ["value"])
    out = standardize_values(values, registry, "value", "name", "synonyms")
    assert out.count() == 2  # no fanout
    got = {r["value"]: r["standardized"] for r in out.collect()}
    assert got["T cell"] == "CD4 T cell"  # min(name), deterministic
    assert got["other"] == "other"


def test_from_values_ignores_none_and_is_idempotent(lake):
    from lamindb_spark.curation.validate import from_values

    from_values(lake, "ulabel", ["x", None, "y"])
    n1 = lake.read_raw("ulabel").count()
    from_values(lake, "ulabel", ["x", None, "y"])
    assert lake.read_raw("ulabel").count() == n1  # no null-row churn
    assert (
        lake.read_raw("ulabel").filter(F.col("name").isNull()).count() == 0
    )


def test_nested_tracked_runs_restore_outer_context(lake, tmp_path):
    """Finishing an inner tracked run must restore the OUTER run as
    current (previously reset to None: the outer run lost its input
    edges and stamped run_id=None on outputs), and the inner run
    records its initiator."""
    from lamindb_spark.lineage.context import Context

    outer = Context(lake).track("outer.py", source_code="o")
    outer_id = lake.current_run_id
    inner = Context(lake).track("inner.py", source_code="i")
    assert inner.run["initiated_by_run_id"] == outer_id
    inner.finish()
    assert lake.current_run_id == outer_id  # restored, not None
    # outputs registered now carry the OUTER run id
    p = tmp_path / "out.csv"
    p.write_text("x\n777\n")  # unique bytes: hash-dedup must miss
    row = lake.register_artifact(str(p), key="out.csv")
    assert row["run_id"] == outer_id
    outer.finish()
    assert lake.current_run_id is None


def test_curated_annotations_match_eav_filters(spark, tmp_path):
    """save_artifact writes per-value CANONICAL annotation rows, so the
    documented features__<col>=<canonical> filter finds the artifact
    (previously: one JSON-array row with raw synonyms — unreachable)."""
    from lamindb_spark.curation.curator import CategoricalSpec, DataFrameCurator
    from lamindb_spark.curation.schema_check import SchemaSpec

    lh = Lakehouse(spark, str(tmp_path / "lake"))
    registry = spark.createDataFrame(
        [("T cell", "t-cell"), ("monocyte", "")], ["name", "synonyms"]
    )
    df = spark.createDataFrame(
        [("s1", "t-cell"), ("s2", "monocyte")], ["sample", "cell_type"]
    )
    spec = SchemaSpec(features={"sample": "string", "cell_type": "string"})
    cur = DataFrameCurator(
        df,
        spec,
        categoricals={"cell_type": CategoricalSpec(registry, "name", "synonyms")},
    )
    assert cur.validate()["is_valid"]  # synonyms validate (lenient, pinned)
    art = cur.save_artifact(lh, "curated/x.parquet")
    hits = QuerySet(lh, "artifact").filter(features__cell_type="T cell")._df
    assert [r["id"] for r in hits.collect()] == [art["id"]]
    # and describe folds the scalar rows back into a list
    ann = json.loads(lh.describe_artifact("curated/x.parquet"))["features"]
    assert sorted(ann["cell_type"]) == ["T cell", "monocyte"]
