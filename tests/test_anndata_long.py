"""AnnData-style long-form matrix: slice / pseudobulk / dense / normalize."""

from pyspark.sql import functions as F

from lamindb_spark.sources.anndata_long import AnnDataLong, from_dense
from lamindb_spark.sources.literals import literal_table


def _adata(spark):
    wide = literal_table(
        spark,
        [("c1", "a", 1.0, 0.0), ("c2", "a", 2.0, 3.0), ("c3", "b", 0.0, 4.0)],
        ["cell", "cond", "g1", "g2"],
    )
    ad = from_dense(wide, "cell", ["g1", "g2"])
    obs = wide.select(F.col("cell").alias("obs_id"), "cond")
    return AnnDataLong(obs, ad.var, ad.x)


def test_from_dense_sparse_x(spark):
    ad = _adata(spark)
    entries = {(r["obs_id"], r["var_id"]): r["value"] for r in ad.x.collect()}
    assert entries == {("c1", "g1"): 1.0, ("c2", "g1"): 2.0, ("c2", "g2"): 3.0, ("c3", "g2"): 4.0}


def test_slice_semi_joins(spark):
    ad = _adata(spark)
    sub = ad.slice(obs_filter=F.col("cond") == "a", var_filter=F.col("var_id") == "g1")
    assert sorted(r["obs_id"] for r in sub.obs.collect()) == ["c1", "c2"]
    assert {(r["obs_id"], r["var_id"]) for r in sub.x.collect()} == {("c1", "g1"), ("c2", "g1")}


def test_pseudobulk(spark):
    ad = _adata(spark)
    pb = {(r["cond"], r["var_id"]): r["sum_value"] for r in ad.pseudobulk("cond").collect()}
    assert pb == {("a", "g1"): 3.0, ("a", "g2"): 3.0, ("b", "g2"): 4.0}


def test_to_dense_round_trip(spark):
    ad = _adata(spark)
    dense = {r["obs_id"]: (r["g1"], r["g2"]) for r in ad.to_dense(["g1", "g2"]).collect()}
    assert dense == {"c1": (1.0, 0.0), "c2": (2.0, 3.0), "c3": (0.0, 4.0)}


def test_normalize_per_obs(spark):
    ad = _adata(spark).normalize_per_obs(target=10.0)
    vals = {(r["obs_id"], r["var_id"]): r["value"] for r in ad.x.collect()}
    assert vals[("c2", "g1")] == 4.0 and vals[("c2", "g2")] == 6.0  # 2/5*10, 3/5*10
    assert vals[("c1", "g1")] == 10.0
