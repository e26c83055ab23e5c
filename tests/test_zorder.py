"""Z-order clustered writes: the skipping property is verified straight
from the parquet footers — per-file min/max spreads must be tight on
EVERY z-ordered dimension, against a single-column-sort baseline that
is tight on one dimension and useless on the other."""

import glob

import pyarrow.parquet as pq
from pyspark.sql import functions as F

from lamindb_spark.sources.readers import load_table
from lamindb_spark.sources.zorder import with_zorder_key, write_zordered

SF = "/root/testdata/sf0.01"


def _file_spans(path: str, col: str) -> list[tuple[float, float]]:
    spans = []
    for f in sorted(glob.glob(f"{path}/*.parquet")):
        md = pq.ParquetFile(f).metadata
        lo, hi = None, None
        for rg in range(md.num_row_groups):
            for ci in range(md.num_columns):
                c = md.row_group(rg).column(ci)
                if c.path_in_schema == col and c.statistics is not None:
                    v0, v1 = c.statistics.min, c.statistics.max
                    lo = v0 if lo is None else min(lo, v0)
                    hi = v1 if hi is None else max(hi, v1)
        spans.append((float(lo), float(hi)))
    return spans


def _skip_fraction(spans, lo, hi, point) -> float:
    """Fraction of files a point predicate can skip via min/max stats."""
    hit = sum(1 for a, b in spans if a <= point <= b)
    return 1.0 - hit / len(spans)


def test_zorder_skips_on_both_dimensions(spark, tmp_path):
    ev = load_table(spark, SF, "events").select(
        "user_id", F.col("value").cast("double").alias("value")
    )
    zpath = str(tmp_path / "z")
    spath = str(tmp_path / "s")
    write_zordered(ev, zpath, ["user_id", "value"], n_files=16)
    # baseline: classic single-column sort layout
    (
        ev.repartitionByRange(16, "user_id")
        .sortWithinPartitions("user_id")
        .write.mode("overwrite")
        .parquet(spath)
    )
    stats = ev.agg(
        F.min("user_id"), F.max("user_id"), F.min("value"), F.max("value")
    ).first()
    umid = (stats[0] + stats[1]) / 2
    vmid = (stats[2] + stats[3]) / 2

    z_user = _skip_fraction(_file_spans(zpath, "user_id"), stats[0], stats[1], umid)
    z_val = _skip_fraction(_file_spans(zpath, "value"), stats[2], stats[3], vmid)
    s_user = _skip_fraction(_file_spans(spath, "user_id"), stats[0], stats[1], umid)
    s_val = _skip_fraction(_file_spans(spath, "value"), stats[2], stats[3], vmid)

    # single-sort: perfect on its own column, near-none on the other
    assert s_user >= 0.8
    assert s_val <= 0.2
    # z-order: substantial skipping on BOTH columns
    assert z_user >= 0.5, f"z-order user_id skip {z_user}"
    assert z_val >= 0.5, f"z-order value skip {z_val}"


def test_zorder_key_is_pure_codegen(spark):
    ev = load_table(spark, SF, "events").select("user_id", "value")
    keyed = with_zorder_key(ev, ["user_id", "value"], bits=8)
    plan = keyed._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan
    # one scalar stats agg broadcast back; no wide shuffle of the data
    assert plan.count("hashpartitioning") == 0


def test_zorder_null_and_constant_columns(spark):
    rows = [(1, None), (2, 5.0), (3, 5.0)]
    df = spark.createDataFrame(rows, "a long, b double")
    out = with_zorder_key(df, ["a", "b"], bits=4).collect()
    # nulls and zero-span columns quantize to rank 0 without error
    assert len(out) == 3
    keys = {r["a"]: r["__zkey"] for r in out}
    assert keys[1] >= 0
