"""Round-16 same-session alternating A/Bs for the two r15 wins whose
book readings moved the wrong way (VERDICT r15 item 1): the
slot-verdict tagged-union fold (`slot_validate`) and the range-input
pin (`ppl_buckets`).

Methodology (host-epoch rules): ONE Spark session, legs alternate
within each trial so a host stall cannot land on one leg
systematically; each leg times the FULL query — plan build +
toPandas materialization, the bench's timed action — not a noop sink
(the judge's requirement: slot_validate's build dominates).
Checkpoints released + heaps collected between runs, same as bench.py.

Legs are toggled by monkeypatching the module under test inside the
process (the pre-fold verdict_frame is inlined below verbatim from
commit 8791251^), so both formulations run against the same JVM and
the same parquet cache state.

Usage: python scripts/ab_r16.py [slot_validate|ppl_buckets|...] [n_trials]
"""

from __future__ import annotations

import gc
import os
import sys
import time
from contextlib import contextmanager

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

import __spark_entry__ as entrymod
from lamindb_spark.session import get_spark, release_checkpoints

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def _prefold_verdict_frame(self) -> DataFrame:
    """verbatim pre-S8 SlotsCurator.verdict_frame (8791251^)."""
    from lamindb_spark.curation.validate import synonym_map

    parts: list[DataFrame] = []
    for slot, cur in self._slots.items():
        for col, cspec in cur.categoricals.items():
            if col not in cur.df.columns:
                continue
            domain = cspec.registry.select(
                F.col(cspec.field).cast("string").alias("__v")
            ).distinct()
            if cspec.synonyms_field:
                domain = domain.unionByName(
                    synonym_map(
                        cspec.registry, cspec.field, cspec.synonyms_field
                    ).select(F.col("__syn").cast("string").alias("__v"))
                ).distinct()
            bad = (
                cur.df.select(F.col(col).cast("string").alias("__v"))
                .filter(F.col("__v").isNotNull())
                .distinct()
                .join(F.broadcast(domain), "__v", "left_anti")
                .select(
                    F.lit(slot).alias("slot"),
                    F.lit(col).alias("column"),
                    F.col("__v").alias("invalid_value"),
                )
            )
            parts.append(bad)
    if not parts:
        spark = next(iter(self._slots.values())).df.sparkSession
        return spark.createDataFrame(
            [], "slot string, column string, invalid_value string"
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


@contextmanager
def leg_current():
    yield


@contextmanager
def leg_prefold_verdict():
    from lamindb_spark.curation import slots as slotsmod

    orig = slotsmod.SlotsCurator.verdict_frame
    slotsmod.SlotsCurator.verdict_frame = _prefold_verdict_frame
    try:
        yield
    finally:
        slotsmod.SlotsCurator.verdict_frame = orig


@contextmanager
def leg_no_range_pin():
    from lamindb_spark.operators import prefix as prefixmod

    orig = prefixmod._pin_range_input
    prefixmod._pin_range_input = lambda df: df
    try:
        yield
    finally:
        prefixmod._pin_range_input = orig


@contextmanager
def leg_no_span_pin():
    from lamindb_spark.pipeline import corpus as corpusmod

    orig = corpusmod._pin_span_frame
    corpusmod._pin_span_frame = lambda frame, source: frame
    try:
        yield
    finally:
        corpusmod._pin_span_frame = orig


@contextmanager
def leg_no_pins():
    with leg_no_range_pin(), leg_no_span_pin():
        yield


@contextmanager
def leg_logreg_distributed():
    """Force the pre-r16 distributed GD loop (checkpoint + count + one
    agg job per iteration)."""
    from lamindb_spark.pipeline import classifier as clsmod

    orig = clsmod.train_logreg

    def forced(feats, **kw):
        kw["local_max_docs"] = None
        return orig(feats, **kw)

    clsmod.train_logreg = forced
    try:
        yield
    finally:
        clsmod.train_logreg = orig


@contextmanager
def leg_cold_cache():
    """Empty the fingerprint-keyed model cache so the leg measures the
    COLD path (training included) — the driver's cold map is where
    logreg_weights costs 7 s."""
    from lamindb_spark.pipeline import similarity as simmod

    saved = dict(simmod._MODEL_CACHE)
    simmod._MODEL_CACHE.clear()
    try:
        yield
    finally:
        simmod._MODEL_CACHE.clear()
        simmod._MODEL_CACHE.update(saved)


@contextmanager
def leg_logreg_local_cold():
    with leg_cold_cache():
        yield


@contextmanager
def leg_logreg_dist_cold():
    with leg_cold_cache(), leg_logreg_distributed():
        yield


LEGS = {
    "slot_validate": [("fold", leg_current), ("prefold", leg_prefold_verdict)],
    "logreg_weights": [
        ("local_cold", leg_logreg_local_cold),
        ("dist_cold", leg_logreg_dist_cold),
    ],
    "ppl_buckets": [
        ("current", leg_current),
        ("norangepin", leg_no_range_pin),
        ("nospanpin", leg_no_span_pin),
        ("nopins", leg_no_pins),
    ],
    "curated_packing": [("pin", leg_current), ("nopin", leg_no_range_pin)],
}


def main() -> None:
    qname = sys.argv[1] if len(sys.argv) > 1 else "slot_validate"
    n_trials = int(sys.argv[2]) if len(sys.argv) > 2 else 4
    legs = LEGS[qname]
    spark = get_spark("lamindb-spark-ab-r16")
    spark.conf.set("spark.sql.execution.arrow.pyspark.enabled", "true")
    qs = entrymod.queries()
    qs["tpch_q1"](spark, SF_DIR).collect()  # warmup
    tracker = spark.sparkContext.statusTracker()
    jvm_gc = spark.sparkContext._jvm.System.gc

    fn = qs[qname]
    results: dict[str, list[float]] = {name: [] for name, _ in legs}
    jobs: dict[str, int] = {}
    rows: dict[str, int] = {}
    for t in range(n_trials):
        order = legs if t % 2 == 0 else list(reversed(legs))
        for name, ctx in order:
            release_checkpoints(spark)
            gc.collect()
            jvm_gc()
            with ctx():
                j0 = len(tracker.getJobIdsForGroup(None) or [])
                t0 = time.time()
                df = fn(spark, SF_DIR)
                n = len(df.toPandas())
                dt = time.time() - t0
                j1 = len(tracker.getJobIdsForGroup(None) or [])
            results[name].append(round(dt, 3))
            jobs[name] = j1 - j0
            rows[name] = n
            print(f"trial {t} {name}: {dt:.3f}s ({j1 - j0} jobs, {n} rows)", flush=True)
    print("---")
    for name, vals in results.items():
        print(
            f"{qname}/{name}: min {min(vals):.3f}s  all {vals}  "
            f"jobs {jobs[name]}  rows {rows[name]}"
        )
    spark.stop()


if __name__ == "__main__":
    main()
