"""Skew study for the r13 stratified_rank rewrite (VERDICT r12 #1):
one stratum holds 90% of the rows — the realistic pretraining-corpus
shape (one web-crawl source or one language dominating) that breaks
``Window.partitionBy(stratum)``.

Measures, on a synthetic N-row frame with a 90% stratum:
  * the OLD per-stratum window form of stratified sampling
    (row_number + count over Window.partitionBy) — every dominant-
    stratum row sorts through ONE task;
  * the NEW stratified_rank form (range shuffle on (stratum, md5, id)
    + (pid, stratum) cell offsets) — the dominant stratum spreads
    across all range partitions;
plus the partition spread of the dominant stratum under each plan and
a result-equality check (the rewrite must be bit-identical).

Usage: python scripts/skew_study.py [n_rows] → one JSON line.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import Window
from pyspark.sql import functions as F

from lamindb_spark.session import get_spark


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 4_000_000
    spark = get_spark("skew-study")
    spark.conf.set("spark.sql.shuffle.partitions", "32")

    # 90% 'web', remainder spread over 9 small sources
    df = (
        spark.range(n)
        .select(
            F.col("id").alias("doc_id"),
            F.when(F.col("id") % 10 != 0, F.lit("web"))
            .otherwise(F.concat(F.lit("s"), (F.col("id") % 9).cast("string")))
            .alias("source"),
        )
        .repartition(32)
    )
    df = df.localCheckpoint()  # isolate generation cost from the measurement

    h = F.md5(F.concat(F.col("doc_id").cast("string")))
    frac = F.lit(0.2)

    def old_window(d):
        w = Window.partitionBy("source").orderBy(h, F.col("doc_id"))
        wc = Window.partitionBy("source")
        return (
            d.withColumn("__rn", F.row_number().over(w))
            .withColumn("__n", F.count(F.lit(1)).over(wc))
            .filter(F.col("__rn") <= F.ceil(F.col("__n") * frac))
            .drop("__rn", "__n")
        )

    def new_rank(d):
        from lamindb_spark.pipeline.rules import stratified_sample

        return stratified_sample(d, "source", 0.2)

    out = {"n_rows": n, "dominant_share": 0.9}

    # partition spread of the dominant stratum under each exchange
    spread_old = (
        df.repartition(32, F.col("source"))
        .withColumn("pid", F.spark_partition_id())
        .filter(F.col("source") == "web")
        .select("pid")
        .distinct()
        .count()
    )
    spread_new = (
        df.repartitionByRange(32, F.col("source"), h, F.col("doc_id"))
        .withColumn("pid", F.spark_partition_id())
        .filter(F.col("source") == "web")
        .select("pid")
        .distinct()
        .count()
    )
    out["dominant_stratum_partitions"] = {"window": spread_old, "ranked": spread_new}

    for label, fn in [("window", old_window), ("ranked", new_rank)]:
        times = []
        for _ in range(3):
            t = time.time()
            cnt = fn(df).count()
            times.append(round(time.time() - t, 3))
        out[f"{label}_sec"] = min(times)
        out[f"{label}_rows"] = cnt

    # equality: identical selected sets
    a = old_window(df).select("doc_id")
    b = new_rank(df).select("doc_id")
    out["selected_sets_equal"] = (
        a.exceptAll(b).limit(1).count() == 0 and b.exceptAll(a).limit(1).count() == 0
    )
    print(json.dumps(out))


if __name__ == "__main__":
    main()
