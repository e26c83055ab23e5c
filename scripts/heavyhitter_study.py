"""Heavy-hitter study for the r13 content-key window sweep: a corpus
where one boilerplate span occurs in a large share of documents — the
shape C4-style dedup actually meets (its most common 3-sentence span
occurs in a double-digit share of pages) — comparing the OLD
window-form operators (reconstructed inline) against the shipped
groupBy forms.

Measures, on an N-doc synthetic corpus where ``share`` of documents
embed the same boilerplate sentence (plus unique filler):

- span ELECTION (dedup_token_spans' kernel): row_number window over
  the span text vs min-struct groupBy + join;
- span COUNT (span_novelty's kernel): count window vs groupBy-count +
  join;
plus the partition spread of the hottest span under each exchange and
result-equality checks.

Usage: python scripts/heavyhitter_study.py [n_docs] [share] → one JSON
line.
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
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 2_000_000
    share = float(sys.argv[2]) if len(sys.argv) > 2 else 0.3
    spark = get_spark("heavyhitter-study")
    spark.conf.set("spark.sql.shuffle.partitions", "32")
    # emulate the at-scale regime at toy data size: production
    # partitions run ~hundreds of MB, so a hot key exceeding the 256 MB
    # skew threshold is the NORMAL trigger; at study size the same
    # geometry needs proportionally smaller thresholds for AQE's
    # OptimizeSkewedJoin to engage (this is the mechanism the groupBy
    # forms buy — the window form has no counterpart at any threshold)
    spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "8m")
    spark.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "4m")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "1m")

    hot = int(1 / share)
    # every doc contributes one span; every hot-th doc contributes THE
    # boilerplate span, the rest are unique — (id, seg_idx, seg) is the
    # exact shape _dedup_reassemble sees after _token_spans
    segs = (
        spark.range(n)
        .select(
            F.col("id").alias("doc_id"),
            F.lit(0).alias("seg_idx"),
            F.when(
                F.col("id") % hot == 0,
                F.lit("click here to subscribe to our newsletter today"),
            )
            .otherwise(F.concat(F.lit("unique content "), F.col("id").cast("string")))
            .alias("seg"),
        )
        .repartition(32)
    )
    segs = segs.localCheckpoint()

    def window_election(d):
        w = Window.partitionBy("seg").orderBy(F.asc("doc_id"), F.asc("seg_idx"))
        return d.select(
            "doc_id", "seg_idx", "seg", (F.row_number().over(w) == 1).alias("keep")
        )

    def groupby_election(d):
        winners = d.groupBy("seg").agg(
            F.min(F.struct(F.col("doc_id").alias("i"), F.col("seg_idx").alias("x"))).alias("w")
        )
        return d.join(winners, "seg").select(
            "doc_id",
            "seg_idx",
            "seg",
            ((F.col("w.i") == F.col("doc_id")) & (F.col("w.x") == F.col("seg_idx"))).alias("keep"),
        )

    def window_count(d):
        w = Window.partitionBy("seg")
        return d.select("doc_id", (F.count(F.lit(1)).over(w) == 1).alias("uniq"))

    def groupby_count(d):
        occ = d.groupBy("seg").agg(F.count(F.lit(1)).alias("occ"))
        return d.join(occ, "seg").select("doc_id", (F.col("occ") == 1).alias("uniq"))

    out = {"n_docs": n, "hot_share": share}
    spread = {}
    for label, dd in [
        ("window", segs.repartition(32, F.col("seg"))),
    ]:
        spread[label] = (
            dd.withColumn("pid", F.spark_partition_id())
            .filter(F.col("seg").startswith("click here"))
            .select("pid")
            .distinct()
            .count()
        )
    out["hot_span_partitions_window"] = spread["window"]

    for label, fn in [
        ("election_window", window_election),
        ("election_groupby", groupby_election),
        ("count_window", window_count),
        ("count_groupby", groupby_count),
    ]:
        times = []
        for _ in range(3):
            t = time.time()
            fn(segs).filter(~F.col(fn(segs).columns[-1])).count()
            times.append(round(time.time() - t, 3))
        out[f"{label}_sec"] = min(times)

    # equality: identical elected/unique sets
    a = window_election(segs).filter("keep").select("doc_id", "seg_idx")
    b = groupby_election(segs).filter("keep").select("doc_id", "seg_idx")
    out["election_equal"] = (
        a.exceptAll(b).limit(1).count() == 0 and b.exceptAll(a).limit(1).count() == 0
    )
    c = window_count(segs).filter("uniq").select("doc_id")
    d = groupby_count(segs).filter("uniq").select("doc_id")
    out["count_equal"] = (
        c.exceptAll(d).limit(1).count() == 0 and d.exceptAll(c).limit(1).count() == 0
    )
    print(json.dumps(out))


if __name__ == "__main__":
    main()
