"""Claim-vs-measured ledger backing (VERDICT r04 #7 / r03 #2).

Every performance claim that ever appeared in a commit message or
docstring of the dedup family, re-measured in ISOLATION against the
formulation it claimed to beat, on the sf0.1 documents table,
best-of-3 full materializations (count()) per variant.

Usage: python scripts/claims_bench.py [sf_dir]  → one JSON line.
The numbers land in SCALE.md's ledger table.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from lamindb_spark.session import get_spark
from lamindb_spark.sources.readers import load_table


def best_of(n, fn):
    runs = []
    for _ in range(n):
        t0 = time.time()
        fn()
        runs.append(time.time() - t0)
    return round(min(runs), 3)


def main() -> None:
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    spark = get_spark("claims-bench")
    docs = load_table(spark, sf, "documents")
    out = {}

    # ---- claim r4: hash-chain shingles "~10x cheaper" than string
    # concat shingles (dedup.py _shingle_hash_rows docstring)
    k = 3

    def shingle_hash():
        from lamindb_spark.pipeline.dedup import _shingle_hash_rows

        _shingle_hash_rows(docs, "text", "doc_id", k).count()

    def shingle_string():
        # the pre-r4 formulation: materialize k-token substrings, hash those
        base = docs.selectExpr(
            "doc_id", "split(lower(trim(coalesce(text, ''))), '\\\\s+') AS __t"
        )
        sh = (
            f"transform(sequence(1, greatest(size(__t) - {k - 1}, 1)), "
            f"i -> xxhash64(concat_ws(' ', slice(__t, i, {k}))))"
        )
        base.selectExpr("doc_id", f"explode(array_distinct({sh})) AS sh").count()

    out["shingle_hash_chain"] = best_of(3, shingle_hash)
    out["shingle_string_concat"] = best_of(3, shingle_string)

    # ---- claim r4: ngram C(k,2) pair expansion via chained explode
    # generators "~1.6x" faster than the HOF transform/slice variant
    from lamindb_spark.pipeline.dedup import _shingle_hash_rows

    sh_rows = _shingle_hash_rows(docs, "text", "doc_id", 3).localCheckpoint()
    grouped = (
        sh_rows.groupBy("sh")
        .agg(F.sort_array(F.collect_list("doc_id")).alias("ids"))
        .filter((F.size("ids") >= 2) & (F.size("ids") <= 100))
        .localCheckpoint()
    )

    def pairs_explode():
        (
            grouped.selectExpr("explode(ids) AS id_a", "ids")
            .selectExpr("id_a", "explode(ids) AS id_b")
            .filter(F.col("id_a") < F.col("id_b"))
            .groupBy("id_a", "id_b")
            .count()
            .count()
        )

    def pairs_hof():
        (
            grouped.selectExpr(
                "inline(flatten(transform(ids, (a, i) -> "
                "transform(slice(ids, i + 2, size(ids)), b -> struct(a AS id_a, b AS id_b)))))"
            )
            .groupBy("id_a", "id_b")
            .count()
            .count()
        )

    out["ngram_pairs_chained_explode"] = best_of(3, pairs_explode)
    out["ngram_pairs_hof"] = best_of(3, pairs_hof)

    # ---- claim r3 (REFUTED r3): 4-per-long packed simhash counters
    # "~30% faster" than 64 separate ±1-sum aggregates
    from lamindb_spark.pipeline.dedup import simhash_signatures

    def simhash_packed():
        simhash_signatures(docs).count()

    def simhash_unpacked():
        base = docs.selectExpr(
            "doc_id",
            "explode(slice(array_distinct(split(lower(trim(coalesce(text, ''))), "
            "'\\\\s+')), 1, 65535)) AS __t",
        ).selectExpr("doc_id", "xxhash64(__t, 0) AS __h")
        sums = base.groupBy("doc_id").agg(
            F.count(F.lit(1)).alias("__n"),
            *[
                F.expr(f"sum(shiftright(__h, {i}) & 1) AS b{i}")
                for i in range(64)
            ],
        )
        sig = " + ".join(
            f"shiftleft(cast(b{i} * 2 > __n AS long), {i})" for i in range(64)
        )
        sums.selectExpr("doc_id", f"({sig}) AS simhash").count()

    out["simhash_packed_16"] = best_of(3, simhash_packed)
    out["simhash_unpacked_64"] = best_of(3, simhash_unpacked)

    # ---- claim r4: SQL-string expression assembly kills ~2.5 s of
    # py4j plan-build per 64-hash minhash invocation (plan BUILD only)
    def minhash_build_sqlstring():
        from lamindb_spark.pipeline.dedup import minhash_signatures

        minhash_signatures(docs).schema  # force analysis, no execution

    def minhash_build_column_api():
        base = docs.select(
            "doc_id",
            F.transform(
                F.split(F.lower(F.trim(F.coalesce(F.col("text"), F.lit("")))), "\\s+"),
                lambda t: F.xxhash64(t),
            ).alias("__th"),
        )
        sh = F.col("__th")
        for j in range(1, 3):
            sh = F.zip_with(
                sh,
                F.slice(F.col("__th"), j + 1, F.greatest(F.size("__th") - j, F.lit(0))),
                lambda a, b: F.xxhash64(a, b),
            )
        rows = base.select(
            "doc_id",
            F.explode(
                F.slice(sh, 1, F.greatest(F.size("__th") - 2, F.lit(1)))
            ).alias("__h"),
        )
        rows.groupBy("doc_id").agg(
            F.array(*[F.min(F.xxhash64("__h", F.lit(i))) for i in range(64)]).alias(
                "signature"
            )
        ).schema

    out["minhash_planbuild_sqlstring"] = best_of(3, minhash_build_sqlstring)
    out["minhash_planbuild_column_api"] = best_of(3, minhash_build_column_api)

    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
