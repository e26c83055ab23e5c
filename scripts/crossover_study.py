"""Engine-vs-engine crossover study for the fixture-ratio-weak set
(VERDICT r13 performance table): run each weak query's Spark callable
AND its DuckDB oracle SQL on the SAME data at 1x (sf0.1) and 10x,
best-of-2 each, and book the per-query ratio at both scales.

Why: the seven queries are flagged "weak" on the per-query ratio
criterion at sf0.1 — multi-stage shapes whose fixed job overhead
dominates at fixture scale. The r14 suite sweep showed their Spark
curves are sub-linear in data; this study closes the argument by
measuring the RATIO's trajectory: if the sf0.1 ratio is an overhead
artifact, it must shrink toward (or cross below) 1 as data grows,
because DuckDB's cost grows with work while Spark's fixed floor
amortizes. A ratio that GREW at 10x would instead indicate a real
plan problem — the study reports either outcome honestly.

Data: the r14 scale_suite generators (near-dup document families,
rotated embeddings, fresh event id ranges) — cached under
``.scratch/suite10x``; DuckDB reads the exact same parquet through
glob views (Spark-written directories) / file views (symlinks).

Usage: python scripts/crossover_study.py [sf_dir] [scratch] [mult]
[queries] → one JSON line; per-query progress on stderr.
"""

from __future__ import annotations

import gc
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb

import __spark_entry__ as entrymod
from lamindb_spark.session import get_spark, release_checkpoints
from lamindb_spark.sources.readers import TESTDATA_TABLES
from scripts.scale_suite import WEAK, build_scaled_dir


def duck_connect(sf_dir: str) -> "duckdb.DuckDBPyConnection":
    con = duckdb.connect()
    for t in TESTDATA_TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        # Spark-written tables are DIRECTORIES of part files; testdata
        # tables and symlinks are single files. Same rows either way.
        src = f"'{p}/*.parquet'" if os.path.isdir(p) else f"'{p}'"
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet({src})")
    con.execute("SELECT count(*) FROM documents")  # warm file cache
    return con


def time_duck(con, sql: str, runs: int = 2) -> tuple[float, int]:
    best, rows = float("inf"), 0
    for _ in range(runs):
        t0 = time.time()
        rows = len(con.execute(sql).df())
        best = min(best, time.time() - t0)
    return round(best, 3), rows


def time_spark(spark, fn, sf_dir: str, runs: int = 2) -> tuple[float, int]:
    best, rows = float("inf"), 0
    for _ in range(runs):
        release_checkpoints(spark)
        gc.collect()
        t0 = time.time()
        rows = len(fn(spark, sf_dir).toPandas())
        best = min(best, time.time() - t0)
    return round(best, 3), rows


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    scratch = sys.argv[2] if len(sys.argv) > 2 else "/root/repo/.scratch"
    mult = int(sys.argv[3]) if len(sys.argv) > 3 else 10
    wanted = sys.argv[4].split(",") if len(sys.argv) > 4 else list(WEAK)

    spark = get_spark("crossover-study")
    spark.conf.set("spark.sql.execution.arrow.pyspark.enabled", "true")
    queries, oracles = entrymod.queries(), entrymod.oracle_sql()
    names = [n for n in wanted if n in queries and n in oracles]
    skipped = [n for n in wanted if n not in names]
    if skipped:
        print(f"skipping (no query/oracle): {skipped}", file=sys.stderr)

    big_dir = build_scaled_dir(spark, sf_dir, scratch, mult)
    queries["tpch_q1"](spark, sf_dir).collect()  # session warmup

    out: dict[str, dict] = {}
    for name in names:
        row: dict = {}
        for label, d in (("1x", sf_dir), (f"{mult}x", big_dir)):
            s_t, s_rows = time_spark(spark, queries[name], d)
            con = duck_connect(d)
            d_t, d_rows = time_duck(con, oracles[name])
            con.close()
            if s_rows != d_rows:
                raise SystemExit(
                    f"{name}@{label}: row mismatch spark={s_rows} duck={d_rows}"
                )
            row[label] = {
                "spark_s": s_t,
                "duck_s": d_t,
                # sub-ms DuckDB times round to 0.0 — clamp instead of
                # None (a None ratio poisons the summary comparisons)
                "ratio": round(s_t / max(d_t, 0.001), 2),
                "rows": s_rows,
            }
        print(f"{name}: {row}", file=sys.stderr, flush=True)
        out[name] = row

    shrunk = sum(
        1 for r in out.values() if r[f"{mult}x"]["ratio"] < r["1x"]["ratio"]
    )
    crossed = sum(1 for r in out.values() if r[f"{mult}x"]["ratio"] <= 1.0)
    print(
        json.dumps(
            {
                "metric": "weak_set_crossover",
                "mult": mult,
                "n": len(out),
                "ratio_shrunk": shrunk,
                "crossed_below_1": crossed,
                "queries": out,
            }
        )
    )


if __name__ == "__main__":
    main()
