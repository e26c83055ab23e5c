"""DuckDB reference timings for BASELINE.md: run every ``oracle_sql()``
statement over the same parquet at sf0.1 (best-of-2, warm), print one
JSON line mirroring bench.py's shape so the two are directly
comparable.

Usage: python scripts/bench_duckdb.py [sf_dir]
"""

from __future__ import annotations

import json
import sys
import time

sys.path.insert(0, "/root/repo")

import duckdb

import __spark_entry__ as entrymod
from lamindb_spark.sources.readers import TESTDATA_TABLES


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    con = duckdb.connect()
    for t in TESTDATA_TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    oracles = entrymod.oracle_sql()
    con.execute("SELECT count(*) FROM lineitem")  # warm file cache
    times: dict[str, float] = {}
    for name, sql in oracles.items():
        best = float("inf")
        for _ in range(2):
            t0 = time.time()
            con.execute(sql).df()
            best = min(best, time.time() - t0)
        times[name] = round(best, 3)
    print(
        json.dumps(
            {
                "metric": "duckdb_oracle_suite_seconds",
                "value": round(sum(times.values()), 2),
                "unit": "sec",
                "queries": times,
                "sf": sf_dir,
            }
        )
    )


if __name__ == "__main__":
    main()
