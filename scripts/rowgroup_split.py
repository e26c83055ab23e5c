"""Rewrite an sf test-data directory with N parquet row groups per table.

Controlled experiment for the single-row-group scan-serialization claim
in BASELINE.md: the driver's sf0.1 fixtures are one row group per file,
and parquet is only splittable at row-group boundaries, so every Spark
scan stage is single-threaded by fixture construction. This rewrites
the same data as ~N row groups per file (identical rows, identical
schema — TIMESTAMP(NANOS) preserved via parquet version 2.6) so both
engines can be re-benchmarked on a splittable layout.

Usage: python scripts/rowgroup_split.py SRC_DIR DST_DIR [N]
"""

from __future__ import annotations

import math
import os
import sys

import pyarrow.parquet as pq


def split_dir(src: str, dst: str, n_groups: int = 32) -> None:
    os.makedirs(dst, exist_ok=True)
    for fname in sorted(os.listdir(src)):
        if not fname.endswith(".parquet"):
            continue
        table = pq.read_table(os.path.join(src, fname))
        rg = max(1, math.ceil(table.num_rows / n_groups))
        pq.write_table(
            table,
            os.path.join(dst, fname),
            row_group_size=rg,
            version="2.6",  # keeps TIMESTAMP(NANOS) physical type
        )
        meta = pq.ParquetFile(os.path.join(dst, fname)).metadata
        print(f"{fname}: {meta.num_rows} rows -> {meta.num_row_groups} row groups")


if __name__ == "__main__":
    src = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    dst = sys.argv[2] if len(sys.argv) > 2 else "/root/repo/.scratch/sf0.1_rg32"
    n = int(sys.argv[3]) if len(sys.argv) > 3 else 32
    split_dir(src, dst, n)
