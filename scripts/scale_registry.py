"""Registry-side scale evidence (VERDICT r7 #7): time the §2.10 wide
registry-pivot kernel (``wide_customer_export`` — 2-hop broadcast dim
chain + to-many list agg + status pivot, one row per entity) at
1×/10×/120× of sf0.1's customer/orders tables.

Replication preserves the FK structure: each replica shifts
``c_custkey``/``o_custkey``/``o_orderkey`` by a disjoint offset, so
the per-customer aggregation fan-in (orders per customer) stays
constant while the entity count scales — the registry growth mode
(more entities, same per-entity annotation density). Dims
(nation/region) stay fixed, as they do in any real registry.

Expected shape: the kernel is two entity-keyed shuffles (list agg,
pivot agg) + broadcast dim join — time should scale ~linearly with
entity count, with no plan change (the broadcast stays a broadcast,
the pivot's agg state is 3 counters per entity).

Usage: python scripts/scale_registry.py [sf_dir] [scratch] [mults]
-> one JSON line. ``mults`` is a comma list (default "1,10,120";
round-12 extension runs "1,1000" for the 1000× point).
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from lamindb_spark.operators.pivot import wide_customer_export
from lamindb_spark.session import get_spark
from lamindb_spark.sources.readers import load_table
from scripts.scale_dedup import best_of

SHIFT = 10_000_000


def _replicate_keyed(df, key_cols: list[str], mult: int, out_dir: str):
    """Union ``mult`` copies with each replica's keys shifted into a
    disjoint range — FK edges inside a replica stay intact."""
    if not os.path.exists(os.path.join(out_dir, "_SUCCESS")):
        copies = [
            df.select(
                *[
                    (F.col(c) + F.lit(i * SHIFT)).alias(c)
                    if c in key_cols
                    else F.col(c)
                    for c in df.columns
                ]
            )
            for i in range(mult)
        ]
        big = copies[0]
        for c in copies[1:]:
            big = big.unionByName(c)
        big.write.mode("overwrite").parquet(out_dir)
    return df.sparkSession.read.parquet(out_dir)


def main() -> None:
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    scratch = sys.argv[2] if len(sys.argv) > 2 else "/root/repo/.scratch"
    spark = get_spark("scale-registry")
    c1 = load_table(spark, sf, "customer")
    o1 = load_table(spark, sf, "orders")
    n = load_table(spark, sf, "nation")
    r = load_table(spark, sf, "region")

    mults = (
        tuple(int(x) for x in sys.argv[3].split(","))
        if len(sys.argv) > 3
        else (1, 10, 120)
    )
    out: dict[str, dict] = {}
    for mult in mults:
        if mult == 1:
            c, o = c1, o1
        else:
            c = _replicate_keyed(
                c1, ["c_custkey"], mult, os.path.join(scratch, f"cust_x{mult}")
            )
            o = _replicate_keyed(
                o1,
                ["o_custkey", "o_orderkey"],
                mult,
                os.path.join(scratch, f"orders_x{mult}"),
            )
        wide = wide_customer_export(c, n, r, o)
        # xxhash64 over every output column forces the full kernel —
        # count() alone would let Catalyst prune the pivot aggregates
        t = best_of(
            2,
            lambda w=wide: w.select(
                F.sum(F.xxhash64(*w.columns).cast("decimal(38,0)")).alias("h")
            ).collect(),
        )
        out[f"x{mult}"] = {"rows": c.count(), "wide_export_sec": t}
        print(f"# x{mult}: {out[f'x{mult}']}", file=sys.stderr)
    print(json.dumps({"kernel": "wide_customer_export", "sf": sf, "scale": out}))


if __name__ == "__main__":
    main()
