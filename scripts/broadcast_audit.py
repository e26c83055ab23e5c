"""Broadcast-side audit (r15, generalizes the tfidf_keywords find):
at fixture scale a corpus-sized join side can slip under the 64 MB
autoBroadcastJoinThreshold and get BROADCAST in the executed plan —
a plan that works at sf0.1 and dies at 100 TB. The correctness gates
cannot see this (values identical either way), and the shuffle-count
ceilings only bound totals.

For every suite query this script walks the FINAL executed plan (the
pre-`Initial Plan` section of the AQE string) and flags each
BroadcastExchange whose subtree scans a FACT table (documents /
embeddings / events / lineitem / orders — the tables that grow with
the data) with NO aggregation, limit, or top-k between the scan and
the broadcast. Aggregated subtrees are fine: their output is
group-bounded (vocab/model/dimension-sized), which is exactly the
deliberate broadcast contract used across the engine.

Triage contract (r15 sweep, booked in SCALE.md): a hit is REAL only
when the broadcast is (a) an explicit ``F.broadcast`` hint on an
unreduced, unbounded fact frame (hints are obeyed at any size), or
(b) a runtime choice where a better bounded side exists (the
tfidf_keywords find — fixed r15). AQE runtime promotions of a
filtered fact side are adaptive by design: at real scale the same
decision re-runs against real sizes and demotes to a shuffle join
(see _q_star_revenue's docstring for the written contract). The
``TRIAGED`` map below records the swept, reviewed hits so re-runs
only surface NEW ones.

Usage: python scripts/broadcast_audit.py [sf_dir] [queries...]
→ one JSON line {flagged: {query: [subtree head, ...]}, clean: N,
triaged: N}.
"""

from __future__ import annotations

import json
import re
import sys

sys.path.insert(0, "/root/repo")

import __spark_entry__ as entrymod
from lamindb_spark.session import get_spark, release_checkpoints

FACT_TABLES = ("documents", "embeddings", "events", "lineitem", "orders")

# Reviewed hits (r15 sweep at sf0.001): query -> reason the broadcast
# is sound at 100 TB. Two classes:
#   bounded-hint  — explicit F.broadcast on a frame a selective point/
#                   range filter bounds (1 query vector, 8 centroids)
#   aqe-adaptive  — NO hint in the code; AQE promoted the (filtered)
#                   side because it measured small THIS run, and
#                   re-decides from real sizes at every scale
TRIAGED = {
    "ann_ivf": "bounded-hint: 8 centroid rows (vec_id < 8)",
    "ann_lsh": "bounded-hint: 1 query row (vec_id == 0)",
    "anti_join": "aqe-adaptive: filtered lineitem keys, unhinted",
    "lsh_admission": "aqe-adaptive: admitted-id set, unhinted",
    "rollup_revenue": "aqe-adaptive: filtered orders side, unhinted",
    "semi_join": "aqe-adaptive: filtered orders keys, unhinted",
    "span_novelty": "aqe-adaptive: span-count side, unhinted",
    "star_revenue": "aqe-adaptive: ASIA-filtered orders/lineitem "
    "pre-agg, unhinted (contract in the query docstring)",
    "tpch_q3": "aqe-adaptive", "tpch_q4": "aqe-adaptive",
    "tpch_q5": "aqe-adaptive", "tpch_q8": "aqe-adaptive",
    "tpch_q10": "aqe-adaptive", "tpch_q12": "aqe-adaptive",
    "tpch_q13": "aqe-adaptive", "tpch_q18": "aqe-adaptive",
    "tpch_q21": "aqe-adaptive", "tpch_q22": "aqe-adaptive",
}
REDUCERS = (
    "HashAggregate",
    "SortAggregate",
    "ObjectHashAggregate",
    "TakeOrderedAndProject",
    "GlobalLimit",
    "CollectLimit",
    "WindowGroupLimit",
)


def _depth(line: str) -> int:
    """Tree depth in Spark's plan toString: each level contributes a
    3-char ':  ' / '+- ' / '   ' prefix cell before the node name."""
    m = re.match(r"^((?::  |\+- |   |:- )*)", line)
    return len(m.group(1)) // 3


def broadcast_subtrees(plan: str) -> list[list[str]]:
    lines = [l for l in plan.splitlines() if l.strip()]
    out = []
    for i, line in enumerate(lines):
        if "BroadcastExchange" not in line:
            continue
        d = _depth(line)
        sub = [line.strip()]
        for nxt in lines[i + 1 :]:
            if _depth(nxt) <= d:
                break
            sub.append(nxt.strip())
        out.append(sub)
    return out


def audit_plan(plan: str) -> list[str]:
    final = plan.split("Initial Plan")[0]
    flags = []
    for sub in broadcast_subtrees(final):
        body = "\n".join(sub)
        scans = [t for t in FACT_TABLES if re.search(rf"FileScan parquet.*{t}", body)]
        if not scans:
            continue
        # reduced before broadcast? any aggregate/limit node in the
        # subtree between exchange and scan bounds the output
        if any(r in body for r in REDUCERS):
            continue
        flags.append(f"broadcasts unreduced {scans} side: {sub[0][:90]}")
    return flags


def main() -> None:
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    names = sys.argv[2:] or sorted(entrymod.queries())
    spark = get_spark("broadcast-audit")
    queries = entrymod.queries()
    flagged: dict[str, list[str]] = {}
    clean = triaged = 0
    for name in names:
        try:
            df = queries[name](spark, sf)
            df.collect()
            plan = df._jdf.queryExecution().executedPlan().toString()
        except Exception as e:  # noqa: BLE001 — audit keeps going
            flagged[name] = [f"AUDIT ERROR: {e}"[:200]]
            continue
        hits = audit_plan(plan)
        if hits and name in TRIAGED:
            triaged += 1
        elif hits:
            flagged[name] = hits
            print(f"FLAG {name}: {hits}", file=sys.stderr, flush=True)
        else:
            clean += 1
        release_checkpoints(spark)
    print(
        json.dumps(
            {
                "metric": "broadcast_audit",
                "clean": clean,
                "triaged": triaged,
                "flagged": flagged,
            }
        )
    )


if __name__ == "__main__":
    main()
