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
# Each entry carries the reviewed hit SIGNATURE (the sorted fact-table
# tuples of its hits): a NEW, different broadcast in a triaged query —
# more hits, or a different table — no longer matches and gets FLAGGED
# (review finding r15: name-only suppression would swallow regressions).
TRIAGED = {
    "ann_ivf": ("bounded-hint: 8 centroid rows (vec_id < 8)", [("embeddings",)]),
    "ann_lsh": ("bounded-hint: 1 query row (vec_id == 0)", [("embeddings",)]),
    "anti_join": ("aqe-adaptive: filtered lineitem keys, unhinted", [("lineitem",)]),
    "lsh_admission": ("aqe-adaptive: admitted-id set, unhinted", [("documents",)]),
    "rollup_revenue": ("aqe-adaptive: filtered orders side, unhinted", [("orders",)]),
    "semi_join": ("aqe-adaptive: filtered orders keys, unhinted", [("orders",)]),
    "span_novelty": ("aqe-adaptive: span-count side, unhinted", [("documents",)]),
    "star_revenue": (
        "aqe-adaptive: ASIA-filtered orders/lineitem pre-agg, unhinted "
        "(contract in the query docstring)",
        [("lineitem",), ("orders",)],
    ),
    "tpch_q3": ("aqe-adaptive", [("orders",)]),
    "tpch_q4": ("aqe-adaptive", [("lineitem",)]),
    "tpch_q5": ("aqe-adaptive", [("orders",)]),
    "tpch_q8": ("aqe-adaptive", [("orders",)]),
    "tpch_q10": ("aqe-adaptive", [("orders",)]),
    "tpch_q12": ("aqe-adaptive", [("orders",)]),
    "tpch_q13": ("aqe-adaptive", [("orders",)]),
    "tpch_q18": ("aqe-adaptive", [("orders",)]),
    "tpch_q21": ("aqe-adaptive", [("orders",)]),
    "tpch_q22": ("aqe-adaptive", [("orders",)]),
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
        # RAW lines: the audit's ancestor-path walk needs the tree
        # prefixes intact (stripping would flatten every depth to 0)
        sub = [line]
        for nxt in lines[i + 1 :]:
            if _depth(nxt) <= d:
                break
            sub.append(nxt)
        out.append(sub)
    return out


def _scan_reduced(sub_lines: list[str], scan_idx: int) -> bool:
    """True iff a reducer sits on the ANCESTOR PATH from the scan line
    up to the broadcast root — not merely anywhere in the subtree
    (review finding r15: a reduced dimension joined next to an
    unreduced fact scan must not excuse the fact side)."""
    bar = _depth(sub_lines[scan_idx])
    for j in range(scan_idx - 1, 0, -1):  # root (idx 0) is the exchange
        d = _depth(sub_lines[j])
        if d < bar:
            if any(r in sub_lines[j] for r in REDUCERS):
                return True
            bar = d
    return False


def audit_plan(plan: str) -> list[tuple[tuple[str, ...], str]]:
    """Hits as (sorted fact-table tuple, description) per offending
    BroadcastExchange in the FINAL plan section."""
    final = plan.split("Initial Plan")[0]
    flags = []
    for sub in broadcast_subtrees(final):
        # keep original (indented) lines for the path walk
        lines = sub
        hit_tables = set()
        for i, line in enumerate(lines):
            t = next(
                (t for t in FACT_TABLES if re.search(rf"FileScan parquet.*{t}", line)),
                None,
            )
            if t is not None and not _scan_reduced(lines, i):
                hit_tables.add(t)
        if hit_tables:
            sig = tuple(sorted(hit_tables))
            flags.append(
                (sig, f"broadcasts unreduced {sorted(hit_tables)} side: "
                      f"{lines[0].strip()[:90]}")
            )
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
        sig = sorted(s for s, _d in hits)
        expected = sorted(TRIAGED.get(name, (None, []))[1])
        if hits and sig == expected:
            triaged += 1
        elif hits:
            flagged[name] = [d for _s, d in hits]
            print(f"FLAG {name}: {flagged[name]}", file=sys.stderr, flush=True)
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
