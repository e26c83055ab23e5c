"""Unit tests for scripts/broadcast_audit.py plan parsing — the
textual subtree walk must track Spark's 3-char tree prefixes
correctly, or the audit silently under-reports (a missed fact-scan
broadcast is exactly the failure class the audit exists to catch)."""

import sys

sys.path.insert(0, "/root/repo")

from scripts.broadcast_audit import _depth, audit_plan, broadcast_subtrees

PLAN_OK = """AdaptiveSparkPlan isFinalPlan=true
+- == Final Plan ==
   *(5) Project [a#1L]
   +- *(5) BroadcastHashJoin [k#2L], [k#3L], Inner, BuildRight, false
      :- *(5) ColumnarToRow
      :  +- FileScan parquet [k#2L] ... documents.parquet
      +- BroadcastExchange HashedRelationBroadcastMode(...)
         +- *(4) HashAggregate(keys=[k#3L], functions=[count(1)])
            +- *(4) ColumnarToRow
               +- FileScan parquet [k#3L] ... documents.parquet
"""

PLAN_BAD = """AdaptiveSparkPlan isFinalPlan=true
+- == Final Plan ==
   *(5) Project [a#1L]
   +- *(5) BroadcastHashJoin [k#2L], [k#3L], Inner, BuildLeft, false
      :- BroadcastExchange HashedRelationBroadcastMode(...)
      :  +- *(3) ColumnarToRow
      :     +- FileScan parquet [k#2L] ... lineitem.parquet
      +- *(5) ColumnarToRow
         +- FileScan parquet [k#3L] ... nation.parquet
"""


def test_depth_tracks_tree_prefix_cells():
    assert _depth("AdaptiveSparkPlan x") == 0
    assert _depth("+- Project") == 1
    assert _depth(":- BroadcastExchange x") == 1
    assert _depth(":  +- FileScan parquet x") == 2
    # four 3-char ancestor cells: "   ", ":  ", "   ", "+- "
    assert _depth("   :     +- FileScan parquet y") == 4


def test_subtree_capture_stops_at_sibling():
    subs = broadcast_subtrees(PLAN_BAD)
    assert len(subs) == 1
    body = "\n".join(subs[0])
    assert "lineitem" in body
    # the sibling (nation scan) is OUTSIDE the broadcast subtree
    assert "nation" not in body


def test_aggregated_broadcast_is_clean():
    assert audit_plan(PLAN_OK) == []


def test_unreduced_fact_broadcast_is_flagged():
    flags = audit_plan(PLAN_BAD)
    assert len(flags) == 1
    sig, desc = flags[0]
    assert sig == ("lineitem",) and "lineitem" in desc


PLAN_MIXED = """AdaptiveSparkPlan isFinalPlan=true
+- == Final Plan ==
   *(5) Project [a#1L]
   +- BroadcastNestedLoopJoin BuildRight, Inner
      :- *(5) ColumnarToRow
      :  +- FileScan parquet [k#2L] ... part.parquet
      +- BroadcastExchange IdentityBroadcastMode
         +- *(4) BroadcastHashJoin [k#5L], [k#6L], Inner, BuildLeft, false
            :- *(4) HashAggregate(keys=[k#5L], functions=[count(1)])
            :  +- FileScan parquet [k#5L] ... nation.parquet
            +- *(4) ColumnarToRow
               +- FileScan parquet [k#6L] ... lineitem.parquet
"""


def test_reducer_must_sit_on_the_scan_ancestor_path():
    """Review finding r15: an aggregated DIMENSION inside the same
    broadcast subtree must not excuse an unreduced FACT scan — the
    reducer check walks the scan's ancestor path, not the whole
    subtree text."""
    flags = audit_plan(PLAN_MIXED)
    assert len(flags) == 1
    sig, _desc = flags[0]
    assert sig == ("lineitem",)


def test_initial_plan_section_ignored():
    # AQE repeats the pre-run plan under "Initial Plan": hits there
    # must not double-count or resurrect fixed plans
    doubled = PLAN_OK + "\n+- == Initial Plan ==\n" + PLAN_BAD
    assert audit_plan(doubled) == []
