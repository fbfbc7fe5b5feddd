"""Unit pins for tools/plan_audit.py's generic unbounded-global-window
gate (round-13): the check that keeps the x4_zipf_slope regression
class dead. It parses WindowExec's printed argument groups, so the
parsing itself needs pins — TreeNode omits EMPTY child lists, making
``Window [exprs], [X]`` ambiguous between partition-only (fine) and
order-only (the dangerous global sort) until the sort-direction tokens
disambiguate.
"""

from __future__ import annotations

import sys

sys.path.insert(0, "/root/repo/tools")

from plan_audit import _window_is_partitioned, unbounded_global_windows


def test_three_groups_is_partitioned():
    node = (
        "Window [row_number() windowspecdefinition(a#1, b#2 ASC NULLS FIRST, "
        "specifiedwindowframe(RowFrame, unboundedpreceding$(), currentrow$())) "
        "AS rn#3], [a#1], [b#2 ASC NULLS FIRST]"
    )
    assert _window_is_partitioned(node)


def test_two_groups_partition_only_is_partitioned():
    node = (
        "Window [count(1) windowspecdefinition(doc_id#5L, "
        "specifiedwindowframe(RowFrame, unboundedpreceding$(), "
        "unboundedfollowing$())) AS n#6L], [doc_id#5L]"
    )
    assert _window_is_partitioned(node)


def test_two_groups_order_only_is_unpartitioned():
    node = (
        "Window [row_number() windowspecdefinition(f#7L DESC NULLS LAST, "
        "specifiedwindowframe(RowFrame, unboundedpreceding$(), currentrow$())) "
        "AS rnk#8], [f#7L DESC NULLS LAST, tk#9 ASC NULLS FIRST]"
    )
    assert not _window_is_partitioned(node)


def test_one_group_global_aggregate_window_is_unpartitioned():
    node = (
        "Window [sum(x#1L) windowspecdefinition(specifiedwindowframe(RowFrame, "
        "unboundedpreceding$(), unboundedfollowing$())) AS total#2L]"
    )
    assert not _window_is_partitioned(node)


def test_unpartitioned_window_without_limit_head_flags():
    plan = """AdaptiveSparkPlan isFinalPlan=true
+- *(3) Sort [rnk#8 ASC NULLS FIRST], true, 0
   +- Window [row_number() windowspecdefinition(f#7L DESC NULLS LAST, specifiedwindowframe(RowFrame, unboundedpreceding$(), currentrow$())) AS rnk#8], [f#7L DESC NULLS LAST]
      +- *(2) Sort [f#7L DESC NULLS LAST], false, 0
         +- Exchange SinglePartition, ENSURE_REQUIREMENTS, [plan_id=1]
            +- *(1) HashAggregate(keys=[tk#9], functions=[count(1)])
               +- FileScan parquet [text#10]"""
    bad = unbounded_global_windows(plan)
    assert len(bad) == 1 and bad[0].startswith("Window [row_number()")


def test_unpartitioned_window_over_take_ordered_head_passes():
    plan = """AdaptiveSparkPlan isFinalPlan=true
+- Window [row_number() windowspecdefinition(f#7L DESC NULLS LAST, specifiedwindowframe(RowFrame, unboundedpreceding$(), currentrow$())) AS rnk#8], [f#7L DESC NULLS LAST]
   +- *(2) Sort [f#7L DESC NULLS LAST], false, 0
      +- Exchange SinglePartition, ENSURE_REQUIREMENTS, [plan_id=1]
         +- TakeOrderedAndProject(limit=1000, orderBy=[f#7L DESC NULLS LAST], output=[tk#9,f#7L])
            +- *(1) HashAggregate(keys=[tk#9], functions=[count(1)])"""
    assert unbounded_global_windows(plan) == []


def test_partitioned_window_never_flags():
    plan = """*(2) Window [count(1) windowspecdefinition(doc_id#5L, specifiedwindowframe(RowFrame, unboundedpreceding$(), unboundedfollowing$())) AS n#6L], [doc_id#5L]
+- *(1) Sort [doc_id#5L ASC NULLS FIRST], false, 0
   +- Exchange hashpartitioning(doc_id#5L, 32)
      +- FileScan parquet [doc_id#5L]"""
    assert unbounded_global_windows(plan) == []


def test_sibling_subtree_limit_does_not_excuse_the_window():
    """A Limit that is a SIBLING (outside the window's child subtree)
    must not count as the bounded head — the indent-scoped subtree
    walk has to stop at the dedent."""
    plan = """*(4) SortMergeJoin [k#1], [k#2], Inner
:- Window [row_number() windowspecdefinition(v#3 ASC NULLS FIRST, specifiedwindowframe(RowFrame, unboundedpreceding$(), currentrow$())) AS rn#4], [v#3 ASC NULLS FIRST]
:  +- Exchange SinglePartition
:     +- FileScan parquet [v#3]
+- GlobalLimit 10
   +- FileScan parquet [k#2]"""
    assert len(unbounded_global_windows(plan)) == 1


def test_limit_on_one_join_branch_below_window_does_not_excuse():
    """r13 advice (round-14 fix): a Limit INSIDE the window's child
    subtree but on ONE branch of a join must not excuse the window —
    the other branch is unbounded and dominates the join's output.
    The old anywhere-in-subtree text search passed this; the
    first-child-spine walk must flag it."""
    plan = """Window [row_number() windowspecdefinition(v#3 ASC NULLS FIRST, specifiedwindowframe(RowFrame, unboundedpreceding$(), currentrow$())) AS rn#4], [v#3 ASC NULLS FIRST]
+- *(5) Sort [v#3 ASC NULLS FIRST], false, 0
   +- Exchange SinglePartition
      +- *(4) SortMergeJoin [k#1], [k#2], Inner
         :- GlobalLimit 10
         :  +- FileScan parquet [k#1]
         +- *(2) Sort [k#2 ASC NULLS FIRST], false, 0
            +- FileScan parquet [k#2]"""
    assert len(unbounded_global_windows(plan)) == 1


def test_limit_on_direct_spine_through_passthrough_nodes_passes():
    """A bound on the direct input chain still excuses the window even
    through single-child pass-through nodes (Sort/Exchange/Project)."""
    plan = """Window [row_number() windowspecdefinition(v#3 ASC NULLS FIRST, specifiedwindowframe(RowFrame, unboundedpreceding$(), currentrow$())) AS rn#4], [v#3 ASC NULLS FIRST]
+- *(3) Sort [v#3 ASC NULLS FIRST], false, 0
   +- Exchange SinglePartition
      +- *(2) Project [v#3]
         +- GlobalLimit 1000
            +- *(1) HashAggregate(keys=[tk#9], functions=[count(1)])
               +- FileScan parquet [text#10]"""
    assert unbounded_global_windows(plan) == []


def test_generate_between_window_and_limit_does_not_excuse():
    """explode() below the window re-inflates a limited input by a
    data-dependent factor — the spine walk stops at Generate."""
    plan = """Window [sum(x#1L) windowspecdefinition(specifiedwindowframe(RowFrame, unboundedpreceding$(), unboundedfollowing$())) AS total#2L]
+- *(2) Generate explode(arr#5), [x#1L], false
   +- GlobalLimit 100
      +- FileScan parquet [arr#5]"""
    assert len(unbounded_global_windows(plan)) == 1
