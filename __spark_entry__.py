"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship query at sf0.001 as the smoke
check; ``queries()``/``oracle_sql()`` expose the full operator
registry (etl_generator_demo_spark.registry) so the driver can
hash-compare every operator against DuckDB at sf0.01.
"""

from __future__ import annotations

import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

if "/root/repo" not in sys.path:
    sys.path.insert(0, "/root/repo")

SMOKE_SF_DIR = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query (SURVEY §7.2): revenue by market segment —
    customer⋈orders⋈lineitem, grouped, ordered. Exercises scan, join
    (broadcast + shuffle), aggregation, sort in one vertical slice."""
    from etl_generator_demo_spark.operators.relational import q2_revenue_by_segment

    return q2_revenue_by_segment(spark, SMOKE_SF_DIR)


#: Queries the round-3 record left without a green row despite r1-r3
#: prioritization (CORRECTNESS_r03 was exactly the 50-prefix of the
#: then-111-query ordering; these sat at positions 51+). Fixed head of
#: the sample so the backlog clears before new queries take slots.
_R3_BACKLOG = (
    "f_array_ops",
    "w_share_of_total",
    "x4_event_transitions",
    "x4_funnel_conversion",
    "x4_value_outliers",
    "x4_cohort_retention",
    "d_snapshot_diff",
    "x4_rolling_7d_user_spend",
    "x5_decode_features",
)


#: One representative per round-4 operator family (decision support,
#: recursion, governance, IVM, statistics suite, multimodal export,
#: streaming, sketches, embedding analytics): sampled right after the
#: backlog so the record demonstrates the round's breadth instead of
#: exhausting its 50 slots inside two families.
_R4_MARQUEE = (
    "q8_market_share",
    "q13_customer_distribution",
    "q17_small_quantity_revenue",
    "q22_dormant_accounts",
    "u_recursive_cte_depth",
    "d_gdpr_erasure_audit",
    "d_incremental_agg_maintenance",
    "x3_dim_covariance",
    "x3_mrl_prefix_recall",
    "x4_multitouch_attribution",
    "x4_journey_signatures",
    "x4_k_anonymity_ladder",
    "x4_chi2_lang_source",
    "x4_ks_source_drift",
    "x4_kaplan_meier_conversion",
    "x4_ab_test_lift",
    "x4_capped_running_balance",
    "x5_image_tiling_plan",
    "x5_shard_manifest",
    "st_session_dynamic_gap",
    "a_hll_shard_merge",
    "x4_quantile_normalize_scores",
)


#: Queries whose implementing code was REWRITTEN after their newest
#: green driver row (git history isn't available to the entry point,
#: so this list is maintained by hand each round; remove entries once
#: the post-rewrite spelling earns a fresh green row). Round-10's
#: advice fixes touched three r8/r9 queries whose only greens predate
#: the fix; round 11 rewrote three r10 queries. These re-enter the
#: driver's 50-slot sample just below never-green queries — a green
#: row for code that has since changed is not a regression guard.
_REWRITTEN_SINCE_GREEN = (
    # r15's txlog rewrite (d_txlog_time_travel) re-greened in
    # CORRECTNESS_r15 — cleared.
    # r16: candidate-join size gate in verified_neardup_pairs (r15
    # verdict item 1) — warm small-SF plan is unchanged (broadcast
    # tier), but the code is new since the r13 green
    "x2_neardup_verified",
)


def _driver_priority_order(reg) -> list[str]:
    """Order the registry so the driver's bounded per-round sample
    yields the most informative CORRECTNESS record. Re-examining the
    r03 record against the r03-era ordering shows the driver DOES take
    a strict 50-prefix of ``queries()`` order — all 50 sampled rows
    were rank-0 entries in prefix order — so this ordering fully
    determines which queries earn driver rows each round:

    0. previously SAMPLED-BUT-RED queries (the LATEST driver row in
       ``CORRECTNESS_r*.json`` round order is red — including a
       post-rewrite red for a rewritten-since-green entry) — clearing
       the record's failures outranks everything;
    1. the r03 never-sampled backlog (fixed list above);
    2. the round-4 marquee list (one per new operator family);
    3. other never-green oracle-backed queries, registration order
       (new operators accumulate rows round by round);
    4. rewritten-since-last-green queries (_REWRITTEN_SINCE_GREEN) —
       their old green rows certify code that no longer exists, so
       the post-rewrite spelling re-enters the sample;
    5. queries already proven green (regression guard);
    6. rows-only queries last — since round 4 the registry has none
       (every registered query is oracle-backed; the floor is pinned
       in tests/test_registry.py).

    The full-registry gate is ``tools/oracle_check.py`` regardless of
    what the driver samples.
    """
    import glob
    import json
    import os

    # Latest driver verdict per query (files sort in round order for
    # r01..r99; later rows overwrite). Using the LATEST row — not
    # ever-green/ever-red sets — means a _REWRITTEN_SINCE_GREEN query
    # whose post-rewrite sample came back RED ranks 0 (red-first), as
    # the tier docstring promises; the r11 advice caught the old
    # set-difference masking exactly that case.
    latest: dict[str, bool] = {}
    latest_round: dict[str, int] = {}
    here = os.path.dirname(os.path.abspath(__file__))
    for rnd, path in enumerate(
        sorted(glob.glob(os.path.join(here, "CORRECTNESS_r*.json")))
    ):
        try:
            with open(path) as fh:
                for name, row in json.load(fh).items():
                    latest[name] = bool(
                        row.get("rows_match") and row.get("hash_match")
                    )
                    latest_round[name] = rnd
        except (OSError, ValueError):
            continue
    backlog = {n: i for i, n in enumerate(_R3_BACKLOG)}
    marquee = {n: i for i, n in enumerate(_R4_MARQUEE)}
    rewritten = {n: i for i, n in enumerate(_REWRITTEN_SINCE_GREEN)}
    names = list(reg)

    def rank(name):
        if reg[name].oracle is None:
            return (6, 0)
        if latest.get(name) is False:
            # newest driver row is RED — including a post-rewrite red
            # for a _REWRITTEN_SINCE_GREEN entry; failures first
            return (0, 0)
        if name in rewritten:
            # latest row is green, but for a spelling that has since
            # been rewritten — re-enter the sample below fresh reds
            return (4, rewritten[name])
        if name in latest:
            # newest row green, code unchanged — STALENESS tier (r13,
            # verdict item 3): with no reds left, spend the driver's
            # 50-slot sample re-earning the OLDEST greens first (259 of
            # 388 queries' newest green predates r09 while code keeps
            # moving), so every query re-greens within ~6 rounds.
            return (5, latest_round.get(name, 0))
        if name in backlog:
            return (1, backlog[name])
        if name in marquee:
            return (2, marquee[name])
        return (3, 0)

    return sorted(names, key=rank)  # stable: keeps reg order within ties


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2, in driver
    sampling priority order (see ``_driver_priority_order``)."""
    from etl_generator_demo_spark.registry import load_all

    reg = load_all()
    return {name: reg[name].fn for name in _driver_priority_order(reg)}


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL per query; non-SQL-expressible ops are
    omitted (driver records a rows-only check for those)."""
    from etl_generator_demo_spark.registry import load_all

    return {name: rq.oracle for name, rq in load_all().items() if rq.oracle is not None}
