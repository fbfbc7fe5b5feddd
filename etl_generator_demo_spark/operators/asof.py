"""As-of join — SURVEY.md §2.3 J8 ([EXT]; no reference counterpart).

"For each right-side event, the latest left-side event at or before
its timestamp, per key." Spark has no ASOF JOIN operator; a range join
would be O(n*m) per key. This implementation is the scalable idiom:
union both sides, one window sort per key, carry the last left value
forward (`last(..., ignorenulls=True)`) — a single shuffle on the key,
linear in total events, no range explosion. At 100 TB the shuffle is
keyed on (user) and AQE splits skewed users.

Precision: event timestamps are nanos in parquet; Spark truncates to
micros (catalog.read_table), so the DuckDB oracle casts both sides to
microsecond TIMESTAMP before its native ASOF JOIN. Simultaneous-
microsecond click+purchase resolves as click-first (<= semantics) in
both engines via the kind tiebreaker.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from etl_generator_demo_spark.operators.relational import t
from etl_generator_demo_spark.registry import register


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str,
    right_ts: str,
    value_cols: list[str],
) -> DataFrame:
    """Generic as-of: for each `right` row, latest `left` row with
    left_ts <= right_ts within `key`. Returns right columns + the
    carried value_cols (null when no prior left row)."""
    lhs = left.select(
        F.col(key),
        F.col(left_ts).alias("_ts"),
        F.lit(0).alias("_kind"),  # left sorts first on timestamp ties
        *[F.col(c).alias(f"_v_{c}") for c in value_cols],
    )
    rhs_cols = [c for c in right.columns]
    rhs = right.select(
        F.col(key),
        F.col(right_ts).alias("_ts"),
        F.lit(1).alias("_kind"),
        *[F.lit(None).cast(dict(left.dtypes)[c]).alias(f"_v_{c}") for c in value_cols],
        *[F.col(c).alias(f"_r_{c}") for c in rhs_cols],
    )
    lhs_padded = lhs.select(
        key, "_ts", "_kind",
        *[F.col(f"_v_{c}") for c in value_cols],
        *[F.lit(None).cast(dict(right.dtypes)[c]).alias(f"_r_{c}") for c in rhs_cols],
    )
    unioned = lhs_padded.unionByName(rhs)
    w = (
        Window.partitionBy(key)
        .orderBy("_ts", "_kind")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    carried: list[Column] = [
        F.last(f"_v_{c}", ignorenulls=True).over(w).alias(f"asof_{c}") for c in value_cols
    ]
    return (
        unioned.select("*", *carried)
        .filter(F.col("_kind") == 1)
        .select(*[F.col(f"_r_{c}").alias(c) for c in rhs_cols], *[f"asof_{c}" for c in value_cols])
    )


@register(
    "j8_asof_purchase_last_click",
    oracle="""
    WITH clicks AS (
        SELECT user_id, CAST(ts AS TIMESTAMP) AS ts, event_id
        FROM events WHERE event_type = 'click'
    ),
    purchases AS (
        SELECT user_id, CAST(ts AS TIMESTAMP) AS ts, event_id, value
        FROM events WHERE event_type = 'purchase'
    )
    SELECT p.event_id, p.user_id, p.ts AS purchase_ts,
           ROUND(p.value, 2) AS purchase_value,
           c.ts AS asof_click_ts
    FROM purchases p
    ASOF LEFT JOIN clicks c
      ON p.user_id = c.user_id AND p.ts >= c.ts
    ORDER BY p.event_id
    """,
    survey_ids=("J8",),
)
def j8_asof_purchase_last_click(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Attribution-style as-of: each purchase joined to the user's most
    recent click at or before it."""
    ev = t(spark, sf_dir, "events")
    clicks = ev.filter(F.col("event_type") == "click").select(
        "user_id", F.col("ts").alias("click_ts")
    )
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "event_id",
        "user_id",
        F.col("ts").alias("purchase_ts"),
        F.round("value", 2).alias("purchase_value"),
    )
    out = asof_join(
        clicks.select("user_id", F.col("click_ts")),
        purchases,
        key="user_id",
        left_ts="click_ts",
        right_ts="purchase_ts",
        value_cols=["click_ts"],
    )
    return out.select(
        "event_id", "user_id", "purchase_ts", "purchase_value", "asof_click_ts"
    ).orderBy("event_id")


def asof_join_forward(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str,
    right_ts: str,
    value_cols: list[str],
) -> DataFrame:
    """Forward as-of: for each `right` row, the EARLIEST `left` row
    with left_ts >= right_ts within `key` (at-or-after, the mirror of
    the backward join's at-or-before). Same single-shuffle union +
    window idiom, with the frame looking forward: first non-null left
    value in [current, end) of the per-key timeline. The RIGHT row
    sorts first on timestamp ties so an equal-timestamp left event
    falls inside the right row's forward frame (>= semantics) — the
    mirror of the backward join, where the left row sorts first."""
    lhs = left.select(
        F.col(key),
        F.col(left_ts).alias("_ts"),
        F.lit(1).alias("_kind"),  # left AFTER right on ties: equal ts matches
        *[F.col(c).alias(f"_v_{c}") for c in value_cols],
    )
    rhs_cols = list(right.columns)
    rhs = right.select(
        F.col(key),
        F.col(right_ts).alias("_ts"),
        F.lit(0).alias("_kind"),
        *[F.lit(None).cast(dict(left.dtypes)[c]).alias(f"_v_{c}") for c in value_cols],
        *[F.col(c).alias(f"_r_{c}") for c in rhs_cols],
    )
    lhs_padded = lhs.select(
        key, "_ts", "_kind",
        *[F.col(f"_v_{c}") for c in value_cols],
        *[F.lit(None).cast(dict(right.dtypes)[c]).alias(f"_r_{c}") for c in rhs_cols],
    )
    unioned = lhs_padded.unionByName(rhs)
    # NOTE the tie order: at equal _ts the RIGHT row (kind 0) sorts
    # first, so the equal-ts left row (kind 1) sits inside the right
    # row's forward frame [current, unboundedFollowing).
    w = (
        Window.partitionBy(key)
        .orderBy("_ts", "_kind")
        .rowsBetween(0, Window.unboundedFollowing)
    )
    carried = [
        F.first(f"_v_{c}", ignorenulls=True).over(w).alias(f"asof_{c}")
        for c in value_cols
    ]
    return (
        unioned.select("*", *carried)
        .filter(F.col("_kind") == 0)
        .select(
            *[F.col(f"_r_{c}").alias(c) for c in rhs_cols],
            *[f"asof_{c}" for c in value_cols],
        )
    )


@register(
    "j8_asof_forward_next_view",
    oracle="""
    WITH views AS (
        SELECT user_id, CAST(ts AS TIMESTAMP) AS ts
        FROM events WHERE event_type = 'view'
    ),
    purchases AS (
        SELECT user_id, CAST(ts AS TIMESTAMP) AS ts, event_id
        FROM events WHERE event_type = 'purchase'
    )
    SELECT p.event_id, p.user_id, p.ts AS purchase_ts,
           MIN(v.ts) AS asof_view_ts
    FROM purchases p
    LEFT JOIN views v ON v.user_id = p.user_id AND v.ts >= p.ts
    GROUP BY p.event_id, p.user_id, p.ts
    ORDER BY p.event_id
    """,
    survey_ids=("J8",),
)
def j8_asof_forward_next_view(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Forward as-of: each purchase joined to the user's NEXT page view
    at or after it (post-conversion behavior — the mirror query of
    last-click attribution). The oracle states the semantics as a
    min-over-range aggregate; the engine runs the linear union+window
    plan, never a per-row range probe."""
    ev = t(spark, sf_dir, "events")
    views = ev.filter(F.col("event_type") == "view").select(
        "user_id", F.col("ts").alias("view_ts")
    )
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", F.col("ts").alias("purchase_ts")
    )
    out = asof_join_forward(
        views,
        purchases,
        key="user_id",
        left_ts="view_ts",
        right_ts="purchase_ts",
        value_cols=["view_ts"],
    )
    return out.select(
        "event_id", "user_id", "purchase_ts", F.col("asof_view_ts").alias("asof_view_ts")
    ).orderBy("event_id")


@register(
    "j8_asof_tolerance_click",
    oracle="""
    WITH clicks AS (
        SELECT user_id, CAST(ts AS TIMESTAMP) AS ts
        FROM events WHERE event_type = 'click'
    ),
    purchases AS (
        SELECT user_id, CAST(ts AS TIMESTAMP) AS ts, event_id
        FROM events WHERE event_type = 'purchase'
    )
    SELECT p.event_id, p.user_id, p.ts AS purchase_ts,
           CASE WHEN c.ts >= p.ts - INTERVAL 1 HOUR THEN c.ts END
               AS asof_click_ts,
           CAST(CASE WHEN c.ts >= p.ts - INTERVAL 1 HOUR
                     THEN 1 ELSE 0 END AS BIGINT) AS attributed
    FROM purchases p
    ASOF LEFT JOIN clicks c
      ON p.user_id = c.user_id AND p.ts >= c.ts
    ORDER BY p.event_id
    """,
    survey_ids=("J8",),
)
def j8_asof_tolerance_click(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join with a staleness TOLERANCE (pandas ``merge_asof(...,
    tolerance=...)`` / kdb ``wj`` semantics): each purchase joins to
    the user's most recent click at or before it, but a match older
    than 1 hour is rejected to NULL — attribution windows, sensor
    freshness gates, point-in-time feature staleness budgets all need
    the bounded variant, not bare as-of. Composition: the same single
    union + per-key window carry as :func:`asof_join` (one keyed
    shuffle, linear — no range explosion), then the tolerance is one
    scan-side predicate on the carried timestamp. The oracle is
    DuckDB's native ASOF LEFT JOIN with the same post-filter, so the
    tolerance semantics (boundary INCLUSIVE at exactly -1 hour) are
    pinned cross-engine."""
    ev = t(spark, sf_dir, "events")
    clicks = ev.filter(F.col("event_type") == "click").select(
        "user_id", F.col("ts").alias("click_ts")
    )
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", F.col("ts").alias("purchase_ts")
    )
    out = asof_join(
        clicks,
        purchases,
        key="user_id",
        left_ts="click_ts",
        right_ts="purchase_ts",
        value_cols=["click_ts"],
    )
    fresh = F.col("asof_click_ts") >= F.col("purchase_ts") - F.expr("INTERVAL 1 HOUR")
    return out.select(
        "event_id",
        "user_id",
        "purchase_ts",
        F.when(fresh, F.col("asof_click_ts")).alias("asof_click_ts"),
        F.when(fresh, 1).otherwise(0).cast("long").alias("attributed"),
    ).orderBy("event_id")
