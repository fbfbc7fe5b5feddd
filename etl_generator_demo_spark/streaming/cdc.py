"""Streaming CDC apply — SURVEY.md §2.11 [EXT] × D1.

`stream_cdc_running_state` folds an insert/update/delete change
stream into the running current snapshot with ONE declarative keyed
aggregate: max(struct(ts, seq, op, value)) per key is latest-op-wins
(struct comparison is lexicographic — event time, then the log
sequence number), and a post-aggregate tombstone filter hides deleted
keys while keeping their state row (so a later re-insert wins
normally — delete-then-insert needs no special casing).

State sizing is the honest part: a running snapshot's state IS the
snapshot (one struct per live key — the exact size of the MERGE INTO
target it replaces), so no watermark eviction applies; this is
inherent to the operator, not a leak. At 100 TB/day the state is
|distinct keys|, not |events| — the same reason the batch twin
(`d_cdc_apply_snapshot`, surfaces_r11) reduces before joining.

Batch twin `st_cdc_running_snapshot` runs the SAME function on the
batch relation (the aggregate spelling is mode-agnostic) and is
DuckDB-oracled; the streaming execution path — cross-micro-batch
latest-wins, tombstone flips across batch boundaries, complete-mode
re-emission — is pinned by tests/test_streaming_cdc.py on a file
stream.

Reference grounding: db_connector.py:244-251 (D1 commits arbitrary
DML); the change stream is that contract's at-scale arrival shape.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from etl_generator_demo_spark.operators.relational import t
from etl_generator_demo_spark.operators.surfaces_r11 import _CDC_OP_SQL
from etl_generator_demo_spark.registry import register


def stream_cdc_running_state(log: DataFrame) -> DataFrame:
    """Fold a CDC log (user_id, event_id, ts, op IN I/U/D,
    value_cents) — streaming or batch — into the current snapshot.
    One keyed max(struct) aggregate; works identically under
    complete-mode streaming (state = one struct per key) and batch
    (plain hash aggregate with map-side combine)."""
    agg = log.groupBy("user_id").agg(
        F.max(
            F.struct("ts", "event_id", "op", "value_cents")
        ).alias("m")
    )
    return agg.select(
        "user_id",
        F.col("m.op").alias("last_op"),
        F.col("m.value_cents").alias("last_value_cents"),
        F.col("m.ts").alias("last_ts"),
    ).filter(F.col("last_op") != "D")


@register(
    "st_cdc_running_snapshot",
    oracle=f"""
    WITH log AS (
        SELECT user_id, event_id, CAST(ts AS TIMESTAMP) AS ts,
               {_CDC_OP_SQL} AS op,
               CAST(ROUND(value * 100, 0) AS BIGINT) AS value_cents
        FROM events
    ),
    ranked AS (
        SELECT *, ROW_NUMBER() OVER (
            PARTITION BY user_id ORDER BY ts DESC, event_id DESC
        ) AS rn
        FROM log
    )
    SELECT user_id, op AS last_op, value_cents AS last_value_cents,
           ts AS last_ts
    FROM ranked WHERE rn = 1 AND op <> 'D'
    ORDER BY user_id
    """,
    survey_ids=("D1", "A1", "F7"),
)
def st_cdc_running_snapshot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch twin of the streaming CDC fold: the same max(struct)
    aggregate over the events feed read as a change log. Differs from
    `d_cdc_apply_snapshot` in composition on purpose — aggregate
    arg-max (streamable, no window) vs ranking window + op counts
    (the richer batch report); the snapshot columns must agree, which
    the oracle pins through the ROW_NUMBER spelling."""
    log = t(spark, sf_dir, "events").select(
        "user_id",
        "event_id",
        F.col("ts").cast("timestamp").alias("ts"),
        F.expr(_CDC_OP_SQL).alias("op"),
        F.round(F.col("value") * 100, 0).cast("long").alias("value_cents"),
    )
    return stream_cdc_running_state(log).orderBy("user_id")


@register(
    "st_state_capacity_by_day",
    oracle="""
    WITH ev AS (
        SELECT user_id, CAST(CAST(ts AS TIMESTAMP) AS DATE) AS day
        FROM events
    ),
    first_seen AS (
        SELECT user_id, MIN(day) AS first_day FROM ev GROUP BY user_id
    ),
    per_day AS (
        SELECT day,
               CAST(COUNT(*) AS BIGINT) AS n_events,
               CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_active_keys
        FROM ev GROUP BY day
    ),
    new_keys AS (
        SELECT first_day AS day, CAST(COUNT(*) AS BIGINT) AS n_new_keys
        FROM first_seen GROUP BY first_day
    )
    SELECT p.day, p.n_events, p.n_active_keys,
           CAST(COALESCE(k.n_new_keys, 0) AS BIGINT) AS n_new_keys,
           CAST(SUM(COALESCE(k.n_new_keys, 0))
                OVER (ORDER BY p.day) AS BIGINT) AS cum_keys
    FROM per_day p LEFT JOIN new_keys k ON k.day = p.day
    ORDER BY p.day
    """,
    survey_ids=("A1", "A3", "W3", "F4"),
)
def st_state_capacity_by_day(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming state-store capacity planning: per event-time day,
    arrivals, distinct active keys (≈ state size of a keyed operator
    with a one-day watermark lag — dedup, sessionization, the CDC fold
    above), first-seen keys, and the cumulative key count (state size
    with NO eviction — the running-snapshot bound). The sizing
    numbers that turn 'watermark lag × key-arrival rate' from an
    argument in a docstring into a measured table per feed. The
    running total is a window over the DAY relation — calendar-
    bounded (the Holt-lattice argument), never a per-event global
    window."""
    ev = t(spark, sf_dir, "events").select(
        "user_id", F.col("ts").cast("timestamp").cast("date").alias("day")
    )
    per_day = ev.groupBy("day").agg(
        F.count(F.lit(1)).cast("long").alias("n_events"),
        F.countDistinct("user_id").cast("long").alias("n_active_keys"),
    )
    new_keys = (
        ev.groupBy("user_id")
        .agg(F.min("day").alias("day"))
        .groupBy("day")
        .agg(F.count(F.lit(1)).cast("long").alias("n_new_keys"))
    )
    from pyspark.sql.window import Window

    joined = per_day.join(new_keys, "day", "left").select(
        "day",
        "n_events",
        "n_active_keys",
        F.coalesce(F.col("n_new_keys"), F.lit(0))
        .cast("long")
        .alias("n_new_keys"),
    )
    w = Window.orderBy("day").rowsBetween(Window.unboundedPreceding, 0)
    return joined.select(
        "day",
        "n_events",
        "n_active_keys",
        "n_new_keys",
        F.sum("n_new_keys").over(w).cast("long").alias("cum_keys"),
    ).orderBy("day")
