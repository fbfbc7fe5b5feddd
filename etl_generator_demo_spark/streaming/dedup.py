"""Streaming deduplication — SURVEY.md §2.11 [EXT] × X1.

`stream_dedup_keys` is the exactly-once ingest primitive: the first
event per key passes, every later duplicate is dropped, with the
duplicate-tracking state bounded by the watermark
(`dropDuplicatesWithinWatermark` — the state store holds one entry per
key seen within the lag window, evicted when the watermark passes it;
plain `dropDuplicates` on a stream would hold every key forever).

Batch twin: the registered query `st_dedup_first_occurrence` spells
the same semantics deterministically (ROW_NUMBER under a (ts,
event_id) total order) so the DuckDB oracle can pin it; streaming
execution is pinned by the real two-source pytest
(`tests/test_streaming_dedup.py`) which replays every micro-batch
twice and asserts the duplicate set is dropped across batch
boundaries.

At 100 TB/day the state store carries |distinct keys within the
watermark lag|, not history — sizing is lag × key-arrival rate, the
same argument as the session-window state bound.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from etl_generator_demo_spark.operators.relational import t
from etl_generator_demo_spark.registry import register


def stream_dedup_keys(
    stream: DataFrame, keys: Sequence[str] = ("user_id", "event_type")
) -> DataFrame:
    """First occurrence per key on a watermarked stream; duplicate
    state is evicted once the watermark passes (bounded state). The
    input must already carry `withWatermark`."""
    return stream.dropDuplicatesWithinWatermark(list(keys))


def dedup_first_occurrence(
    events: DataFrame, keys: Sequence[str] = ("user_id", "event_type")
) -> DataFrame:
    """Batch spelling of the same operator, made deterministic: the
    winner is the (ts, event_id)-minimal row per key (streaming picks
    arrival order; batch needs a total order for replayability)."""
    w = Window.partitionBy(*keys).orderBy("ts", "event_id")
    return (
        events.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )


@register(
    "st_dedup_first_occurrence",
    oracle="""
    WITH r AS (
        SELECT event_type, user_id,
               CAST(FLOOR(value * 100) AS BIGINT) AS c2,
               CAST(ts AS TIMESTAMP) AS tts,
               ROW_NUMBER() OVER (PARTITION BY user_id, event_type
                                  ORDER BY CAST(ts AS TIMESTAMP), event_id) AS rn
        FROM events
    )
    SELECT event_type,
           CAST(COUNT(*) AS BIGINT) AS n_keys,
           CAST(SUM(c2) AS BIGINT) AS first_values_c2,
           MIN(tts) AS min_first_ts
    FROM r WHERE rn = 1
    GROUP BY event_type ORDER BY event_type
    """,
    survey_ids=("§2.11", "X1", "W1"),
)
def st_dedup_first_occurrence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Keyed dedup to the first occurrence per (user_id, event_type) —
    the batch twin of `stream_dedup_keys`, summarized per type (key
    count, sum of first-seen values in cents, earliest first-seen
    timestamp). One window pass; at scale the shuffle is the keyed
    repartition every dedup needs, and InferWindowGroupLimit prunes
    non-first rows before the filter."""
    ev = t(spark, sf_dir, "events")
    first = dedup_first_occurrence(ev)
    return (
        first.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_keys"),
            F.sum(F.floor(F.col("value") * 100).cast("long"))
            .cast("long")
            .alias("first_values_c2"),
            F.min("ts").alias("min_first_ts"),
        )
        .orderBy("event_type")
    )


# ---------------------------------------------------------------------------
# Round 9: union-ingest idempotency — dedup ACROSS two sources
# ---------------------------------------------------------------------------

def stream_union_dedup(
    streams: Sequence[DataFrame], keys: Sequence[str] = ("event_id",)
) -> DataFrame:
    """Union-ingest idempotency primitive: N watermarked source
    streams (each input must already carry ``withWatermark`` — the
    union's watermark is the MIN of its inputs, so one lagging source
    holds state for all) are unioned by name and deduped by key with
    watermark-bounded state. The streaming winner is first-arrival
    (whichever feed delivers the key first); the registered batch twin
    `st_union_dedup_two_sources` makes the winner deterministic
    (source-rank priority) for replayability, the same
    streaming-vs-batch determinism split as `stream_dedup_keys`."""
    out = streams[0]
    for s in streams[1:]:
        out = out.unionByName(s)
    return out.dropDuplicatesWithinWatermark(list(keys))


#: The two feeds' type slices: the primary feed carries interaction
#: events, the backfill feed re-delivers view/signup (the overlap —
#: exactly what a catch-up replay does) plus the types only it sees.
UNION_PRIMARY_TYPES = ("click", "view", "signup")
UNION_BACKFILL_TYPES = ("view", "signup", "purchase", "error")


@register(
    "st_union_dedup_two_sources",
    oracle=f"""
    WITH a AS (
        SELECT event_id, event_type, CAST(ts AS TIMESTAMP) AS tts,
               CAST(FLOOR(value * 100) AS BIGINT) AS value_c2,
               0 AS src_rank
        FROM events
        WHERE event_type IN {UNION_PRIMARY_TYPES!r}
    ),
    b AS (
        SELECT event_id, event_type, CAST(ts AS TIMESTAMP) AS tts,
               CAST(FLOOR(value) AS BIGINT) * 100 AS value_c2,
               1 AS src_rank
        FROM events
        WHERE event_type IN {UNION_BACKFILL_TYPES!r}
    ),
    u AS (SELECT * FROM a UNION ALL SELECT * FROM b),
    r AS (
        SELECT *,
               ROW_NUMBER() OVER (PARTITION BY event_id
                                  ORDER BY src_rank, tts, event_id) AS rn
        FROM u
    )
    SELECT event_type,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           CAST(SUM(CASE WHEN src_rank = 0 THEN 1 ELSE 0 END) AS BIGINT)
               AS n_from_primary,
           CAST(SUM(CASE WHEN src_rank = 1 THEN 1 ELSE 0 END) AS BIGINT)
               AS n_from_backfill,
           CAST(SUM(value_c2) AS BIGINT) AS sum_value_c2
    FROM r WHERE rn = 1
    GROUP BY event_type ORDER BY event_type
    """,
    survey_ids=("§2.11", "X1", "U2", "W1"),
)
def st_union_dedup_two_sources(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch twin of `stream_union_dedup`: two overlapping ingest
    feeds — a primary interaction feed (exact values) and a backfill
    feed that re-delivers the overlap types at coarser precision
    (floored values, the classic lossy re-ingest) — unioned and
    deduped by event_id with PRIMARY-WINS priority (row_number over
    (src_rank, ts, event_id): deterministic, so the overlap types
    count as n_from_primary and keep their exact cents).

    Per-type summary pins the winner choice: view/signup appear with
    primary counts and exact sums, purchase/error only exist in the
    backfill feed. At scale this is one keyed window over the unioned
    feed — the same single shuffle any dedup pays; the streaming
    spelling replaces the window with watermark-bounded keyed state."""
    ev = t(spark, sf_dir, "events")
    a = ev.filter(F.col("event_type").isin(*UNION_PRIMARY_TYPES)).select(
        "event_id",
        "event_type",
        F.col("ts").alias("tts"),
        F.floor(F.col("value") * 100).cast("long").alias("value_c2"),
        F.lit(0).alias("src_rank"),
    )
    b = ev.filter(F.col("event_type").isin(*UNION_BACKFILL_TYPES)).select(
        "event_id",
        "event_type",
        F.col("ts").alias("tts"),
        (F.floor(F.col("value")).cast("long") * 100).alias("value_c2"),
        F.lit(1).alias("src_rank"),
    )
    u = a.unionByName(b)
    w = Window.partitionBy("event_id").orderBy("src_rank", "tts", "event_id")
    first = u.withColumn("_rn", F.row_number().over(w)).filter(F.col("_rn") == 1)
    return (
        first.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_events"),
            F.sum((F.col("src_rank") == 0).cast("long"))
            .cast("long")
            .alias("n_from_primary"),
            F.sum((F.col("src_rank") == 1).cast("long"))
            .cast("long")
            .alias("n_from_backfill"),
            F.sum("value_c2").cast("long").alias("sum_value_c2"),
        )
        .orderBy("event_type")
    )
