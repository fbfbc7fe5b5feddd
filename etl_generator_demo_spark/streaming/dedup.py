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
