"""Streaming dedup (dropDuplicatesWithinWatermark): replay every
micro-batch TWICE and assert the duplicate copies are dropped across
micro-batch boundaries — the exactly-once ingest primitive.

The batch twin `st_dedup_first_occurrence` is oracle-pinned; this test
pins the streaming execution path itself: duplicates arriving in a
LATER micro-batch (not just within one batch) must still be dropped,
which requires the keyed state store to survive the trigger boundary.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F


@pytest.fixture(scope="module")
def duplicated_stream_dir(spark, sf_dir, tmp_path_factory):
    """Four time slices, each written twice in a row (slice k, then
    slice k again) with ascending mtimes: the file source replays them
    oldest-first, so every event's duplicate copy arrives exactly one
    micro-batch after the original — a cross-batch duplicate."""
    from etl_generator_demo_spark.catalog import read_table

    ev = (
        read_table(spark, sf_dir, "events")
        .select("event_id", "user_id", "event_type", "ts", "value")
    )
    src = tmp_path_factory.mktemp("dedupstream") / "src"
    bounds = ev.agg(F.min("ts").alias("lo"), F.max("ts").alias("hi")).first()
    lo, hi = bounds["lo"], bounds["hi"]
    step = (hi - lo) / 4
    for k in range(4):
        a = lo + k * step
        b = hi if k == 3 else lo + (k + 1) * step
        sl = ev.filter(
            (F.col("ts") >= a) & (F.col("ts") <= b if k == 3 else F.col("ts") < b)
        )
        sl.coalesce(1).write.mode("append").parquet(str(src))
        sl.coalesce(1).write.mode("append").parquet(str(src))  # duplicate batch
    return ev, str(src)


@pytest.mark.slow
def test_cross_batch_duplicates_dropped(spark, duplicated_stream_dir):
    from etl_generator_demo_spark.streaming.dedup import stream_dedup_keys

    ev, src = duplicated_stream_dir
    stream = (
        spark.readStream.schema(ev.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
        .withWatermark("ts", "40 days")  # lag > history: nothing evicted early
    )
    q = (
        stream_dedup_keys(stream, keys=("event_id",))
        .writeStream.format("memory")
        .queryName("dedup_sink")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)

    got = spark.sql(
        "SELECT event_id, COUNT(*) AS n FROM dedup_sink GROUP BY event_id"
    )
    # every event exactly once despite arriving twice in separate batches
    assert got.filter(F.col("n") > 1).count() == 0
    assert got.count() == ev.select("event_id").distinct().count()


def test_batch_twin_matches_window_spelling(spark, sf_dir):
    """dedup_first_occurrence (batch twin) keeps exactly one row per
    key and it is the (ts, event_id)-minimal one."""
    from etl_generator_demo_spark.catalog import read_table
    from etl_generator_demo_spark.streaming.dedup import dedup_first_occurrence

    ev = read_table(spark, sf_dir, "events")
    first = dedup_first_occurrence(ev)
    # one row per key
    assert (
        first.groupBy("user_id", "event_type").count().filter("count > 1").count()
        == 0
    )
    # winner is the key-minimum (ts, event_id)
    mins = ev.groupBy("user_id", "event_type").agg(
        F.min(F.struct("ts", "event_id")).alias("m")
    )
    joined = first.join(mins, ["user_id", "event_type"])
    assert (
        joined.filter(
            (F.col("ts") != F.col("m.ts")) | (F.col("event_id") != F.col("m.event_id"))
        ).count()
        == 0
    )
    assert first.count() == mins.count()


class TestUnionDedupTwoSources:
    """Round 9: union-ingest idempotency across TWO file sources —
    the overlap keys (delivered by both feeds) and the replayed
    duplicates (every backfill file written twice) must each survive
    exactly once in the fused output."""

    def test_two_source_union_dedup_exactly_once(
        self, spark, sf_dir, tmp_path_factory
    ):
        from etl_generator_demo_spark.catalog import read_table
        from etl_generator_demo_spark.streaming.dedup import stream_union_dedup

        ev = read_table(spark, sf_dir, "events").select(
            "event_id", "user_id", "event_type", "ts", "value"
        )
        root = tmp_path_factory.mktemp("uniondedup")
        src_a, src_b = str(root / "a"), str(root / "b")
        # primary feed: click/view/signup; backfill feed: view/signup/
        # purchase/error — view+signup arrive through BOTH feeds, and
        # the backfill feed is additionally written twice (replay)
        a = ev.filter(F.col("event_type").isin("click", "view", "signup"))
        b = ev.filter(
            F.col("event_type").isin("view", "signup", "purchase", "error")
        )
        a.coalesce(1).write.mode("append").parquet(src_a)
        b.coalesce(1).write.mode("append").parquet(src_b)
        b.coalesce(1).write.mode("append").parquet(src_b)  # replayed backfill

        def feed(path):
            return (
                spark.readStream.schema(ev.schema)
                .option("maxFilesPerTrigger", 1)
                .parquet(path)
                .withWatermark("ts", "40 days")
            )

        q = (
            stream_union_dedup([feed(src_a), feed(src_b)], keys=("event_id",))
            .writeStream.format("memory")
            .queryName("union_dedup_sink")
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(180)

        got = spark.sql(
            "SELECT event_id, COUNT(*) AS n FROM union_dedup_sink GROUP BY event_id"
        )
        assert got.filter(F.col("n") > 1).count() == 0  # exactly once
        expect_ids = a.select("event_id").union(b.select("event_id")).distinct()
        assert got.count() == expect_ids.count()  # full A-union-B coverage
