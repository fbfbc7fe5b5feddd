"""applyInPandasWithState: real streaming execution with state across
micro-batches; final per-user counts must equal the batch aggregation."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F


@pytest.fixture(scope="module")
def staged_stream_dir(spark, sf_dir, tmp_path_factory):
    """Events written as 5 time-ordered range partitions: streamed one
    file per trigger they replay the month in order, so the watermark
    advances monotonically instead of dropping out-of-order history."""
    from etl_generator_demo_spark.catalog import read_table

    ev = read_table(spark, sf_dir, "events").select("user_id", "ts", "value")
    src = tmp_path_factory.mktemp("stateful") / "src"
    # one file per time slice, written SEQUENTIALLY: the file streaming
    # source replays oldest-modification-first, so ascending mtimes give
    # a deterministic in-time-order replay (monotone watermark).
    bounds = ev.agg(F.min("ts").alias("lo"), F.max("ts").alias("hi")).first()
    lo, hi = bounds["lo"], bounds["hi"]
    step = (hi - lo) / 5
    for k in range(5):
        a = lo + k * step
        b = hi if k == 4 else lo + (k + 1) * step
        sl = ev.filter((F.col("ts") >= a) & (F.col("ts") <= b if k == 4 else F.col("ts") < b))
        sl.coalesce(1).write.mode("append").parquet(str(src))
    return ev, str(src)


def _run(spark, src, schema, timeout_minutes, name, watermark="10 minutes"):
    from etl_generator_demo_spark.streaming.stateful import running_user_stats

    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
        .withWatermark("ts", watermark)
    )
    q = (
        running_user_stats(stream, timeout_minutes=timeout_minutes)
        .writeStream.format("memory")
        .queryName(name)
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)


def test_state_accumulates_across_microbatches(spark, staged_stream_dir):
    ev, src = staged_stream_dir
    # timeout longer than the whole history -> no eviction; watermark
    # lag longer than the history -> no late-drop regardless of the
    # order micro-batches replay the files. The final update per user
    # must equal the batch aggregate exactly.
    _run(
        spark, src, ev.schema,
        timeout_minutes=100_000, name="stats_noevict", watermark="40 days",
    )
    got = {
        r["user_id"]: (r["n_events"], r["total_value"])
        for r in spark.sql(
            """
            SELECT user_id, n_events, total_value
            FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY user_id
                                               ORDER BY n_events DESC) rn
                  FROM stats_noevict) WHERE rn = 1
            """
        ).collect()
    }
    want = {
        r["user_id"]: (r["n"], r["total"])
        for r in ev.groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("n"), F.round(F.sum("value"), 2).alias("total"))
        .collect()
    }
    assert set(got) == set(want) and len(want) > 10
    for u in want:
        assert got[u][0] == want[u][0], f"user {u} count"
        assert abs(got[u][1] - want[u][1]) < 0.05, f"user {u} total"


def test_idle_timeout_finalizes_and_evicts(spark, staged_stream_dir):
    ev, src = staged_stream_dir
    # 30-minute idle timeout over a month of events: users go idle and
    # are finalized (state evicted), then restart on their next event
    _run(spark, src, ev.schema, timeout_minutes=30, name="stats_evict")
    rows = spark.sql("SELECT status, COUNT(*) n FROM stats_evict GROUP BY status").collect()
    by_status = {r["status"]: r["n"] for r in rows}
    assert by_status.get("finalized", 0) > 0, "timeout never fired"
    assert by_status.get("active", 0) > 0
