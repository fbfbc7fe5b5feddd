"""Engine-level checkpoint recovery: a restarted streaming query must
resume from its OFFSET LOG (never reprocess consumed files) and from
its STATE STORE (a dedup key seen before the restart is still a dup
after it). The custom-sink crash tests (test_streaming_sinks.py) pin
the sink side; this pins Spark's own checkpointLocation contract the
streaming layer's docstrings lean on."""

from __future__ import annotations

import pytest

import datetime as dt
import time

from pyspark.sql import functions as F

BASE = dt.datetime(2024, 1, 1, 12, 0, 0)


def _write_batch(spark, src, rows):
    spark.createDataFrame(
        [(k, BASE + dt.timedelta(minutes=m)) for k, m in rows],
        "k long, ts timestamp",
    ).coalesce(1).write.mode("append").parquet(str(src))
    time.sleep(0.15)


def _run_once(spark, src, out, cp):
    q = (
        spark.readStream.schema("k long, ts timestamp")
        .parquet(str(src))
        .withWatermark("ts", "10 minutes")
        .dropDuplicates(["k"])
        .writeStream.format("parquet")
        .option("path", str(out))
        .option("checkpointLocation", str(cp))
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    return q


@pytest.mark.slow
def test_restart_recovers_offsets_and_dedup_state(spark, tmp_path):
    src, out, cp = tmp_path / "src", tmp_path / "out", tmp_path / "cp"

    # phase 1: keys 1, 2
    _write_batch(spark, src, [(1, 0.0), (2, 1.0)])
    q1 = _run_once(spark, src, out, cp)
    got1 = sorted(r["k"] for r in spark.read.parquet(str(out)).collect())
    assert got1 == [1, 2]
    b1 = max(int(p.batchId) for p in q1.recentProgress)

    # phase 2: key 2 again (must be deduped by RECOVERED state) + key 3
    _write_batch(spark, src, [(2, 2.0), (3, 3.0)])
    q2 = _run_once(spark, src, out, cp)

    got2 = sorted(r["k"] for r in spark.read.parquet(str(out)).collect())
    # offset recovery: phase-1 files not reprocessed (no duplicate 1);
    # state recovery: the replayed key 2 is still a dup
    assert got2 == [1, 2, 3]
    # batch ids continue from the checkpoint, not from zero
    b2 = [int(p.batchId) for p in q2.recentProgress if p.numInputRows > 0]
    assert b2 and min(b2) > b1
