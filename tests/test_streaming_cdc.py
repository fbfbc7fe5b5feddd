"""Streaming CDC apply: real file-stream execution of the running
snapshot fold. The batch twin is oracle-pinned; these tests pin the
STREAMING path — latest-op-wins across micro-batch boundaries,
tombstones deleting keys born in earlier batches, re-inserts
resurrecting keys tombstoned in earlier batches, and complete-mode
state equaling the batch twin on the same data."""

from __future__ import annotations

from datetime import datetime

import pytest
from pyspark.sql import functions as F

SCHEMA = (
    "user_id long, event_id long, ts timestamp, op string,"
    " value_cents long"
)


def _rows(spec):
    return [
        (u, e, datetime(2024, 1, 1, 0, 0, s), op, v)
        for (u, e, s, op, v) in spec
    ]


def _run_stream(spark, src_dir) -> dict[int, dict]:
    from etl_generator_demo_spark.streaming.cdc import (
        stream_cdc_running_state,
    )

    stream = (
        spark.readStream.schema(SCHEMA)
        .option("maxFilesPerTrigger", 1)  # one slice per micro-batch
        .parquet(str(src_dir))
    )
    q = (
        stream_cdc_running_state(stream)
        .writeStream.format("memory")
        .queryName("cdc_sink")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    out = spark.sql("SELECT * FROM cdc_sink").collect()
    spark.catalog.dropTempView("cdc_sink")
    return {r["user_id"]: r.asDict() for r in out}


@pytest.fixture()
def sliced_src(spark, tmp_path):
    """Three micro-batch slices exercising every cross-batch
    transition: update-over-batch, delete-after-birth, and
    resurrection-after-delete."""
    slices = [
        # batch 1: three births
        [(1, 10, 1, "I", 100), (2, 20, 1, "I", 200), (3, 30, 1, "I", 300)],
        # batch 2: update user 1, tombstone user 2
        [(1, 11, 2, "U", 150), (2, 21, 2, "D", 0)],
        # batch 3: resurrect user 2, tombstone user 3
        [(2, 22, 3, "I", 999), (3, 31, 3, "D", 0)],
    ]
    src = tmp_path / "cdcsrc"
    for spec in slices:
        df = spark.createDataFrame(_rows(spec), SCHEMA)
        df.coalesce(1).write.mode("append").parquet(str(src))
    return src


@pytest.mark.slow
def test_stream_cdc_cross_batch_transitions(spark, sliced_src):
    got = _run_stream(spark, sliced_src)
    assert set(got) == {1, 2}  # user 3 tombstoned in the last batch
    assert got[1]["last_op"] == "U"
    assert got[1]["last_value_cents"] == 150  # batch-2 update won
    assert got[2]["last_op"] == "I"
    assert got[2]["last_value_cents"] == 999  # resurrection after D


def test_stream_cdc_matches_batch_twin_on_fixture(spark, tmp_path):
    """Complete-mode streaming state over the real events feed equals
    the oracle-pinned batch twin row-for-row."""
    from etl_generator_demo_spark.operators.relational import t
    from etl_generator_demo_spark.operators.surfaces_r11 import _CDC_OP_SQL
    from etl_generator_demo_spark.streaming.cdc import (
        st_cdc_running_snapshot,
    )

    sf = "/root/testdata/sf0.001"
    log = t(spark, sf, "events").select(
        "user_id",
        "event_id",
        F.col("ts").cast("timestamp").alias("ts"),
        F.expr(_CDC_OP_SQL).alias("op"),
        F.round(F.col("value") * 100, 0).cast("long").alias("value_cents"),
    )
    src = tmp_path / "evsrc"
    # two arbitrary slices so the stream crosses a batch boundary
    log.filter(F.col("event_id") % 2 == 0).coalesce(1).write.mode(
        "append"
    ).parquet(str(src))
    log.filter(F.col("event_id") % 2 == 1).coalesce(1).write.mode(
        "append"
    ).parquet(str(src))
    got = _run_stream(spark, src)
    want = {
        r["user_id"]: r.asDict()
        for r in st_cdc_running_snapshot(spark, sf).collect()
    }
    assert got == want
