"""The watermark drop ledger vs REAL Structured Streaming execution.

Spark 4 (multiple-stateful-operator semantics, the default) runs each
microbatch with TWO watermarks: late-event filtering uses the PREVIOUS
batch's watermark (high water through batches <= b-2, minus delay)
while state eviction — and the progress event's ``eventTime.watermark``
field — uses the current one (through b-1). The ledger models both;
this suite pins it against a real readStream + windowed aggregation:
per-batch ``numRowsDroppedByWatermark`` must equal the ledger's
``n_dropped`` and the progress watermark trajectory must equal
``wm_evict_us``."""

from __future__ import annotations

import pytest

import datetime as dt
import time

from pyspark.sql import functions as F

BASE = dt.datetime(2024, 1, 1, 12, 0, 0)


def _mins(m: float) -> dt.datetime:
    return BASE + dt.timedelta(minutes=m)


def _us(m: float) -> int:
    return int(_mins(m).replace(tzinfo=dt.timezone.utc).timestamp() * 1_000_000)


#: Planted batches (event_id, minutes-from-base), watermark delay 10m.
#: Batch maxima: 5, 61, 70, 90 minutes.
#:   b0: no watermarks yet                       -> 0 dropped
#:   b1: late wm none (needs two prior batches)  -> 0 dropped
#:   b2: late wm = 5-10 = -5min  -> -60 and -8 dropped (2)
#:   b3: late wm = 61-10 = 51min -> 45 and 50 dropped (2)
BATCHES = [
    [(1, 0.0), (2, 2.0), (3, 3.0), (4, 5.0)],
    [(101, 60.0), (102, 61.0), (103, -10.0), (104, 4.0)],
    [(201, -60.0), (202, 52.0), (203, 70.0), (204, -8.0)],
    [(301, 45.0), (302, 80.0), (303, 50.0), (304, 90.0)],
]
EXPECT_DROPS = [0, 0, 2, 2]
LATE_MINUTES = {-60.0, -8.0, 45.0, 50.0}


def _planted_df(spark):
    rows = [
        (eid, _mins(m), b)
        for b, batch in enumerate(BATCHES)
        for (eid, m) in batch
    ]
    return spark.createDataFrame(
        rows, "event_id long, ts timestamp, batch long"
    )


def test_ledger_two_watermark_semantics(spark):
    from etl_generator_demo_spark.streaming.windows import (
        watermark_drop_ledger,
    )

    ev = _planted_df(spark).select("event_id", "ts")
    led = watermark_drop_ledger(
        ev, [F.col("event_id").asc()], batch_size=4
    ).collect()
    assert [r["batch_id"] for r in led] == [0, 1, 2, 3]
    assert [r["n_dropped"] for r in led] == EXPECT_DROPS
    assert [r["n_kept"] for r in led] == [4 - d for d in EXPECT_DROPS]
    # late wm lags eviction wm by one batch
    assert led[0]["wm_late_us"] is None and led[1]["wm_late_us"] is None
    assert led[0]["wm_evict_us"] is None
    assert led[1]["wm_evict_us"] == _us(5.0 - 10.0)
    assert led[2]["wm_late_us"] == _us(5.0 - 10.0)
    assert led[2]["wm_evict_us"] == _us(61.0 - 10.0)
    assert led[3]["wm_late_us"] == _us(61.0 - 10.0)
    assert led[3]["wm_evict_us"] == _us(70.0 - 10.0)


@pytest.mark.slow
def test_ledger_matches_real_stream(spark, tmp_path):
    """Replay the planted batches through readStream + withWatermark +
    1-second-window aggregation (update mode: every admitted row's
    window emits in its batch) and assert Spark's own per-batch
    numRowsDroppedByWatermark, watermark trajectory, and admitted
    window set all equal the ledger."""
    import json

    from etl_generator_demo_spark.streaming.windows import (
        watermark_drop_ledger,
    )

    src = tmp_path / "src"
    df = _planted_df(spark)
    for b in range(len(BATCHES)):
        (
            df.filter(F.col("batch") == b)
            .select("event_id", "ts")
            .coalesce(1)
            .write.mode("append")
            .parquet(str(src))
        )
        time.sleep(0.15)  # strictly increasing mtimes -> replay order

    stream = (
        spark.readStream.schema("event_id long, ts timestamp")
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src))
        .withWatermark("ts", "10 minutes")
        .groupBy(F.window("ts", "1 second").alias("w"))
        .agg(F.count(F.lit(1)).alias("n"))
    )
    q = (
        stream.writeStream.format("memory")
        .queryName("wm_ledger_probe")
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)

    led = watermark_drop_ledger(
        df.select("event_id", "ts"), [F.col("event_id").asc()], batch_size=4
    ).collect()

    got_drops, got_wm = {}, {}
    for p in q.recentProgress:
        d = json.loads(p.json)
        if d["numInputRows"] > 0 and d.get("stateOperators"):
            bid = int(d["batchId"])
            got_drops[bid] = int(
                d["stateOperators"][0]["numRowsDroppedByWatermark"]
            )
            w = d["eventTime"]["watermark"]
            us = int(
                dt.datetime.fromisoformat(w.replace("Z", "+00:00")).timestamp()
                * 1_000_000
            )
            got_wm[bid] = None if us <= 0 else us

    for r in led:
        assert got_drops[r["batch_id"]] == r["n_dropped"], r["batch_id"]
        assert got_wm[r["batch_id"]] == r["wm_evict_us"], r["batch_id"]
    assert [r["n_dropped"] for r in led] == EXPECT_DROPS

    # admitted set: update mode emits one row per admitted (unique) ts
    out = spark.sql(
        "SELECT DISTINCT CAST(w.start AS STRING) s FROM wm_ledger_probe"
    ).collect()
    want_windows = {
        str(_mins(m))
        for batch in BATCHES
        for (_e, m) in batch
        if m not in LATE_MINUTES
    }
    assert {r["s"] for r in out} == want_windows


def test_batch_size_knob_monotone_drops(spark):
    """Bigger microbatches advance the watermark less often, so the
    planted batches' total drops are non-increasing in batch size:
    size 4 drops exactly the 4 planted late rows, size 16 (one batch,
    no prior-batch watermark) drops none."""
    from etl_generator_demo_spark.streaming.windows import (
        watermark_drop_ledger,
    )

    ev = _planted_df(spark).select("event_id", "ts")
    tot = {}
    for s in (4, 8, 16):
        led = watermark_drop_ledger(
            ev, [F.col("event_id").asc()], batch_size=s
        ).collect()
        tot[s] = sum(r["n_dropped"] for r in led)
    assert tot[4] == sum(EXPECT_DROPS)
    assert tot[16] == 0
    assert tot[4] >= tot[8] >= tot[16]
