"""The stream-stream join STATE ledger vs REAL Structured Streaming
execution.

A StreamingSymmetricHashJoin buffers both inputs; per batch it reports
``numRowsTotal`` — the join's memory bill. The ledger models it as:
``wm_evict(b) = min(left hw, right hw)(b-1) - delay``; a left row is
in state iff ``ts >= wm_evict - gap``, a right row iff
``ts >= wm_evict`` (rows exactly AT the boundary are KEPT — planted
here at both thresholds). Spark's mechanism is asymmetric (right rows
are stored then evicted at batch end and count in ``numRowsRemoved``;
left rows below the threshold are never stored), so the ledger pins
``numRowsTotal`` and the watermark trajectory, not the removal
counter."""

from __future__ import annotations

import pytest

import datetime as dt
import json
import time

from pyspark.sql import functions as F

BASE = dt.datetime(2024, 1, 1, 12, 0, 0)
DELAY_US = 10 * 60 * 1_000_000
GAP_US = 30 * 60 * 1_000_000


def _mins(m: float) -> dt.datetime:
    return BASE + dt.timedelta(minutes=m)


def _us(m: float) -> int:
    return int(_mins(m).replace(tzinfo=dt.timezone.utc).timestamp() * 1_000_000)


#: Planted batches: (event_id, minutes). Watermark delay 10m, join gap
#: 30m. b0 pins both high waters at 100 -> wm_evict(b1) = 90min:
#:   click 60 sits exactly AT wm - gap (kept), 59.5 below (gone);
#:   purchase 90 exactly AT wm (kept), 89.5 below (gone).
L_BATCHES = [
    [(1, 100.0)],
    [(2, 60.0), (3, 59.5)],
    [(4, 200.0)],
    [(5, 400.0)],
]
R_BATCHES = [
    [(101, 100.0)],
    [(102, 90.0), (103, 89.5)],
    [(104, 200.0)],
    [(105, 400.0)],
]
#: state_total per batch: b0 all 2 (no watermark yet); b1 wm=90 ->
#: clicks {100,60} + purchases {100,90} = 4; b2 wm still 90 (lagged
#: min of b1 high waters = 100) -> +2 = 6; b3 wm=190 -> clicks>=160
#: {200,400} + purchases>=190 {200,400} = 4.
EXPECT_TOTAL = [2, 4, 6, 4]
EXPECT_WM = [None, _us(90.0), _us(90.0), _us(190.0)]


def _sides(spark):
    l_rows = [
        (e, _mins(m), b, 7)
        for b, batch in enumerate(L_BATCHES)
        for e, m in batch
    ]
    r_rows = [
        (e, _mins(m), b, 7)
        for b, batch in enumerate(R_BATCHES)
        for e, m in batch
    ]
    schema = "event_id long, ts timestamp, batch long, user_id long"
    return (
        spark.createDataFrame(l_rows, schema),
        spark.createDataFrame(r_rows, schema),
    )


def _ledger(spark):
    from etl_generator_demo_spark.streaming.joins import join_state_ledger

    ldf, rdf = _sides(spark)
    prep = lambda df: df.select(
        F.col("batch").alias("batch_id"),
        F.unix_micros(F.col("ts")).alias("ts_us"),
    )
    return join_state_ledger(
        prep(ldf), prep(rdf), gap_us=GAP_US, delay_us=DELAY_US
    ).collect()


def test_ledger_closed_form(spark):
    led = _ledger(spark)
    assert [r["ledger_batch"] for r in led] == [0, 1, 2, 3]
    assert [r["state_total"] for r in led] == EXPECT_TOTAL
    assert [r["wm_evict_us"] for r in led] == EXPECT_WM
    # per-side split: boundary rows kept on BOTH sides at b1
    assert (led[1]["state_left"], led[1]["state_right"]) == (2, 2)
    assert (led[3]["state_left"], led[3]["state_right"]) == (2, 2)


@pytest.mark.slow
def test_ledger_matches_real_stream(spark, tmp_path):
    """Replay the planted batches through a REAL two-source
    stream-stream interval join (file sources, one file per side per
    trigger) and assert Spark's own per-batch state-store size
    (``numRowsTotal``) and watermark trajectory equal the ledger."""
    ldir, rdir = tmp_path / "l", tmp_path / "r"
    ldf, rdf = _sides(spark)
    for b in range(len(L_BATCHES)):
        for df, out in ((ldf, ldir), (rdf, rdir)):
            (
                df.filter(F.col("batch") == b)
                .select("event_id", "ts", "user_id")
                .coalesce(1)
                .write.mode("append")
                .parquet(str(out))
            )
            time.sleep(0.15)  # strictly increasing mtimes -> replay order

    c = (
        spark.readStream.schema("event_id long, ts timestamp, user_id long")
        .option("maxFilesPerTrigger", 1)
        .parquet(str(ldir))
        .withWatermark("ts", "10 minutes")
        .select(
            F.col("event_id").alias("click_id"),
            F.col("ts").alias("click_ts"),
            F.col("user_id").alias("c_user"),
        )
    )
    p = (
        spark.readStream.schema("event_id long, ts timestamp, user_id long")
        .option("maxFilesPerTrigger", 1)
        .parquet(str(rdir))
        .withWatermark("ts", "10 minutes")
        .select(
            F.col("event_id").alias("purchase_id"),
            F.col("ts").alias("purchase_ts"),
            "user_id",
        )
    )
    j = p.join(
        c,
        (F.col("click_ts") <= F.col("purchase_ts"))
        & (
            F.col("click_ts")
            >= F.col("purchase_ts") - F.expr("INTERVAL 30 MINUTES")
        )
        # single planted user: the equi arm Spark requires, matching
        # every cross-side pair like the registered query's user key
        & (F.col("user_id") == F.col("c_user")),
    )
    q = (
        j.writeStream.format("memory")
        .queryName("jsl_parity")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)

    got_total, got_wm = {}, {}
    for pr in q.recentProgress:
        d = json.loads(pr.json)
        if d.get("stateOperators") and d["numInputRows"] > 0:
            bid = int(d["batchId"])
            got_total[bid] = int(d["stateOperators"][0]["numRowsTotal"])
            w = d["eventTime"]["watermark"]
            us = int(
                dt.datetime.fromisoformat(w.replace("Z", "+00:00")).timestamp()
                * 1_000_000
            )
            got_wm[bid] = None if us <= 0 else us

    led = _ledger(spark)
    for r in led:
        b = r["ledger_batch"]
        assert got_total[b] == r["state_total"], b
        assert got_wm[b] == r["wm_evict_us"], b


def test_delay_knob_grows_state_exactly(spark):
    """Same planted batches at delay=60min: wm stays 60min behind, so
    b1 keeps ALL six rows (wm=40: clicks >= 10, purchases >= 40) and
    b2 peaks at 8; closed-form trajectory [2, 6, 8, 4]."""
    from etl_generator_demo_spark.streaming.joins import join_state_ledger

    ldf, rdf = _sides(spark)
    prep = lambda df: df.select(
        F.col("batch").alias("batch_id"),
        F.unix_micros(F.col("ts")).alias("ts_us"),
    )
    led = join_state_ledger(
        prep(ldf), prep(rdf), gap_us=GAP_US, delay_us=60 * 60 * 1_000_000
    ).collect()
    assert [r["state_total"] for r in led] == [2, 6, 8, 4]


@pytest.mark.slow
def test_empty_side_batch_keeps_high_water_real_stream(spark, tmp_path):
    """A batch where one side delivers NO rows must not reset that
    side's high water (the bug the randomized differential caught in
    the ledger's first spelling): plant L empty at b1 and assert the
    REAL query's watermark still advances off the b0 high waters, and
    per-batch numRowsTotal equals the forward-filled ledger."""
    plan_l = [[(1, 100.0)], [], [(2, 130.0)]]
    plan_r = [[(101, 100.0)], [(102, 120.0)], [(103, 130.0)]]
    ldir, rdir = tmp_path / "l", tmp_path / "r"
    for b in range(3):
        for plan, out in ((plan_l, ldir), (plan_r, rdir)):
            spark.createDataFrame(
                [(e, _mins(m), 7) for e, m in plan[b]],
                "event_id long, ts timestamp, user_id long",
            ).coalesce(1).write.mode("append").parquet(str(out))
            time.sleep(0.15)

    c = (
        spark.readStream.schema("event_id long, ts timestamp, user_id long")
        .option("maxFilesPerTrigger", 1)
        .parquet(str(ldir))
        .withWatermark("ts", "10 minutes")
        .select(
            F.col("event_id").alias("click_id"),
            F.col("ts").alias("click_ts"),
            F.col("user_id").alias("c_user"),
        )
    )
    p = (
        spark.readStream.schema("event_id long, ts timestamp, user_id long")
        .option("maxFilesPerTrigger", 1)
        .parquet(str(rdir))
        .withWatermark("ts", "10 minutes")
        .select(
            F.col("event_id").alias("purchase_id"),
            F.col("ts").alias("purchase_ts"),
            "user_id",
        )
    )
    j = p.join(
        c,
        (F.col("click_ts") <= F.col("purchase_ts"))
        & (
            F.col("click_ts")
            >= F.col("purchase_ts") - F.expr("INTERVAL 30 MINUTES")
        )
        & (F.col("user_id") == F.col("c_user")),
    )
    q = (
        j.writeStream.format("memory")
        .queryName("jsl_emptyside")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)

    got_total, got_wm = {}, {}
    for pr in q.recentProgress:
        d = json.loads(pr.json)
        if d.get("stateOperators") and d["numInputRows"] > 0:
            bid = int(d["batchId"])
            got_total[bid] = int(d["stateOperators"][0]["numRowsTotal"])
            w = d["eventTime"]["watermark"]
            us = int(
                dt.datetime.fromisoformat(w.replace("Z", "+00:00")).timestamp()
                * 1_000_000
            )
            got_wm[bid] = None if us <= 0 else us

    from etl_generator_demo_spark.streaming.joins import join_state_ledger

    mk = lambda plan: spark.createDataFrame(
        [
            (b, int(_mins(m).replace(tzinfo=dt.timezone.utc).timestamp() * 1e6))
            for b, batch in enumerate(plan)
            for e, m in batch
        ],
        "batch_id long, ts_us long",
    )
    led = join_state_ledger(
        mk(plan_l), mk(plan_r), gap_us=GAP_US, delay_us=DELAY_US
    ).collect()
    assert [r["state_total"] for r in led] == [2, 3, 5]
    assert [r["wm_evict_us"] for r in led] == [None, _us(90.0), _us(90.0)]
    for r in led:
        b = r["ledger_batch"]
        assert got_total[b] == r["state_total"], b
        assert got_wm[b] == r["wm_evict_us"], b
