"""TxTable — optimistic-commit transaction log (round 14).

The claim under test is the one the staged-swap layer could not make:
MULTI-WRITER safety without any external lock. Writers race on the
put-if-absent version claim; losers of read-modify-write races
re-execute from the fresh snapshot, so no committed effect is ever
lost (the lost-update anomaly is the explicit regression pin here).
"""

from __future__ import annotations

import os
import threading

import pytest
from pyspark.sql import functions as F

from etl_generator_demo_spark.sources.txlog import CommitConflict, TxTable


def _mk(spark, tmp_path, rows=None):
    df = spark.createDataFrame(
        rows if rows is not None else [(k, k * 10) for k in range(10)],
        "k long, v long",
    )
    return TxTable.create(spark, str(tmp_path / "t"), df)


def test_create_read_history(spark, tmp_path):
    tab = _mk(spark, tmp_path)
    assert tab.latest_version() == 0
    assert tab.read().count() == 10
    (h,) = tab.history()
    assert h["op"] == "create" and h["version"] == 0


def test_dml_sequence_and_time_travel(spark, tmp_path):
    tab = _mk(spark, tmp_path)
    tab.append(spark.createDataFrame([(k, k * 10) for k in range(10, 15)], "k long, v long"))
    tab.delete("k % 2 = 1")
    tab.update({"v": "v + 1"}, "k < 4")
    tab.merge(
        spark.createDataFrame([(0, 999), (100, 1000)], "k long, v long"), ["k"]
    )
    ops = [h["op"] for h in tab.history()]
    assert ops == ["create", "append", "delete", "update", "merge"]
    # time travel reconstructs every intermediate state
    assert tab.read(version=0).count() == 10
    assert tab.read(version=1).count() == 15
    assert tab.read(version=2).count() == 8  # evens 0..14
    v3 = {r["k"]: r["v"] for r in tab.read(version=3).collect()}
    assert v3[0] == 1 and v3[2] == 21 and v3[4] == 40
    v4 = {r["k"]: r["v"] for r in tab.read(version=4).collect()}
    assert v4[0] == 999 and v4[100] == 1000 and len(v4) == 9


def test_create_twice_raises(spark, tmp_path):
    _mk(spark, tmp_path)
    with pytest.raises(FileExistsError):
        TxTable.create(
            spark, str(tmp_path / "t"), spark.createDataFrame([(1, 1)], "k long, v long")
        )


def test_merge_duplicate_source_keys_raise(spark, tmp_path):
    tab = _mk(spark, tmp_path)
    with pytest.raises(ValueError):
        tab.merge(
            spark.createDataFrame([(1, 1), (1, 2)], "k long, v long"), ["k"]
        )


def test_concurrent_appends_all_commit_without_lock(spark, tmp_path):
    """8 threads append concurrently with NO external serialization:
    every commit lands (dense versions), no rows lost."""
    tab = _mk(spark, tmp_path, rows=[(0, 0)])
    n_writers, rows_each = 8, 5
    errs = []

    def writer(i):
        try:
            df = spark.createDataFrame(
                [(1000 * i + j, i) for j in range(rows_each)], "k long, v long"
            )
            TxTable(spark, str(tmp_path / "t")).append(df)
        except Exception as e:  # pragma: no cover
            errs.append(e)

    ts = [threading.Thread(target=writer, args=(i,)) for i in range(n_writers)]
    [t.start() for t in ts]
    [t.join() for t in ts]
    assert not errs
    assert tab.latest_version() == n_writers  # v0 + 8 appends, dense
    assert tab.read().count() == 1 + n_writers * rows_each
    # every version file parses and chains read_version correctly
    for h in tab.history()[1:]:
        assert h["op"] == "append"


def test_concurrent_updates_no_lost_update(spark, tmp_path):
    """The lost-update anomaly: two unsynchronized v = v + 1 writers
    must BOTH apply (flockless — the optimistic retry serializes)."""
    tab = _mk(spark, tmp_path, rows=[(1, 0)])
    errs = []

    def bump():
        try:
            TxTable(spark, str(tmp_path / "t")).update({"v": "v + 1"}, "k = 1")
        except Exception as e:  # pragma: no cover
            errs.append(e)

    ts = [threading.Thread(target=bump) for _ in range(4)]
    [t.start() for t in ts]
    [t.join() for t in ts]
    assert not errs
    (row,) = tab.read().collect()
    assert row["v"] == 4  # all four increments applied, in some order
    assert tab.latest_version() == 4


def test_snapshot_isolation_pinned_read(spark, tmp_path):
    """A reader pinned to a version sees the same data after later
    commits (immutable files + manifest pinning)."""
    tab = _mk(spark, tmp_path)
    pinned = tab.read(version=0)
    tab.delete("k >= 0")  # wipe everything at v1
    assert tab.read().count() == 0
    assert pinned.count() == 10  # the pinned snapshot is untouched


def test_put_if_absent_claim(spark, tmp_path):
    tab = _mk(spark, tmp_path)
    m = tab._read_manifest(0)
    assert tab._try_commit(0, m) is False  # taken
    assert tab._try_commit(1, dict(m, op="noop")) is True
    assert tab.latest_version() == 1


def test_vacuum_removes_only_old_unreferenced_files(spark, tmp_path):
    tab = _mk(spark, tmp_path)
    v0_files = set(tab._read_manifest(0)["files"])
    tab.overwrite(spark.createDataFrame([(1, 1)], "k long, v long"))  # v1
    tab.overwrite(spark.createDataFrame([(2, 2)], "k long, v long"))  # v2
    # retain last 2 versions (v1, v2): v0's files are unreferenced
    removed = tab.vacuum(retain_last=2, min_age_sec=0)
    assert v0_files <= set(removed)
    assert tab.read(version=1).count() == 1  # retained window intact
    assert tab.read(version=2).count() == 1
    # age floor protects fresh files: a brand-new orphan survives
    orphan = os.path.join(tab.data_dir, "fresh-orphan.parquet")
    open(orphan, "w").write("x")
    assert "fresh-orphan.parquet" not in tab.vacuum(retain_last=1, min_age_sec=3600)
    os.remove(orphan)


def test_crashed_writer_leaves_no_visible_effect(spark, tmp_path):
    """Files written without a claimed manifest (a crash before
    commit) are invisible to readers and swept by vacuum."""
    tab = _mk(spark, tmp_path)
    tab._write_data_files(
        spark.createDataFrame([(99, 99)], "k long, v long")
    )  # simulated crash: files on disk, no commit
    assert tab.read().count() == 10
    assert tab.latest_version() == 0
    removed = tab.vacuum(retain_last=1, min_age_sec=0)
    assert len(removed) >= 1
    assert tab.read().count() == 10


def test_registered_query_matches_mutation_layer(spark, sf_dir):
    """The registered d_txlog_time_travel query returns one row per
    version with monotone op labels (values hash-pinned by DuckDB in
    the oracle gate; this is the cheap structural pin)."""
    from etl_generator_demo_spark.sources.txlog import d_txlog_time_travel

    rows = d_txlog_time_travel(spark, sf_dir).collect()
    assert [r["op"] for r in rows] == ["create", "append", "delete", "update", "merge"]
    assert [r["version"] for r in rows] == [0, 1, 2, 3, 4]
    assert all(r["n_rows"] >= 0 for r in rows)


# --- transactional extensions: txn idempotence, streaming sink, OPTIMIZE ---


def test_txn_append_idempotent_on_replay(spark, tmp_path):
    from etl_generator_demo_spark.sources.txlog import txn_append

    tab = _mk(spark, tmp_path, rows=[(0, 0)])
    df = spark.createDataFrame([(1, 1), (2, 2)], "k long, v long")
    v1 = txn_append(tab, df, "appA", 0)
    assert v1 == 1 and tab.read().count() == 3
    assert txn_append(tab, df, "appA", 0) is None  # replay skipped
    assert tab.read().count() == 3
    # a LOWER version for the same app is also a replay (monotone)
    assert txn_append(tab, df, "appA", -1) is None
    # a different app with the same version is NOT a replay
    assert txn_append(tab, df, "appB", 0) == 2
    assert tab.read().count() == 5


def test_txn_append_racing_duplicates_commit_once(spark, tmp_path):
    """Two unsynchronized writers carrying the SAME (app_id, txn)
    commit exactly one of themselves — the exactly-once property a
    replayed foreachBatch needs under concurrency."""
    from etl_generator_demo_spark.sources.txlog import txn_append

    tab = _mk(spark, tmp_path, rows=[(0, 0)])
    results = []

    def writer():
        df = spark.createDataFrame([(7, 7)], "k long, v long")
        results.append(txn_append(TxTable(spark, str(tmp_path / "t")), df, "app", 5))

    ts = [threading.Thread(target=writer) for _ in range(4)]
    [t.start() for t in ts]
    [t.join() for t in ts]
    committed = [r for r in results if r is not None]
    assert len(committed) == 1
    assert tab.read().filter("k = 7").count() == 1


def test_streaming_sink_exactly_once(spark, tmp_path):
    """availableNow stream -> txlog sink; DRAINING THE SAME CHECKPOINT
    twice commits nothing new, and a fresh checkpoint over the same
    source (a genuine replay without sink state) is also absorbed by
    txn idempotence."""
    from etl_generator_demo_spark.sources.txlog import txlog_stream_sink

    src = str(tmp_path / "src")
    spark.createDataFrame(
        [(k, k * 2) for k in range(20)], "k long, v long"
    ).coalesce(1).write.parquet(src)
    table = str(tmp_path / "sink_table")

    def drain(checkpoint: str):
        stream = spark.readStream.schema("k long, v long").parquet(src)
        q = (
            stream.writeStream.foreachBatch(txlog_stream_sink(table, "ingestA"))
            .trigger(availableNow=True)
            .option("checkpointLocation", checkpoint)
            .start()
        )
        q.awaitTermination(120)

    drain(str(tmp_path / "cp1"))
    tab = TxTable(spark, table)
    assert tab.read().count() == 20
    v_after_first = tab.latest_version()
    drain(str(tmp_path / "cp1"))  # same checkpoint: no new batches
    assert tab.read().count() == 20
    drain(str(tmp_path / "cp2"))  # fresh checkpoint REPLAYS batch 0
    assert tab.read().count() == 20  # absorbed by txn idempotence
    assert tab.latest_version() == v_after_first


def test_optimize_compacts_atomically_and_preserves_history(spark, tmp_path):
    from etl_generator_demo_spark.sources.txlog import optimize_txtable

    tab = _mk(spark, tmp_path, rows=[(0, 0)])
    for i in range(1, 4):
        tab.append(spark.createDataFrame([(i, i)], "k long, v long"))
    files_before = len(tab._read_manifest(tab.latest_version())["files"])
    assert files_before >= 4
    v = optimize_txtable(tab, target_files=1)
    m = tab._read_manifest(v)
    assert m["op"] == "optimize" and len(m["files"]) == 1
    assert tab.read().count() == 4  # same data
    assert tab.read(version=v - 1).count() == 4  # pre-compaction snapshot alive


# --- manifest statistics + file skipping (zone maps) -----------------------


def test_stats_recorded_and_file_skipping_after_clustering(spark, tmp_path):
    """Clustered OPTIMIZE + manifest min/max stats: a selective range
    read opens a strict subset of files (decided from the manifest
    alone) and returns exactly the predicate's rows."""
    from etl_generator_demo_spark.sources.txlog import (
        StatsTxTable,
        optimize_txtable_clustered,
    )

    df = spark.createDataFrame(
        [(k, k % 7) for k in range(2000)], "k long, v long"
    )
    path = str(tmp_path / "t")
    tab = StatsTxTable.create(spark, path, df)
    tab.stat_cols = ["k"]  # create() built via the base classmethod path
    # re-bind with stats and commit a clustered rewrite
    tab = StatsTxTable(spark, path, stat_cols=["k"])
    v = optimize_txtable_clustered(tab, ["k"], target_files=8)
    m = tab._read_manifest(v)
    assert m["op"] == "optimize" and len(m["files"]) == 8
    assert all(m["file_stats"][f].get("k") for f in m["files"])
    out, files_read, files_total = tab.read_range("k", 100, 199)
    assert files_total == 8 and files_read <= 2  # ~1/8 slice of the key
    rows = sorted(r["k"] for r in out.collect())
    assert rows == list(range(100, 200))  # exact, never a superset


def test_file_skipping_is_conservative_without_stats(spark, tmp_path):
    """Files committed WITHOUT stats (base-class writer) are always
    read — skipping must never drop data it cannot prove dead."""
    from etl_generator_demo_spark.sources.txlog import StatsTxTable, TxTable

    df = spark.createDataFrame([(k, k) for k in range(100)], "k long, v long")
    path = str(tmp_path / "t")
    TxTable.create(spark, path, df)  # no stats recorded
    tab = StatsTxTable(spark, path, stat_cols=["k"])
    out, files_read, files_total = tab.read_range("k", 10, 19)
    assert files_read == files_total  # conservative: no stats -> read all
    assert sorted(r["k"] for r in out.collect()) == list(range(10, 20))


def test_stats_carry_forward_across_appends(spark, tmp_path):
    """An append's manifest keeps the prior files' stats (no footer
    re-reads) and adds the new files'; disjoint appends skip."""
    from etl_generator_demo_spark.sources.txlog import StatsTxTable

    path = str(tmp_path / "t")
    t0 = StatsTxTable(spark, path, stat_cols=["k"])
    df_lo = spark.createDataFrame([(k, 0) for k in range(100)], "k long, v long")
    # create through the stats writer so v0 carries stats too
    files = t0._write_data_files(df_lo)
    assert t0._try_commit(
        0,
        {"op": "create", "files": files, "schema_ddl": "k long, v long", "ts": 0},
    )
    df_hi = spark.createDataFrame(
        [(k, 1) for k in range(1000, 1100)], "k long, v long"
    )
    t0.append(df_hi)
    out, files_read, files_total = t0.read_range("k", 1000, 1010)
    assert files_read < files_total  # the low-range create files skipped
    assert out.count() == 11
    out2, fr2, _ = t0.read_range("k", 5000, 6000)
    assert fr2 == 0 and out2.count() == 0  # nothing intersects: zero files
