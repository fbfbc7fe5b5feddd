"""JDBC option building (S1-S3), parquet UPDATE/DELETE rewrite (D1),
mandatory-filter enforcement (P5), and a REAL Structured Streaming
execution (file source -> watermark -> window agg -> memory sink)."""

from __future__ import annotations

import shutil

import pytest
from pyspark.sql import functions as F


class TestJDBC:
    def test_url_templates(self):
        from etl_generator_demo_spark.sources.jdbc import JDBCConnection

        pg = JDBCConnection("postgresql", "db.example.com", "shop", "u", "p")
        assert pg.url() == "jdbc:postgresql://db.example.com:5432/shop"
        my = JDBCConnection("mysql", "h", "hr", "u", "p", port=3307)
        assert my.url() == "jdbc:mysql://h:3307/hr"
        with pytest.raises(ValueError):
            JDBCConnection("oracle", "h", "d", "u", "p").url()

    def test_options_pushdown_and_partitioning(self):
        from etl_generator_demo_spark.sources.jdbc import JDBCConnection, jdbc_options

        conn = JDBCConnection("postgresql", "h", "d", "u", "p")
        opts = jdbc_options(conn, "orders", partition_on="o_orderkey",
                            lower_bound=0, upper_bound=1_000_000, num_partitions=16)
        assert opts["pushDownPredicate"] == "true"
        assert opts["partitionColumn"] == "o_orderkey"
        assert opts["numPartitions"] == "16"
        with pytest.raises(ValueError):
            jdbc_options(conn, "orders", partition_on="k")  # missing bounds

    def test_lazy_read_builds_without_server(self, spark):
        from etl_generator_demo_spark.sources.jdbc import JDBCConnection, read_jdbc_table

        conn = JDBCConnection("postgresql", "localhost", "nope", "u", "p")
        # JDBC connects at ACTION time; building the reader must not
        with pytest.raises(Exception):
            read_jdbc_table(spark, conn, "orders").count()


class TestMutations:
    @pytest.fixture()
    def table_copy(self, tmp_path, sf_dir):
        dst = str(tmp_path / "orders.parquet")
        shutil.copytree(sf_dir + "/orders.parquet", dst) if False else shutil.copy(
            sf_dir + "/orders.parquet", dst
        )
        return dst

    def test_update(self, spark, table_copy):
        from etl_generator_demo_spark.sources.mutations import update_parquet

        before = spark.read.parquet(table_copy).filter("o_orderstatus = 'O'").count()
        n = update_parquet(
            spark, table_copy,
            {"o_orderstatus": "'X'"}, "o_orderstatus = 'O'",
        )
        assert n == before > 0
        after = spark.read.parquet(table_copy)
        assert after.filter("o_orderstatus = 'O'").count() == 0
        assert after.filter("o_orderstatus = 'X'").count() == before

    def test_update_unknown_column_rejected_and_source_intact(self, spark, table_copy):
        from etl_generator_demo_spark.sources.mutations import update_parquet

        total = spark.read.parquet(table_copy).count()
        with pytest.raises(ValueError):
            update_parquet(spark, table_copy, {"nope": "1"}, "o_orderkey = 1")
        assert spark.read.parquet(table_copy).count() == total

    def test_delete(self, spark, table_copy):
        from etl_generator_demo_spark.sources.mutations import delete_parquet

        total = spark.read.parquet(table_copy).count()
        n = delete_parquet(spark, table_copy, "o_totalprice > 200000")
        after = spark.read.parquet(table_copy).count()
        assert n > 0 and after == total - n
        assert spark.read.parquet(table_copy).filter("o_totalprice > 200000").count() == 0


class TestMandatoryFilters:
    def test_view_layer_enforcement(self, spark, sf_dir):
        from etl_generator_demo_spark.catalog import Catalog
        from etl_generator_demo_spark.engine import ExecutionEngine

        cat = Catalog(spark, sf_dir, table_filters={"orders": ["o_orderstatus <> 'F'"]})
        cat.register_views(("orders",))
        eng = ExecutionEngine(spark)
        res = eng.execute("SELECT DISTINCT o_orderstatus AS s FROM orders", limit=None)
        assert {r["s"] for r in res.rows} == {"O", "P"}
        # hand-written SQL cannot see soft-deleted rows either
        res = eng.execute("SELECT count(*) AS n FROM orders WHERE o_orderstatus='F'", limit=None)
        assert res.rows[0]["n"] == 0
        # restore unfiltered views for other tests
        Catalog(spark, sf_dir).register_views()

    def test_filter_reaches_parquet_scan(self, spark, sf_dir):
        from etl_generator_demo_spark.catalog import Catalog

        cat = Catalog(spark, sf_dir, table_filters={"orders": ["o_totalprice > 1000"]})
        cat.register_views(("orders",))
        plan = (
            spark.sql("SELECT o_orderkey FROM orders")
            ._jdf.queryExecution().executedPlan().toString()
        )
        assert "PushedFilters: [IsNotNull(o_totalprice), GreaterThan(o_totalprice,1000.0)" in plan
        Catalog(spark, sf_dir).register_views()


class TestRealStreamingExecution:
    @pytest.mark.slow
    def test_file_source_window_agg_matches_batch(self, spark, sf_dir, tmp_path):
        """End-to-end Structured Streaming: stream the events parquet
        through withWatermark + tumbling window, availableNow trigger,
        memory sink; results must equal the batch computation."""
        from etl_generator_demo_spark.catalog import read_table

        ev_batch = read_table(spark, sf_dir, "events")
        # stage as a streaming-source dir with micro-batched files
        src = tmp_path / "stream_src"
        ev_batch.repartition(4).write.parquet(str(src))

        stream = (
            spark.readStream.schema(ev_batch.schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(str(src))
            .withWatermark("ts", "10 minutes")
            .groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
            .agg(F.count(F.lit(1)).alias("n"))
        )
        q = (
            stream.writeStream.format("memory")
            .queryName("win_counts")
            .outputMode("complete")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        got = {
            (r["w"]["start"], r["event_type"]): r["n"]
            for r in spark.sql("SELECT * FROM win_counts").collect()
        }
        want = {
            (r["w"]["start"], r["event_type"]): r["n"]
            for r in ev_batch.groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
            .agg(F.count(F.lit(1)).alias("n"))
            .collect()
        }
        assert got == want and len(want) > 50


class TestMergeAndRecovery:
    @pytest.fixture()
    def kv_table(self, spark, tmp_path):
        path = str(tmp_path / "kv")
        spark.createDataFrame(
            [(1, "a", 10.0), (2, "b", 20.0), (3, "c", 30.0)], "k long, name string, v double"
        ).write.parquet(path)
        return path

    def test_merge_updates_and_inserts(self, spark, kv_table):
        from etl_generator_demo_spark.sources.mutations import merge_parquet

        src = spark.createDataFrame(
            [(2, "B", 99.0), (4, "d", 40.0)], "k long, name string, v double"
        )
        n_upd, n_ins = merge_parquet(spark, kv_table, src, ["k"])
        assert (n_upd, n_ins) == (1, 1)
        rows = {r["k"]: (r["name"], r["v"]) for r in spark.read.parquet(kv_table).collect()}
        assert rows == {1: ("a", 10.0), 2: ("B", 99.0), 3: ("c", 30.0), 4: ("d", 40.0)}

    def test_merge_rejects_duplicate_source_keys(self, spark, kv_table):
        from etl_generator_demo_spark.sources.mutations import merge_parquet

        src = spark.createDataFrame(
            [(2, "B", 1.0), (2, "C", 2.0)], "k long, name string, v double"
        )
        with pytest.raises(ValueError, match="duplicate keys"):
            merge_parquet(spark, kv_table, src, ["k"])

    def test_merge_schema_mismatch_leaves_target_intact(self, spark, kv_table):
        from etl_generator_demo_spark.sources.mutations import merge_parquet

        src = spark.createDataFrame([(2, "B")], "k long, name string")
        with pytest.raises(ValueError, match="columns"):
            merge_parquet(spark, kv_table, src, ["k"])
        assert spark.read.parquet(kv_table).count() == 3

    def test_recover_staged_restores_after_crash_window(self, spark, kv_table):
        """Simulate a crash between the two renames: table at .old only."""
        import os

        from etl_generator_demo_spark.sources.mutations import delete_parquet, recover_staged

        os.rename(kv_table, kv_table + ".old")
        assert recover_staged(kv_table) is True
        assert spark.read.parquet(kv_table).count() == 3
        assert not os.path.exists(kv_table + ".old")
        # mutation entry points self-heal too
        os.rename(kv_table, kv_table + ".old")
        assert delete_parquet(spark, kv_table, "k = 3") == 1
        assert spark.read.parquet(kv_table).count() == 2


class TestStreamStreamJoin:
    @pytest.mark.slow
    def test_two_stream_watermarked_join_matches_batch(self, spark, sf_dir, tmp_path):
        """Real stream-stream inner join: clicks and purchases staged
        as separate file streams, watermarks on both sides, the
        interval condition bounding state — output must equal the
        registered batch query."""
        from etl_generator_demo_spark.catalog import read_table
        from etl_generator_demo_spark.streaming.joins import (
            attribution_join,
            st_stream_stream_attribution,
        )

        ev = read_table(spark, sf_dir, "events")
        c_dir, p_dir = str(tmp_path / "clicks"), str(tmp_path / "purchases")
        ev.filter(F.col("event_type") == "click").repartition(3).write.parquet(c_dir)
        ev.filter(F.col("event_type") == "purchase").repartition(3).write.parquet(p_dir)

        schema = ev.schema

        def run(name: str, delay: str) -> set:
            clicks = (
                spark.readStream.schema(schema)
                .option("maxFilesPerTrigger", 1)
                .parquet(c_dir)
                .withWatermark("ts", delay)
            )
            purchases = (
                spark.readStream.schema(schema)
                .option("maxFilesPerTrigger", 1)
                .parquet(p_dir)
                .withWatermark("ts", delay)
            )
            q = (
                attribution_join(clicks, purchases)
                .writeStream.format("memory")
                .queryName(name)
                .outputMode("append")
                .trigger(availableNow=True)
                .start()
            )
            q.awaitTermination(180)
            return {
                tuple(r)
                for r in spark.sql(
                    f"SELECT purchase_id, user_id, click_id FROM {name}"
                ).collect()
            }

        want = {
            (r["purchase_id"], r["user_id"], r["click_id"])
            for r in st_stream_stream_attribution(spark, sf_dir).collect()
        }
        # the staged files are NOT time-ordered, so batch parity needs a
        # watermark delay covering the whole staging disorder...
        assert run("attrib_wide", "365 days") == want and len(want) >= 2
        # ...while a tight watermark may legitimately drop disordered
        # rows as late — never invent rows
        assert run("attrib_tight", "10 minutes") <= want


class TestStreamingDedup:
    def test_duplicate_events_admitted_once(self, spark, sf_dir, tmp_path):
        """A stream carrying every event twice (second copy staged in a
        later file) admits each event_id exactly once."""
        from etl_generator_demo_spark.catalog import read_table
        from etl_generator_demo_spark.streaming.joins import streaming_exact_dedup

        ev = read_table(spark, sf_dir, "events").select("event_id", "ts")
        src = str(tmp_path / "dup_src")
        ev.coalesce(1).write.parquet(src)
        ev.coalesce(1).write.mode("append").parquet(src)  # replay copy

        stream = (
            spark.readStream.schema(ev.schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(src)
        )
        q = (
            streaming_exact_dedup(stream, ["event_id"], delay="365 days")
            .writeStream.format("memory")
            .queryName("dedup_stream")
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        got = [r["event_id"] for r in spark.sql("SELECT event_id FROM dedup_stream").collect()]
        assert len(got) == len(set(got)) == ev.count()
        # batch fallback path
        n = streaming_exact_dedup(spark.read.parquet(src), ["event_id"]).count()
        assert n == ev.count()


class TestCompaction:
    def test_many_small_files_become_few(self, spark, tmp_path):
        from etl_generator_demo_spark.sources.mutations import compact_parquet

        path = str(tmp_path / "frag")
        df = spark.range(0, 10_000).withColumnRenamed("id", "k")
        df.repartition(64).write.parquet(path)  # 64 tiny files
        before_rows = spark.read.parquet(path).count()
        n_before, n_after = compact_parquet(spark, path, target_file_mb=128)
        assert n_before >= 64
        assert n_after == 1  # well under one 128 MB target file
        assert spark.read.parquet(path).count() == before_rows
        got = sorted(r["k"] for r in spark.read.parquet(path).collect())
        assert got == list(range(10_000))


class TestSnapshotDiffNulls:
    def test_null_bearing_updates_detected(self, spark):
        """ADVICE r2: concat_ws drops NULLs, so ('x', NULL) vs
        (NULL, 'x') and NULL vs '' would digest-equal. The NULL
        sentinel must keep them distinct."""
        from etl_generator_demo_spark.sources.mutations import snapshot_diff

        schema = "k long, a string, b string"
        old = spark.createDataFrame(
            [
                (1, "x", None),   # -> swapped to (None, 'x'): update
                (2, None, "y"),   # -> NULL becomes '': update
                (3, None, None),  # unchanged (both NULL)
                (4, "p", "q"),    # unchanged
                (5, "z", "z"),    # deleted
            ],
            schema,
        )
        new = spark.createDataFrame(
            [
                (1, None, "x"),
                (2, "", "y"),
                (3, None, None),
                (4, "p", "q"),
                (6, "w", "w"),    # inserted
            ],
            schema,
        )
        got = {r["k"]: r["change_type"] for r in snapshot_diff(old, new, ["k"]).collect()}
        assert got == {
            1: "update",
            2: "update",
            3: "unchanged",
            4: "unchanged",
            5: "delete",
            6: "insert",
        }


class TestCheckpointRestart:
    def test_offsets_survive_restart_no_loss_no_dup(self, spark, sf_dir, tmp_path):
        """Two-phase run against one checkpoint: phase 1 sees half the
        source files, phase 2 (a fresh query object — a 'restart')
        sees the rest. The checkpoint must carry offsets so nothing is
        lost or reprocessed, and the idempotent sink must hold the
        exactly-once count."""
        import shutil

        from etl_generator_demo_spark.catalog import read_table
        from etl_generator_demo_spark.streaming.sinks import parquet_append_sink

        ev = read_table(spark, sf_dir, "events").select("event_id", "ts")
        staged = tmp_path / "staged"
        ev.repartition(4).write.parquet(str(staged))
        parts = sorted(p.name for p in staged.glob("part-*"))
        assert len(parts) == 4

        src = tmp_path / "src"
        src.mkdir()
        for name in parts[:2]:
            shutil.copy(staged / name, src / name)

        ckpt = str(tmp_path / "ckpt")
        target = str(tmp_path / "out")

        def run_once():
            q = (
                spark.readStream.schema(ev.schema)
                .option("maxFilesPerTrigger", 1)
                .parquet(str(src))
                .writeStream.foreachBatch(parquet_append_sink(target))
                .option("checkpointLocation", ckpt)
                .trigger(availableNow=True)
                .start()
            )
            q.awaitTermination(120)

        run_once()  # phase 1: half the files
        n_phase1 = spark.read.parquet(target).count()
        assert 0 < n_phase1 < ev.count()

        for name in parts[2:]:
            shutil.copy(staged / name, src / name)
        run_once()  # 'restart': same checkpoint, new query object

        out = spark.read.parquet(target)
        assert out.count() == ev.count()  # no loss
        ids = [r["event_id"] for r in out.select("event_id").collect()]
        assert len(ids) == len(set(ids))  # no duplicates


class TestStagingCleanup:
    def test_orphans_removed_recovery_source_kept(self, spark, tmp_path):
        import os

        from etl_generator_demo_spark.sources.mutations import (
            cleanup_stale_staging,
            recover_staged,
        )

        path = str(tmp_path / "tbl")
        spark.range(5).write.parquet(path)
        os.mkdir(str(tmp_path / ".staging_abc"))  # orphan temp dir
        # completed-swap leftover: table present AND .old present
        spark.range(3).write.parquet(path + ".old")
        removed = cleanup_stale_staging(path)
        assert len(removed) == 2
        assert not os.path.exists(path + ".old")
        assert spark.read.parquet(path).count() == 5

        # crash-window state: table missing, .old holds the data —
        # cleanup must NOT touch it; recovery restores it
        os.rename(path, path + ".old")
        cleanup_stale_staging(path)
        assert os.path.exists(path + ".old")
        assert recover_staged(path) is True
        assert spark.read.parquet(path).count() == 5


def test_read_table_normalizes_event_time_to_timestamp(spark, sf_dir):
    """Both generations of the fixture writer (TIMESTAMP(NANOS) read
    as long, and micro-precision isAdjustedToUTC=false read as
    TIMESTAMP_NTZ) must surface ts as plain TIMESTAMP: event-time
    operations (withWatermark, unix_micros) reject NTZ, and the UTC
    session makes the cast wall-clock identity."""
    from etl_generator_demo_spark.catalog import read_table

    ev = read_table(spark, sf_dir, "events")
    assert dict(ev.dtypes)["ts"] == "timestamp"
    # sanity: event-time ops now resolve
    from pyspark.sql import functions as F

    ev.select(F.unix_micros("ts")).limit(1).collect()


class TestStreamStaticEnrich:
    def test_stream_static_join_matches_batch(self, spark, sf_dir, tmp_path):
        """The registered stream-static enrichment plan, run as a REAL
        stream: events from a micro-batched file source with a
        watermark, customer as the static dimension — output must
        equal the batch computation (the dimension join adds no
        streaming state; only the window aggregate is stateful)."""
        from etl_generator_demo_spark.catalog import read_table
        from etl_generator_demo_spark.streaming.joins import (
            enrich_purchases_with_segment,
        )

        ev_batch = read_table(spark, sf_dir, "events")
        cust = read_table(spark, sf_dir, "customer")
        src = tmp_path / "enrich_src"
        ev_batch.repartition(4).write.parquet(str(src))

        ev_stream = (
            spark.readStream.schema(ev_batch.schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(str(src))
            .withColumn("ts", F.col("ts").cast("timestamp"))
            .withWatermark("ts", "10 minutes")
        )
        q = (
            enrich_purchases_with_segment(ev_stream, cust)
            .writeStream.format("memory")
            .queryName("enriched")
            .outputMode("complete")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        got = {
            (r.window_start, r.segment): (r.n_purchases, r.revenue)
            for r in spark.sql("SELECT * FROM enriched").collect()
        }
        want = {
            (r.window_start, r.segment): (r.n_purchases, r.revenue)
            for r in enrich_purchases_with_segment(ev_batch, cust).collect()
        }
        assert got == want and len(want) > 100


def test_zorder_rewrite_narrows_both_zone_maps(spark, sf_dir, tmp_path):
    """After Z-ordering on (o_custkey, o_totalprice), BOTH columns'
    per-file [min, max] spans shrink versus the unsorted layout — the
    property that makes row-group pruning work for either predicate."""
    import glob

    from etl_generator_demo_spark.catalog import read_table
    from etl_generator_demo_spark.sources.mutations import zorder_rewrite

    path = str(tmp_path / "orders_z")
    read_table(spark, sf_dir, "orders").repartition(8).write.parquet(path)

    def spans(p):
        out = {}
        for col in ("o_custkey", "o_totalprice"):
            tot = 0.0
            for f in glob.glob(p + "/part-*.parquet"):
                pf = spark.read.parquet(f).agg(
                    F.min(col).alias("mn"), F.max(col).alias("mx")
                ).collect()[0]
                tot += float(pf.mx) - float(pf.mn)
            out[col] = tot
        return out

    before = spans(path)
    zorder_rewrite(spark, path, ("o_custkey", "o_totalprice"), n_files=8)
    after = spans(path)
    # same rows survive
    n = spark.read.parquet(path).count()
    assert n == read_table(spark, sf_dir, "orders").count()
    # summed zone-map width must shrink markedly on both dimensions
    assert after["o_custkey"] < before["o_custkey"] * 0.7
    assert after["o_totalprice"] < before["o_totalprice"] * 0.7


def test_zorder_rewrite_orderable_nonnumeric_keys(spark, sf_dir, tmp_path):
    """Round-4 advice: z-ordering on a DATE or STRING key used to die
    inside approxQuantile/Bucketizer (numeric-only), and NULL keys
    overflowed the Morton bit range. Dates rank via epoch, strings via
    an order-preserving 6-byte (48-bit) prefix — wide enough to rank,
    narrow enough to stay exact in a double — NULLs clamp to the top
    cell —
    rows survive byte-for-byte and the date axis still clusters."""
    import glob

    from etl_generator_demo_spark.catalog import read_table
    from etl_generator_demo_spark.sources.mutations import zorder_rewrite

    path = str(tmp_path / "orders_zd")
    base = (
        read_table(spark, sf_dir, "orders")
        .select(
            "o_orderkey",
            "o_orderdate",
            # every 7th row gets a NULL priority to hit the overflow bucket
            F.when(F.col("o_orderkey") % 7 != 0, F.col("o_orderpriority")).alias(
                "o_orderpriority"
            ),
        )
    )
    base.repartition(8).write.parquet(path)
    want = {(r.o_orderkey, r.o_orderdate, r.o_orderpriority) for r in base.collect()}

    def date_span(p):
        tot = 0.0
        for f in glob.glob(p + "/part-*.parquet"):
            r = spark.read.parquet(f).agg(
                F.min("o_orderdate").alias("mn"), F.max("o_orderdate").alias("mx")
            ).collect()[0]
            tot += float((r.mx - r.mn).days if hasattr(r.mx - r.mn, "days") else 0)
        return tot

    before = date_span(path)
    zorder_rewrite(spark, path, ("o_orderdate", "o_orderpriority"), n_files=8)
    got = {
        (r.o_orderkey, r.o_orderdate, r.o_orderpriority)
        for r in spark.read.parquet(path).collect()
    }
    assert got == want  # NULL keys survive the clamp, nothing scattered
    assert date_span(path) < before * 0.7  # date axis clusters

    # unorderable types fail fast with a clear message
    import pytest

    arr_path = str(tmp_path / "arr_z")
    spark.range(10).withColumn("v", F.array(F.col("id"))).write.parquet(arr_path)
    with pytest.raises(TypeError, match="unorderable"):
        zorder_rewrite(spark, arr_path, ("v", "id"), n_files=2)


def test_lateness_histogram_mass_and_bounds(spark, sf_dir):
    """Histogram covers every event exactly once; lateness is bounded
    by one day (disorder is within-day by construction)."""
    from etl_generator_demo_spark.catalog import read_table
    from etl_generator_demo_spark.registry import load_all

    rows = load_all()["st_lateness_histogram"].fn(spark, sf_dir).collect()
    n_events = read_table(spark, sf_dir, "events").count()
    assert sum(r.n_events for r in rows) == n_events
    assert all(r.bucket_lo_s == r.bucket * 600 for r in rows)
    assert max(r.bucket_lo_s for r in rows) < 86400
    assert rows[0].bucket == 0 and rows[0].n_events > 0


class TestDynamicGapSessionStreaming:
    def test_dynamic_gap_stream_matches_batch(self, spark, sf_dir, tmp_path):
        """F.session_window with a per-event gap COLUMN must produce
        identical merged sessions under Structured Streaming
        (availableNow over micro-batched files) and batch — the state
        store merge is the same algorithm."""
        from etl_generator_demo_spark.catalog import read_table
        from etl_generator_demo_spark.streaming.windows import DYN_GAPS_S

        ev_batch = read_table(spark, sf_dir, "events").filter(
            F.col("user_id") <= 20
        ).select("user_id", "ts", "event_type")
        src = tmp_path / "dyn_src"
        ev_batch.repartition(3).write.parquet(str(src))

        gap = F.concat(
            F.coalesce(
                F.element_at(
                    F.create_map(
                        *[x for k, v in DYN_GAPS_S.items() for x in (F.lit(k), F.lit(v))]
                    ),
                    F.col("event_type"),
                ),
                F.lit(3600),
            ).cast("string"),
            F.lit(" seconds"),
        )

        def sessions(df):
            return (
                df.groupBy("user_id", F.session_window(F.col("ts"), gap).alias("w"))
                .agg(F.count(F.lit(1)).alias("n"))
                .select("user_id", F.col("w.start").alias("s"),
                        F.col("w.end").alias("e"), "n")
            )

        stream = (
            spark.readStream.schema(ev_batch.schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(str(src))
            # micro-batched files replay in arbitrary time order, so
            # the watermark must exceed the fixture's full span —
            # otherwise genuinely-out-of-order events are "late",
            # their sessions close early, and stream != batch (the
            # lateness behavior itself is pinned by the st_late_data
            # tests)
            .withWatermark("ts", "60 days")
        )
        q = (
            sessions(stream)
            .writeStream.format("memory")
            .queryName("dyn_sessions")
            .outputMode("complete")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        got = {
            (r["user_id"], r["s"], r["e"], r["n"])
            for r in spark.sql("SELECT * FROM dyn_sessions").collect()
        }
        want = {
            (r["user_id"], r["s"], r["e"], r["n"])
            for r in sessions(ev_batch).collect()
        }
        assert got == want and want


def test_delete_parquet_keeps_null_predicate_rows(spark, tmp_path):
    """SQL DELETE semantics: rows where the predicate is NULL are
    KEPT, and the returned count matches the rows removed."""
    from etl_generator_demo_spark.sources.mutations import delete_parquet

    path = str(tmp_path / "del_null")
    spark.createDataFrame(
        [(1, "bad"), (2, "ok"), (3, None)], "id long, c string"
    ).write.parquet(path)
    n = delete_parquet(spark, path, "c = 'bad'")
    left = {r["id"] for r in spark.read.parquet(path).collect()}
    assert n == 1 and left == {2, 3}


def test_stream_stream_left_outer_null_emission(spark, sf_dir, tmp_path):
    """Real stream-stream LEFT OUTER interval join (round 7): matched
    rows must equal the batch join's matched set, null-match rows must
    be (a) a subset of the batch unattributed set — a stream must
    never invent an unattributed purchase while its click could still
    arrive — and (b) exactly the purchases the FINAL watermark
    cleared: the withheld tail (purchases newer than watermark) emits
    nothing rather than a premature null."""
    import datetime

    from etl_generator_demo_spark.catalog import read_table
    from etl_generator_demo_spark.streaming.joins import (
        attribution_join_outer,
        st_stream_stream_left_outer,
    )

    ev = read_table(spark, sf_dir, "events")
    c_dir, p_dir = str(tmp_path / "clicks_o"), str(tmp_path / "purch_o")
    # one time-sorted file per stream: all data arrives in microbatch 1
    # (no disorder), the availableNow final batch advances the
    # watermark and flushes the provably-unmatched purchases
    ev.filter(F.col("event_type") == "click").repartition(1).sortWithinPartitions(
        "ts"
    ).write.parquet(c_dir)
    ev.filter(F.col("event_type") == "purchase").repartition(1).sortWithinPartitions(
        "ts"
    ).write.parquet(p_dir)

    delay = "1 hour"
    clicks = (
        spark.readStream.schema(ev.schema).parquet(c_dir).withWatermark("ts", delay)
    )
    purchases = (
        spark.readStream.schema(ev.schema).parquet(p_dir).withWatermark("ts", delay)
    )
    q = (
        attribution_join_outer(clicks, purchases)
        .writeStream.format("memory")
        .queryName("outer_attrib")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)

    got = spark.sql(
        "SELECT purchase_id, click_id, purchase_ts FROM outer_attrib"
    ).collect()
    got_matched = {(r["purchase_id"], r["click_id"]) for r in got if r["click_id"] is not None}
    got_nulls = {r["purchase_id"] for r in got if r["click_id"] is None}

    batch = st_stream_stream_left_outer(spark, sf_dir).collect()
    want_matched = {
        (r["purchase_id"], r["click_id"]) for r in batch if r["click_id"] is not None
    }
    want_null_ts = {
        r["purchase_id"]: r["purchase_ts"] for r in batch if r["click_id"] is None
    }

    # (1) inner results identical — outer adds rows, never changes them
    assert got_matched == want_matched and len(want_matched) >= 2
    # (2) soundness: no invented unattributed purchases
    assert got_nulls <= set(want_null_ts)
    # (3) completeness up to the final watermark: every batch-null
    # purchase older than (global max event time - delay) must have
    # flushed; the tail may legitimately be withheld
    max_c = ev.filter(F.col("event_type") == "click").agg(F.max("ts")).first()[0]
    max_p = ev.filter(F.col("event_type") == "purchase").agg(F.max("ts")).first()[0]
    wm = min(max_c, max_p) - datetime.timedelta(hours=1)
    margin = datetime.timedelta(minutes=5)
    must_flush = {pid for pid, ts in want_null_ts.items() if ts < wm - margin}
    assert must_flush, "fixture should leave some provably-unmatched purchases"
    assert must_flush <= got_nulls
    # (4) the withheld tail really is withheld-or-valid: anything the
    # stream emitted beyond must_flush still lies at/before watermark
    for pid in got_nulls - must_flush:
        assert want_null_ts[pid] <= wm + margin


def test_stream_stream_full_outer_both_null_sides(spark, sf_dir, tmp_path):
    """Real stream-stream FULL OUTER interval join (round 8) — the last
    cell of the outer-join matrix. Three row classes must each check
    out against the batch join under the final watermark:
      matched        == the batch matched set exactly;
      purchase_only  (null click): subset of batch, complete below the
                     watermark — same contract as the left-outer test;
      click_only     (null purchase): the NEW side — a click that
                     converted nothing flushes with a null purchase
                     only once the watermark proves no qualifying
                     purchase can still arrive (its join window extends
                     GAP minutes FORWARD of the click, so the eviction
                     bound is click_ts + gap + delay)."""
    import datetime

    from etl_generator_demo_spark.catalog import read_table
    from etl_generator_demo_spark.streaming.joins import (
        ATTRIBUTION_GAP_MINUTES,
        attribution_join_full_outer,
        st_stream_stream_full_outer,
    )

    ev = read_table(spark, sf_dir, "events")
    c_dir, p_dir = str(tmp_path / "clicks_f"), str(tmp_path / "purch_f")
    ev.filter(F.col("event_type") == "click").repartition(1).sortWithinPartitions(
        "ts"
    ).write.parquet(c_dir)
    ev.filter(F.col("event_type") == "purchase").repartition(1).sortWithinPartitions(
        "ts"
    ).write.parquet(p_dir)

    delay = "1 hour"
    clicks = (
        spark.readStream.schema(ev.schema).parquet(c_dir).withWatermark("ts", delay)
    )
    purchases = (
        spark.readStream.schema(ev.schema).parquet(p_dir).withWatermark("ts", delay)
    )
    q = (
        attribution_join_full_outer(clicks, purchases)
        .writeStream.format("memory")
        .queryName("full_outer_attrib")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)

    got = spark.sql(
        "SELECT purchase_id, click_id, match_type FROM full_outer_attrib"
    ).collect()
    got_matched = {
        (r["purchase_id"], r["click_id"]) for r in got if r["match_type"] == "matched"
    }
    got_p_only = {r["purchase_id"] for r in got if r["match_type"] == "purchase_only"}
    got_c_only = {r["click_id"] for r in got if r["match_type"] == "click_only"}
    # the stream must label consistently: no row with both ids null
    assert all(
        (r["purchase_id"] is None) != (r["click_id"] is None)
        for r in got
        if r["match_type"] != "matched"
    )

    batch = st_stream_stream_full_outer(spark, sf_dir).collect()
    want_matched = {
        (r["purchase_id"], r["click_id"])
        for r in batch
        if r["match_type"] == "matched"
    }
    want_p_only_ts = {
        r["purchase_id"]: r["purchase_ts"]
        for r in batch
        if r["match_type"] == "purchase_only"
    }
    want_c_only_ts = {
        r["click_id"]: r["click_ts"]
        for r in batch
        if r["match_type"] == "click_only"
    }

    # (1) inner results identical
    assert got_matched == want_matched and len(want_matched) >= 2
    # (2) soundness both sides: no invented unmatched rows
    assert got_p_only <= set(want_p_only_ts)
    assert got_c_only <= set(want_c_only_ts)
    # (3) completeness below the final watermark, per side. The
    # purchase side's window looks BACK gap minutes (evictable at
    # purchase_ts); the click side's window extends FORWARD gap
    # minutes (evictable at click_ts + gap).
    max_c = ev.filter(F.col("event_type") == "click").agg(F.max("ts")).first()[0]
    max_p = ev.filter(F.col("event_type") == "purchase").agg(F.max("ts")).first()[0]
    wm = min(max_c, max_p) - datetime.timedelta(hours=1)
    margin = datetime.timedelta(minutes=5)
    gap = datetime.timedelta(minutes=ATTRIBUTION_GAP_MINUTES)
    must_flush_p = {
        pid for pid, ts in want_p_only_ts.items() if ts < wm - margin
    }
    must_flush_c = {
        cid for cid, ts in want_c_only_ts.items() if ts + gap < wm - margin
    }
    assert must_flush_p and must_flush_c, (
        "fixture should leave provably-unmatched rows on both sides"
    )
    assert must_flush_p <= got_p_only
    assert must_flush_c <= got_c_only
    # (4) anything emitted beyond must-flush is still at/before the
    # watermark once its window is accounted for
    for pid in got_p_only - must_flush_p:
        assert want_p_only_ts[pid] <= wm + margin
    for cid in got_c_only - must_flush_c:
        assert want_c_only_ts[cid] + gap <= wm + margin


class TestWriteAuditPublish:
    """WAP (round 7): bad data must be caught while still invisible —
    a failing audit aborts with the LIVE table untouched; a clean run
    publishes atomically; the crash window self-heals."""

    def _orders(self, spark, sf_dir):
        from etl_generator_demo_spark.catalog import read_table

        return read_table(spark, sf_dir, "orders").select(
            "o_orderkey", "o_custkey", "o_totalprice"
        )

    def test_audits_pass_then_publish(self, spark, sf_dir, tmp_path):
        import os

        from etl_generator_demo_spark.sources.mutations import (
            audit_min_rows,
            audit_not_null,
            audit_unique_key,
            write_audit_publish,
        )

        df = self._orders(spark, sf_dir)
        path = str(tmp_path / "orders_wap")
        res = write_audit_publish(
            spark,
            path,
            df,
            [
                ("keys_not_null", audit_not_null("o_orderkey")),
                ("volume", audit_min_rows(df.count())),
                ("pk_unique", audit_unique_key("o_orderkey")),
            ],
        )
        assert res["rows"] == df.count() == spark.read.parquet(path).count()
        # no staging/old debris
        parent = os.path.dirname(path)
        assert not [d for d in os.listdir(parent) if d.startswith(".staging_")]
        assert not os.path.exists(path + ".old")

    def test_failing_audit_never_touches_live_table(self, spark, sf_dir, tmp_path):
        import os

        import pytest

        from etl_generator_demo_spark.sources.mutations import (
            AuditFailure,
            audit_min_rows,
            audit_unique_key,
            write_audit_publish,
        )

        df = self._orders(spark, sf_dir)
        path = str(tmp_path / "orders_wap")
        write_audit_publish(spark, path, df, [("volume", audit_min_rows(df.count()))])
        live_before = spark.read.parquet(path).count()

        # upstream truncation: candidate has 1% of the rows
        broken = df.limit(max(1, df.count() // 100))
        with pytest.raises(AuditFailure) as e:
            write_audit_publish(
                spark, path, broken, [("volume", audit_min_rows(df.count()))]
            )
        assert e.value.audit == "volume" and "collapse" in str(e.value)
        assert spark.read.parquet(path).count() == live_before  # untouched
        assert not [
            d for d in os.listdir(os.path.dirname(path)) if d.startswith(".staging_")
        ]

        # duplicate explosion: a self-union doubles every key
        with pytest.raises(AuditFailure) as e:
            write_audit_publish(
                spark, path, df.unionAll(df), [("pk", audit_unique_key("o_orderkey"))]
            )
        assert e.value.audit == "pk"
        assert spark.read.parquet(path).count() == live_before

    def test_publish_crash_window_self_heals(self, spark, sf_dir, tmp_path, monkeypatch):
        import os

        from etl_generator_demo_spark.sources.mutations import (
            audit_min_rows,
            write_audit_publish,
        )

        df = self._orders(spark, sf_dir)
        path = str(tmp_path / "orders_wap")
        write_audit_publish(spark, path, df, [])
        want = spark.read.parquet(path).count()

        real_rename = os.rename

        def crashing_rename(src, dst):
            if dst == path and os.path.basename(src).startswith(".staging_"):
                raise RuntimeError("injected crash inside the publish swap")
            real_rename(src, dst)

        monkeypatch.setattr(os, "rename", crashing_rename)
        try:
            write_audit_publish(spark, path, df, [])
            raise AssertionError("injected crash did not fire")
        except RuntimeError as exc:
            assert "injected crash" in str(exc)
        monkeypatch.undo()
        # live table is parked at .old; the next WAP call recovers it
        # and publishes cleanly
        assert not os.path.exists(path) and os.path.exists(path + ".old")
        res = write_audit_publish(
            spark, path, df, [("volume", audit_min_rows(want))]
        )
        assert res["rows"] == want == spark.read.parquet(path).count()
        assert not os.path.exists(path + ".old")
