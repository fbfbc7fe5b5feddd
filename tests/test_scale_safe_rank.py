"""The scale-safe exact-rank primitives (round-5 de-globalization):

- ``global_row_number`` must be bit-identical to ``row_number() OVER
  (ORDER BY ...)`` regardless of the input's physical layout — it is
  the engine's replacement for single-partition global windows.
- ``ntile_expr`` must reproduce ANSI ``NTILE(k)`` from (rn, n) for
  every remainder class.
- ``x4_contrastive_triplets``' negative pool must be a deterministic,
  layout-independent, BOUNDED top-1000 md5 sample of the corpus (the
  round-4 verdict flagged the previous full-corpus cross join).
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F


def test_global_row_number_matches_window_any_layout(spark, sf_dir):
    from etl_generator_demo_spark.operators.analytics_ext import global_row_number

    o = spark.read.parquet(f"{sf_dir}/orders.parquet").select(
        "o_orderkey", "o_totalprice"
    )
    cols = [F.col("o_totalprice").desc(), F.col("o_orderkey").asc()]
    expected = {
        r.o_orderkey: r.rn
        for r in o.withColumn(
            "rn",
            F.row_number().over(
                Window.orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
            ),
        ).collect()
    }
    n_exp = len(expected)
    for layout in (o, o.repartition(1), o.repartition(37, "o_orderkey")):
        got, n = global_row_number(layout, cols)
        assert n == n_exp
        rows = got.collect()
        assert {r.o_orderkey: r["_rn"] for r in rows} == expected


def test_ntile_expr_matches_window_every_remainder(spark):
    from etl_generator_demo_spark.operators.analytics_ext import ntile_expr

    for n in (1, 3, 4, 5, 6, 7, 12, 101):
        df = spark.range(1, n + 1).withColumnRenamed("id", "rn")
        for k in (1, 2, 5, 8):
            got = {
                r.rn: r.tile
                for r in df.withColumn(
                    "tile", ntile_expr(F.col("rn"), n, k)
                ).collect()
            }
            exp = {
                r.rn: r.tile
                for r in df.withColumn(
                    "tile", F.ntile(k).over(Window.orderBy("rn"))
                ).collect()
            }
            assert got == exp, (n, k)


def test_global_running_matches_window_sum_and_max(spark, sf_dir):
    from etl_generator_demo_spark.operators.analytics_ext import global_running

    ev = spark.read.parquet(f"{sf_dir}/events.parquet").select(
        "event_id", (F.col("user_id") % 7 - 3).alias("v"), "ts"
    )
    cols = [F.col("event_id").asc()]
    w = Window.orderBy("event_id").rowsBetween(Window.unboundedPreceding, 0)
    exp_sum = {r.event_id: r.s for r in ev.withColumn("s", F.sum("v").over(w)).collect()}
    exp_max = {r.event_id: r.m for r in ev.withColumn("m", F.max("ts").over(w)).collect()}
    for layout in (ev, ev.repartition(1), ev.repartition(23, "user_id")):
        got_s = {
            r.event_id: r["_run"]
            for r in global_running(layout, cols, "v", kind="sum").collect()
        }
        assert got_s == exp_sum
        got_m = {
            r.event_id: r["_run"]
            for r in global_running(layout, cols, "ts", kind="max").collect()
        }
        assert got_m == exp_max


def test_global_running_null_runs_match_window(spark):
    """SQL running-aggregate null semantics survive distribution: a
    whole RANGE PARTITION of nulls must inherit the prefix (a bare
    local+prefix would null it out), and rows before any non-null
    value stay null. Build long all-null runs at the head, middle and
    tail of the order so several range partitions are entirely null."""
    from etl_generator_demo_spark.operators.analytics_ext import global_running

    rows = []
    for i in range(1, 2001):
        null = i <= 300 or 800 <= i <= 1400 or i > 1900
        rows.append((i, None if null else i % 13 - 3))
    df = spark.createDataFrame(rows, "k int, v int")
    w = Window.orderBy("k").rowsBetween(Window.unboundedPreceding, 0)
    exp_s = {r.k: r.s for r in df.withColumn("s", F.sum("v").over(w)).collect()}
    exp_m = {r.k: r.m for r in df.withColumn("m", F.max("v").over(w)).collect()}
    cols = [F.col("k").asc()]
    for layout in (df, df.repartition(40)):
        got_s = {
            r.k: r["_run"]
            for r in global_running(layout, cols, "v", kind="sum").collect()
        }
        assert got_s == exp_s
        got_m = {
            r.k: r["_run"]
            for r in global_running(layout, cols, "v", kind="max").collect()
        }
        assert got_m == exp_m


def test_contrastive_negative_pool_bounded_and_deterministic(spark, sf_dir):
    from etl_generator_demo_spark.registry import load_all

    fn = load_all()["x4_contrastive_triplets"].fn
    a = fn(spark, sf_dir).collect()
    b = fn(spark, sf_dir).collect()
    assert a == b and a  # reproducible run-to-run
    # every negative comes from the md5-ranked top-1000 pool
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    pool = {
        r.doc_id
        for r in docs.select("doc_id")
        .orderBy(F.md5(F.concat(F.lit("pool|"), F.col("doc_id").cast("string"))), "doc_id")
        .limit(1000)
        .collect()
    }
    assert len(pool) <= 1000
    for r in a:
        assert r.negative in pool
        assert r.negative != r.anchor and r.negative != r.positive
