"""Concurrent-writer semantics for the parquet mutation layer
(round-13, r12 verdict item 6).

The staged-swap rewrite (`sources/mutations.py`) was crash-recovery
tested but not concurrency tested: two simultaneous read-modify-
overwrite mutations were a lost-update race (both read one snapshot,
the later swap discards the earlier writer's rows) that could even
crash inside the two-rename window. The fix is `table_lock` — an
exclusive flock over ``<path>.lock`` held for each mutation's whole
read-modify-write — giving SERIALIZED semantics: concurrent mutations
apply in some order and neither is lost. These tests pin that
deterministic outcome under real threads (flock on distinct fds of
the same file contends, so in-process threads serialize exactly like
separate processes would).
"""

from __future__ import annotations

import threading

import pytest

from pyspark.sql import functions as F


def _seed(spark, path, n=100):
    spark.range(0, n).select(
        F.col("id").alias("k"), (F.col("id") * 10).alias("v")
    ).write.mode("overwrite").parquet(path)


@pytest.mark.slow
def test_concurrent_merges_both_apply(spark, tmp_path):
    """Two merges with disjoint key ranges racing on one table: the
    serialized outcome is deterministic — BOTH source row sets present
    exactly once, regardless of which writer won the lock first."""
    from etl_generator_demo_spark.sources.mutations import merge_parquet

    path = str(tmp_path / "t_merge")
    _seed(spark, path)
    src_a = spark.range(100, 150).select(
        F.col("id").alias("k"), F.lit(-1).cast("long").alias("v")
    )
    src_b = spark.range(150, 200).select(
        F.col("id").alias("k"), F.lit(-2).cast("long").alias("v")
    )
    errs: list[Exception] = []

    def run(src):
        try:
            merge_parquet(spark, path, src, ["k"])
        except Exception as e:  # pragma: no cover - failure detail
            errs.append(e)

    ts = [threading.Thread(target=run, args=(s,)) for s in (src_a, src_b)]
    [t.start() for t in ts]
    [t.join() for t in ts]
    assert not errs, errs
    out = spark.read.parquet(path)
    assert out.count() == 200
    assert out.filter(F.col("v") == -1).count() == 50
    assert out.filter(F.col("v") == -2).count() == 50
    # no duplicate keys survived the race
    assert out.select("k").distinct().count() == 200


@pytest.mark.slow
def test_concurrent_update_and_delete_serialize(spark, tmp_path):
    """UPDATE and DELETE on disjoint predicates racing: both effects
    present afterwards — the update's new values AND the delete's
    removals — in either lock order."""
    from etl_generator_demo_spark.sources.mutations import (
        delete_parquet,
        update_parquet,
    )

    path = str(tmp_path / "t_ud")
    _seed(spark, path)
    errs: list[Exception] = []

    def do_update():
        try:
            update_parquet(spark, path, {"v": "v + 1"}, "k < 10")
        except Exception as e:  # pragma: no cover
            errs.append(e)

    def do_delete():
        try:
            delete_parquet(spark, path, "k >= 90")
        except Exception as e:  # pragma: no cover
            errs.append(e)

    ts = [threading.Thread(target=do_update), threading.Thread(target=do_delete)]
    [t.start() for t in ts]
    [t.join() for t in ts]
    assert not errs, errs
    out = spark.read.parquet(path)
    assert out.count() == 90
    assert out.filter("k < 10").agg(F.sum("v")).first()[0] == sum(
        k * 10 + 1 for k in range(10)
    )
    assert out.filter("k >= 90").count() == 0


@pytest.mark.slow
def test_lock_released_after_failed_mutation(spark, tmp_path):
    """A mutation that raises (merge cardinality error) must release
    the table lock so the next writer proceeds."""
    import pytest

    from etl_generator_demo_spark.sources.mutations import merge_parquet

    path = str(tmp_path / "t_fail")
    _seed(spark, path, n=10)
    dup = spark.createDataFrame([(1, 0), (1, 0)], "k long, v long")
    with pytest.raises(ValueError, match="duplicate keys"):
        merge_parquet(spark, path, dup, ["k"])
    ok = spark.createDataFrame([(100, 5)], "k long, v long")
    done = []

    def run():
        merge_parquet(spark, path, ok, ["k"])
        done.append(True)

    th = threading.Thread(target=run)
    th.start()
    th.join(timeout=120)
    assert done, "lock was not released after the failed merge"
    assert spark.read.parquet(path).count() == 11
