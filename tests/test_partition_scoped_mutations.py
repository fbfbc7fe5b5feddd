"""Partition-scoped UPDATE/DELETE (round-13): the 100 TB mutation
path the module docstring promised — rewrite ONLY the partitions the
predicate touches (the Delta `replaceWhere` idiom on plain parquet).

The load-bearing assertion is the third one: untouched partitions'
data FILES are byte-for-byte the same files (same inodes, same
mtimes) — not equal-content rewrites. That is the difference between
an O(affected-partition) mutation and an O(table) one at 100 TB.
"""

from __future__ import annotations

import glob
import os

import pytest
from pyspark.sql import functions as F


def _seed(spark, path):
    """3 day-partitions x 10 rows each."""
    spark.createDataFrame(
        [(d, k, k * 10) for d in (1, 2, 3) for k in range(10)],
        "day int, k long, v long",
    ).repartition(1).write.mode("overwrite").partitionBy("day").parquet(path)


def _file_states(path):
    return {
        p: (os.stat(p).st_ino, os.stat(p).st_mtime_ns)
        for p in glob.glob(os.path.join(path, "day=*", "*.parquet"))
    }


def test_partitioned_update_touches_only_filtered_partitions(spark, tmp_path):
    from etl_generator_demo_spark.sources.mutations import (
        update_parquet_partitioned,
    )

    path = str(tmp_path / "t")
    _seed(spark, path)
    before = _file_states(path)
    n = update_parquet_partitioned(
        spark,
        path,
        {"v": "v + 1"},
        predicate="day = 2 AND k < 5",
        partition_col="day",
        partition_filter="day = 2",
    )
    assert n == 5
    out = spark.read.parquet(path)
    assert out.count() == 30
    assert out.filter("day = 2 AND k < 5").agg(F.sum("v")).first()[0] == sum(
        k * 10 + 1 for k in range(5)
    )
    assert out.filter("day = 2 AND k >= 5").agg(F.sum("v")).first()[0] == sum(
        k * 10 for k in range(5, 10)
    )
    after = _file_states(path)
    for p, st in before.items():
        if "day=2" not in p:
            assert after.get(p) == st, f"untouched partition file rewritten: {p}"
    assert all("day=2" not in p or p not in before or after[p] != before[p]
               for p in after)


def test_partitioned_delete_drops_emptied_partition_dir(spark, tmp_path):
    from etl_generator_demo_spark.sources.mutations import (
        delete_parquet_partitioned,
    )

    path = str(tmp_path / "t")
    _seed(spark, path)
    before = _file_states(path)
    n = delete_parquet_partitioned(
        spark,
        path,
        predicate="day = 3",
        partition_col="day",
        partition_filter="day = 3",
    )
    assert n == 10
    assert not os.path.exists(os.path.join(path, "day=3"))
    out = spark.read.parquet(path)
    assert out.count() == 20 and out.filter("day = 3").count() == 0
    after = _file_states(path)
    for p, st in before.items():
        if "day=3" not in p:
            assert after.get(p) == st


def test_containment_violation_raises_and_leaves_table_intact(spark, tmp_path):
    from etl_generator_demo_spark.sources.mutations import (
        delete_parquet_partitioned,
    )

    path = str(tmp_path / "t")
    _seed(spark, path)
    with pytest.raises(ValueError, match="outside partition_filter"):
        delete_parquet_partitioned(
            spark,
            path,
            predicate="k = 1",  # matches every day, filter covers only day 1
            partition_col="day",
            partition_filter="day = 1",
        )
    assert spark.read.parquet(path).count() == 30


def test_partitioned_update_rejects_partition_column_reassignment(
    spark, tmp_path
):
    from etl_generator_demo_spark.sources.mutations import (
        update_parquet_partitioned,
    )

    path = str(tmp_path / "t")
    _seed(spark, path)
    with pytest.raises(ValueError, match="partition column"):
        update_parquet_partitioned(
            spark,
            path,
            {"day": "day + 1"},
            predicate="day = 1 AND k = 0",
            partition_col="day",
            partition_filter="day = 1",
        )


def test_scoped_read_is_partition_pruned(spark, tmp_path):
    """The read side of the contract: a scan under the partition
    filter carries PartitionFilters on `day` — no other directory is
    opened (the property that makes the mutation O(affected))."""
    path = str(tmp_path / "t")
    _seed(spark, path)
    df = spark.read.parquet(path).filter("day = 2")
    df.collect()
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan
    seg = plan.split("PartitionFilters")[1][:120]
    assert "day" in seg, seg


def test_predicate_partitions_resolves_from_directory_names(spark, tmp_path):
    """The planning helper a caller uses to see what a scoped mutation
    WOULD touch: values come from the partition-column relation
    (directory names), and the filter semantics match the mutation's."""
    from etl_generator_demo_spark.sources.mutations import predicate_partitions

    path = str(tmp_path / "t")
    _seed(spark, path)
    assert sorted(predicate_partitions(spark, path, "day", "day >= 2")) == [2, 3]
    assert predicate_partitions(spark, path, "day", "day = 99") == []
