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


# --- round-14: escaped partition names, crash recovery, lock coverage
# (r13 advice items 1-3) -----------------------------------------------------


def _seed_str(spark, path, values):
    """|values| string-partitions x 5 rows each (None allowed)."""
    spark.createDataFrame(
        [(v, k, k * 10) for v in values for k in range(5)],
        "p string, k long, v long",
    ).repartition(1).write.mode("overwrite").partitionBy("p").parquet(path)


def test_escaped_string_partitions_update_and_delete(spark, tmp_path):
    """Partition values Spark escapes on disk (':' -> %3A, spaces,
    timestamps-as-strings) and the NULL partition: the r13 spelling
    formatted 'p=<value>' by hand, missed the escaped dir after
    deleting the live one, and silently DROPPED the partition. The
    swap list now comes from Spark's own directory names."""
    from etl_generator_demo_spark.sources.mutations import (
        delete_parquet_partitioned,
        update_parquet_partitioned,
    )

    values = ["a b", "x:y", "2024-01-01 10:00:00", "plain", None]
    path = str(tmp_path / "t")
    _seed_str(spark, path, values)

    n = update_parquet_partitioned(
        spark,
        path,
        {"v": "v + 1000"},
        predicate="p = 'x:y' AND k < 3",
        partition_col="p",
        partition_filter="p = 'x:y'",
    )
    assert n == 3
    out = spark.read.parquet(path)
    assert out.count() == 25  # NOTHING dropped
    assert out.filter("p = 'x:y' AND k < 3").agg(F.sum("v")).first()[0] == sum(
        k * 10 + 1000 for k in range(3)
    )
    # every other partition byte-identical would need inode pins per
    # name; content equality suffices here (escaping is the subject)
    assert out.filter("p = 'a b'").count() == 5
    assert out.filter("p IS NULL").count() == 5

    # NULL partition scoped DELETE: the filter prunes to the
    # __HIVE_DEFAULT_PARTITION__ directory and empties it
    n = delete_parquet_partitioned(
        spark,
        path,
        predicate="p IS NULL",
        partition_col="p",
        partition_filter="p IS NULL",
    )
    assert n == 5
    out = spark.read.parquet(path)
    assert out.count() == 20
    assert out.filter("p IS NULL").count() == 0
    assert not os.path.exists(
        os.path.join(path, "p=__HIVE_DEFAULT_PARTITION__")
    )
    # escaped partitions still intact after the second mutation
    assert out.filter("p = '2024-01-01 10:00:00'").count() == 5


def test_timestamp_partition_column_scoped_update(spark, tmp_path):
    """A real timestamp partition column formats with characters that
    escape on disk ('ts=2024-01-01 10%3A30%3A00')."""
    import datetime

    from etl_generator_demo_spark.sources.mutations import (
        update_parquet_partitioned,
    )

    path = str(tmp_path / "t")
    spark.createDataFrame(
        [
            (datetime.datetime(2024, 1, 1, 10, 30, 0), k, k * 10)
            for k in range(4)
        ]
        + [(datetime.datetime(2024, 1, 2, 0, 0, 0), k, k * 10) for k in range(4)],
        "ts timestamp, k long, v long",
    ).repartition(1).write.mode("overwrite").partitionBy("ts").parquet(path)
    n = update_parquet_partitioned(
        spark,
        path,
        {"v": "0"},
        predicate="ts = TIMESTAMP '2024-01-01 10:30:00'",
        partition_col="ts",
        partition_filter="ts = TIMESTAMP '2024-01-01 10:30:00'",
    )
    assert n == 4
    out = spark.read.parquet(path)
    assert out.count() == 8
    assert out.filter("ts = TIMESTAMP '2024-01-01 10:30:00'").agg(
        F.sum("v")
    ).first()[0] == 0
    assert out.filter("ts = TIMESTAMP '2024-01-02 00:00:00'").agg(
        F.sum("v")
    ).first()[0] == sum(k * 10 for k in range(4))


def test_recover_partition_staged_restores_parked_partition(spark, tmp_path):
    """Crash simulation: a partition parked at .old_<name> with the
    live dir missing is restored on the next mutation's entry (and by
    recover_partition_staged directly); a completed swap's leftover
    aside is swept. Stale .staging_part_<table>_* dirs are removed,
    and a SIBLING table's staging dir is untouched."""
    from etl_generator_demo_spark.sources.mutations import (
        _part_staging_prefix,
        recover_partition_staged,
    )

    path = str(tmp_path / "t")
    _seed(spark, path)
    # crash A: live day=2 missing, aside present
    os.rename(os.path.join(path, "day=2"), os.path.join(path, ".old_day=2"))
    # crash B: swap completed for day=3 but aside not yet removed
    os.makedirs(os.path.join(path, ".old_day=3", "x"))
    # stale staging for THIS table + in-flight staging for a sibling
    stale = os.path.join(str(tmp_path), _part_staging_prefix(path) + "dead")
    os.makedirs(stale)
    sibling = os.path.join(str(tmp_path), ".staging_part_other_live")
    os.makedirs(sibling)

    touched = recover_partition_staged(path)
    assert os.path.isdir(os.path.join(path, "day=2"))          # restored
    assert not os.path.exists(os.path.join(path, ".old_day=2"))
    assert not os.path.exists(os.path.join(path, ".old_day=3"))  # swept
    assert not os.path.exists(stale)                            # swept
    assert os.path.isdir(sibling)                               # untouched
    assert len(touched) == 3
    assert spark.read.parquet(path).count() == 30  # nothing lost

    # reader invisibility of asides: plant one and read the table
    os.makedirs(os.path.join(path, ".old_day=9"))
    assert spark.read.parquet(path).count() == 30
    os.rmdir(os.path.join(path, ".old_day=9"))


def test_partition_mutation_entry_repairs_previous_crash(spark, tmp_path):
    """A mutation entered after a crash (live partition parked) sees
    the repaired table — the r13 spelling skipped recovery on entry."""
    from etl_generator_demo_spark.sources.mutations import (
        update_parquet_partitioned,
    )

    path = str(tmp_path / "t")
    _seed(spark, path)
    os.rename(os.path.join(path, "day=1"), os.path.join(path, ".old_day=1"))
    n = update_parquet_partitioned(
        spark,
        path,
        {"v": "v + 1"},
        predicate="day = 1",
        partition_col="day",
        partition_filter="day = 1",
    )
    assert n == 10  # the parked partition was restored, then updated
    out = spark.read.parquet(path)
    assert out.count() == 30
    assert out.filter("day = 1").agg(F.sum("v")).first()[0] == sum(
        k * 10 + 1 for k in range(10)
    )


def test_zorder_and_wap_take_the_table_lock(spark, tmp_path):
    """r13 advice item 3: zorder_rewrite and write_audit_publish must
    serialize on the same per-table flock as UPDATE/DELETE/MERGE. The
    probe holds the lock in a thread and asserts the mutation cannot
    finish until it is released."""
    import fcntl
    import threading
    import time

    from etl_generator_demo_spark.sources.mutations import (
        write_audit_publish,
        zorder_rewrite,
    )

    path = str(tmp_path / "t")
    _seed(spark, path)

    for fn in (
        lambda: zorder_rewrite(spark, path, ("day", "k"), n_files=2, bits=4),
        lambda: write_audit_publish(
            spark, path, spark.read.parquet(path), audits=[]
        ),
    ):
        fd = os.open(path + ".lock", os.O_CREAT | os.O_RDWR, 0o644)
        fcntl.flock(fd, fcntl.LOCK_EX)
        done = threading.Event()
        t = threading.Thread(target=lambda: (fn(), done.set()))
        t.start()
        time.sleep(1.0)
        assert not done.is_set(), "mutation ran without acquiring the lock"
        fcntl.flock(fd, fcntl.LOCK_UN)
        os.close(fd)
        t.join(timeout=120)
        assert done.is_set()
    assert spark.read.parquet(path).count() == 30
