"""Surrogate keys — the SERIAL / AUTO_INCREMENT mapping (SURVEY §1.2).

The reference's schemas use `SERIAL` / `INT AUTO_INCREMENT` PKs
(``sample_metadata.py:15,92``); Spark has no auto-increment. Two
engine idioms, chosen by what the caller needs:

- dense=False (default): ``monotonically_increasing_id`` — unique,
  *sparse* 64-bit ids (partition id in the high bits). O(1), no
  shuffle, the right choice at 100 TB.
- dense=True: gapless 1..N via a two-pass partition-offset scheme:
  count rows per partition, prefix-sum the counts on the driver
  (#partitions values, not rows), then add the per-partition offset to
  a local row number. One extra pass over the data, still no global
  shuffle — unlike the naive ``row_number() OVER ()`` which funnels
  every row through a single partition.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def with_surrogate_key(df: DataFrame, name: str = "id", dense: bool = False) -> DataFrame:
    if not dense:
        return df.withColumn(name, F.monotonically_increasing_id())

    # Pin the partitioning: round-robin repartitions are NOT
    # deterministic across jobs, and the counting pass and numbering
    # pass are separate jobs — localCheckpoint materializes the
    # partitions so both passes see identical row placement.
    df = df.localCheckpoint(eager=True)
    # Stamp the partition id as a real column ONCE: spark_partition_id()
    # is evaluated at its use site, so referencing it again after the
    # window's shuffle would see the post-shuffle partition, not the
    # original one.
    stamped = df.withColumn("_pid", F.spark_partition_id())
    counts = stamped.groupBy("_pid").count().orderBy("_pid").collect()
    # one row per partition reaches the driver — safe at any scale
    if not counts:
        return df.withColumn(name, F.monotonically_increasing_id())
    offsets: dict[int, int] = {}
    running = 0
    for row in counts:
        offsets[row["_pid"]] = running
        running += row["count"]
    offset_map = F.create_map(
        *[F.lit(x) for pid, off in offsets.items() for x in (pid, off)]
    )
    local_rn = F.row_number().over(
        Window.partitionBy("_pid").orderBy(F.monotonically_increasing_id())
    )
    return (
        stamped.withColumn(name, (offset_map[F.col("_pid")] + local_rn).cast("long"))
        .drop("_pid")
    )
