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
