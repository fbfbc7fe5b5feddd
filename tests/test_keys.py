"""Surrogate-key helper (the SERIAL mapping, SURVEY §1.2)."""

from __future__ import annotations

from pyspark.sql import functions as F

from etl_generator_demo_spark.functions import with_surrogate_key


def test_sparse_ids_unique(spark, sf_dir):
    from etl_generator_demo_spark.operators.relational import t

    df = with_surrogate_key(t(spark, sf_dir, "lineitem"), "sid")
    total = df.count()
    assert df.select("sid").distinct().count() == total


def test_dense_ids_gapless(spark):
    df = spark.range(0, 10_000).repartition(8)  # multi-partition input
    out = with_surrogate_key(df, "sid", dense=True)
    stats = out.agg(
        F.min("sid").alias("lo"),
        F.max("sid").alias("hi"),
        F.countDistinct("sid").alias("n"),
    ).first()
    assert (stats["lo"], stats["hi"], stats["n"]) == (1, 10_000, 10_000)


def test_dense_ids_empty_input(spark):
    df = spark.range(0).repartition(4)
    assert with_surrogate_key(df, "sid", dense=True).count() == 0
