"""Skew-mitigation utilities — the 100 TB join toolbox (SURVEY §7.4,
BASELINE.json "designed to scale").

Two tools, complementary to AQE's runtime skew-join splitting:

- `salted_join`: explicit salting for joins whose hot keys are known
  or whose skew defeats AQE (e.g. one key holding 30% of a 100 TB
  fact table). The skewed side gets a random salt in [0, factor); the
  small side is replicated `factor` times with matching salts — the
  hot key's rows spread over `factor` reducers instead of one.
- `bucketed_table`: co-located joins via bucketBy — both sides
  pre-hashed into the same bucket layout, so repeated joins on the
  key run with ZERO shuffle (SortMergeJoin over bucketed scans).
  The write cost is paid once; every downstream join rides free.

Both are pure DataFrame/built-in constructs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def salted_join(
    big: DataFrame,
    small: DataFrame,
    key: str,
    factor: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Equi-join with the big side salted and the small side replicated.

    Correctness: join key becomes (key, salt); every big-side row gets
    exactly one salt and the small side carries all `factor` salts, so
    each original match survives exactly once. That argument only
    holds for inner/left: under right/full outer an UNMATCHED
    small-side row would surface once per salt replica, so those modes
    are rejected rather than silently corrupted.
    """
    if how not in ("inner", "left", "leftouter", "left_outer"):
        raise ValueError(f"salted_join supports inner/left only, got {how!r}")
    big_salted = big.withColumn("_salt", (F.rand(seed=42) * factor).cast("int"))
    small_exploded = small.withColumn(
        "_salt", F.explode(F.array(*[F.lit(i) for i in range(factor)]))
    )
    out = big_salted.join(small_exploded, [key, "_salt"], how)
    return out.drop("_salt")


def bucketed_table(
    spark: SparkSession,
    df: DataFrame,
    name: str,
    key: str,
    buckets: int = 16,
) -> DataFrame:
    """Persist df as a bucketed managed table and return its scan.
    Joining two tables bucketed on the same key with the same bucket
    count eliminates the shuffle entirely."""
    (
        df.write.mode("overwrite")
        .bucketBy(buckets, key)
        .sortBy(key)
        .saveAsTable(name)
    )
    return spark.table(name)
