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


# ---------------------------------------------------------------------------
# Skew diagnostics: the audit you run BEFORE choosing a join strategy
# ---------------------------------------------------------------------------
from etl_generator_demo_spark.operators.relational import t  # noqa: E402
from etl_generator_demo_spark.registry import register  # noqa: E402


@register(
    "x4_key_skew_audit",
    oracle="""
    WITH c AS (
        SELECT user_id, CAST(COUNT(*) AS BIGINT) AS c FROM events GROUP BY user_id
    ),
    r AS (SELECT c, ROW_NUMBER() OVER (ORDER BY c, user_id) AS i FROM c),
    s AS (
        SELECT CAST(COUNT(*) AS BIGINT)  AS n,
               CAST(SUM(c) AS BIGINT)    AS tot,
               CAST(SUM(i * c) AS BIGINT) AS s1,
               CAST(MAX(c) AS BIGINT)    AS mx
        FROM r
    )
    SELECT n   AS n_keys,
           tot AS n_rows,
           CAST(FLOOR(mx * 1000000.0 / tot) AS BIGINT) AS top_share_e6,
           CAST(FLOOR((2.0 * s1 / (n * tot) - (n + 1.0) / n) * 1000000) AS BIGINT) AS gini_e6
    FROM s
    """,
    survey_ids=("X4", "A2"),
)
def x4_key_skew_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Join-key skew audit over events.user_id: key cardinality, the
    hottest key's row share, and the Gini coefficient of the key
    distribution — the numbers that decide between a plain shuffle
    join, AQE skew splitting, and explicit salting (`salted_join`).

    Gini uses the rank formula G = 2·Σ(i·cᵢ)/(n·Σc) − (n+1)/n over
    counts ranked ascending (ties broken by key — Σi·cᵢ is invariant
    under permutations of equal counts, so the tiebreak never changes
    the value). Every sum is an exact BIGINT; the two divisions are
    the only float ops and have identical shape in both engines.

    Scale: the ranked window runs over the KEY relation (|keys| ≪
    |rows|, already map-combined); for billion-key audits swap the
    exact rank for a sampled or bucketed estimate."""
    from pyspark.sql import Window

    ev = t(spark, sf_dir, "events")
    c = ev.groupBy("user_id").agg(F.count(F.lit(1)).cast("long").alias("c"))
    r = c.select(
        "c", F.row_number().over(Window.orderBy("c", "user_id")).alias("i")
    )
    s = r.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("c").cast("long").alias("tot"),
        F.sum(F.col("i") * F.col("c")).cast("long").alias("s1"),
        F.max("c").cast("long").alias("mx"),
    )
    return s.select(
        F.col("n").alias("n_keys"),
        F.col("tot").alias("n_rows"),
        F.floor(F.col("mx") * 1000000.0 / F.col("tot")).cast("long").alias("top_share_e6"),
        F.floor(
            (
                2.0 * F.col("s1") / (F.col("n") * F.col("tot"))
                - (F.col("n") + 1.0) / F.col("n")
            )
            * 1000000
        )
        .cast("long")
        .alias("gini_e6"),
    )
