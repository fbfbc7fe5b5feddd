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
    count eliminates the shuffle entirely.

    Hygiene: a fresh (in-memory) metastore + a leftover warehouse
    directory from an interrupted prior run makes ``saveAsTable`` fail
    with LOCATION_ALREADY_EXISTS — ``mode("overwrite")`` can't save it
    because the catalog has no such table to overwrite. Drop both the
    table AND any stale location first, so a dirty workspace can never
    poison the write."""
    spark.sql(f"DROP TABLE IF EXISTS {name}")
    warehouse = spark.conf.get("spark.sql.warehouse.dir")
    loc = spark._jvm.org.apache.hadoop.fs.Path(f"{warehouse}/{name.lower()}")
    fs = loc.getFileSystem(spark._jsc.hadoopConfiguration())
    if fs.exists(loc):
        fs.delete(loc, True)
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

    Scale: the rank runs over the KEY relation (|keys| ≪ |rows|,
    already map-combined) and uses the distributed exact
    ``global_row_number`` — no single-partition window even at
    billion-key grain (a sampled estimate remains cheaper still when
    exactness isn't required)."""
    from etl_generator_demo_spark.operators.analytics_ext import global_row_number

    ev = t(spark, sf_dir, "events")
    c = ev.groupBy("user_id").agg(F.count(F.lit(1)).cast("long").alias("c"))
    ranked, _n = global_row_number(
        c, [F.col("c").asc(), F.col("user_id").asc()], rn_col="i"
    )
    r = ranked.select("c", "i")
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


BLOOM_HASHES = 3  # k
BLOOM_HEX_CHARS = 3  # 12-bit positions -> m = 4096 buckets


def bloom_bit_positions(keys: DataFrame, key_col: str) -> DataFrame:
    """Distinct (hash_id, pos) bit positions for a key set — the Bloom
    filter as a RELATION. Positions are the first 3 hex chars of
    md5('b{i}|' || key): engine-portable (no hex->int), 4096 buckets
    per hash. The relation is k·|keys| rows of 2 tiny columns — the
    broadcastable form of the filter."""
    pos_structs = F.array(
        *[
            F.struct(
                F.lit(i).alias("hash_id"),
                F.substring(
                    F.md5(
                        F.concat(
                            F.lit(f"b{i}|"), F.col(key_col).cast("string")
                        )
                    ),
                    1,
                    BLOOM_HEX_CHARS,
                ).alias("pos"),
            )
            for i in range(BLOOM_HASHES)
        ]
    )
    return (
        keys.select(F.explode(pos_structs).alias("p"))
        .select("p.hash_id", "p.pos")
        .distinct()
    )


def bloom_prune(
    fact_keys: DataFrame, key_col: str, bits: DataFrame
) -> DataFrame:
    """Keys of `fact_keys` that pass the Bloom membership test: all k
    probe positions present in `bits`. The bit relation is broadcast;
    the probe is a map-side explode + broadcast join + count==k gate —
    no shuffle of the fact side beyond its own distinct."""
    probes = fact_keys.select(
        key_col,
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).alias("hash_id"),
                        F.substring(
                            F.md5(
                                F.concat(
                                    F.lit(f"b{i}|"), F.col(key_col).cast("string")
                                )
                            ),
                            1,
                            BLOOM_HEX_CHARS,
                        ).alias("pos"),
                    )
                    for i in range(BLOOM_HASHES)
                ]
            )
        ).alias("p"),
    ).select(key_col, "p.hash_id", "p.pos")
    return (
        probes.join(F.broadcast(bits), ["hash_id", "pos"])
        .groupBy(key_col)
        .agg(F.count(F.lit(1)).alias("k_hit"))
        .filter(F.col("k_hit") == BLOOM_HASHES)
        .select(key_col)
    )


def _duck_bloom_pos(expr: str, i: int) -> str:
    return f"SUBSTR(MD5('b{i}|' || CAST({expr} AS VARCHAR)), 1, {BLOOM_HEX_CHARS})"


@register(
    "j_bloom_prejoin_prune",
    oracle=f"""
    WITH dim AS (
        SELECT DISTINCT c_custkey FROM customer
        WHERE c_mktsegment = 'BUILDING' AND c_acctbal > 0
    ),
    bits AS (
        SELECT DISTINCT hash_id, pos FROM (
            {" UNION ALL ".join(f"SELECT {i} AS hash_id, {_duck_bloom_pos('c_custkey', i)} AS pos FROM dim" for i in range(BLOOM_HASHES))}
        )
    ),
    fact_keys AS (SELECT DISTINCT o_custkey FROM orders),
    probes AS (
        {" UNION ALL ".join(f"SELECT o_custkey, {i} AS hash_id, {_duck_bloom_pos('o_custkey', i)} AS pos FROM fact_keys" for i in range(BLOOM_HASHES))}
    ),
    pass_keys AS (
        SELECT o_custkey FROM probes JOIN bits USING (hash_id, pos)
        GROUP BY o_custkey HAVING COUNT(*) = {BLOOM_HASHES}
    ),
    match_keys AS (
        SELECT o_custkey FROM fact_keys
        WHERE o_custkey IN (SELECT c_custkey FROM dim)
    )
    SELECT
        (SELECT CAST(COUNT(*) AS BIGINT) FROM dim)        AS n_dim_keys,
        (SELECT CAST(COUNT(*) AS BIGINT) FROM fact_keys)  AS n_fact_keys,
        (SELECT CAST(COUNT(*) AS BIGINT) FROM pass_keys)  AS n_pass_keys,
        (SELECT CAST(COUNT(*) AS BIGINT) FROM match_keys) AS n_match_keys,
        (SELECT CAST(COUNT(*) AS BIGINT) FROM pass_keys
          WHERE o_custkey NOT IN (SELECT o_custkey FROM match_keys)) AS n_false_pos,
        (SELECT COUNT(*) FROM match_keys
          WHERE o_custkey NOT IN (SELECT o_custkey FROM pass_keys)) = 0 AS zero_false_neg,
        CAST((SELECT COUNT(*) FROM pass_keys
               WHERE o_custkey NOT IN (SELECT o_custkey FROM match_keys)) * 1000000
             // GREATEST((SELECT COUNT(*) FROM fact_keys
                  WHERE o_custkey NOT IN (SELECT c_custkey FROM dim)), 1)
             AS BIGINT) AS fp_ppm,
        (SELECT CAST(COUNT(*) AS BIGINT) FROM orders)     AS n_fact_rows,
        (SELECT CAST(COUNT(*) AS BIGINT) FROM orders
          WHERE o_custkey IN (SELECT o_custkey FROM pass_keys)) AS n_rows_after_prune
    """,
    survey_ids=("J5", "J6", "P6"),
)
def j_bloom_prejoin_prune(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bloom-filter semi-join reduction, measured: build a 4096-bucket
    k=3 filter over a small dim key set (BUILDING customers in credit),
    probe every fact key scan-side, and report the pruning ledger —
    pass/match/false-positive counts, the zero-false-negatives
    invariant (both engines recompute it against the exact semi join),
    and the false-positive rate in ppm.

    This is the join-pruning idiom for 100 TB facts: the filter is
    k·|dim| (hash_id, 3-hex-pos) pairs — kilobytes broadcast to every
    scan task — and rows that cannot join never enter the shuffle.
    Spark's AQE injects runtime bloom filters for some plans; this
    operator is the explicit, engine-checked form with a measured FP
    ledger."""
    cust = t(spark, sf_dir, "customer")
    orders = t(spark, sf_dir, "orders")
    dim = (
        cust.filter((F.col("c_mktsegment") == "BUILDING") & (F.col("c_acctbal") > 0))
        .select("c_custkey")
        .distinct()
    )
    bits = bloom_bit_positions(dim, "c_custkey")
    fact_keys = orders.select("o_custkey").distinct()
    pass_keys = bloom_prune(fact_keys, "o_custkey", bits)
    match_keys = fact_keys.join(
        dim.withColumnRenamed("c_custkey", "o_custkey"), "o_custkey", "left_semi"
    )
    false_pos = pass_keys.join(match_keys, "o_custkey", "left_anti")
    missed = match_keys.join(pass_keys, "o_custkey", "left_anti")
    non_match = fact_keys.join(
        dim.withColumnRenamed("c_custkey", "o_custkey"), "o_custkey", "left_anti"
    )
    rows_pruned = orders.join(pass_keys, "o_custkey", "left_semi")

    n_fp = false_pos.count()
    n_nonmatch = non_match.count()
    counts = [
        dim.count(),
        fact_keys.count(),
        pass_keys.count(),
        match_keys.count(),
        n_fp,
        missed.count() == 0,
        # max(1, ·): if every fact key matches the dim set there are
        # no non-matching keys to false-positive on — fp_ppm is 0, not
        # a ZeroDivisionError (n_fp is 0 whenever n_nonmatch is)
        (n_fp * 1_000_000) // max(n_nonmatch, 1),
        orders.count(),
        rows_pruned.count(),
    ]
    row = [
        (
            int(counts[0]), int(counts[1]), int(counts[2]), int(counts[3]),
            int(counts[4]), bool(counts[5]), int(counts[6]), int(counts[7]),
            int(counts[8]),
        )
    ]
    return spark.createDataFrame(
        row,
        "n_dim_keys long, n_fact_keys long, n_pass_keys long, n_match_keys long, "
        "n_false_pos long, zero_false_neg boolean, fp_ppm long, "
        "n_fact_rows long, n_rows_after_prune long",
    )
