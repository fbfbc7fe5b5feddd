"""Additional TPC-H query shapes: Q8, Q10, Q13, Q15, Q17, Q19, Q22.

The reference's query surface is "whatever SELECT-shaped SQL an LLM
emits against a PostgreSQL/MySQL schema" (SURVEY §0; prompt grant
``sql_generator.py:37``), so the classic decision-support shapes are
exactly the query classes a user of the reference exercises. Q1/Q2/Q3/
Q4/Q6/Q7/Q14/Q18 live in ``relational.py``; this module adds the seven
remaining shapes expressible over the fixture schema (Q11/Q16/Q20 need
``partsupp``, which the fixtures do not ship; Q12/Q21 need
``l_shipmode``/``l_commitdate``/``l_receiptdate`` — both gaps noted in
COVERAGE.md):

- Q8  market share: share-of-group conditional aggregate over a
  six-table join with the nation dim in two roles.
- Q10 returned-item revenue: fact join + grouped agg + top-k.
- Q13 customer distribution: LEFT JOIN with an extra ON-clause
  predicate, then a two-level aggregate (count, then histogram of
  counts).
- Q15 top supplier: aggregated CTE reused twice (once for the scalar
  MAX, once as the join input).
- Q17 small-quantity revenue: per-key correlated scalar (avg per
  part) driving a fact filter — aggregate-join-filter-aggregate.
- Q19 disjunctive predicates: OR-of-ANDs across two tables, with the
  implied per-table envelope conjuncts peeled off so each side still
  pushes a filter into its scan.
- Q22 dormant high-balance accounts: global scalar subquery + NOT
  EXISTS anti join + grouped aggregate (phone-prefix variant adapted
  to the fixture schema: no ``c_phone`` column, and every customer
  has at least one order, so the anti-join target is "no URGENT
  order").

Scale notes (100 TB posture): every dim side (part/supplier/customer/
nation/region at fixture ratios) broadcasts; the only shuffles are the
fact-fact orders⋈lineitem joins and the final grouped aggregates, all
map-combined. Q13's first-level aggregate keys on c_custkey (high
cardinality, uniform); Q15/Q17 aggregate BEFORE joining so the big
side is pruned ahead of the shuffle; Q10's top-20 compiles to
TakeOrderedAndProject (no global sort).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from etl_generator_demo_spark.operators.relational import _revenue as _rev
from etl_generator_demo_spark.operators.relational import t
from etl_generator_demo_spark.registry import register


@register(
    "q8_market_share",
    oracle="""
    SELECT o_year,
           CAST(FLOOR(SUM(CASE WHEN nation = 'NATION_2' THEN volume ELSE 0 END)
                      / SUM(volume) * 1000000) / 1000000 AS DOUBLE) AS mkt_share,
           ROUND(SUM(volume), 2) AS total_volume
    FROM (
        SELECT CAST(YEAR(CAST(o_orderdate AS TIMESTAMP)) AS BIGINT) AS o_year,
               l_extendedprice * (1 - l_discount) AS volume,
               n2.n_name AS nation
        FROM lineitem
        JOIN part     ON p_partkey = l_partkey
        JOIN supplier ON s_suppkey = l_suppkey
        JOIN orders   ON o_orderkey = l_orderkey
        JOIN customer ON c_custkey = o_custkey
        JOIN nation n1 ON n1.n_nationkey = c_nationkey
        JOIN nation n2 ON n2.n_nationkey = s_nationkey
        JOIN region   ON r_regionkey = n1.n_regionkey
        WHERE r_name = 'ASIA' AND p_type = 'PROMO'
    )
    GROUP BY o_year
    ORDER BY o_year
    """,
    survey_ids=("J1", "J2", "J6", "A1", "F7"),
)
def q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8 shape — national market share: the share of PROMO-part
    revenue into ASIA-region customers supplied by one nation, per
    order year. Six-table join with nation in two roles (customer side
    filters through region; supplier side labels the share numerator).
    All five dims broadcast; the fact chain shuffles once for
    orders⋈lineitem and once into the year aggregate. The share is a
    conditional-SUM / SUM over the same grouped pass — one aggregate,
    not two joined ones. Floor-scaled to 1e-6 so the single division
    hashes identically across engines."""
    li = t(spark, sf_dir, "lineitem")
    p = t(spark, sf_dir, "part").filter(F.col("p_type") == "PROMO").select("p_partkey")
    s = t(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    o = t(spark, sf_dir, "orders").select("o_orderkey", "o_custkey", "o_orderdate")
    c = t(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    n = t(spark, sf_dir, "nation")
    r = t(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    n1 = (
        n.join(F.broadcast(r), n["n_regionkey"] == r["r_regionkey"])
        .select(F.col("n_nationkey").alias("c_nationkey"))
    )
    n2 = n.select(
        F.col("n_nationkey").alias("s_nationkey"), F.col("n_name").alias("nation")
    )
    vol = _rev()
    return (
        li.join(F.broadcast(p), li["l_partkey"] == p["p_partkey"])
        .join(F.broadcast(s), li["l_suppkey"] == s["s_suppkey"])
        .join(o, li["l_orderkey"] == o["o_orderkey"])
        .join(F.broadcast(c), o["o_custkey"] == c["c_custkey"])
        .join(F.broadcast(n1), "c_nationkey", "inner")
        .join(F.broadcast(n2), "s_nationkey")
        .select(
            F.year(F.col("o_orderdate").cast("timestamp")).cast("long").alias("o_year"),
            vol.alias("volume"),
            "nation",
        )
        .groupBy("o_year")
        .agg(
            (
                F.floor(
                    F.sum(F.when(F.col("nation") == "NATION_2", F.col("volume")).otherwise(0.0))
                    / F.sum("volume")
                    * 1_000_000
                )
                / 1_000_000
            ).cast("double").alias("mkt_share"),
            F.round(F.sum("volume"), 2).alias("total_volume"),
        )
        .orderBy("o_year")
    )


@register(
    "q10_returned_items",
    oracle="""
    SELECT c_custkey, c_name,
           ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS revenue,
           ROUND(c_acctbal, 2) AS c_acctbal, n_name
    FROM customer
    JOIN orders   ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    JOIN nation   ON n_nationkey = c_nationkey
    WHERE CAST(o_orderdate AS TIMESTAMP) >= TIMESTAMP '1997-01-01'
      AND CAST(o_orderdate AS TIMESTAMP) <  TIMESTAMP '1997-07-01'
      AND l_returnflag = 'R'
    GROUP BY c_custkey, c_name, c_acctbal, n_name
    ORDER BY revenue DESC, c_custkey
    LIMIT 20
    """,
    survey_ids=("J1", "J2", "J6", "A1", "O4"),
)
def q10_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10 shape — returned-item revenue: top-20 customers by
    revenue lost to returned lines in a two-quarter window. The
    returnflag filter pushes into the lineitem scan and the date
    filter into orders BEFORE their join; customer + nation broadcast
    onto the aggregated stream. ORDER BY rounded revenue with a
    custkey tiebreak + LIMIT compiles to TakeOrderedAndProject — the
    top-20 never global-sorts at scale."""
    c = t(spark, sf_dir, "customer").select(
        "c_custkey", "c_name", "c_acctbal", "c_nationkey"
    )
    o = t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate").cast("timestamp") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("o_orderdate").cast("timestamp") < F.lit("1997-07-01").cast("timestamp"))
    ).select("o_orderkey", "o_custkey")
    li = t(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R").select(
        "l_orderkey", "l_extendedprice", "l_discount"
    )
    n = t(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("c_nationkey"), "n_name"
    )
    return (
        li.join(o, li["l_orderkey"] == o["o_orderkey"])
        .join(F.broadcast(c), o["o_custkey"] == c["c_custkey"])
        .join(F.broadcast(n), "c_nationkey")
        .groupBy("c_custkey", "c_name", "c_acctbal", "n_name")
        .agg(F.round(F.sum(_rev()), 2).alias("revenue"))
        .select(
            "c_custkey",
            "c_name",
            "revenue",
            F.round(F.col("c_acctbal"), 2).alias("c_acctbal"),
            "n_name",
        )
        .orderBy(F.col("revenue").desc(), "c_custkey")
        .limit(20)
    )


@register(
    "q13_customer_distribution",
    oracle="""
    SELECT c_count, CAST(COUNT(*) AS BIGINT) AS custdist
    FROM (
        SELECT c_custkey, CAST(COUNT(o_orderkey) AS BIGINT) AS c_count
        FROM customer
        LEFT JOIN orders ON c_custkey = o_custkey
                        AND o_orderpriority <> '1-URGENT'
        GROUP BY c_custkey
    )
    GROUP BY c_count
    ORDER BY custdist DESC, c_count DESC
    """,
    survey_ids=("J4", "A1", "A2"),
)
def q13_customer_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13 shape — customer order-count distribution: LEFT JOIN
    whose ON clause carries an extra non-key predicate (filter the
    RIGHT side before joining — equivalent for LEFT JOIN, and it
    prunes the shuffle), COUNT of the nullable right key (counts 0 for
    no-match customers), then a second aggregate histogramming the
    counts. The first groupBy keys on c_custkey (high-cardinality,
    uniform — no skew); the histogram aggregate is tiny."""
    c = t(spark, sf_dir, "customer").select("c_custkey")
    o = t(spark, sf_dir, "orders").filter(
        F.col("o_orderpriority") != "1-URGENT"
    ).select("o_custkey", "o_orderkey")
    per_cust = (
        c.join(o, c["c_custkey"] == o["o_custkey"], "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").cast("long").alias("c_count"))
    )
    return (
        per_cust.groupBy("c_count")
        .agg(F.count(F.lit(1)).cast("long").alias("custdist"))
        .orderBy(F.col("custdist").desc(), F.col("c_count").desc())
    )


@register(
    "q15_top_supplier",
    oracle="""
    WITH revenue AS (
        SELECT l_suppkey AS supplier_no,
               ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS total_revenue
        FROM lineitem
        WHERE CAST(l_shipdate AS TIMESTAMP) >= TIMESTAMP '1996-01-01'
          AND CAST(l_shipdate AS TIMESTAMP) <  TIMESTAMP '1996-04-01'
        GROUP BY l_suppkey
    )
    SELECT s_suppkey, s_name, total_revenue
    FROM supplier
    JOIN revenue ON s_suppkey = supplier_no
    WHERE total_revenue = (SELECT MAX(total_revenue) FROM revenue)
    ORDER BY s_suppkey
    """,
    survey_ids=("U1", "A1", "A2", "J1", "J6"),
)
def q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15 shape — top supplier: a revenue-per-supplier aggregate
    (CTE) consumed twice — once reduced to a scalar MAX, once joined
    back to the supplier dim — keeping only the argmax row(s). The
    aggregate runs ONCE per branch over the date-pruned scan; the
    1-row MAX broadcasts as a cross join (scalar-subquery compile);
    supplier broadcasts. Revenue is rounded to 2dp on BOTH the value
    and the max so the cross-engine equality compare is on identical
    doubles."""
    li = t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate").cast("timestamp") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate").cast("timestamp") < F.lit("1996-04-01").cast("timestamp"))
    )
    rev = (
        li.groupBy(F.col("l_suppkey").alias("supplier_no"))
        .agg(F.round(F.sum(_rev()), 2).alias("total_revenue"))
    )
    mx = rev.agg(F.max("total_revenue").alias("_max_rev"))
    s = t(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    return (
        rev.crossJoin(F.broadcast(mx))
        .filter(F.col("total_revenue") == F.col("_max_rev"))
        .join(F.broadcast(s), F.col("supplier_no") == s["s_suppkey"])
        .select("s_suppkey", "s_name", "total_revenue")
        .orderBy("s_suppkey")
    )


@register(
    "q17_small_quantity_revenue",
    oracle="""
    SELECT ROUND(SUM(l_extendedprice) / 7.0, 2) AS avg_yearly,
           CAST(COUNT(*) AS BIGINT) AS n_lines
    FROM lineitem
    JOIN part ON p_partkey = l_partkey
    WHERE p_brand = 'Brand#1'
      AND l_quantity < (
          SELECT 0.2 * AVG(l_quantity)
          FROM lineitem l2
          WHERE l2.l_partkey = p_partkey
      )
    """,
    survey_ids=("J1", "J6", "A1", "A2", "P6"),
)
def q17_small_quantity_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17 shape — small-quantity-order revenue: lines whose
    quantity is under 20% of their part's average, for one brand. The
    correlated scalar subquery compiles to aggregate-then-join: the
    brand part set broadcasts as a semi-filter FIRST, the per-part
    average is computed only over the surviving lines (identical to
    the correlated semantics because the correlation key is the part
    itself — every line of a kept part is kept), and the threshold
    joins back on partkey. No per-row subquery execution anywhere; two
    passes over the brand-pruned lines."""
    p = t(spark, sf_dir, "part").filter(F.col("p_brand") == "Brand#1").select("p_partkey")
    li = t(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_quantity", "l_extendedprice"
    )
    li_brand = li.join(F.broadcast(p), li["l_partkey"] == p["p_partkey"]).select(
        "l_partkey", "l_quantity", "l_extendedprice"
    )
    thr = li_brand.groupBy("l_partkey").agg(
        (0.2 * F.avg("l_quantity")).alias("_qty_thr")
    )
    return (
        li_brand.join(thr, "l_partkey")
        .filter(F.col("l_quantity") < F.col("_qty_thr"))
        .agg(
            F.round(F.sum("l_extendedprice") / 7.0, 2).alias("avg_yearly"),
            F.count(F.lit(1)).cast("long").alias("n_lines"),
        )
    )


@register(
    "q19_disjunctive_predicates",
    oracle="""
    SELECT ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS revenue,
           CAST(COUNT(*) AS BIGINT) AS n_lines
    FROM lineitem
    JOIN part ON p_partkey = l_partkey
    WHERE (p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 15
           AND l_quantity BETWEEN 1 AND 21)
       OR (p_brand = 'Brand#2' AND p_size BETWEEN 1 AND 25
           AND l_quantity BETWEEN 10 AND 30)
       OR (p_brand = 'Brand#3' AND p_size BETWEEN 1 AND 35
           AND l_quantity BETWEEN 20 AND 40)
    """,
    survey_ids=("P6", "J1", "J6", "A2"),
)
def q19_disjunctive_predicates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19 shape — disjunctive cross-table predicates: an
    OR-of-ANDs that references both join sides, the case where naive
    planning loses all pushdown. The implied single-table envelopes
    are peeled off explicitly — ``p_brand IN (...) AND p_size <= 35``
    prunes the part scan and ``l_quantity BETWEEN 1 AND 40`` prunes
    the lineitem scan (both reach the parquet reader as
    PushedFilters) — then the exact disjunction evaluates as the
    residual condition of the broadcast join."""
    p = t(spark, sf_dir, "part").filter(
        F.col("p_brand").isin("Brand#1", "Brand#2", "Brand#3")
        & (F.col("p_size") >= 1)
        & (F.col("p_size") <= 35)
    ).select("p_partkey", "p_brand", "p_size")
    li = t(spark, sf_dir, "lineitem").filter(
        (F.col("l_quantity") >= 1) & (F.col("l_quantity") <= 40)
    ).select("l_partkey", "l_quantity", "l_extendedprice", "l_discount")
    disj = (
        ((F.col("p_brand") == "Brand#1") & F.col("p_size").between(1, 15)
         & F.col("l_quantity").between(1, 21))
        | ((F.col("p_brand") == "Brand#2") & F.col("p_size").between(1, 25)
           & F.col("l_quantity").between(10, 30))
        | ((F.col("p_brand") == "Brand#3") & F.col("p_size").between(1, 35)
           & F.col("l_quantity").between(20, 40))
    )
    return (
        li.join(F.broadcast(p), li["l_partkey"] == p["p_partkey"])
        .filter(disj)
        .agg(
            F.round(F.sum(_rev()), 2).alias("revenue"),
            F.count(F.lit(1)).cast("long").alias("n_lines"),
        )
    )


@register(
    "q22_dormant_accounts",
    oracle="""
    SELECT c_mktsegment AS segment,
           CAST(COUNT(*) AS BIGINT) AS numcust,
           ROUND(SUM(c_acctbal), 2) AS totacctbal
    FROM customer
    WHERE c_acctbal > (
        SELECT AVG(c_acctbal) FROM customer WHERE c_acctbal > 0.0
    )
    AND NOT EXISTS (
        SELECT 1 FROM orders
        WHERE o_custkey = c_custkey AND o_orderpriority = '1-URGENT'
    )
    GROUP BY c_mktsegment
    ORDER BY segment
    """,
    survey_ids=("A2", "J5", "A1", "P6"),
)
def q22_dormant_accounts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22 shape — high-balance customers with no urgent orders:
    a global scalar subquery (average positive balance) gating the
    scan, then a NOT EXISTS anti join, then a grouped aggregate.
    (Adapted to the fixture schema: no ``c_phone`` prefix column, and
    every customer has ≥1 order, so the anti-join target is the
    URGENT-priority subset — same operator composition as the
    published Q22.) The 1-row average broadcasts; the anti join keys
    on the pre-filtered, deduplicated urgent-customer set, which also
    broadcasts at fixture ratios (falls back to shuffle anti join at
    scale — semantics identical)."""
    c = t(spark, sf_dir, "customer").select("c_custkey", "c_acctbal", "c_mktsegment")
    avg_bal = c.filter(F.col("c_acctbal") > 0.0).agg(
        F.avg("c_acctbal").alias("_avg_bal")
    )
    urgent = (
        t(spark, sf_dir, "orders")
        .filter(F.col("o_orderpriority") == "1-URGENT")
        .select(F.col("o_custkey").alias("c_custkey"))
        .distinct()
    )
    return (
        c.crossJoin(F.broadcast(avg_bal))
        .filter(F.col("c_acctbal") > F.col("_avg_bal"))
        .join(urgent, "c_custkey", "left_anti")
        .groupBy(F.col("c_mktsegment").alias("segment"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("numcust"),
            F.round(F.sum("c_acctbal"), 2).alias("totacctbal"),
        )
        .orderBy("segment")
    )
