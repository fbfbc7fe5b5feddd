"""Subquery surface: scalar, correlated, IN/EXISTS — reachable from the
reference's full-SQL grant (``sql_generator.py:37``) and a staple of
LLM-generated SQL. Exercises Catalyst's subquery rewrites (SURVEY §4:
decorrelation to joins, scalar-subquery to CROSS join of a 1-row agg)
— the engine expresses intent declaratively and the optimizer picks
the join strategy.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from etl_generator_demo_spark.operators.relational import t
from etl_generator_demo_spark.registry import register


# ---------------------------------------------------------------------------
# scalar subquery: compare each row to a global aggregate
# ---------------------------------------------------------------------------
_SCALAR_SQL = """
SELECT o_orderkey, ROUND(o_totalprice, 2) AS o_totalprice
FROM orders
WHERE o_totalprice > 1.5 * (SELECT AVG(o_totalprice) FROM orders)
ORDER BY o_orderkey
"""


@register("sq_scalar_above_1p5x_avg", oracle=_SCALAR_SQL, survey_ids=("A2", "P6"))
def sq_scalar(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scalar subquery via spark.sql (Catalyst plans the 1-row agg as a
    subquery-broadcast, not a driver round-trip)."""
    t(spark, sf_dir, "orders").createOrReplaceTempView("orders")
    return spark.sql(_SCALAR_SQL)


# ---------------------------------------------------------------------------
# correlated scalar subquery: row vs its group's aggregate
# ---------------------------------------------------------------------------
_CORR_SQL = """
SELECT c.c_custkey, c.c_nationkey
FROM customer c
WHERE c.c_acctbal > (SELECT AVG(c2.c_acctbal) * 1.5
                     FROM customer c2
                     WHERE c2.c_nationkey = c.c_nationkey)
ORDER BY c.c_custkey
"""


@register("sq_correlated_above_nation_avg", oracle=_CORR_SQL, survey_ids=("A1", "J1"))
def sq_correlated(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated scalar subquery — Catalyst decorrelates it into an
    aggregate + join; no per-row re-execution (the naive interpretation
    would be O(n^2) at 100 TB)."""
    t(spark, sf_dir, "customer").createOrReplaceTempView("customer")
    return spark.sql(_CORR_SQL)


# ---------------------------------------------------------------------------
# IN subquery + NOT EXISTS with extra correlation
# ---------------------------------------------------------------------------
_IN_EXISTS_SQL = """
SELECT p.p_partkey, p.p_brand
FROM part p
WHERE p.p_partkey IN (SELECT l_partkey FROM lineitem WHERE l_discount >= 0.09)
  AND NOT EXISTS (SELECT 1 FROM lineitem l2
                  WHERE l2.l_partkey = p.p_partkey AND l2.l_quantity > 49)
ORDER BY p.p_partkey
"""


@register("sq_in_and_not_exists", oracle=_IN_EXISTS_SQL, survey_ids=("J5", "P6"))
def sq_in_exists(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IN -> left-semi, NOT EXISTS -> left-anti; both planned as joins."""
    for name in ("part", "lineitem"):
        t(spark, sf_dir, name).createOrReplaceTempView(name)
    return spark.sql(_IN_EXISTS_SQL)


@register(
    "sq_notin_null_semantics",
    oracle="""
    SELECT
        (SELECT CAST(COUNT(*) AS BIGINT) FROM orders
         WHERE o_custkey NOT IN
               (SELECT NULLIF(c_custkey, 1) FROM customer))
            AS notin_null_poisoned,
        (SELECT CAST(COUNT(*) AS BIGINT) FROM orders o
         WHERE NOT EXISTS
               (SELECT 1 FROM customer c
                WHERE NULLIF(c.c_custkey, 1) = o.o_custkey))
            AS notexists_correct,
        (SELECT CAST(COUNT(*) AS BIGINT) FROM orders
         WHERE o_custkey NOT IN
               (SELECT c_custkey FROM customer WHERE c_custkey <> 1))
            AS notin_null_free
    """,
    survey_ids=("U1", "J5", "A2"),
)
def sq_notin_null_semantics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The three-valued-logic ``NOT IN`` trap, pinned cross-engine: a
    single NULL in the subquery list makes ``x NOT IN (...)`` never
    TRUE (it is FALSE for matches and NULL otherwise), so the
    null-poisoned count is **0** — while the NOT EXISTS spelling and
    the null-free NOT IN both return the orders of the excluded
    customer. LLM-generated SQL hits this constantly (it writes NOT
    IN against nullable FK columns); an engine that "fixes" the
    semantics silently would diverge from every production database.
    Spark compiles the poisoned form to a null-aware anti join
    (NAAJ); DuckDB evaluates the same ANSI rule — the query proves
    they agree on all three counts. Scalar subqueries broadcast; the
    anti joins key on custkey."""
    for name in ("orders", "customer"):
        t(spark, sf_dir, name).createOrReplaceTempView(f"_sqn_{name}")
    return spark.sql(
        """
        SELECT
            (SELECT CAST(COUNT(*) AS LONG) FROM _sqn_orders
             WHERE o_custkey NOT IN
                   (SELECT NULLIF(c_custkey, 1) FROM _sqn_customer))
                AS notin_null_poisoned,
            (SELECT CAST(COUNT(*) AS LONG) FROM _sqn_orders o
             WHERE NOT EXISTS
                   (SELECT 1 FROM _sqn_customer c
                    WHERE NULLIF(c.c_custkey, 1) = o.o_custkey))
                AS notexists_correct,
            (SELECT CAST(COUNT(*) AS LONG) FROM _sqn_orders
             WHERE o_custkey NOT IN
                   (SELECT c_custkey FROM _sqn_customer WHERE c_custkey <> 1))
                AS notin_null_free
        """
    )
