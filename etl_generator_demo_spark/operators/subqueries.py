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
