"""Operator-level sanity tests on sf0.001 (the DuckDB hash-compare runs
separately via tools/oracle_check.py and the driver)."""

from __future__ import annotations

import pytest

from etl_generator_demo_spark.registry import load_all


@pytest.fixture(scope="module")
def registry():
    return load_all()


def test_registry_names_unique_and_nonempty(registry):
    assert len(registry) >= 16


def test_flagship_smoke(spark, sf_dir):
    import __spark_entry__ as entry_mod

    df = entry_mod.entry(spark)
    rows = df.collect()
    assert len(rows) == 5  # five market segments
    assert set(df.columns) == {"c_mktsegment", "revenue", "n_orders", "n_customers"}
    assert all(r["revenue"] > 0 for r in rows)
    # ordered by revenue desc
    revs = [r["revenue"] for r in rows]
    assert revs == sorted(revs, reverse=True)


def test_oracle_contract_alignment(registry):
    import __spark_entry__ as entry_mod

    q = entry_mod.queries()
    o = entry_mod.oracle_sql()
    assert set(o) <= set(q)
    assert q, "queries() must not be empty"


def test_broadcast_in_flagship_plan(spark, sf_dir):
    """The dim side of the flagship join must be broadcast, not shuffled."""
    from etl_generator_demo_spark.operators.relational import q2_revenue_by_segment

    plan = q2_revenue_by_segment(spark, sf_dir)._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan


def test_predicate_pushdown_reaches_scan(spark, sf_dir):
    from etl_generator_demo_spark.operators.relational import p_predicates

    plan = p_predicates(spark, sf_dir)._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters: [" in plan and "IsNotNull" in plan


def test_column_pruning(spark, sf_dir):
    """A two-column projection must not read all 11 lineitem columns."""
    from etl_generator_demo_spark.operators.relational import t

    df = t(spark, sf_dir, "lineitem").select("l_orderkey", "l_quantity")
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "ReadSchema: struct<l_orderkey:bigint,l_quantity:double>" in plan


def test_empty_input_grouped_agg(spark, sf_dir):
    from etl_generator_demo_spark.operators.relational import t
    from pyspark.sql import functions as F

    li = t(spark, sf_dir, "lineitem").filter(F.col("l_quantity") < -1)
    out = li.groupBy("l_returnflag").agg(F.sum("l_quantity").alias("s")).collect()
    assert out == []
