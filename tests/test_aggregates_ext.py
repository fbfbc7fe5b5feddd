"""Extended-aggregate tests: sketch tiers vs exact tiers."""

from __future__ import annotations


def test_approx_percentiles_rank_accuracy(spark, sf_dir):
    """The sketch's guarantee is on RANK, not value (adjacent order
    statistics can be thousands apart on sparse data): the empirical
    CDF at each approximate percentile must sit within 2 percentage
    points of the requested percentile."""
    from pyspark.sql import functions as F

    from etl_generator_demo_spark.operators.aggregates_ext import a_percentiles_approx
    from etl_generator_demo_spark.operators.relational import t

    # the registered query outputs a bounded-error VERDICT (exact values
    # + within-2% flags); every flag must actually hold
    verdict = a_percentiles_approx(spark, sf_dir).collect()
    assert verdict
    for r in verdict:
        assert r["median_within_2pct"] and r["p90_within_2pct"] and r["p99_within_2pct"]

    # and the sketch's own guarantee is on RANK — check the estimates
    # directly against the empirical CDF
    approx = {
        r["o_orderpriority"]: r
        for r in t(spark, sf_dir, "orders")
        .groupBy("o_orderpriority")
        .agg(
            F.expr("approx_percentile(o_totalprice, 0.5, 10000)").alias("m"),
            F.expr("approx_percentile(o_totalprice, 0.9, 10000)").alias("p90"),
            F.expr("approx_percentile(o_totalprice, 0.99, 10000)").alias("p99"),
        )
        .collect()
    }
    orders = t(spark, sf_dir, "orders").select("o_orderpriority", "o_totalprice")
    vals: dict[str, list[float]] = {}
    for r in orders.collect():
        vals.setdefault(r["o_orderpriority"], []).append(r["o_totalprice"])
    for k, row in approx.items():
        group = sorted(vals[k])
        n = len(group)
        for col, p in (("m", 0.5), ("p90", 0.9), ("p99", 0.99)):
            cdf = sum(1 for v in group if v <= row[col]) / n
            assert abs(cdf - p) <= 0.02 + 1.0 / n, (k, col, p, cdf)
