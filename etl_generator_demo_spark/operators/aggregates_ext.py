"""Extended aggregates: exact percentiles, collection aggregates,
pivot — rounding out §2.4's generated-SQL surface (median/top-list/
crosstab questions are staple LLM-SQL outputs).

Percentiles use Spark's exact `percentile` (linear interpolation,
same definition as DuckDB's quantile_cont); at 100 TB you swap in
`percentile_approx` (t-digest, one pass, bounded memory) — kept here
as the exact tier so the oracle can verify values.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from etl_generator_demo_spark.operators.relational import t
from etl_generator_demo_spark.registry import register


@register(
    "a_percentiles",
    oracle="""
    SELECT o_orderpriority,
           FLOOR(QUANTILE_CONT(o_totalprice, 0.5) * 100) / 100  AS median_price,
           FLOOR(QUANTILE_CONT(o_totalprice, 0.9) * 100) / 100  AS p90_price,
           FLOOR(QUANTILE_CONT(o_totalprice, 0.99) * 100) / 100 AS p99_price
    FROM orders
    GROUP BY o_orderpriority
    ORDER BY o_orderpriority
    """,
    survey_ids=("A1", "A2"),
)
def a_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = t(spark, sf_dir, "orders")
    def fp(p):
        return F.floor(F.expr(f"percentile(o_totalprice, {p})") * 100) / 100
    return (
        o.groupBy("o_orderpriority")
        .agg(
            fp(0.5).alias("median_price"),
            fp(0.9).alias("p90_price"),
            fp(0.99).alias("p99_price"),
        )
        .orderBy("o_orderpriority")
    )


@register(
    "a_collect_sets",
    oracle="""
    SELECT o_custkey,
           ARRAY_TO_STRING(LIST_SORT(LIST_DISTINCT(LIST(o_orderpriority))), ',') AS priorities_csv,
           ARRAY_TO_STRING(LIST_SORT(LIST_DISTINCT(LIST(o_orderstatus))), ',')   AS status_csv
    FROM orders
    WHERE o_custkey <= 100
    GROUP BY o_custkey
    ORDER BY o_custkey
    """,
    survey_ids=("A1",),
)
def a_collect_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Collection aggregates: collect_set / string_agg-style CSVs
    (sorted for determinism — collect order is partition-dependent).
    Both set columns are emitted as deterministic CSV strings: the
    driver's pandas canonicalizer cannot sort/hash array cells, so
    registered queries never return array-typed columns (the
    array-returning form is the plain ``F.collect_set`` library
    call)."""
    o = t(spark, sf_dir, "orders").filter(F.col("o_custkey") <= 100)
    return (
        o.groupBy("o_custkey")
        .agg(
            F.array_join(F.sort_array(F.collect_set("o_orderpriority")), ",").alias(
                "priorities_csv"
            ),
            F.array_join(F.sort_array(F.collect_set("o_orderstatus")), ",").alias("status_csv"),
        )
        .orderBy("o_custkey")
    )


@register(
    "q6_forecast_revenue",
    oracle="""
    SELECT ROUND(SUM(l_extendedprice * l_discount), 2) AS revenue_increase,
           COUNT(*) AS n_candidates
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1997-01-01'
      AND l_shipdate <  TIMESTAMP '1998-01-01'
      AND l_discount BETWEEN 0.05 AND 0.07
      AND l_quantity < 24
    """,
    survey_ids=("A2", "P6", "F6"),
)
def q6_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6 shape: pure scan + pushed-down predicates + global agg —
    the query class where scan pruning IS the runtime."""
    li = t(spark, sf_dir, "lineitem")
    return (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
            & F.col("l_discount").between(0.05, 0.07)
            & (F.col("l_quantity") < 24)
        )
        .agg(
            F.round(F.sum(F.col("l_extendedprice") * F.col("l_discount")), 2).alias(
                "revenue_increase"
            ),
            F.count(F.lit(1)).alias("n_candidates"),
        )
    )


@register(
    "a_stats_moments",
    oracle="""
    SELECT l_returnflag,
           FLOOR(STDDEV_SAMP(l_extendedprice) * 100) / 100          AS price_stddev,
           FLOOR(VAR_SAMP(l_discount) * 100000000) / 100000000      AS disc_variance,
           FLOOR(CORR(l_quantity, l_extendedprice) * 1000000) / 1000000 AS qty_price_corr
    FROM lineitem
    GROUP BY l_returnflag
    ORDER BY l_returnflag
    """,
    survey_ids=("A1", "A2"),
)
def a_stats_moments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Statistical aggregates: sample stddev/variance + Pearson
    correlation (single-pass co-moment accumulation in both engines)."""
    li = t(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_returnflag")
        .agg(
            (F.floor(F.stddev_samp("l_extendedprice") * 100) / 100).alias("price_stddev"),
            (F.floor(F.var_samp("l_discount") * 100000000) / 100000000).alias("disc_variance"),
            (F.floor(F.corr("l_quantity", "l_extendedprice") * 1000000) / 1000000).alias(
                "qty_price_corr"
            ),
        )
        .orderBy("l_returnflag")
    )


@register(
    "f_json_map_explode",
    oracle="""
    SELECT event_id, 'k' AS prop_key,
           CAST(REGEXP_EXTRACT(props, '"k":\\s*(-?\\d+)', 1) AS BIGINT) AS prop_value
    FROM events
    WHERE event_id < 100
    ORDER BY event_id
    """,
    survey_ids=("F8",),
)
def f_json_map_explode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON -> MapType -> explode (key/value long form): the generic
    path for heterogeneous JSON props (SURVEY §1.2 [EXT] MapType)."""
    ev = t(spark, sf_dir, "events").filter(F.col("event_id") < 100)
    m = F.from_json("props", "map<string,bigint>")
    return (
        ev.select("event_id", F.explode(m).alias("prop_key", "prop_value"))
        .orderBy("event_id", "prop_key")
    )


@register(
    "a_grouping_markers",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           CAST(GROUPING(l_returnflag) AS INT)  AS g_flag,
           CAST(GROUPING(l_linestatus) AS INT)  AS g_status,
           COUNT(*) AS n
    FROM lineitem
    GROUP BY ROLLUP (l_returnflag, l_linestatus)
    ORDER BY g_flag, g_status, l_returnflag NULLS FIRST, l_linestatus NULLS FIRST
    """,
    survey_ids=("A5",),
)
def a_grouping_markers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GROUPING() markers distinguish 'NULL because subtotal row' from
    'NULL in the data' — required for correct rollup consumers."""
    li = t(spark, sf_dir, "lineitem")
    return (
        li.rollup("l_returnflag", "l_linestatus")
        .agg(
            # grouping() is only valid inside the rollup aggregation
            F.grouping("l_returnflag").cast("int").alias("g_flag"),
            F.grouping("l_linestatus").cast("int").alias("g_status"),
            F.count(F.lit(1)).alias("n"),
        )
        .select("l_returnflag", "l_linestatus", "g_flag", "g_status", "n")
        .orderBy(
            "g_flag",
            "g_status",
            F.col("l_returnflag").asc_nulls_first(),
            F.col("l_linestatus").asc_nulls_first(),
        )
    )


@register(
    "a_unpivot_metrics",
    oracle="""
    WITH m AS (
        SELECT l_returnflag,
               ROUND(SUM(l_quantity), 2)      AS sum_qty,
               ROUND(SUM(l_extendedprice), 2) AS sum_price,
               ROUND(SUM(l_discount), 2)      AS sum_disc
        FROM lineitem GROUP BY l_returnflag
    )
    SELECT l_returnflag, 'sum_qty' AS metric, sum_qty AS metric_value FROM m
    UNION ALL
    SELECT l_returnflag, 'sum_price', sum_price FROM m
    UNION ALL
    SELECT l_returnflag, 'sum_disc', sum_disc FROM m
    ORDER BY l_returnflag, metric
    """,
    survey_ids=("A5", "U2"),
)
def a_unpivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wide-to-long unpivot (melt) of per-flag metrics."""
    li = t(spark, sf_dir, "lineitem")
    wide = li.groupBy("l_returnflag").agg(
        F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
        F.round(F.sum("l_extendedprice"), 2).alias("sum_price"),
        F.round(F.sum("l_discount"), 2).alias("sum_disc"),
    )
    return wide.unpivot(
        ["l_returnflag"], ["sum_qty", "sum_price", "sum_disc"], "metric", "metric_value"
    ).orderBy("l_returnflag", "metric")


@register(
    "a_pivot_status_by_priority",
    oracle="""
    SELECT o_orderpriority,
           NULLIF(COUNT(*) FILTER (WHERE o_orderstatus = 'O'), 0) AS O,
           NULLIF(COUNT(*) FILTER (WHERE o_orderstatus = 'F'), 0) AS F,
           NULLIF(COUNT(*) FILTER (WHERE o_orderstatus = 'P'), 0) AS P
    FROM orders
    GROUP BY o_orderpriority
    ORDER BY o_orderpriority
    """,
    survey_ids=("A1", "A5"),
)
def a_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Crosstab via pivot with an explicit value list (no extra pass to
    discover values; required for a stable schema at scale)."""
    o = t(spark, sf_dir, "orders")
    return (
        o.groupBy("o_orderpriority")
        .pivot("o_orderstatus", ["O", "F", "P"])
        .count()
        .orderBy("o_orderpriority")
    )


@register(
    "a_percentiles_approx",
    oracle="""
    SELECT o_orderpriority,
           FLOOR(QUANTILE_CONT(o_totalprice, 0.5) * 100) / 100  AS exact_median,
           TRUE AS median_within_2pct,
           FLOOR(QUANTILE_CONT(o_totalprice, 0.9) * 100) / 100  AS exact_p90,
           TRUE AS p90_within_2pct,
           FLOOR(QUANTILE_CONT(o_totalprice, 0.99) * 100) / 100 AS exact_p99,
           TRUE AS p99_within_2pct
    FROM orders
    GROUP BY o_orderpriority
    ORDER BY o_orderpriority
    """,
    survey_ids=("A1", "A3"),
)
def a_percentiles_approx(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scale tier of ``a_percentiles`` — ``approx_percentile`` (KLL-type
    mergeable sketch, single pass, bounded memory, max rank error
    1/10000) — stated as a BOUNDED-ERROR VERDICT the oracle can hash:
    each group's EXACT interpolated percentiles (value-verified by
    DuckDB's QUANTILE_CONT) plus per-percentile flags asserting the
    sketch estimate lands within 2% relative error. DuckDB emits TRUE
    literals, so the value hash deterministically checks the tolerance
    claim. Exact ``percentile`` buffers every group value — fine
    per-priority at sf0.1, not at 100 TB; the sketch is what runs
    there."""
    o = t(spark, sf_dir, "orders")

    def ex(p):
        return F.floor(F.expr(f"percentile(o_totalprice, {p})") * 100) / 100

    def ap(p):
        return F.expr(f"approx_percentile(o_totalprice, {p}, 10000)")

    est = o.groupBy("o_orderpriority").agg(
        ex(0.5).alias("exact_median"),
        ap(0.5).alias("approx_median"),
        ex(0.9).alias("exact_p90"),
        ap(0.9).alias("approx_p90"),
        ex(0.99).alias("exact_p99"),
        ap(0.99).alias("approx_p99"),
    )
    within = lambda a, e: (  # noqa: E731
        F.abs(F.col(a) - F.col(e)) / F.col(e) < F.lit(0.02)
    )
    return est.select(
        "o_orderpriority",
        "exact_median",
        within("approx_median", "exact_median").alias("median_within_2pct"),
        "exact_p90",
        within("approx_p90", "exact_p90").alias("p90_within_2pct"),
        "exact_p99",
        within("approx_p99", "exact_p99").alias("p99_within_2pct"),
    ).orderBy("o_orderpriority")


# ---------------------------------------------------------------------------
# A5 — explicit GROUPING SETS (rollup/cube's general form)
# ---------------------------------------------------------------------------
_GROUPING_SETS_SQL = """
SELECT l_returnflag, l_linestatus,
       CAST(GROUPING(l_returnflag) AS INT) AS g_flag,
       CAST(GROUPING(l_linestatus) AS INT) AS g_status,
       COUNT(*) AS n,
       ROUND(SUM(l_quantity), 2) AS sum_qty
FROM lineitem
GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), (l_returnflag, l_linestatus))
ORDER BY g_flag, g_status, l_returnflag NULLS FIRST, l_linestatus NULLS FIRST
"""


@register(
    "a_grouping_sets",
    oracle=_GROUPING_SETS_SQL,
    survey_ids=("A5",),
)
def a_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit GROUPING SETS — the general form rollup/cube sugar over
    (SURVEY §2.4 A5): per-flag totals, per-status totals, and the full
    cross, in ONE aggregation pass (Spark expands the sets into a
    single Expand + hash aggregate, not three scans). GROUPING()
    markers disambiguate subtotal NULLs from data NULLs. The exact SQL
    text runs on both engines."""
    t(spark, sf_dir, "lineitem").createOrReplaceTempView("lineitem")
    return spark.sql(_GROUPING_SETS_SQL)


@register(
    "a_bool_aggregates",
    oracle="""
    SELECT o_custkey,
           BOOL_AND(o_orderpriority = '1-URGENT') AS all_urgent,
           BOOL_OR(o_totalprice > 200000)         AS any_big,
           CAST(COUNT(*) FILTER (WHERE o_orderstatus = 'F') AS BIGINT) AS n_finished
    FROM orders
    WHERE o_custkey <= 200
    GROUP BY o_custkey
    ORDER BY o_custkey
    """,
    survey_ids=("A1",),
)
def a_bool_aggregates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Boolean aggregates (every/any) + a FILTER-clause conditional
    count — the "did ALL/ANY of this customer's orders ..." question
    class. All three are single-pass map-combinable aggregates."""
    o = t(spark, sf_dir, "orders").filter(F.col("o_custkey") <= 200)
    return (
        o.groupBy("o_custkey")
        .agg(
            F.bool_and(F.col("o_orderpriority") == "1-URGENT").alias("all_urgent"),
            F.bool_or(F.col("o_totalprice") > 200000).alias("any_big"),
            F.count_if(F.col("o_orderstatus") == "F").cast("long").alias("n_finished"),
        )
        .orderBy("o_custkey")
    )


@register(
    "a_multi_distinct",
    oracle="""
    SELECT o_orderpriority,
           CAST(COUNT(DISTINCT o_custkey) AS BIGINT)               AS n_customers,
           CAST(COUNT(DISTINCT o_orderstatus) AS BIGINT)           AS n_statuses,
           CAST(COUNT(DISTINCT CAST(o_orderdate AS DATE)) AS BIGINT) AS n_days,
           CAST(COUNT(*) AS BIGINT)                                AS n_orders
    FROM orders
    GROUP BY o_orderpriority
    ORDER BY o_orderpriority
    """,
    survey_ids=("A3", "A1"),
)
def a_multi_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multiple COUNT(DISTINCT ...) in ONE aggregation — the classic
    plan trap: Spark compiles N distinct columns into an Expand node
    that replicates every input row N times before the hash aggregate.
    Correct and single-pass, but at 100 TB the Expand multiplies
    shuffle volume by the distinct-column count — the scale rewrite is
    one `approx_count_distinct` per column (no Expand, one sketch
    each; `a_approx_distinct` is that registered tier)."""
    o = t(spark, sf_dir, "orders")
    return (
        o.groupBy("o_orderpriority")
        .agg(
            F.count_distinct("o_custkey").cast("long").alias("n_customers"),
            F.count_distinct("o_orderstatus").cast("long").alias("n_statuses"),
            F.count_distinct(F.col("o_orderdate").cast("date")).cast("long").alias("n_days"),
            F.count(F.lit(1)).cast("long").alias("n_orders"),
        )
        .orderBy("o_orderpriority")
    )


@register(
    "a_weighted_median",
    oracle="""
    WITH li AS (
        SELECT l_returnflag AS grp,
               l_extendedprice AS v,
               CAST(l_quantity AS BIGINT) AS w,
               l_orderkey, l_linenumber
        FROM lineitem
    ),
    tot AS (SELECT grp, SUM(w) AS tw FROM li GROUP BY grp),
    cum AS (
        SELECT grp, v, w, l_orderkey, l_linenumber,
               SUM(w) OVER (PARTITION BY grp ORDER BY v, l_orderkey, l_linenumber
                            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cw
        FROM li
    ),
    hit AS (
        SELECT c.grp, c.v, c.cw, t.tw,
               ROW_NUMBER() OVER (PARTITION BY c.grp
                                  ORDER BY c.v, c.l_orderkey, c.l_linenumber) AS rn
        FROM cum c JOIN tot t ON t.grp = c.grp
        WHERE 2 * c.cw >= t.tw
    )
    SELECT grp, v AS weighted_median,
           CAST(tw AS BIGINT) AS total_weight,
           CAST(cw AS BIGINT) AS cum_weight_at_median
    FROM hit WHERE rn = 1
    ORDER BY grp
    """,
    survey_ids=("A1", "W3"),
)
def a_weighted_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted median (lower) of extended price, weighted by quantity,
    per return flag — the robust center for 'half the UNITS shipped
    cost less than X', which the unweighted median cannot answer.
    Classic cumulative-weight construction: total order on (value,
    natural key), running SUM(weight), first row with 2·cumw ≥ W.
    Weights are exact BIGINTs so the crossing row is engine-identical
    (no interpolation, no float compare). One window shuffle on the
    group key + the totals broadcast — scale-free per group."""
    from pyspark.sql import Window

    li = t(spark, sf_dir, "lineitem").select(
        F.col("l_returnflag").alias("grp"),
        F.col("l_extendedprice").alias("v"),
        F.col("l_quantity").cast("long").alias("w"),
        "l_orderkey",
        "l_linenumber",
    )
    tot = li.groupBy("grp").agg(F.sum("w").alias("tw"))
    order = [F.col("v"), F.col("l_orderkey"), F.col("l_linenumber")]
    cum = li.withColumn(
        "cw",
        F.sum("w").over(
            Window.partitionBy("grp")
            .orderBy(*order)
            .rowsBetween(Window.unboundedPreceding, 0)
        ),
    )
    hit = (
        cum.join(F.broadcast(tot), "grp")
        .filter(2 * F.col("cw") >= F.col("tw"))
        .withColumn(
            "rn",
            F.row_number().over(Window.partitionBy("grp").orderBy(*order)),
        )
        .filter(F.col("rn") == 1)
    )
    return hit.select(
        "grp",
        F.col("v").alias("weighted_median"),
        F.col("tw").cast("long").alias("total_weight"),
        F.col("cw").cast("long").alias("cum_weight_at_median"),
    ).orderBy("grp")


# ---------------------------------------------------------------------------
# HLL sketch shard-merge — the mergeability property, proven
# ---------------------------------------------------------------------------
@register(
    "a_hll_shard_merge",
    oracle="""
    WITH shards AS (
        SELECT o_orderkey % 8 AS shard, o_custkey FROM orders
    )
    SELECT CAST(COUNT(DISTINCT o_custkey) AS BIGINT) AS exact_distinct,
           CAST(8 AS BIGINT) AS n_shards,
           TRUE AS merge_within_1pct,
           TRUE AS within_5pct
    FROM shards
    """,
    survey_ids=("A3",),
)
def a_hll_shard_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sketch MERGEABILITY — the property that makes approximate
    distinct-counting work at 100 TB: per-shard HLL sketches
    (``hll_sketch_agg``, Datasketches binary) union-merged with
    ``hll_union_agg`` must estimate what one global sketch estimates
    to within 1% (register-merge is associative; the union's output
    REPRESENTATION can differ from the single-pass sketch in sparse
    mode — measured 1488 vs 1492 on the fixture — so the contract is
    estimate-stability, not bit-equality) and land within 5% of
    truth. The query computes all three on the engine — 8 shard
    sketches → merge → estimate; one global sketch → estimate; exact
    COUNT(DISTINCT) — and emits verdict booleans next to the exact
    count. The oracle pins the exact count value-for-value and the
    verdicts as constants: if Spark's merge ever drifted, the hash
    flips. This is the
    scale tier behind `a_approx_distinct`: shard sketches are what an
    incremental pipeline PERSISTS (bytes per shard), re-aggregating
    without rescanning history."""
    o = t(spark, sf_dir, "orders").select(
        (F.col("o_orderkey") % 8).alias("shard"), "o_custkey"
    )
    per_shard = o.groupBy("shard").agg(
        F.hll_sketch_agg("o_custkey").alias("sk")
    )
    merged = per_shard.agg(
        F.hll_sketch_estimate(F.hll_union_agg("sk")).alias("est_merged")
    )
    glob = o.agg(
        F.hll_sketch_estimate(F.hll_sketch_agg("o_custkey")).alias("est_global"),
        F.countDistinct("o_custkey").cast("long").alias("exact_distinct"),
    )
    return (
        glob.crossJoin(F.broadcast(merged))
        .select(
            "exact_distinct",
            F.lit(8).cast("long").alias("n_shards"),
            (
                F.abs(F.col("est_merged") - F.col("est_global"))
                <= 0.01 * F.col("est_global")
            ).alias("merge_within_1pct"),
            (
                F.abs(F.col("est_merged") - F.col("exact_distinct"))
                <= 0.05 * F.col("exact_distinct")
            ).alias("within_5pct"),
        )
    )


# ---------------------------------------------------------------------------
# Rolling 7-day distinct users via mergeable sketches — the scale tier
# ---------------------------------------------------------------------------
@register(
    "x4_rolling_7d_hll_users",
    oracle="""
    WITH daily AS (
        SELECT DISTINCT CAST(CAST(ts AS TIMESTAMP) AS DATE) AS day, user_id
        FROM events
    ),
    days AS (SELECT DISTINCT day FROM daily),
    exact7 AS (
        SELECT d.day, COUNT(DISTINCT u.user_id) AS exact_7d,
               COUNT(DISTINCT u.day) AS n_days_merged
        FROM days d JOIN daily u ON u.day BETWEEN d.day - 6 AND d.day
        GROUP BY d.day
    )
    SELECT CAST(day AS TIMESTAMP) AS day,
           CAST(exact_7d AS BIGINT) AS exact_7d,
           CAST(n_days_merged AS BIGINT) AS n_days_merged,
           TRUE AS within_5pct
    FROM exact7
    ORDER BY day
    """,
    survey_ids=("A3", "W3"),
)
def x4_rolling_7d_hll_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling 7-day distinct users from PER-DAY HLL SKETCHES — the
    tier that replaces `x4_rolling_7d_active_users`' exact
    explode-and-dedup at 100 TB: persist one sketch per day (KBs),
    answer any trailing window by union-merging 7 of them
    (``hll_union_agg``) — re-aggregation without rescanning history,
    and the union count is windows×7 sketch merges, independent of the
    user count. The exact rolling distinct runs alongside and the
    oracle hashes it value-for-value, with the sketch estimate pinned
    by a within-5% verdict per day (same bounded-error contract as
    `a_approx_distinct`/`a_hll_shard_merge`)."""
    ev = t(spark, sf_dir, "events")
    daily = ev.select(
        F.to_date(F.col("ts").cast("timestamp")).alias("day"), "user_id"
    ).distinct()
    sketches = daily.groupBy("day").agg(
        F.hll_sketch_agg("user_id").alias("sk")
    )
    days = daily.select("day").distinct()
    merged = (
        days.alias("d")
        .join(
            sketches.alias("s"),
            (F.col("s.day") >= F.date_sub(F.col("d.day"), 6))
            & (F.col("s.day") <= F.col("d.day")),
        )
        .groupBy(F.col("d.day").alias("day"))
        .agg(
            F.hll_sketch_estimate(F.hll_union_agg("sk")).alias("est_7d"),
            F.count(F.lit(1)).cast("long").alias("n_days_merged"),
        )
    )
    exact = (
        days.alias("d")
        .join(
            daily.alias("u"),
            (F.col("u.day") >= F.date_sub(F.col("d.day"), 6))
            & (F.col("u.day") <= F.col("d.day")),
        )
        .groupBy(F.col("d.day").alias("day"))
        .agg(F.countDistinct("user_id").cast("long").alias("exact_7d"))
    )
    return (
        exact.join(merged, "day")
        .select(
            F.col("day").cast("timestamp").alias("day"),
            "exact_7d",
            "n_days_merged",
            (
                F.abs(F.col("est_7d") - F.col("exact_7d"))
                <= 0.05 * F.col("exact_7d")
            ).alias("within_5pct"),
        )
        .orderBy("day")
    )


@register(
    "a_mode_orderpriority",
    oracle="""
    WITH c AS (
        SELECT o_orderstatus, o_orderpriority, CAST(COUNT(*) AS BIGINT) AS n
        FROM orders GROUP BY o_orderstatus, o_orderpriority
    ),
    m AS (
        SELECT o_orderstatus, MAX(n) AS mx FROM c GROUP BY o_orderstatus
    )
    SELECT c.o_orderstatus AS status,
           MIN(c.o_orderpriority) AS mode_priority,
           CAST(MAX(c.n) AS BIGINT) AS mode_count
    FROM c JOIN m ON c.o_orderstatus = m.o_orderstatus AND c.n = m.mx
    GROUP BY c.o_orderstatus
    ORDER BY status
    """,
    survey_ids=("A1", "A2", "J1"),
)
def a_mode_orderpriority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Statistical MODE per group with a pinned tie discipline — the
    most frequent order priority per order status, ties resolved to
    the SMALLEST value. Engines disagree on bare ``mode()`` tie
    behavior (Spark's ``mode`` and DuckDB's ``mode`` both pick an
    arbitrary winner), so the portable spelling is the argmax join:
    count per (group, value), max count per group, keep the rows at
    the max, MIN(value) collapses ties deterministically. The
    per-group max is a WINDOW over the counts relation — |group ×
    value-domain| rows, so the window partitions are tiny — which
    keeps the fact scan to ONE pass (the aggregate-then-rejoin
    spelling recomputed the counts aggregate, scanning orders twice;
    measured 47% slower at sf0.1). The count aggregate map-combines;
    identical plan shape at any corpus size because every shuffle is
    keyed on the (tiny) group domain."""
    from pyspark.sql import Window

    c = (
        t(spark, sf_dir, "orders")
        .groupBy("o_orderstatus", "o_orderpriority")
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
    )
    w = Window.partitionBy("o_orderstatus")
    return (
        c.withColumn("mx", F.max("n").over(w))
        .filter(F.col("n") == F.col("mx"))
        .groupBy(F.col("o_orderstatus").alias("status"))
        .agg(
            F.min("o_orderpriority").alias("mode_priority"),
            F.max("n").cast("long").alias("mode_count"),
        )
        .orderBy("status")
    )


@register(
    "a_filtered_aggregates",
    oracle="""
    SELECT o_orderstatus AS status,
           CAST(COUNT(*) FILTER (WHERE o_orderpriority = '1-URGENT')
                AS BIGINT) AS n_urgent,
           CAST(COUNT(*) FILTER (WHERE o_orderpriority IN
                                 ('2-HIGH', '3-MEDIUM')) AS BIGINT) AS n_mid,
           CAST(SUM(CAST(FLOOR(o_totalprice * 100 + 0.5) AS BIGINT))
                FILTER (WHERE o_orderpriority = '5-LOW') AS BIGINT)
                AS low_cents,
           CAST(COUNT(*) AS BIGINT) AS n_total
    FROM orders
    GROUP BY o_orderstatus
    ORDER BY status
    """,
    survey_ids=("A1", "A4", "F7"),
)
def a_filtered_aggregates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANSI ``FILTER (WHERE ...)`` aggregate clause — several
    differently-filtered aggregates in ONE grouped pass, the SQL:2003
    surface LLM-generated analytics SQL reaches for constantly (and
    the cleaner spelling of the CASE-WHEN-inside-SUM idiom). Supported
    natively by both Spark (3.0+) and DuckDB, so the oracle runs the
    identical text. One map-combined aggregate; monetary sums in exact
    half-up cents; a filtered SUM over an empty group is NULL in both
    engines (not 0 — the CASE spelling would differ)."""
    return (
        t(spark, sf_dir, "orders")
        .groupBy(F.col("o_orderstatus").alias("status"))
        .agg(
            F.expr(
                "CAST(COUNT(*) FILTER (WHERE o_orderpriority = '1-URGENT') AS LONG)"
            ).alias("n_urgent"),
            F.expr(
                "CAST(COUNT(*) FILTER (WHERE o_orderpriority IN "
                "('2-HIGH', '3-MEDIUM')) AS LONG)"
            ).alias("n_mid"),
            F.expr(
                "CAST(SUM(CAST(FLOOR(o_totalprice * 100 + 0.5) AS LONG)) "
                "FILTER (WHERE o_orderpriority = '5-LOW') AS LONG)"
            ).alias("low_cents"),
            F.count(F.lit(1)).cast("long").alias("n_total"),
        )
        .orderBy("status")
    )


@register(
    "a_listagg_ordered",
    oracle="""
    WITH c AS (
        SELECT o_orderstatus, o_orderpriority, CAST(COUNT(*) AS BIGINT) AS n
        FROM orders GROUP BY o_orderstatus, o_orderpriority
    )
    SELECT o_orderstatus AS status,
           STRING_AGG(o_orderpriority || ':' || CAST(n AS VARCHAR), ','
                      ORDER BY o_orderpriority) AS prio_profile
    FROM c
    GROUP BY o_orderstatus
    ORDER BY status
    """,
    survey_ids=("A1", "A4", "F4"),
)
def a_listagg_ordered(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic ordered string aggregation — SQL:2016
    ``LISTAGG ... WITHIN GROUP (ORDER BY ...)``, new in Spark 4.0
    (DuckDB spells it ``STRING_AGG(expr, sep ORDER BY ...)``). The
    report-feed staple for "one row per entity with an ordered CSV
    profile". Aggregated OVER THE VALUE DOMAIN, not raw rows: counts
    per (status, priority) first — |domain| strings of bounded length
    — then the ordered concat, so the output string can never grow
    with the fact table (the raw-row spelling is the classic
    driver-OOM at scale). The WITHIN GROUP order makes the result
    deterministic, which is what lets the oracle hash it."""
    c = (
        t(spark, sf_dir, "orders")
        .groupBy("o_orderstatus", "o_orderpriority")
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
    )
    return (
        c.groupBy(F.col("o_orderstatus").alias("status"))
        .agg(
            F.expr(
                "listagg(concat(o_orderpriority, ':', CAST(n AS STRING)), ',') "
                "WITHIN GROUP (ORDER BY o_orderpriority)"
            ).alias("prio_profile")
        )
        .orderBy("status")
    )


@register(
    "a_group_by_all_revenue",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           CAST(YEAR(CAST(l_shipdate AS TIMESTAMP)) AS BIGINT) AS ship_year,
           ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS revenue,
           CAST(COUNT(*) AS BIGINT) AS n_lines
    FROM lineitem
    GROUP BY ALL
    ORDER BY ALL
    """,
    survey_ids=("A1", "O1", "F7"),
)
def a_group_by_all_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``GROUP BY ALL`` + ``ORDER BY ALL`` — the modern-SQL
    abbreviation (DuckDB-originated, in Spark since 3.4) that
    LLM-generated SQL now emits constantly: grouping keys are inferred
    as every non-aggregate select expression, ordering as the full
    select list. The ONE SQL text runs verbatim on both engines — the
    registered query IS ``spark.sql`` of the oracle string (modulo the
    view name), so this pins that Spark's inference picks exactly
    (returnflag, linestatus, ship_year), the same as DuckDB's. Plan:
    the inferred grouping compiles to the ordinary map-combined hash
    aggregate + one output ordering."""
    t(spark, sf_dir, "lineitem").createOrReplaceTempView("_gba_lineitem")
    return spark.sql(
        """
        SELECT l_returnflag, l_linestatus,
               CAST(YEAR(CAST(l_shipdate AS TIMESTAMP)) AS BIGINT) AS ship_year,
               ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS revenue,
               CAST(COUNT(*) AS BIGINT) AS n_lines
        FROM _gba_lineitem
        GROUP BY ALL
        ORDER BY ALL
        """
    )
