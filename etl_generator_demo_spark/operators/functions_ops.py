"""Scalar function surface: null handling, dates, strings, casts,
CASE, JSON — SURVEY.md §2.8 F1-F8.

F1-F3 are the ETL transform-step vocabulary the reference *generates*
("NULL 값 기본값 처리" / "날짜 형식 표준화" / "데이터 타입 검증",
``sql_generator.py:303-305``); F4-F7 are reachable from its schemas;
F8 (JSON extraction) comes from the `events.props` fixture.

Engine/oracle alignment notes:
- DuckDB `year()` returns BIGINT, Spark `year()` INT -> Spark casts up.
- DuckDB CAST(double AS BIGINT) *rounds*, Spark truncates -> use
  explicit FLOOR in both before casting.
- Spark `weekday()` is 0=Monday; DuckDB `isodow` is 1=Monday -> +1.
- JSON: Spark side uses real get_json_object; the oracle extracts the
  same scalar with regexp so it doesn't depend on DuckDB's JSON
  extension being loadable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from etl_generator_demo_spark.operators.relational import t
from etl_generator_demo_spark.registry import register


# ---------------------------------------------------------------------------
# F4 — date extraction + rollup
# ---------------------------------------------------------------------------
@register(
    "f_date_monthly_revenue",
    oracle="""
    SELECT CAST(YEAR(o_orderdate) AS BIGINT)  AS order_year,
           CAST(MONTH(o_orderdate) AS BIGINT) AS order_month,
           COUNT(*)                            AS n_orders,
           ROUND(SUM(o_totalprice), 2)         AS revenue
    FROM orders
    GROUP BY 1, 2
    ORDER BY 1, 2
    """,
    survey_ids=("F4", "F2", "A1"),
)
def f_date_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = t(spark, sf_dir, "orders")
    return (
        o.groupBy(
            F.year("o_orderdate").cast("long").alias("order_year"),
            F.month("o_orderdate").cast("long").alias("order_month"),
        )
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.round(F.sum("o_totalprice"), 2).alias("revenue"),
        )
        .orderBy("order_year", "order_month")
    )


# ---------------------------------------------------------------------------
# F4 — date arithmetic: datediff, date_add, weekday
# ---------------------------------------------------------------------------
@register(
    "f_date_arithmetic",
    oracle="""
    SELECT o_orderkey,
           CAST(o_orderdate + INTERVAL 30 DAY AS DATE)               AS due_date,
           CAST(DATE_DIFF('day', o_orderdate, TIMESTAMP '2000-01-01') AS BIGINT) AS days_to_y2k,
           CAST(ISODOW(o_orderdate) AS BIGINT)                        AS iso_weekday
    FROM orders
    WHERE o_orderdate >= TIMESTAMP '1999-01-01' AND o_orderdate < TIMESTAMP '1999-03-01'
    ORDER BY o_orderkey
    """,
    survey_ids=("F4",),
)
def f_date_arith(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1999-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1999-03-01").cast("timestamp"))
    )
    return o.select(
        "o_orderkey",
        F.date_add(F.col("o_orderdate"), 30).alias("due_date"),
        F.datediff(F.lit("2000-01-01").cast("timestamp"), F.col("o_orderdate"))
        .cast("long")
        .alias("days_to_y2k"),
        (F.weekday("o_orderdate") + 1).cast("long").alias("iso_weekday"),
    ).orderBy("o_orderkey")


# ---------------------------------------------------------------------------
# F5 — string functions
# ---------------------------------------------------------------------------
@register(
    "f_string_ops",
    oracle="""
    SELECT c_custkey,
           UPPER(c_name)                          AS uname,
           SUBSTR(c_name, 1, 9)                   AS prefix,
           CAST(LENGTH(c_name) AS BIGINT)         AS name_len,
           CONCAT(c_mktsegment, '#', c_name)      AS tagged,
           REPLACE(c_name, 'Customer', 'Cust')    AS short_name
    FROM customer
    WHERE c_name LIKE 'Customer#%1'
    ORDER BY c_custkey
    """,
    survey_ids=("F5", "P6"),
)
def f_string_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = t(spark, sf_dir, "customer").filter(F.col("c_name").like("Customer#%1"))
    return c.select(
        "c_custkey",
        F.upper("c_name").alias("uname"),
        F.substring("c_name", 1, 9).alias("prefix"),
        F.length("c_name").cast("long").alias("name_len"),
        F.concat_ws("#", "c_mktsegment", "c_name").alias("tagged"),
        F.replace(F.col("c_name"), F.lit("Customer"), F.lit("Cust")).alias("short_name"),
    ).orderBy("c_custkey")


# ---------------------------------------------------------------------------
# F5 — regexp extraction over part names
# ---------------------------------------------------------------------------
@register(
    "f_regexp_ops",
    oracle="""
    SELECT p_partkey,
           REGEXP_EXTRACT(p_name, '([0-9]+)', 1)        AS first_number,
           REGEXP_MATCHES(p_name, '[aeiou]{2}')         AS has_double_vowel
    FROM part
    ORDER BY p_partkey
    """,
    survey_ids=("F5",),
)
def f_regexp_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = t(spark, sf_dir, "part")
    return p.select(
        "p_partkey",
        F.regexp_extract("p_name", r"([0-9]+)", 1).alias("first_number"),
        F.col("p_name").rlike("[aeiou]{2}").alias("has_double_vowel"),
    ).orderBy("p_partkey")


# ---------------------------------------------------------------------------
# F7 — CASE WHEN bucketing
# ---------------------------------------------------------------------------
@register(
    "f_case_price_buckets",
    oracle="""
    SELECT CASE WHEN o_totalprice < 50000  THEN 'small'
                WHEN o_totalprice < 200000 THEN 'medium'
                ELSE 'large' END AS bucket,
           COUNT(*) AS n_orders,
           ROUND(AVG(o_totalprice), 2) AS avg_price
    FROM orders
    GROUP BY 1
    ORDER BY bucket
    """,
    survey_ids=("F7", "A1"),
)
def f_case_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = t(spark, sf_dir, "orders")
    bucket = (
        F.when(F.col("o_totalprice") < 50000, "small")
        .when(F.col("o_totalprice") < 200000, "medium")
        .otherwise("large")
        .alias("bucket")
    )
    return (
        o.groupBy(bucket)
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.round(F.avg("o_totalprice"), 2).alias("avg_price"),
        )
        .orderBy("bucket")
    )


# ---------------------------------------------------------------------------
# F1 — NULL handling: nullif to synthesize, coalesce/default-fill
# ---------------------------------------------------------------------------
@register(
    "f_null_handling",
    oracle="""
    SELECT COALESCE(NULLIF(o_orderstatus, 'O'), 'OPEN') AS status_label,
           COUNT(*)                                      AS n,
           COUNT(NULLIF(o_orderstatus, 'O'))             AS n_non_null
    FROM orders
    GROUP BY 1
    ORDER BY status_label
    """,
    survey_ids=("F1",),
)
def f_null_handling(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = t(spark, sf_dir, "orders")
    nul = F.nullif(F.col("o_orderstatus"), F.lit("O"))
    return (
        o.groupBy(F.coalesce(nul, F.lit("OPEN")).alias("status_label"))
        .agg(F.count(F.lit(1)).alias("n"), F.count(nul).alias("n_non_null"))
        .orderBy("status_label")
    )


# ---------------------------------------------------------------------------
# F3 — type validation / casting (FLOOR first: DuckDB rounds on
# double->int casts, Spark truncates)
# ---------------------------------------------------------------------------
@register(
    "f_cast_validation",
    oracle="""
    SELECT o_orderkey,
           CAST(FLOOR(o_totalprice) AS BIGINT) AS price_floor,
           CAST(o_orderkey AS VARCHAR)         AS key_str,
           TRY_CAST(o_orderpriority AS BIGINT) AS bad_cast_null
    FROM orders
    WHERE o_orderkey <= 1000
    ORDER BY o_orderkey
    """,
    survey_ids=("F3",),
)
def f_cast_validation(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = t(spark, sf_dir, "orders").filter(F.col("o_orderkey") <= 1000)
    return o.select(
        "o_orderkey",
        F.floor("o_totalprice").cast("long").alias("price_floor"),
        F.col("o_orderkey").cast("string").alias("key_str"),
        F.col("o_orderpriority").try_cast("long").alias("bad_cast_null"),
    ).orderBy("o_orderkey")


# ---------------------------------------------------------------------------
# F2 — date standardization ("날짜 형식 표준화"): format + parse round-trip
# ---------------------------------------------------------------------------
@register(
    "f_date_standardize",
    oracle="""
    SELECT o_orderkey,
           STRFTIME(o_orderdate, '%Y-%m-%d')                     AS date_iso,
           CAST(STRPTIME(STRFTIME(o_orderdate, '%Y-%m-%d'), '%Y-%m-%d') AS TIMESTAMP) AS date_parsed
    FROM orders
    WHERE o_orderkey <= 500
    ORDER BY o_orderkey
    """,
    survey_ids=("F2",),
)
def f_date_standardize(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = t(spark, sf_dir, "orders").filter(F.col("o_orderkey") <= 500)
    iso = F.date_format("o_orderdate", "yyyy-MM-dd")
    return o.select(
        "o_orderkey",
        iso.alias("date_iso"),
        F.to_timestamp(iso, "yyyy-MM-dd").alias("date_parsed"),
    ).orderBy("o_orderkey")


# ---------------------------------------------------------------------------
# F6 — arithmetic expressions
# ---------------------------------------------------------------------------
@register(
    "f_arithmetic_revenue",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           FLOOR(l_extendedprice * (1 - l_discount) * (1 + l_tax) * 100) / 100 AS charged,
           FLOOR(l_extendedprice / NULLIF(l_quantity, 0) * 100) / 100 AS unit_price,
           ROUND(ABS(l_discount - l_tax), 4)                          AS disc_tax_gap,
           CAST(FLOOR(l_quantity) AS BIGINT) % 7                      AS qty_mod7
    FROM lineitem
    WHERE l_orderkey <= 300
    ORDER BY l_orderkey, l_linenumber
    """,
    survey_ids=("F6",),
)
def f_arithmetic(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = t(spark, sf_dir, "lineitem").filter(F.col("l_orderkey") <= 300)
    return li.select(
        "l_orderkey",
        "l_linenumber",
        # floor-scale: per-row products of 2-decimal inputs land on
        # exact half-cents where engine round() directions differ
        (
            F.floor(
                F.col("l_extendedprice") * (1 - F.col("l_discount")) * (1 + F.col("l_tax")) * 100
            )
            / 100
        ).alias("charged"),
        # floor-scale: the quotient lands on half-cent boundaries where
        # round() direction differs between engines (see windows_sets).
        (
            F.floor(F.col("l_extendedprice") / F.nullif(F.col("l_quantity"), F.lit(0.0)) * 100)
            / 100
        ).alias("unit_price"),
        F.round(F.abs(F.col("l_discount") - F.col("l_tax")), 4).alias("disc_tax_gap"),
        (F.floor("l_quantity").cast("long") % 7).alias("qty_mod7"),
    ).orderBy("l_orderkey", "l_linenumber")


# ---------------------------------------------------------------------------
# F4/F2 — TIME type mapping (SURVEY §1.2: the reference maps SQL TIME to a
# string, `sample_metadata.py:119-121`; Spark has no TIME type either, so the
# engine's documented mapping is string 'HH:mm:ss' + seconds arithmetic)
# ---------------------------------------------------------------------------
@register(
    "f_time_of_day_mapping",
    oracle="""
    WITH tod AS (
        SELECT event_type,
               STRFTIME(CAST(ts AS TIMESTAMP), '%H:%M:%S') AS tod_str
        FROM events
    )
    SELECT event_type,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           MIN(tod_str) AS first_tod,
           MAX(tod_str) AS last_tod,
           CAST(EXTRACT(EPOCH FROM CAST(MAX(tod_str) AS TIME))
                - EXTRACT(EPOCH FROM CAST(MIN(tod_str) AS TIME)) AS BIGINT)
               AS active_span_secs,
           CAST(FLOOR(AVG(EXTRACT(EPOCH FROM CAST(tod_str AS TIME)))) AS BIGINT)
               AS avg_tod_secs
    FROM tod
    GROUP BY event_type
    ORDER BY event_type
    """,
    survey_ids=("F4", "F2"),
)
def f_time_of_day_mapping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """String-encoded TIME round-trip: format each event's time-of-day
    as 'HH:mm:ss' (the engine's TIME representation), then parse the
    STRING back into seconds-since-midnight for span/average
    arithmetic. The oracle goes through DuckDB's genuine TIME type
    (CAST(.. AS TIME) + EXTRACT(EPOCH ..)), so the hash proves the
    string mapping is value-equivalent to a real TIME column — closing
    the one documented type-mapping gap (no fixture column is TIME-
    typed). AVG over seconds is exact in IEEE doubles (integer sums
    << 2^53), so FLOOR agrees across engines."""
    ev = t(spark, sf_dir, "events")
    tod_str = F.date_format("ts", "HH:mm:ss")

    def secs(c: F.Column) -> F.Column:
        return (
            F.substring(c, 1, 2).cast("long") * 3600
            + F.substring(c, 4, 2).cast("long") * 60
            + F.substring(c, 7, 2).cast("long")
        )

    per_ev = ev.select("event_type", tod_str.alias("tod_str"))
    return (
        per_ev.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.min("tod_str").alias("first_tod"),
            F.max("tod_str").alias("last_tod"),
            F.avg(secs(F.col("tod_str"))).alias("_avg_secs"),
        )
        .select(
            "event_type",
            "n_events",
            "first_tod",
            "last_tod",
            (secs(F.col("last_tod")) - secs(F.col("first_tod"))).alias(
                "active_span_secs"
            ),
            F.floor("_avg_secs").cast("long").alias("avg_tod_secs"),
        )
        .orderBy("event_type")
    )


# ---------------------------------------------------------------------------
# F8 — JSON extraction from events.props
# ---------------------------------------------------------------------------
@register(
    "f_json_extract",
    oracle="""
    SELECT event_id,
           CAST(REGEXP_EXTRACT(props, '"k":\\s*(-?\\d+)', 1) AS BIGINT) AS k_value
    FROM events
    WHERE event_id < 200
    ORDER BY event_id
    """,
    survey_ids=("F8",),
)
def f_json_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = t(spark, sf_dir, "events").filter(F.col("event_id") < 200)
    return ev.select(
        "event_id",
        F.get_json_object("props", "$.k").cast("long").alias("k_value"),
    ).orderBy("event_id")


# ---------------------------------------------------------------------------
# F8 — full JSON parse to typed struct (from_json), aggregated
# ---------------------------------------------------------------------------
@register(
    "f_json_struct_agg",
    oracle="""
    SELECT event_type,
           CAST(SUM(CAST(REGEXP_EXTRACT(props, '"k":\\s*(-?\\d+)', 1) AS BIGINT)) AS BIGINT) AS k_total,
           COUNT(*) AS n
    FROM events
    GROUP BY event_type
    ORDER BY event_type
    """,
    survey_ids=("F8", "A1"),
)
def f_json_struct_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = t(spark, sf_dir, "events")
    parsed = ev.withColumn("js", F.from_json("props", "k BIGINT"))
    return (
        parsed.groupBy("event_type")
        .agg(F.sum(F.col("js.k")).alias("k_total"), F.count(F.lit(1)).alias("n"))
        .orderBy("event_type")
    )


@register(
    "f_bitwise_ops",
    oracle="""
    SELECT o_orderkey,
           o_orderkey & 255                      AS low_byte,
           o_orderkey | 4096                     AS with_flag,
           XOR(o_orderkey, 21845)                AS xored,
           CAST(o_orderkey // 1024 AS BIGINT)    AS shifted_right,
           CAST(BIT_COUNT(o_orderkey) AS BIGINT) AS popcount
    FROM orders
    WHERE o_custkey <= 50
    ORDER BY o_orderkey
    """,
    survey_ids=("F6",),
)
def f_bitwise_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bitwise arithmetic over keys (F6 surface): mask, flag-set, XOR,
    shift (expressed as integer division so both engines agree on
    semantics for non-negative keys), popcount. Bit tricks are the
    bread and butter of hash/bucket/bloom code — all scan-side."""
    o = t(spark, sf_dir, "orders").filter(F.col("o_custkey") <= 50)
    k = F.col("o_orderkey")
    return o.select(
        "o_orderkey",
        k.bitwiseAND(F.lit(255)).alias("low_byte"),
        k.bitwiseOR(F.lit(4096)).alias("with_flag"),
        k.bitwiseXOR(F.lit(21845)).alias("xored"),
        F.floor(k / 1024).cast("long").alias("shifted_right"),
        F.bit_count(k).cast("long").alias("popcount"),
    ).orderBy("o_orderkey")


@register(
    "f_decimal_money_totals",
    oracle="""
    WITH d AS (
        SELECT o_orderpriority,
               CAST(ROUND(o_totalprice, 2) AS DECIMAL(18,2)) AS amt
        FROM orders
    )
    SELECT o_orderpriority,
           CAST(SUM(amt) AS VARCHAR) AS total_str,
           CAST(MIN(amt) AS VARCHAR) AS min_str,
           CAST(MAX(amt) AS VARCHAR) AS max_str,
           CAST(COUNT(*) AS BIGINT) AS n
    FROM d
    GROUP BY o_orderpriority
    ORDER BY o_orderpriority
    """,
    survey_ids=("F3", "F6", "A1"),
)
def f_decimal_money_totals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Money arithmetic in DECIMAL — the §1.2 type-mapping surface the
    reference's schemas declare (DECIMAL(10,2)/(12,2)/(15,2) price and
    salary columns): amounts cast to DECIMAL(18,2) and aggregated in
    exact decimal arithmetic — no float accumulation, the property
    finance queries are required to have. Totals serialize as strings
    (both engines format scale-2 decimals identically, proven by the
    hash) because the POINT is that the cents never left exact
    arithmetic. Double→decimal conversion goes through ROUND(x, 2)
    first so the cast's final rounding step is unambiguous on both
    engines."""
    d = t(spark, sf_dir, "orders").select(
        "o_orderpriority",
        F.round("o_totalprice", 2).cast("decimal(18,2)").alias("amt"),
    )
    return (
        d.groupBy("o_orderpriority")
        .agg(
            F.sum("amt").cast("string").alias("total_str"),
            F.min("amt").cast("string").alias("min_str"),
            F.max("amt").cast("string").alias("max_str"),
            F.count(F.lit(1)).cast("long").alias("n"),
        )
        .orderBy("o_orderpriority")
    )


@register(
    "u_union_schema_drift",
    oracle="""
    SELECT o_orderkey, o_custkey, o_totalprice, o_orderpriority
    FROM (
        SELECT o_orderkey, o_custkey, o_totalprice,
               NULL AS o_orderpriority
        FROM orders WHERE o_orderkey % 2 = 0
        UNION ALL BY NAME
        SELECT o_orderkey, o_orderpriority, o_custkey
        FROM orders WHERE o_orderkey % 2 = 1
    )
    ORDER BY o_orderkey
    """,
    survey_ids=("U2", "F1", "S10"),
)
def u_union_schema_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Schema-drift union — the ingestion reality where yesterday's
    files lack a column today's files added: two projections of the
    same table with DIFFERENT column sets union BY NAME with missing
    columns null-filled (`unionByName(allowMissingColumns=True)`;
    DuckDB's `UNION ALL BY NAME` is the same contract). Positional
    UNION would silently cross-assign columns here — the classic
    corruption this operator exists to prevent."""
    o = t(spark, sf_dir, "orders")
    old_files = o.filter(F.col("o_orderkey") % 2 == 0).select(
        "o_orderkey", "o_custkey", "o_totalprice"
    )
    new_files = o.filter(F.col("o_orderkey") % 2 == 1).select(
        "o_orderkey", "o_orderpriority", "o_custkey"
    )
    return (
        old_files.unionByName(new_files, allowMissingColumns=True)
        .select("o_orderkey", "o_custkey", "o_totalprice", "o_orderpriority")
        .orderBy("o_orderkey")
    )


# ---------------------------------------------------------------------------
# F8+ — VARIANT semi-structured path (Spark 4 parse_json/variant_get)
# ---------------------------------------------------------------------------
@register(
    "f_variant_extract_agg",
    oracle="""
    SELECT event_type,
           CAST(SUM(CAST(REGEXP_EXTRACT(props, '"k":\\s*(-?\\d+)', 1) AS BIGINT))
                AS BIGINT) AS k_total,
           CAST(MAX(CAST(REGEXP_EXTRACT(props, '"k":\\s*(-?\\d+)', 1) AS BIGINT))
                AS BIGINT) AS k_max,
           CAST(SUM(CASE WHEN CAST(REGEXP_EXTRACT(props, '"k":\\s*(-?\\d+)', 1)
                              AS BIGINT) IS NULL THEN 1 ELSE 0 END) AS BIGINT)
               AS n_missing,
           COUNT(*) AS n
    FROM events
    GROUP BY event_type
    ORDER BY event_type
    """,
    survey_ids=("F8", "A1"),
)
def f_variant_extract_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-structured extraction through Spark 4's VARIANT type:
    ``parse_json`` once into a binary variant, ``variant_get`` typed
    paths out — the modern replacement for repeated
    ``get_json_object`` string re-parsing (`f_json_extract` keeps the
    classic spelling; this is the fast path: VARIANT parses the
    document ONCE and field access is a binary offset lookup, the
    difference between O(fields) and O(fields × parse) per row at
    100 TB). Missing-path behavior (NULL, counted) is part of the
    pinned contract. The DuckDB oracle extracts the same fields from
    the raw JSON text — the values must agree exactly, whatever the
    storage representation."""
    ev = t(spark, sf_dir, "events")
    k = F.expr("variant_get(parse_json(props), '$.k', 'long')")
    return (
        ev.select("event_type", k.alias("k"))
        .groupBy("event_type")
        .agg(
            F.sum("k").cast("long").alias("k_total"),
            F.max("k").cast("long").alias("k_max"),
            F.sum(F.when(F.col("k").isNull(), 1).otherwise(0))
            .cast("long").alias("n_missing"),
            F.count(F.lit(1)).alias("n"),
        )
        .orderBy("event_type")
    )


@register(
    "f_iso_week_revenue",
    oracle="""
    SELECT CAST(isoyear(CAST(l_shipdate AS TIMESTAMP)) AS BIGINT) AS iso_year,
           CAST(week(CAST(l_shipdate AS TIMESTAMP)) AS BIGINT) AS iso_week,
           ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS revenue,
           CAST(COUNT(*) AS BIGINT) AS n_lines
    FROM lineitem
    WHERE CAST(l_shipdate AS TIMESTAMP) >= TIMESTAMP '1996-12-01'
      AND CAST(l_shipdate AS TIMESTAMP) <  TIMESTAMP '1998-02-01'
    GROUP BY iso_year, iso_week
    ORDER BY iso_year, iso_week
    """,
    survey_ids=("F2", "A1", "F7"),
)
def f_iso_week_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weekly revenue keyed by the ISO-8601 (year-of-week, week)
    pair — the calendar-semantics trap in every weekly report: around
    New Year a date's ISO week can belong to the PREVIOUS or NEXT
    calendar year (2023-01-01 is week 52 of ISO year 2022;
    2020-12-31 is week 53 of 2020), so the naive ``(year(d),
    weekofyear(d))`` key splits one ISO week into two groups and
    double-reports it. Spark's ``extract(YEAROFWEEK ...)`` +
    ``weekofyear`` and DuckDB's ``isoyear`` + ``week`` implement the
    same ISO rule — verified on the boundary cases — so the pair
    groups identically on both engines. The scan window straddles two
    New Years to keep the trap in the data. One pushed-filter scan +
    one map-combined aggregate."""
    li = t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate").cast("timestamp") >= F.lit("1996-12-01").cast("timestamp"))
        & (F.col("l_shipdate").cast("timestamp") < F.lit("1998-02-01").cast("timestamp"))
    )
    ts = F.col("l_shipdate").cast("timestamp")
    return (
        li.select(
            F.expr("extract(YEAROFWEEK FROM cast(l_shipdate AS timestamp))")
            .cast("long")
            .alias("iso_year"),
            F.weekofyear(ts).cast("long").alias("iso_week"),
            (F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("rev"),
        )
        .groupBy("iso_year", "iso_week")
        .agg(
            F.round(F.sum("rev"), 2).alias("revenue"),
            F.count(F.lit(1)).cast("long").alias("n_lines"),
        )
        .orderBy("iso_year", "iso_week")
    )


@register(
    "f_negative_arith_semantics",
    oracle="""
    SELECT CAST(-7 % 3 AS BIGINT)  AS mod_neg_dividend,
           CAST(7 % -3 AS BIGINT)  AS mod_neg_divisor,
           CAST(-7 // 3 AS BIGINT) AS intdiv_neg,
           CAST(MOD(-7, 3) AS BIGINT) AS mod_fn_neg,
           CAST(TRUNC(-7.5) AS BIGINT) AS trunc_cast_neg,
           CAST(COUNT(*) AS BIGINT) AS n_regions
    FROM region
    """,
    survey_ids=("F5", "F3"),
)
def f_negative_arith_semantics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Negative-operand arithmetic semantics, pinned cross-engine —
    the corner where SQL dialects genuinely fork and LLM-generated
    SQL silently inherits whichever engine it was tested on:

    - ``%`` / ``MOD`` take the DIVIDEND's sign (C-style) in BOTH
      Spark and DuckDB: −7 % 3 = −1, 7 % −3 = 1 (Python's own ``%``
      would give 2 and −2 — a hand-written oracle in Python would be
      WRONG here).
    - integer division truncates toward zero in both (−7 DIV 3 = −2;
      floor division would give −3).
    - float→int CAST is where they DIVERGE: Spark ``CAST(-7.5 AS
      INT)`` truncates to −7, DuckDB's casts ROUND to −8 — so the
      portable spelling, used by every fixed-point idiom in this
      repo, is an explicit FLOOR/TRUNC before the cast (the Spark
      side here mirrors DuckDB's ``TRUNC(-7.5)`` with its native
      truncating cast; the oracle writes TRUNC explicitly).

    Computed over the region table so the constants flow through a
    real scan; one row out."""
    r = t(spark, sf_dir, "region")
    return r.agg(F.count(F.lit(1)).cast("long").alias("n_regions")).select(
        F.expr("CAST(-7 % 3 AS LONG)").alias("mod_neg_dividend"),
        F.expr("CAST(7 % -3 AS LONG)").alias("mod_neg_divisor"),
        F.expr("CAST(-7 DIV 3 AS LONG)").alias("intdiv_neg"),
        F.expr("CAST(MOD(-7, 3) AS LONG)").alias("mod_fn_neg"),
        F.expr("CAST(CAST(-7.5 AS INT) AS LONG)").alias("trunc_cast_neg"),
        "n_regions",
    )
