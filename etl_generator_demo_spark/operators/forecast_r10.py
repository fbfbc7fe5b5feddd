"""Round-10 forecasting: Holt's linear (level + trend) exponential
smoothing in exact dyadic fixed point.

The tier above ``x4_forecast_backtest``'s naive/seasonal-naive
baselines and ``w_ewma_order_totals``'s level-only EWMA: Holt's method
tracks level AND trend. With dyadic smoothing constants α=1/2, β=1/4
every update is an integer floor division, so the whole recursion is
exact in int64 cents and the DuckDB oracle replays it with a recursive
CTE — no float accumulation anywhere:

    l_t = ⌊(y_t + l_{t-1} + b_{t-1}) / 2⌋           (α = 1/2)
    b_t = ⌊(3·b_{t-1} + (l_t − l_{t-1})) / 4⌋        (β = 1/4)
    l_1 = y_1,  b_1 = 0

Floor (not truncating) division is required in BOTH engines — the
trend numerator goes negative on downswings. DuckDB's integer ``//``
TRUNCATES toward zero (``-7 // 2 = -3``, not Python's ``-4``), which
is precisely why the oracle spells division with the pmod idiom: it
subtracts ``pmod(numerator, divisor)`` first so every division is an
exact multiple — floor and truncate then agree. Do NOT "simplify" the
pmod away as redundant; without it the oracle diverges on negatives.

Reference grounding: revenue-trend questions are the reference demo's
headline NL queries (sql_generator.py demo templates); the reference
delegates the math to an LLM+PostgreSQL — here it is an engine
operator with an exact cross-engine proof.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import register
from .relational import t

#: Forecast horizon (days ahead from the last observed day).
HOLT_H = 7


def _pdiv(num: str, den: int) -> str:
    """Floor division in portable SQL via the pmod idiom (den > 0)."""
    return f"(({num}) - ((({num}) % {den} + {den}) % {den})) // {den}"


def _holt_oracle() -> str:
    num_l = "s.y + h.l + h.b"
    l_t = _pdiv(num_l, 2)
    num_b = f"3 * h.b + (({l_t}) - h.l)"
    return f"""
    WITH RECURSIVE daily AS (
        SELECT CAST(ts AS DATE) AS day,
               CAST(SUM(CAST(FLOOR(value * 100) AS BIGINT)) AS BIGINT) AS y
        FROM events WHERE event_type = 'purchase' GROUP BY 1
    ),
    seq AS (
        SELECT y, ROW_NUMBER() OVER (ORDER BY day) AS rn FROM daily
    ),
    hw AS (
        SELECT CAST(1 AS BIGINT) AS rn, s.y AS l, CAST(0 AS BIGINT) AS b
        FROM seq s WHERE s.rn = 1
        UNION ALL
        SELECT h.rn + 1,
               CAST({l_t} AS BIGINT),
               CAST({_pdiv(num_b, 4)} AS BIGINT)
        FROM hw h JOIN seq s ON s.rn = h.rn + 1
    )
    SELECT (SELECT CAST(COUNT(*) AS BIGINT) FROM seq) AS n_days,
           CAST(l AS BIGINT) AS level_c2,
           CAST(b AS BIGINT) AS trend_c2,
           CAST(l + {HOLT_H} * b AS BIGINT) AS forecast_{HOLT_H}d_c2
    FROM hw WHERE rn = (SELECT MAX(rn) FROM seq)
    """


def holt_linear(series: list[int]) -> tuple[int, int]:
    """(level, trend) after running the dyadic Holt recursion over an
    ordered integer series. Python ``//`` floors (including negative
    trend numerators), matching the oracle's pmod spelling exactly."""
    level, trend = series[0], 0
    for y in series[1:]:
        new_level = (y + level + trend) // 2
        trend = (3 * trend + (new_level - level)) // 4
        level = new_level
    return level, trend


@register(
    "x4_holt_linear_forecast",
    oracle=_holt_oracle(),
    survey_ids=("X4", "A1", "U1", "F4"),
)
def x4_holt_linear_forecast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Holt's linear-trend exponential smoothing over daily purchase
    revenue (cents), dyadic α=1/2 / β=1/4 exact fixed point, plus the
    h=7-day-ahead forecast ``l + 7·b``. One summary row: n_days,
    final level, final trend, forecast.

    Scale: the distributed work is the one map-combined daily rollup;
    the recursion then runs over the CALENDAR lattice (|days| rows —
    ten years is ~3.7k steps), an inherently sequential scan that is
    collected and solved driver-side exactly like the Markov/k-means
    bounded model fetch (stats_r8.py:193 idiom — the bound is the
    calendar, not the data). The oracle replays the identical
    recursion as a recursive CTE; tests/test_forecast_holt.py anchors
    the recursion closed-form."""
    ev = t(spark, sf_dir, "events").filter(F.col("event_type") == "purchase")
    daily = (
        ev.groupBy(F.col("ts").cast("date").alias("day"))
        .agg(
            F.sum(F.floor(F.col("value") * 100).cast("long"))
            .cast("long")
            .alias("y")
        )
        .orderBy("day")
        .collect()  # bounded: one row per calendar day (lattice fetch)
    )
    schema = (
        f"n_days long, level_c2 long, trend_c2 long, "
        f"forecast_{HOLT_H}d_c2 long"
    )
    if not daily:
        return spark.createDataFrame([], schema=schema)
    series = [int(r["y"]) for r in daily]
    level, trend = holt_linear(series)
    return spark.createDataFrame(
        [(len(series), level, trend, level + HOLT_H * trend)], schema=schema
    )
