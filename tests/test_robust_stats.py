"""Contract pins for the robust-statistics operators (round 9/10).

The r9 advice flagged that the distributed Theil–Sen rewrite changed
the no-pairs result shape from a single (n_days, 0, NULL) row to an
empty relation. The change is deliberate — the DuckDB oracle's final
SELECT is also empty when no slopes exist, so both engines agree —
and this file pins that contract on BOTH engines so it can never
drift silently again.
"""

import datetime

import duckdb
import pytest

from etl_generator_demo_spark.operators.robust_r8 import x4_theil_sen_trend
from etl_generator_demo_spark.registry import load_all


def _write_events(spark, path, days):
    """One purchase per given day -> |days| daily revenue points."""
    rows = [
        (
            i,
            datetime.datetime(2024, 1, 1 + d, 12, 0, 0),
            i,
            "purchase",
            100.0 + i,
            "{}",
        )
        for i, d in enumerate(days)
    ]
    spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    ).coalesce(1).write.mode("overwrite").parquet(f"{path}/events.parquet")


def test_theil_sen_empty_case_contract(spark, tmp_path):
    """<2 distinct days -> no pairwise slopes -> 0 rows from BOTH the
    Spark operator and the DuckDB oracle (the documented contract)."""
    _write_events(spark, str(tmp_path), [0])  # one day: no slope pairs
    out = x4_theil_sen_trend(spark, str(tmp_path)).collect()
    assert out == []

    sql = load_all()["x4_theil_sen_trend"].oracle
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW events AS "
        f"SELECT * FROM read_parquet('{tmp_path}/events.parquet/*.parquet')"
    )
    assert con.execute(sql).fetchall() == []


def test_theil_sen_two_days_single_slope(spark, tmp_path):
    """Two days -> exactly one pair; the median IS that slope, and the
    single-row shape carries (n_days=2, n_pairs=1, slope)."""
    _write_events(spark, str(tmp_path), [0, 3])  # revs 100 and 101, gap 3
    out = x4_theil_sen_trend(spark, str(tmp_path)).collect()
    assert len(out) == 1
    r = out[0]
    assert r["n_days"] == 2 and r["n_pairs"] == 1
    # slope = (101-100)*1e6 floor-div 3 days
    assert r["theil_sen_slope_e6"] == (1 * 1_000_000) // 3


def test_markov_attribution_nonpositive_total_is_null():
    """The pmod floor idiom in the Markov oracle assumes a positive
    effect total; the Spark side NULLs attribution when total <= 0
    (r9 advice). Pin the guard at the unit level."""
    # mirrors the in-operator expression
    def attribution(effect, total):
        return (effect * 1_000_000) // total if total > 0 else None

    assert attribution(5, 10) == 500_000
    assert attribution(5, 0) is None
    assert attribution(5, -3) is None
