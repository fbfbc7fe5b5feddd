"""x4_rolling_7d_user_spend microsecond-frame semantics (ADVICE r2).

The driver fixture's nanosecond timestamps never land within 1s of a
7-day boundary nor tie within a second, so the oracle sweep can pass
even with a second-granularity frame. This test plants exactly those
rows — a same-second later purchase (RANGE-peer leak under epoch
seconds) and purchases 1µs inside/outside the 7-day boundary — and
diffs the registered query against its own DuckDB oracle.
"""

from __future__ import annotations

import datetime as dt

import pytest


ROWS = [
    # event_id, user_id, ts, value
    # same-second pair: under epoch-second ordering 1001's frame would
    # include 1002 as a RANGE peer (leakage); under µs it must not.
    (1001, 1, dt.datetime(2024, 3, 1, 12, 0, 0, 200_000), 10.0),
    (1002, 1, dt.datetime(2024, 3, 1, 12, 0, 0, 700_000), 20.0),
    # exactly 7 days after 1001 (inclusive boundary: in frame)
    (1003, 1, dt.datetime(2024, 3, 8, 12, 0, 0, 200_000), 5.0),
    # 1µs past the 7-day boundary of 1002: 1002 must be excluded
    (1004, 1, dt.datetime(2024, 3, 8, 12, 0, 0, 700_001), 1.0),
    # second user, single row
    (1005, 2, dt.datetime(2024, 3, 1, 0, 0, 0, 1), 7.0),
]


@pytest.fixture(scope="module")
def tie_dir(spark, tmp_path_factory):
    d = tmp_path_factory.mktemp("tie_events")
    ev = spark.createDataFrame(
        [(i, u, ts, "purchase", v) for i, u, ts, v in ROWS],
        "event_id long, user_id long, ts timestamp, event_type string, value double",
    )
    ev.coalesce(1).write.mode("overwrite").parquet(str(d / "events.parquet"))
    return str(d)


def test_rolling_7d_micros_vs_oracle(spark, tie_dir):
    import duckdb

    from etl_generator_demo_spark.registry import load_all

    rq = load_all()["x4_rolling_7d_user_spend"]
    got = {
        r["event_id"]: (r["spend_7d"], r["n_purchases_7d"])
        for r in rq.fn(spark, tie_dir).collect()
    }
    # hand-computed expectations
    assert got[1001] == (10.0, 1)          # later same-second row NOT a peer
    assert got[1002] == (30.0, 2)
    assert got[1003] == (35.0, 3)          # exactly-7d-old row included
    assert got[1004] == (6.0, 2)           # 1002 aged out by 1µs; 1003+1004
    assert got[1005] == (7.0, 1)

    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW events AS SELECT * FROM read_parquet('{tie_dir}/events.parquet/*.parquet')"
    )
    oracle = {
        r[0]: (r[3], r[4]) for r in con.execute(rq.oracle).fetchall()
    }
    assert {k: v for k, v in got.items()} == oracle


def test_point_in_time_features_no_leakage(spark, sf_dir):
    """The feature at a purchase must equal the brute-force sum over
    [t-7d, t) — the current event itself and same-instant peers never
    count."""
    from etl_generator_demo_spark.catalog import read_table
    from etl_generator_demo_spark.registry import load_all
    from pyspark.sql import functions as F

    got = {
        r.event_id: (r.prior_7d_spend_cents, r.prior_7d_events)
        for r in load_all()["j_point_in_time_features"].fn(spark, sf_dir).collect()
    }
    ev = (
        read_table(spark, sf_dir, "events")
        .filter(F.col("user_id") <= 50)
        .select("event_id", "user_id", "event_type", "ts",
                F.round(F.col("value") * 100).cast("long").alias("cents"))
        .collect()
    )
    by_user: dict[int, list] = {}
    for r in ev:
        by_user.setdefault(r.user_id, []).append(r)
    checked = 0
    for uid, rows in by_user.items():
        for r in rows:
            if r.event_type != "purchase":
                continue
            lo = r.ts.timestamp() - 7 * 86400
            s = sum(
                x.cents
                for x in rows
                if lo <= x.ts.timestamp() and x.ts < r.ts
            )
            n = sum(
                1 for x in rows if lo <= x.ts.timestamp() and x.ts < r.ts
            )
            assert got[r.event_id] == (s, n), r.event_id
            checked += 1
    assert checked > 100
