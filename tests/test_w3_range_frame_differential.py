"""Randomized differential pin for the bin-decomposed RANGE-frame band
count (round-13 rewrite of `w3_range_frame_price_band`).

The decomposition n_in_band(p) = cnt_le(p) − cnt_lt(p−5000) has three
boundary hazards the sf-fixture oracle may never exercise all at once:
ties AT the lower bound (p' == p−5000 is IN the band — inclusive),
ties at the current price (peers are IN — RANGE CURRENT ROW), and
probe bins landing in EMPTY partitions above occupied ones (the
densified-lattice prefix). Hypothesis drives cent-quantized prices
through the real Spark plan against a 5-line brute force, with exact
±5000 collisions planted deliberately.
"""

from __future__ import annotations

import pytest

from hypothesis import given, settings
from hypothesis import strategies as st


def _brute(prices: list[float]) -> dict[int, int]:
    return {
        i: sum(1 for q in prices if p - 5000 <= q <= p)
        for i, p in enumerate(prices)
    }


def _run(spark, tmp_dir: str, prices: list[float]) -> dict[int, int]:
    from etl_generator_demo_spark.operators.windows_sets import w3_range_frame

    spark.createDataFrame(
        [(i, float(p)) for i, p in enumerate(prices)],
        "o_orderkey long, o_totalprice double",
    ).coalesce(1).write.mode("overwrite").parquet(f"{tmp_dir}/orders.parquet")
    return {
        r["o_orderkey"]: r["n_in_band"]
        for r in w3_range_frame(spark, tmp_dir).collect()
    }


# cents in [0, 60000.00], plus planted exact-bin-boundary and ±5000
# collision values (the strict-vs-inclusive edge both sides of the
# decomposition must get right)
_cents = st.integers(min_value=0, max_value=6_000_000).map(lambda c: c / 100)
_planted = st.sampled_from(
    [0.0, 4999.99, 5000.0, 5000.01, 9999.99, 10000.0, 15000.0, 20000.0,
     25000.0, 25000.01, 30000.0, 55000.0]
)
_prices = st.lists(st.one_of(_cents, _planted), min_size=1, max_size=40)


@settings(max_examples=12, deadline=None)
@given(prices=_prices)
@pytest.mark.slow
def test_band_count_matches_brute_force(spark, tmp_path_factory, prices):
    tmp = str(tmp_path_factory.mktemp("w3diff"))
    assert _run(spark, tmp, prices) == _brute(prices)


def test_exact_boundary_ties_inclusive_both_ends(spark, tmp_path_factory):
    """Closed-form: prices [0, 5000, 5000, 10000]. Bands:
    0 -> {0}; each 5000 -> {0, 5000, 5000} (lower bound 0 INCLUSIVE,
    peer INCLUSIVE); 10000 -> {5000, 5000, 10000} (0 excluded: 10000−
    5000 = 5000 > 0)."""
    tmp = str(tmp_path_factory.mktemp("w3edge"))
    got = _run(spark, tmp, [0.0, 5000.0, 5000.0, 10000.0])
    assert got == {0: 1, 1: 3, 2: 3, 3: 3}


def test_probe_in_empty_bin_above_occupied(spark, tmp_path_factory):
    """Prices 100 and 23000: 23000's probe (18000) lands in bin 3 —
    empty, above occupied bin 0 — so the densified prefix must still
    count the bin-0 row as strictly below... and then the band
    [18000, 23000] excludes it: expect 1 (itself)."""
    tmp = str(tmp_path_factory.mktemp("w3gap"))
    got = _run(spark, tmp, [100.0, 23000.0])
    assert got == {0: 1, 1: 1}
