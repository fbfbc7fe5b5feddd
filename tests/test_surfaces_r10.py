"""Anchors and invariants for the round-10 operator batch."""

import pytest
import datetime

from pyspark.sql import functions as F

from etl_generator_demo_spark.operators.surfaces_r10 import (
    SAMPLE_N,
    x4_gopher_quality_rules,
    x4_item_item_recs,
    x4_stratified_proportional_sample,
)
from etl_generator_demo_spark.operators.surfaces_r10b import (
    _morton_expr,
    x3_vector_norm_audit,
    x4_bpe_encode_corpus,
    x4_curriculum_shards,
    x4_ndcg_eval,
)
from etl_generator_demo_spark.operators.surfaces_r10c import (
    LSH_CONFIGS,
    x2_lsh_band_tuning_curve,
)
from etl_generator_demo_spark.operators.graph_r10 import (
    g_hits_bipartite,
    g_sssp_weighted,
)

SF = "/root/testdata/sf0.001"


def _write_docs(spark, path, rows):
    spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    ).coalesce(1).write.mode("overwrite").parquet(f"{path}/documents.parquet")


# ---------------------------------------------------------------------------
# morton code
# ---------------------------------------------------------------------------

def test_morton_formula_interleaves_bits():
    """The generated arithmetic formula IS valid Python with '//' —
    evaluate it directly against a reference bit-interleave."""
    expr = _morton_expr("px", "py", "//")

    def ref(x, y):
        z = 0
        for i in range(8):
            z |= ((x >> i) & 1) << (2 * i)
            z |= ((y >> i) & 1) << (2 * i + 1)
        return z

    for px, py in [(0, 0), (3, 5), (255, 0), (0, 255), (170, 85), (255, 255)]:
        assert eval(expr) == ref(px, py), (px, py)


# ---------------------------------------------------------------------------
# gopher rules
# ---------------------------------------------------------------------------

def test_gopher_rules_hand_fixture(spark, tmp_path):
    good = "the quick brown fox and the lazy dog sit in a field of grass"
    short = "too short"  # 2 words: fails word-count + stopword rules
    digits = "the " * 6 + "1234567890 " * 12  # digit-heavy
    _write_docs(
        spark,
        str(tmp_path),
        [
            (1, good, "en", "web", len(good)),
            (2, short, "en", "web", len(short)),
            (3, digits.strip(), "en", "web", len(digits.strip())),
        ],
    )
    rows = {r["source"]: r for r in x4_gopher_quality_rules(spark, str(tmp_path)).collect()}
    w = rows["web"]
    assert w["n_docs"] == 3
    assert w["pass_word_count"] == 2  # 'too short' (2 words) fails 5..1000
    # good has {'the','and','a','of','in'}; digits doc has only {'the'}
    assert w["pass_stopwords"] == 1
    assert w["pass_digit_fraction"] == 2  # digit doc fails
    assert w["keep_all"] == 1  # only the good doc passes everything


# ---------------------------------------------------------------------------
# stratified sample
# ---------------------------------------------------------------------------

def test_stratified_quotas_sum_to_target_and_cap_at_stratum(spark, tmp_path):
    rows = []
    for i in range(5):
        rows.append((i, "aa bb", "en", "s", 5))
    for i in range(5, 8):
        rows.append((i, "cc dd", "ko", "s", 5))
    for i in range(8, 10):
        rows.append((i, "ee ff", "de", "s", 5))
    _write_docs(spark, str(tmp_path), rows)
    out = x4_stratified_proportional_sample(spark, str(tmp_path)).collect()
    quotas = {r["lang"]: r["quota"] for r in out}
    # Hamilton on (5,3,2)/10 at N=100 -> exactly (50,30,20)
    assert quotas == {"en": 50, "ko": 30, "de": 20}
    assert sum(quotas.values()) == SAMPLE_N
    # quota > stratum size: selection takes the whole stratum
    for r in out:
        assert r["n_selected"] == r["n_docs"]


# ---------------------------------------------------------------------------
# item-item recs
# ---------------------------------------------------------------------------

def test_item_item_recs_invariants(spark):
    out = x4_item_item_recs(spark, SF).collect()
    assert out, "fixture produces co-purchase pairs"
    by_item = {}
    for r in out:
        by_item.setdefault(r["item"], []).append(r)
        assert r["cooc"] >= 2
        assert 0 <= r["score_e6"] <= 1_000_000  # cosine^2 in [0, 1]
    for item, rows in by_item.items():
        ranks = sorted(r["rnk"] for r in rows)
        assert ranks == list(range(1, len(rows) + 1))
        scores = [r["score_e6"] for r in sorted(rows, key=lambda r: r["rnk"])]
        assert scores == sorted(scores, reverse=True)


# ---------------------------------------------------------------------------
# HITS
# ---------------------------------------------------------------------------

@pytest.mark.slow
def test_hits_star_hub(spark, tmp_path):
    """Customer 1 buys every part; others buy one each -> customer 1 is
    the top hub, and the part bought by EVERYONE is the top authority."""
    orders, lines = [], []
    ok = 0
    for p in range(1, 6):  # hub customer 1 buys parts 1..5
        ok += 1
        orders.append((ok, 1, "F", 10.0, datetime.date(2024, 1, 1), "1-URGENT"))
        lines.append((ok, p))
    for c in range(2, 5):  # customers 2..4 each buy part 1 only
        ok += 1
        orders.append((ok, c, "F", 10.0, datetime.date(2024, 1, 2), "1-URGENT"))
        lines.append((ok, 1))
    spark.createDataFrame(
        orders,
        "o_orderkey long, o_custkey long, o_orderstatus string, "
        "o_totalprice double, o_orderdate date, o_orderpriority string",
    ).coalesce(1).write.mode("overwrite").parquet(f"{tmp_path}/orders.parquet")
    spark.createDataFrame(
        [
            (ok, pk, 1, 1, 1.0, 10.0, 0.0, 0.0, "N", "O", datetime.date(2024, 1, 3))
            for ok, pk in lines
        ],
        "l_orderkey long, l_partkey long, l_suppkey long, l_linenumber long, "
        "l_quantity double, l_extendedprice double, l_discount double, "
        "l_tax double, l_returnflag string, l_linestatus string, l_shipdate date",
    ).coalesce(1).write.mode("overwrite").parquet(f"{tmp_path}/lineitem.parquet")

    rows = g_hits_bipartite(spark, str(tmp_path)).collect()
    top_auth = [r for r in rows if r["kind"] == "authority" and r["rnk"] == 1][0]
    top_hub = [r for r in rows if r["kind"] == "hub" and r["rnk"] == 1][0]
    assert top_auth["node_id"] == 1  # the universally-bought part
    assert top_hub["node_id"] == 1  # the buy-everything customer


# ---------------------------------------------------------------------------
# SSSP
# ---------------------------------------------------------------------------

def test_sssp_histogram_invariants(spark):
    out = g_sssp_weighted(spark, SF).collect()
    assert out, "hub reaches neighbors within 4 rounds"
    # bucket 0 contains the source (dist 0)
    b0 = [r for r in out if r["dist_bucket"] == 0]
    assert b0 and b0[0]["min_dist_e6"] == 0
    for r in out:
        assert r["min_dist_e6"] <= r["max_dist_e6"]
        assert r["dist_bucket"] == r["min_dist_e6"] // 250_000


# ---------------------------------------------------------------------------
# curriculum shards
# ---------------------------------------------------------------------------

def test_curriculum_shards_balanced(spark):
    out = x4_curriculum_shards(spark, SF).collect()
    sizes = [r["n_docs"] for r in out]
    assert max(sizes) - min(sizes) <= 1  # round-robin deal
    assert len(out) <= 8
    total = sum(sizes)
    assert sorted(r["shard"] for r in out) == list(range(len(out)))
    # rank ranges cover 1..total across shards
    assert min(r["first_rn"] for r in out) == 1
    assert max(r["last_rn"] for r in out) == total


# ---------------------------------------------------------------------------
# vector norm audit
# ---------------------------------------------------------------------------

def test_vector_norm_audit_consistent_dims(spark):
    out = x3_vector_norm_audit(spark, SF).collect()
    assert out
    for r in out:
        assert r["min_dims"] == r["max_dims"]  # fixture embeddings uniform
        assert 0 <= r["min_qnorm2"] <= r["max_qnorm2"]
        assert r["n_zero_vecs"] >= 0


# ---------------------------------------------------------------------------
# NDCG
# ---------------------------------------------------------------------------

def test_ndcg_bounded_and_consistent(spark):
    r = x4_ndcg_eval(spark, SF).collect()[0]
    assert 0 < r["ndcg_e6"] <= 1_000_000
    assert r["dcg_e6"] <= r["idcg_e6"]
    assert r["n_ranked"] <= 20


# ---------------------------------------------------------------------------
# BPE encode
# ---------------------------------------------------------------------------

def test_bpe_encode_compresses(spark):
    out = x4_bpe_encode_corpus(spark, SF).collect()
    assert out
    for r in out:
        # merges only shrink: chars >= bpe tokens >= words
        assert r["n_chars"] >= r["n_bpe_tokens"] >= r["n_words"]
        assert r["chars_per_token_e6"] >= 1_000_000


# ---------------------------------------------------------------------------
# LSH tuning curve
# ---------------------------------------------------------------------------

def test_lsh_tuning_curve_monotone(spark):
    """Nested band subdivisions: a candidate under (1,8) survives every
    finer config, so counts are monotone in the band count."""
    out = {r["bands"]: r for r in x2_lsh_band_tuning_curve(spark, SF).collect()}
    assert set(out) == {b for b, _ in LSH_CONFIGS}
    assert (
        out[1]["n_candidate_pairs"]
        <= out[2]["n_candidate_pairs"]
        <= out[4]["n_candidate_pairs"]
        <= out[8]["n_candidate_pairs"]
    )


# ---------------------------------------------------------------------------
# morton property tests (hypothesis)
# ---------------------------------------------------------------------------

from hypothesis import given, settings
from hypothesis import strategies as st

_MORTON = _morton_expr("px", "py", "//")


def _ref_interleave(x, y):
    z = 0
    for i in range(8):
        z |= ((x >> i) & 1) << (2 * i)
        z |= ((y >> i) & 1) << (2 * i + 1)
    return z


@settings(max_examples=300, deadline=None)
@given(st.integers(0, 255), st.integers(0, 255))
def test_morton_formula_matches_reference(px, py):
    assert eval(_MORTON) == _ref_interleave(px, py)


@settings(max_examples=300, deadline=None)
@given(st.integers(0, 255), st.integers(0, 255))
def test_morton_is_injective_on_the_grid(px, py):
    """The interleave is a bijection [0,255]^2 -> [0,65535]: decode by
    de-interleaving and recover the inputs exactly."""
    z = _ref_interleave(px, py)
    rx = sum(((z >> (2 * i)) & 1) << i for i in range(8))
    ry = sum(((z >> (2 * i + 1)) & 1) << i for i in range(8))
    assert (rx, ry) == (px, py)
    assert 0 <= z <= 65535


def test_vector_norm_audit_empty_array_is_null(spark, tmp_path):
    """Empty-array contract: an empty embedding yields qnorm2 NULL (a
    missing vector), never 0 (a zero vector) — pinned cross-engine
    against the DuckDB oracle on the same degenerate fixture."""
    import duckdb

    from etl_generator_demo_spark.registry import load_all

    rows = [
        (1, [1.0, 2.0], 7),
        (2, [], 7),
        (3, [0.0, 0.0], 8),
    ]
    df = spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, label int"
    )
    path = str(tmp_path / "embeddings.parquet")
    df.write.mode("overwrite").parquet(path)
    out = {
        r["label"]: r
        for r in x3_vector_norm_audit(spark, str(tmp_path)).collect()
    }
    a = out[7]
    assert a["n_vecs"] == 2
    assert a["n_zero_vecs"] == 0  # empty is NOT a zero vector
    assert a["min_qnorm2"] == a["max_qnorm2"] == 1000**2 + 2000**2
    assert (a["min_dims"], a["max_dims"]) == (0, 2)
    b = out[8]
    assert b["n_zero_vecs"] == 1 and b["min_qnorm2"] == 0
    # cross-engine parity on the degenerate fixture
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW embeddings AS "
        f"SELECT * FROM read_parquet('{path}/*.parquet')"
    )
    sql = load_all()["x3_vector_norm_audit"].oracle
    for lbl, n_zero, mn in con.execute(
        f"SELECT label, n_zero_vecs, min_qnorm2 FROM ({sql}) ORDER BY label"
    ).fetchall():
        r = out[lbl]
        assert r["n_zero_vecs"] == n_zero
        assert r["min_qnorm2"] == mn


def test_sssp_edge_build_hub_caps_mega_baskets(spark):
    """Planted hot basket: an order with SSSP_BASKET_CAP+1 distinct
    parts contributes ZERO pairs to the co-purchase edge list (the
    per-key C(k,2) blowup is excluded in both engines), while normal
    baskets pair as usual."""
    from etl_generator_demo_spark.operators.graph_r10 import (
        SSSP_BASKET_CAP,
        sssp_copurchase_edges,
    )

    hot = [(1, p) for p in range(SSSP_BASKET_CAP + 1)]  # mega-basket
    normal = [(2, 900), (2, 901), (3, 900), (3, 901), (3, 902)]
    li = spark.createDataFrame(
        hot + normal, "l_orderkey long, l_partkey long"
    )
    edges = sssp_copurchase_edges(li).collect()
    got = {(r["pa"], r["pb"]): r["cnt"] for r in edges}
    # no pair involves a hot-basket-only part (0..CAP-1 below 900)
    assert all(pa >= 900 and pb >= 900 for pa, pb in got)
    assert got == {(900, 901): 2, (900, 902): 1, (901, 902): 1}
    # exactly at the cap is still included
    at_cap = [(5, p) for p in range(SSSP_BASKET_CAP)]
    li2 = spark.createDataFrame(at_cap, "l_orderkey long, l_partkey long")
    n = sssp_copurchase_edges(li2).count()
    assert n == SSSP_BASKET_CAP * (SSSP_BASKET_CAP - 1) // 2
