"""Set-similarity join (prefix filter) + edit-distance verification."""

from __future__ import annotations

from pyspark.sql import functions as F


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_prefix_filter_is_lossless_vs_brute_force(spark):
    """The registered oracle is brute-force all-pairs; here we assert the
    same completeness property in-engine on a corpus engineered so the
    prefix join actually prunes (rare vs common tokens)."""
    from etl_generator_demo_spark.operators.setsim import (
        doc_tokens,
        token_overlap_join,
    )

    common = " ".join(f"w{i}" for i in range(18))
    rows = [
        (1, common + " rare1 rare2"),          # twin of 2 (jaccard 20/20=1? no:
        (2, common + " rare1 rare2"),          # identical token sets -> j=1.0)
        (3, common + " other1 other2 other3"), # j vs 1: 18/23 < 0.9
        (4, "completely different tokens here entirely unrelated"),
    ]
    docs = _docs(spark, rows)
    got = {
        (r.doc_a, r.doc_b)
        for r in token_overlap_join(docs).collect()
    }
    # brute force over token sets
    tok = doc_tokens(docs).collect()
    sets: dict[int, set] = {}
    for r in tok:
        sets.setdefault(r.doc_id, set()).add(r.token)
    want = set()
    ids = sorted(sets)
    for i, a in enumerate(ids):
        for b in ids[i + 1 :]:
            ov = len(sets[a] & sets[b])
            un = len(sets[a] | sets[b])
            if 10 * ov >= 9 * un:
                want.add((a, b))
    assert got == want
    assert (1, 2) in got and len(got) == 1


def test_prefix_join_prunes_candidates(spark):
    """With threshold 0.9 the kept prefix is ~1/10 of each doc's tokens,
    so the candidate relation must be far smaller than all-pairs."""
    from etl_generator_demo_spark.operators.setsim import doc_tokens

    # 12 docs sharing a large common vocabulary but distinct rare tokens;
    # card=21 -> prefix_len = 21 - ceil(18.9) + 1 = 3 = exactly the three
    # unique rares, so no two prefixes share a token.
    common = " ".join(f"c{i}" for i in range(18))
    rows = [(i, common + f" rare{i}a rare{i}b rare{i}c") for i in range(12)]
    docs = _docs(spark, rows)
    tok = doc_tokens(docs)
    card = tok.groupBy("doc_id").agg(F.count(F.lit(1)).alias("card"))
    dfreq = tok.groupBy("token").agg(F.count(F.lit(1)).alias("df"))
    from pyspark.sql import Window

    ranked = (
        tok.join(dfreq, "token")
        .join(card, "doc_id")
        .withColumn(
            "rk",
            F.row_number().over(
                Window.partitionBy("doc_id").orderBy(F.col("df"), F.col("token"))
            ),
        )
    )
    prefix = ranked.filter(
        F.col("rk")
        <= F.col("card") - F.floor((9 * F.col("card") + 9) / 10).cast("long") + 1
    )
    n_cand = (
        prefix.alias("a")
        .join(prefix.alias("b"), "token")
        .filter(F.col("a.doc_id") < F.col("b.doc_id"))
        .select("a.doc_id", "b.doc_id")
        .distinct()
        .count()
    )
    assert n_cand == 0


def test_edit_distance_identical_and_planted(spark):
    from etl_generator_demo_spark.operators.setsim import edit_distance_pairs

    base = " ".join(f"tok{i}" for i in range(30))
    rows = [
        (1, base),
        (2, base),                      # identical -> distance 0
        (3, base.replace("tok7", "tok7x")),  # one char insertion
        (4, "a wholly different corpus line with nothing shared at all x y z"),
    ]
    out = {
        (r.doc_a, r.doc_b): (r.edit_distance, r.sim_bp)
        for r in edit_distance_pairs(_docs(spark, rows)).collect()
    }
    assert out[(1, 2)] == (0, 10000)
    if (1, 3) in out:  # LSH candidate (near-dup shingles)
        d, bp = out[(1, 3)]
        assert d == 1 and 9900 <= bp < 10000
    # doc 4 shares no shingles: LSH must not pair it with anything
    assert not any(4 in pair for pair in out)


def test_contrastive_triplets_validity(spark, sf_dir):
    """Each triplet: positive IS a near-dup pair, negative is linked to
    neither side; deterministic across runs."""
    from etl_generator_demo_spark.registry import load_all

    fn = load_all()["x4_contrastive_triplets"].fn
    a = fn(spark, sf_dir).collect()
    assert a == fn(spark, sf_dir).collect()
    from etl_generator_demo_spark.operators.dedup import (
        doc_shingles,
        lsh_candidate_pairs,
        minhash_signatures,
    )
    from etl_generator_demo_spark.catalog import read_table

    docs = read_table(spark, sf_dir, "documents")
    pos = {
        (r.doc_a, r.doc_b)
        for r in lsh_candidate_pairs(
            minhash_signatures(doc_shingles(docs, distinct=False))
        ).collect()
    }
    linked = pos | {(b, a_) for a_, b in pos}
    for r in a:
        assert (r.anchor, r.positive) in pos
        assert (r.anchor, r.negative) not in linked
        assert (r.positive, r.negative) not in linked
        assert len({r.anchor, r.positive, r.negative}) == 3


def test_bbit_estimator_tracks_exact_jaccard(spark, sf_dir):
    """High-Jaccard candidate pairs must get high b-bit estimates; the
    clamped estimator stays within [0, 1e6]."""
    from etl_generator_demo_spark.registry import load_all

    rows = load_all()["x2_bbit_minhash_estimates"].fn(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert 0 <= r.j_bbit_e6 <= 1_000_000
        assert 0 <= r.n_matching_nibbles <= 8
        if r.j_exact_e6 >= 900_000:  # true near-dups
            assert r.j_bbit_e6 >= 500_000, (r.doc_a, r.doc_b)
