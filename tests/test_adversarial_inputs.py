"""Adversarial-input hardening: null text, empty strings, 1-token
docs, 5000-token docs, null/zero embeddings, null group keys — every
key operator must process them without raising (ANSI mode is on, so
unguarded division/size would fail the whole job)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F


@pytest.fixture(scope="module")
def adv_docs(spark):
    return spark.createDataFrame(
        [
            (1, None, "en", "s"),
            (2, "", "en", "s"),
            (3, "one", "en", "s"),
            (4, "a b c d e f g", None, "s"),
            (5, " ".join(["w"] * 5000), "en", None),
        ],
        "doc_id long, text string, lang string, source string",
    )


@pytest.fixture(scope="module")
def adv_emb(spark):
    return spark.createDataFrame(
        [
            (1, None, "a"),
            (2, [0.0] * 64, "a"),
            (3, [float(i) for i in range(64)], None),
        ],
        "vec_id long, embedding array<float>, label string",
    )


@pytest.mark.slow
def test_shingle_pipeline_survives(adv_docs):
    from etl_generator_demo_spark.operators.dedup import (
        doc_shingles,
        lsh_candidate_pairs,
        minhash_signatures,
        ngram_jaccard_pairs,
        simhash_fingerprints,
    )

    sh = doc_shingles(adv_docs)
    # null/empty/short docs yield no shingles, never an error
    assert {r["doc_id"] for r in sh.select("doc_id").distinct().collect()} <= {4, 5}
    assert lsh_candidate_pairs(
        minhash_signatures(doc_shingles(adv_docs, distinct=False))
    ).count() == 0
    assert simhash_fingerprints(sh).count() == 2
    assert ngram_jaccard_pairs(sh).count() == 0


def test_text_expressions_survive(adv_docs):
    from etl_generator_demo_spark.operators.textops import (
        lang_id_expr,
        quality_score_expr,
        redact_pii_expr,
    )

    rows = adv_docs.select(
        "doc_id",
        quality_score_expr("text").alias("q"),
        lang_id_expr("text").alias("lang"),
        redact_pii_expr("text").alias("clean"),
    ).collect()
    assert len(rows) == 5  # nothing raised under ANSI mode


def test_cosine_null_and_zero_vectors(adv_emb):
    from etl_generator_demo_spark.operators.similarity import _as_double, cosine

    q = F.array(*[F.lit(1.0)] * 64)
    got = {
        r["vec_id"]: r["c"]
        for r in adv_emb.select(
            "vec_id", cosine(_as_double("embedding"), q).alias("c")
        ).collect()
    }
    assert got[1] is None  # null vector -> null, not a crash
    assert got[2] is None  # zero norm -> try_divide null
    assert got[3] is not None


def test_cluster_resolution_survives(adv_docs):
    from etl_generator_demo_spark.operators.dedup import (
        doc_shingles,
        lsh_candidate_pairs,
        minhash_signatures,
    )
    from etl_generator_demo_spark.operators.dedup_clusters import dedup_corpus

    pairs = lsh_candidate_pairs(
        minhash_signatures(doc_shingles(adv_docs, distinct=False))
    )
    out = dedup_corpus(adv_docs, pairs)
    assert out.count() == 5
    assert out.filter("is_keep").count() == 5  # no pairs -> all singletons
