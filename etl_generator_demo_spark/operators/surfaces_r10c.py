"""Round-10 batch 3: LSH parameter tuning.

- The MinHash-LSH **band tuning curve**: candidate-pair counts for
  every (bands × rows-per-band) factorization of the signature — the
  number a dedup operator reads before committing a 100 TB LSH pass
  (more bands = higher recall = more candidates to verify; the curve
  makes the recall/cost trade explicit from the data, not the
  S-curve formula alone). Reuses the exact signature law of
  ``x2_minhash_lsh_pairs`` (md5-sliced 32-bit minhashes), so the
  oracle replays candidate sets hash-for-hash.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from ..registry import register
from .dedup import (
    _duck_minhash_cols,
    _DUCK_SHINGLES,
    banded_keys,
    doc_shingles,
    minhash_signatures,
)
from .relational import t

#: Every factorization of the 8-hash signature: (bands, rows/band).
LSH_CONFIGS = ((1, 8), (2, 4), (4, 2), (8, 1))


def _tuning_oracle() -> str:
    per_cfg = []
    for bands, rows in LSH_CONFIGS:
        band_joins = []
        for b in range(bands):
            key = " || ".join(f"mh{i}" for i in range(b * rows, (b + 1) * rows))
            band_joins.append(f"""
        SELECT a.doc_id AS doc_a, b.doc_id AS doc_b
        FROM (SELECT doc_id, {key} AS k FROM sigs) a
        JOIN (SELECT doc_id, {key} AS k FROM sigs) b
          ON a.k = b.k AND a.doc_id < b.doc_id""")
        per_cfg.append(f"""
    SELECT CAST({bands} AS BIGINT) AS bands,
           CAST({rows} AS BIGINT) AS rows_per_band,
           CAST(COUNT(*) AS BIGINT) AS n_candidate_pairs,
           CAST(COUNT(DISTINCT doc_a) + COUNT(DISTINCT doc_b) AS BIGINT)
               AS n_endpoint_slots
    FROM (SELECT DISTINCT doc_a, doc_b FROM ({" UNION ALL ".join(band_joins)}))""")
    return f"""
    {_DUCK_SHINGLES},
    sigs AS MATERIALIZED (
        SELECT doc_id, {_duck_minhash_cols()}
        FROM shingles GROUP BY doc_id
    )
    SELECT * FROM ({" UNION ALL ".join(per_cfg)})
    ORDER BY bands
    """


@register(
    "x2_lsh_band_tuning_curve",
    oracle=_tuning_oracle(),
    survey_ids=("X2", "J3", "A3", "U2"),
)
def x2_lsh_band_tuning_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Candidate-pair counts for every (bands, rows-per-band)
    factorization of the 8-value MinHash signature — the empirical LSH
    tuning curve. One row per config: distinct candidate pairs and
    distinct endpoint slots. Read before committing a corpus dedup
    pass: (8,1) is the high-recall/high-cost end (any single matching
    minhash pairs two docs), (1,8) the high-precision end.

    Scale: signatures are computed ONCE (map-combined min per doc — 8
    values per doc in the shuffle, never shingles) and
    localCheckpointed; each config is then a band-key self-join on the
    signature relation. The single-row-band configs are where hot
    buckets appear at 100 TB — the guarded production path
    (``x2_minhash_lsh_pairs_guarded``) caps bucket width; this curve
    is the |configs|-bounded diagnostic that justifies the cap."""
    docs = t(spark, sf_dir, "documents")
    sigs = minhash_signatures(
        doc_shingles(docs, distinct=False)
    ).localCheckpoint(eager=True)
    outs = []
    for bands, rows in LSH_CONFIGS:
        bk = banded_keys(sigs, bands=bands)
        a = bk.select(
            F.col("doc_id").alias("doc_a"), "band_id", "band_key"
        )
        b = bk.select(
            F.col("doc_id").alias("doc_b"), "band_id", "band_key"
        )
        pairs = (
            a.join(b, ["band_id", "band_key"])
            .filter(F.col("doc_a") < F.col("doc_b"))
            .select("doc_a", "doc_b")
            .distinct()
        )
        outs.append(
            pairs.agg(
                F.count(F.lit(1)).cast("long").alias("n_candidate_pairs"),
                (
                    F.count_distinct("doc_a") + F.count_distinct("doc_b")
                )
                .cast("long")
                .alias("n_endpoint_slots"),
            ).select(
                F.lit(bands).cast("long").alias("bands"),
                F.lit(rows).cast("long").alias("rows_per_band"),
                "n_candidate_pairs",
                "n_endpoint_slots",
            )
        )
    out = outs[0]
    for o in outs[1:]:
        out = out.unionByName(o)
    return out.orderBy("bands")


# ---------------------------------------------------------------------------
# Jaccard verification-threshold sweep
# ---------------------------------------------------------------------------

#: Thresholds swept, as exact (num, den) ratios so the comparison is an
#: integer cross-multiplication in both engines.
JACCARD_SWEEP = ((30, 100), (50, 100), (70, 100), (90, 100))


# Memoized fixed expression lists for the sweep (r17): every column
# below derives from JACCARD_SWEEP constants and fixed names, so the
# trees build once per process instead of per DataFrame construction
# (same construction code, cached — plans and results identical).
from functools import lru_cache as _lru_cache


@_lru_cache(maxsize=None)
def _sweep_flag_cols():
    return tuple(
        (
            den * F.col("inter")
            >= num * (F.col("ca") + F.col("cb") - F.col("inter"))
        ).alias(f"f{num}")
        for num, den in JACCARD_SWEEP
    )


@_lru_cache(maxsize=None)
def _sweep_pair_count_cols():
    return tuple(
        F.coalesce(F.sum(F.col(f"f{num}").cast("long")), F.lit(0))
        .cast("long")
        .alias(f"np{num}")
        for num, _ in JACCARD_SWEEP
    )


@_lru_cache(maxsize=None)
def _sweep_doc_count_cols():
    return tuple(
        F.coalesce(F.sum(F.col(f"f{num}").cast("long")), F.lit(0))
        .cast("long")
        .alias(f"nd{num}")
        for num, _ in JACCARD_SWEEP
    )


@_lru_cache(maxsize=None)
def _sweep_reshape_col():
    return F.explode(
        F.array(
            *[
                F.struct(
                    F.lit(num).cast("long").alias("tau_e2"),
                    F.col(f"np{num}").alias("n_pairs"),
                    F.col(f"nd{num}").alias("n_docs_in_pairs"),
                )
                for num, _ in JACCARD_SWEEP
            ]
        )
    )


def _jaccard_sweep_oracle() -> str:
    rows = []
    for num, den in JACCARD_SWEEP:
        rows.append(f"""
    SELECT CAST({num} AS BIGINT) AS tau_e2,
           (SELECT CAST(COUNT(*) AS BIGINT) FROM inter i
            JOIN card ca ON ca.doc_id = i.doc_a
            JOIN card cb ON cb.doc_id = i.doc_b
            WHERE {den} * i.inter >= {num} * (ca.card + cb.card - i.inter))
               AS n_pairs,
           (SELECT CAST(COUNT(DISTINCT d) AS BIGINT) FROM (
                SELECT i.doc_a AS d FROM inter i
                JOIN card ca ON ca.doc_id = i.doc_a
                JOIN card cb ON cb.doc_id = i.doc_b
                WHERE {den} * i.inter >= {num} * (ca.card + cb.card - i.inter)
                UNION
                SELECT i.doc_b FROM inter i
                JOIN card ca ON ca.doc_id = i.doc_a
                JOIN card cb ON cb.doc_id = i.doc_b
                WHERE {den} * i.inter >= {num} * (ca.card + cb.card - i.inter)
            )) AS n_docs_in_pairs""")
    return f"""
    {_DUCK_SHINGLES},
    card AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS card
             FROM shingles GROUP BY doc_id),
    inter AS (
        SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
               CAST(COUNT(*) AS BIGINT) AS inter
        FROM shingles a JOIN shingles b
          ON a.shingle = b.shingle AND a.doc_id < b.doc_id
        GROUP BY a.doc_id, b.doc_id
    )
    SELECT * FROM ({" UNION ALL ".join(rows)})
    ORDER BY tau_e2
    """


@register(
    "x2_jaccard_threshold_sweep",
    oracle=_jaccard_sweep_oracle(),
    survey_ids=("X2", "J3", "A1", "U2"),
)
def x2_jaccard_threshold_sweep(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup pair and affected-doc counts at Jaccard thresholds
    0.3/0.5/0.7/0.9 — the verification-threshold tuning curve beside
    the LSH band curve (`x2_lsh_band_tuning_curve` sizes the CANDIDATE
    stage; this sizes the KEEP decision: how many docs a 0.7 cut
    removes vs a 0.9 cut, before committing a corpus pass). The
    committed production setting is `x2_ngram_jaccard_pairs`' 0.5.

    Exactness: every threshold test is an integer cross-multiplication
    ``den·inter ≥ num·(|a|+|b|−inter)`` — no float division anywhere.
    Scale: the intersection relation comes from ONE inverted-index
    join (never all-pairs; computed once, localCheckpointed).

    r16 (guide §2.4 fewer passes): the r10 spelling re-aggregated the
    pair relation EIGHT times (per threshold: one pair count + one
    endpoint-distinct shuffle). Now all four thresholds are boolean
    flag columns computed in one projection, so the sweep is exactly
    TWO aggregates over the checkpointed pairs — one conditional-sum
    pass for pair counts, one exploded-endpoint groupBy for
    docs-in-pairs (max(flag) per doc, then conditional sum) — and the
    four output rows are an inline reshape of the joined 1-row
    results. Counts are identical: sum(flag) ≡ count(where flag),
    max(flag) per endpoint ≡ distinct-membership."""
    from .dedup import corpus_shingles

    sh = corpus_shingles(spark, sf_dir)
    card = sh.groupBy("doc_id").agg(F.count(F.lit(1)).cast("long").alias("card"))
    a = sh.select(F.col("doc_id").alias("doc_a"), "shingle")
    b = sh.select(F.col("doc_id").alias("doc_b"), "shingle")
    inter = (
        a.join(b, "shingle")
        .filter(F.col("doc_a") < F.col("doc_b"))
        .groupBy("doc_a", "doc_b")
        .agg(F.count(F.lit(1)).cast("long").alias("inter"))
    )
    pairs = (
        inter.join(card.withColumnRenamed("doc_id", "doc_a"), "doc_a")
        .withColumnRenamed("card", "ca")
        .join(card.withColumnRenamed("doc_id", "doc_b"), "doc_b")
        .withColumnRenamed("card", "cb")
        .localCheckpoint(eager=True)  # one pair relation, two reads
    )
    nums = [num for num, _ in JACCARD_SWEEP]
    flagged = pairs.select("doc_a", "doc_b", *_sweep_flag_cols())
    pair_counts = flagged.agg(*_sweep_pair_count_cols())
    doc_counts = (
        flagged.select(
            F.explode(F.array("doc_a", "doc_b")).alias("d"),
            *[F.col(f"f{num}") for num in nums],
        )
        .groupBy("d")
        .agg(*[F.max(f"f{num}").alias(f"f{num}") for num in nums])
        .agg(*_sweep_doc_count_cols())
    )
    return (
        pair_counts.crossJoin(doc_counts)
        .select(_sweep_reshape_col().alias("r"))
        .select("r.tau_e2", "r.n_pairs", "r.n_docs_in_pairs")
        .orderBy("tau_e2")
    )


# ---------------------------------------------------------------------------
# LM quality-threshold sweep
# ---------------------------------------------------------------------------

#: Quality-gate thresholds swept (mean bigram log-prob; the committed
#: production flag in x4_bigram_lm_quality cuts at -3.9).
QUALITY_SWEEP_TAUS = (-3.5, -3.9, -4.3)


def _quality_sweep_oracle() -> str:
    from .textops import _BIGRAM_PERDOC_CHAIN

    rows = []
    for tau in QUALITY_SWEEP_TAUS:
        rows.append(f"""
    SELECT CAST({int(tau * 10)} AS BIGINT) AS tau_e1,
           (SELECT CAST(COUNT(*) AS BIGINT) FROM per_doc) AS n_scored,
           (SELECT CAST(COUNT(*) AS BIGINT) FROM per_doc
            WHERE avg_logprob >= {tau}) AS n_kept,
           (SELECT CAST(COUNT(*) AS BIGINT) FROM per_doc
            WHERE avg_logprob >= {tau}) * 1000000
             // (SELECT COUNT(*) FROM per_doc) AS keep_rate_e6""")
    return f"""
    WITH {_BIGRAM_PERDOC_CHAIN}
    SELECT * FROM ({" UNION ALL ".join(rows)})
    ORDER BY tau_e1 DESC
    """


@register(
    "x4_quality_threshold_sweep",
    oracle=_quality_sweep_oracle(),
    survey_ids=("X4", "A2", "P6"),
)
def x4_quality_threshold_sweep(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus keep-rate at LM quality-gate thresholds -3.5/-3.9/-4.3
    (mean bigram log-prob) — the tuning curve for the cheapest quality
    cut, beside the band/Jaccard/n_probe/decontamination sweeps: each
    pipeline knob ships with a measured curve, not a folklore constant.
    The committed production flag (`x4_bigram_lm_quality`) cuts at
    -3.9 — this shows what loosening/tightening by 0.4 nats releases.

    Exactness: scores are on the scorer's 1e-4 floor grid and the
    threshold literals parse to identical doubles in both engines (the
    established `low_quality` comparison); keep rates are integer
    floor ratios. Scale: the score relation is computed once
    (localCheckpoint) and each threshold row is one aggregate over
    docs, not tokens."""
    from .textops import x4_bigram_lm_quality

    per_doc = (
        x4_bigram_lm_quality(spark, sf_dir)
        .select("doc_id", "avg_logprob")
        .localCheckpoint(eager=True)
    )
    n_scored = per_doc.count()  # split-size scalar (bounded fetch)
    outs = []
    for tau in QUALITY_SWEEP_TAUS:
        outs.append(
            per_doc.filter(F.col("avg_logprob") >= tau)
            .agg(F.count(F.lit(1)).cast("long").alias("n_kept"))
            .select(
                F.lit(int(tau * 10)).cast("long").alias("tau_e1"),
                F.lit(n_scored).cast("long").alias("n_scored"),
                "n_kept",
                F.expr(f"n_kept * 1000000 div {n_scored}").alias(
                    "keep_rate_e6"
                ),
            )
        )
    out = outs[0]
    for o in outs[1:]:
        out = out.unionByName(o)
    return out.orderBy(F.desc("tau_e1"))
