"""Exact substring-level deduplication (round 9) — the sliding
duplicate-span detector of Lee et al. 2022 ("Deduplicating Training
Data Makes Language Models Better", ExactSubstr): report exact shared
token spans of length >= T between DISTINCT documents, and the
per-document fraction of token positions covered by such spans — the
signal CCNet / RefinedWeb / MassiveText cut training corpora on.

Lee et al. build a monolithic suffix array; the Spark-first spelling
is candidate generation by WINNOWING fingerprints (already in
``textops.winnowing_fingerprints``) followed by an exact diagonal-run
verification restricted to candidate pairs:

- **Recall is provable, not probabilistic**: the winnowing guarantee
  (Schleimer/Wilkerson/Aiken) says two docs sharing a token run of
  >= K + W - 1 tokens share >= W consecutive identical K-gram hashes,
  hence a full fingerprint window lies inside the run in both docs
  and its min hash VALUE is selected on both sides. With K=5, W=4 the
  span threshold T = 8 makes the candidate stage LOSSLESS for the
  operator's semantics — which is why the DuckDB oracle can compute
  the answer directly (full K-gram equality join, no winnowing) and
  still hash-match.
- **The candidate stage is provably bounded**: winnowing stores
  ~2/(W+1) of all K-gram positions (density bound from the paper), so
  the fingerprint index is ~40% of the K-gram relation, and the
  verify join only ever touches documents that share a fingerprint —
  never corpus². The one residual hot spot is a boilerplate
  fingerprint shared by many docs; at 100 TB that key gets the same
  frequency-cap treatment as Adamic-Adar hubs (drop fps in > C docs —
  they are boilerplate by definition), kept OFF here so the oracle
  stays the plain exact computation.
- **Verification is exact**: matched K-gram positions of a candidate
  pair are grouped by diagonal (pos_a - pos_b); a maximal run of
  consecutive positions on one diagonal is a maximal shared span of
  run_len + K - 1 tokens (the classic dot-plot diagonal argument).

The per-position coverage query needs no pair enumeration at all: a
token position is duplicated iff it lies inside some cross-doc shared
K-gram, so coverage = interval union of fixed-length-K intervals over
the shared K-gram starts — one groupBy(h) + one join back keyed on h,
both LINEAR in corpus size.

Reference parity: the reference (HYUNJOON94/etl-generator-demo) has no
dedup operators at all — its corpus lives behind `sample_metadata.py`
and every computation is delegated to PostgreSQL. This family is the
LLM-training-pipeline surface the brief requires as first-class.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..registry import register
from .relational import t
from .textops import WINNOW_K, WINNOW_W, winnowing_fingerprints

#: K-gram size shared with the winnowing index (textops.WINNOW_K): the
#: coverage query counts positions inside cross-doc shared K-grams.
SPAN_K = WINNOW_K
#: Minimum reported span length in tokens. K + W - 1 is exactly the
#: winnowing recall guarantee, making fingerprint candidates lossless.
SPAN_T = WINNOW_K + WINNOW_W - 1

#: Shared DuckDB K-gram CTE: (doc_id, pos, h) for every full K-gram.
#: Positions are 1-based (GENERATE_SUBSCRIPTS) vs Spark's 0-based
#: posexplode — harmless, since only position DIFFERENCES are used.
_DUCK_KGRAMS = f"""
    tok AS (
        SELECT doc_id,
               UNNEST(STRING_SPLIT(text, ' ')) AS tk,
               GENERATE_SUBSCRIPTS(STRING_SPLIT(text, ' '), 1) AS pos
        FROM documents
    ),
    kg0 AS (
        SELECT doc_id, pos,
               MD5(tk {"".join(f"|| '_' || LEAD(tk, {i}) OVER w " for i in range(1, WINNOW_K))}) AS h
        FROM tok WINDOW w AS (PARTITION BY doc_id ORDER BY pos)
    ),
    kg AS (SELECT doc_id, pos, h FROM kg0 WHERE h IS NOT NULL)
"""


def _kgrams(d: DataFrame) -> DataFrame:
    """(doc_id, pos, h): md5 of each full K-token gram, 0-based pos.
    Same tokenization and gram shape as textops.winnowing_fingerprints
    (concat_ws skips NULLs, so tail grams are gated on the furthest
    lead instead)."""
    tok = d.select("doc_id", F.posexplode(F.split("text", " ")).alias("pos", "tk"))
    w = Window.partitionBy("doc_id").orderBy("pos")
    kgram = F.concat_ws(
        "_", F.col("tk"), *[F.lead("tk", i).over(w) for i in range(1, WINNOW_K)]
    )
    return tok.select(
        "doc_id",
        "pos",
        F.when(F.lead("tk", WINNOW_K - 1).over(w).isNotNull(), F.md5(kgram)).alias("h"),
    ).filter(F.col("h").isNotNull())


#: Full spans oracle, shared: the cross-source rollup embeds it as a
#: derived table.
_SPANS_ORACLE = f"""
    WITH {_DUCK_KGRAMS},
    m AS (
        SELECT a.doc_id AS da, b.doc_id AS db, a.pos AS pa, b.pos AS pb
        FROM kg a JOIN kg b ON a.h = b.h AND a.doc_id < b.doc_id
    ),
    r AS (
        SELECT da, db, pa,
               pa - ROW_NUMBER() OVER (PARTITION BY da, db, pa - pb
                                       ORDER BY pa) AS grp,
               pa - pb AS diag
        FROM m
    ),
    s AS (
        SELECT da, db, CAST(COUNT(*) + {SPAN_K - 1} AS BIGINT) AS span_tokens
        FROM r GROUP BY da, db, diag, grp
    )
    SELECT da AS doc_a, db AS doc_b,
           CAST(COUNT(*) AS BIGINT) AS n_spans,
           CAST(MAX(span_tokens) AS BIGINT) AS max_span_tokens
    FROM s WHERE span_tokens >= {SPAN_T}
    GROUP BY da, db
"""


@register(
    "x2_exact_substr_spans",
    oracle=_SPANS_ORACLE + "    ORDER BY doc_a, doc_b",
    survey_ids=("X2", "J1", "W1", "A1"),
)
def x2_exact_substr_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact duplicate spans >= T = K+W-1 tokens between distinct docs
    (Lee et al. 2022 ExactSubstr, Spark-first): per ordered doc pair,
    the number of maximal shared spans and the longest one.

    Plan: (1) winnowing fingerprints (density ~2/(W+1) of K-grams)
    self-joined on fp — the ONLY cross-doc join over the full corpus,
    keyed on the sparse fingerprint value; (2) the K-gram relation is
    semi-joined down to candidate documents, then equality-joined on
    the 128-bit gram hash WITHIN candidate pairs; (3) matched
    positions grouped by diagonal pa-pb, maximal consecutive runs
    found with the pos - row_number constant-group idiom, span length
    = run + K - 1, filtered at T = K + W - 1 — the exact threshold the
    winnowing guarantee covers, so candidate pruning is lossless and
    the oracle computes the same relation with no winnowing at all.

    At 100 TB: no corpus² stage exists — fingerprints are ~40% of the
    K-gram index, candidates shuffle on fp, the verify join touches
    candidate docs only, and the diagonal-run windows are keyed on
    (pair, diagonal) — per-pair data, trivially parallel. A boilerplate
    frequency cap on hot fingerprints is the documented production
    knob (same hub-cap discipline as Adamic-Adar), off here so the
    semantics stay 'all pairs with a shared span >= T'."""
    docs = t(spark, sf_dir, "documents")
    fps = winnowing_fingerprints(docs)
    return _verified_span_pairs(docs, fps).orderBy("doc_a", "doc_b")


def _verified_span_pairs(docs: DataFrame, fps: DataFrame) -> DataFrame:
    """(doc_a, doc_b, n_spans, max_span_tokens): exact diagonal-run
    span verification over the candidate pairs the given fingerprint
    relation generates. Shared by the lossless query (all fps) and the
    hot-fp-capped production variant."""
    cand = (
        fps.select(F.col("doc_id").alias("da"), "fp")
        .join(fps.select(F.col("doc_id").alias("db"), "fp"), "fp")
        .filter(F.col("da") < F.col("db"))
        .select("da", "db")
        .distinct()
    )
    cand_docs = (
        cand.select(F.col("da").alias("doc_id"))
        .union(cand.select("db"))
        .distinct()
    )
    kg = _kgrams(docs).join(cand_docs, "doc_id", "semi")
    m = (
        kg.select(F.col("doc_id").alias("da"), F.col("pos").alias("pa"), "h")
        .join(
            kg.select(F.col("doc_id").alias("db"), F.col("pos").alias("pb"), "h"),
            "h",
        )
        .filter(F.col("da") < F.col("db"))
        .join(cand, ["da", "db"], "semi")
    )
    wr = Window.partitionBy("da", "db", "diag").orderBy("pa")
    runs = (
        m.withColumn("diag", F.col("pa") - F.col("pb"))
        .withColumn("grp", F.col("pa") - F.row_number().over(wr))
        .groupBy("da", "db", "diag", "grp")
        .agg((F.count(F.lit(1)) + (SPAN_K - 1)).cast("long").alias("span_tokens"))
    )
    return (
        runs.filter(F.col("span_tokens") >= SPAN_T)
        .groupBy(F.col("da").alias("doc_a"), F.col("db").alias("doc_b"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_spans"),
            F.max("span_tokens").cast("long").alias("max_span_tokens"),
        )
    )


#: Shared coverage CTE tail (per-doc duplicated-token interval union).
_DUCK_COVERAGE = f"""
    hf AS (
        SELECT h FROM kg GROUP BY h HAVING COUNT(DISTINCT doc_id) >= 2
    ),
    sh AS (SELECT kg.doc_id, kg.pos FROM kg JOIN hf USING (h)),
    cov AS (
        SELECT doc_id,
               LEAST({SPAN_K},
                     COALESCE(LEAD(pos) OVER (PARTITION BY doc_id ORDER BY pos)
                              - pos, {SPAN_K})) AS covered
        FROM sh
    ),
    pd AS (
        SELECT doc_id, CAST(SUM(covered) AS BIGINT) AS n_dup_tokens
        FROM cov GROUP BY doc_id
    ),
    nt AS (
        SELECT doc_id, CAST(LEN(STRING_SPLIT(text, ' ')) AS BIGINT) AS n_tokens
        FROM documents
    )
"""


def _coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, n_tokens, n_dup_tokens) for every doc with >= 1
    cross-doc shared K-gram. A position is duplicated iff covered by a
    K-gram whose hash occurs in >= 2 distinct docs; coverage is the
    interval union of the fixed-length-K intervals over shared starts:
    sum of min(K, next_start - start) with the last interval paying K
    — one sorted window per doc, no pair enumeration anywhere."""
    docs = t(spark, sf_dir, "documents")
    kg = _kgrams(docs)
    hf = (
        kg.groupBy("h")
        .agg(F.count_distinct("doc_id").alias("nd"))
        .filter(F.col("nd") >= 2)
        .select("h")
    )
    shared = kg.join(hf, "h")  # keyed on h: linear, map-combined upstream
    w = Window.partitionBy("doc_id").orderBy("pos")
    cov = shared.select(
        "doc_id",
        F.least(
            F.lit(SPAN_K),
            F.coalesce(F.lead("pos").over(w) - F.col("pos"), F.lit(SPAN_K)),
        ).alias("covered"),
    )
    per_doc = cov.groupBy("doc_id").agg(
        F.sum("covered").cast("long").alias("n_dup_tokens")
    )
    ntok = docs.select(
        "doc_id", F.size(F.split("text", " ")).cast("long").alias("n_tokens")
    )
    return per_doc.join(ntok, "doc_id")


@register(
    "x2_duplicated_token_fraction",
    oracle=f"""
    WITH {_DUCK_KGRAMS},
    {_DUCK_COVERAGE}
    SELECT pd.doc_id, nt.n_tokens, pd.n_dup_tokens,
           CAST(pd.n_dup_tokens * 1000000 // nt.n_tokens AS BIGINT)
               AS dup_frac_e6
    FROM pd JOIN nt USING (doc_id)
    ORDER BY doc_id
    """,
    survey_ids=("X2", "A1", "W3"),
)
def x2_duplicated_token_fraction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document duplicated-token fraction: the share of a doc's
    token positions covered by a cross-doc exact shared span >= K
    tokens — Lee et al.'s per-example ExactSubstr signal, the number
    RefinedWeb-style pipelines threshold to drop or trim documents.

    Equivalence used: a position is covered by a shared span >= K iff
    it lies inside a shared K-gram (a span of L >= K tokens shares its
    L-K+1 K-gram starts, whose K-intervals union to the whole span).
    So the plan is pair-free: one groupBy(h) for cross-doc frequency,
    one join back on h, one per-doc sorted window for the interval
    union — every stage linear in corpus tokens, shuffles keyed on h
    then doc_id. Only docs with at least one shared K-gram appear."""
    out = _coverage(spark, sf_dir)
    return out.select(
        "doc_id",
        "n_tokens",
        "n_dup_tokens",
        F.expr("(n_dup_tokens * 1000000) div n_tokens").alias("dup_frac_e6"),
    ).orderBy("doc_id")


@register(
    "x2_exact_substr_corpus_rate",
    oracle=f"""
    WITH {_DUCK_KGRAMS},
    {_DUCK_COVERAGE},
    tot AS (
        SELECT CAST(COUNT(*) AS BIGINT) AS n_docs,
               CAST(SUM(n_tokens) AS BIGINT) AS total_tokens
        FROM nt
    ),
    dup AS (
        SELECT CAST(COUNT(*) AS BIGINT) AS n_docs_with_dup,
               CAST(COALESCE(SUM(n_dup_tokens), 0) AS BIGINT) AS total_dup_tokens
        FROM pd
    )
    SELECT tot.n_docs, dup.n_docs_with_dup, tot.total_tokens,
           dup.total_dup_tokens,
           CAST(dup.total_dup_tokens * 1000000 // tot.total_tokens AS BIGINT)
               AS corpus_dup_frac_e6
    FROM tot, dup
    """,
    survey_ids=("X2", "A2"),
)
def x2_exact_substr_corpus_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-level duplication rate: total tokens, tokens inside
    cross-doc shared spans, and the corpus duplicated fraction — the
    headline statistic of Lee et al. 2022 (they report e.g. C4 at
    ~3.9% near-duplicate content). One scalar row built from the same
    pair-free coverage relation as `x2_duplicated_token_fraction`;
    the cross join of the two 1-row aggregates is broadcast-trivial."""
    docs = t(spark, sf_dir, "documents")
    cov = _coverage(spark, sf_dir)
    tot = docs.agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum(F.size(F.split("text", " "))).cast("long").alias("total_tokens"),
    )
    dup = cov.agg(
        F.count(F.lit(1)).cast("long").alias("n_docs_with_dup"),
        F.coalesce(F.sum("n_dup_tokens"), F.lit(0)).cast("long").alias(
            "total_dup_tokens"
        ),
    )
    return tot.crossJoin(dup).select(
        "n_docs",
        "n_docs_with_dup",
        "total_tokens",
        "total_dup_tokens",
        F.expr("(total_dup_tokens * 1000000) div total_tokens").alias(
            "corpus_dup_frac_e6"
        ),
    )


@register(
    "x2_dup_span_removal",
    oracle=f"""
    WITH {_DUCK_KGRAMS},
    own AS (
        SELECT h, MIN(doc_id) AS owner
        FROM kg GROUP BY h HAVING COUNT(DISTINCT doc_id) >= 2
    ),
    rem AS (
        SELECT kg.doc_id, kg.pos
        FROM kg JOIN own USING (h)
        WHERE kg.doc_id <> own.owner
    ),
    cov AS (
        SELECT doc_id,
               LEAST({SPAN_K},
                     COALESCE(LEAD(pos) OVER (PARTITION BY doc_id ORDER BY pos)
                              - pos, {SPAN_K})) AS covered
        FROM (SELECT DISTINCT doc_id, pos FROM rem)
    ),
    pd AS (
        SELECT doc_id, CAST(SUM(covered) AS BIGINT) AS n_removed_tokens
        FROM cov GROUP BY doc_id
    ),
    nt AS (
        SELECT doc_id, CAST(LEN(STRING_SPLIT(text, ' ')) AS BIGINT) AS n_tokens
        FROM documents
    )
    SELECT pd.doc_id, nt.n_tokens, pd.n_removed_tokens,
           nt.n_tokens - pd.n_removed_tokens AS n_kept_tokens,
           CAST((nt.n_tokens - pd.n_removed_tokens) * 1000000 // nt.n_tokens
                AS BIGINT) AS kept_frac_e6
    FROM pd JOIN nt USING (doc_id)
    ORDER BY doc_id
    """,
    survey_ids=("X2", "A1", "W3", "J1"),
)
def x2_dup_span_removal(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The APPLY step of ExactSubstr dedup (Lee et al. 2022 delete the
    later copy of every duplicated span): per document, how many token
    positions a keep-first removal pass deletes and what survives.

    Policy (doc-level keep-first, the distributed-friendly variant):
    each cross-doc shared K-gram hash is OWNED by the minimum doc_id
    containing it; every other doc's positions covered by that gram
    are removed. The owner keeps all its occurrences (within-doc
    repeats are the repetition filter's job, `x4_repetition_scores`),
    so exactly one document retains each duplicated span and the
    policy is deterministic under any partitioning — no sequential
    suffix-array pass, unlike the reference implementation in the
    paper.

    Plan shape = the coverage query plus a min aggregate: groupBy(h)
    now also carries min(doc_id); the join back drops owner positions
    map-side; the interval union is the same per-doc sorted window.
    All stages linear in corpus tokens, keyed h then doc_id."""
    docs = t(spark, sf_dir, "documents")
    kg = _kgrams(docs)
    own = (
        kg.groupBy("h")
        .agg(
            F.count_distinct("doc_id").alias("nd"),
            F.min("doc_id").alias("owner"),
        )
        .filter(F.col("nd") >= 2)
        .select("h", "owner")
    )
    rem = (
        kg.join(own, "h")
        .filter(F.col("doc_id") != F.col("owner"))
        .select("doc_id", "pos")
        .distinct()
    )
    w = Window.partitionBy("doc_id").orderBy("pos")
    cov = rem.select(
        "doc_id",
        F.least(
            F.lit(SPAN_K),
            F.coalesce(F.lead("pos").over(w) - F.col("pos"), F.lit(SPAN_K)),
        ).alias("covered"),
    )
    per_doc = cov.groupBy("doc_id").agg(
        F.sum("covered").cast("long").alias("n_removed_tokens")
    )
    ntok = docs.select(
        "doc_id", F.size(F.split("text", " ")).cast("long").alias("n_tokens")
    )
    return (
        per_doc.join(ntok, "doc_id")
        .select(
            "doc_id",
            "n_tokens",
            "n_removed_tokens",
            (F.col("n_tokens") - F.col("n_removed_tokens")).alias("n_kept_tokens"),
            F.expr("((n_tokens - n_removed_tokens) * 1000000) div n_tokens").alias(
                "kept_frac_e6"
            ),
        )
        .orderBy("doc_id")
    )


@register(
    "x2_exact_substr_cross_source",
    oracle=f"""
    SELECT LEAST(sa.source, sb.source) AS source_lo,
           GREATEST(sa.source, sb.source) AS source_hi,
           CAST(COUNT(*) AS BIGINT) AS n_doc_pairs,
           CAST(SUM(j.n_spans) AS BIGINT) AS n_spans,
           CAST(MAX(j.max_span_tokens) AS BIGINT) AS max_span_tokens
    FROM ({_SPANS_ORACLE}) j
    JOIN documents sa ON sa.doc_id = j.doc_a
    JOIN documents sb ON sb.doc_id = j.doc_b
    GROUP BY source_lo, source_hi
    ORDER BY source_lo, source_hi
    """,
    survey_ids=("X2", "J1", "A1"),
)
def x2_exact_substr_cross_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Duplication provenance: which SOURCES share exact spans — the
    rollup a curation team reads before deciding which feed to trim
    (within-source template reuse vs cross-source scraping show up as
    different cells). Per unordered source pair: duplicate doc-pair
    count, total spans, longest span.

    Built directly on `x2_exact_substr_spans`' pair relation (same
    winnowing-lossless candidate stage); the source join broadcasts
    the doc→source mapping only for the pair endpoints, and the final
    rollup is |sources|²-bounded."""
    docs = t(spark, sf_dir, "documents").select("doc_id", "source")
    pairs = x2_exact_substr_spans(spark, sf_dir)
    j = (
        pairs.join(
            docs.select(
                F.col("doc_id").alias("doc_a"), F.col("source").alias("src_a")
            ),
            "doc_a",
        )
        .join(
            docs.select(
                F.col("doc_id").alias("doc_b"), F.col("source").alias("src_b")
            ),
            "doc_b",
        )
    )
    return (
        j.groupBy(
            F.least("src_a", "src_b").alias("source_lo"),
            F.greatest("src_a", "src_b").alias("source_hi"),
        )
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_doc_pairs"),
            F.sum("n_spans").cast("long").alias("n_spans"),
            F.max("max_span_tokens").cast("long").alias("max_span_tokens"),
        )
        .orderBy("source_lo", "source_hi")
    )


def _jaccard_oracle() -> str:
    """The registered x2_ngram_jaccard_pairs oracle, reused verbatim
    as a derived table (registry lookup keeps the two definitions from
    drifting apart)."""
    import etl_generator_demo_spark.operators.dedup  # noqa: F401  (registers it)

    from ..registry import REGISTRY

    return REGISTRY["x2_ngram_jaccard_pairs"].oracle


@register(
    "x2_dedup_methods_agreement",
    oracle=f"""
    WITH jp AS (SELECT doc_a, doc_b FROM ({_jaccard_oracle()})),
    sp AS (SELECT doc_a, doc_b FROM ({_SPANS_ORACLE})),
    f AS (
        SELECT jp.doc_a IS NOT NULL AS in_j,
               sp.doc_a IS NOT NULL AS in_s
        FROM jp FULL OUTER JOIN sp
          ON jp.doc_a = sp.doc_a AND jp.doc_b = sp.doc_b
    ),
    c AS (
        SELECT CAST(SUM(CASE WHEN in_j THEN 1 ELSE 0 END) AS BIGINT) AS n_j,
               CAST(SUM(CASE WHEN in_s THEN 1 ELSE 0 END) AS BIGINT) AS n_s,
               CAST(SUM(CASE WHEN in_j AND in_s THEN 1 ELSE 0 END) AS BIGINT)
                   AS n_both
        FROM f
    )
    SELECT n_j AS n_jaccard_pairs, n_s AS n_substr_pairs, n_both,
           n_j - n_both AS n_jaccard_only,
           n_s - n_both AS n_substr_only,
           CAST(n_both * 1000000 // NULLIF(n_j + n_s - n_both, 0) AS BIGINT)
               AS agreement_e6
    FROM c
    """,
    survey_ids=("X2", "J4", "A2"),
)
def x2_dedup_methods_agreement(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Methods-agreement audit between the two dedup tiers: exact
    5-gram Jaccard >= 0.5 (the SET-similarity view — order-insensitive,
    whole-document) vs exact shared spans >= 8 tokens (the SEQUENCE
    view — order-sensitive, local). Jaccard-only pairs are shuffled/
    paraphrase-order rewrites; substring-only pairs share a long quote
    inside otherwise-different documents — exactly the split a
    curation policy treats differently (drop vs trim). One row:
    both/either counts and the Jaccard-of-pair-sets agreement ratio.

    Plan: both pair relations are the already-bounded pipelines
    (inverted-index join; winnowing-lossless verify); the audit full
    outer join operates on pair relations orders of magnitude smaller
    than the corpus, and the final aggregate is one row."""
    from .dedup import x2_ngram_jaccard_pairs

    jac = x2_ngram_jaccard_pairs(spark, sf_dir).select("doc_a", "doc_b")
    sub = x2_exact_substr_spans(spark, sf_dir).select("doc_a", "doc_b")
    f = jac.withColumn("in_j", F.lit(True)).join(
        sub.withColumn("in_s", F.lit(True)), ["doc_a", "doc_b"], "full"
    )
    c = f.agg(
        F.sum(F.col("in_j").isNotNull().cast("long"))
        .cast("long")
        .alias("n_j"),
        F.sum(F.col("in_s").isNotNull().cast("long"))
        .cast("long")
        .alias("n_s"),
        F.sum((F.col("in_j").isNotNull() & F.col("in_s").isNotNull()).cast("long"))
        .cast("long")
        .alias("n_both"),
    )
    return c.select(
        F.col("n_j").alias("n_jaccard_pairs"),
        F.col("n_s").alias("n_substr_pairs"),
        "n_both",
        (F.col("n_j") - F.col("n_both")).alias("n_jaccard_only"),
        (F.col("n_s") - F.col("n_both")).alias("n_substr_only"),
        F.expr(
            "(n_both * 1000000) div nullif(n_j + n_s - n_both, 0)"
        ).alias("agreement_e6"),
    )


#: Hot-fingerprint cap for the guarded spans variant: fingerprints in
#: more than FP_CAP distinct docs are boilerplate by definition and
#: excluded from candidate generation (the Adamic-Adar hub-cap
#: discipline applied to the dedup index). 2 bites on the fixture
#: (max observed fp doc-frequency is 3-4), so the guarded result
#: genuinely differs from the lossless one and the oracle must
#: replicate the cap, not just the verify.
FP_CAP = 2


def _winnow_oracle() -> str:
    """The registered x4_winnowing_fingerprints oracle, reused
    verbatim as a derived table (registry lookup — definitions can't
    drift)."""
    import etl_generator_demo_spark.operators.textops  # noqa: F401

    from ..registry import REGISTRY

    return REGISTRY["x4_winnowing_fingerprints"].oracle


@register(
    "x2_exact_substr_spans_capped",
    oracle=f"""
    WITH wf AS (SELECT doc_id, fp FROM ({_winnow_oracle()})),
    keepfp AS (
        SELECT fp FROM wf GROUP BY fp
        HAVING COUNT(DISTINCT doc_id) <= {FP_CAP}
    ),
    wfc AS (SELECT wf.doc_id, wf.fp FROM wf JOIN keepfp USING (fp)),
    cand AS (
        SELECT DISTINCT a.doc_id AS da, b.doc_id AS db
        FROM wfc a JOIN wfc b ON a.fp = b.fp AND a.doc_id < b.doc_id
    ),
    {_DUCK_KGRAMS},
    m AS (
        SELECT a.doc_id AS da, b.doc_id AS db, a.pos AS pa, b.pos AS pb
        FROM kg a
        JOIN kg b ON a.h = b.h AND a.doc_id < b.doc_id
        JOIN cand c ON c.da = a.doc_id AND c.db = b.doc_id
    ),
    r AS (
        SELECT da, db, pa,
               pa - ROW_NUMBER() OVER (PARTITION BY da, db, pa - pb
                                       ORDER BY pa) AS grp,
               pa - pb AS diag
        FROM m
    ),
    s AS (
        SELECT da, db, CAST(COUNT(*) + {SPAN_K - 1} AS BIGINT) AS span_tokens
        FROM r GROUP BY da, db, diag, grp
    )
    SELECT da AS doc_a, db AS doc_b,
           CAST(COUNT(*) AS BIGINT) AS n_spans,
           CAST(MAX(span_tokens) AS BIGINT) AS max_span_tokens
    FROM s WHERE span_tokens >= {SPAN_T}
    GROUP BY da, db
    ORDER BY doc_a, doc_b
    """,
    survey_ids=("X2", "J1", "W1", "A1"),
)
def x2_exact_substr_spans_capped(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The PRODUCTION spelling of the duplicate-span detector: the
    hot-fingerprint cap ON (fps in > FP_CAP docs excluded from
    candidate generation — they are boilerplate by definition, and at
    100 TB they are the only super-linear key in the pipeline). The
    semantics intentionally differ from the lossless
    `x2_exact_substr_spans`: only pairs reachable through a NON-HOT
    shared fingerprint are verified — the guarded-LSH discipline
    (`x2_minhash_lsh_pairs_guarded`), with the pruning itself
    hash-verified because the oracle replays winnowing + cap + verify
    from the same md5 constants. On the fixture the cap of 2
    genuinely removes candidates (max fp doc-frequency 3-4), so the
    check proves the cap's exact effect, not a no-op."""
    docs = t(spark, sf_dir, "documents")
    fps = winnowing_fingerprints(docs)
    keep = (
        fps.groupBy("fp")
        .agg(F.count_distinct("doc_id").alias("nd"))
        .filter(F.col("nd") <= FP_CAP)
        .select("fp")
    )
    return _verified_span_pairs(docs, fps.join(keep, "fp")).orderBy(
        "doc_a", "doc_b"
    )
