"""Full-text retrieval primitives over the documents corpus: BM25
scoring and PMI co-occurrence — the query-side counterpart of the
text-analysis suite (SURVEY §2.12 X4; the reference's corpora live in
PostgreSQL where this is `ts_rank`/pg_trgm territory, reimagined
Spark-first for a 100 TB corpus).

Float determinism contract (same as ``textops``): every score is
derived from exact integer counts through ONE identically-shaped
double expression in both engines, then floor-scaled to 1e-6 and
summed as BIGINT — integer summation is order-independent, so the
oracle hash never depends on aggregation order. The only cross-engine
float risk is last-ulp `ln` differences (JVM Math.log vs libm), which
the floor scale makes vanishingly unlikely to flip.

Scale shape: token explode + map-combined groupBys (tf, df, doc
length); the per-term stats relation is vocabulary-sized and
broadcast; the only corpus-sized shuffles are keyed on doc_id. No
all-pairs stage anywhere — PMI pairs are generated per-document from
a top-K vocabulary (≤ C(K,2) pairs per doc, linear in corpus size).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from etl_generator_demo_spark.operators.relational import t
from etl_generator_demo_spark.registry import register

#: BM25 hyperparameters (the Robertson/Sparck-Jones defaults).
BM25_K1 = 1.2
BM25_B = 0.75
#: Fixed query — deterministic, present at every SF in the fixture vocab.
BM25_QUERY_TERMS = ("vector", "spark", "window")
BM25_TOP_K = 20

#: PMI vocabulary cap: pairs are only generated within the top-K
#: document-frequency terms, bounding per-doc pair fan-out at C(K,2).
PMI_VOCAB_K = 20


def _bm25_oracle() -> str:
    terms = ", ".join(f"'{x}'" for x in BM25_QUERY_TERMS)
    return f"""
    WITH tok AS (
        SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents
    ),
    dl AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS dl FROM tok GROUP BY doc_id),
    stats AS (
        SELECT CAST(COUNT(*) AS BIGINT) AS n_docs,
               CAST(SUM(dl) AS BIGINT)  AS total_len
        FROM dl
    ),
    tf AS (
        SELECT doc_id, term, CAST(COUNT(*) AS BIGINT) AS tf
        FROM tok WHERE term IN ({terms}) GROUP BY doc_id, term
    ),
    dfreq AS (SELECT term, CAST(COUNT(*) AS BIGINT) AS df FROM tf GROUP BY term),
    scored AS (
        SELECT tf.doc_id,
               CAST(FLOOR(
                   (LN(1 + (stats.n_docs - dfreq.df + 0.5) / (dfreq.df + 0.5))
                    * (tf.tf * {BM25_K1 + 1}))
                   / (tf.tf + {BM25_K1} * (1 - {BM25_B}
                      + {BM25_B} * dl.dl / (CAST(stats.total_len AS DOUBLE) / stats.n_docs)))
                   * 1000000) AS BIGINT) AS term_score_e6
        FROM tf
        JOIN dfreq USING (term)
        JOIN dl USING (doc_id)
        CROSS JOIN stats
    )
    SELECT doc_id,
           CAST(SUM(term_score_e6) AS BIGINT) AS bm25_e6,
           CAST(COUNT(*) AS BIGINT)           AS n_terms_hit
    FROM scored
    GROUP BY doc_id
    ORDER BY bm25_e6 DESC, doc_id
    LIMIT {BM25_TOP_K}
    """


@register("x4_bm25_topk", oracle=_bm25_oracle(), survey_ids=("X4",))
def x4_bm25_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BM25 top-20 documents for a fixed 3-term query.

    idf uses the +1 'BM25+'-style form ln(1 + (N-df+0.5)/(df+0.5)) so
    scores stay positive even for terms in >half the corpus (this
    fixture's vocab is tiny, so every term is common). Per-term scores
    are floor-scaled to integer micro-units BEFORE the per-doc sum —
    SUM(BIGINT) is order-independent, so the final hash is immune to
    Spark/DuckDB aggregation-order float wobble.

    Plan at scale: tf is filtered to the query terms at the explode
    (map-side, before any shuffle), dfreq is query-sized and
    broadcast, stats is one scalar row; the only corpus-keyed shuffle
    joins tf to doc lengths on doc_id. Top-k compiles to
    TakeOrderedAndProject."""
    docs = t(spark, sf_dir, "documents")
    tok = docs.select("doc_id", F.explode(F.split("text", " ")).alias("term"))
    dl = tok.groupBy("doc_id").agg(F.count(F.lit(1)).alias("dl"))
    stats = dl.agg(
        F.count(F.lit(1)).alias("n_docs"), F.sum("dl").alias("total_len")
    )
    tf = (
        tok.filter(F.col("term").isin(*BM25_QUERY_TERMS))
        .groupBy("doc_id", "term")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    dfreq = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    avgdl = F.col("total_len").cast("double") / F.col("n_docs")
    idf = F.log(1 + (F.col("n_docs") - F.col("df") + 0.5) / (F.col("df") + 0.5))
    term_score = (idf * (F.col("tf") * (BM25_K1 + 1))) / (
        F.col("tf")
        + BM25_K1 * (F.lit(1) - BM25_B + BM25_B * F.col("dl") / avgdl)
    )
    scored = (
        tf.join(F.broadcast(dfreq), "term")
        .join(dl, "doc_id")
        .crossJoin(F.broadcast(stats))
        .select(
            "doc_id",
            F.floor(term_score * 1000000).cast("long").alias("term_score_e6"),
        )
    )
    return (
        scored.groupBy("doc_id")
        .agg(
            F.sum("term_score_e6").cast("long").alias("bm25_e6"),
            F.count(F.lit(1)).cast("long").alias("n_terms_hit"),
        )
        .orderBy(F.desc("bm25_e6"), "doc_id")
        .limit(BM25_TOP_K)
    )


def _pmi_oracle() -> str:
    return f"""
    WITH dt AS (
        SELECT DISTINCT doc_id, unnest(string_split(text, ' ')) AS term FROM documents
    ),
    n AS (SELECT CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS n_docs FROM dt),
    dfreq AS (SELECT term, CAST(COUNT(*) AS BIGINT) AS df FROM dt GROUP BY term),
    vocab AS (SELECT term, df FROM dfreq ORDER BY df DESC, term LIMIT {PMI_VOCAB_K}),
    dv AS (SELECT dt.doc_id, dt.term FROM dt JOIN vocab USING (term)),
    pairs AS (
        SELECT a.term AS term_a, b.term AS term_b, CAST(COUNT(*) AS BIGINT) AS n_ab
        FROM dv a JOIN dv b ON a.doc_id = b.doc_id AND a.term < b.term
        GROUP BY a.term, b.term
    )
    SELECT p.term_a, p.term_b, p.n_ab,
           CAST(FLOOR(LN((p.n_ab * n.n_docs) / CAST(va.df * vb.df AS DOUBLE))
                      * 1000000) AS BIGINT) AS pmi_e6
    FROM pairs p
    JOIN vocab va ON va.term = p.term_a
    JOIN vocab vb ON vb.term = p.term_b
    CROSS JOIN n
    ORDER BY term_a, term_b
    """


@register("x4_pmi_cooccurrence", oracle=_pmi_oracle(), survey_ids=("X4",))
def x4_pmi_cooccurrence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pointwise mutual information over term pairs co-occurring in a
    document — the phrase-mining / collocation primitive. PMI =
    ln(P(a,b) / (P(a)P(b))) computed as ln((n_ab·N) / (df_a·df_b)):
    every operand inside the log is an exact integer product, so both
    engines feed `ln` bit-identical doubles.

    The pair stage is bounded, not quadratic: only the top-{PMI_VOCAB_K}
    document-frequency terms participate (vocab broadcast), so each doc
    emits at most C({PMI_VOCAB_K},2) pairs — linear in corpus size, and
    the self-join is co-keyed on doc_id (no shuffle beyond the distinct)."""
    docs = t(spark, sf_dir, "documents")
    dt = docs.select(
        "doc_id", F.explode(F.split("text", " ")).alias("term")
    ).distinct()
    n_docs = dt.select("doc_id").distinct().count()  # scalar, one job
    dfreq = dt.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    vocab = dfreq.orderBy(F.desc("df"), "term").limit(PMI_VOCAB_K)
    dv = dt.join(F.broadcast(vocab.select("term")), "term").select("doc_id", "term")
    a = dv.select("doc_id", F.col("term").alias("term_a"))
    b = dv.select("doc_id", F.col("term").alias("term_b"))
    pairs = (
        a.join(b, ["doc_id"])
        .filter(F.col("term_a") < F.col("term_b"))
        .groupBy("term_a", "term_b")
        .agg(F.count(F.lit(1)).alias("n_ab"))
    )
    va = vocab.select(F.col("term").alias("term_a"), F.col("df").alias("df_a"))
    vb = vocab.select(F.col("term").alias("term_b"), F.col("df").alias("df_b"))
    pmi = F.log(
        (F.col("n_ab") * F.lit(n_docs)) / (F.col("df_a") * F.col("df_b")).cast("double")
    )
    return (
        pairs.join(F.broadcast(va), "term_a")
        .join(F.broadcast(vb), "term_b")
        .select(
            "term_a",
            "term_b",
            "n_ab",
            F.floor(pmi * 1000000).cast("long").alias("pmi_e6"),
        )
        .orderBy("term_a", "term_b")
    )


# ---------------------------------------------------------------------------
# Hybrid retrieval: reciprocal-rank fusion of BM25 + ANN (round 9)
# ---------------------------------------------------------------------------

#: RRF constant (Cormack/Clarke/Buettcher 2009's k=60), per-half pool
#: depth, and fused result size. RRF terms are exact integers
#: (1e9 // (k + rank)) so the fusion hashes across engines.
RRF_K = 60
RRF_POOL = 20
RRF_TOP = 10


def _rrf_oracle() -> str:
    from etl_generator_demo_spark.operators.ann_index import LSH_PLANES, LSH_TABLES
    from etl_generator_demo_spark.operators.similarity import _duck_bucket_expr

    match = " OR ".join(
        f"({_duck_bucket_expr(tbl, LSH_PLANES, col='e.v')}"
        f" = {_duck_bucket_expr(tbl, LSH_PLANES, col='q.qv')})"
        for tbl in range(LSH_TABLES)
    )
    return f"""
    WITH bm_top AS ( {_bm25_oracle()} ),
    bmr AS (
        SELECT doc_id,
               ROW_NUMBER() OVER (ORDER BY bm25_e6 DESC, doc_id) AS r_bm
        FROM bm_top
    ),
    q AS (SELECT embedding::DOUBLE[] AS qv FROM embeddings WHERE vec_id = 0),
    e AS (
        SELECT vec_id, embedding::DOUBLE[] AS v
        FROM embeddings WHERE vec_id <> 0
    ),
    ann_top AS (
        SELECT e.vec_id,
               FLOOR(LIST_DOT_PRODUCT(e.v, q.qv)
                     / (SQRT(LIST_DOT_PRODUCT(e.v, e.v))
                        * SQRT(LIST_DOT_PRODUCT(q.qv, q.qv)))
                     * 1000000) / 1000000 AS cosine
        FROM e, q
        WHERE {match}
        ORDER BY cosine DESC, vec_id
        LIMIT {RRF_POOL}
    ),
    annr AS (
        SELECT vec_id,
               ROW_NUMBER() OVER (ORDER BY cosine DESC, vec_id) AS r_ann
        FROM ann_top
    ),
    fused AS (
        SELECT COALESCE(b.doc_id, a.vec_id) AS doc_id, b.r_bm, a.r_ann
        FROM bmr b FULL OUTER JOIN annr a ON b.doc_id = a.vec_id
    )
    SELECT doc_id,
           CAST(r_bm AS BIGINT) AS bm25_rank,
           CAST(r_ann AS BIGINT) AS ann_rank,
           CAST(COALESCE(1000000000 // ({RRF_K} + r_bm), 0)
                + COALESCE(1000000000 // ({RRF_K} + r_ann), 0) AS BIGINT)
               AS rrf_score
    FROM fused
    ORDER BY rrf_score DESC, doc_id
    LIMIT {RRF_TOP}
    """


@register(
    "x4_rrf_hybrid_topk",
    oracle=_rrf_oracle(),
    survey_ids=("X4", "X3", "W1", "J4", "O4"),
)
def x4_rrf_hybrid_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hybrid retrieval: reciprocal-rank fusion of the BM25 lexical
    half (fixed 3-term query, `x4_bm25_topk`'s scoring) and the ANN
    semantic half (vec_id 0's embedding through the persisted
    partition-pruned LSH index, `x3_ann_lsh_probe`'s path) — the
    serving composition every RAG pipeline runs. The fixture links the
    two id spaces 1:1 (vec_id i is the embedding of doc_id i).

    RRF (Cormack et al. 2009): score(d) = Σ_halves 1/(k + rank_d),
    k=60, carried as exact integer 1e9//(k+rank) terms so the fused
    ordering hashes identically in both engines; a doc ranked in only
    one half scores that half alone (full outer join, the other rank
    NULL → 0 — so a doc top-ranked in either half survives fusion).

    Scale: each half is already bounded — BM25 ends in a
    TakeOrderedAndProject over map-filtered term stats, the LSH probe
    reads only the query's 8 bucket directories — and the fusion
    operates on two pool-sized (<= 20 row) relations: the rank windows
    sort a pool, never a corpus, so the whole fusion stage is
    broadcast-trivial at any corpus size."""
    from pyspark.sql.window import Window

    from etl_generator_demo_spark.operators.ann_index import lsh_probe_topk

    bm = x4_bm25_topk(spark, sf_dir).select("doc_id", "bm25_e6")
    # pool-bounded global window: <= RRF_POOL rows after the top-k
    bmr = bm.select(
        "doc_id",
        F.row_number()
        .over(Window.orderBy(F.desc("bm25_e6"), "doc_id"))
        .alias("r_bm"),
    )
    emb = t(spark, sf_dir, "embeddings")
    qv = [
        float(x)
        for x in emb.filter(F.col("vec_id") == 0)
        .select("embedding")
        .first()["embedding"]
    ]
    ann = lsh_probe_topk(spark, sf_dir, qv, k=RRF_POOL, exclude_ids=(0,)).select(
        "vec_id", "cosine"
    )
    annr = ann.select(
        F.col("vec_id").alias("doc_id"),
        F.row_number()
        .over(Window.orderBy(F.desc("cosine"), "vec_id"))
        .alias("r_ann"),
    )
    return (
        bmr.join(annr, "doc_id", "full")
        .select(
            "doc_id",
            F.col("r_bm").cast("long").alias("bm25_rank"),
            F.col("r_ann").cast("long").alias("ann_rank"),
            (
                F.coalesce(F.expr(f"1000000000 div ({RRF_K} + r_bm)"), F.lit(0))
                + F.coalesce(F.expr(f"1000000000 div ({RRF_K} + r_ann)"), F.lit(0))
            )
            .cast("long")
            .alias("rrf_score"),
        )
        .orderBy(F.desc("rrf_score"), "doc_id")
        .limit(RRF_TOP)
    )
