"""Round-10 batch 2: training-run layout, lakehouse clustering,
embedding QA, retrieval evaluation, tokenizer application.

- Curriculum shard assignment: the deterministic global ordering +
  round-robin sharding step that turns a curated corpus into training
  shards (quality-first curriculum), using the scale-safe
  ``global_row_number`` (range shuffle, never a single-partition
  window).
- Z-order (Morton) clustering audit: interleave the bits of two
  rank-normalized key columns and report per-bucket key spans — the
  data-skipping quality measure behind Delta/Iceberg ``OPTIMIZE
  ZORDER BY``. Pure integer bit arithmetic spelled as arithmetic
  (div/mod/multiply), identical in both engines.
- Embedding norm audit: per-label vector-quality stats with the
  quantize-then-sum discipline (components floored to e3 integers
  BEFORE the square-sum, so the fold is order-free exact — no float
  accumulation).
- NDCG@k of the BM25 ranking against a deterministic graded relevance
  (per-doc query-term hit count): the retrieval-eval closing piece
  over the existing BM25 scorer.
- BPE tokenizer APPLICATION: the corpus encoded with the merges the
  relational trainer (bpe.py) learned — per-source encoded token
  counts and compression, the serving half of tokenizer training.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..registry import register
from .analytics_ext import global_row_number
from .bpe import BPE_STEPS, _bpe_step_sql, bpe_merge_step
from .relational import t
from .retrieval import BM25_B, BM25_K1, BM25_QUERY_TERMS
from .textops import STOPWORDS_EN

_STOP_SQL = ", ".join(f"'{w}'" for w in STOPWORDS_EN)

#: Curriculum shards (training-file fan-out).
N_SHARDS = 8

#: Z-order grid bits per dimension (256×256 cells) and bucket count.
Z_BITS = 8
Z_BUCKETS_SHIFT = 8  # top 8 of the 16 interleaved bits -> 256 buckets

#: NDCG cutoff (matches the BM25 top-k pool).
NDCG_K = 20


# ---------------------------------------------------------------------------
# curriculum shards
# ---------------------------------------------------------------------------

@register(
    "x4_curriculum_shards",
    oracle=f"""
    WITH tok AS (
        SELECT doc_id, UNNEST(STRING_SPLIT(text, ' ')) AS w FROM documents
    ),
    tier AS (
        SELECT doc_id,
               CAST(COUNT(DISTINCT CASE WHEN LOWER(w) IN ({_STOP_SQL})
                                        THEN LOWER(w) END) AS BIGINT) AS tier
        FROM tok GROUP BY doc_id
    ),
    ordered AS (
        SELECT d.doc_id, d.lang, d.n_chars, COALESCE(t.tier, 0) AS tier,
               ROW_NUMBER() OVER (
                   ORDER BY COALESCE(t.tier, 0) DESC, d.n_chars DESC, d.doc_id
               ) AS rn
        FROM documents d LEFT JOIN tier t USING (doc_id)
    )
    SELECT CAST((rn - 1) % {N_SHARDS} AS BIGINT) AS shard,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(n_chars) AS BIGINT) AS sum_chars,
           CAST(COUNT(DISTINCT lang) AS BIGINT) AS n_langs,
           CAST(SUM(tier) AS BIGINT) AS sum_tier,
           CAST(MIN(rn) AS BIGINT) AS first_rn,
           CAST(MAX(rn) AS BIGINT) AS last_rn
    FROM ordered
    GROUP BY shard ORDER BY shard
    """,
    survey_ids=("X4", "W1", "A1", "O1"),
)
def x4_curriculum_shards(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Curriculum shard assignment: docs globally ordered by
    (quality tier DESC, length DESC, doc_id) — quality tier = distinct
    stopword hits, the cheap fluency proxy — then dealt round-robin
    into N_SHARDS training shards; output is the per-shard composition
    audit (docs, chars, language spread, tier mass, rank range). The
    round-robin deal guarantees every shard sees the full curriculum
    spectrum (first_rn/last_rn make that visible).

    Scale: the global order comes from :func:`global_row_number` — a
    range shuffle + per-partition rebase, never a single-partition
    window; everything after is one map-combined rollup over
    N_SHARDS keys."""
    docs = t(spark, sf_dir, "documents")
    tok = docs.select("doc_id", F.explode(F.split("text", " ")).alias("w"))
    stop = [w.lower() for w in STOPWORDS_EN]
    tier = tok.groupBy("doc_id").agg(
        F.count_distinct(F.when(F.lower("w").isin(stop), F.lower("w")))
        .cast("long")
        .alias("tier")
    )
    base = docs.join(tier, "doc_id", "left").select(
        "doc_id",
        "lang",
        "n_chars",
        F.coalesce("tier", F.lit(0)).alias("tier"),
    )
    ordered, _n = global_row_number(
        base,
        [F.desc("tier"), F.desc("n_chars"), F.asc("doc_id")],
        rn_col="rn",
    )
    return (
        ordered.groupBy(
            ((F.col("rn") - 1) % N_SHARDS).cast("long").alias("shard")
        )
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.sum("n_chars").cast("long").alias("sum_chars"),
            F.count_distinct("lang").cast("long").alias("n_langs"),
            F.sum("tier").cast("long").alias("sum_tier"),
            F.min("rn").cast("long").alias("first_rn"),
            F.max("rn").cast("long").alias("last_rn"),
        )
        .orderBy("shard")
    )


# ---------------------------------------------------------------------------
# z-order clustering audit
# ---------------------------------------------------------------------------

def _morton_expr(px: str, py: str, div_op: str) -> str:
    """Bit interleave of two Z_BITS-wide non-negative ints, spelled as
    pure arithmetic (div/mod/multiply) so the SAME formula runs on
    Spark (`div`) and DuckDB (`//`) — no engine-specific bit operators."""
    terms = []
    for i in range(Z_BITS):
        terms.append(f"((({px}) {div_op} {1 << i}) % 2) * {1 << (2 * i)}")
        terms.append(f"((({py}) {div_op} {1 << i}) % 2) * {1 << (2 * i + 1)}")
    return " + ".join(terms)


def _zorder_oracle() -> str:
    morton = _morton_expr("px", "py", "//")
    return f"""
    WITH keyed AS (
        SELECT o_custkey AS ck,
               CAST(o_orderdate AS DATE) - DATE '1970-01-01' AS dd
        FROM orders
    ),
    bounds AS (
        SELECT MIN(ck) AS ck_min, MAX(ck) AS ck_max,
               MIN(dd) AS dd_min, MAX(dd) AS dd_max
        FROM keyed
    ),
    cells AS (
        SELECT ck, dd,
               ({1 << Z_BITS} * (ck - ck_min)) // (ck_max - ck_min + 1) AS px,
               ({1 << Z_BITS} * (dd - dd_min)) // (dd_max - dd_min + 1) AS py
        FROM keyed CROSS JOIN bounds
    ),
    coded AS (
        SELECT ck, dd, ({morton}) // {1 << Z_BUCKETS_SHIFT} AS bucket
        FROM cells
    )
    SELECT CAST(bucket AS BIGINT) AS bucket,
           CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(MAX(ck) - MIN(ck) AS BIGINT) AS cust_span,
           CAST(MAX(dd) - MIN(dd) AS BIGINT) AS date_span_days
    FROM coded
    GROUP BY bucket ORDER BY bucket
    """


@register(
    "d_zorder_clustering_keys",
    oracle=_zorder_oracle(),
    survey_ids=("D1", "F6", "A1", "X4"),
)
def d_zorder_clustering_keys(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Z-order (Morton) clustering audit over orders keyed by
    (custkey, orderdate): rank-normalize both keys to a 256×256 grid,
    interleave the bits, bucket by the top 8 interleaved bits (the
    file-assignment a Delta/Iceberg ``OPTIMIZE ZORDER BY`` performs),
    and report each bucket's span on BOTH dimensions — the
    data-skipping audit: z-order buckets are tight on custkey AND
    date simultaneously, where a 1-D sort is tight on one and spans
    everything on the other.

    Scale: the bounds are one broadcast scalar row; the Morton code is
    pure per-row arithmetic (div/mod — stays in whole-stage codegen,
    the identical formula text the oracle runs); the audit is one
    map-combined rollup over ≤256 buckets. This is the PLANNING
    operator — the actual rewrite is `etl.py` load with
    ``partition_by`` on the bucket column."""
    o = t(spark, sf_dir, "orders")
    keyed = o.select(
        F.col("o_custkey").alias("ck"),
        F.datediff(
            F.col("o_orderdate").cast("date"), F.lit("1970-01-01").cast("date")
        ).alias("dd"),
    )
    bounds = keyed.agg(
        F.min("ck").alias("ck_min"),
        F.max("ck").alias("ck_max"),
        F.min("dd").alias("dd_min"),
        F.max("dd").alias("dd_max"),
    )
    cells = keyed.crossJoin(F.broadcast(bounds)).select(
        "ck",
        "dd",
        F.expr(
            f"({1 << Z_BITS} * (ck - ck_min)) div (ck_max - ck_min + 1)"
        ).alias("px"),
        F.expr(
            f"({1 << Z_BITS} * (dd - dd_min)) div (dd_max - dd_min + 1)"
        ).alias("py"),
    )
    morton = _morton_expr("px", "py", "div")
    coded = cells.select(
        "ck",
        "dd",
        F.expr(f"({morton}) div {1 << Z_BUCKETS_SHIFT}").alias("bucket"),
    )
    return (
        coded.groupBy(F.col("bucket").cast("long").alias("bucket"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_rows"),
            (F.max("ck") - F.min("ck")).cast("long").alias("cust_span"),
            (F.max("dd") - F.min("dd")).cast("long").alias("date_span_days"),
        )
        .orderBy("bucket")
    )


# ---------------------------------------------------------------------------
# embedding norm audit
# ---------------------------------------------------------------------------

@register(
    "x3_vector_norm_audit",
    oracle="""
    WITH per_vec AS (
        SELECT vec_id, label,
               CAST(LEN(embedding) AS BIGINT) AS dims,
               (SELECT CAST(SUM(CAST(FLOOR(x * 1000) AS BIGINT)
                                * CAST(FLOOR(x * 1000) AS BIGINT)) AS BIGINT)
                FROM UNNEST(embedding::DOUBLE[]) AS u(x)) AS qnorm2
        FROM embeddings
    )
    SELECT label,
           CAST(COUNT(*) AS BIGINT) AS n_vecs,
           CAST(MIN(dims) AS BIGINT) AS min_dims,
           CAST(MAX(dims) AS BIGINT) AS max_dims,
           CAST(MIN(qnorm2) AS BIGINT) AS min_qnorm2,
           CAST(MAX(qnorm2) AS BIGINT) AS max_qnorm2,
           CAST(SUM(qnorm2) AS BIGINT) AS sum_qnorm2,
           CAST(COUNT(*) FILTER (WHERE qnorm2 = 0) AS BIGINT) AS n_zero_vecs
    FROM per_vec
    GROUP BY label ORDER BY label
    """,
    survey_ids=("X3", "F6", "A1"),
)
def x3_vector_norm_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-column QA: per label, vector counts, dimensionality
    consistency (min/max dims — a ragged column is a broken upstream
    encoder), quantized squared-norm stats, and zero-vector counts
    (zero vectors poison cosine similarity downstream — they're what
    ``try_divide`` guards in the similarity family).

    Exactness: components are floored to e3 integers BEFORE the
    square-sum, so the per-vector fold is an integer sum — order-free,
    no float accumulation to wobble the hash (the quantize-then-sum
    discipline; contrast the AVG-based centroid op which relies on
    well-conditioned means). Scale: one array fold per row (stays in
    codegen), one |labels|-keyed map-combined rollup — no shuffle
    carries a vector."""
    emb = t(spark, sf_dir, "embeddings")
    per_vec = emb.select(
        "label",
        F.size("embedding").cast("long").alias("dims"),
        # Empty-array contract: NULL, not 0 — an empty embedding is a
        # missing vector, not a zero vector. (The DuckDB oracle's
        # correlated SUM over an empty UNNEST returns NULL; the Spark
        # fold would return the 0 initializer, silently counting the
        # row as a zero vector. Pinned by the empty-row pytest.)
        F.when(F.size("embedding") == 0, F.lit(None).cast("long"))
        .otherwise(
            F.aggregate(
                F.transform(
                    "embedding",
                    lambda x: F.floor(x.cast("double") * 1000).cast("long"),
                ),
                F.lit(0).cast("long"),
                lambda acc, q: acc + q * q,
            )
        )
        .alias("qnorm2"),
    )
    return (
        per_vec.groupBy("label")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_vecs"),
            F.min("dims").cast("long").alias("min_dims"),
            F.max("dims").cast("long").alias("max_dims"),
            F.min("qnorm2").cast("long").alias("min_qnorm2"),
            F.max("qnorm2").cast("long").alias("max_qnorm2"),
            F.sum("qnorm2").cast("long").alias("sum_qnorm2"),
            F.count(F.when(F.col("qnorm2") == 0, 1))
            .cast("long")
            .alias("n_zero_vecs"),
        )
        .orderBy("label")
    )


# ---------------------------------------------------------------------------
# NDCG retrieval evaluation
# ---------------------------------------------------------------------------

def _ndcg_oracle() -> str:
    terms = ", ".join(f"'{x}'" for x in BM25_QUERY_TERMS)
    return f"""
    WITH tok AS (
        SELECT doc_id, UNNEST(STRING_SPLIT(text, ' ')) AS term FROM documents
    ),
    rel AS (
        SELECT doc_id,
               CAST(COUNT(DISTINCT term) AS BIGINT) AS rel
        FROM tok WHERE term IN ({terms}) GROUP BY doc_id
    ),
    dl AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS dl FROM tok GROUP BY doc_id),
    stats AS (
        SELECT CAST(COUNT(*) AS BIGINT) AS n_docs,
               CAST(SUM(dl) AS BIGINT) AS total_len
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
    ),
    ranking AS (
        SELECT doc_id, CAST(SUM(term_score_e6) AS BIGINT) AS bm25_e6
        FROM scored GROUP BY doc_id
        ORDER BY bm25_e6 DESC, doc_id LIMIT {NDCG_K}
    ),
    sys AS (
        SELECT r.doc_id, rel.rel,
               ROW_NUMBER() OVER (ORDER BY r.bm25_e6 DESC, r.doc_id) AS rnk
        FROM ranking r JOIN rel USING (doc_id)
    ),
    dcg AS (
        SELECT CAST(SUM(CAST(FLOOR(
                   ((POWER(2, rel) - 1) * 1000000.0) * LN(2.0)
                   / LN(CAST(rnk + 1 AS DOUBLE))
               ) AS BIGINT)) AS BIGINT) AS dcg_e6,
               CAST(COUNT(*) AS BIGINT) AS n_ranked
        FROM sys
    ),
    ideal AS (
        SELECT rel, ROW_NUMBER() OVER (ORDER BY rel DESC, doc_id) AS rnk
        FROM rel ORDER BY rel DESC, doc_id LIMIT {NDCG_K}
    ),
    idcg AS (
        SELECT CAST(SUM(CAST(FLOOR(
                   ((POWER(2, rel) - 1) * 1000000.0) * LN(2.0)
                   / LN(CAST(rnk + 1 AS DOUBLE))
               ) AS BIGINT)) AS BIGINT) AS idcg_e6
        FROM ideal
    )
    SELECT dcg.n_ranked, dcg.dcg_e6, idcg.idcg_e6,
           (dcg.dcg_e6 * 1000000) // idcg.idcg_e6 AS ndcg_e6
    FROM dcg CROSS JOIN idcg
    """


@register(
    "x4_ndcg_eval",
    oracle=_ndcg_oracle(),
    survey_ids=("X4", "W1", "A2", "O4"),
)
def x4_ndcg_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NDCG@20 of the BM25 ranking (``x4_bm25_topk``'s scorer) against
    a deterministic graded relevance — rel(doc) = distinct query terms
    present (0–3). One summary row: ranked count, DCG, ideal DCG, and
    NDCG in e6 fixed point. This is the eval loop every retrieval
    pipeline closes: change the scorer, re-run, compare one number.

    Exactness: per-rank gain terms ``(2^rel − 1)·10⁶·ln2 / ln(r+1)``
    are floored to integers BEFORE summation (the BM25 idiom — SUM of
    BIGINT is order-free); the final NDCG is an integer floor ratio.
    Scale (r14 rewrite, caught by the spine-walk window gate): both
    global row_numbers now run over provably-bounded inputs ON THEIR
    OWN SPINE — the system ranks are assigned on the ≤NDCG_K BM25
    relation BEFORE the relevance join (every BM25-scored doc contains
    a query term, so the inner join drops no ranked row — rank-then-
    join ≡ join-then-rank here, and the DuckDB oracle hash-pins it),
    and the ideal ranking bounds `rel` with orderBy().limit(NDCG_K)
    (TakeOrderedAndProject) before its window. The r10 spelling ran
    the ideal window over the full hit-doc relation — corpus-sized on
    a broad query mix — through one task."""
    from .retrieval import x4_bm25_topk

    docs = t(spark, sf_dir, "documents")
    tok = docs.select("doc_id", F.explode(F.split("text", " ")).alias("term"))
    rel = (
        tok.filter(F.col("term").isin(*BM25_QUERY_TERMS))
        .groupBy("doc_id")
        .agg(F.count_distinct("term").cast("long").alias("rel"))
    )
    ranking = x4_bm25_topk(spark, sf_dir).select("doc_id", "bm25_e6")
    w_sys = Window.orderBy(F.desc("bm25_e6"), "doc_id")
    gain = (F.pow(F.lit(2), F.col("rel")) - 1) * 1000000.0
    term = F.floor(
        gain * F.log(F.lit(2.0)) / F.log((F.col("rnk") + 1).cast("double"))
    ).cast("long")
    sys_rows = (
        ranking.withColumn("rnk", F.row_number().over(w_sys))
        .join(rel, "doc_id")
        .select(term.alias("g"))
    )
    dcg = sys_rows.agg(
        F.sum("g").cast("long").alias("dcg_e6"),
        F.count(F.lit(1)).cast("long").alias("n_ranked"),
    )
    w_ideal = Window.orderBy(F.desc("rel"), "doc_id")
    ideal = (
        rel.orderBy(F.desc("rel"), "doc_id")
        .limit(NDCG_K)
        .withColumn("rnk", F.row_number().over(w_ideal))
        .select(term.alias("g"))
    )
    idcg = ideal.agg(F.sum("g").cast("long").alias("idcg_e6"))
    return (
        dcg.crossJoin(F.broadcast(idcg))
        .select(
            "n_ranked",
            "dcg_e6",
            "idcg_e6",
            F.expr("(dcg_e6 * 1000000) div idcg_e6").alias("ndcg_e6"),
        )
    )


# ---------------------------------------------------------------------------
# BPE encoding (tokenizer application)
# ---------------------------------------------------------------------------

def _bpe_encode_oracle() -> str:
    steps = "".join("," + _bpe_step_sql(k) for k in range(1, BPE_STEPS + 1))
    return f"""
    WITH docword AS (
        SELECT source, UNNEST(STRING_SPLIT(text, ' ')) AS word FROM documents
    ),
    vocab AS (
        SELECT word, CAST(COUNT(*) AS BIGINT) AS wcount FROM docword
        WHERE word <> '' GROUP BY word
    ),
    s0 AS MATERIALIZED (
        SELECT word, wcount,
               GENERATE_SUBSCRIPTS(STRING_SPLIT(word, ''), 1) AS pos,
               UNNEST(STRING_SPLIT(word, '')) AS sym
        FROM vocab
    )
    {steps},
    enc AS (
        SELECT word, CAST(COUNT(*) AS BIGINT) AS n_syms
        FROM s{BPE_STEPS} GROUP BY word
    )
    SELECT dw.source,
           CAST(COUNT(*) AS BIGINT) AS n_words,
           CAST(SUM(LENGTH(dw.word)) AS BIGINT) AS n_chars,
           CAST(SUM(e.n_syms) AS BIGINT) AS n_bpe_tokens,
           CAST((SUM(LENGTH(dw.word)) * 1000000) // SUM(e.n_syms) AS BIGINT)
               AS chars_per_token_e6
    FROM docword dw JOIN enc e ON e.word = dw.word
    WHERE dw.word <> ''
    GROUP BY dw.source ORDER BY dw.source
    """


@register(
    "x4_bpe_encode_corpus",
    oracle=_bpe_encode_oracle(),
    survey_ids=("X4", "W2", "A1", "J1"),
)
def x4_bpe_encode_corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tokenizer APPLICATION: encode the corpus with the merges the
    relational BPE trainer learned (``x4_bpe_merge_steps`` — same
    vocabulary, same 3 merge rounds) and report per-source encoded
    token counts and compression (chars per BPE token, e6) — the
    serving half of tokenizer training, and the number a data-mixture
    designer actually budgets with (token counts under the REAL
    tokenizer, not whitespace estimates).

    Scale: merges train on the VOCABULARY relation (distinct words —
    heavy-tailed, corpus-size independent); encoding never touches
    character state again — each corpus word occurrence joins the
    |vocab|-keyed ``(word, n_syms)`` relation, so the corpus-sized
    path is one join + one map-combined rollup. The word-keyed join is
    the standard vocabulary-broadcast shape at scale."""
    docs = t(spark, sf_dir, "documents")
    docword = docs.select(
        "source", F.explode(F.split("text", " ")).alias("word")
    ).filter(F.col("word") != "")
    vocab = docword.groupBy("word").agg(
        F.count(F.lit(1)).cast("long").alias("wcount")
    )
    state = vocab.select(
        "word",
        "wcount",
        F.posexplode(F.split("word", "")).alias("pos", "sym"),
    )
    for _ in range(BPE_STEPS):
        _top, state = bpe_merge_step(state)
        state = state.localCheckpoint(eager=True)
    enc = state.groupBy("word").agg(
        F.count(F.lit(1)).cast("long").alias("n_syms")
    )
    return (
        docword.join(enc, "word")
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_words"),
            F.sum(F.length("word")).cast("long").alias("n_chars"),
            F.sum("n_syms").cast("long").alias("n_bpe_tokens"),
        )
        .select(
            "source",
            "n_words",
            "n_chars",
            "n_bpe_tokens",
            F.expr("(n_chars * 1000000) div n_bpe_tokens").alias(
                "chars_per_token_e6"
            ),
        )
        .orderBy("source")
    )
