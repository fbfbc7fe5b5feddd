"""Round-13 operator surfaces.

Closes the r12 verdict's named gaps that are query-shaped:

- `x3_filtered_topk_prefilter` — the pre-filter arm of filtered
  vector search (verdict item 5): the predicate rides INSIDE the
  partition-pruned IVF list scan, the spelling vector stores call
  "filtered ANN done right", next to the post-filter multiplier sweep
  (`surfaces_r12b.x3_filtered_topk_postfilter_sweep`) that prices
  doing it wrong.

Reference anchor: the reference (HYUNJOON94/etl-generator-demo) has
no vector search at all — its only execution core is NL→SQL delegated
to a backing RDBMS (`/root/reference/sql_generator.py`); the [EXT]
X-surface exists because SURVEY.md §2.10 scopes the engine to the
training-data-pipeline operators a 100 TB corpus needs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from etl_generator_demo_spark.operators.relational import t
from etl_generator_demo_spark.registry import register

#: Recall floor for the pre-filter IVF verdict — same floor as the
#: sibling bounded-error verdicts (`x3_ann_ivf_topk`,
#: `x3_ann_lsh_topk`): uniform-random fixture embeddings give IVF
#: 4-of-16-list probes measured recall 0.4–1.0; real corpora cluster.
PREFILTER_RECALL_FLOOR = 0.3


@register(
    "x3_filtered_topk_prefilter",
    oracle="""
    WITH q AS (
        SELECT embedding::DOUBLE[] AS qv, label AS qlabel
        FROM embeddings WHERE vec_id = 0
    ),
    scored AS (
        SELECT vec_id, label,
               FLOOR(LIST_DOT_PRODUCT(embedding::DOUBLE[], qv)
                     / (SQRT(LIST_DOT_PRODUCT(embedding::DOUBLE[], embedding::DOUBLE[]))
                        * SQRT(LIST_DOT_PRODUCT(qv, qv))) * 1000000) / 1000000 AS cosine
        FROM embeddings, q
        WHERE vec_id <> 0 AND label = q.qlabel
    )
    SELECT vec_id, label, cosine, TRUE AS prefilter_recall_ge_030
    FROM scored
    ORDER BY cosine DESC, vec_id
    LIMIT 10
    """,
    survey_ids=("X3",),
)
def x3_filtered_topk_prefilter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Filtered ANN, PRE-filter arm (r12 verdict item 5): top-10
    same-label neighbors of vec_id=0 where the label predicate is
    pushed INTO the partition-pruned IVF list scan before ranking —
    recall against the exact pre-filtered ground truth can then never
    collapse the way the post-filter sweep
    (`x3_filtered_topk_postfilter_sweep`) shows it does for selective
    predicates, because every ranked candidate already qualifies.

    Stated as the bounded-error verdict the oracle can hash (the
    `x3_ann_ivf_topk` pattern): output rows are the EXACT label-
    filtered brute-force top-10 (DuckDB value-verifies every column);
    ``prefilter_recall_ge_030`` asserts the pruned+filtered probe
    recovered >= 3 of those 10. The plan shape — PushedFilters on
    `label` alongside PartitionFilters on `ivf_list`, no corpus scan
    in the probe branch — is asserted by tools/plan_audit.py.

    100 TB: the probe reads n_probe/n_lists of the index, and the
    row-group predicate skips non-matching labels inside those lists;
    cost scales with the filtered probe selectivity, not the corpus.

    Plan-time driver work (r13 advice, noted like the sibling ANN
    queries): one indexed ``.first()`` for the query vector+label
    (ivf_probe_topk ranks centroids driver-side — inherent to the
    serving shape) and, on first touch per corpus, the IVF index
    build. Plan-only consumers (tools/plan_audit.py) pay those at
    DataFrame-construction time."""
    from etl_generator_demo_spark.operators.ann_index import ivf_probe_topk
    from etl_generator_demo_spark.operators.similarity import brute_force_topk

    emb = t(spark, sf_dir, "embeddings")
    row0 = emb.filter(F.col("vec_id") == 0).select("embedding", "label").first()
    query_vec = [float(x) for x in row0["embedding"]]
    qlabel = int(row0["label"])
    exact = brute_force_topk(
        emb.filter((F.col("vec_id") != 0) & (F.col("label") == qlabel)),
        query_vec,
        k=10,
    )
    pre_ids = ivf_probe_topk(
        spark,
        sf_dir,
        query_vec,
        k=10,
        n_probe=4,
        exclude_ids=(0,),
        where=f"label = {qlabel}",
    ).select("vec_id")
    verdict = (
        exact.select("vec_id")
        .join(pre_ids, "vec_id")
        .agg(
            (
                F.count(F.lit(1)) / F.lit(10.0) >= PREFILTER_RECALL_FLOOR
            ).alias("prefilter_recall_ge_030")
        )
    )
    return (
        exact.crossJoin(F.broadcast(verdict))  # 1-row verdict fan-out
        .select("vec_id", "label", "cosine", "prefilter_recall_ge_030")
        .orderBy(F.desc("cosine"), "vec_id")
    )


# ---------------------------------------------------------------------------
# semantic eval decontamination — the embedding tier next to the
# exact-shingle (x4_decontaminate) and MinHash (x4_fuzzy_decontam) gates
# ---------------------------------------------------------------------------

#: Cosine acceptance for a semantic train-eval contamination hit, e6
#: fixed-point. 0.35 sits at ~p90 of the fixture's max-eval-cosine
#: distribution (uniform random embeddings concentrate near 0; real
#: corpora cluster, so production τ is corpus-calibrated, e.g. 0.95
#: for paraphrase-level SemDeDup-style thresholds).
SEMANTIC_DECONTAM_TAU_E6 = 350_000


def _semantic_decontam_oracle() -> str:
    from etl_generator_demo_spark.operators.textops import (
        DECONTAM_MOD,
        DECONTAM_REMAINDER,
    )

    return f"""
    WITH e AS (
        SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings
    ),
    ev AS (SELECT vec_id, v FROM e WHERE vec_id % {DECONTAM_MOD} = {DECONTAM_REMAINDER}),
    tr AS (SELECT vec_id, v FROM e WHERE vec_id % {DECONTAM_MOD} <> {DECONTAM_REMAINDER}),
    sc AS (
        SELECT tr.vec_id AS train_doc,
               CAST(FLOOR(LIST_DOT_PRODUCT(tr.v, ev.v)
                    / (SQRT(LIST_DOT_PRODUCT(tr.v, tr.v))
                       * SQRT(LIST_DOT_PRODUCT(ev.v, ev.v)))
                    * 1000000) AS BIGINT) AS cos_e6
        FROM tr CROSS JOIN ev
    )
    SELECT train_doc,
           CAST(COUNT(*) AS BIGINT) AS n_eval_neardups,
           CAST(MAX(cos_e6) AS BIGINT) AS max_cos_e6
    FROM sc
    WHERE cos_e6 >= {SEMANTIC_DECONTAM_TAU_E6}
    GROUP BY train_doc
    ORDER BY train_doc
    """


@register(
    "x3_semantic_decontam",
    oracle=_semantic_decontam_oracle(),
    survey_ids=("X3", "X4"),
)
def x3_semantic_decontam(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semantic eval decontamination — the third tier of the
    contamination ladder: a training doc is flagged when its embedding
    sits within cosine τ of ANY eval embedding, catching the
    rewritten/translated benchmark copies that survive both the exact
    5-gram gate (`x4_decontaminate`) and the MinHash near-dup gate
    (`x4_fuzzy_decontam`) — the embedding-similarity pass frontier-lab
    data cards describe. Same eval split as the sibling gates
    (doc_id % {DECONTAM_MOD} == {DECONTAM_REMAINDER}; embeddings align
    vec_id == doc_id in the fixtures). Output: flagged train doc →
    eval-hit count + worst cosine (e6).

    100 TB: eval suites are FIXED-SIZE benchmark sets, so the eval
    side broadcasts and the corpus is scanned once — cost is
    |corpus| x |eval| x dim fused multiply-adds, embarrassingly
    parallel, no shuffle until the per-doc rollup (map-combined). The
    hit filter runs BEFORE the rollup, so the shuffled relation is
    flagged-docs-sized, not corpus-sized. This is the BRUTE-FORCE
    AUDIT TIER; the serving tier is `x3_semantic_decontam_indexed`
    (operators/cosine_threshold.py) — an exact ball-bound-pruned index
    join with identical output, which the funnel composes. r14: both
    sides' norms are precomputed once per row instead of per pair
    (sequential-fold order unchanged, so the floor-e6 values are
    bitwise identical — measured 2.9 s -> 1.4 s on the sf0.1 pair
    product)."""
    from etl_generator_demo_spark.operators.similarity import _as_double, _dot, _norm
    from etl_generator_demo_spark.operators.textops import (
        DECONTAM_MOD,
        DECONTAM_REMAINDER,
    )

    emb = t(spark, sf_dir, "embeddings")
    e = emb.select("vec_id", _as_double("embedding").alias("v"))
    is_eval = F.col("vec_id") % DECONTAM_MOD == DECONTAM_REMAINDER
    ev = F.broadcast(
        e.filter(is_eval)
        .select(F.col("v").alias("ev_v"))
        .withColumn("_ne", _norm("ev_v"))
    )
    return (
        e.filter(~is_eval)
        .withColumn("_nt", _norm("v"))
        .crossJoin(ev)
        .select(
            F.col("vec_id").alias("train_doc"),
            F.floor(
                F.try_divide(_dot("v", "ev_v"), F.col("_nt") * F.col("_ne"))
                * 1_000_000
            )
            .cast("long")
            .alias("cos_e6"),
        )
        .filter(F.col("cos_e6") >= SEMANTIC_DECONTAM_TAU_E6)
        .groupBy("train_doc")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_eval_neardups"),
            F.max("cos_e6").cast("long").alias("max_cos_e6"),
        )
        .orderBy("train_doc")
    )


# ---------------------------------------------------------------------------
# the composed three-tier decontamination funnel
# ---------------------------------------------------------------------------


def _decontam_funnel_oracle() -> str:
    from etl_generator_demo_spark.operators.dedup import (
        _DUCK_SHINGLES,
        _duck_minhash_cols,
    )
    from etl_generator_demo_spark.operators.surfaces_r12b import (
        FUZZY_DECONTAM_TAU,
    )
    from etl_generator_demo_spark.operators.textops import (
        DECONTAM_MOD,
        DECONTAM_REMAINDER,
    )

    is_eval = f"doc_id % {DECONTAM_MOD} = {DECONTAM_REMAINDER}"
    return f"""
    {_DUCK_SHINGLES},
    pop AS (
        SELECT doc_id, CAST(LEN(STRING_SPLIT(text, ' ')) AS BIGINT) AS n_tok
        FROM documents WHERE NOT ({is_eval})
    ),
    exact_flag AS (
        SELECT DISTINCT c.doc_id FROM shingles c
        WHERE NOT (c.{is_eval})
          AND c.shingle IN (SELECT shingle FROM shingles b WHERE b.{is_eval})
    ),
    sigs AS (
        SELECT doc_id, {_duck_minhash_cols()}
        FROM shingles GROUP BY doc_id
    ),
    bands AS (
        SELECT doc_id, 0 AS band_id, mh0 || mh1 || mh2 || mh3 AS band_key FROM sigs
        UNION ALL
        SELECT doc_id, 1, mh4 || mh5 || mh6 || mh7 FROM sigs
    ),
    cand AS (
        SELECT DISTINCT tr.doc_id AS train_doc, ev.doc_id AS eval_doc
        FROM bands tr
        JOIN bands ev
          ON ev.band_id = tr.band_id AND ev.band_key = tr.band_key
        WHERE NOT (tr.{is_eval}) AND ev.{is_eval}
    ),
    card AS (SELECT doc_id, COUNT(*) AS card FROM shingles GROUP BY doc_id),
    fuzzy_flag AS (
        SELECT DISTINCT i.train_doc AS doc_id FROM (
            SELECT tr.doc_id AS train_doc, ev.doc_id AS eval_doc,
                   COUNT(*) AS inter
            FROM shingles tr JOIN shingles ev ON ev.shingle = tr.shingle
            WHERE (tr.doc_id, ev.doc_id) IN (SELECT (train_doc, eval_doc) FROM cand)
            GROUP BY tr.doc_id, ev.doc_id
        ) i
        JOIN card ct ON ct.doc_id = i.train_doc
        JOIN card ce ON ce.doc_id = i.eval_doc
        WHERE CAST(i.inter AS DOUBLE) / (ct.card + ce.card - i.inter)
              >= {FUZZY_DECONTAM_TAU}
    ),
    emb AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
    sem_flag AS (
        SELECT DISTINCT tr.vec_id AS doc_id
        FROM (SELECT vec_id, v FROM emb WHERE NOT (vec_id % {DECONTAM_MOD} = {DECONTAM_REMAINDER})) tr
        CROSS JOIN (SELECT v FROM emb WHERE vec_id % {DECONTAM_MOD} = {DECONTAM_REMAINDER}) ev
        WHERE CAST(FLOOR(LIST_DOT_PRODUCT(tr.v, ev.v)
                   / (SQRT(LIST_DOT_PRODUCT(tr.v, tr.v))
                      * SQRT(LIST_DOT_PRODUCT(ev.v, ev.v)))
                   * 1000000) AS BIGINT) >= {SEMANTIC_DECONTAM_TAU_E6}
    ),
    s2 AS (SELECT * FROM pop WHERE doc_id NOT IN (SELECT doc_id FROM exact_flag)),
    s3 AS (SELECT * FROM s2 WHERE doc_id NOT IN (SELECT doc_id FROM fuzzy_flag)),
    s4 AS (SELECT * FROM s3 WHERE doc_id NOT IN (SELECT doc_id FROM sem_flag))
    SELECT stage_no, stage, n_docs, n_tokens FROM (
        SELECT CAST(1 AS BIGINT) AS stage_no, 'train_total' AS stage,
               CAST(COUNT(*) AS BIGINT) AS n_docs,
               CAST(SUM(n_tok) AS BIGINT) AS n_tokens FROM pop
        UNION ALL
        SELECT 2, 'after_exact_ngram', CAST(COUNT(*) AS BIGINT),
               CAST(SUM(n_tok) AS BIGINT) FROM s2
        UNION ALL
        SELECT 3, 'after_fuzzy_minhash', CAST(COUNT(*) AS BIGINT),
               CAST(SUM(n_tok) AS BIGINT) FROM s3
        UNION ALL
        SELECT 4, 'after_semantic_cosine', CAST(COUNT(*) AS BIGINT),
               CAST(SUM(n_tok) AS BIGINT) FROM s4
    ) ORDER BY stage_no
    """


from functools import lru_cache as _lru_cache


@_lru_cache(maxsize=None)
def _funnel_stage_cols(no: int, name: str):
    """Memoized per-stage aggregate columns (r17): fixed literals and
    names, built once per process instead of per DataFrame build."""
    return (
        F.lit(no).cast("long").alias("stage_no"),
        F.lit(name).alias("stage"),
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum("n_tok").cast("long").alias("n_tokens"),
    )


@register(
    "x4_decontam_funnel",
    oracle=_decontam_funnel_oracle(),
    survey_ids=("X4", "X2", "X3", "A2", "J5"),
)
def x4_decontam_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The composed decontamination funnel — docs and tokens surviving
    each tier of the contamination ladder, in escalation order: train
    total → exact 5-gram overlap gone (`x4_decontaminate`) → MinHash
    near-dups gone (`x4_fuzzy_decontam`) → semantic cosine hits gone
    (`x3_semantic_decontam`). The number a pretraining cut publishes:
    what each successively-fuzzier gate costs in tokens, with every
    stage reusing the registered component's exact spelling (the
    `x4_pipeline_attrition` shared-builder argument: the funnel always
    describes the gates as shipped).

    Plan: each tier's flag set is a train-doc-keyed relation (eval
    sides broadcast inside the components); survivors thread through
    left-anti joins; each stage emits one aggregate row. At 100 TB the
    funnel's cost IS the three components' cost — the anti-joins and
    rollups ride the same doc-keyed partitioning. r14: the semantic
    stage composes the INDEXED tier (`x3_semantic_decontam_indexed`,
    exact ball-bound pruning — identical flags, so this oracle is
    unchanged); the brute spelling stays registered as the audit
    path. Checkpointing the flag relations was MEASURED unnecessary
    (none 5.3 s / lazy localCheckpoint 4.97 / persist 4.8 at sf0.1 —
    within noise): Spark's ReusedExchange already computes each flag
    subtree once across the four stage branches (funnel wall time ==
    sum of its three components, not the 2-3x a recompute would
    cost)."""
    from etl_generator_demo_spark.operators.cosine_threshold import (
        semantic_decontam_flags_indexed,
    )
    from etl_generator_demo_spark.operators.surfaces_r12b import x4_fuzzy_decontam
    from etl_generator_demo_spark.operators.textops import (
        DECONTAM_MOD,
        DECONTAM_REMAINDER,
        x4_decontaminate,
    )

    docs = t(spark, sf_dir, "documents")
    is_eval = F.col("doc_id") % DECONTAM_MOD == DECONTAM_REMAINDER
    pop = docs.filter(~is_eval).select(
        "doc_id", F.size(F.split("text", " ")).cast("long").alias("n_tok")
    )
    exact_flag = x4_decontaminate(spark, sf_dir).select("doc_id")
    fuzzy_flag = x4_fuzzy_decontam(spark, sf_dir).select(
        F.col("train_doc").alias("doc_id")
    )
    sem_flag = (
        semantic_decontam_flags_indexed(spark, sf_dir)
        .select(F.col("train_doc").alias("doc_id"))
        .distinct()
    )
    s2 = pop.join(exact_flag, "doc_id", "left_anti")
    s3 = s2.join(fuzzy_flag, "doc_id", "left_anti")
    s4 = s3.join(sem_flag, "doc_id", "left_anti")

    def stage(no: int, name: str, df: DataFrame) -> DataFrame:
        return df.agg(*_funnel_stage_cols(no, name))

    return (
        stage(1, "train_total", pop)
        .unionByName(stage(2, "after_exact_ngram", s2))
        .unionByName(stage(3, "after_fuzzy_minhash", s3))
        .unionByName(stage(4, "after_semantic_cosine", s4))
        .orderBy("stage_no")
    )


def _decontam_overlap_oracle() -> str:
    """Reuses the funnel's flag CTEs, regrouped into the membership
    lattice instead of the sequential-removal stages."""
    base = _decontam_funnel_oracle()
    cut = base.index(",\n    s2 AS")
    return (
        base[:cut]
        + """
    SELECT has_exact, has_fuzzy, has_semantic,
           CAST(COUNT(*) AS BIGINT) AS n_docs
    FROM (
        SELECT p.doc_id,
               p.doc_id IN (SELECT doc_id FROM exact_flag) AS has_exact,
               p.doc_id IN (SELECT doc_id FROM fuzzy_flag) AS has_fuzzy,
               p.doc_id IN (SELECT doc_id FROM sem_flag) AS has_semantic
        FROM pop p
    )
    WHERE has_exact OR has_fuzzy OR has_semantic
    GROUP BY has_exact, has_fuzzy, has_semantic
    ORDER BY has_exact, has_fuzzy, has_semantic
    """
    )


@register(
    "x4_decontam_tier_overlap",
    oracle=_decontam_overlap_oracle(),
    survey_ids=("X4", "X2", "X3", "A1", "J5"),
)
def x4_decontam_tier_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Which decontamination gates actually fire — the membership
    lattice over the three tiers (exact 5-gram, MinHash fuzzy,
    semantic cosine): one row per non-empty (has_exact, has_fuzzy,
    has_semantic) cell with its flagged-doc count. The question the
    funnel's sequential attrition can't answer: a tier whose flags are
    a strict subset of an earlier tier's is redundant spend at 100 TB
    (the semantic pass is the expensive one — |corpus| x |eval| x dim
    flops — and this report says what it alone catches).

    Plan: the three flag relations are train-doc-keyed and flagged-
    docs-sized; three left joins onto the train population, boolean
    cell groupBy (<= 7 cells reach the final aggregate). r14: the
    semantic flags come from the exact INDEXED tier (see
    `x4_decontam_funnel` — identical flags, oracle unchanged)."""
    from etl_generator_demo_spark.operators.cosine_threshold import (
        semantic_decontam_flags_indexed,
    )
    from etl_generator_demo_spark.operators.surfaces_r12b import x4_fuzzy_decontam
    from etl_generator_demo_spark.operators.textops import (
        DECONTAM_MOD,
        DECONTAM_REMAINDER,
        x4_decontaminate,
    )

    docs = t(spark, sf_dir, "documents")
    is_eval = F.col("doc_id") % DECONTAM_MOD == DECONTAM_REMAINDER
    pop = docs.filter(~is_eval).select("doc_id")

    def flag(df: DataFrame, name: str) -> DataFrame:
        return df.select("doc_id").withColumn(name, F.lit(True))

    exact_f = flag(x4_decontaminate(spark, sf_dir), "has_exact")
    fuzzy_f = flag(
        x4_fuzzy_decontam(spark, sf_dir).select(
            F.col("train_doc").alias("doc_id")
        ),
        "has_fuzzy",
    )
    sem_f = flag(
        semantic_decontam_flags_indexed(spark, sf_dir)
        .select(F.col("train_doc").alias("doc_id"))
        .distinct(),
        "has_semantic",
    )
    return (
        pop.join(exact_f, "doc_id", "left")
        .join(fuzzy_f, "doc_id", "left")
        .join(sem_f, "doc_id", "left")
        .select(
            F.coalesce("has_exact", F.lit(False)).alias("has_exact"),
            F.coalesce("has_fuzzy", F.lit(False)).alias("has_fuzzy"),
            F.coalesce("has_semantic", F.lit(False)).alias("has_semantic"),
        )
        .filter(F.col("has_exact") | F.col("has_fuzzy") | F.col("has_semantic"))
        .groupBy("has_exact", "has_fuzzy", "has_semantic")
        .agg(F.count(F.lit(1)).cast("long").alias("n_docs"))
        .orderBy("has_exact", "has_fuzzy", "has_semantic")
    )


# ---------------------------------------------------------------------------
# dedup keep-policies beyond min-id: soft weighting and keep-best
# ---------------------------------------------------------------------------


@register(
    "x2_softdedup_weights",
    oracle="""
    WITH d AS (
        SELECT doc_id, MD5(text) AS h,
               CAST(LEN(STRING_SPLIT(text, ' ')) AS BIGINT) AS n_tokens
        FROM documents
    ),
    g AS (SELECT h, CAST(COUNT(*) AS BIGINT) AS n_copies FROM d GROUP BY h)
    SELECT d.doc_id, g.n_copies,
           CAST(1000000 // g.n_copies AS BIGINT) AS weight_e6,
           d.n_tokens
    FROM d JOIN g USING (h)
    ORDER BY d.doc_id
    """,
    survey_ids=("X1", "X4", "A1", "J1"),
)
def x2_softdedup_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SoftDeDup — keep every duplicate but DOWNWEIGHT it: each doc's
    sampling weight is 1/n_copies of its exact-content group, so a
    family of k byte-identical copies contributes one document's worth
    of expected tokens instead of k (the reweight-don't-delete policy:
    preserves long-tail coverage the hard-removal tier destroys while
    still flattening the duplicated-content spike). Output: doc →
    multiplicity, e6 weight, token count — the columns a weighted
    sampler joins on.

    Plan: one content-hash groupBy (map-combined) + one co-keyed join
    back on the hash — the `x1_dedup_exact` shuffle plus a join that
    reuses the same key partitioning. Θ(corpus) output by definition
    (it annotates the corpus)."""
    docs = t(spark, sf_dir, "documents")
    d = docs.select(
        "doc_id",
        F.md5("text").alias("h"),
        F.size(F.split("text", " ")).cast("long").alias("n_tokens"),
    )
    g = d.groupBy("h").agg(F.count(F.lit(1)).cast("long").alias("n_copies"))
    return (
        d.join(g, "h")
        .select(
            "doc_id",
            "n_copies",
            F.expr("CAST(1000000 div n_copies AS LONG)").alias("weight_e6"),
            "n_tokens",
        )
        .orderBy("doc_id")
    )


@register(
    "x1_dedup_keep_best",
    oracle="""
    WITH d AS (
        SELECT doc_id, n_chars,
               MD5(LOWER(REGEXP_REPLACE(TRIM(text), '\\s+', ' ', 'g'))) AS h
        FROM documents
    ),
    r AS (
        SELECT h, doc_id, n_chars,
               ROW_NUMBER() OVER (PARTITION BY h
                                  ORDER BY n_chars DESC, doc_id) AS rn,
               COUNT(*) OVER (PARTITION BY h) AS n_copies
        FROM d
    )
    SELECT h AS norm_hash, doc_id AS keep_id,
           CAST(n_chars AS BIGINT) AS keep_n_chars,
           CAST(n_copies AS BIGINT) AS n_copies
    FROM r WHERE rn = 1
    ORDER BY keep_id
    """,
    survey_ids=("X1", "W1"),
)
def x1_dedup_keep_best(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup with a QUALITY keep-policy: within each
    normalized-content group (the `x1_dedup_normalized` key: casefold,
    trim, collapse whitespace) keep the RICHEST raw variant — max
    n_chars, doc_id tiebreak — instead of the arbitrary min-id. The
    policy production dedup actually ships (keep the longest/
    best-formatted copy; the whitespace-mangled mirrors lose), and the
    normalized key is what makes the choice non-degenerate: raw texts
    in one group genuinely differ.

    Plan: one scan; the selection is a hash-PARTITIONED row_number
    (parallel by group — never a global window) over the same single
    shuffle `x1_dedup_normalized` pays."""
    from pyspark.sql import Window

    docs = t(spark, sf_dir, "documents")
    norm = F.md5(F.lower(F.regexp_replace(F.trim(F.col("text")), r"\s+", " ")))
    w = Window.partitionBy("h").orderBy(F.desc("n_chars"), "doc_id")
    return (
        docs.select("doc_id", "n_chars", norm.alias("h"))
        .withColumn("rn", F.row_number().over(w))
        .withColumn(
            "n_copies",
            F.count(F.lit(1)).over(Window.partitionBy("h")).cast("long"),
        )
        .filter(F.col("rn") == 1)
        .select(
            F.col("h").alias("norm_hash"),
            F.col("doc_id").alias("keep_id"),
            F.col("n_chars").cast("long").alias("keep_n_chars"),
            "n_copies",
        )
        .orderBy("keep_id")
    )


# ---------------------------------------------------------------------------
# pre-filter selectivity sweep — recall stability across filter widths
# ---------------------------------------------------------------------------

#: Swept filter widths: the predicate keeps k of the L labels
#: (modular band around the query's own label), i.e. ~k/L of the
#: corpus qualifies.
PREFILTER_SEL_ARMS = (1, 2, 5)

#: Verdict floor for the sweep — DELIBERATELY below the single-arm
#: query's 0.3: measured per-arm recall on the uniform-random fixture
#: is 0.3–0.7 across both SFs (min sits exactly at 0.3), and the
#: sweep's claim is recall STABILITY across selectivity, not absolute
#: level. The post-filter sibling at m=1 on the same 10%-selective
#: predicate keeps ~0.24 and collapses further as the filter narrows.
PREFILTER_SWEEP_FLOOR = 0.2


def _prefilter_sweep_oracle() -> str:
    arms = []
    for k in PREFILTER_SEL_ARMS:
        arms.append(f"""
        SELECT CAST({k} AS BIGINT) AS arm_k,
               (SELECT CAST(COUNT(*) AS BIGINT) FROM e CROSS JOIN q CROSS JOIN l
                WHERE ((e.label - q.qlabel) % l.L + l.L) % l.L < {k})
                   AS n_qualifying,
               TRUE AS prefilter_recall_ge_020""")
    union = "\n        UNION ALL\n".join(arms)
    return f"""
    WITH q AS (
        SELECT label AS qlabel FROM embeddings WHERE vec_id = 0
    ),
    l AS (SELECT CAST(COUNT(DISTINCT label) AS BIGINT) AS L FROM embeddings),
    e AS (SELECT vec_id, label FROM embeddings WHERE vec_id <> 0)
    SELECT * FROM ({union}) ORDER BY arm_k
    """


@register(
    "x3_prefilter_selectivity_sweep",
    oracle=_prefilter_sweep_oracle(),
    survey_ids=("X3",),
)
def x3_prefilter_selectivity_sweep(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pre-filter filtered-ANN recall across predicate SELECTIVITY —
    the property the post-filter sweep showed failing: as the filter
    narrows (keep 5 → 2 → 1 of the L labels), over-fetch-then-filter
    recall collapses toward k·m·selectivity, while the pre-filter
    probe ranks only qualifying rows and holds its IVF recall at every
    width. Per arm: the exact qualifying-population size (DuckDB
    value-verifies it) and the bounded-error recall verdict of the
    pruned+pushed probe against the exact pre-filtered top-10.

    The filter is a modular label band around the query's own label
    (k of L labels ≈ k/L of the corpus), spelled identically in the
    probe's `where` pushdown, the exact tier, and the oracle.

    100 TB: each arm is one pruned index scan (n_probe/n_lists of the
    index, label band pushed into the row groups) + a bounded rank —
    the sweep costs |arms| probes, never |arms| corpus scans.

    Plan-time driver work (r13 advice): one indexed ``.first()`` for
    the query vector, one |labels|-bounded ``distinct().count()`` for
    L, and the first-touch IVF build. The L count CANNOT fold into the
    plan as a lazy 1-row broadcast without losing the sweep's point:
    the modular label band must be a LITERAL predicate string so it
    pushes into the pruned index scan (PushedFilters) and prices the
    pre-filter arm honestly — a join-carried L would turn the pushed
    filter into a join condition evaluated after the scan. Plan-only
    consumers pay these driver actions at construction time."""
    from etl_generator_demo_spark.operators.ann_index import ivf_probe_topk
    from etl_generator_demo_spark.operators.similarity import brute_force_topk

    emb = t(spark, sf_dir, "embeddings")
    row0 = emb.filter(F.col("vec_id") == 0).select("embedding", "label").first()
    query_vec = [float(x) for x in row0["embedding"]]
    qlabel = int(row0["label"])
    n_labels = emb.select("label").distinct().count()  # |labels|-bounded
    parts = []
    for k in PREFILTER_SEL_ARMS:
        cond = (
            f"((label - {qlabel}) % {n_labels} + {n_labels}) % {n_labels} < {k}"
        )
        qualifying = emb.filter(f"vec_id <> 0 AND {cond}")
        exact = brute_force_topk(qualifying, query_vec, k=10)
        pre_ids = ivf_probe_topk(
            spark, sf_dir, query_vec, k=10, n_probe=4, exclude_ids=(0,),
            where=cond,
        ).select("vec_id")
        verdict = (
            exact.select("vec_id")
            .join(pre_ids, "vec_id")
            .agg(
                (
                    F.count(F.lit(1)) / F.lit(10.0) >= PREFILTER_SWEEP_FLOOR
                ).alias("prefilter_recall_ge_020")
            )
        )
        nq = qualifying.agg(
            F.count(F.lit(1)).cast("long").alias("n_qualifying")
        )
        parts.append(
            nq.crossJoin(F.broadcast(verdict)).select(
                F.lit(k).cast("long").alias("arm_k"),
                "n_qualifying",
                "prefilter_recall_ge_020",
            )
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out.orderBy("arm_k")
