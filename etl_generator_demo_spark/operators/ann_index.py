"""Persisted ANN indexes — the scale path for SURVEY.md §2.12 X3.

Round-1 registered the ANN queries as per-query work: the LSH probe
re-scanned the full corpus through ``mapInPandas`` and the IVF query
re-trained k-means on every invocation. This module makes the index a
*materialized artifact* instead, which is how both structures actually
run at 100 TB:

- **LSH index**: every vector's bucket id in each of L hash tables is
  computed ONCE (vectorized numpy over Arrow batches) and written as
  parquet **partitioned by (lsh_table, bucket)**. A query computes its
  own L bucket ids driver-side (L*P dot products on one vector) and
  probes with an OR-of-equalities filter on the two partition columns —
  Spark's partition pruning turns that into "read L directories",
  never a corpus scan. Candidates are deduped and exactly re-ranked
  with the JVM cosine expression.
- **IVF index**: the k-means coarse quantizer trains once, the list
  assignment is written as parquet **partitioned by ivf_list**, and the
  centroids (a few KB) land next to it as JSON. A query ranks the
  centroids driver-side and scans only the ``n_probe`` nearest list
  partitions (partition pruning again), then exactly re-ranks.

Cost model at scale: index build is one linear pass (plus one shuffle
for the partitioned write); each query touches
``O(candidates)`` rows instead of ``O(corpus)``. Storage is L× for
LSH (the standard multi-table trade) and 1× for IVF. On a real
cluster the same layout lands in the table format's partition spec;
here it lives in a local cache directory keyed by corpus
fingerprint (path+size+mtime), so a regenerated fixture rebuilds
automatically and repeated queries — the driver's correctness run,
bench.py's min-of-2 — reuse the artifact.

No reference counterpart (the reference delegates everything to
PostgreSQL); north-star semantics per BASELINE.json / SURVEY §2.12.
"""

from __future__ import annotations

import hashlib
import json
import os

from pyspark.sql import DataFrame, SparkSession
from etl_generator_demo_spark.catalog import read_parquet_known
from pyspark.sql import functions as F

from etl_generator_demo_spark.operators.similarity import (
    DIM,
    _as_double,
    _duck_bucket_expr,
    _floor6,
    _hyperplane,
    cosine,
    cosine_asdouble_cols,
    cosine_lit,
)
from etl_generator_demo_spark.registry import register

#: On-disk cache root. Lives inside the repo (gitignored) so any
#: process — pytest, bench.py, the external driver — shares one cache
#: regardless of cwd.
INDEX_ROOT = os.path.join(os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))), ".index_cache")

LSH_TABLES = 8
LSH_PLANES = 4
IVF_LISTS = 16


def _corpus_fingerprint(sf_dir: str, table: str = "embeddings") -> str:
    """Fingerprint the source parquet so a regenerated fixture (same
    path, new contents) invalidates the cache."""
    p = os.path.join(os.path.abspath(sf_dir), f"{table}.parquet")
    try:
        st = os.stat(p)
        raw = f"{p}|{st.st_size}|{int(st.st_mtime)}"
    except OSError:
        raw = p
    return hashlib.md5(raw.encode()).hexdigest()[:12]


def _index_dir(sf_dir: str, kind: str, tag: str) -> str:
    return os.path.join(INDEX_ROOT, _corpus_fingerprint(sf_dir), f"{kind}_{tag}")


def _is_built(path: str) -> bool:
    # _SUCCESS, not the directory: a crashed build leaves a partial dir
    # (and background-shell /tmp isolation makes bare-dir checks lie).
    return os.path.exists(os.path.join(path, "_SUCCESS"))


# --- LSH ------------------------------------------------------------------

def build_lsh_index(
    vectors: DataFrame,
    out_dir: str,
    tables: int = LSH_TABLES,
    planes: int = LSH_PLANES,
    dim: int = DIM,
) -> None:
    """One vectorized pass: for each row emit `tables` rows
    (vec_id, label, embedding, lsh_table, bucket) and write them
    partitioned by (lsh_table, bucket).

    The bucket test is an Arrow-batched numpy matmul (tables*planes
    dot products per row) — the kernel where vectorized BLAS beats
    Spark's interpreted higher-order-function expressions ~5×. The
    closure is self-contained (plain-data capture, local numpy
    import) so executor workers need no package imports.
    """
    plane_rows = [
        _hyperplane(tbl, p, dim) for tbl in range(tables) for p in range(planes)
    ]  # (tables*planes) x dim
    n_tables, n_planes = tables, planes

    def assign(batches):
        import numpy as _np
        import pandas as _pd

        P = _np.asarray(plane_rows, dtype="float64").T  # dim x (tables*planes)
        for pdf in batches:
            if not len(pdf):
                continue
            V = _np.stack(pdf["embedding"].to_numpy()).astype("float64")
            S = (V @ P) >= 0  # n x (tables*planes)
            frames = []
            for tbl in range(n_tables):
                bits = S[:, tbl * n_planes : (tbl + 1) * n_planes]
                # 'b' prefix keeps partition discovery from type-inferring
                # the bit string as an integer (dropping leading zeros).
                bucket = ["b" + "".join("1" if b else "0" for b in row) for row in bits.tolist()]
                f = pdf.copy()
                f["lsh_table"] = tbl
                f["bucket"] = bucket
                frames.append(f)
            yield _pd.concat(frames, ignore_index=True)

    from pyspark.sql.types import IntegerType, StringType, StructField, StructType

    schema = StructType(
        list(vectors.schema.fields)
        + [StructField("lsh_table", IntegerType()), StructField("bucket", StringType())]
    )
    indexed = vectors.mapInPandas(assign, schema)
    # tables*16 buckets of output; repartition by the partition columns so
    # each (table, bucket) directory is written by one task, not 32.
    (
        indexed.repartition("lsh_table", "bucket")
        .write.mode("overwrite")
        .partitionBy("lsh_table", "bucket")
        .parquet(out_dir)
    )


def ensure_lsh_index(
    spark: SparkSession,
    sf_dir: str,
    tables: int = LSH_TABLES,
    planes: int = LSH_PLANES,
) -> str:
    """Build the LSH index for this corpus if the cache is cold; return
    its path. Idempotent and cheap when warm (one stat call)."""
    from etl_generator_demo_spark.operators.relational import t

    path = _index_dir(sf_dir, "lsh", f"t{tables}p{planes}v2")
    if not _is_built(path):
        build_lsh_index(t(spark, sf_dir, "embeddings"), path, tables, planes)
    return path


def query_buckets(query_vec: list[float], tables: int = LSH_TABLES, planes: int = LSH_PLANES) -> list[str]:
    """Driver-side bucket ids of one query vector — tables*planes dot
    products on a single vector, microseconds."""
    import numpy as np

    qv = np.asarray(query_vec, dtype="float64")
    dim = len(query_vec)
    out = []
    for tbl in range(tables):
        bits = [
            "1" if float(np.dot(qv, np.asarray(_hyperplane(tbl, p, dim)))) >= 0 else "0"
            for p in range(planes)
        ]
        out.append("b" + "".join(bits))
    return out


def lsh_probe_topk(
    spark: SparkSession,
    sf_dir: str,
    query_vec: list[float],
    k: int = 10,
    tables: int = LSH_TABLES,
    planes: int = LSH_PLANES,
    exclude_ids: tuple[int, ...] = (),
) -> DataFrame:
    """ANN top-k via the persisted index: a partition-pruned scan of the
    query's L buckets, dedupe, exact JVM cosine re-rank. No Python runs
    on the executors and no non-candidate row is read.

    The read lists ONLY the L probed bucket directories (basePath keeps
    the partition columns) instead of discovering all tables×2^planes
    directories — at toy scale that discovery dominated the probe
    (bench r2: 0.79 s → ~0.45 s), and on an object store at 100 TB
    per-query listing of every partition is exactly the overhead a
    probe must not pay. The equality filter stays on top: it is a no-op
    on the pruned paths but keeps the plan's PartitionFilters explicit
    (asserted in tests) and guards against a stale directory listing.
    """
    path = ensure_lsh_index(spark, sf_dir, tables, planes)
    buckets = query_buckets(query_vec, tables, planes)
    probe_dirs = [
        d
        for tbl, bucket in enumerate(buckets)
        if os.path.isdir(d := os.path.join(path, f"lsh_table={tbl}", f"bucket={bucket}"))
    ]
    if not probe_dirs:  # every probed bucket empty -> no candidates
        empty = spark.read.parquet(path).limit(0)
        return empty.withColumn("cosine", F.lit(0.0)).limit(0)
    idx = spark.read.option("basePath", path).parquet(*probe_dirs)
    # one parsed OR-expression instead of ~10 py4j round trips per
    # table (r17; bucket ids are engine-generated 'b<bits>' strings,
    # safe to inline) — same predicate, same pushdown
    cond = " OR ".join(
        f"(lsh_table = {tbl} AND bucket = '{bucket}')"
        for tbl, bucket in enumerate(buckets)
    )
    candidates = idx.filter(cond)
    if exclude_ids:
        candidates = candidates.filter(~F.col("vec_id").isin(list(exclude_ids)))
    # Rank BEFORE deduping: a vector appears in <= `tables` buckets with
    # the identical cosine, so the top k*tables ranked copies are
    # guaranteed to contain >= k distinct vectors. The global rank
    # compiles to one TakeOrderedAndProject over the pruned scan (no
    # full shuffle); the dedup then touches <= k*tables rows instead of
    # exchanging every candidate.
    ranked = (
        candidates.withColumn("cosine", _floor6(cosine_lit("embedding", query_vec)))
        .orderBy(F.desc("cosine"), "vec_id")
        .limit(k * tables)
    )
    return (
        ranked.dropDuplicates(["vec_id"])
        .orderBy(F.desc("cosine"), "vec_id")
        .limit(k)
    )


# --- IVF ------------------------------------------------------------------

def ensure_ivf_index(
    spark: SparkSession, sf_dir: str, n_lists: int = IVF_LISTS, seed: int = 42
) -> tuple[str, list[list[float]]]:
    """Train the coarse quantizer once per corpus, persist the list
    assignment partitioned by ivf_list plus the centroids as JSON;
    return (path, centroids). Warm calls read only the JSON.

    At 100 TB the quantizer trains on a sample (k-means cost is
    per-point; a 1M-row sample pins the same centroids) and the
    assignment pass stays linear; the fixture corpus is small enough
    to train on directly.
    """
    from etl_generator_demo_spark.operators.relational import t
    from etl_generator_demo_spark.operators.similarity import build_ivf_index

    path = _index_dir(sf_dir, "ivf", f"l{n_lists}")
    cj = os.path.join(path, "_CENTROIDS.json")
    if _is_built(path) and os.path.exists(cj):
        with open(cj) as fh:
            return path, json.load(fh)
    assigned, centroids = build_ivf_index(
        t(spark, sf_dir, "embeddings"), n_lists=n_lists, seed=seed
    )
    (
        assigned.repartition("ivf_list")
        .write.mode("overwrite")
        .partitionBy("ivf_list")
        .parquet(path)
    )
    with open(cj, "w") as fh:
        json.dump(centroids, fh)
    return path, centroids


def ivf_probe_topk(
    spark: SparkSession,
    sf_dir: str,
    query_vec: list[float],
    k: int = 10,
    n_lists: int = IVF_LISTS,
    n_probe: int = 4,
    exclude_ids: tuple[int, ...] = (),
    where: str | None = None,
) -> DataFrame:
    """IVF top-k via the persisted index: rank centroids driver-side,
    partition-pruned scan of the n_probe nearest lists, exact re-rank.

    ``where`` is the PRE-FILTER arm of filtered vector search (r12
    verdict item 5): the predicate is applied to the index relation
    BEFORE ranking, so Catalyst pushes it into the pruned parquet scan
    (PushedFilters next to the ivf_list PartitionFilters — asserted by
    tools/plan_audit.py) and the top-k ranks only qualifying rows. The
    post-filter alternative (over-fetch k*m then filter) loses recall
    when the predicate is selective — measured by
    `x3_filtered_topk_postfilter_sweep`."""
    import numpy as np

    path, centroids = ensure_ivf_index(spark, sf_dir, n_lists)
    q = np.asarray(query_vec, dtype="float64")
    dists = [float(np.linalg.norm(q - np.asarray(c))) for c in centroids]
    probe = sorted(range(len(centroids)), key=lambda i: dists[i])[:n_probe]
    idx = read_parquet_known(spark, path).filter(F.col("ivf_list").isin(probe))
    if where:
        idx = idx.filter(where)
    if exclude_ids:
        idx = idx.filter(~F.col("vec_id").isin(list(exclude_ids)))
    return (
        idx.withColumn("cosine", _floor6(cosine_lit("embedding", query_vec)))
        .orderBy(F.desc("cosine"), "vec_id")
        .limit(k)
    )


# ===========================================================================
# Driver-checkable query: the probe itself, hash-exact
# ===========================================================================

def _lsh_probe_oracle(tables: int, planes: int) -> str:
    """Exact DuckDB replica of the LSH probe: candidates = corpus rows
    sharing the query's bucket in ANY table (same md5-derived
    hyperplanes, inlined as literals on both the corpus and the query
    vector), then the identical floor-scaled cosine re-rank."""
    match = " OR ".join(
        f"({_duck_bucket_expr(tbl, planes, col='e.v')}"
        f" = {_duck_bucket_expr(tbl, planes, col='q.qv')})"
        for tbl in range(tables)
    )
    return f"""
    WITH q AS (
        SELECT embedding::DOUBLE[] AS qv FROM embeddings WHERE vec_id = 0
    ),
    e AS (
        SELECT vec_id, label, embedding::DOUBLE[] AS v
        FROM embeddings WHERE vec_id <> 0
    ),
    cand AS (
        SELECT e.vec_id, e.label, e.v, q.qv FROM e, q
        WHERE {match}
    )
    SELECT vec_id, label,
           FLOOR(LIST_DOT_PRODUCT(v, qv)
                 / (SQRT(LIST_DOT_PRODUCT(v, v)) * SQRT(LIST_DOT_PRODUCT(qv, qv)))
                 * 1000000) / 1000000 AS cosine
    FROM cand
    ORDER BY cosine DESC, vec_id
    LIMIT 10
    """


@register(
    "x3_ann_lsh_probe",
    oracle=_lsh_probe_oracle(LSH_TABLES, LSH_PLANES),
    survey_ids=("X3",),
)
def x3_ann_lsh_probe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The PRODUCTION ANN path, hash-exact: top-10 for vec_id=0 via the
    persisted partition-pruned LSH index — only the query's 8 bucket
    directories are read, never the corpus. Unlike the bounded-error
    ``x3_ann_lsh_topk`` verdict query (which computes the exact
    brute-force answer to prove a recall floor), this registers the
    probe OUTPUT itself: DuckDB recomputes the same candidate set from
    the same hyperplane constants, so the approximate result is
    value-checked row for row. This is also the query bench.py times —
    the benched ANN number measures the probe, not a full scan."""
    from etl_generator_demo_spark.operators.relational import t

    emb = t(spark, sf_dir, "embeddings")
    query_vec = [
        float(x)
        for x in emb.filter(F.col("vec_id") == 0).select("embedding").first()["embedding"]
    ]
    return lsh_probe_topk(spark, sf_dir, query_vec, k=10, exclude_ids=(0,)).select(
        "vec_id", "label", "cosine"
    )


def lsh_probe_batch_topk(
    spark: SparkSession,
    sf_dir: str,
    query_vecs: dict[int, list[float]],
    k: int = 3,
    tables: int = LSH_TABLES,
    planes: int = LSH_PLANES,
    min_corpus_id: int = 0,
) -> DataFrame:
    """Batched ANN against the persisted LSH index: ONE partition-pruned
    scan serves every query in the batch. The (qid, lsh_table, bucket)
    probe relation and the query vectors are broadcast (a batch is
    thousands of rows; the corpus is the big side); candidates join on
    the partition columns, dedupe per (qid, vec_id), and re-rank with
    one per-qid window. This is the serving shape at 100 TB — per-query
    driver loops would issue |batch| scans; this plan issues one."""
    path = ensure_lsh_index(spark, sf_dir, tables, planes)
    probe_rows = [
        (qid, tbl, bucket)
        for qid, qv in query_vecs.items()
        for tbl, bucket in enumerate(query_buckets(qv, tables, planes))
    ]
    probe = spark.createDataFrame(probe_rows, "qid long, lsh_table int, bucket string")
    dirs = sorted(
        {
            d
            for _, tbl, bucket in probe_rows
            if os.path.isdir(d := os.path.join(path, f"lsh_table={tbl}", f"bucket={bucket}"))
        }
    )
    if not dirs:
        empty = spark.read.parquet(path).limit(0)
        return empty.select(
            F.lit(0).cast("long").alias("qid"), "vec_id", F.lit(0.0).alias("cosine")
        ).limit(0)
    idx = spark.read.option("basePath", path).parquet(*dirs)
    qdf = spark.createDataFrame(
        [(qid, [float(x) for x in qv]) for qid, qv in query_vecs.items()],
        "qid long, qv array<double>",
    )
    cand = (
        idx.filter(F.col("vec_id") >= min_corpus_id)
        .join(F.broadcast(probe), ["lsh_table", "bucket"])
        .dropDuplicates(["qid", "vec_id"])
        .join(F.broadcast(qdf), "qid")
    )
    from pyspark.sql import Window

    w = Window.partitionBy("qid").orderBy(F.desc("cosine"), "vec_id")
    return (
        cand.withColumn("cosine", _floor6(cosine_asdouble_cols("embedding", "qv")))
        .withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= k)
        .select("qid", "vec_id", "cosine")
    )


def _lsh_batch_probe_oracle(tables: int, planes: int, n_query: int, k: int) -> str:
    match = " OR ".join(
        f"({_duck_bucket_expr(tbl, planes, col='e.v')}"
        f" = {_duck_bucket_expr(tbl, planes, col='q.qv')})"
        for tbl in range(tables)
    )
    return f"""
    WITH q AS (
        SELECT vec_id AS qid, embedding::DOUBLE[] AS qv
        FROM embeddings WHERE vec_id < {n_query}
    ),
    e AS (
        SELECT vec_id, embedding::DOUBLE[] AS v
        FROM embeddings WHERE vec_id >= {n_query}
    ),
    cand AS (
        SELECT q.qid, e.vec_id, e.v, q.qv FROM e, q
        WHERE {match}
    ),
    scored AS (
        SELECT qid, vec_id,
               FLOOR(LIST_DOT_PRODUCT(v, qv)
                     / (SQRT(LIST_DOT_PRODUCT(v, v)) * SQRT(LIST_DOT_PRODUCT(qv, qv)))
                     * 1000000) / 1000000 AS cosine
        FROM cand
    ),
    ranked AS (
        SELECT qid, vec_id, cosine,
               ROW_NUMBER() OVER (PARTITION BY qid
                                  ORDER BY cosine DESC, vec_id) AS rk
        FROM scored
    )
    SELECT qid, vec_id, cosine FROM ranked WHERE rk <= {k}
    ORDER BY qid, cosine DESC, vec_id
    """


#: mirror x3_ann_batch_topk's fixture split (queries 0..4, corpus 5+)
BATCH_PROBE_NQ, BATCH_PROBE_K = 5, 3


@register(
    "x3_ann_batch_probe",
    oracle=_lsh_batch_probe_oracle(LSH_TABLES, LSH_PLANES, BATCH_PROBE_NQ, BATCH_PROBE_K),
    survey_ids=("X3",),
)
def x3_ann_batch_probe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batched retrieval through the persisted index, hash-exact: the
    first 5 vectors play the query batch against the 5+ corpus, ONE
    pruned scan + broadcast probe relation serves all of them (compare
    ``x3_ann_batch_topk``, the exact brute-force tier of the same
    split). DuckDB recomputes every query's candidate set from the
    same hyperplane constants, so the approximate batch result is
    value-checked row for row."""
    from etl_generator_demo_spark.operators.relational import t

    emb = t(spark, sf_dir, "embeddings")
    qvs = {
        r["vec_id"]: [float(x) for x in r["embedding"]]
        for r in emb.filter(F.col("vec_id") < BATCH_PROBE_NQ)
        .select("vec_id", "embedding")
        .collect()
    }
    return lsh_probe_batch_topk(
        spark, sf_dir, qvs, k=BATCH_PROBE_K, min_corpus_id=BATCH_PROBE_NQ
    ).orderBy("qid", F.desc("cosine"), "vec_id")


# --- multi-probe LSH -------------------------------------------------------

def multiprobe_buckets(
    query_vec: list[float], tables: int = LSH_TABLES, planes: int = LSH_PLANES
) -> list[list[str]]:
    """Per-table probe sequence: the exact bucket plus every hamming-1
    perturbation (each sign bit flipped once) — Lv et al. 2007's
    multi-probe idea in its simplest deterministic form. (1+planes)
    buckets per table recover most of the recall extra tables would
    buy, WITHOUT growing the index: the trade is probe fan-out for
    index storage."""
    exact = query_buckets(query_vec, tables, planes)
    out = []
    for b in exact:
        bits = b[1:]  # strip the 'b' prefix
        probes = [b] + [
            "b" + bits[:p] + ("0" if bits[p] == "1" else "1") + bits[p + 1 :]
            for p in range(planes)
        ]
        out.append(probes)
    return out


def lsh_multiprobe_topk(
    spark: SparkSession,
    sf_dir: str,
    query_vec: list[float],
    k: int = 10,
    tables: int = LSH_TABLES,
    planes: int = LSH_PLANES,
    exclude_ids: tuple[int, ...] = (),
) -> DataFrame:
    """Multi-probe ANN top-k over the SAME persisted index as
    `lsh_probe_topk`: reads the (1+planes)·tables probed bucket
    directories (partition-pruned), exact JVM cosine re-rank. Strictly
    higher recall than single-probe at ~5× the (tiny) probe I/O."""
    path = ensure_lsh_index(spark, sf_dir, tables, planes)
    per_table = multiprobe_buckets(query_vec, tables, planes)
    probe_dirs = [
        d
        for tbl, buckets in enumerate(per_table)
        for bucket in buckets
        if os.path.isdir(d := os.path.join(path, f"lsh_table={tbl}", f"bucket={bucket}"))
    ]
    if not probe_dirs:
        empty = spark.read.parquet(path).limit(0)
        return empty.withColumn("cosine", F.lit(0.0)).limit(0)
    idx = spark.read.option("basePath", path).parquet(*probe_dirs)
    cond = " OR ".join(
        "(lsh_table = {} AND bucket IN ({}))".format(
            tbl, ", ".join(f"'{b}'" for b in buckets)
        )
        for tbl, buckets in enumerate(per_table)
    )
    candidates = idx.filter(cond)
    if exclude_ids:
        candidates = candidates.filter(~F.col("vec_id").isin(list(exclude_ids)))
    n_probes = tables * (1 + planes)
    ranked = (
        candidates.withColumn("cosine", _floor6(cosine_lit("embedding", query_vec)))
        .orderBy(F.desc("cosine"), "vec_id")
        .limit(k * n_probes)
    )
    return (
        ranked.dropDuplicates(["vec_id"])
        .orderBy(F.desc("cosine"), "vec_id")
        .limit(k)
    )


def _duck_bit_expr(table: int, plane: int, dim: int, col: str) -> str:
    from etl_generator_demo_spark.operators.similarity import _hyperplane

    lits = ", ".join(f"{x:.1f}" for x in _hyperplane(table, plane, dim))
    return (
        f"(CASE WHEN LIST_DOT_PRODUCT({col}, [{lits}]::DOUBLE[]) >= 0 "
        f"THEN 1 ELSE 0 END)"
    )


def _lsh_multiprobe_oracle(tables: int, planes: int) -> str:
    """Candidates = corpus rows whose bucket is within hamming distance
    1 of the query's bucket in ANY table — the exact relational form of
    the flip-one-bit probe sequence."""
    from etl_generator_demo_spark.operators.similarity import DIM

    per_table = " OR ".join(
        "("
        + " + ".join(
            f"CASE WHEN {_duck_bit_expr(tbl, p, DIM, 'e.v')}"
            f" <> {_duck_bit_expr(tbl, p, DIM, 'q.qv')} THEN 1 ELSE 0 END"
            for p in range(planes)
        )
        + ") <= 1"
        for tbl in range(tables)
    )
    return f"""
    WITH q AS (
        SELECT embedding::DOUBLE[] AS qv FROM embeddings WHERE vec_id = 0
    ),
    e AS (
        SELECT vec_id, label, embedding::DOUBLE[] AS v
        FROM embeddings WHERE vec_id <> 0
    ),
    cand AS (
        SELECT e.vec_id, e.label, e.v, q.qv FROM e, q
        WHERE {per_table}
    )
    SELECT vec_id, label,
           FLOOR(LIST_DOT_PRODUCT(v, qv)
                 / (SQRT(LIST_DOT_PRODUCT(v, v)) * SQRT(LIST_DOT_PRODUCT(qv, qv)))
                 * 1000000) / 1000000 AS cosine
    FROM cand
    ORDER BY cosine DESC, vec_id
    LIMIT 10
    """


@register(
    "x3_ann_lsh_multiprobe",
    oracle=_lsh_multiprobe_oracle(LSH_TABLES, LSH_PLANES),
    survey_ids=("X3",),
)
def x3_ann_lsh_multiprobe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-probe LSH top-10 for vec_id=0, hash-exact like
    `x3_ann_lsh_probe`: DuckDB recomputes the hamming≤1 candidate set
    from the same hyperplane constants, so the widened probe's output
    is value-checked row for row (not just a recall flag)."""
    from etl_generator_demo_spark.operators.relational import t

    emb = t(spark, sf_dir, "embeddings")
    query_vec = [
        float(x)
        for x in emb.filter(F.col("vec_id") == 0).select("embedding").first()["embedding"]
    ]
    return lsh_multiprobe_topk(spark, sf_dir, query_vec, k=10, exclude_ids=(0,)).select(
        "vec_id", "label", "cosine"
    )


RECALL_KS = (1, 5, 10, 20)


def _lsh_recall_oracle(tables: int, planes: int) -> str:
    from etl_generator_demo_spark.operators.similarity import DIM  # noqa: F401

    match = " OR ".join(
        f"({_duck_bucket_expr(tbl, planes, col='e.v')}"
        f" = {_duck_bucket_expr(tbl, planes, col='q.qv')})"
        for tbl in range(tables)
    )
    ks = ", ".join(str(k) for k in RECALL_KS)
    return f"""
    WITH q AS (
        SELECT embedding::DOUBLE[] AS qv FROM embeddings WHERE vec_id = 0
    ),
    e AS (
        SELECT vec_id, embedding::DOUBLE[] AS v
        FROM embeddings WHERE vec_id <> 0
    ),
    scored AS (
        SELECT e.vec_id,
               FLOOR(LIST_DOT_PRODUCT(e.v, q.qv)
                     / (SQRT(LIST_DOT_PRODUCT(e.v, e.v))
                        * SQRT(LIST_DOT_PRODUCT(q.qv, q.qv)))
                     * 1000000) / 1000000 AS cos6,
               ({match}) AS is_cand
        FROM e, q
    ),
    ranked AS (
        SELECT vec_id, is_cand,
               ROW_NUMBER() OVER (ORDER BY cos6 DESC, vec_id) AS exact_rk,
               CASE WHEN is_cand THEN ROW_NUMBER() OVER (
                   PARTITION BY is_cand ORDER BY cos6 DESC, vec_id)
               END AS cand_rk
        FROM scored
    ),
    ks AS (SELECT UNNEST([{ks}]) AS k)
    SELECT CAST(ks.k AS BIGINT) AS k,
           CAST(SUM(CASE WHEN r.exact_rk <= ks.k AND r.cand_rk IS NOT NULL
                         AND r.cand_rk <= ks.k THEN 1 ELSE 0 END) AS BIGINT)
               AS n_hits,
           CAST(SUM(CASE WHEN r.exact_rk <= ks.k AND r.cand_rk IS NOT NULL
                         AND r.cand_rk <= ks.k THEN 1 ELSE 0 END)
                * 1000000 // ks.k AS BIGINT) AS recall_e6
    FROM ks CROSS JOIN ranked r
    GROUP BY ks.k
    ORDER BY ks.k
    """


@register(
    "x3_ann_recall_curve",
    oracle=_lsh_recall_oracle(LSH_TABLES, LSH_PLANES),
    survey_ids=("X3",),
)
def x3_ann_recall_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recall@k curve of the single-probe LSH path vs exact search, for
    k ∈ {1, 5, 10, 20} — the eval every ANN deployment publishes before
    choosing (tables, planes, probes). A top-k exact neighbor counts as
    recalled when it appears in the candidate set's own top-k (the
    result the probe would actually return). All counts are integers,
    recall in e6 fixed-point; the candidate set is recomputed by the
    oracle from the same hyperplane constants, so the curve itself is
    hash-exact — not a self-reported metric.

    One corpus pass scores cosine + candidate membership together; two
    rank windows (global + candidate-only) and a tiny k-grid join
    finish it."""
    from etl_generator_demo_spark.operators.relational import t
    from etl_generator_demo_spark.operators.similarity import (
        _as_double,
        _floor6,
        cosine,
        lsh_bucket_expr,
    )
    from pyspark.sql import Window as W

    emb = t(spark, sf_dir, "embeddings")
    query_vec = [
        float(x)
        for x in emb.filter(F.col("vec_id") == 0).select("embedding").first()["embedding"]
    ]
    qbuckets = query_buckets(query_vec, LSH_TABLES, LSH_PLANES)
    is_cand = None
    for tbl, b in enumerate(qbuckets):
        # query_buckets prefixes 'b'; the raw sign-bit expr does not.
        # The bucket expression rides the memoized as-double tree (r17).
        clause = lsh_bucket_expr(_as_double("embedding"), tbl, LSH_PLANES) == F.lit(
            b[1:]
        )
        is_cand = clause if is_cand is None else (is_cand | clause)
    scored = emb.filter(F.col("vec_id") != 0).select(
        "vec_id",
        _floor6(cosine_lit("embedding", query_vec)).alias("cos6"),
        is_cand.alias("is_cand"),
    )
    # A hit needs exact_rk <= k AND cand_rk <= k with k <= max(RECALL_KS),
    # so only each tier's top-max(k) rows can contribute: bound BOTH
    # rankings with orderBy().limit() (TakeOrderedAndProject — a
    # per-partition top-N merge) and window the tiny heads. The r12-era
    # spelling ranked the ENTIRE corpus through one unpartitioned
    # row_number (the x4_zipf_slope weak-plan class); at web scale that
    # is a single-task sort of every vector.
    kmax = max(RECALL_KS)
    wrk = W.orderBy(F.desc("cos6"), F.col("vec_id"))
    exact_top = (
        scored.orderBy(F.desc("cos6"), "vec_id")
        .limit(kmax)
        .select("vec_id", "cos6", F.row_number().over(wrk).alias("exact_rk"))
    )
    cand_top = (
        scored.filter(F.col("is_cand"))
        .orderBy(F.desc("cos6"), "vec_id")
        .limit(kmax)
        .select("vec_id", "cos6", F.row_number().over(wrk).alias("cand_rk"))
    )
    joined = exact_top.join(
        F.broadcast(cand_top.select("vec_id", "cand_rk")), "vec_id", "left"
    )
    ks = F.explode(F.array(*[F.lit(k) for k in RECALL_KS])).alias("k")
    hit = (
        F.col("exact_rk") <= F.col("k")
    ) & F.col("cand_rk").isNotNull() & (F.col("cand_rk") <= F.col("k"))
    return (
        joined.select("exact_rk", "cand_rk", ks)
        .groupBy("k")
        .agg(F.sum(F.when(hit, 1).otherwise(0)).alias("n_hits"))
        .select(
            F.col("k").cast("long").alias("k"),
            F.col("n_hits").cast("long").alias("n_hits"),
            F.expr("CAST(n_hits * 1000000 DIV k AS BIGINT)").alias("recall_e6"),
        )
        .orderBy("k")
    )
