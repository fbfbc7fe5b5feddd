"""Near-dup cluster resolution — pairs → clusters → keep/drop.

LSH emits candidate *pairs*; an actual dedup needs the transitive
closure (A~B, B~C ⇒ {A,B,C} are one group) and a canonical survivor
per group. This module finishes the X2 pipeline (SURVEY.md §2.12; no
reference counterpart — the reference has no dedup at all):

- ``connected_components``: iterative min-label propagation WITH
  pointer doubling, pure DataFrame ops. Every vertex starts labeled
  with its own id; each round every vertex takes the min of its own
  and its neighbors' labels, then compresses through its current
  label (label <- label-of-label); fixpoint = component ids (the min
  doc_id of the component). The compression step halves the
  remaining label-chain length every round, so convergence is
  O(log n) even on adversarial long chains (a 300-doc path converges
  in ~8 rounds; pure propagation would need 300) — the same bound
  the large-star/small-star formulation gives. Each round is two
  narrow joins + one groupBy; lineage is cut per round with
  ``localCheckpoint`` so the plan stays O(1) deep instead of growing
  per iteration.
- ``dedup_corpus``: attach cluster_id to the corpus and mark the
  minimum id of each cluster as the canonical keeper. Downstream,
  training pipelines ``filter(is_keep)``.

Convergence is detected by the label-sum fixpoint: labels only ever
decrease, so an unchanged SUM(label) means no label moved.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from etl_generator_demo_spark.operators.dedup import (
    _DUCK_SHINGLES,
    _duck_minhash_cols,
    corpus_candidate_pairs,
    doc_shingles,
    lsh_candidate_pairs,
    minhash_signatures,
)
from etl_generator_demo_spark.operators.relational import t
from etl_generator_demo_spark.registry import register


def connected_components(
    nodes: DataFrame,
    pairs: DataFrame,
    id_col: str = "doc_id",
    a_col: str = "doc_a",
    b_col: str = "doc_b",
    max_iter: int = 25,
) -> DataFrame:
    """(id_col, cluster_id) for every node, where cluster_id is the
    smallest node id reachable through `pairs`. Singletons keep their
    own id. Raises if `max_iter` rounds don't reach the fixpoint
    (diameter > max_iter — not a silent wrong answer)."""
    half = pairs.select(F.col(a_col).alias("src"), F.col(b_col).alias("dst"))
    edges = half.union(
        half.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    ).localCheckpoint(eager=True)

    labels = nodes.select(F.col(id_col).alias("id"), F.col(id_col).alias("label"))
    prev_sum = None
    for _ in range(max_iter):
        nbr_min = (
            edges.join(labels, edges["dst"] == labels["id"])
            .groupBy("src")
            .agg(F.min("label").alias("nbr_min"))
        )
        labels = labels.join(nbr_min, labels["id"] == nbr_min["src"], "left").select(
            "id",
            F.least(F.col("label"), F.coalesce("nbr_min", "label")).alias("label"),
        )
        # pointer doubling (label <- label-of-label): propagation alone
        # moves the min ONE hop per round (O(diameter) rounds — a
        # 300-doc near-dup chain would blow max_iter); compressing
        # through the current label halves the remaining distance each
        # round, giving O(log n) convergence — the same guarantee the
        # large-star/small-star formulation buys, with one extra narrow
        # self-join per round.
        lbl2 = labels.select(
            F.col("id").alias("l_id"), F.col("label").alias("l_label")
        )
        labels = (
            labels.join(lbl2, labels["label"] == lbl2["l_id"], "left")
            .select(
                "id",
                F.least(F.col("label"), F.coalesce("l_label", "label")).alias("label"),
            )
            .localCheckpoint(eager=True)  # cut lineage: O(1)-deep plan per round
        )
        # labels are monotonically non-increasing, so an unchanged sum
        # is a fixpoint proof (one cheap global agg per round).
        cur_sum = labels.agg(F.sum("label")).first()[0]
        if cur_sum == prev_sum:
            return labels.select(F.col("id").alias(id_col), F.col("label").alias("cluster_id"))
        prev_sum = cur_sum
    raise RuntimeError(f"connected_components did not converge in {max_iter} rounds")


def dedup_corpus(
    docs: DataFrame, pairs: DataFrame, id_col: str = "doc_id"
) -> DataFrame:
    """Corpus + (cluster_id, is_keep): one canonical row per near-dup
    cluster (the minimum id), everything else marked droppable."""
    cc = connected_components(docs.select(id_col), pairs, id_col=id_col)
    return docs.join(cc, id_col).withColumn(
        "is_keep", F.col("cluster_id") == F.col(id_col)
    )


# ===========================================================================
# Driver-checkable query
# ===========================================================================

_CLUSTER_ORACLE = f"""
    {_DUCK_SHINGLES.replace("WITH tok", "WITH RECURSIVE tok", 1)},
    sigs AS (
        SELECT doc_id, {_duck_minhash_cols()}
        FROM shingles GROUP BY doc_id
    ),
    band0 AS (SELECT doc_id, mh0 || mh1 || mh2 || mh3 AS band_key FROM sigs),
    band1 AS (SELECT doc_id, mh4 || mh5 || mh6 || mh7 AS band_key FROM sigs),
    pairs AS (
        SELECT DISTINCT doc_a, doc_b FROM (
            SELECT a.doc_id AS doc_a, b.doc_id AS doc_b
            FROM band0 a JOIN band0 b ON a.band_key = b.band_key AND a.doc_id < b.doc_id
            UNION ALL
            SELECT a.doc_id, b.doc_id
            FROM band1 a JOIN band1 b ON a.band_key = b.band_key AND a.doc_id < b.doc_id
        )
    ),
    edges AS (
        SELECT doc_a AS src, doc_b AS dst FROM pairs
        UNION
        SELECT doc_b, doc_a FROM pairs
    ),
    reach(src, dst) AS (
        SELECT doc_id, doc_id FROM documents
        UNION
        SELECT r.src, e.dst FROM reach r JOIN edges e ON r.dst = e.src
    )
    SELECT src AS doc_id,
           MIN(dst) AS cluster_id,
           MIN(dst) = src AS is_keep
    FROM reach
    GROUP BY src
    ORDER BY doc_id
    """


@register("x2_dedup_clusters", oracle=_CLUSTER_ORACLE, survey_ids=("X2",))
def x2_dedup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end near-dup dedup: MinHash-LSH candidate pairs →
    connected components → per-doc (cluster_id, is_keep). The oracle is
    DuckDB's recursive-CTE transitive closure over the identical pair
    set, so cluster assignment is hash-checked exactly."""
    docs = t(spark, sf_dir, "documents")
    pairs = corpus_candidate_pairs(spark, sf_dir)  # persisted band index when warm
    cc = connected_components(docs.select("doc_id"), pairs)
    return (
        cc.withColumn("is_keep", F.col("cluster_id") == F.col("doc_id"))
        .select("doc_id", "cluster_id", "is_keep")
        .orderBy("doc_id")
    )


@register(
    "x2_cluster_size_histogram",
    oracle=f"""
    SELECT n_members,
           CAST(COUNT(*) AS BIGINT)      AS n_clusters,
           CAST(SUM(n_members) AS BIGINT) AS n_docs
    FROM (
        SELECT cluster_id, CAST(COUNT(*) AS BIGINT) AS n_members
        FROM ( {_CLUSTER_ORACLE} ) c
        GROUP BY cluster_id
    )
    GROUP BY n_members
    ORDER BY n_members
    """,
    survey_ids=("X2", "A1"),
)
def x2_cluster_size_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup family-size distribution: how many clusters of each
    cardinality the corpus resolves into (singletons = unique docs;
    the heavy tail = template spam worth source-level review). The
    report every dedup run publishes next to its drop rate. Two
    map-combined groupBys over the cluster assignment; the oracle
    wraps the same recursive-closure chain, so the histogram is
    hash-exact."""
    cc = x2_dedup_clusters(spark, sf_dir)
    sizes = cc.groupBy("cluster_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_members")
    )
    return (
        sizes.groupBy("n_members")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_clusters"),
            F.sum("n_members").cast("long").alias("n_docs"),
        )
        .orderBy("n_members")
    )


@register(
    "x2_golden_records",
    oracle=f"""
    WITH cc AS ( {_CLUSTER_ORACLE} )
    SELECT cc.cluster_id,
           CAST(MIN(d.doc_id) AS BIGINT) AS keep_id,
           CAST(COUNT(*) AS BIGINT) AS n_members,
           CAST(MAX(d.n_chars) AS BIGINT) AS best_n_chars,
           STRING_AGG(DISTINCT d.source, ',' ORDER BY d.source) AS sources_csv,
           STRING_AGG(DISTINCT d.lang, ',' ORDER BY d.lang) AS langs_csv
    FROM cc JOIN documents d ON d.doc_id = cc.doc_id
    GROUP BY cc.cluster_id
    HAVING COUNT(*) > 1
    ORDER BY cc.cluster_id
    """,
    survey_ids=("X2", "A1"),
)
def x2_golden_records(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Survivorship: collapse each near-dup family into ONE golden
    record — the MDM step after cluster resolution. Rules here: keep
    the lowest id as canonical, surface the richest text length, and
    union the provenance (sources, langs) as sorted CSV so nothing the
    duplicates knew is lost. Only multi-member clusters are emitted
    (singletons need no merge).

    One join of the cluster assignment back to the doc attributes +
    one grouped aggregate; collect_set stays bounded by cluster size,
    which the LSH threshold bounds in turn."""
    docs = t(spark, sf_dir, "documents")
    pairs = corpus_candidate_pairs(spark, sf_dir)  # persisted band index when warm
    cc = connected_components(docs.select("doc_id"), pairs)
    return (
        cc.join(docs, "doc_id")
        .groupBy("cluster_id")
        .agg(
            F.min("doc_id").cast("long").alias("keep_id"),
            F.count(F.lit(1)).cast("long").alias("n_members"),
            F.max("n_chars").cast("long").alias("best_n_chars"),
            F.array_join(F.array_sort(F.collect_set("source")), ",").alias(
                "sources_csv"
            ),
            F.array_join(F.array_sort(F.collect_set("lang")), ",").alias("langs_csv"),
        )
        .filter(F.col("n_members") > 1)
        .orderBy("cluster_id")
    )
