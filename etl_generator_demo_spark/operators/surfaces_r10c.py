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
