"""Set-similarity join with prefix filtering, and edit-distance
verification — SURVEY.md §2.12 X2 ([EXT], no reference counterpart).

Two classic near-dup tiers the shingle/MinHash suite doesn't cover:

- **token-overlap join (PPJoin-style prefix filter)**: pairs of
  documents whose *distinct-token* Jaccard ≥ t, found without an
  all-pairs join. Each document keeps only its ``|d| - ceil(t·|d|) + 1``
  rarest tokens (global document-frequency order — the canonical
  ordering of Chaudhuri et al.'s prefix filter / Xiao et al.'s PPJoin);
  any pair meeting the threshold must collide inside both prefixes, so
  the candidate join runs on the prefix relation only. Exact overlap is
  then computed solely for candidate pairs. The registered oracle is
  the *unfiltered brute-force* all-pairs Jaccard — a hash match proves
  the pruning lossless, not just self-consistent.
- **edit-distance pairs**: character-level Levenshtein over MinHash-LSH
  candidates (`dedup.lsh_candidate_pairs`). Levenshtein is O(len²) per
  pair — at 100 TB it is only ever a *verification* tier over an
  LSH-bounded candidate set, never a corpus join. Both engines ship the
  same unit-cost Levenshtein built-in, so the distances hash exactly.

Thresholds are exact integer arithmetic (``10·ov ≥ 9·union`` instead of
``ov/union ≥ 0.9``; ``ceil(9c/10) = (9c+9) div 10``) so the boundary is
engine-identical with no float round-trip.

Scale notes: the per-doc ROW_NUMBER ranking window partitions by
doc_id (bounded rows per partition); the document-frequency relation is
vocabulary-sized. The prefix self-join buckets on the *rarest* tokens,
which is exactly what keeps bucket sizes small on Zipfian text.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from etl_generator_demo_spark.operators.dedup import (
    doc_shingles,
    lsh_candidate_pairs,
    minhash_signatures,
    _DUCK_SHINGLES,
    _duck_minhash_cols,
)
from etl_generator_demo_spark.operators.relational import t
from etl_generator_demo_spark.registry import register

# Jaccard threshold as an exact rational: ov/union >= NUM/DEN.
JACCARD_NUM = 9
JACCARD_DEN = 10


def doc_tokens(df: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Distinct (id, token) pairs — whitespace tokens, duplicates
    collapsed (set semantics; Jaccard is over token *sets*)."""
    return (
        df.select(id_col, F.explode(F.split(F.col(text_col), " ")).alias("token"))
        .distinct()
    )


def token_overlap_join(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    num: int = JACCARD_NUM,
    den: int = JACCARD_DEN,
) -> DataFrame:
    """All pairs with distinct-token Jaccard ≥ num/den via prefix
    filtering. Returns (doc_a, doc_b, overlap, union_size, jaccard).

    Plan shape: tokens → df counts (vocab-sized, map-combined) →
    per-doc rank window → prefix self-join (candidates) → exact
    overlap restricted to candidates. No all-pairs stage anywhere.
    The distinct token relation feeds four consumers (cardinalities,
    document frequencies, the rank window, and both sides of the exact
    overlap join) — materialize it once instead of re-running the
    explode+distinct per branch."""
    tok = doc_tokens(docs, id_col, text_col).localCheckpoint(eager=True)
    card = tok.groupBy(id_col).agg(F.count(F.lit(1)).alias("card"))
    df_rel = tok.groupBy("token").agg(F.count(F.lit(1)).alias("df"))

    # prefix_len = card - ceil(num*card/den) + 1, all-integer
    ranked = (
        tok.join(df_rel, "token")
        .join(card, id_col)
        .withColumn(
            "rk",
            F.row_number().over(
                Window.partitionBy(id_col).orderBy(F.col("df").asc(), F.col("token").asc())
            ),
        )
    )
    prefix = ranked.filter(
        F.col("rk")
        <= F.col("card") - F.floor((num * F.col("card") + num) / den).cast("long") + 1
    ).select(id_col, "token")

    cand = (
        prefix.alias("a")
        .join(prefix.alias("b"), "token")
        .filter(F.col(f"a.{id_col}") < F.col(f"b.{id_col}"))
        .select(
            F.col(f"a.{id_col}").alias("doc_a"), F.col(f"b.{id_col}").alias("doc_b")
        )
        .distinct()
    )

    a, b = tok.alias("a"), tok.alias("b")
    ov = (
        a.join(b, "token")
        .filter(F.col(f"a.{id_col}") < F.col(f"b.{id_col}"))
        .select(
            F.col(f"a.{id_col}").alias("doc_a"), F.col(f"b.{id_col}").alias("doc_b")
        )
        .join(cand, ["doc_a", "doc_b"], "left_semi")
        .groupBy("doc_a", "doc_b")
        .agg(F.count(F.lit(1)).alias("overlap"))
    )
    ca = card.select(F.col(id_col).alias("doc_a"), F.col("card").alias("card_a"))
    cb = card.select(F.col(id_col).alias("doc_b"), F.col("card").alias("card_b"))
    union_size = F.col("card_a") + F.col("card_b") - F.col("overlap")
    return (
        ov.join(ca, "doc_a")
        .join(cb, "doc_b")
        .filter(den * F.col("overlap") >= num * union_size)
        .select(
            "doc_a",
            "doc_b",
            F.col("overlap").cast("long").alias("overlap"),
            union_size.cast("long").alias("union_size"),
            (F.col("overlap").cast("double") / union_size).alias("jaccard"),
        )
    )


_DUCK_TOKENS = """
    WITH tok AS (
        SELECT DISTINCT doc_id, UNNEST(STRING_SPLIT(text, ' ')) AS token
        FROM documents
    ),
    card AS (SELECT doc_id, COUNT(*) AS card FROM tok GROUP BY doc_id)
"""


@register(
    "x2_token_overlap_join",
    # Deliberately brute-force (no prefix filter): hash equality proves
    # the Spark-side pruning drops no qualifying pair.
    oracle=f"""
    {_DUCK_TOKENS},
    inter AS (
        SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS overlap
        FROM tok a JOIN tok b ON a.token = b.token AND a.doc_id < b.doc_id
        GROUP BY 1, 2
    )
    SELECT doc_a, doc_b,
           CAST(overlap AS BIGINT) AS overlap,
           CAST(ca.card + cb.card - overlap AS BIGINT) AS union_size,
           CAST(overlap AS DOUBLE) / (ca.card + cb.card - overlap) AS jaccard
    FROM inter
    JOIN card ca ON ca.doc_id = doc_a
    JOIN card cb ON cb.doc_id = doc_b
    WHERE {JACCARD_DEN} * overlap
          >= {JACCARD_NUM} * (ca.card + cb.card - overlap)
    ORDER BY doc_a, doc_b
    """,
    survey_ids=("X2",),
)
def x2_token_overlap_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct-token Jaccard ≥ 0.9 pairs via PPJoin-style prefix
    filtering (candidates from the rarest-token prefixes only)."""
    docs = t(spark, sf_dir, "documents")
    return token_overlap_join(docs).orderBy("doc_a", "doc_b")


def edit_distance_pairs(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Levenshtein distance + similarity (basis points) for MinHash-LSH
    candidate pairs. Texts join back to the narrow candidate relation
    co-keyed; the quadratic-in-length distance runs once per candidate,
    never per corpus pair."""
    cand = lsh_candidate_pairs(
        minhash_signatures(doc_shingles(docs, id_col=id_col, distinct=False), id_col=id_col)
    )
    ta = docs.select(F.col(id_col).alias("doc_a"), F.col(text_col).alias("text_a"))
    tb = docs.select(F.col(id_col).alias("doc_b"), F.col(text_col).alias("text_b"))
    dist = F.levenshtein("text_a", "text_b")
    max_len = F.greatest(F.length("text_a"), F.length("text_b"))
    return (
        cand.join(ta, "doc_a")
        .join(tb, "doc_b")
        .select(
            "doc_a",
            "doc_b",
            dist.cast("long").alias("edit_distance"),
            # floor-scaled similarity: identical float64 path both engines
            F.floor(
                10000 * (1 - dist.cast("double") / max_len)
            ).cast("long").alias("sim_bp"),
        )
    )


@register(
    "x2_edit_distance_pairs",
    oracle=f"""
    {_DUCK_SHINGLES},
    sigs AS (
        SELECT doc_id, {_duck_minhash_cols()}
        FROM shingles GROUP BY doc_id
    ),
    band0 AS (SELECT doc_id, mh0 || mh1 || mh2 || mh3 AS band_key FROM sigs),
    band1 AS (SELECT doc_id, mh4 || mh5 || mh6 || mh7 AS band_key FROM sigs),
    cand AS (
        SELECT DISTINCT doc_a, doc_b FROM (
            SELECT a.doc_id AS doc_a, b.doc_id AS doc_b
            FROM band0 a JOIN band0 b
              ON a.band_key = b.band_key AND a.doc_id < b.doc_id
            UNION ALL
            SELECT a.doc_id AS doc_a, b.doc_id AS doc_b
            FROM band1 a JOIN band1 b
              ON a.band_key = b.band_key AND a.doc_id < b.doc_id
        )
    )
    SELECT doc_a, doc_b,
           CAST(LEVENSHTEIN(da.text, db.text) AS BIGINT) AS edit_distance,
           CAST(FLOOR(10000 * (1 - CAST(LEVENSHTEIN(da.text, db.text) AS DOUBLE)
                / GREATEST(LEN(da.text), LEN(db.text)))) AS BIGINT) AS sim_bp
    FROM cand
    JOIN documents da ON da.doc_id = doc_a
    JOIN documents db ON db.doc_id = doc_b
    ORDER BY doc_a, doc_b
    """,
    survey_ids=("X2",),
)
def x2_edit_distance_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Character-level Levenshtein verification over MinHash-LSH
    candidates (the string-edit tier next to shingle Jaccard)."""
    docs = t(spark, sf_dir, "documents")
    return edit_distance_pairs(docs).orderBy("doc_a", "doc_b")


CONTAIN_NUM = 9
CONTAIN_DEN = 10


@register(
    "x2_shingle_containment_pairs",
    oracle=f"""
    {_DUCK_SHINGLES},
    card AS (SELECT doc_id, COUNT(*) AS card FROM shingles GROUP BY doc_id),
    inter AS (
        SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS inter
        FROM shingles a JOIN shingles b
          ON a.shingle = b.shingle AND a.doc_id < b.doc_id
        GROUP BY a.doc_id, b.doc_id
    ),
    directed AS (
        SELECT doc_a AS contained, doc_b AS container, inter,
               ca.card AS card_contained
        FROM inter JOIN card ca ON ca.doc_id = doc_a
        UNION ALL
        SELECT doc_b AS contained, doc_a AS container, inter,
               cb.card AS card_contained
        FROM inter JOIN card cb ON cb.doc_id = doc_b
    )
    SELECT contained, container,
           CAST(inter AS BIGINT) AS inter,
           CAST(card_contained AS BIGINT) AS card_contained,
           CAST(inter AS DOUBLE) / card_contained AS containment
    FROM directed
    WHERE {CONTAIN_DEN} * inter >= {CONTAIN_NUM} * card_contained
    ORDER BY contained, container
    """,
    survey_ids=("X2",),
)
def x2_shingle_containment_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Asymmetric near-dup: shingle CONTAINMENT ≥ 0.9 — |Sa∩Sb|/|Sa|,
    the detector for quote-inclusion and doc-inside-doc duplication
    that symmetric Jaccard misses entirely (a short doc embedded in a
    long one has tiny Jaccard but containment ≈ 1). Broder's resemblance
    vs containment distinction, applied at corpus curation.

    Same inverted-index join as the Jaccard tier (intersections
    computed once per unordered pair, then scored in both directions);
    all-integer threshold; at 100 TB this is the verification tier over
    LSH candidates, like every exact pair scorer here."""
    docs = t(spark, sf_dir, "documents")
    # shingles feed cardinalities + both sides of the inverted-index
    # join — materialize once
    sh = doc_shingles(docs).localCheckpoint(eager=True)
    card = sh.groupBy("doc_id").agg(F.count(F.lit(1)).alias("card"))
    a, b = sh.alias("a"), sh.alias("b")
    inter = (
        a.join(b, "shingle")
        .filter(F.col("a.doc_id") < F.col("b.doc_id"))
        .select(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .groupBy("doc_a", "doc_b")
        .agg(F.count(F.lit(1)).alias("inter"))
    )
    ca = card.select(F.col("doc_id").alias("doc_a"), F.col("card").alias("card_a"))
    cb = card.select(F.col("doc_id").alias("doc_b"), F.col("card").alias("card_b"))
    both = inter.join(ca, "doc_a").join(cb, "doc_b")
    directed = both.select(
        F.col("doc_a").alias("contained"),
        F.col("doc_b").alias("container"),
        "inter",
        F.col("card_a").alias("card_contained"),
    ).unionByName(
        both.select(
            F.col("doc_b").alias("contained"),
            F.col("doc_a").alias("container"),
            "inter",
            F.col("card_b").alias("card_contained"),
        )
    )
    return (
        directed.filter(
            CONTAIN_DEN * F.col("inter") >= CONTAIN_NUM * F.col("card_contained")
        )
        .select(
            "contained",
            "container",
            F.col("inter").cast("long").alias("inter"),
            F.col("card_contained").cast("long").alias("card_contained"),
            (F.col("inter").cast("double") / F.col("card_contained")).alias(
                "containment"
            ),
        )
        .orderBy("contained", "container")
    )
