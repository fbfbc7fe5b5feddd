"""Round-12 batch 6: X5 multimodal depth — perceptual-hash Hamming
near-dup over media payload fingerprints, and scene-cut detection over
per-clip frame embeddings.

Reference parity: the reference (HYUNJOON94/etl-generator-demo)
delegates all execution to PostgreSQL/MySQL behind an LLM
(db_connector.py:207-257) and has no multimodal operators; X5 is part
of the LLM-training-pipeline surface the brief requires as first-class
(SURVEY.md §2.12).

Both queries follow the X5 house rules (operators/multimodal.py):
payload bytes feed ONE fingerprint/feature column and are never
shuffled; every join is banded/keyed, never all-pairs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import register
from .multimodal import as_media_table
from .relational import t
from .similarity import _as_double, cosine

#: 64-bit pHash split into 4 bands of 16 bits (4 hex chars) — a
#: re-encode that moves <= PHASH_HAM_TAU bits leaves >= 1 band intact
#: whenever the flipped bits hit <= 3 bands, so banding recalls small
#: perturbations while random 64-bit pairs collide on a 16-bit band
#: with p = 4 * 2^-16.
PHASH_BANDS = 4
#: Exact-verify acceptance: Hamming distance <= 8 of 64 bits (random
#: pairs concentrate at 32).
PHASH_HAM_TAU = 8

_HEX = "0123456789abcdef"


def phash_relation(docs: DataFrame) -> DataFrame:
    """(media_id, phash) for the corpus PLUS a simulated re-encode
    batch: every 5th item re-keyed (+1_000_000) with its 64-bit
    fingerprint perturbed by exactly one bit (the low bit of nibble
    ``media_id % 16`` xor-flipped) — a re-encode/resize changes a few
    DCT coefficients, not the whole hash.

    The fingerprint itself is the md5 of the BINARY payload column
    (the deterministic stand-in this container allows; a real
    deployment swaps in a DCT pHash over decoded pixels via the
    ``multimodal.decode_features`` Pandas-UDF path and keeps every
    plan below unchanged). Spark md5(payload) and DuckDB MD5(text)
    hash the same utf-8 bytes — the `x5_payload_dedup` parity."""
    media = as_media_table(docs)
    orig = media.select(
        "media_id", F.substring(F.md5("payload"), 1, 16).alias("phash")
    )
    re_enc = (
        orig.filter(F.col("media_id") % 5 == 0)
        .withColumn("pos", (F.col("media_id") % 16 + 1).cast("int"))
        .withColumn("media_id", F.col("media_id") + 1_000_000)
        .withColumn(
            "phash",
            F.expr(
                f"concat(substring(phash, 1, pos - 1),"
                f" substring('{_HEX}',"
                # parens around the xor: Spark SQL binds ^ LOOSER than +,
                # so `v ^ 1 + 1` would parse as v ^ 2 (a 2-bit flip).
                f"   ((instr('{_HEX}', substring(phash, pos, 1)) - 1) ^ 1) + 1, 1),"
                f" substring(phash, pos + 1, 16 - pos))"
            ),
        )
        .select("media_id", "phash")
    )
    return orig.unionByName(re_enc)


@register(
    "x5_phash_hamming_neardup",
    oracle=f"""
    WITH orig AS (
        SELECT doc_id AS media_id, SUBSTR(MD5(text), 1, 16) AS phash
        FROM documents
    ),
    re AS (
        SELECT media_id + 1000000 AS media_id,
               SUBSTR(phash, 1, pos - 1)
               || SUBSTR('{_HEX}',
                         xor(instr('{_HEX}', SUBSTR(phash, pos, 1)) - 1, 1) + 1,
                         1)
               || SUBSTR(phash, pos + 1, 16 - pos) AS phash
        FROM (
            SELECT media_id, phash,
                   CAST(media_id % 16 + 1 AS INT) AS pos
            FROM orig WHERE media_id % 5 = 0
        )
    ),
    m AS (SELECT * FROM orig UNION ALL SELECT * FROM re),
    bands AS (
        SELECT media_id, g.b AS band_id,
               SUBSTR(phash, g.b * 4 + 1, 4) AS band_key
        FROM m CROSS JOIN (SELECT UNNEST(RANGE(0, {PHASH_BANDS})) AS b) g
    ),
    cand AS (
        SELECT DISTINCT a.media_id AS media_a, c.media_id AS media_b
        FROM bands a
        JOIN bands c
          ON a.band_id = c.band_id AND a.band_key = c.band_key
         AND a.media_id < c.media_id
    ),
    ham AS (
        SELECT cand.media_a, cand.media_b,
               CAST(SUM(bit_count(xor(
                   instr('{_HEX}', SUBSTR(ma.phash, p.p, 1)) - 1,
                   instr('{_HEX}', SUBSTR(mb.phash, p.p, 1)) - 1
               ))) AS BIGINT) AS hamming
        FROM cand
        JOIN m ma ON ma.media_id = cand.media_a
        JOIN m mb ON mb.media_id = cand.media_b
        CROSS JOIN (SELECT UNNEST(RANGE(1, 17)) AS p) p
        GROUP BY cand.media_a, cand.media_b
    )
    SELECT media_a, media_b, hamming
    FROM ham WHERE hamming <= {PHASH_HAM_TAU}
    ORDER BY media_a, media_b
    """,
    survey_ids=("X5", "X2", "J1", "A1"),
)
def x5_phash_hamming_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Perceptual-hash near-dup detection for media payloads — the
    image analogue of SimHash text dedup: byte-identical blobs are
    caught by `x5_payload_dedup`, but a re-encode/resize/watermark
    changes every byte while moving only a few bits of the perceptual
    fingerprint, so the dedup that actually deflates a crawled image
    corpus is Hamming-radius search over 64-bit pHashes.

    Pipeline (each stage linear): fingerprint scan -> 4x16-bit band
    explode -> candidate pairs from ONE self-join on (band_id,
    band_key) -> exact Hamming distance over the 16 nibbles (explode +
    xor + bit_count, all JVM-side) -> accept at <= PHASH_HAM_TAU bits.
    Random pairs share a band with p = 4/65536 and verify at ~32 bits,
    so output = the planted one-bit re-encodes. At 100 TB the shuffle
    carries (media_id, 4-char band_key) rows — never payloads — and
    the verify join touches only candidates, the `x2_neardup_verified`
    shape on the media fingerprint domain."""
    ph = phash_relation(t(spark, sf_dir, "documents"))
    bands = ph.select(
        "media_id",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).cast("long").alias("band_id"),
                        F.substring("phash", b * 4 + 1, 4).alias("band_key"),
                    )
                    for b in range(PHASH_BANDS)
                ]
            )
        ).alias("bk"),
    ).select("media_id", "bk.band_id", "bk.band_key")
    cand = (
        bands.alias("a")
        .join(
            bands.select(
                F.col("media_id").alias("media_b"), "band_id", "band_key"
            ).alias("c"),
            ["band_id", "band_key"],
        )
        .filter(F.col("a.media_id") < F.col("media_b"))
        .select(F.col("a.media_id").alias("media_a"), "media_b")
        .distinct()
    )
    nib = f"instr('{_HEX}', substring(%s, p, 1)) - 1"
    ham = (
        cand.join(ph.select(F.col("media_id").alias("media_a"), F.col("phash").alias("ph_a")), "media_a")
        .join(ph.select(F.col("media_id").alias("media_b"), F.col("phash").alias("ph_b")), "media_b")
        .select("media_a", "media_b", F.explode(F.sequence(F.lit(1), F.lit(16))).alias("p"), "ph_a", "ph_b")
        .groupBy("media_a", "media_b")
        .agg(
            F.sum(
                F.bit_count(F.expr(f"({nib % 'ph_a'}) ^ ({nib % 'ph_b'})"))
            )
            .cast("long")
            .alias("hamming")
        )
    )
    return (
        ham.filter(F.col("hamming") <= PHASH_HAM_TAU)
        .select("media_a", "media_b", "hamming")
        .orderBy("media_a", "media_b")
    )


# ---------------------------------------------------------------------------
# scene-cut detection over per-clip frame embeddings
# ---------------------------------------------------------------------------

#: Frames per clip in the fixture adaptation (vec_id div 16 = clip).
CLIP_FRAMES = 16
#: A transition is a CUT when adjacent-frame cosine drops below this
#: (e6 fixed point). The fixture's vectors are uniform random, so
#: most transitions are near-orthogonal; real frame features sit near
#: 1.0 within a shot — the threshold's sign, not its exact value, is
#: the operator.
CUT_TAU_E6 = 250_000


@register(
    "x5_scene_cut_detection",
    oracle=f"""
    WITH f AS (
        SELECT vec_id // {CLIP_FRAMES} AS clip_id,
               vec_id % {CLIP_FRAMES} AS frame_idx,
               embedding::DOUBLE[] AS v
        FROM embeddings
    ),
    tr AS (
        SELECT a.clip_id,
               CAST(FLOOR(LIST_DOT_PRODUCT(a.v, b.v)
                    / (SQRT(LIST_DOT_PRODUCT(a.v, a.v))
                       * SQRT(LIST_DOT_PRODUCT(b.v, b.v))) * 1000000)
                    AS BIGINT) AS cos_e6
        FROM f a
        JOIN f b ON b.clip_id = a.clip_id AND b.frame_idx = a.frame_idx + 1
    )
    SELECT clip_id,
           CAST(COUNT(*) AS BIGINT) AS n_transitions,
           CAST(SUM(CASE WHEN cos_e6 < {CUT_TAU_E6} THEN 1 ELSE 0 END)
                AS BIGINT) AS n_cuts,
           CAST(SUM(CASE WHEN cos_e6 < {CUT_TAU_E6} THEN 1 ELSE 0 END) + 1
                AS BIGINT) AS n_segments,
           CAST(MIN(cos_e6) AS BIGINT) AS min_cos_e6,
           CAST(SUM(cos_e6) AS BIGINT) AS sum_cos_e6
    FROM tr GROUP BY clip_id ORDER BY clip_id
    """,
    survey_ids=("X5", "X3", "J1", "A1"),
)
def x5_scene_cut_detection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scene-cut detection — the video-curation primitive that turns a
    clip into shots before frame sampling: adjacent-frame feature
    cosine drops below a threshold at a hard cut. The fixture's
    `embeddings` stand in for per-frame features (vec_id div 16 =
    clip, vec_id mod 16 = frame index); a real deployment feeds
    decoded frame features through the same plan.

    Plan: one embedding scan -> self-join keyed on (clip_id,
    frame_idx + 1) — per-clip state is CLIP_FRAMES-bounded, so the
    join partitions by clip and never widens — -> per-clip rollup.
    Cosines are floored to e6 BIGINTs with the exact
    LIST_DOT_PRODUCT spelling `x3_cosine_topk` pins; the rollup
    reports the sum (exact integer), not a mean, so no float or
    signed-division drift crosses engines. At 100 TB: clips hash
    across executors, every stage is linear in frames."""
    f = t(spark, sf_dir, "embeddings").select(
        F.expr(f"vec_id div {CLIP_FRAMES}").alias("clip_id"),
        (F.col("vec_id") % CLIP_FRAMES).alias("frame_idx"),
        _as_double("embedding").alias("v"),
    )
    a = f.select("clip_id", "frame_idx", F.col("v").alias("va"))
    b = f.select(
        "clip_id",
        (F.col("frame_idx") - 1).alias("frame_idx"),
        F.col("v").alias("vb"),
    )
    tr = a.join(b, ["clip_id", "frame_idx"]).select(
        "clip_id",
        F.floor(cosine(F.col("va"), F.col("vb")) * 1_000_000)
        .cast("long")
        .alias("cos_e6"),
    )
    cut = F.when(F.col("cos_e6") < CUT_TAU_E6, 1).otherwise(0)
    return (
        tr.groupBy("clip_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_transitions"),
            F.sum(cut).cast("long").alias("n_cuts"),
            (F.sum(cut) + 1).cast("long").alias("n_segments"),
            F.min("cos_e6").cast("long").alias("min_cos_e6"),
            F.sum("cos_e6").cast("long").alias("sum_cos_e6"),
        )
        .orderBy("clip_id")
    )
