"""Sequence packing — batch-prep for LLM training (SURVEY.md §2.12 X4
[EXT]; no reference counterpart).

Two packing disciplines, matching what real training pipelines run:

- **concat-and-chunk** (``x4_sequence_packing``): documents are
  concatenated in a deterministic order per source and the token
  stream is cut every ``CHUNK_TOKENS`` tokens; a document can straddle
  a boundary. This is the common pretraining shape (no padding waste)
  and is fully expressible as a window cumsum — one shuffle on
  (source), exact DuckDB oracle.
- **greedy next-fit bins** (``pack_documents_greedy``): whole
  documents only (instruction-tuning shape, no straddling) — bin
  boundaries depend on a sequential scan, so it runs as
  ``applyInPandas`` per source group, deterministic for a fixed
  intra-group order regardless of physical partitioning. Pinned by
  pytest invariants instead of SQL.

Scale: both are one shuffle on the grouping key. Per-source groups
bound the state either path carries; a 100 TB corpus packs in
parallel across sources (or any finer deterministic grouping column —
date, shard — threaded through ``group_cols``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from etl_generator_demo_spark.operators.relational import t
from etl_generator_demo_spark.registry import register

CHUNK_TOKENS = 512


@register(
    "x4_sequence_packing",
    oracle=f"""
    WITH sized AS (
        SELECT doc_id, source,
               CAST(LEN(STRING_SPLIT(text, ' ')) AS BIGINT) AS n_tokens
        FROM documents
    ),
    cum AS (
        SELECT doc_id, source, n_tokens,
               SUM(n_tokens) OVER (PARTITION BY source ORDER BY doc_id
                                   ROWS UNBOUNDED PRECEDING) - n_tokens AS tok_before
        FROM sized
    )
    SELECT doc_id, source, n_tokens,
           CAST(FLOOR(tok_before / {CHUNK_TOKENS}) AS BIGINT) AS chunk_id,
           tok_before % {CHUNK_TOKENS}                        AS offset_in_chunk,
           tok_before + n_tokens - 1 >= (FLOOR(tok_before / {CHUNK_TOKENS}) + 1) * {CHUNK_TOKENS}
               AS straddles_boundary
    FROM cum
    ORDER BY source, doc_id
    """,
    survey_ids=("X4",),
)
def x4_sequence_packing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Concat-and-chunk packing plan: per source, documents are laid
    end-to-end in doc_id order and the stream is cut every
    {CHUNK_TOKENS} tokens. chunk_id/offset tell the materialization
    step exactly where each document's tokens land; straddling docs
    continue into chunk_id+1. One window shuffle, no UDFs."""
    docs = t(spark, sf_dir, "documents")
    sized = docs.select(
        "doc_id", "source", F.size(F.split("text", " ")).cast("long").alias("n_tokens")
    )
    w = Window.partitionBy("source").orderBy("doc_id").rowsBetween(
        Window.unboundedPreceding, 0
    )
    cum = sized.withColumn("tok_before", F.sum("n_tokens").over(w) - F.col("n_tokens"))
    chunk = F.floor(F.col("tok_before") / CHUNK_TOKENS)
    return (
        cum.select(
            "doc_id",
            "source",
            "n_tokens",
            chunk.cast("long").alias("chunk_id"),
            (F.col("tok_before") % CHUNK_TOKENS).alias("offset_in_chunk"),
            (F.col("tok_before") + F.col("n_tokens") - 1 >= (chunk + 1) * CHUNK_TOKENS).alias(
                "straddles_boundary"
            ),
        )
        .orderBy("source", "doc_id")
    )


def pack_documents_greedy(
    docs: DataFrame,
    capacity: int = CHUNK_TOKENS,
    id_col: str = "doc_id",
    token_col: str = "n_tokens",
    group_cols: tuple[str, ...] = ("source",),
) -> DataFrame:
    """Whole-document next-fit packing: within each group (docs sorted
    by id) a document opens a new bin when it would overflow the
    current one. Oversized docs (> capacity) get a bin of their own.
    Returns input + (bin_id) where bin_id is unique per group.

    Sequential by nature → ``applyInPandas`` per group; deterministic
    because the scan order (id_col asc) is imposed inside the UDF, not
    inherited from partitioning."""
    cap = int(capacity)
    id_c, tok_c = id_col, token_col

    def pack(pdf):
        import pandas as pd

        pdf = pdf.sort_values(id_c).reset_index(drop=True)
        bins, fill, cur = [], 0, 0
        for n in pdf[tok_c].tolist():
            if bins and fill + n > cap:
                cur += 1
                fill = 0
            bins.append(cur)
            fill += n
        return pdf.assign(bin_id=pd.Series(bins, dtype="int64"))

    out_schema = ", ".join(
        f"{f.name} {f.dataType.simpleString()}" for f in docs.schema.fields
    ) + ", bin_id long"
    return docs.groupBy(*group_cols).applyInPandas(pack, out_schema)
