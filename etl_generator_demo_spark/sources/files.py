"""File-format sources beyond parquet — CSV, JSON-lines, and raw text
corpora (SURVEY.md §2.1 [EXT]; the reference reads live DBs only, but
a data-pipeline engine ingests files).

Scale posture: all three are plain distributed reads — Spark splits
files (and text lines) across executors; an explicit schema skips the
sampling pass ``inferSchema`` would spend reading data twice. CSV/JSON
scans push down column pruning (and CSV filters in Spark 4); the text
reader is one map stage.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def read_csv(
    spark: SparkSession,
    path: str,
    schema: str | None = None,
    header: bool = True,
    sep: str = ",",
) -> DataFrame:
    """CSV source. Pass a DDL `schema` in production — inference reads
    the data twice and types drift run-to-run; PERMISSIVE mode keeps
    malformed rows (nulls) instead of failing the 100 TB job at row 3."""
    reader = (
        spark.read.option("header", str(header).lower())
        .option("sep", sep)
        .option("mode", "PERMISSIVE")
    )
    if schema:
        reader = reader.schema(schema)
    else:
        reader = reader.option("inferSchema", "true")
    return reader.csv(path)


def read_jsonl(spark: SparkSession, path: str, schema: str | None = None) -> DataFrame:
    """JSON-lines source (one object per line — the splittable layout;
    multiline JSON arrays are NOT splittable and serialize the read)."""
    reader = spark.read
    if schema:
        reader = reader.schema(schema)
    return reader.json(path)


def read_text_corpus(
    spark: SparkSession, path: str, id_from: str = "line"
) -> DataFrame:
    """Raw text ingest: one document per line → (doc_id, text,
    source). doc_id is either the deterministic content hash
    (``id_from='hash'`` — stable across re-layouts, duplicate texts
    collide on purpose so exact dedup is a free groupBy) or a
    RUN-LOCAL unique id (``id_from='line'`` — monotonically increasing
    per partition, unique even for duplicate texts, but NOT stable
    across runs or re-layouts; use 'hash' for any id that must survive
    reprocessing). `source` is the originating file, the natural
    partition key downstream."""
    txt = spark.read.text(path).select(
        F.col("value").alias("text"),
        F.element_at(F.split(F.input_file_name(), "/"), -1).alias("source"),
    )
    if id_from == "hash":
        # 60-bit prefix of the content hash as a stable numeric id
        return txt.select(
            F.conv(F.substring(F.md5("text"), 1, 15), 16, 10).cast("long").alias("doc_id"),
            "text",
            "source",
        )
    w_id = F.monotonically_increasing_id()
    return txt.select(w_id.alias("doc_id"), "text", "source")
