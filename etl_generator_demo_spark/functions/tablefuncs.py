"""Python UDTFs — the user-defined TABLE function surface (SURVEY §2.12).

The reference registers no UDFs of any kind; the engine's own hot
paths are Arrow-vectorized (`mapInPandas`/`applyInPandas`) because
row-at-a-time Python is the slow path. A UDTF is the one shape those
APIs don't cover for the SQL FRONT DOOR: a table-valued function a
SQL author can LATERAL-join, producing a variable number of rows per
input row with logic that genuinely needs Python.

Contract here: UDTFs are a SQL-surface convenience, registered
per-session by ``register_udtfs``; nothing in the registered query
set or the ETL executor depends on one — keep them OFF hot paths, and
when the same logic must run at corpus scale, write the Arrow tier
(e.g. `x4_text_stats`' explode pipeline) instead.
"""

from __future__ import annotations

from pyspark.sql import SparkSession
from pyspark.sql.functions import udtf


@udtf(returnType="token: string, n: int, rank: int")
class TopTokens:
    """Top-k tokens of one text by count (ties: lexicographic), as
    rows. SQL: ``SELECT d.doc_id, t.* FROM docs d,
    LATERAL top_tokens(d.text, 3) t``.

    Self-contained (stdlib only): UDTF workers unpickle the class
    without this package on sys.path.
    """

    def eval(self, text: str, k: int):
        if not text:
            return
        counts: dict[str, int] = {}
        for tok in text.split():
            counts[tok] = counts.get(tok, 0) + 1
        top = sorted(counts.items(), key=lambda kv: (-kv[1], kv[0]))[: max(k, 0)]
        for rank, (tok, n) in enumerate(top, start=1):
            yield tok, n, rank


def register_udtfs(spark: SparkSession) -> None:
    """Register the UDTF surface on a session (idempotent)."""
    spark.udtf.register("top_tokens", TopTokens)
