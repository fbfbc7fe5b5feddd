"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship query at sf0.001 as the smoke
check; ``queries()``/``oracle_sql()`` expose the full operator
registry (etl_generator_demo_spark.registry) so the driver can
hash-compare every operator against DuckDB at sf0.01.
"""

from __future__ import annotations

import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

if "/root/repo" not in sys.path:
    sys.path.insert(0, "/root/repo")

SMOKE_SF_DIR = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query (SURVEY §7.2): revenue by market segment —
    customer⋈orders⋈lineitem, grouped, ordered. Exercises scan, join
    (broadcast + shuffle), aggregation, sort in one vertical slice."""
    from etl_generator_demo_spark.operators.relational import q2_revenue_by_segment

    return q2_revenue_by_segment(spark, SMOKE_SF_DIR)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    from etl_generator_demo_spark.registry import load_all

    return {name: rq.fn for name, rq in load_all().items()}


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL per query; non-SQL-expressible ops are
    omitted (driver records a rows-only check for those)."""
    from etl_generator_demo_spark.registry import load_all

    return {name: rq.oracle for name, rq in load_all().items() if rq.oracle is not None}
