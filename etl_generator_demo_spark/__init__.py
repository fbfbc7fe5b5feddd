"""etl_generator_demo_spark — a PySpark-native analytics/ETL engine.

A from-scratch engine with the query and data-processing capabilities of
the reference service ``HYUNJOON94/etl-generator-demo`` (an NL->SQL +
ETL-spec generator that delegates execution to PostgreSQL/MySQL;
see SURVEY.md). Here the engine IS the database: a Spark catalog +
metadata layer, a SQL/DataFrame execution surface with the reference's
request semantics (auto-LIMIT, safety gate, JSON row serialization,
reference ``db_connector.py:207-257``), an executable ETL-spec runner
(reference only *describes* specs, ``sql_generator.py:40-49``), and a
set of large-scale data-pipeline operators (dedup, similarity search,
text analysis, multimodal plumbing) designed for 100 TB workloads.

Everything is expressed Spark-first: DataFrame/SQL logical plans that
Catalyst/AQE optimize; Pandas UDFs only where built-ins genuinely
cannot express the semantics.
"""

__version__ = "0.1.0"

from etl_generator_demo_spark.session import get_spark  # noqa: F401
from etl_generator_demo_spark.catalog import Catalog, TABLES  # noqa: F401
from etl_generator_demo_spark.engine import ExecutionEngine  # noqa: F401
