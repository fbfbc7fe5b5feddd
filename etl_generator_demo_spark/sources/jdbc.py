"""JDBC sources — SURVEY.md §2.1 S1/S2/S3.

The reference connects to PostgreSQL/MySQL through SQLAlchemy URL
templates (``db_connector.py:15-18``) and probes ``SELECT version()``
on connect (``:48-53``). Spark-native equivalent: the JDBC data
source, with pushdown enabled so WHERE clauses and projections run in
the remote database exactly as the reference's delegated queries did.

No live database exists in the test environment, so functions below
separate *option construction* (pure, unit-tested) from *connection*
(exercised only when a server is reachable).

Scale notes: `partition_on` turns a single-connection read into N
parallel range-partitioned reads — without it a 1 TB table arrives
through one socket. numPartitions/lowerBound/upperBound are required
together; fetchsize keeps driver memory flat.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any

from pyspark.sql import DataFrame, SparkSession

JDBC_URL_TEMPLATES = {
    "postgresql": "jdbc:postgresql://{host}:{port}/{database}",
    "mysql": "jdbc:mysql://{host}:{port}/{database}",
    # Embedded Apache Derby — in-process, no server, the engine's
    # always-available live-JDBC target (the driver ships in Spark's
    # own jars/ for the Hive metastore). `database` is a filesystem
    # path; create-on-first-connect mirrors the reference's
    # connect-then-introspect flow without requiring provisioning.
    "derby": "jdbc:derby:{database};create=true",
}

DEFAULT_PORTS = {"postgresql": 5432, "mysql": 3306}

VERSION_PROBE = {"postgresql": "SELECT version()", "mysql": "SELECT version()"}

#: Derby has no version() SQL function; its product version comes from
#: JDBC connection metadata (java.sql.DatabaseMetaData) — still a real
#: wire call through the same driver, used by probe_version below.
DERBY_LIVENESS_PROBE = "(SELECT 1 AS ONE FROM SYSIBM.SYSDUMMY1) AS v"


@dataclass(frozen=True)
class JDBCConnection:
    db_type: str  # postgresql | mysql
    host: str
    database: str
    user: str
    password: str
    port: int | None = None

    def url(self) -> str:
        if self.db_type not in JDBC_URL_TEMPLATES:
            raise ValueError(f"unsupported db_type: {self.db_type!r}")
        if self.db_type == "derby":
            return JDBC_URL_TEMPLATES["derby"].format(database=self.database)
        return JDBC_URL_TEMPLATES[self.db_type].format(
            host=self.host,
            port=self.port or DEFAULT_PORTS[self.db_type],
            database=self.database,
        )


def jdbc_options(
    conn: JDBCConnection,
    table: str,
    partition_on: str | None = None,
    num_partitions: int = 8,
    lower_bound: int | None = None,
    upper_bound: int | None = None,
    fetchsize: int = 10_000,
) -> dict[str, Any]:
    """Build the option map for ``spark.read.format('jdbc')``."""
    opts: dict[str, Any] = {
        "url": conn.url(),
        "dbtable": table,
        "user": conn.user,
        "password": conn.password,
        "fetchsize": str(fetchsize),
        "pushDownPredicate": "true",
        "pushDownAggregate": "true",
        "pushDownLimit": "true",
    }
    if partition_on:
        if lower_bound is None or upper_bound is None:
            raise ValueError("partition_on requires lower_bound and upper_bound")
        opts.update(
            partitionColumn=partition_on,
            numPartitions=str(num_partitions),
            lowerBound=str(lower_bound),
            upperBound=str(upper_bound),
        )
    return opts


def read_jdbc_table(spark: SparkSession, conn: JDBCConnection, table: str, **kw) -> DataFrame:
    """S1/S2: lazy JDBC scan (connection happens at action time)."""
    reader = spark.read.format("jdbc")
    for k, v in jdbc_options(conn, table, **kw).items():
        reader = reader.option(k, v)
    return reader.load()


def probe_version(spark: SparkSession, conn: JDBCConnection) -> str:
    """S3: the reference's connect-time version probe
    (db_connector.py:48-53 runs ``SELECT version()`` on connect).
    Derby exposes no version() function, so the probe there is a
    liveness scan plus DatabaseMetaData.getDatabaseProductVersion()
    over the same JDBC driver — a real wire call, not a constant."""
    if conn.db_type == "derby":
        read_jdbc_table(spark, conn, DERBY_LIVENESS_PROBE).collect()  # liveness
        jconn = spark._jvm.java.sql.DriverManager.getConnection(conn.url())
        try:
            md = jconn.getMetaData()
            return f"{md.getDatabaseProductName()} {md.getDatabaseProductVersion()}"
        finally:
            jconn.close()
    df = read_jdbc_table(spark, conn, f"({VERSION_PROBE[conn.db_type]}) AS v")
    return str(df.first()[0])
