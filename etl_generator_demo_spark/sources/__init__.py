"""External sources & mutation helpers (JDBC, parquet rewrite DML)."""
