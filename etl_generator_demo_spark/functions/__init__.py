"""Engine-level helper functions (surrogate keys, grouping markers)."""

from etl_generator_demo_spark.functions.keys import with_surrogate_key  # noqa: F401
