"""Logical-plan-level helpers: auto-LIMIT, safety gating, mandatory filters."""

from etl_generator_demo_spark.plans.limits import apply_auto_limit, plan_has_limit  # noqa: F401
from etl_generator_demo_spark.plans.safety import SafetyVerdict, validate_sql_safety  # noqa: F401
