"""Plan introspection and scale-safety auditing (see plans/audit.py)."""

from sql_cdc_spark.plans.audit import (  # noqa: F401
    PlanFlags,
    assert_scale_safe,
    audit_registry,
    plan_flags,
)
