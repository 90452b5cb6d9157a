from decisions_kinesis_spark.plans.audit import (  # noqa: F401
    PlanAudit,
    audit_plan,
)
