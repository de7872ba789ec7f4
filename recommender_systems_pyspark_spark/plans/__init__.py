from .guardrails import (  # noqa: F401
    PlanScalabilityError,
    assert_scalable,
    plan_indicators,
    scalability_findings,
)
