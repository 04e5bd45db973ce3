"""Physical-plan inspection: the tooling used to keep every operator's plan
scale-honest (pushdown reaches the scan, small dims broadcast, codegen spans
stay wide, no accidental cartesian products)."""

from .inspect import explain_str, plan_report, PlanReport  # noqa: F401
