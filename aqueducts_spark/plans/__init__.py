from .inspect import (
    PlanInfo,
    explain_formatted,
    inspect_plan,
    lint_plan,
)

__all__ = ["PlanInfo", "explain_formatted", "inspect_plan", "lint_plan"]
