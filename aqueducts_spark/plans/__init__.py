from .inspect import (
    PlanInfo,
    explain_formatted,
    inspect_plan,
)

__all__ = ["PlanInfo", "explain_formatted", "inspect_plan"]
