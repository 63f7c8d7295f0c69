"""Physical-plan inspection helpers.

The reference exposes EXPLAIN / EXPLAIN ANALYZE through stage flags
(aqueducts/core/src/stages/mod.rs:73-99); beyond that parity this
module makes plan *quality* checkable in code and tests: every operator
we ship asserts its plan shape (filters pushed into scans, projections
pruned, dimension joins broadcast, bounded exchange counts) so a
regression that silently de-optimizes a plan fails CI — the properties
that decide whether a query survives a 100 TB input.
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field

from pyspark.sql import DataFrame


def explain_formatted(df: DataFrame) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )


@dataclass
class PlanInfo:
    text: str
    pushed_filters: list[str] = field(default_factory=list)
    read_schemas: list[str] = field(default_factory=list)
    broadcast_joins: int = 0
    sort_merge_joins: int = 0
    shuffle_hash_joins: int = 0
    nested_loop_joins: int = 0
    exchanges: int = 0
    python_evals: int = 0

    def scan_columns(self) -> list[set[str]]:
        """Column sets actually read by each parquet scan."""
        out = []
        for schema in self.read_schemas:
            out.append(set(re.findall(r"(\w+):", schema)))
        return out


def inspect_plan(df: DataFrame) -> PlanInfo:
    text = explain_formatted(df)
    info = PlanInfo(text=text)
    for line in text.splitlines():
        stripped = line.strip()
        if stripped.startswith("PushedFilters:"):
            info.pushed_filters.append(stripped[len("PushedFilters:"):].strip())
        elif stripped.startswith("ReadSchema:"):
            info.read_schemas.append(stripped[len("ReadSchema:"):].strip())
    info.broadcast_joins = len(re.findall(r"\(\d+\) BroadcastHashJoin", text))
    info.sort_merge_joins = len(re.findall(r"\(\d+\) SortMergeJoin", text))
    info.shuffle_hash_joins = len(re.findall(r"\(\d+\) ShuffledHashJoin", text))
    info.nested_loop_joins = len(re.findall(r"\(\d+\) BroadcastNestedLoopJoin", text))
    info.exchanges = len(re.findall(r"\(\d+\) Exchange", text))
    info.python_evals = len(
        re.findall(r"\(\d+\) (?:BatchEvalPython|ArrowEvalPython|MapInPandas)", text)
    )
    return info
