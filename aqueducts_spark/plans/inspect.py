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


def lint_plan(df: DataFrame) -> list[str]:
    """Scale anti-pattern warnings for a physical plan — the checks a
    reviewer would run before pointing a query at 100 TB. Returns
    human-readable warnings (empty list = clean).

    Wired into the stage ``explain`` flag so every explained stage gets
    its lint report for free; also usable standalone on any DataFrame.
    """
    info = inspect_plan(df)
    text = info.text  # one explainString round-trip, not two
    warnings: list[str] = []
    if re.search(r"\(\d+\) CartesianProduct", text):
        warnings.append(
            "CartesianProduct: O(n*m) cross join — add an equi-join key or "
            "broadcast the small side explicitly"
        )
    if info.nested_loop_joins:
        warnings.append(
            f"BroadcastNestedLoopJoin x{info.nested_loop_joins}: non-equi join "
            "predicate scans every (row, broadcast-row) pair — re-encode as an "
            "equi-join (bucketed range_join / asof_join) if the input is large"
        )
    if re.search(r"\(\d+\) BatchEvalPython", text):
        warnings.append(
            "BatchEvalPython: row-at-a-time Python UDF in the plan — rewrite "
            "with built-in functions or an Arrow-batched pandas UDF (10-100x)"
        )
    # a range-partitioned global sort that is not a top-k (formatted
    # mode splits node names from their arguments, so match the
    # partitioning argument itself)
    if (
        re.search(r"rangepartitioning\(", text)
        and not re.search(r"TakeOrderedAndProject", text)
        and not re.search(r"\(\d+\) Window", text)
    ):
        warnings.append(
            "global sort (Exchange rangepartitioning): whole-dataset ordering "
            "is rarely needed — use ORDER BY+LIMIT (top-k), sortWithinPartitions, "
            "or drop the ordering"
        )
    # formatted mode splits the node name from its argument ("(N)
    # Coalesce" + "Arguments: 1" in the detail block) — match the pair,
    # not "Coalesce 1" (never printed) or "coalesce(1)" (matches the
    # scalar COALESCE function)
    if re.search(r"\(\d+\) Coalesce\b[\s\S]{0,200}?Arguments: 1\b", text):
        warnings.append(
            "coalesce(1): single-task funnel — acceptable only for small "
            "summary outputs (single_file destinations)"
        )
    if info.exchanges >= 6:
        warnings.append(
            f"{info.exchanges} exchanges: consider pre-partitioned/bucketed "
            "inputs or reusing a partitioning across stages"
        )
    return warnings
