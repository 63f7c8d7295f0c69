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
        """TOP-LEVEL column sets actually read by each parquet scan
        (nested struct field names are not scan columns: matching every
        ``name:`` would count ``meta:struct<ts:bigint>`` as {meta, ts})."""
        out = []
        for schema in self.read_schemas:
            cols: set[str] = set()
            depth = 0
            token = ""
            # schema text: struct<a:bigint,meta:struct<ts:bigint>,...>
            body = schema.strip()
            if body.startswith("struct<") and body.endswith(">"):
                body = body[len("struct<"):-1]
            for ch in body:
                if ch == "<":
                    depth += 1
                elif ch == ">":
                    depth -= 1
                elif depth == 0 and ch == ":":
                    if token.strip():
                        cols.add(token.strip())
                    token = ""
                    continue
                elif depth == 0 and ch == ",":
                    token = ""
                    continue
                if depth == 0 and ch not in "<>,:":
                    token += ch
            out.append(cols)
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
    # every node that ships rows through a Python worker: scalar UDFs
    # (Batch/ArrowEvalPython), mapInPandas/mapInArrow, grouped-map and
    # grouped-agg pandas UDFs, window pandas UDFs, and stateful
    # applyInPandas — missing any of these lets a Python boundary pass
    # the operators' "python_evals == 0" plan gates unnoticed
    info.python_evals = len(
        re.findall(
            r"\(\d+\) (?:BatchEvalPython|ArrowEvalPython|MapInPandas"
            r"|MapInArrow|FlatMapGroupsInPandas|FlatMapGroupsInArrow"
            r"|AggregateInPandas|ArrowAggregatePython|WindowInPandas"
            r"|ArrowWindowPython|FlatMapGroupsInPandasWithState)",
            text,
        )
    )
    return info


def lint_plan(df: DataFrame) -> list[str]:
    """Scale anti-pattern warnings for a physical plan — the checks a
    reviewer would run before pointing a query at 100 TB. Returns
    human-readable warnings (empty list = clean).

    Wired into the stage ``explain`` flag so every explained stage gets
    its lint report for free; also usable standalone on any DataFrame.
    """
    return lint_info(inspect_plan(df))


def lint_info(info: PlanInfo) -> list[str]:
    """Lint an already-inspected plan (callers holding a PlanInfo avoid
    a second explainString round-trip)."""
    text = info.text
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
    # the node's detail block (between "(N) Coalesce" and the next
    # "(N) <Node>") contains an Input [...] line that exceeds any fixed
    # char window on wide schemas — bound the search by the next node
    # header instead
    coalesce_one = any(
        re.search(r"^Arguments: 1\b", block, flags=re.M)
        for block in re.split(r"(?=\(\d+\) )", text)
        if block.startswith("(") and re.match(r"\(\d+\) Coalesce\b", block)
    )
    if coalesce_one:
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
