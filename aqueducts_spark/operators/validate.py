"""Declarative data-quality validation (expectations).

A rule list is compiled into ONE aggregation pass over the table —
every row-level check becomes a conditional-sum expression in the same
``agg`` (so a 100 TB validation run costs one scan + one tiny
all-to-one reduce of counter scalars, not one job per rule).
``unique`` checks ride in the same aggregation as
``count(col) - count(DISTINCT col)`` — note Spark plans mixed
distinct/non-distinct aggregates with an Expand (each scanned row is
replicated once per distinct group), so on very large tables prefer a
separate validation pass for many ``unique`` rules.

The output is one row per rule — ``(column, check, violations, total,
pass)`` — the shape every expectations framework (dbt tests, Great
Expectations, Deequ) converges on, and trivially exact against a SQL
oracle.

Checks:

* ``not_null``                 — value IS NULL
* ``unique``                   — duplicate non-null values (count - distinct)
* ``min`` / ``max``            — value < / > the bound (NULLs don't violate)
* ``in_set``                   — value not in the accepted list (non-null)
* ``regex``                    — value does not fully match (non-null);
  ``mode: contains`` switches to substring (bare ``rlike``) semantics.
  NOTE (release v0.3): before v0.2 ``regex`` was a bare ``rlike``
  substring match; the contract is now anchored full-match by default —
  pipelines that relied on containment should set ``mode: contains``.
* ``max_length``               — string longer than the bound

There is deliberately no row-level "which rows failed" output here:
that is a filter the caller can express directly, while the counter
report is the scale-safe summary artifact.
"""

from __future__ import annotations

from typing import Any, Mapping, Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["validate_rules", "ValidationError"]

_CHECKS = {"not_null", "unique", "min", "max", "in_set", "regex", "max_length"}


class ValidationError(ValueError):
    pass


def _violation_expr(
    c: Column, check: str, value: Any, mode: str | None = None
) -> Column:
    """Boolean column: this row violates the rule (``c`` is the actual
    dataframe column — resolving by NAME via F.col would misroute a
    column literally named 'a.b' to a struct field)."""
    if check == "not_null":
        return c.isNull()
    if check == "min":
        return c.isNotNull() & (c < F.lit(value))
    if check == "max":
        return c.isNotNull() & (c > F.lit(value))
    if check == "in_set":
        vals = [F.lit(v) for v in value]
        return c.isNotNull() & ~c.isin(*vals)
    if check == "regex":
        # rlike is a SUBSTRING match; the documented contract is
        # full-match by default, so anchor the caller's pattern.
        # mode=contains keeps bare-rlike containment (the pre-v0.2
        # behavior) for pipelines that relied on it.
        if mode == "contains":
            return c.isNotNull() & ~c.cast("string").rlike(str(value))
        return c.isNotNull() & ~c.cast("string").rlike(f"^(?:{value})$")
    if check == "max_length":
        return c.isNotNull() & (F.length(c.cast("string")) > int(value))
    raise ValidationError(f"unknown check: {check!r}")


def validate_rules(
    df: DataFrame, rules: Sequence[Mapping[str, Any]]
) -> DataFrame:
    """Run every rule in one aggregation pass; returns
    ``(column, check, violations, total, pass)`` with one row per rule
    in the caller's rule order (``rule_no`` makes the order explicit
    and the output deterministically sortable).
    """
    if not rules:
        raise ValidationError("validate_rules: rules must be non-empty")

    def _col(name):
        # backtick-quoted reference: both F.col(name) AND df[name]
        # resolve dots as struct access, so a column literally named
        # 'a.b' would silently validate the struct field instead
        return df["`" + name.replace("`", "``") + "`"]

    cols = set(df.columns)
    aggs = [F.count(F.lit(1)).alias("_total")]
    for i, rule in enumerate(rules):
        column = rule.get("column")
        check = rule.get("check")
        if not column or column not in cols:
            raise ValidationError(
                f"rule {i}: unknown column {column!r} (have {sorted(cols)})"
            )
        if check not in _CHECKS:
            raise ValidationError(
                f"rule {i}: unknown check {check!r} (have {sorted(_CHECKS)})"
            )
        if check in {"min", "max", "in_set", "regex", "max_length"} and (
            rule.get("value") is None
        ):
            # an explicit null value (YAML 'value:') would compile to a
            # comparison against NULL that never fires — the rule would
            # silently always pass
            raise ValidationError(f"rule {i}: check {check!r} requires 'value'")
        mode = rule.get("mode")
        if mode is not None and (check != "regex" or mode not in ("full", "contains")):
            raise ValidationError(
                f"rule {i}: 'mode' is only valid for regex checks with "
                f"values 'full'|'contains', got {mode!r} for {check!r}"
            )
        if check == "in_set" and isinstance(rule.get("value"), (str, bytes)):
            # iterating a string would silently check CHARACTERS
            # ('US' -> isin('U','S')) — wrong counts with no error
            raise ValidationError(
                f"rule {i}: in_set value must be a list of accepted "
                f"values, got the string {rule['value']!r}"
            )
        if check == "in_set" and any(
            v is None for v in (rule.get("value") or [])
        ):
            # three-valued logic: isin(..., NULL) returns NULL for every
            # non-member, ~NULL is NULL, and the violation count reads 0
            # — the rule would silently ALWAYS pass.  NULL acceptance is
            # what omitting not_null already means.
            raise ValidationError(
                f"rule {i}: in_set value list must not contain null "
                "(SQL three-valued logic would make the rule always "
                "pass); NULLs are governed by the not_null check"
            )
        if check == "unique":
            aggs.append(
                (
                    F.count(_col(column))
                    - F.count_distinct(_col(column))
                ).alias(f"_v{i}")
            )
        else:
            aggs.append(
                F.sum(
                    F.when(
                        _violation_expr(_col(column), check, rule.get("value"), mode),
                        1,
                    ).otherwise(0)
                ).alias(f"_v{i}")
            )
    summary = df.agg(*aggs)
    # one summary row -> one output row per rule (stack is a no-shuffle
    # projection over the single aggregated row)
    def _sql_lit(v: str) -> str:
        # column names are user data; a quote inside one must not break
        # the stack() projection
        return "'" + str(v).replace("\\", "\\\\").replace("'", "\\'") + "'"

    parts = []
    for i, rule in enumerate(rules):
        parts.append(f"{i}L")
        parts.append(_sql_lit(rule["column"]))
        parts.append(_sql_lit(rule["check"]))
        parts.append(f"CAST(coalesce(_v{i}, 0) AS BIGINT)")
    stack = (
        f"stack({len(rules)}, " + ", ".join(parts) + ") AS "
        "(rule_no, column, check, violations)"
    )
    return summary.select(
        F.expr(stack), F.col("_total").cast("bigint").alias("total")
    ).select(
        "rule_no",
        "column",
        "check",
        "violations",
        "total",
        (F.col("violations") == 0).alias("pass"),
    )
