"""Stage-SQL validation: only read-only query statements are allowed.

The reference denies DDL/DML/SET statements in stage queries
(aqueducts/core/src/stages/mod.rs:53-56) and pre-validates every stage
query at load time with the SQL parser
(aqueducts/core/src/templating.rs:286-330).

Without a SQL parser dependency we do this in two layers:

1. load-time: a statement-class check on the leading keyword(s) of each
   top-level statement (comments and CTE prefixes stripped) — rejects
   DDL/DML/SET/multi-statement scripts;
2. run-time: ``spark.sql`` itself parses the query; Catalyst analysis
   errors carry the stage name in our wrapped error.
"""

from __future__ import annotations

import re

_ALLOWED_LEADING = ("select", "with", "values", "table", "from")
# `from` : Spark SQL supports the FROM-first select syntax (`FROM t SELECT ...`).

_DENIED = (
    "insert", "update", "delete", "merge", "create", "drop", "alter",
    "truncate", "replace", "set", "reset", "use", "grant", "revoke",
    "analyze", "refresh", "cache", "uncache", "msck", "load", "copy",
    "vacuum", "optimize", "call", "declare", "begin", "commit", "rollback",
)

_LINE_COMMENT = re.compile(r"--[^\n]*")
_BLOCK_COMMENT = re.compile(r"/\*.*?\*/", re.DOTALL)


class StageSqlError(ValueError):
    def __init__(self, stage_name: str, message: str):
        self.stage_name = stage_name
        super().__init__(f"stage '{stage_name}': {message}")


def _strip_comments(sql: str) -> str:
    return _LINE_COMMENT.sub(" ", _BLOCK_COMMENT.sub(" ", sql))


def _split_statements(sql: str) -> list[str]:
    """Split on top-level semicolons (outside quotes)."""
    parts: list[str] = []
    current: list[str] = []
    quote: str | None = None
    i = 0
    while i < len(sql):
        ch = sql[i]
        if quote is not None:
            current.append(ch)
            if ch == quote:
                if i + 1 < len(sql) and sql[i + 1] == quote:  # escaped ''
                    current.append(sql[i + 1])
                    i += 1
                else:
                    quote = None
        elif ch in ("'", '"', "`"):
            quote = ch
            current.append(ch)
        elif ch == ";":
            parts.append("".join(current))
            current = []
        else:
            current.append(ch)
        i += 1
    parts.append("".join(current))
    return [p.strip() for p in parts if p.strip()]


def validate_stage_sql(sql: str, stage_name: str = "<stage>") -> None:
    """Raise :class:`StageSqlError` unless ``sql`` is a single read-only query."""
    stripped = _strip_comments(sql).strip()
    if not stripped:
        raise StageSqlError(stage_name, "empty query")
    statements = _split_statements(stripped)
    if len(statements) > 1:
        raise StageSqlError(
            stage_name, f"multiple statements not allowed ({len(statements)} found)"
        )
    first_word_m = re.match(r"[A-Za-z_]+", statements[0].lstrip("( \t\r\n"))
    if not first_word_m:
        raise StageSqlError(stage_name, "cannot determine statement type")
    head = first_word_m.group(0).lower()
    if head in _DENIED:
        raise StageSqlError(
            stage_name,
            f"statement type '{head.upper()}' is not allowed in stages "
            "(DDL/DML/SET are blocked; stages must be read-only queries)",
        )
    if head not in _ALLOWED_LEADING:
        raise StageSqlError(stage_name, f"unsupported statement leading keyword: {head}")


def spark_parse_check(spark, sql: str, stage_name: str = "<stage>") -> None:
    """Parse (not execute) ``sql`` with Spark's own parser for early errors."""
    try:
        spark._jsparkSession.sessionState().sqlParser().parsePlan(sql)
    except Exception as exc:  # py4j wraps ParseException
        raise StageSqlError(stage_name, f"SQL parse error: {exc}") from None
