"""Property tests for the SQL guard's contextual write-keyword denial.

Invariants:

1. SOUNDNESS — every CTE/FROM-prefixable DML statement Spark's grammar
   accepts (`WITH ... INSERT INTO/OVERWRITE | DELETE FROM | UPDATE |
   MERGE INTO`) is rejected no matter how the CTE prefix is shaped
   (nesting, multiple CTEs, comments, strings containing brackets).
2. PRECISION — a read-only SELECT whose identifiers are DML verbs in
   non-continuation positions is accepted (the r2 false-positive class).
3. The two compose: wrapping an accepted SELECT as a CTE body of a DML
   statement flips it to rejected.
"""

from __future__ import annotations

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from aqueducts_spark.sql_guard import StageSqlError, validate_stage_sql

DML_VERBS = ["update", "delete", "merge", "insert", "drop", "truncate",
             "alter", "grant", "revoke", "msck"]

# identifier positions where a DML verb can legitimately appear in a
# read-only query without its DML continuation
_SAFE_TEMPLATES = [
    "SELECT {w} FROM t",
    "SELECT t.{w} FROM t",
    "SELECT a AS {w} FROM t WHERE b = 1",
    "SELECT count(*) FROM t GROUP BY {w}",
    "SELECT * FROM t ORDER BY {w} DESC",
    "SELECT {w}, {w2} FROM t",
    "WITH c AS (SELECT {w} FROM t) SELECT * FROM c",
    "SELECT * FROM t WHERE {w} > 0 AND {w2} IS NULL",
    "SELECT sum({w}) AS s FROM t HAVING sum({w}) > 1",
]

# `delete`/`insert`/`merge` immediately before FROM/INTO/OVERWRITE are
# the documented residual ambiguity (backquote required) — detect and
# exclude those adjacent pairings from the acceptance property
def _no_denied_bigram(rendered: str) -> bool:
    toks = [
        t.split(".")[-1]
        for t in rendered.lower().replace(",", " ").replace("(", " ").replace(")", " ").split()
    ]
    for i, tok in enumerate(toks[:-1]):
        if (tok, toks[i + 1]) in {("insert", "into"), ("insert", "overwrite"),
                                  ("merge", "into"), ("delete", "from")}:
            return False
    return True


@given(
    template=st.sampled_from(_SAFE_TEMPLATES),
    verb=st.sampled_from(DML_VERBS),
    verb2=st.sampled_from(DML_VERBS),
)
@settings(max_examples=300, deadline=None)
def test_dml_verbs_as_identifiers_accepted(template, verb, verb2):
    sql = template.format(w=verb, w2=verb2)
    if not _no_denied_bigram(sql):
        return  # documented residual ambiguity: requires backquoting
    validate_stage_sql(sql)  # must not raise


_CTE_BODIES = [
    "SELECT 1",
    "SELECT 'a)b' AS s",
    "SELECT * FROM (SELECT 2) q",
    "SELECT 1 /* ) */",
    "SELECT ')' AS paren",
]

_DML_SUFFIXES = [
    "INSERT INTO prod.t SELECT * FROM c",
    "INSERT OVERWRITE TABLE t SELECT * FROM c",
    "DELETE FROM t WHERE a IN (SELECT a FROM c)",
    "UPDATE t SET a = 1",
    "MERGE INTO t USING c ON t.a = c.a WHEN MATCHED THEN DELETE",
]

_GAPS = ["", " ", "\n", " -- note\n", " /* c */ ", "\t"]


@given(
    bodies=st.lists(st.sampled_from(_CTE_BODIES), min_size=1, max_size=3),
    dml=st.sampled_from(_DML_SUFFIXES),
    gap=st.sampled_from(_GAPS),
)
@settings(max_examples=300, deadline=None)
def test_cte_prefixed_dml_always_rejected(bodies, dml, gap):
    ctes = ", ".join(f"c{i} AS ({b})" for i, b in enumerate(bodies))
    sql = f"WITH {ctes}{gap}{dml}"
    with pytest.raises(StageSqlError):
        validate_stage_sql(sql)


@given(
    template=st.sampled_from(_SAFE_TEMPLATES),
    verb=st.sampled_from(DML_VERBS),
    dml=st.sampled_from(_DML_SUFFIXES),
)
@settings(max_examples=200, deadline=None)
def test_accepted_select_flips_to_rejected_as_cte_of_dml(template, verb, dml):
    body = template.format(w=verb, w2="zz")
    if not _no_denied_bigram(body):
        return
    validate_stage_sql(body)
    with pytest.raises(StageSqlError):
        validate_stage_sql(f"WITH c AS ({body}) {dml}")
