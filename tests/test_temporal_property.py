"""Property-based check of asof_join against pandas.merge_asof — the
semantics contract the operator's docstring claims (backward / forward
/ nearest, tolerance, left-outer) verified on arbitrary inputs.

Timestamps are plain doubles here: the TIMESTAMP/TIMESTAMP_NTZ reading
path is covered by the gate + oracle tests; this file pins down the
matching LOGIC, which is type-independent.
"""

from __future__ import annotations

import math

import pandas as pd
import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

keys = st.integers(0, 2)
times = st.integers(0, 50)

left_rows = st.lists(st.tuples(keys, times), min_size=1, max_size=25)
right_rows = st.lists(
    st.tuples(keys, times, st.integers(-100, 100)), min_size=1, max_size=25,
    # one row per (key, ts): duplicate-ts tie order is explicitly
    # unspecified by the operator (docstring: pre-aggregate if it matters)
    unique_by=lambda t: (t[0], t[1]),
)


def _reference(left, right, direction, tolerance):
    lf = pd.DataFrame(sorted(left), columns=["k", "ts"]).astype(
        {"ts": "float64"}
    )
    rf = pd.DataFrame(sorted(right), columns=["k", "ts", "v"]).astype(
        {"ts": "float64"}
    )
    merged = pd.merge_asof(
        lf.sort_values("ts", kind="stable"),
        rf.sort_values("ts", kind="stable").rename(
            columns={"ts": "rts"}
        ),
        left_on="ts",
        right_on="rts",
        by="k",
        direction=direction,
        tolerance=tolerance,
    )
    out = {}
    for r in merged.itertuples():
        key = (r.k, r.ts)
        v = None if (isinstance(r.v, float) and math.isnan(r.v)) else int(r.v)
        out.setdefault(key, []).append(v)
    return out


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    left=left_rows,
    right=right_rows,
    direction=st.sampled_from(["backward", "forward", "nearest"]),
    tolerance=st.sampled_from([None, 5.0]),
)
def test_asof_matches_pandas_merge_asof(spark, left, right, direction, tolerance):
    from aqueducts_spark.operators.temporal import asof_join

    ldf = spark.createDataFrame(
        [(k, float(t)) for k, t in left], "k long, ts double"
    )
    rdf = spark.createDataFrame(
        [(k, float(t), v) for k, t, v in right], "k long, ts double, v long"
    )
    got_rows = asof_join(
        ldf, rdf, on=["k"], left_ts="ts", right_ts="ts",
        value_cols=["v"], direction=direction,
        tolerance_seconds=tolerance,
    ).collect()
    got = {}
    for r in got_rows:
        got.setdefault((r.k, r.ts), []).append(
            None if r.matched_v is None else int(r.matched_v)
        )
    want = _reference(left, right, direction, tolerance)
    assert {k: sorted(v, key=lambda x: (x is None, x)) for k, v in got.items()} == {
        k: sorted(v, key=lambda x: (x is None, x)) for k, v in want.items()
    }
