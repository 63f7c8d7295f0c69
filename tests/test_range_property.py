"""Property-based check of range_join against a brute-force reference:
the bucketed equi-join encoding must produce exactly the pairs the
naive interval predicate produces, for arbitrary timestamps, keys, and
interval bounds (including negative lower bounds)."""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

left_rows = st.lists(
    st.tuples(st.integers(0, 2), st.integers(0, 100)),
    min_size=1,
    max_size=20,
)
right_rows = st.lists(
    st.tuples(st.integers(0, 2), st.integers(0, 100), st.integers(0, 99)),
    min_size=1,
    max_size=20,
)
bounds = st.tuples(
    st.integers(-20, 19), st.integers(-19, 20)
).filter(lambda t: t[1] > t[0])


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(left=left_rows, right=right_rows, bounds=bounds)
def test_range_join_matches_bruteforce(spark, left, right, bounds):
    from aqueducts_spark.operators.temporal import range_join

    lo, hi = float(bounds[0]), float(bounds[1])
    ldf = spark.createDataFrame(
        [(k, float(t)) for k, t in left], "k long, ts double"
    )
    rdf = spark.createDataFrame(
        [(k, float(t), v) for k, t, v in right], "k long, rts double, v long"
    )
    got = sorted(
        (r.k, r.ts, r.rts, r.v)
        for r in range_join(
            ldf, rdf, "ts", "rts", lo, hi, on=["k"]
        ).collect()
    )
    want = sorted(
        (lk, float(lt), float(rt), v)
        for lk, lt in left
        for rk, rt, v in right
        if lk == rk and lt + lo <= rt <= lt + hi
    )
    assert got == want
