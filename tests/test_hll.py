"""HyperLogLog sketch (operators/sketch.py).

Covers: bit-exact construction vs a pure-Python reference (the same
contract the DuckDB gate oracle verifies cross-engine), estimate
accuracy on a large group, the linear-counting small-range branch,
merge law (HLL(A ∪ B) == merge(HLL(A), HLL(B))), the m-consistency
guard, the xxhash64 fast path, plan shape (ONE shuffle, no Python),
and the declarative registry stage.
"""

import hashlib
import math

import pytest
from pyspark.sql import functions as F

from aqueducts_spark.operators.sketch import (
    hll_distinct,
    hll_estimate,
    hll_sketch,
    merge_hll_sketches,
)


@pytest.fixture(scope="module")
def toy(spark):
    # group "small": 20 distinct values repeated; group "big": 5000
    rows = [("small", v % 20) for v in range(100)] + [
        ("big", v) for v in range(5000)
    ]
    return spark.createDataFrame(rows, "grp string, v long")


def _py_registers(values, m):
    """Pure-Python reference for the md5 construction."""
    regs = {}
    for v in values:
        dg = hashlib.md5(str(v).encode()).hexdigest()
        reg = int(dg[:4], 16) % m
        w = int(dg[4:19], 16)
        rho = 61 if w == 0 else 61 - w.bit_length()
        regs[reg] = max(regs.get(reg, 0), rho)
    return regs


def _py_estimate(regs, m):
    total = sum(1 << (61 - mx) for mx in regs.values())
    total += (m - len(regs)) * (1 << 61)
    raw = (0.709 if m == 64 else 0.7213 / (1 + 1.079 / m)) * m * m * float(
        1 << 61
    ) / float(total)
    v = m - len(regs)
    if raw <= 2.5 * m and v > 0:
        return m * math.log(m / v)
    return raw


def test_sketch_matches_python_reference(spark, toy):
    sk = hll_sketch(toy, ["grp"], "v", m=64)
    got = {
        (r["grp"], r["reg"]): r["mx"] for r in sk.collect()
    }
    for grp, values in (("small", range(20)), ("big", range(5000))):
        expect = _py_registers(values, 64)
        for reg, mx in expect.items():
            assert got[(grp, reg)] == mx, (grp, reg)


def test_estimate_matches_python_reference(spark, toy):
    est = {
        r["grp"]: r["distinct_est"]
        for r in hll_distinct(toy, ["grp"], "v", m=64).collect()
    }
    for grp, values in (("small", range(20)), ("big", range(5000))):
        expect = round(_py_estimate(_py_registers(values, 64), 64), 4)
        assert est[grp] == pytest.approx(expect, abs=1e-4), grp


def test_estimate_accuracy(spark, toy):
    est = {
        r["grp"]: r["distinct_est"]
        for r in hll_distinct(toy, ["grp"], "v", m=256).collect()
    }
    # HLL standard error ~ 1.04/sqrt(m) ≈ 6.5% at m=256; allow 3 sigma
    assert est["big"] == pytest.approx(5000, rel=0.20)
    # small group stays in the linear-counting regime: near-exact
    assert est["small"] == pytest.approx(20, rel=0.10)


def test_merge_equals_whole(spark, toy):
    a = toy.where("v % 2 = 0")
    b = toy.where("v % 2 = 1")
    merged = hll_estimate(
        merge_hll_sketches(
            [hll_sketch(a, ["grp"], "v", m=64), hll_sketch(b, ["grp"], "v", m=64)],
            ["grp"],
        ),
        ["grp"],
    )
    whole = hll_distinct(toy, ["grp"], "v", m=64)
    assert sorted(map(tuple, merged.collect())) == sorted(
        map(tuple, whole.collect())
    )


def test_m_validation(spark, toy):
    for bad in (8, 48, 131072):
        with pytest.raises(ValueError, match="power of two"):
            hll_sketch(toy, ["grp"], "v", m=bad)


def test_m_mismatch_guard(spark, toy):
    sk = hll_sketch(toy, ["grp"], "v", m=64)
    with pytest.raises(Exception) as exc:
        hll_estimate(sk, ["grp"], m=128).collect()
    assert "contradicts" in str(exc.value)


def test_duplicate_register_rows_raise(spark, toy):
    # two windows' register rows estimated WITHOUT merging first: the
    # duplicate registers must fail loudly, not return a negative est
    a = hll_sketch(toy.where("v % 2 = 0"), ["grp"], "v", m=64)
    b = hll_sketch(toy.where("v % 2 = 1"), ["grp"], "v", m=64)
    stacked = a.unionByName(b)
    with pytest.raises(Exception) as exc:
        hll_estimate(stacked, ["grp"]).collect()
    assert "merge_hll_sketches" in str(exc.value)


def test_nulls_ignored(spark):
    df = spark.createDataFrame(
        [("g", 1), ("g", 2), ("g", None)], "grp string, v long"
    )
    rows = hll_distinct(df, ["grp"], "v", m=64).collect()
    assert rows[0]["n_registers"] == 2


def test_xxhash64_path(spark, toy):
    est = {
        r["grp"]: r["distinct_est"]
        for r in hll_distinct(toy, ["grp"], "v", m=256, hash_fn="xxhash64").collect()
    }
    assert est["big"] == pytest.approx(5000, rel=0.20)
    assert est["small"] == pytest.approx(20, rel=0.10)


def test_single_shuffle_no_python(spark, sf_dir):
    from aqueducts_spark.plans import inspect_plan

    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    info = inspect_plan(hll_sketch(li, ["l_returnflag"], "l_orderkey", m=64))
    assert info.exchanges == 1, f"{info.exchanges} exchanges\n{info.text[:1500]}"
    assert info.python_evals == 0


def test_registry_stage(spark, sf_dir):
    from aqueducts_spark.operators.registry import run_operator

    spark.read.parquet(f"{sf_dir}/orders.parquet").createOrReplaceTempView(
        "hll_orders"
    )
    out = run_operator(
        spark,
        {
            "type": "hll_distinct",
            "input": "hll_orders",
            "options": {
                "group_cols": ["o_orderpriority"],
                "value_col": "o_custkey",
                "m": 64,
            },
        },
    )
    rows = out.collect()
    assert set(out.columns) == {"o_orderpriority", "n_registers", "distinct_est"}
    assert all(r["n_registers"] <= 64 for r in rows)
    assert len(rows) == 5
    spark.catalog.dropTempView("hll_orders")


def test_duplicate_registers_under_m_raise(spark, toy):
    # the "small" group (20 distinct values) never saturates m=64, so
    # two stacked window slices total ~19 register rows — the silent
    # path a bare n_registers <= m check misses (verified: the halves
    # share 2 registers); count-vs-count_distinct catches it
    small = toy.where("grp = 'small'")
    a = hll_sketch(small.where("v % 2 = 0"), ["grp"], "v", m=64)
    b = hll_sketch(small.where("v % 2 = 1"), ["grp"], "v", m=64)
    with pytest.raises(Exception) as exc:
        hll_estimate(a.unionByName(b), ["grp"]).collect()
    assert "merge_hll_sketches" in str(exc.value)


def test_empty_sketch_estimates_empty(spark, toy):
    # no rows (or all-NULL values) is a valid sketch: estimate is
    # empty with the contract schema, not a "mixed m values []" error
    empty = hll_sketch(toy.where("v < 0"), ["grp"], "v", m=64)
    out = hll_estimate(empty, ["grp"])
    assert out.collect() == []
    assert [f.name for f in out.schema.fields] == [
        "grp",
        "n_registers",
        "distinct_est",
    ]


def test_reserved_column_clash_rejected(spark):
    # a frame whose own 'reg' column is e.g. a region code must be
    # rejected loudly, not silently grouped by hash registers
    df = spark.createDataFrame([("east", 1)], "reg string, v long")
    with pytest.raises(ValueError, match="reserved"):
        hll_sketch(df, ["reg"], "v", m=64)
    df2 = spark.createDataFrame([("x", 1)], "mx string, v long")
    with pytest.raises(ValueError, match="reserved"):
        hll_sketch(df2, ["mx"], "v", m=64)


def test_null_m_rows_rejected(spark, toy):
    sk = hll_sketch(toy, ["grp"], "v", m=64)
    broken = sk.withColumn(
        "m", F.when(F.col("reg") % 2 == 0, F.col("m"))
    )
    # carried-m path: loud ValueError, not a TypeError from sorted(None)
    with pytest.raises(ValueError, match="NULL m"):
        hll_estimate(broken, ["grp"])
    # explicit-m path: execution guard catches the NULL-m rows too
    with pytest.raises(Exception):
        hll_estimate(broken, ["grp"], m=64).collect()


def test_merge_mixed_m_raises_at_merge_time(spark, toy):
    a = hll_sketch(toy, ["grp"], "v", m=64)
    b = hll_sketch(toy, ["grp"], "v", m=128)
    with pytest.raises(Exception) as exc:
        merge_hll_sketches([a, b], ["grp"]).collect()
    assert "merge_hll_sketches" in str(exc.value)
    assert "different" in str(exc.value)


def test_merge_mixed_m_raises_even_under_full_register_collision(spark):
    # the case the downstream estimator guard CANNOT catch: every
    # register of the larger-m sketch collides with one of the
    # smaller-m sketch, so per-register min(m) erases the conflict
    # and every merged row would carry m=64 uniformly.  The merge-time
    # guard must trip anyway.
    a = spark.createDataFrame(
        [("g", r, 5, 64) for r in range(4)],
        "grp string, reg int, mx int, m int",
    )
    b = spark.createDataFrame(
        [("g", r, 7, 128) for r in range(4)],
        "grp string, reg int, mx int, m int",
    )
    with pytest.raises(Exception) as exc:
        merge_hll_sketches([a, b], ["grp"]).collect()
    assert "merge_hll_sketches" in str(exc.value)


def test_merge_null_m_raises(spark, toy):
    a = hll_sketch(toy, ["grp"], "v", m=64)
    b = a.withColumn("m", F.lit(None).cast("int"))
    with pytest.raises(Exception) as exc:
        merge_hll_sketches([a, b], ["grp"]).collect()
    assert "merge_hll_sketches" in str(exc.value)


def test_merge_of_empty_sketches_is_empty_not_an_error(spark, toy):
    empty = hll_sketch(toy.where("v < 0"), ["grp"], "v", m=64)
    assert merge_hll_sketches([empty, empty], ["grp"]).count() == 0


def test_merge_is_single_pass_and_lazy(spark, toy):
    # review r7: the m-guard must ride the merge's OWN aggregation —
    # no second scan of the input lineage, no crossJoin, and the merge
    # stays fully lazy (no jobs run at call time)
    a = hll_sketch(toy, ["grp"], "v", m=64)
    before = spark.sparkContext.statusTracker().getJobIdsForGroup(None)
    merged = merge_hll_sketches([a, a], ["grp"])
    after = spark.sparkContext.statusTracker().getJobIdsForGroup(None)
    assert len(after) == len(before)  # lazy: nothing executed
    plan = merged._sc._jvm.PythonSQLUtils.explainString(
        merged._jdf.queryExecution(), "formatted"
    )
    assert "CartesianProduct" not in plan and "NestedLoop" not in plan
    # the union subtree appears ONCE in the plan TREE (formatted plans
    # repeat every node in the details section below the tree)
    tree = plan.split("\n\n(")[0]
    assert tree.count("Union") == 1
