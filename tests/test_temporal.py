"""As-of join and range join: semantics, tolerance, and plan shape.

The plan assertions are the point at scale: an as-of join must be ONE
shuffle (union + window), and a range join must be an equi-join — a
BroadcastNestedLoopJoin would be O(n*m) at 100 TB.
"""

from datetime import datetime

import pytest
from pyspark.sql import functions as F

from aqueducts_spark.operators.temporal import asof_join, range_join, time_rollup


def _ts(s):
    return datetime.fromisoformat(s)


@pytest.fixture()
def streams(spark):
    quotes = spark.createDataFrame(
        [
            ("A", _ts("2024-01-01 09:00:00"), 10.0),
            ("A", _ts("2024-01-01 09:00:05"), 11.0),
            ("A", _ts("2024-01-01 09:00:10"), 12.0),
            ("B", _ts("2024-01-01 09:00:03"), 100.0),
        ],
        ["sym", "ts", "px"],
    )
    trades = spark.createDataFrame(
        [
            ("A", _ts("2024-01-01 08:59:59"), 1),  # before any quote
            ("A", _ts("2024-01-01 09:00:05"), 2),  # ties a quote instant
            ("A", _ts("2024-01-01 09:00:07"), 3),  # between quotes
            ("B", _ts("2024-01-01 09:00:04"), 4),
            ("C", _ts("2024-01-01 09:00:04"), 5),  # key with no quotes
        ],
        ["sym", "ts", "qty"],
    )
    return trades, quotes


def test_asof_backward_semantics(spark, streams):
    trades, quotes = streams
    out = asof_join(
        trades, quotes, on=["sym"], left_ts="ts", right_ts="ts", value_cols=["px"]
    )
    got = {r.qty: r.matched_px for r in out.collect()}
    assert got == {1: None, 2: 11.0, 3: 11.0, 4: 100.0, 5: None}
    # left-outer: every trade survives
    assert out.count() == trades.count()


def test_asof_tolerance(spark, streams):
    trades, quotes = streams
    out = asof_join(
        trades, quotes, on=["sym"], left_ts="ts", right_ts="ts",
        value_cols=["px"], tolerance_seconds=1.0,
    )
    got = {r.qty: r.matched_px for r in out.collect()}
    # qty=3 is 2s after the 09:00:05 quote -> outside the 1s horizon
    assert got == {1: None, 2: 11.0, 3: None, 4: 100.0, 5: None}


def test_asof_forward_semantics(spark, streams):
    trades, quotes = streams
    out = asof_join(
        trades, quotes, on=["sym"], left_ts="ts", right_ts="ts",
        value_cols=["px"], direction="forward",
    )
    got = {r.qty: r.matched_px for r in out.collect()}
    # qty=2 ties the 09:00:05 quote instant -> inclusive forward match;
    # qty=3 (09:00:07) -> next quote is 09:00:10 (px 12)
    assert got == {1: 10.0, 2: 11.0, 3: 12.0, 4: None, 5: None}


def test_asof_nearest_semantics(spark, streams):
    trades, quotes = streams
    out = asof_join(
        trades, quotes, on=["sym"], left_ts="ts", right_ts="ts",
        value_cols=["px"], direction="nearest",
    )
    got = {r.qty: r.matched_px for r in out.collect()}
    # qty=1 (08:59:59): only forward exists (09:00:00, px 10)
    # qty=3 (09:00:07): backward 09:00:05 is 2s away, forward 09:00:10
    #   is 3s away -> backward wins
    assert got == {1: 10.0, 2: 11.0, 3: 11.0, 4: 100.0, 5: None}


def test_asof_nearest_against_pandas(spark, streams):
    pd = pytest.importorskip("pandas")
    trades, quotes = streams
    for direction in ("backward", "forward", "nearest"):
        out = asof_join(
            trades, quotes, on=["sym"], left_ts="ts", right_ts="ts",
            value_cols=["px"], direction=direction,
        )
        got = {r.qty: r.matched_px for r in out.collect()}
        tp = trades.toPandas().sort_values("ts")
        qp = quotes.toPandas().sort_values("ts")
        ref = pd.merge_asof(tp, qp, on="ts", by="sym", direction=direction)
        want = {
            int(r.qty): (None if pd.isna(r.px) else float(r.px))
            for r in ref.itertuples()
        }
        assert got == want, direction


def test_asof_single_shuffle_plan(spark, streams):
    trades, quotes = streams
    out = asof_join(
        trades, quotes, on=["sym"], left_ts="ts", right_ts="ts", value_cols=["px"]
    )
    plan = out._jdf.queryExecution().executedPlan().toString()
    # one hashpartitioning exchange (the window's), nothing quadratic
    assert plan.count("Exchange hashpartitioning") == 1, plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan


def test_range_join_semantics(spark, streams):
    trades, quotes = streams
    # quotes within 6 seconds BEFORE each trade, same symbol
    out = range_join(
        trades, quotes, left_ts="ts", right_ts="ts",
        lower_seconds=-6.0, upper_seconds=0.0, on=["sym"],
    )
    got = sorted((r.qty, r.px) for r in out.collect())
    assert got == [(2, 10.0), (2, 11.0), (3, 11.0), (4, 100.0)]


def test_range_join_is_equi_join(spark, streams):
    trades, quotes = streams
    out = range_join(
        trades, quotes, left_ts="ts", right_ts="ts",
        lower_seconds=-6.0, upper_seconds=0.0, on=["sym"],
    )
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan


def test_range_join_point_interval_and_reversed_bounds(spark, streams):
    trades, quotes = streams
    # reversed bounds are invalid
    with pytest.raises(ValueError, match=">= lower"):
        range_join(
            trades, quotes, left_ts="ts", right_ts="ts",
            lower_seconds=1.0, upper_seconds=0.0,
        )
    # equal bounds are the valid POINT interval: exact-offset matches
    point = range_join(
        trades, quotes, left_ts="ts", right_ts="ts",
        lower_seconds=0.0, upper_seconds=0.0,
    )
    got = point.collect()
    # every match has exactly equal timestamps
    for r in got:
        assert r["ts"] == r["r_ts"]


@pytest.mark.parametrize("direction", ["backward", "forward", "nearest"])
def test_asof_property_vs_pandas(spark, direction):
    """Randomized equivalence with pandas merge_asof (the de-facto
    as-of reference semantics), including tolerance."""
    from hypothesis import given, settings, strategies as st
    import pandas as pd

    row = st.tuples(
        st.sampled_from(["a", "b", "c"]),
        st.integers(min_value=0, max_value=50),
        st.integers(min_value=-99, max_value=99),
    )

    @given(
        left=st.lists(row, min_size=1, max_size=12),
        right=st.lists(row, min_size=0, max_size=12),
        tol=st.sampled_from([None, 5.0]),
    )
    @settings(max_examples=8, deadline=None)
    def check(left, right, tol):
        # unique (key, ts) on the right: tie order between equal
        # timestamps is explicitly unspecified in both engines
        seen = set()
        right_u = []
        for k, t, v in right:
            if (k, t) not in seen:
                seen.add((k, t))
                right_u.append((k, t, v))
        ldf = spark.createDataFrame(
            [(k, datetime.fromtimestamp(t * 60), i, float(v))
             for i, (k, t, v) in enumerate(left)],
            ["sym", "ts", "idx", "lv"],
        )
        rdf = spark.createDataFrame(
            [(k, datetime.fromtimestamp(t * 60), float(v)) for k, t, v in right_u],
            ["sym", "ts", "px"],
        ) if right_u else spark.createDataFrame([], "sym string, ts timestamp, px double")
        out = asof_join(
            ldf, rdf, on=["sym"], left_ts="ts", right_ts="ts",
            value_cols=["px"], direction=direction,
            tolerance_seconds=tol * 60 if tol else None,
        )
        got = {r.idx: r.matched_px for r in out.collect()}
        lp = ldf.toPandas().sort_values("ts", kind="stable")
        rp = rdf.toPandas().sort_values("ts", kind="stable")
        ref = pd.merge_asof(
            lp, rp, on="ts", by="sym", direction=direction,
            tolerance=pd.Timedelta(minutes=tol) if tol else None,
        )
        want = {
            int(r.idx): (None if pd.isna(r.px) else float(r.px))
            for r in ref.itertuples()
        }
        assert got == want

    check()


def test_time_rollup_hierarchy(spark):
    from aqueducts_spark.operators.temporal import time_rollup

    rows = [
        ("x", _ts("2024-01-01 09:10:00"), 1.0),
        ("x", _ts("2024-01-01 09:40:00"), 3.0),
        ("x", _ts("2024-01-01 17:00:00"), 5.0),
        ("x", _ts("2024-02-02 00:00:00"), 7.0),
        ("y", _ts("2024-01-01 09:59:59"), 100.0),
    ]
    df = spark.createDataFrame(rows, ["k", "ts", "v"])
    out = time_rollup(df, "ts", "v", ["hour", "day", "month"], group_cols=["k"])
    got = {
        (r.grain, r.bucket, r.k): (r.n, r.sum_value, r.min_value, r.max_value)
        for r in out.collect()
    }
    assert got[("hour", "2024-01-01 09:00:00", "x")] == (2, 4.0, 1.0, 3.0)
    assert got[("hour", "2024-01-01 09:00:00", "y")] == (1, 100.0, 100.0, 100.0)
    assert got[("day", "2024-01-01", "x")] == (3, 9.0, 1.0, 5.0)
    assert got[("month", "2024-01", "x")] == (3, 9.0, 1.0, 5.0)
    assert got[("month", "2024-02", "x")] == (1, 7.0, 7.0, 7.0)
    # avg composes across levels (sum/count, not avg-of-avgs)
    month_x = [r for r in out.collect() if r.grain == "month" and r.k == "x"
               and r.bucket == "2024-01"][0]
    assert month_x.avg_value == 3.0


def test_time_rollup_rejects_bad_grain(spark):
    from aqueducts_spark.operators.temporal import time_rollup

    df = spark.createDataFrame([("x", _ts("2024-01-01 09:10:00"), 1.0)], ["k", "ts", "v"])
    with pytest.raises(ValueError):
        time_rollup(df, "ts", "v", ["fortnight"])


def test_operator_stage_asof(spark, streams):
    trades, quotes = streams
    trades.createOrReplaceTempView("trades_t")
    quotes.createOrReplaceTempView("quotes_t")
    from aqueducts_spark.operators.registry import run_operator

    out = run_operator(
        spark,
        {
            "type": "asof_join",
            "input": "trades_t",
            "options": {
                "right": "quotes_t",
                "key": "sym",
                "value_cols": ["px"],
            },
        },
    )
    got = {r.qty: r.matched_px for r in out.collect()}
    assert got[3] == 11.0
    spark.catalog.dropTempView("trades_t")
    spark.catalog.dropTempView("quotes_t")


def test_operator_stage_range(spark, streams):
    trades, quotes = streams
    trades.createOrReplaceTempView("trades_r")
    quotes.createOrReplaceTempView("quotes_r")
    from aqueducts_spark.operators.registry import run_operator

    out = run_operator(
        spark,
        {
            "type": "range_join",
            "input": "trades_r",
            "options": {
                "right": "quotes_r",
                "key": "sym",
                "lower_seconds": -6,
                "upper_seconds": 0,
            },
        },
    )
    assert out.count() == 4
    spark.catalog.dropTempView("trades_r")
    spark.catalog.dropTempView("quotes_r")


def test_ntz_temporal_ops_are_session_tz_independent(spark):
    """NTZ wall clocks must map to the same epoch under ANY session tz —
    a bare cast('timestamp') breaks around DST transitions (62 wall
    minutes apart can become 2 instant-minutes under Europe/Berlin)."""
    from aqueducts_spark.operators.temporal import range_join

    rows_l = [(1, "2026-03-29 01:59:00")]
    rows_r = [(1, "2026-03-29 03:01:00")]
    mk = lambda rows: spark.createDataFrame(rows, "k long, s string").select(
        "k", F.col("s").cast("timestamp_ntz").alias("ts")
    )
    old_tz = spark.conf.get("spark.sql.session.timeZone")
    try:
        for tz in ("UTC", "Europe/Berlin"):
            spark.conf.set("spark.sql.session.timeZone", tz)
            # true wall gap is 3720s: a ±3600s window must NOT match,
            # a ±4000s window must match — under every timezone
            near = range_join(mk(rows_l), mk(rows_r), "ts", "ts", -3600.0, 3600.0, on=["k"])
            wide = range_join(mk(rows_l), mk(rows_r), "ts", "ts", -4000.0, 4000.0, on=["k"])
            assert near.count() == 0, f"tz={tz}: 3720s gap matched a 3600s window"
            assert wide.count() == 1, f"tz={tz}: 3720s gap missed a 4000s window"
    finally:
        spark.conf.set("spark.sql.session.timeZone", old_tz)


def test_time_rollup_ntz_buckets_are_wall_clock(spark):
    """NTZ rollup buckets come from the wall clock, not a session-tz
    cast — the 02:xx hour exists even where Berlin spring-forward
    deletes it."""
    from aqueducts_spark.operators.temporal import time_rollup

    df = spark.createDataFrame(
        [(1, "2026-03-29 02:15:00", 1.0), (2, "2026-03-29 02:45:00", 3.0)],
        "id long, s string, v double",
    ).select("id", F.col("s").cast("timestamp_ntz").alias("ts"), "v")
    old_tz = spark.conf.get("spark.sql.session.timeZone")
    try:
        spark.conf.set("spark.sql.session.timeZone", "Europe/Berlin")
        rows = {
            (r.grain, r.bucket): r.sum_value
            for r in time_rollup(df, "ts", "v", ["hour", "day"]).collect()
        }
    finally:
        spark.conf.set("spark.sql.session.timeZone", old_tz)
    assert rows[("hour", "2026-03-29 02:00:00")] == 4.0
    assert rows[("day", "2026-03-29")] == 4.0


# --- review-hardening regressions -----------------------------------------


def test_asof_null_right_ts_never_matches(spark):
    """A right row with a NULL timestamp has no position on the time
    axis: it must never leak into any backward frame (it used to sort
    first and hand its value to every left row)."""
    left = spark.createDataFrame(
        [(1, 10.0)], "key long, ts double"
    ).select("key", F.col("ts").cast("timestamp").alias("ts"))
    right = spark.createDataFrame(
        [(1, None, 5.0)], "key long, ts double, v double"
    ).select("key", F.col("ts").cast("timestamp").alias("ts"), "v")
    out = asof_join(left, right, ["key"], "ts", "ts", ["v"]).collect()
    assert len(out) == 1
    assert out[0].matched_v is None and out[0].matched_ts is None


def test_asof_null_left_ts_never_matches(spark):
    left = spark.createDataFrame(
        [(1, None)], "key long, ts double"
    ).select("key", F.col("ts").cast("timestamp").alias("ts"))
    right = spark.createDataFrame(
        [(1, 5.0, 7.0)], "key long, ts double, v double"
    ).select("key", F.col("ts").cast("timestamp").alias("ts"), "v")
    for direction in ("backward", "forward", "nearest"):
        out = asof_join(
            left, right, ["key"], "ts", "ts", ["v"], direction=direction
        ).collect()
        assert out[0].matched_v is None, direction


def test_asof_null_keys_never_match_each_other(spark):
    """NULL = NULL never joins (DuckDB ASOF / SQL equi-join parity)."""
    left = spark.createDataFrame(
        [(None, 10.0)], "key string, ts double"
    ).select("key", F.col("ts").cast("timestamp").alias("ts"))
    right = spark.createDataFrame(
        [(None, 5.0, 1.0)], "key string, ts double, v double"
    ).select("key", F.col("ts").cast("timestamp").alias("ts"), "v")
    out = asof_join(left, right, ["key"], "ts", "ts", ["v"]).collect()
    assert out[0].matched_v is None


def test_asof_handles_awkward_column_names(spark):
    left = spark.createDataFrame(
        [(1, 10.0, "x")], "key long, ts double, `event date` string"
    ).select("key", F.col("ts").cast("timestamp").alias("ts"), "`event date`")
    right = spark.createDataFrame(
        [(1, 5.0, 2.0)], "key long, ts double, v double"
    ).select("key", F.col("ts").cast("timestamp").alias("ts"), "v")
    out = asof_join(left, right, ["key"], "ts", "ts", ["v"]).collect()
    assert out[0]["event date"] == "x" and out[0].matched_v == 2.0


def test_time_rollup_small_values_not_rounded_away(spark):
    """Default decimal keeps micro-scale values exact (the old
    decimal(12,2) silently rounded sub-cent latencies to zero)."""
    df = spark.createDataFrame(
        [(i, 0.0004) for i in range(10)], "e long, value double"
    ).select(F.col("e"), F.lit("2024-01-01 10:00:00").cast("timestamp").alias("ts"), "value")
    out = {r.grain: r for r in time_rollup(df, "ts", "value", ["hour"]).collect()}
    assert abs(out["hour"].sum_value - 0.004) < 1e-12


def test_time_rollup_all_null_bucket_avg_is_null(spark):
    df = spark.createDataFrame(
        [(1, None)], "e long, value double"
    ).select("e", F.lit("2024-01-01 10:00:00").cast("timestamp").alias("ts"), "value")
    out = time_rollup(df, "ts", "value", ["hour"]).collect()[0]
    assert out.n == 0 and out.avg_value is None


def test_time_rollup_empty_granularities_rejected(spark):
    df = spark.createDataFrame([(1, 1.0)], "e long, value double").select(
        "e", F.lit("2024-01-01 10:00:00").cast("timestamp").alias("ts"), "value"
    )
    with pytest.raises(ValueError, match="granularities"):
        time_rollup(df, "ts", "value", [])


def test_profile_table_handles_map_columns(spark):
    from aqueducts_spark.operators.profile import profile_table

    df = spark.createDataFrame(
        [(1, {"a": "1"}), (2, None)], "id long, meta map<string,string>"
    )
    rows = {r.column: r for r in profile_table(df).collect()}
    assert rows["meta"].n_nulls == 1
    assert rows["meta"].n_distinct is None  # unorderable: stat skipped
    assert rows["id"].n_distinct == 2


def test_asof_matched_row_is_atomic_with_genuine_null_values(spark):
    """A genuine NULL in a right value column must NOT be skipped in
    favor of an older row's value: the matched (ts, value) pair must
    come from ONE right row (pandas merge_asof returns NULL here)."""
    from aqueducts_spark.operators.temporal import asof_join

    left = spark.createDataFrame(
        [("k", 101.0)], "key string, ts double"
    ).selectExpr("key", "timestamp_seconds(ts) AS ts")
    right = spark.createDataFrame(
        [("k", 1.0, 5.0), ("k", 100.0, None)], "key string, ts double, v double"
    ).selectExpr("key", "timestamp_seconds(ts) AS ts", "v")
    out = asof_join(
        left, right, on=["key"], left_ts="ts", right_ts="ts",
        value_cols=["v"], tolerance_seconds=10.0,
    ).collect()[0]
    # the backward match IS the ts=100 row: its NULL value must ride
    # along, not v=5 from the out-of-tolerance ts=1 row
    assert out.matched_ts is not None
    assert out.matched_v is None


def test_asof_output_clash_rejected(spark):
    from aqueducts_spark.operators.temporal import asof_join

    left = spark.createDataFrame(
        [(1, "2024-01-01 00:00:00", 1.0)],
        "k long, ts string, matched_ts double",
    ).selectExpr("k", "CAST(ts AS TIMESTAMP) ts", "matched_ts")
    right = spark.createDataFrame(
        [(1, "2024-01-01 00:00:00", 2.0)], "k long, ts string, v double"
    ).selectExpr("k", "CAST(ts AS TIMESTAMP) ts", "v")
    with pytest.raises(ValueError, match="already exist"):
        asof_join(left, right, ["k"], "ts", "ts", ["v"])


def test_asof_null_key_left_rows_bypass_with_null_matches(spark):
    from aqueducts_spark.operators.temporal import asof_join

    left = spark.createDataFrame(
        [(1, "2024-01-01 00:01:00"), (None, "2024-01-01 00:02:00")],
        "k long, ts string",
    ).selectExpr("k", "CAST(ts AS TIMESTAMP) AS ts")
    right = spark.createDataFrame(
        [(1, "2024-01-01 00:00:00", 7.0)], "k long, ts string, v double"
    ).selectExpr("k", "CAST(ts AS TIMESTAMP) AS ts", "v")
    out = {r.k: r for r in asof_join(left, right, ["k"], "ts", "ts", ["v"]).collect()}
    assert out[1].matched_v == 7.0
    # the NULL-key row survives (left-outer) with NULL matches, routed
    # around the window so it never piles onto one task
    assert None in out and out[None].matched_v is None
    assert out[None].matched_ts is None


def test_time_rollup_group_col_clash_rejected(spark):
    from aqueducts_spark.operators.temporal import time_rollup

    df = spark.createDataFrame(
        [("2024-01-01 00:00:00", 1.0, "x")], "ts string, v double, n string"
    ).selectExpr("CAST(ts AS TIMESTAMP) ts", "v", "n")
    with pytest.raises(ValueError, match="collide"):
        time_rollup(df, "ts", "v", group_cols=["n"])
