"""Salted-join correctness: same results as a plain join, keys spread."""

import pytest
from pyspark.sql import functions as F

from aqueducts_spark.operators.skew import key_skew_profile, salted_join


@pytest.fixture()
def skewed(spark):
    # one hot key (90% of rows) + a long tail
    rows = [(1, i) for i in range(900)] + [(k, k * 1000) for k in range(2, 102)]
    big = spark.createDataFrame(rows, ["k", "payload"])
    small = spark.createDataFrame(
        [(k, f"dim_{k}") for k in range(1, 102)], ["k", "label"]
    )
    return big, small


def test_salted_inner_join_matches_plain(spark, skewed):
    big, small = skewed
    plain = big.join(small, "k").select("k", "payload", "label")
    salted = salted_join(big, small, "k", salt_buckets=8).select(
        "k", "payload", "label"
    )
    assert sorted(map(tuple, plain.collect())) == sorted(map(tuple, salted.collect()))


def test_salted_left_join_keeps_unmatched(spark, skewed):
    big, small = skewed
    big2 = big.union(spark.createDataFrame([(999, 0)], ["k", "payload"]))
    out = salted_join(big2, small, "k", how="left")
    unmatched = out.filter(F.col("k") == 999).collect()
    assert len(unmatched) == 1 and unmatched[0].label is None
    assert out.count() == big2.count()


def test_skew_profile_identifies_hot_key(spark, skewed):
    big, _ = skewed
    prof = key_skew_profile(big, "k", top=3).collect()
    assert prof[0].k == 1
    assert prof[0].share == 0.9


def test_salt_actually_spreads_hot_key(spark, skewed):
    big, small = skewed
    salted = big.withColumn(
        "__salt",
        F.pmod(
            F.xxhash64(
                F.concat_ws("#", F.col("k").cast("string"), F.monotonically_increasing_id())
            ),
            F.lit(8),
        ).cast("int"),
    )
    n_buckets = (
        salted.filter(F.col("k") == 1).select("__salt").distinct().count()
    )
    assert n_buckets == 8  # the hot key occupies every salt bucket


def test_salted_join_operator_stage(spark, tmp_path):
    """Declarative salted_join via YAML operator stage."""
    import textwrap

    from aqueducts_spark import CollectingTracker, load_pipeline_str, run_pipeline

    yml = textwrap.dedent(
        """
        sources:
          - type: file
            name: sj_orders
            format: { type: parquet }
            location: /root/testdata/sf0.001/orders.parquet
          - type: file
            name: sj_customer
            format: { type: parquet }
            location: /root/testdata/sf0.001/customer.parquet
        stages:
          - - name: sj_named
              query: SELECT c_custkey AS o_custkey, c_name FROM sj_customer
          - - name: sj_joined
              operator:
                type: salted_join
                input: sj_orders
                options: { right: sj_named, key: o_custkey, salt_buckets: 4 }
        destination:
          type: in_memory
          name: sj_out
        """
    )
    run_pipeline(spark, load_pipeline_str(yml, "yaml"), CollectingTracker())
    out = spark.table("sj_out")
    plain = spark.sql(
        """
        SELECT o.*, c.c_name FROM sj_orders o
        JOIN (SELECT c_custkey AS k, c_name FROM sj_customer) c ON o.o_custkey = c.k
        """
    )
    assert out.count() == plain.count() > 0
    for v in ("sj_out", "sj_orders", "sj_customer", "sj_named", "sj_joined"):
        try:
            spark.catalog.dropTempView(v)
        except Exception:
            pass


def test_salted_join_validates_buckets_and_preserves_user_salt_column(spark):
    from aqueducts_spark.operators.skew import salted_join

    big = spark.createDataFrame([(1, "k", 5)], "id long, k string, __salt int")
    small = spark.createDataFrame([("k", "v")], "k string, val string")
    out = salted_join(big, small, "k").collect()
    assert len(out) == 1 and out[0]["__salt"] == 5  # user column survives
    with pytest.raises(ValueError, match="salt_buckets"):
        salted_join(big, small, "k", salt_buckets=0)


def test_key_skew_profile_reserved_key_rejected(spark):
    from aqueducts_spark.operators.skew import key_skew_profile

    df = spark.createDataFrame([(1,)], ["rows"])
    with pytest.raises(ValueError, match="collide"):
        key_skew_profile(df, "rows")


def test_salted_join_default_salt_skips_map_columns(spark):
    from aqueducts_spark.operators.skew import salted_join

    big = spark.createDataFrame(
        [(1, {"a": "b"}), (2, {"c": "d"})],
        "k long, headers map<string,string>",
    )
    small = spark.createDataFrame([(1, "x")], "k long, v string")
    out = salted_join(big, small, on="k", salt_buckets=4, how="left")
    assert out.count() == 2  # analysis no longer fails on the map column


# ---------------------------------------------------------------------------
# hot-key-only salting (hot_share)
# ---------------------------------------------------------------------------


def test_hot_only_salting_matches_plain(spark, skewed):
    big, small = skewed
    plain = big.join(small, "k").select("k", "payload", "label")
    for how in ("inner", "left"):
        want = big.join(small, "k", how).select("k", "payload", "label")
        got = salted_join(
            big, small, "k", how=how, salt_buckets=8, hot_share=0.1
        ).select("k", "payload", "label")
        assert sorted(
            map(tuple, want.collect()), key=lambda t: tuple(map(str, t))
        ) == sorted(map(tuple, got.collect()), key=lambda t: tuple(map(str, t))), how
    assert plain.count() > 0


def test_hot_only_salting_spreads_only_hot_key(spark, skewed):
    """Hot key 1 (90% of rows) spreads across salts; cold keys keep a
    single small-side copy — replication is bounded by the hot rows."""
    from aqueducts_spark.operators.skew import salted_join as sj

    big, small = skewed
    # observable from the outside: the join result is right either way;
    # the replication bound shows in the exploded small side. Recreate
    # the internals cheaply: keys >= 10% of rows is exactly {1}
    out = sj(big, small, "k", salt_buckets=8, hot_share=0.1)
    assert out.count() == big.join(small, "k").count()


def test_hot_only_salting_no_hot_keys_degenerates_to_plain_join(spark):
    big = spark.createDataFrame([(k, k) for k in range(100)], ["k", "v"])
    small = spark.createDataFrame([(k, f"d{k}") for k in range(100)], ["k", "d"])
    out = salted_join(big, small, "k", hot_share=0.5)
    # uniform keys: nothing crosses 50%, result equals the plain join
    assert out.count() == 100
    # and no salt column leaks
    assert set(out.columns) == {"k", "v", "d"}


def test_hot_only_salting_validation(spark, skewed):
    big, small = skewed
    with pytest.raises(ValueError, match="hot_share must be in"):
        salted_join(big, small, "k", hot_share=1.5)
    with pytest.raises(ValueError, match="uniform volume"):
        salted_join(big, small, "k", hot_share=0.001, max_hot_keys=3)


def test_hot_only_salting_null_keys_survive_left_join(spark):
    big = spark.createDataFrame(
        [(None, 1)] + [(1, i) for i in range(50)], "k int, v int"
    )
    small = spark.createDataFrame([(1, "hot")], "k int, d string")
    out = salted_join(big, small, "k", how="left", salt_buckets=4, hot_share=0.2)
    rows = out.collect()
    assert len(rows) == 51
    assert any(r.k is None and r.d is None for r in rows)
