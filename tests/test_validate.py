"""Data-quality validation rules: one-pass counters, full-match regex,
explicit-null value rejection, quote-safe output."""

from __future__ import annotations

import pytest

from aqueducts_spark.operators.validate import ValidationError, validate_rules


@pytest.fixture()
def table(spark):
    return spark.createDataFrame(
        [
            (1, "alice", "a@x.com", 10),
            (2, "bob", None, 200),
            (3, "carol", "c@x.com", 10),
            (3, "dave", "not-an-email", -5),
        ],
        "id long, name string, email string, score long",
    )


def test_rule_counters(table):
    out = {
        (r.column, r.check): r
        for r in validate_rules(
            table,
            [
                {"column": "email", "check": "not_null"},
                {"column": "id", "check": "unique"},
                {"column": "score", "check": "min", "value": 0},
                {"column": "score", "check": "max", "value": 100},
                {"column": "name", "check": "max_length", "value": 4},
            ],
        ).collect()
    }
    assert out[("email", "not_null")].violations == 1
    assert out[("id", "unique")].violations == 1  # id=3 twice
    assert out[("score", "min")].violations == 1  # -5
    assert out[("score", "max")].violations == 1  # 200
    assert out[("name", "max_length")].violations == 2  # alice, carol
    assert all(r.total == 4 for r in out.values())
    assert not out[("email", "not_null")]["pass"]


def test_regex_is_full_match(table):
    """The documented contract is FULL match: a substring hit must not
    make a bad value pass."""
    out = validate_rules(
        table,
        [{"column": "email", "check": "regex", "value": r"[^@]+@[^@]+\.[a-z]+"}],
    ).collect()[0]
    # 'not-an-email' contains no full match -> 1 violation (NULL exempt)
    assert out.violations == 1


def test_regex_contains_mode_restores_substring_semantics(table):
    """mode: contains keeps the pre-v0.2 bare-rlike containment for
    pipelines that relied on it (ADVICE r2: semantics change must have
    an explicit opt-out)."""
    out = validate_rules(
        table,
        [
            {"column": "name", "check": "regex", "value": "li", "mode": "contains"},
            {"column": "name", "check": "regex", "value": "li"},
        ],
    ).collect()
    # names: alice, bob, carol, dave -> contains 'li': only alice matches
    assert out[0].violations == 3
    # full-match 'li': nobody matches -> all 4 non-null names violate
    assert out[1].violations == 4


def test_regex_mode_validation(table):
    with pytest.raises(ValidationError, match="mode"):
        validate_rules(
            table,
            [{"column": "name", "check": "regex", "value": "x", "mode": "sub"}],
        )
    with pytest.raises(ValidationError, match="mode"):
        validate_rules(
            table,
            [{"column": "score", "check": "max", "value": 1, "mode": "full"}],
        )


def test_explicit_null_value_rejected(table):
    with pytest.raises(ValidationError, match="requires 'value'"):
        validate_rules(table, [{"column": "score", "check": "max", "value": None}])
    with pytest.raises(ValidationError, match="requires 'value'"):
        validate_rules(table, [{"column": "score", "check": "max"}])


def test_quote_in_column_name_survives(spark):
    df = spark.createDataFrame([(1,), (None,)], ["it's"])
    out = validate_rules(df, [{"column": "it's", "check": "not_null"}]).collect()[0]
    assert out.column == "it's" and out.violations == 1


def test_in_set_and_rule_order(table):
    rules = [
        {"column": "name", "check": "in_set", "value": ["alice", "bob"]},
        {"column": "id", "check": "not_null"},
    ]
    rows = validate_rules(table, rules).orderBy("rule_no").collect()
    assert [r.check for r in rows] == ["in_set", "not_null"]
    assert rows[0].violations == 2  # carol, dave
    assert rows[1].violations == 0 and rows[1]["pass"]


def test_unknown_column_and_check_rejected(table):
    with pytest.raises(ValidationError, match="unknown column"):
        validate_rules(table, [{"column": "nope", "check": "not_null"}])
    with pytest.raises(ValidationError, match="unknown check"):
        validate_rules(table, [{"column": "id", "check": "positive"}])


def test_quantize_null_component_stays_null(spark):
    from aqueducts_spark.operators.embedding import quantize_embeddings

    df = spark.createDataFrame(
        [(1, [1.0, None, -1.0])], "vec_id long, embedding array<double>"
    )
    row = quantize_embeddings(df).collect()[0]
    assert row.qvec == [127, None, -127]  # NOT [127, 127, -127]


def test_label_centroids_skip_null_components(spark):
    from aqueducts_spark.operators.embedding import label_centroids

    df = spark.createDataFrame(
        [("x", [1.0, 5.0]), ("x", [3.0, None])],
        "label string, embedding array<double>",
    )
    rows = {r.dim: r for r in label_centroids(df).collect()}
    assert rows[0].n_vectors == 2 and abs(rows[0].centroid - 2.0) < 1e-9
    # dim 1: only one non-null component -> mean of the present values
    assert rows[1].n_vectors == 1 and abs(rows[1].centroid - 5.0) < 1e-9


def test_zorder_range_guard_and_clamp(spark):
    from aqueducts_spark.operators.zorder import with_zorder_key, zorder_key

    # range beyond int64/maxb fails fast with a clear error
    with pytest.raises(ValueError, match="spans"):
        zorder_key({"a": (0, 2**50), "b": (0, 10)}, ["a", "b"], bits=16)

    # out-of-range values clamp instead of wrapping their high bits
    df = spark.createDataFrame(
        [(0, 0), (1000, 1000)], "a long, b long"
    )
    keyed = df.select(
        "*",
        zorder_key({"a": (0, 10), "b": (0, 10)}, ["a", "b"], bits=4),
    ).collect()
    by_a = {r.a: r.zorder_key for r in keyed}
    assert by_a[1000] >= by_a[0]  # clamped to the TOP bucket, not wrapped


def test_in_set_string_value_rejected(spark):
    from aqueducts_spark.operators.validate import ValidationError, validate_rules

    df = spark.createDataFrame([("US",)], "country string")
    with pytest.raises(ValidationError, match="list of accepted"):
        validate_rules(df, [{"column": "country", "check": "in_set", "value": "US"}])


def test_dotted_column_name_validates_the_column_not_a_struct_field(spark):
    from aqueducts_spark.operators.validate import validate_rules

    df = spark.sql(
        "SELECT named_struct('b', 1) AS a, CAST(NULL AS INT) AS `a.b`"
    )
    out = validate_rules(df, [{"column": "a.b", "check": "not_null"}]).collect()[0]
    # the literal 'a.b' column is NULL -> 1 violation; the struct field
    # a.b (non-null) must NOT be what gets validated
    assert out.violations == 1


def test_in_set_null_member_rejected(spark):
    from aqueducts_spark.operators.validate import ValidationError, validate_rules

    df = spark.createDataFrame([("US",), ("XX",)], ["country"])
    with pytest.raises(ValidationError, match="three-valued"):
        validate_rules(
            df,
            [{"column": "country", "check": "in_set", "value": ["US", None]}],
        )
