"""DataFusion dialect compatibility layer (functions/compat.py)."""

import textwrap

import pytest

from aqueducts_spark.functions.compat import (
    register_compat_functions,
    translate_sql,
)


class TestTranslateSql:
    def test_function_renames(self):
        assert (
            translate_sql("SELECT approx_distinct(x), make_array(1,2) FROM t")
            == "SELECT approx_count_distinct(x), array(1,2) FROM t"
        )

    def test_case_insensitive_and_spacing(self):
        assert (
            translate_sql("SELECT ARRAY_LENGTH (a) FROM t")
            == "SELECT array_size (a) FROM t"
        )

    def test_string_literals_untouched(self):
        q = "SELECT 'make_array(1)' AS s, make_array(1) AS a FROM t"
        assert translate_sql(q) == "SELECT 'make_array(1)' AS s, array(1) AS a FROM t"

    def test_quoted_identifiers_untouched(self):
        q = 'SELECT "array_length"(a), `array_has` FROM t'
        assert translate_sql(q) == q

    def test_comments_stripped_not_translated(self):
        # comments are replaced with whitespace (semantically inert):
        # keeping them defeated renames across comment boundaries, and
        # their CONTENT must never be translated
        q = "SELECT x -- make_array(1)\nFROM t /* array_has(a, 1) */"
        got = translate_sql(q)
        assert "array(" not in got and "array_contains" not in got
        assert got.startswith("SELECT x ") and "FROM t" in got

    def test_comment_between_name_and_call_does_not_defeat_rename(self):
        got = translate_sql("SELECT array_length /*n*/ (a) FROM t")
        assert "size" in got and "array_length" not in got

    def test_identifier_not_a_call_untouched(self):
        assert translate_sql("SELECT array_length FROM t") == "SELECT array_length FROM t"

    def test_json_text_operator(self):
        assert (
            translate_sql("SELECT payload ->> 'name' FROM t")
            == "SELECT json_as_text(payload, 'name') FROM t"
        )

    def test_json_operator_chain(self):
        assert (
            translate_sql("SELECT j -> 'a' ->> 'b' FROM t")
            == "SELECT json_as_text(json_as_text(j, 'a'), 'b') FROM t"
        )

    def test_json_operator_in_string_untouched(self):
        q = "SELECT 'a ->> b' FROM t"
        assert translate_sql(q) == q

    def test_arrow_in_comment_not_translated(self):
        q = "SELECT x FROM t -- see a ->> 'k'"
        got = translate_sql(q)
        assert "json_as_text" not in got
        assert got.startswith("SELECT x FROM t")


class TestCompatFunctions:
    @pytest.fixture(autouse=True)
    def _register(self, spark):
        register_compat_functions(spark)

    def one(self, spark, expr):
        return spark.sql(f"SELECT {expr} AS v").collect()[0][0]

    def test_strpos(self, spark):
        assert self.one(spark, "strpos('hello', 'll')") == 3
        assert self.one(spark, "strpos('hello', 'zz')") == 0

    def test_to_hex_lowercase(self, spark):
        assert self.one(spark, "to_hex(255)") == "ff"

    def test_date_bin(self, spark):
        got = self.one(
            spark,
            "date_bin(INTERVAL 15 MINUTE, TIMESTAMP '2024-01-01 10:17:23', "
            "TIMESTAMP '2024-01-01 00:00:00')",
        )
        assert str(got) == "2024-01-01 10:15:00"

    def test_date_bin_origin_alignment(self, spark):
        got = self.one(
            spark,
            "date_bin(INTERVAL 1 HOUR, TIMESTAMP '2024-01-01 10:17:23', "
            "TIMESTAMP '2024-01-01 00:30:00')",
        )
        assert str(got) == "2024-01-01 09:30:00"

    def test_to_timestamp_millis(self, spark):
        got = self.one(spark, "to_timestamp_millis(1704103200000)")
        assert got.year == 2024

    def test_to_unixtime(self, spark):
        assert (
            self.one(spark, "to_unixtime(to_timestamp_seconds(1704103200))")
            == 1704103200
        )

    def test_to_char_chrono_format(self, spark):
        # dialect-translated name: to_char -> df_to_char (builtin clash)
        assert (
            self.one(
                spark,
                translate_sql("to_char(TIMESTAMP '2024-03-05 07:08:09', '%Y-%m-%d %H:%M:%S')"),
            )
            == "2024-03-05 07:08:09"
        )

    def test_gcd_lcm(self, spark):
        import math

        assert self.one(spark, "gcd(12, 18)") == 6
        assert self.one(spark, "gcd(0, 0)") == 0
        assert self.one(spark, "gcd(0, 7)") == 7
        assert self.one(spark, "gcd(-12, 18)") == 6
        # 64-bit worst case: consecutive Fibonacci numbers need the most
        # Euclid iterations — the 92-step fold must still converge
        assert self.one(spark, "gcd(7540113804746346429, 4660046610375530309)") == 1
        assert self.one(spark, "lcm(4, 6)") == 12
        assert self.one(spark, "lcm(0, 5)") == 0
        assert self.one(spark, "lcm(-4, 6)") == 12
        assert self.one(spark, "lcm(21, 6)") == math.lcm(21, 6)

    def test_regexp_match(self, spark):
        assert self.one(spark, "regexp_match('ab12cd', '[0-9]+')") == ["12"]
        assert self.one(spark, "regexp_match('abcd', '[0-9]+')") is None

    def test_sql_udf_inlines_into_codegen(self, spark):
        """The compat UDFs must be JVM-side: the physical plan may not
        contain any Python evaluation node."""
        df = spark.sql("SELECT strpos(c, 'x') FROM (SELECT 'axb' AS c)")
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


class TestDialectPipeline:
    def test_pipeline_with_datafusion_dialect(self, spark, tmp_path):
        from aqueducts_spark import CollectingTracker, load_pipeline_str, run_pipeline

        src = tmp_path / "in.csv"
        src.write_text(
            'id;payload\n1;{"name": "ada"}\n2;{"name": "bob"}\n'
        )
        yml = textwrap.dedent(
            f"""
            sources:
              - type: file
                name: raw
                format: {{ type: csv, options: {{ delimiter: ";" }} }}
                location: {src}
            stages:
              - - name: shaped
                  query: >
                    SELECT approx_distinct(id) AS n_ids,
                           make_array('a') AS arr,
                           array_agg(payload ->> 'name') AS names
                    FROM raw
            sql_dialect: datafusion
            destination:
              type: in_memory
              name: dialect_out
            """
        )
        run_pipeline(spark, load_pipeline_str(yml, "yaml"), CollectingTracker())
        row = spark.table("dialect_out").collect()[0]
        assert row.n_ids == 2
        assert row.arr == ["a"]
        assert sorted(row.names) == ["ada", "bob"]
        spark.catalog.dropTempView("dialect_out")


class TestCompatHardening:
    def test_to_char_iso_literal_t(self, spark):
        """Chrono literals (the ISO 'T') must be quoted into the Java
        pattern, not parsed as pattern letters."""
        r = spark.sql(
            "SELECT df_to_char(TIMESTAMP '2026-01-02 03:04:05', "
            "'%Y-%m-%dT%H:%M:%S') AS iso, "
            "df_to_char(TIMESTAMP '2026-01-02 03:04:05', 'at %H hours') AS words"
        ).collect()[0]
        assert r.iso == "2026-01-02T03:04:05"
        assert r.words == "at 03 hours"

    def test_date_bin_floors_before_origin(self, spark):
        """DataFusion floors; Spark's div truncates toward zero — a src
        before the origin must bin DOWN, not up."""
        r = spark.sql(
            "SELECT date_bin(INTERVAL 1 DAY, TIMESTAMP '1969-12-31 12:00:00', "
            "TIMESTAMP '1970-01-01') AS b"
        ).collect()[0]
        assert str(r.b) == "1969-12-31 00:00:00"


# --- review-hardening regressions -----------------------------------------


def test_json_op_chain_arbitrary_depth():
    from aqueducts_spark.functions.compat import translate_sql

    got = translate_sql("SELECT c -> 'a' -> 'b' -> 'c' -> 'd' -> 'e' FROM t")
    assert got == (
        "SELECT json_as_text(json_as_text(json_as_text(json_as_text("
        "json_as_text(c, 'a'), 'b'), 'c'), 'd'), 'e') FROM t"
    )


def test_json_op_paren_and_call_lhs():
    from aqueducts_spark.functions.compat import translate_sql

    assert translate_sql("SELECT (a).b -> 'k' FROM t") == (
        "SELECT json_as_text((a).b, 'k') FROM t"
    )
    assert translate_sql("SELECT get_json(c, 1) -> 'k' FROM t") == (
        "SELECT json_as_text(get_json(c, 1), 'k') FROM t"
    )


def test_line_comment_with_arrow_is_still_a_comment():
    from aqueducts_spark.functions.compat import translate_sql

    src = "SELECT a FROM t --> note: x -> 1"
    got = translate_sql(src)
    assert "json_as_text" not in got and got.startswith("SELECT a FROM t")
    # a quote inside the comment must not desync literal detection
    got = translate_sql("SELECT a FROM t --> don't\nWHERE approx_distinct(x) > 1")
    assert "approx_count_distinct" in got


def test_qualified_function_names_not_renamed():
    from aqueducts_spark.functions.compat import translate_sql

    assert translate_sql("SELECT db.array_length(x) FROM t") == (
        "SELECT db.array_length(x) FROM t"
    )
    assert translate_sql("SELECT array_length(x) FROM t") == (
        "SELECT array_size(x) FROM t"
    )


def test_rename_across_newline_before_parens():
    from aqueducts_spark.functions.compat import translate_sql

    assert translate_sql("SELECT approx_distinct\n(x) FROM t") == (
        "SELECT approx_count_distinct\n(x) FROM t"
    )


def test_non_literal_rhs_arrow_left_alone():
    from aqueducts_spark.functions.compat import translate_sql

    src = "SELECT x -> y FROM t"
    assert translate_sql(src) == src


def test_json_shims_variadic_and_null_semantics(spark):
    from aqueducts_spark.functions.json_udfs import register_udfs

    register_udfs(spark)
    row = spark.sql("""
        SELECT
          json_length('[1,2,3]') AS whole_doc,
          json_length('[[1,2,3],[4]]', 0) AS index_zero,
          json_length('{"a":{"b":[1,2]}}', 'a', 'b') AS variadic,
          json_length('{"a":1}', CAST(NULL AS STRING)) AS null_path,
          json_contains('{"a":1}', CAST(NULL AS STRING)) AS contains_null_path,
          json_contains('{"a":null}', 'a') AS contains_json_null,
          json_get_str('{"a":{"b":"x"}}', 'a', 'b') AS nested_variadic
    """).collect()[0]
    assert row.whole_doc == 3
    assert row.index_zero == 3  # falsy path 0 must NOT mean whole-doc
    assert row.variadic == 2
    assert row.null_path is None and row.contains_null_path is None
    assert row.contains_json_null is True
    assert row.nested_variadic == "x"


class TestCompatReviewRegressions:
    def test_string_literal_lhs_translates(self):
        from aqueducts_spark.functions.compat import translate_sql

        got = translate_sql("""SELECT '{"a":1}' ->> 'a'""")
        assert got == """SELECT json_as_text('{"a":1}', 'a')"""

    def test_double_quoted_identifier_lhs_becomes_backticks(self):
        from aqueducts_spark.functions.compat import translate_sql

        got = translate_sql('''SELECT "my col" -> 'k' FROM t''')
        assert got == "SELECT json_as_text(`my col`, 'k') FROM t"

    def test_bare_keyword_lhs_raises_clearly(self):
        import pytest as _pytest

        from aqueducts_spark.functions.compat import translate_sql

        with _pytest.raises(ValueError, match="parenthesize"):
            translate_sql("SELECT CASE WHEN x THEN y ELSE z END -> 'k' FROM t")
        # the documented workaround translates fine
        got = translate_sql("SELECT (CASE WHEN x THEN y ELSE z END) -> 'k' FROM t")
        assert "json_as_text((CASE WHEN x THEN y ELSE z END), 'k')" in got

    def test_to_char_unsupported_specifier_raises(self, spark):
        import pytest as _pytest

        from aqueducts_spark.functions.compat import register_compat_functions

        register_compat_functions(spark)
        assert (
            spark.sql(
                "SELECT df_to_char(TIMESTAMP'2026-08-14 10:00:00', '%Y-%m-%d') AS s"
            ).collect()[0].s
            == "2026-08-14"
        )
        with _pytest.raises(Exception, match="unsupported chrono specifier"):
            spark.sql(
                "SELECT df_to_char(TIMESTAMP'2026-08-14 10:00:00', '%Y %b') AS s"
            ).collect()
