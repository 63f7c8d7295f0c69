import pytest

from aqueducts_spark.config.loader import load_pipeline_str
from aqueducts_spark.config.model import (
    DeltaDestination,
    FileSource,
    Pipeline,
)
from aqueducts_spark.config.templating import (
    MissingParamsError,
    find_params,
    substitute_params,
)
from aqueducts_spark.sql_guard import StageSqlError, validate_stage_sql

EXAMPLE_YML = """
version: "v2"
sources:
  - type: file
    name: readings
    format:
      type: csv
      options:
        has_header: true
        delimiter: ","
    location: /tmp/${month}_data.csv
stages:
  - - name: aggregated
      query: >
        SELECT cast(timestamp as date) date, location_id,
               round(min(temperature_c), 2) AS min_temp
        FROM readings GROUP BY 1, 2
destination:
  type: file
  name: out
  format:
    type: parquet
  location: /tmp/out.parquet
"""


def test_substitute_params():
    assert substitute_params("a ${x} b ${y}", {"x": "1", "y": "2"}) == "a 1 b 2"
    assert find_params("${b} ${a} ${b}") == ["a", "b"]
    with pytest.raises(MissingParamsError) as exc:
        substitute_params("${x} ${zz}", {"x": "1"})
    assert exc.value.names == ["zz"]


def test_load_example_pipeline():
    p = load_pipeline_str(EXAMPLE_YML, params={"month": "jan"})
    assert isinstance(p, Pipeline)
    src = p.parsed_sources[0]
    assert isinstance(src, FileSource)
    assert src.location == "/tmp/jan_data.csv"
    assert src.format.parsed.has_header is True
    assert len(p.stage_groups) == 1
    assert p.stage_groups[0][0].name == "aggregated"
    assert p.parsed_destination.format.type == "parquet"


def test_flat_stage_list_becomes_sequential_groups():
    yml = """
sources: []
stages:
  - name: s1
    query: SELECT 1 AS a
  - name: s2
    query: SELECT * FROM s1
"""
    p = load_pipeline_str(yml)
    assert len(p.stage_groups) == 2


def test_duplicate_names_rejected():
    yml = """
sources: []
stages:
  - name: s1
    query: SELECT 1 AS a
  - name: s1
    query: SELECT 2 AS a
"""
    with pytest.raises(Exception, match="duplicate"):
        load_pipeline_str(yml)


def test_odbc_aliases_and_delta_modes():
    yml = """
sources:
  - type: odbc
    name: db
    query: SELECT * FROM t
    connection_string: jdbc:postgresql://h/db
stages:
  - name: s
    query: SELECT * FROM db
destination:
  type: delta
  name: d
  location: /tmp/delta_t
  write_mode:
    operation: upsert
    params: [date, country]
  partition_cols: [date]
"""
    p = load_pipeline_str(yml)
    assert p.parsed_sources[0].load_query == "SELECT * FROM t"
    dest = p.parsed_destination
    assert isinstance(dest, DeltaDestination)
    assert dest.write_mode.merge_keys == ["date", "country"]
    assert dest.partition_columns == ["date"]


@pytest.mark.parametrize(
    "sql",
    [
        "SELECT 1",
        "  WITH t AS (SELECT 1 AS a) SELECT * FROM t",
        "VALUES (1, 'x')",
        "(SELECT 1) UNION ALL (SELECT 2)",
        "-- comment\nSELECT 1",
        "SELECT ';' AS semi",
    ],
)
def test_sql_guard_allows(sql):
    validate_stage_sql(sql)


@pytest.mark.parametrize(
    "sql",
    [
        "INSERT INTO t VALUES (1)",
        "CREATE TABLE t (a int)",
        "DROP TABLE t",
        "UPDATE t SET a = 1",
        "DELETE FROM t",
        "SET spark.foo=1",
        "SELECT 1; SELECT 2",
        "",
        "   -- only a comment",
    ],
)
def test_sql_guard_rejects(sql):
    with pytest.raises(StageSqlError):
        validate_stage_sql(sql)


def test_load_time_sql_validation():
    yml = """
sources: []
stages:
  - name: bad
    query: DROP TABLE x
"""
    with pytest.raises(StageSqlError):
        load_pipeline_str(yml)


class TestSqlGuardHardening:
    def test_cte_prefixed_dml_rejected(self):
        from aqueducts_spark.sql_guard import StageSqlError, validate_stage_sql

        with pytest.raises(StageSqlError, match="INSERT"):
            validate_stage_sql(
                "WITH x AS (SELECT 1) INSERT INTO prod.tbl SELECT * FROM x"
            )
        with pytest.raises(StageSqlError, match="INSERT"):
            validate_stage_sql("FROM t INSERT OVERWRITE TABLE u SELECT *")

    def test_comment_markers_inside_strings_do_not_hide_statements(self):
        from aqueducts_spark.sql_guard import StageSqlError, validate_stage_sql

        sql = "SELECT '/*' AS a; DROP TABLE t; SELECT '*/' AS b"
        with pytest.raises(StageSqlError, match="multiple statements"):
            validate_stage_sql(sql)

    def test_keywords_inside_literals_and_quoted_identifiers_pass(self):
        from aqueducts_spark.sql_guard import validate_stage_sql

        validate_stage_sql("SELECT 'please insert coin' AS msg FROM t")
        validate_stage_sql("SELECT `update` FROM t")
        validate_stage_sql("-- insert note\nSELECT 1")
