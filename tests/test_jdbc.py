"""JDBC source/sink tests against embedded Derby (in-process, no
server) — covers the reference's ODBC surface re-expressed over JDBC:
eager load_query source (odbc/src/lib.rs:50-82), append sink
(:141-164), and the custom transactional write with pre_insert +
rollback-on-error (:170-211)."""

import pytest

from aqueducts_spark import load_pipeline_str, run_pipeline
from aqueducts_spark.config.model import OdbcDestination, OdbcWriteMode, CustomStatements
from aqueducts_spark.destinations.write import _write_jdbc_custom

URL = "jdbc:derby:memory:aqtest;create=true"


@pytest.fixture(scope="module")
def derby(spark):
    """Create and seed a Derby in-memory database via the JVM."""
    jvm = spark.sparkContext._gateway.jvm
    conn = jvm.java.sql.DriverManager.getConnection(URL)
    st = conn.createStatement()
    try:
        st.execute("CREATE TABLE readings (id INT, val VARCHAR(50))")
        st.execute("INSERT INTO readings VALUES (1, 'a'), (2, 'b'), (3, 'c')")
        st.execute("CREATE TABLE sink_append (id INT, val VARCHAR(50))")
        st.execute("CREATE TABLE sink_custom (id INT, val VARCHAR(50))")
        st.execute("INSERT INTO sink_custom VALUES (99, 'stale')")
        st.execute("CREATE TABLE sink_custom2 (id INT, val VARCHAR(50))")
        st.execute("INSERT INTO sink_custom2 VALUES (5, 'keep')")
    finally:
        st.close()
        conn.close()
    yield URL


def _fetch_all(spark, table):
    jvm = spark.sparkContext._gateway.jvm
    conn = jvm.java.sql.DriverManager.getConnection(URL)
    try:
        st = conn.createStatement()
        rs = st.executeQuery(f"SELECT * FROM {table} ORDER BY id")
        out = []
        while rs.next():
            out.append((rs.getInt(1), rs.getString(2)))
        return out
    finally:
        conn.close()


def test_jdbc_source_pipeline(spark, derby):
    yml = f"""
sources:
  - type: odbc
    name: db_readings
    load_query: SELECT id, val FROM readings WHERE id < 3
    connection_string: "{URL}"
stages:
  - name: jdbc_out
    query: SELECT count(*) AS n, min(val) AS first_val FROM db_readings
"""
    result = run_pipeline(spark, load_pipeline_str(yml))
    row = result.result.collect()[0]
    assert row.n == 2 and row.first_val == "a"
    spark.catalog.dropTempView("jdbc_out")
    spark.catalog.dropTempView("db_readings")


def test_jdbc_append_sink(spark, derby):
    yml = f"""
sources:
  - type: odbc
    name: db_readings2
    load_query: SELECT id, val FROM readings
    connection_string: "{URL}"
stages:
  - name: doubled_ids
    query: SELECT id + 10 AS id, val FROM db_readings2
destination:
  type: odbc
  name: sink_append
  connection_string: "{URL}"
  write_mode:
    operation: append
  batch_size: 2
"""
    run_pipeline(spark, load_pipeline_str(yml))
    assert _fetch_all(spark, "sink_append") == [(11, "a"), (12, "b"), (13, "c")]
    spark.catalog.dropTempView("doubled_ids")
    spark.catalog.dropTempView("db_readings2")


def test_jdbc_custom_transactional_write(spark, derby):
    dest = OdbcDestination(
        type="odbc",
        name="sink_custom",
        connection_string=URL,
        write_mode=OdbcWriteMode(
            operation="custom",
            transaction=CustomStatements(
                pre_insert="DELETE FROM sink_custom",
                insert="INSERT INTO sink_custom (id, val) VALUES (?, ?)",
            ),
        ),
        batch_size=2,
    )
    df = spark.createDataFrame([(1, "x"), (2, "y"), (3, "z")], ["id", "val"])
    _write_jdbc_custom(dest, df)
    # stale row deleted in the same transaction, new rows inserted
    assert _fetch_all(spark, "sink_custom") == [(1, "x"), (2, "y"), (3, "z")]


def test_jdbc_custom_rollback_on_error(spark, derby):
    dest = OdbcDestination(
        type="odbc",
        name="sink_custom2",
        connection_string=URL,
        write_mode=OdbcWriteMode(
            operation="custom",
            transaction=CustomStatements(
                pre_insert="DELETE FROM sink_custom2",
                insert="INSERT INTO nonexistent_table (id, val) VALUES (?, ?)",
            ),
        ),
        batch_size=2,
    )
    df = spark.createDataFrame([(7, "q")], ["id", "val"])
    with pytest.raises(Exception):
        _write_jdbc_custom(dest, df)
    # the pre_insert DELETE must have rolled back with the failed insert
    assert _fetch_all(spark, "sink_custom2") == [(5, "keep")]


def test_jdbc_partitioned_read(spark, derby):
    """partitionColumn options trigger a parallel partitioned read
    (query wrapped as dbtable); results identical to the plain read."""
    yml = f"""
sources:
  - type: odbc
    name: db_part
    load_query: SELECT id, val FROM readings
    connection_string: "{URL}"
    options:
      partitionColumn: id
      lowerBound: "0"
      upperBound: "10"
      numPartitions: "3"
stages:
  - name: jdbc_part_out
    query: SELECT CAST(count(*) AS BIGINT) AS n FROM db_part
"""
    result = run_pipeline(spark, load_pipeline_str(yml))
    assert result.result.collect()[0].n == spark.table("db_part").count()
    assert spark.table("db_part").rdd.getNumPartitions() == 3
    spark.catalog.dropTempView("jdbc_part_out")
    spark.catalog.dropTempView("db_part")


def test_jdbc_custom_write_temporal_and_decimal_types(spark, derby):
    """The transactional path converts datetime/date/Decimal values to
    java.sql types for setObject (py4j cannot auto-convert them)."""
    jvm = spark.sparkContext._gateway.jvm
    conn = jvm.java.sql.DriverManager.getConnection(URL)
    try:
        st = conn.createStatement()
        st.execute(
            "CREATE TABLE sink_typed (id INT, ts TIMESTAMP, d DATE, amt DECIMAL(10,2))"
        )
        st.close()
    finally:
        conn.close()

    from aqueducts_spark.config.model import OdbcDestination

    dest = OdbcDestination(
        name="sink_typed",
        connection_string=URL,
        write_mode={
            "operation": "custom",
            "transaction": {
                "insert": "INSERT INTO sink_typed VALUES (?, ?, ?, ?)"
            },
        },
    )
    df = spark.sql(
        "SELECT 1 AS id, TIMESTAMP '2026-01-02 03:04:05.123456' AS ts, "
        "DATE '2026-01-02' AS d, CAST(12.34 AS DECIMAL(10,2)) AS amt"
    )
    _write_jdbc_custom(dest, df)

    conn = jvm.java.sql.DriverManager.getConnection(URL)
    try:
        st = conn.createStatement()
        rs = st.executeQuery("SELECT id, ts, d, amt FROM sink_typed")
        assert rs.next()
        assert rs.getInt(1) == 1
        assert rs.getTimestamp(2).toString().startswith("2026-01-02 03:04:05")
        assert rs.getDate(3).toString() == "2026-01-02"
        assert str(rs.getBigDecimal(4)) == "12.34"
        assert not rs.next()
    finally:
        conn.close()


def test_jdbc_append_to_missing_table_fails_fast(spark, derby):
    """Spark's SaveMode.Append silently auto-creates a missing target;
    reference parity (odbc/src/lib.rs:87-104) requires the append
    target to EXIST — a typo'd name must error, not 'succeed' into a
    brand-new table."""
    from aqueducts_spark.destinations.write import (
        DestinationError,
        _write_jdbc,
    )

    dest = OdbcDestination(
        type="odbc",
        name="sink_appendzz",  # typo'd; does not exist
        connection_string=URL,
        write_mode=OdbcWriteMode(operation="append"),
    )
    df = spark.createDataFrame([(1, "x")], "id int, val string")
    with pytest.raises(DestinationError, match="does not exist"):
        _write_jdbc(dest, df)
    # and the existing-table path still works
    dest_ok = OdbcDestination(
        type="odbc",
        name="sink_append",
        connection_string=URL,
        write_mode=OdbcWriteMode(operation="append"),
    )
    _write_jdbc(dest_ok, df)
    assert (1, "x") in _fetch_all(spark, "sink_append")


def test_duplicate_source_names_rejected(spark):
    from aqueducts_spark.config.model import parse_source
    from aqueducts_spark.sources.register import SourceError, register_sources

    src = parse_source(
        {
            "type": "file",
            "name": "dup",
            "format": {"type": "parquet"},
            "location": "/root/testdata/sf0.001/nation.parquet",
        }
    )
    with pytest.raises(SourceError, match="duplicate source name"):
        register_sources(spark, [src, src])
