"""Destination writers.

Reference behavior: aqueducts/core/src/destinations/mod.rs (dispatch
:182-259, write :263-356), file sinks aqueducts/core/src/destinations/
file.rs, Delta writes aqueducts/delta/src/lib.rs:177-328, ODBC writes
aqueducts/odbc/src/lib.rs:87-211.

Scale notes:

* All writers are plain distributed ``df.write`` paths — no data ever
  passes through the driver except the JDBC "custom transaction" path,
  which the reference also runs through a single connection.
* ``single_file: true`` coalesces to one task — correct per config
  semantics, deliberately NOT the default for partitioned outputs and
  documented as a small-output feature (at 100 TB you want
  ``single_file: false`` + ``partition_columns``).
"""

from __future__ import annotations

import shutil

from pyspark.sql import DataFrame, SparkSession

from ..config.model import (
    DeltaDestination,
    Destination,
    FileDestination,
    InMemoryDestination,
    IvfIndexDestination,
    OdbcDestination,
    PqIndexDestination,
)
from ..delta import delta_layer
from ..delta.table import cast_to_schema
from ..location import is_local, normalize_location, to_local_path
from ..sources.register import _view_exists
from ..storage import apply_storage_config


class DestinationError(RuntimeError):
    pass


def prepare_destination(spark: SparkSession, dest: Destination) -> None:
    """Fail-fast registration before any data is read
    (reference core/src/lib.rs:82-91): validate config targets and
    create Delta tables if absent."""
    if isinstance(dest, InMemoryDestination):
        if _view_exists(spark, dest.name):
            raise DestinationError(
                f"in_memory destination name already registered: '{dest.name}'"
            )
    elif isinstance(dest, FileDestination):
        location = normalize_location(dest.location, dest.storage_config)
        apply_storage_config(spark, location, dest.storage_config)
        if dest.single_file and dest.partition_columns:
            raise DestinationError(
                "single_file and partition_columns are mutually exclusive"
            )
        if dest.single_file and not is_local(location):
            # fail BEFORE the pipeline computes, not after hours of work
            # when the writer finally runs
            raise DestinationError(
                "single_file output currently requires a local path; "
                "set single_file: false for object stores"
            )
        if dest.cluster_files is not None and dest.cluster_files < 1:
            # a falsy 0 would silently fall through to the default
            # partition count instead of honoring (or rejecting) the
            # user's explicit file-count request
            raise DestinationError(
                f"cluster_files must be >= 1, got {dest.cluster_files}"
            )
    elif isinstance(dest, DeltaDestination):
        location = normalize_location(dest.location, dest.storage_config)
        apply_storage_config(spark, location, dest.storage_config)
        if dest.schema_ and dest.partition_columns:
            declared = {f.name for f in dest.schema_}
            missing = [c for c in dest.partition_columns if c not in declared]
            if missing:
                # cheap config validation that otherwise only surfaces
                # after the whole pipeline has computed (the native
                # delta-spark path has no create-at-prepare step)
                raise DestinationError(
                    f"delta destination partition column(s) {missing} not "
                    "in the declared schema"
                )
        layer = delta_layer(spark)
        if not layer.native:
            layer.table(location).create_if_absent(
                dest.schema_,
                dest.partition_columns,
                dest.table_properties,
                dest.metadata,
            )
    elif isinstance(dest, OdbcDestination):
        # target-table existence is verified at write time over JDBC
        # (reference odbc/src/lib.rs:87-104); nothing to prepare here
        pass
    elif isinstance(dest, (IvfIndexDestination, PqIndexDestination)):
        location = normalize_location(dest.location, dest.storage_config)
        apply_storage_config(spark, location, dest.storage_config)
    else:
        raise DestinationError(f"unknown destination type: {type(dest).__name__}")


def write_to_destination(spark: SparkSession, dest: Destination, df: DataFrame) -> None:
    if isinstance(dest, InMemoryDestination):
        # errors if taken, checked in prepare; cache so downstream reads
        # of the named result don't recompute the pipeline
        df.cache()
        df.createTempView(dest.name)
    elif isinstance(dest, FileDestination):
        _write_file(dest, df)
    elif isinstance(dest, DeltaDestination):
        _write_delta(spark, dest, df)
    elif isinstance(dest, OdbcDestination):
        _write_jdbc(dest, df)
    elif isinstance(dest, IvfIndexDestination):
        from ..operators.similarity import ivf_persist

        loc = normalize_location(dest.location, dest.storage_config)
        ivf_persist(
            df,
            str(to_local_path(loc)) if is_local(loc) else loc,
            n_centroids=dest.n_centroids,
            seed=dest.seed,
            id_col=dest.id_col,
            vec_col=dest.vec_col,
        )
    elif isinstance(dest, PqIndexDestination):
        from ..operators.similarity import pq_persist

        loc = normalize_location(dest.location, dest.storage_config)
        pq_persist(
            df,
            str(to_local_path(loc)) if is_local(loc) else loc,
            n_centroids=dest.n_centroids,
            n_subspaces=dest.n_subspaces,
            n_pq_centroids=dest.n_pq_centroids,
            seed=dest.seed,
            id_col=dest.id_col,
            vec_col=dest.vec_col,
            store_floats=dest.store_floats,
            by_residual=dest.by_residual,
        )
    else:
        raise DestinationError(f"unknown destination type: {type(dest).__name__}")


# ---------------------------------------------------------------------------
# files
# ---------------------------------------------------------------------------


def _apply_csv_options(writer, opts):
    """CSV writer options shared by the plain/bucketed/single-file
    paths — one place to add quote/escape/nullValue handling later."""
    writer = writer.option("header", str(opts.has_header).lower()).option(
        "sep", opts.delimiter
    )
    if opts.compression:
        writer = writer.option("compression", opts.compression)
    return writer


def _write_file(dest: FileDestination, df: DataFrame) -> None:
    location = normalize_location(dest.location, dest.storage_config)
    fmt = dest.format

    if dest.single_file:
        _write_single_file(dest, df, location)
        return

    if dest.bucket_by is not None:
        # bucketed output must go through saveAsTable (bucket metadata
        # lives in the catalog); the path option keeps it external
        spec = dest.bucket_by
        writer = (
            df.write.mode("overwrite")
            .format(fmt.type)
            .option("path", str(to_local_path(location)) if is_local(location) else location)
        )
        if fmt.type == "csv":
            writer = _apply_csv_options(writer, fmt.parsed)
        elif fmt.type in ("parquet", "orc", "json") and fmt.parsed:
            writer = writer.options(**fmt.parsed)
        if dest.partition_columns:
            writer = writer.partitionBy(*dest.partition_columns)
        writer = writer.bucketBy(spec.buckets, *spec.columns)
        if spec.sort_by:
            writer = writer.sortBy(*spec.sort_by)
        writer.saveAsTable(dest.name)
        return

    if dest.cluster_by:
        # one range shuffle at write time buys file-level min/max
        # pruning on every future scan with a cluster-key predicate
        from pyspark.sql import functions as F

        cols = [F.col(c) for c in dest.cluster_by]
        if dest.cluster_files:
            df = df.repartitionByRange(dest.cluster_files, *cols)
        else:
            df = df.repartitionByRange(*cols)
        df = df.sortWithinPartitions(*cols)

    if dest.zorder_by:
        # Morton-interleave the columns into one key, range-sort by it:
        # same single shuffle as cluster_by, but min/max file stats stay
        # tight on EVERY z-column, not just a leading one
        from pyspark.sql import functions as F

        from aqueducts_spark.operators.zorder import with_zorder_key

        zcol = "__aqueducts_zorder"
        df = with_zorder_key(df, dest.zorder_by, key_col=zcol)
        if dest.cluster_files:
            df = df.repartitionByRange(dest.cluster_files, F.col(zcol))
        else:
            df = df.repartitionByRange(F.col(zcol))
        df = df.sortWithinPartitions(zcol).drop(zcol)

    writer = df.write.mode("overwrite")
    if dest.partition_columns:
        writer = writer.partitionBy(*dest.partition_columns)
    if fmt.type == "csv":
        _apply_csv_options(writer, fmt.parsed).csv(location)
    elif fmt.type == "parquet":
        writer.options(**(fmt.parsed or {})).parquet(location)
    elif fmt.type == "orc":
        writer.options(**(fmt.parsed or {})).orc(location)
    elif fmt.type == "json":
        writer.options(**(fmt.parsed or {})).json(location)
    else:
        raise DestinationError(f"unsupported file format: {fmt.type}")


def _write_single_file(dest: FileDestination, df: DataFrame, location: str) -> None:
    """Spark writes directories; ``single_file`` coalesces to one part
    file and renames it to the target path (SURVEY §7.3)."""
    if not is_local(location):
        raise DestinationError(
            "single_file output currently requires a local path; "
            "set single_file: false for object stores"
        )
    target = to_local_path(location)
    tmp_dir = target.parent / f".{target.name}.spark-tmp"
    if tmp_dir.exists():
        shutil.rmtree(tmp_dir)
    fmt = dest.format
    one = df.coalesce(1).write.mode("overwrite")
    if fmt.type == "csv":
        _apply_csv_options(one, fmt.parsed).csv(str(tmp_dir))
        pattern = "part-*"
    elif fmt.type == "parquet":
        one.options(**(fmt.parsed or {})).parquet(str(tmp_dir))
        pattern = "part-*.parquet"
    elif fmt.type == "orc":
        one.options(**(fmt.parsed or {})).orc(str(tmp_dir))
        pattern = "part-*"
    elif fmt.type == "json":
        one.options(**(fmt.parsed or {})).json(str(tmp_dir))
        pattern = "part-*"
    else:
        raise DestinationError(f"unsupported file format: {fmt.type}")
    parts = sorted(tmp_dir.glob(pattern))
    if len(parts) != 1:
        raise DestinationError(
            f"expected exactly one part file in {tmp_dir}, found {len(parts)}"
        )
    target.parent.mkdir(parents=True, exist_ok=True)
    if target.exists():
        if target.is_dir():
            shutil.rmtree(target)
        else:
            target.unlink()
    shutil.move(str(parts[0]), str(target))
    shutil.rmtree(tmp_dir)


# ---------------------------------------------------------------------------
# delta
# ---------------------------------------------------------------------------


def _write_delta(spark: SparkSession, dest: DeltaDestination, df: DataFrame) -> None:
    location = normalize_location(dest.location, dest.storage_config)
    layer = delta_layer(spark)
    mode = dest.write_mode

    if layer.native:  # pragma: no cover - requires delta-spark
        _write_delta_native(spark, dest, df, location)
        return

    table = layer.table(location)
    table.create_if_absent(
        dest.schema_, dest.partition_columns, dest.table_properties, dest.metadata
    )
    if mode.operation == "append":
        table.append(df)
    elif mode.operation == "upsert":
        table.upsert(df, mode.merge_keys)
    elif mode.operation == "replace":
        conds = [(c.column, c.value) for c in mode.replace_conditions]
        table.replace(df, conds)
    else:
        raise DestinationError(f"unknown delta write operation: {mode.operation}")


def _write_delta_native(
    spark: SparkSession, dest: DeltaDestination, df: DataFrame, location: str
) -> None:  # pragma: no cover - requires delta-spark
    from delta.tables import DeltaTable  # type: ignore

    from ..delta.table import build_replace_predicate_sql, merge_key_condition

    mode = dest.write_mode
    if dest.schema_:
        df = cast_to_schema(df, dest.schema_)
    if not DeltaTable.isDeltaTable(spark, location):
        builder = DeltaTable.createIfNotExists(spark).location(location)
        if dest.schema_:
            from ..types import fields_to_struct

            builder = builder.addColumns(fields_to_struct(dest.schema_))
        if dest.partition_columns:
            builder = builder.partitionedBy(*dest.partition_columns)
        for k, v in dest.table_properties.items():
            if v is not None:
                builder = builder.property(k, v)
        builder.execute()
    if mode.operation == "append":
        df.write.format("delta").mode("append").save(location)
    elif mode.operation == "upsert":
        target = DeltaTable.forPath(spark, location)
        cond = merge_key_condition(df.schema, mode.merge_keys, "old", "new")
        (
            target.alias("old")
            .merge(df.alias("new"), cond)
            .whenMatchedUpdateAll()
            .whenNotMatchedInsertAll()
            .execute()
        )
    elif mode.operation == "replace":
        conds = [(c.column, c.value) for c in mode.replace_conditions]
        (
            df.write.format("delta")
            .mode("overwrite")
            .option("replaceWhere", build_replace_predicate_sql(conds))
            .save(location)
        )
    else:
        # defensive mirror of the fallback path: a future widening of
        # DeltaWriteMode must not become a silent no-op on native
        raise DestinationError(f"unknown delta write operation: {mode.operation}")


# ---------------------------------------------------------------------------
# jdbc
# ---------------------------------------------------------------------------


def _require_jdbc_table(df: DataFrame, dest: OdbcDestination) -> None:
    """Reference parity (odbc/src/lib.rs:87-104): the append target must
    already exist.  Spark's SaveMode.Append silently CREATES a missing
    table with driver-default types — a typo'd table name would then
    'succeed' into a brand-new empty-schema table while the real target
    gets nothing.  One zero-row probe over a single JDBC connection."""
    jvm = df.sparkSession.sparkContext._gateway.jvm
    try:
        conn = jvm.java.sql.DriverManager.getConnection(dest.connection_string)
    except Exception as exc:
        raise DestinationError(
            f"jdbc destination: cannot connect to {dest.name!r}: {exc}"
        ) from exc
    try:
        st = conn.createStatement()
        try:
            st.executeQuery(f"SELECT * FROM {dest.name} WHERE 1=0").close()
        except Exception as exc:
            raise DestinationError(
                f"jdbc destination: target table {dest.name!r} does not "
                f"exist (create it first; append never auto-creates): {exc}"
            ) from exc
        finally:
            st.close()
    finally:
        conn.close()


def _write_jdbc(dest: OdbcDestination, df: DataFrame) -> None:
    mode = dest.write_mode
    if mode.operation == "append":
        _require_jdbc_table(df, dest)
        (
            df.write.format("jdbc")
            .option("url", dest.connection_string)
            .option("dbtable", dest.name)
            .option("batchsize", dest.batch_size)
            .mode("append")
            .save()
        )
    elif mode.operation == "custom":
        _write_jdbc_custom(dest, df)
    else:
        raise DestinationError(f"unknown jdbc write operation: {mode.operation}")


def _write_jdbc_custom(dest: OdbcDestination, df: DataFrame) -> None:
    """Transactional write: optional pre_insert statement + prepared
    batch inserts in ONE transaction, rollback on error (reference
    aqueducts/odbc/src/lib.rs:170-211).

    ``df.write.jdbc`` cannot express this (per-partition transactions),
    so we drive a single JDBC connection through the JVM gateway. Data
    streams through ``toLocalIterator`` — one partition in memory at a
    time — mirroring the reference's single-connection semantics.
    """
    spark = df.sparkSession
    gateway = spark.sparkContext._gateway
    jvm = gateway.jvm
    stmts = dest.write_mode.transaction
    assert stmts is not None
    conn = jvm.java.sql.DriverManager.getConnection(dest.connection_string)
    try:
        conn.setAutoCommit(False)
        if stmts.pre_insert:
            st = conn.createStatement()
            try:
                st.execute(stmts.pre_insert)
            finally:
                st.close()
        ps = conn.prepareStatement(stmts.insert)

        # py4j auto-converts primitives/strings but NOT Python temporal
        # or decimal values — map them to the java.sql / BigDecimal
        # types JDBC setObject understands
        import datetime as _dt
        import decimal as _decimal

        def _to_jdbc(value):
            if isinstance(value, _dt.datetime):
                return jvm.java.sql.Timestamp.valueOf(
                    value.strftime("%Y-%m-%d %H:%M:%S")
                    + (".%06d" % value.microsecond if value.microsecond else "")
                )
            if isinstance(value, _dt.date):
                return jvm.java.sql.Date.valueOf(value.isoformat())
            if isinstance(value, _decimal.Decimal):
                return jvm.java.math.BigDecimal(str(value))
            if isinstance(value, (bytes, bytearray)):
                return bytearray(value)
            return value

        try:
            pending = 0
            for row in df.toLocalIterator():
                for i, value in enumerate(row):
                    ps.setObject(i + 1, _to_jdbc(value))
                ps.addBatch()
                pending += 1
                if pending >= dest.batch_size:
                    ps.executeBatch()
                    pending = 0
            if pending:
                ps.executeBatch()
        finally:
            ps.close()
        conn.commit()
    except Exception:
        conn.rollback()
        raise
    finally:
        conn.close()
