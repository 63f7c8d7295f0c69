"""Stage execution: one SQL query -> named temp view.

Reference: aqueducts/core/src/stages/mod.rs:48-173 (SQL with DDL/DML
denied :53-56, eager cache :59-71, show :101-141 capped at 500 for
``show: 0``, explain :73-99, print_schema :143-148, registration :167).

Spark-first deviation (SURVEY §7.3, deliberate): stages are **lazy by
default**. The reference eagerly materializes every stage; at 100 TB
that forces a full materialization barrier per stage and defeats
Catalyst's cross-stage optimization (filter pushdown *through* stage
boundaries, join reordering over the whole plan). We only materialize
when the stage (a) sets ``eager: true``, (b) requests
``explain_analyze`` (which must execute to have metrics), or (c) is
consumed by more than one downstream stage (decided by the pipeline
runner, which then uses ``.cache()``).  A plain ``show`` does NOT
materialize: it executes only the displayed prefix, and a
single-consumer downstream recomputes the lineage — set ``eager: true``
alongside ``show`` when the stage is expensive and also consumed.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from .config.model import Stage
from .progress import ProgressTracker
from .sql_guard import validate_stage_sql

SHOW_UNLIMITED_CAP = 500  # reference stages/mod.rs:101-106


def _with_stage_errors(stage_name: str, action):
    """Attribute EXECUTION-time failures (count/show/analyze) to their
    stage — analysis errors get wrapped in build_stage_df, but a runtime
    error (UDF raise, ANSI overflow) inside an action would otherwise
    surface as a bare Py4J error with no stage name, which in a parallel
    group is unattributable."""
    try:
        return action()
    except Exception as exc:
        raise StageError(stage_name, exc) from exc


class StageError(RuntimeError):
    def __init__(self, stage_name: str, cause: Exception):
        self.stage_name = stage_name
        self.cause = cause
        super().__init__(f"stage '{stage_name}' failed: {cause}")


def build_stage_df(
    spark: SparkSession, stage: Stage, sql_dialect: str | None = None
) -> DataFrame:
    """Resolve a stage (SQL query or declarative operator) to its lazy
    DataFrame — no action, no caching, no view registration."""
    try:
        if stage.operator is not None:
            from .operators.registry import run_operator

            return run_operator(spark, stage.operator)
        query = stage.query
        if sql_dialect == "datafusion":
            from .functions.compat import translate_sql

            query = translate_sql(query)
        validate_stage_sql(query, stage_name=stage.name)
        return spark.sql(query)
    except Exception as exc:
        raise StageError(stage.name, exc) from exc


def emit_explain(df: DataFrame, stage_name: str, tracker: ProgressTracker) -> None:
    """Emit a stage's extended plan + scale lint to the tracker — shared
    by the batch runner (process_stage) and the streaming runner.

    Streaming frames emit their LOGICAL plans only: physical planning
    of a streaming query happens per microbatch after ``start()``, so
    the extended mode (which plans physically) raises pre-start — and
    the physical-plan lint has nothing to inspect yet."""
    if df.isStreaming:
        # only the ANALYZED plan is reachable pre-start: optimization
        # already routes through assertSupported(), which rejects a
        # streaming frame outside writeStream
        qe = df._jdf.queryExecution()
        text = "== Analyzed Logical Plan ==\n" + qe.analyzed().toString()
        tracker.on_output(stage_name, "explain", text)
        return
    plan = df._sc._jvm.PythonSQLUtils.explainString(  # same as df.explain text
        df._jdf.queryExecution(), "extended"
    )
    tracker.on_output(stage_name, "explain", plan)
    from .plans import lint_plan

    warnings = lint_plan(df)
    if warnings:
        tracker.on_output(
            stage_name, "plan_lint", "\n".join(f"WARN: {w}" for w in warnings)
        )


def process_stage(
    spark: SparkSession,
    stage: Stage,
    tracker: ProgressTracker,
    cache: bool = False,
    sql_dialect: str | None = None,
    prebuilt: DataFrame | None = None,
) -> DataFrame:
    """Run a stage (SQL query or declarative operator) and register the
    result as a temp view.  ``prebuilt`` skips the build when the
    caller already resolved the stage (the streaming runner probes
    ``isStreaming`` first — rebuilding would re-run any driver-side
    work an operator's construction does)."""
    if prebuilt is not None:
        df = prebuilt
    else:
        df = build_stage_df(spark, stage, sql_dialect)

    want_materialize = stage.eager or stage.explain_analyze
    if cache or want_materialize:
        df = df.cache()

    if stage.explain:
        emit_explain(df, stage.name, tracker)

    if stage.explain_analyze:
        # Spark has no in-band EXPLAIN ANALYZE.  df.count() would run a
        # SEPARATE QueryExecution and df's own executedPlan() would stay
        # unexecuted (printed as isFinalPlan=false with no metrics) —
        # so execute the count's OWN plan and print that execution's
        # final adaptive plan: it contains the stage's full plan with
        # isFinalPlan=true after AQE re-planning.  One execution is
        # enough: executeCollect() on this plan also populates the
        # stage's cache when want_materialize set .cache() above.
        jqe = df.groupBy().count()._jdf.queryExecution()
        _with_stage_errors(stage.name, lambda: jqe.executedPlan().executeCollect())
        executed = df._sc._jvm.PythonSQLUtils.explainString(jqe, "formatted")
        tracker.on_output(stage.name, "explain_analyze", executed)
    elif want_materialize:
        _with_stage_errors(stage.name, lambda: df.count())

    if stage.show is not None:
        n = stage.show if stage.show and stage.show > 0 else SHOW_UNLIMITED_CAP
        tracker.on_output(
            stage.name,
            "show",
            _with_stage_errors(stage.name, lambda: df._show_string(n, 0, False)),
        )

    if stage.print_schema:
        tracker.on_output(stage.name, "schema", df._jdf.schema().treeString())

    df.createOrReplaceTempView(stage.name)
    return df
