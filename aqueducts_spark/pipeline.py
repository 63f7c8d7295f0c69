"""Pipeline runner: sources -> sequential groups of parallel stages ->
destination.

Reference: aqueducts/core/src/lib.rs:68-220 — fail-fast destination
preparation (:82-91), concurrent source registration (:93-123),
parallel stage groups with barriers (:125-175), stage TTL / temp-view
reclamation by last textual use (:223-274), destination write from the
last stage of the last group (:177-190).
"""

from __future__ import annotations

import re
from concurrent.futures import ThreadPoolExecutor

_JOB_GROUP_PROPS = (
    "spark.jobGroup.id",
    "spark.job.description",
    "spark.job.interruptOnCancel",
    "spark.scheduler.pool",
)


def _propagate_job_group(spark, fn):
    """Carry the SUBMITTING thread's Spark job-group local properties
    into pool worker threads, so jobs they launch stay cancellable via
    cancelJobGroup (plain ThreadPoolExecutor threads do not inherit
    local properties under PySpark's pinned-thread mode)."""
    sc = spark.sparkContext
    props = {k: sc.getLocalProperty(k) for k in _JOB_GROUP_PROPS}

    def wrapped(*args, **kwargs):
        for k, v in props.items():
            if v is not None:
                sc.setLocalProperty(k, v)
        return fn(*args, **kwargs)

    return wrapped
from typing import Optional

from pyspark.sql import DataFrame, SparkSession

from .config.model import Pipeline, Stage
from .destinations import prepare_destination, write_to_destination
from .functions import (
    register_compat_functions,
    register_udafs,
    register_udfs,
    register_udtfs,
)
from .progress import LoggingTracker, ProgressEvent, ProgressTracker, timer
from .sources import register_sources
from .stages import process_stage


class PipelineResult:
    def __init__(self, spark: SparkSession, result: Optional[DataFrame]):
        self.spark = spark
        self.result = result


def _name_used_in(name: str, query: str) -> bool:
    """Word-boundary scan, as in the reference's TTL calculation
    (core/src/lib.rs:223-254).  Case-insensitive: Spark resolves view
    identifiers case-insensitively (spark.sql.caseSensitive=false
    default), so 'SELECT * FROM docs' IS a use of stage 'Docs' — a
    case-sensitive scan dropped views later stages still needed."""
    return re.search(rf"\b{re.escape(name)}\b", query, re.IGNORECASE) is not None


def compute_ttls(groups: list[list[Stage]]) -> dict[str, int]:
    """stage name -> index of the last group whose queries reference it."""
    ttl: dict[str, int] = {}
    for gi, group in enumerate(groups):
        for stage in group:
            ttl[stage.name] = gi  # at minimum, alive in its own group
    for gi, group in enumerate(groups):
        for stage in group:
            for earlier, last in list(ttl.items()):
                if earlier != stage.name and _name_used_in(earlier, stage.search_text()):
                    ttl[earlier] = max(last, gi)
    return ttl


def count_consumers(groups: list[list[Stage]], name: str, after_group: int) -> int:
    return sum(
        1
        for gi, group in enumerate(groups)
        if gi > after_group
        for stage in group
        if _name_used_in(name, stage.search_text())
    )


def run_pipeline(
    spark: SparkSession,
    pipeline: Pipeline,
    tracker: Optional[ProgressTracker] = None,
) -> PipelineResult:
    """Execute a pipeline on an existing SparkSession.

    The caller may pre-register temp views for ``in_memory`` sources and
    read back ``in_memory`` destinations afterwards (reference
    core/src/lib.rs:26-72, tests/integration.rs:36-52).
    """
    tracker = tracker or LoggingTracker()
    register_udfs(spark)
    register_compat_functions(spark)
    register_udtfs(spark)
    register_udafs(spark)
    tracker.on_progress(ProgressEvent("started"))

    dest = pipeline.parsed_destination
    if dest is not None:
        prepare_destination(spark, dest)

    with timer() as t_src:
        register_sources(spark, pipeline.parsed_sources)
    for s in pipeline.parsed_sources:
        tracker.on_progress(
            ProgressEvent(
                "source_registered",
                name=s.name,
                # registration is one batch; the total is attached to
                # each event rather than measured and discarded
                duration_ms=t_src.elapsed_ms,
            )
        )

    groups = pipeline.stage_groups
    ttls = compute_ttls(groups)
    stage_dfs: dict[str, DataFrame] = {}
    cached: set[str] = set()
    _views_dropped: set[str] = set()

    for gi, group in enumerate(groups):
        def run_one(stage: Stage) -> tuple[str, DataFrame]:
            tracker.on_progress(ProgressEvent("stage_started", name=stage.name))
            with timer() as t:
                # cache when >1 downstream consumer would otherwise
                # recompute the whole lineage (SURVEY §7.3 policy)
                consumers = count_consumers(groups, stage.name, gi)
                df = process_stage(
                    spark,
                    stage,
                    tracker,
                    cache=consumers > 1,
                    sql_dialect=pipeline.sql_dialect,
                )
                if consumers > 1 or stage.eager or stage.explain_analyze:
                    cached.add(stage.name)
            tracker.on_progress(
                ProgressEvent("stage_completed", name=stage.name, duration_ms=t.elapsed_ms)
            )
            return stage.name, df

        if len(group) == 1:
            name, df = run_one(group[0])
            stage_dfs[name] = df
        else:
            # parallel group with barrier (reference core/src/lib.rs:125-175);
            # Spark's scheduler is thread-safe and FAIR-schedules jobs.
            # Job-group/local properties are propagated into the pool
            # threads: plain threads don't inherit them (pinned-thread
            # mode), so jobs launched here would otherwise escape the
            # remote executor's cancelJobGroup.
            with ThreadPoolExecutor(max_workers=len(group)) as pool:
                for name, df in pool.map(
                    _propagate_job_group(spark, run_one), group
                ):
                    stage_dfs[name] = df

        # TTL reclamation (reference core/src/lib.rs:223-274), adapted
        # to LAZY stages: only the temp VIEW is dropped at last textual
        # use — views matter solely for resolving later stages' SQL,
        # which happens group by group, so a textually-dead view is
        # truly dead.  CACHES are NOT released here: downstream
        # consumers are lazy and execute nothing until the destination
        # write, so unpersisting at last *textual* use would destroy a
        # cache (including an eager stage's already-paid count())
        # before anything ever read it, forcing the write to recompute
        # the whole lineage per branch.  Caches release after the write
        # — the first and only point where consumption is complete.
        # (view-drop scope stays what it always was — cached stages
        # only: callers legitimately read UNCACHED intermediate stage
        # views after run_pipeline returns)
        for name, last_group in ttls.items():
            if (
                last_group <= gi
                and gi < len(groups) - 1
                and name in cached
                and name not in _views_dropped
            ):
                spark.catalog.dropTempView(name)
                _views_dropped.add(name)

    result: Optional[DataFrame] = None
    if groups:
        final_stage = groups[-1][-1]
        result = stage_dfs[final_stage.name]

    if dest is not None:
        if result is None:
            raise ValueError("pipeline has a destination but no stages")
        with timer() as t_dst:
            write_to_destination(spark, dest, result)
        tracker.on_progress(
            ProgressEvent(
                "destination_completed", name=dest.name, duration_ms=t_dst.elapsed_ms
            )
        )
        # the write was the last consumer — release the deferred caches.
        # NOT for in_memory destinations: their "write" is cache+view
        # registration with no action (the caller reads the view later),
        # and the result DataFrame here IS the object the destination
        # just cached — unpersisting it would make every later read
        # recompute the pipeline the cache exists to avoid.
        from .config.model import InMemoryDestination

        if not isinstance(dest, InMemoryDestination):
            for name in list(cached):
                stage_dfs[name].unpersist()
                cached.discard(name)

    tracker.on_progress(ProgressEvent("completed"))
    return PipelineResult(spark, result)


def explain_pipeline(
    spark: SparkSession, pipeline: Pipeline
) -> list[dict]:
    """Pre-flight plan review: register sources, resolve every stage
    lazily, and return per-stage formatted physical plans plus scale
    lint warnings (``plans.lint_plan``) — SQL stages plan with zero
    execution and the destination is never written. The cheap way to
    answer "would this pipeline's shuffles/joins survive 100 TB?"
    before paying for the full compute.

    Caveat: OPERATOR stages whose plan depends on data (IVF centroid
    training collects its bounded sample, connected-components runs its
    propagation rounds, LSH probes the vector dimensionality) execute
    that work during explain too — their physical plan cannot exist
    without it.  Pure-expression operator stages and all SQL stages
    stay unexecuted.

    Stages still register as temp views (later stages reference
    earlier ones by name), exactly as in a real run.
    """
    from .plans import lint_plan
    from .stages import build_stage_df

    register_udfs(spark)
    register_compat_functions(spark)
    register_udtfs(spark)
    register_udafs(spark)
    register_sources(spark, pipeline.parsed_sources)

    reports: list[dict] = []
    from .plans.inspect import inspect_plan, lint_info

    for group in pipeline.stage_groups:
        for stage in group:
            df = build_stage_df(spark, stage, pipeline.sql_dialect)
            df.createOrReplaceTempView(stage.name)
            # ONE explainString JVM round-trip per stage: the lint is
            # derived from the same PlanInfo as the printed plan
            info = inspect_plan(df)
            reports.append(
                {
                    "stage": stage.name,
                    "plan": info.text,
                    "warnings": lint_info(info),
                }
            )
    return reports


def run_pipeline_file(
    spark: SparkSession,
    path: str,
    params: Optional[dict[str, str]] = None,
    tracker: Optional[ProgressTracker] = None,
) -> PipelineResult:
    from .config.loader import load_pipeline

    return run_pipeline(spark, load_pipeline(path, params), tracker)
