"""Every file in examples/ must parse (mirrors the reference's
schemas/tests/integration.rs:91-131), and the runnable ones run."""

from pathlib import Path

import pytest

from aqueducts_spark import load_pipeline, run_pipeline
from aqueducts_spark.config.templating import find_params

EXAMPLES = sorted(Path(__file__).parent.parent.glob("examples/*.yml"))

PARAMS = {
    "data_dir": "/root/testdata/sf0.001",
    "out_dir": "/tmp/aq_examples",
    "min_quality": "0.5",
    "min_margin_micro": "0",
    "in_dir": "/tmp/aq_examples",
}


@pytest.mark.parametrize("path", EXAMPLES, ids=lambda p: p.name)
def test_example_parses(path):
    params = {k: PARAMS.get(k, "x") for k in find_params(path.read_text())}
    pipeline = load_pipeline(path, params)
    assert pipeline.stage_groups


def test_examples_exist():
    assert len(EXAMPLES) >= 4


@pytest.mark.parametrize(
    "name",
    [
        "orders_summary.yml",
        "curation.yml",
        "delta_upsert.yml",
        "training_mix.yml",
        "datafusion_dialect.yml",
        "event_attribution.yml",
        "pretrain_prep.yml",
        "embedding_index.yml",
        "embedding_dedup.yml",
        "web_curation.yml",
        "dsir_selection.yml",
        "hybrid_retrieval.yml",
        "quality_funnel.yml",
        "tokenizer_fit.yml",
        "corpus_layout.yml",
        "multimodal_neardup.yml",
        "seed_classifier.yml",
        "mixture_release.yml",
    ],
)
def test_runnable_examples_run(spark, tmp_path, name):
    path = Path(__file__).parent.parent / "examples" / name
    params = dict(PARAMS, out_dir=str(tmp_path))
    pipeline = load_pipeline(path, params)
    result = run_pipeline(spark, pipeline)
    assert result.result is not None and result.result.count() > 0
    for group in pipeline.stage_groups:
        for stage in group:
            try:
                spark.catalog.dropTempView(stage.name)
            except Exception:
                pass
    for src in pipeline.parsed_sources:
        try:
            spark.catalog.dropTempView(src.name)
        except Exception:
            pass


def test_lakehouse_cdc_example_chains_after_upsert(spark, tmp_path):
    """delta_upsert.yml twice (append then in-place update) followed by
    lakehouse_cdc.yml reading the version-1→latest diff: the CDC source
    works on the real-protocol table the first example wrote."""
    base = Path(__file__).parent.parent / "examples"
    params = dict(PARAMS, out_dir=str(tmp_path))

    def _cleanup(pipeline):
        for group in pipeline.stage_groups:
            for stage in group:
                try:
                    spark.catalog.dropTempView(stage.name)
                except Exception:
                    pass
        for src in pipeline.parsed_sources:
            try:
                spark.catalog.dropTempView(src.name)
            except Exception:
                pass

    for _ in range(2):
        p = load_pipeline(base / "delta_upsert.yml", params)
        run_pipeline(spark, p)
        _cleanup(p)

    cdc_params = dict(params, table_dir=str(tmp_path))
    p = load_pipeline(base / "lakehouse_cdc.yml", cdc_params)
    result = run_pipeline(spark, p)
    df = result.result
    assert set(df.columns) == {"date", "priority", "n_orders", "total_price"}
    assert df.count() > 0
    _cleanup(p)


def test_raw_text_ingest_example_runs(spark, tmp_path):
    """raw_text_ingest.yml over a synthesized directory of .txt files:
    wholetext ingestion -> hash ids -> quality scores -> parquet."""
    base = Path(__file__).parent.parent / "examples"
    corpus = tmp_path / "corpus"
    corpus.mkdir()
    for i in range(3):
        (corpus / f"doc{i}.txt").write_text(
            f"document {i} with enough plain words to look like real "
            f"prose and not pure noise for the quality scorer"
        )
    (corpus / "ignore.bin").write_bytes(b"\x00\x01")
    params = dict(PARAMS, out_dir=str(tmp_path), corpus_dir=str(corpus))
    pipeline = load_pipeline(base / "raw_text_ingest.yml", params)
    result = run_pipeline(spark, pipeline)
    assert result.result is not None and result.result.count() == 3
    back = spark.read.parquet(str(tmp_path / "ingested"))
    assert back.count() == 3
    assert {"doc_id", "quality_score"} <= set(back.columns)
    for group in pipeline.stage_groups:
        for stage in group:
            try:
                spark.catalog.dropTempView(stage.name)
            except Exception:
                pass
    for src in pipeline.parsed_sources:
        try:
            spark.catalog.dropTempView(src.name)
        except Exception:
            pass


def test_streaming_ingest_example_runs_incrementally(spark, tmp_path):
    """streaming_ingest.yml with availableNow: the first run drains the
    initial backlog; a second run (same checkpoint) picks up EXACTLY
    the new file — the scheduled-incremental contract."""
    import shutil

    path = Path(__file__).parent.parent / "examples" / "streaming_ingest.yml"
    incoming = tmp_path / "incoming"
    incoming.mkdir()
    shutil.copy(
        "/root/testdata/sf0.001/documents.parquet", incoming / "b1.parquet"
    )
    params = {
        "in_dir": str(tmp_path),
        "out_dir": str(tmp_path),
        "min_quality": "0.5",
    }
    r1 = run_pipeline(spark, load_pipeline(path, params))
    n1 = r1.result.count()
    assert n1 > 0
    assert set(r1.result.columns) == {"doc_id", "n_tokens", "quality_score"}
    # no new files: a re-run drains nothing and the sink is unchanged
    r2 = run_pipeline(spark, load_pipeline(path, params))
    assert r2.result.count() == n1
    # a new file lands: ONLY it drains; the sink doubles
    shutil.copy(
        "/root/testdata/sf0.001/documents.parquet", incoming / "b2.parquet"
    )
    r3 = run_pipeline(spark, load_pipeline(path, params))
    assert r3.result.count() == 2 * n1
    for v in ("doc_stream", "english", "scored", "kept"):
        try:
            spark.catalog.dropTempView(v)
        except Exception:
            pass


def test_stream_rollup_example_upserts_incrementally(spark, tmp_path):
    """stream_rollup.yml: watermarked windowed counts upsert into a
    Delta rollup matching the batch aggregation exactly; a checkpointed
    re-run drains nothing and leaves the rollup unchanged."""
    import shutil

    path = Path(__file__).parent.parent / "examples" / "stream_rollup.yml"
    inc = tmp_path / "events_incoming"
    inc.mkdir()
    shutil.copy("/root/testdata/sf0.001/events.parquet", inc / "e1.parquet")
    params = {"in_dir": str(tmp_path), "out_dir": str(tmp_path)}
    r1 = run_pipeline(spark, load_pipeline(path, params))
    keys1 = {(r.day, r.event_type): r.n for r in r1.result.collect()}
    assert keys1 and sum(keys1.values()) == spark.read.parquet(
        "/root/testdata/sf0.001/events.parquet"
    ).count()
    # a re-run with NO new files drains nothing and leaves the rollup
    # unchanged (checkpointed source + state).  Note the deliberate
    # semantics if old events were re-sent: they would be LATE beyond
    # the 1-hour watermark and correctly dropped from evicted windows
    # — the rollup never double-counts history.
    r2 = run_pipeline(spark, load_pipeline(path, params))
    keys2 = {(r.day, r.event_type): r.n for r in r2.result.collect()}
    assert keys2 == keys1
    for v in ("event_stream", "daily_counts"):
        try:
            spark.catalog.dropTempView(v)
        except Exception:
            pass
