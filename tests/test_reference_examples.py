"""Parity proof: the reference's OWN example pipelines parse with our
config model, and the runnable ones run end-to-end on our engine
against the reference's bundled CSVs (mirrors the reference's
"every file in examples/ must parse" test,
aqueducts/schemas/tests/integration.rs:91-131).

The reference tree is read-only input; these tests skip if it is not
mounted.
"""

from pathlib import Path

import pytest

from aqueducts_spark import load_pipeline, run_pipeline
from aqueducts_spark.config.templating import find_params

REF = Path("/root/reference")
EXAMPLES = sorted(REF.glob("examples/aqueduct_pipeline*.*")) if REF.exists() else []

pytestmark = pytest.mark.skipif(
    not EXAMPLES, reason="reference tree not available"
)


def _params(tmp_path) -> dict[str, str]:
    return {
        "local_path": str(REF),
        "output_path": str(tmp_path),
        # odbc example params (parse-only)
        "db_url": "jdbc:derby:memory:refex;create=true",
        "month": "jan",
    }


@pytest.mark.parametrize("path", EXAMPLES, ids=lambda p: p.name)
def test_reference_example_parses(path, tmp_path):
    text = path.read_text()
    params = {k: _params(tmp_path).get(k, "x") for k in find_params(text)}
    pipeline = load_pipeline(path, params)
    assert pipeline.stage_groups
    assert pipeline.parsed_sources


def _cleanup(spark, pipeline):
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


def _staged_copy(tmp_path) -> Path:
    """Runtime copy of the reference examples dir into a writable tmp
    (the examples use relative ./examples/ paths and write output into
    their own tree; /root/reference is read-only)."""
    import shutil

    dst = tmp_path / "examples"
    dst.mkdir()
    for f in (REF / "examples").iterdir():
        if f.is_file():
            shutil.copy(f, dst / f.name)
    return tmp_path


def test_reference_example_yaml_runs(spark, tmp_path):
    """aqueduct_pipeline_example.yml end-to-end: 2 CSV sources ->
    parallel aggregate stages -> join -> parquet destination, exactly
    as the reference ships it (local_path-parameterized)."""
    root = _staged_copy(tmp_path)
    path = root / "examples" / "aqueduct_pipeline_example.yml"
    text = path.read_text()
    params = {k: str(root) for k in find_params(text)}
    pipeline = load_pipeline(path, params)
    result = run_pipeline(spark, pipeline)
    assert result.result is not None
    rows = result.result.collect()
    assert len(rows) > 0
    cols = set(result.result.columns)
    assert {"date", "location_name"} <= cols or {"date", "location_id"} <= cols
    out = list(Path(root).rglob("output*/**/*.parquet")) + list(
        Path(root).rglob("output*.parquet")
    )
    assert out, "no parquet written by destination"
    _cleanup(spark, pipeline)


def test_reference_simple_example_runs(spark, tmp_path, monkeypatch):
    """aqueduct_pipeline_simple.yml uses relative ./examples/ paths:
    run from the staged copy's root, exactly like `aqueducts run` from
    the reference repo root."""
    root = _staged_copy(tmp_path)
    monkeypatch.chdir(root)
    path = root / "examples" / "aqueduct_pipeline_simple.yml"
    params = {"month": "jan", "year": "2024"}
    pipeline = load_pipeline(path, params)
    result = run_pipeline(spark, pipeline)
    assert result.result is not None and result.result.count() > 0
    assert (root / "examples").glob("output_jan_2024.parquet")
    _cleanup(spark, pipeline)
