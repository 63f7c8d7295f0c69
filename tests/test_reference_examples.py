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


DELTA_FIXTURES = (
    sorted((REF / "aqueducts" / "delta" / "tests" / "data").glob("*.yml"))
    if REF.exists()
    else []
)


def _staged_delta_copy(tmp_path) -> Path:
    import shutil

    data = tmp_path / "tests" / "data"
    data.mkdir(parents=True)
    for f in (REF / "aqueducts" / "delta" / "tests" / "data").iterdir():
        shutil.copy(f, data / f.name)
    return tmp_path


def _run_delta_fixture(spark, root, name, date, run_id):
    path = root / "tests" / "data" / name
    pipeline = load_pipeline(
        path, {"local_path": str(root), "date": date, "run_id": run_id}
    )
    run_pipeline(spark, pipeline)
    _cleanup(spark, pipeline)
    return pipeline.parsed_destination.location


@pytest.mark.skipif(not DELTA_FIXTURES, reason="reference tree not available")
def test_reference_delta_fixtures_parse(tmp_path):
    root = _staged_delta_copy(tmp_path)
    for f in DELTA_FIXTURES:
        pipeline = load_pipeline(
            root / "tests" / "data" / f.name,
            {"local_path": str(root), "date": "2023-05-02", "run_id": "r1"},
        )
        assert pipeline.parsed_destination is not None


@pytest.mark.skipif(not DELTA_FIXTURES, reason="reference tree not available")
def test_reference_delta_upsert_fixture_runs_twice(spark, tmp_path):
    """The reference's own delta-upsert pipeline: running it twice with
    the same key columns must not duplicate rows (MERGE semantics)."""
    root = _staged_delta_copy(tmp_path)
    loc = _run_delta_fixture(
        spark, root, "aqueduct_pipeline_delta_upsert.yml", "2023-05-02", "u1"
    )
    from aqueducts_spark.delta.table import delta_layer

    t = delta_layer(spark).table(str(loc))
    n1 = t.read().count()
    _run_delta_fixture(
        spark, root, "aqueduct_pipeline_delta_upsert.yml", "2023-05-02", "u1"
    )
    n2 = t.read().count()
    assert n1 == n2 and n1 > 0  # same keys upserted, not appended


@pytest.mark.skipif(not DELTA_FIXTURES, reason="reference tree not available")
def test_reference_delta_append_fixture_accumulates(spark, tmp_path):
    root = _staged_delta_copy(tmp_path)
    loc = _run_delta_fixture(
        spark, root, "aqueduct_pipeline_delta_append.yml", "2023-05-02", "a1"
    )
    from aqueducts_spark.delta.table import delta_layer

    t = delta_layer(spark).table(str(loc))
    n1 = t.read().count()
    _run_delta_fixture(
        spark, root, "aqueduct_pipeline_delta_append.yml", "2023-05-02", "a1"
    )
    n2 = t.read().count()
    assert n2 == 2 * n1 and n1 > 0


@pytest.mark.skipif(not DELTA_FIXTURES, reason="reference tree not available")
def test_reference_delta_replace_fixture_is_idempotent(spark, tmp_path):
    """replace overwrites only the predicate-matched rows: running the
    same replace twice leaves the row count unchanged."""
    root = _staged_delta_copy(tmp_path)
    loc = _run_delta_fixture(
        spark, root, "aqueduct_pipeline_delta_replace.yml", "2023-05-02", "r1"
    )
    from aqueducts_spark.delta.table import delta_layer

    t = delta_layer(spark).table(str(loc))
    n1 = t.read().count()
    _run_delta_fixture(
        spark, root, "aqueduct_pipeline_delta_replace.yml", "2023-05-02", "r1"
    )
    n2 = t.read().count()
    assert n1 == n2 and n1 > 0
