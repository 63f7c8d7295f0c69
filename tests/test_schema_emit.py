"""The emitted pipeline JSON schema (``aqueducts-spark schema``) must be
a valid JSON Schema and accept every example document in examples/ —
the Spark counterpart of the reference's published
json_schema/aqueducts.schema.json (reference docs/content/pipelines.md
wires it into editors via the yaml-language-server header)."""

from __future__ import annotations

import json
from pathlib import Path

import jsonschema
import pytest
import yaml

from aqueducts_spark.cli import main
from aqueducts_spark.config.model import pipeline_json_schema
from aqueducts_spark.config.templating import find_params, substitute_params

EXAMPLES = sorted(Path(__file__).parent.parent.glob("examples/*.yml"))

PARAMS = {
    "data_dir": "/root/testdata/sf0.001",
    "out_dir": "/tmp/aq_examples",
    "min_quality": "0.5",
}


def test_schema_shape():
    schema = pipeline_json_schema()
    jsonschema.Draft202012Validator.check_schema(schema)
    assert schema["required"] == ["sources", "stages"]
    defs = schema["$defs"]
    for name in [
        "FileSource", "DirSource", "OdbcSource", "DeltaSource",
        "InMemorySource", "Stage", "FileDestination", "DeltaDestination",
        "OdbcDestination", "InMemoryDestination", "IvfIndexDestination",
    ]:
        assert name in defs, name


@pytest.mark.parametrize("path", EXAMPLES, ids=lambda p: p.name)
def test_schema_accepts_examples(path):
    text = path.read_text()
    params = {k: PARAMS.get(k, "x") for k in find_params(text)}
    doc = yaml.safe_load(substitute_params(text, params))
    jsonschema.validate(doc, pipeline_json_schema())


def test_schema_rejects_bad_docs():
    schema = pipeline_json_schema()
    # unknown source type
    bad = {
        "sources": [{"type": "bogus", "name": "x"}],
        "stages": [[{"name": "s", "query": "SELECT 1"}]],
    }
    with pytest.raises(jsonschema.ValidationError):
        jsonschema.validate(bad, schema)
    # missing stages entirely
    with pytest.raises(jsonschema.ValidationError):
        jsonschema.validate({"sources": []}, schema)


def test_cli_schema_stdout_and_file(tmp_path, capsys):
    rc = main(["schema"])
    out = capsys.readouterr().out
    assert rc == 0
    parsed = json.loads(out)
    assert parsed["title"] == "AqueductsSparkPipeline"

    target = tmp_path / "schema.json"
    rc = main(["schema", "-o", str(target)])
    assert rc == 0
    assert json.loads(target.read_text())["required"] == ["sources", "stages"]
