"""Delta source in YAML pipelines, including version time travel (A7)."""

from aqueducts_spark import load_pipeline_str, run_pipeline
from aqueducts_spark.delta.table import VersionedParquetTable


def test_delta_source_with_version_pin(spark, tmp_path):
    loc = tmp_path / "dt"
    t = VersionedParquetTable(spark, str(loc))
    t.create_if_absent([], [], {}, {})
    t.append(spark.createDataFrame([(1, "a")], ["id", "v"]))   # version 1
    t.append(spark.createDataFrame([(2, "b")], ["id", "v"]))   # version 2

    yml_latest = f"""
sources:
  - type: delta
    name: dsrc_latest
    location: {loc}
stages:
  - name: dcount_latest
    query: SELECT count(*) AS n FROM dsrc_latest
"""
    assert run_pipeline(spark, load_pipeline_str(yml_latest)).result.collect()[0].n == 2

    yml_pinned = f"""
sources:
  - type: delta
    name: dsrc_v1
    location: {loc}
    version: 1
stages:
  - name: dcount_v1
    query: SELECT count(*) AS n FROM dsrc_v1
"""
    assert run_pipeline(spark, load_pipeline_str(yml_pinned)).result.collect()[0].n == 1
    for v in ("dcount_latest", "dsrc_latest", "dcount_v1", "dsrc_v1"):
        spark.catalog.dropTempView(v)
