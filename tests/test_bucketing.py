"""Bucketed destinations: co-located joins with no shuffle
(`bucket_by` on file destinations — the 100 TB path for repeated
equi-joins on the same key)."""

import textwrap

import pytest

from aqueducts_spark import CollectingTracker, load_pipeline_str, run_pipeline


def _bucketed_pipeline(name: str, src: str, out_dir: str, key: str) -> str:
    return textwrap.dedent(
        f"""
        sources:
          - type: file
            name: src_{name}
            format: {{ type: parquet }}
            location: {src}
        stages:
          - - name: stage_{name}
              query: SELECT * FROM src_{name}
        destination:
          type: file
          name: {name}
          format: {{ type: parquet }}
          single_file: false
          bucket_by: {{ columns: [{key}], buckets: 4, sort_by: [{key}] }}
          location: {out_dir}/{name}
        """
    )


@pytest.fixture()
def bucketed_tables(spark, tmp_path):
    for name, src, key in [
        ("b_orders", "/root/testdata/sf0.001/orders.parquet", "o_custkey"),
        ("b_customer", "/root/testdata/sf0.001/customer.parquet", "c_custkey"),
    ]:
        run_pipeline(
            spark,
            load_pipeline_str(
                _bucketed_pipeline(name, src, str(tmp_path), key), "yaml"
            ),
            CollectingTracker(),
        )
        for v in (f"src_{name}", f"stage_{name}"):
            try:
                spark.catalog.dropTempView(v)
            except Exception:
                pass
    yield
    for t in ("b_orders", "b_customer"):
        spark.sql(f"DROP TABLE IF EXISTS {t}")


def test_bucketed_join_has_no_shuffle(spark, bucketed_tables):
    """Both sides bucketed on the join key with the same bucket count:
    the sort-merge join plan must contain NO Exchange."""
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        df = spark.sql(
            """
            SELECT c.c_name, o.o_totalprice
            FROM b_customer c JOIN b_orders o ON c.c_custkey = o.o_custkey
            """
        )
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        assert "SortMergeJoin" in plan
        assert "Exchange" not in plan, plan
        assert df.count() > 0
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)


def test_bucketed_table_readable_and_bucketed(spark, bucketed_tables):
    info = spark.sql("DESCRIBE EXTENDED b_orders").collect()
    text = "\n".join(f"{r.col_name} {r.data_type}" for r in info)
    assert "o_custkey" in text
    assert spark.table("b_orders").count() > 0


def test_bucket_by_requires_multi_file():
    import pydantic
    import pytest as _pytest

    from aqueducts_spark.config.model import FileDestination

    with _pytest.raises(pydantic.ValidationError, match="single_file"):
        FileDestination.model_validate(
            {
                "type": "file",
                "name": "x",
                "location": "/tmp/x",
                "format": {"type": "parquet"},
                "bucket_by": {"columns": ["a"], "buckets": 4},
            }
        )


def test_cluster_by_writes_disjoint_file_ranges(spark, tmp_path):
    """cluster_by range-partitions + sorts before writing: each parquet
    file covers a tight, (mostly) disjoint min/max range of the cluster
    key, so predicate scans prune whole files."""
    import glob

    import pyarrow.parquet as pq

    from aqueducts_spark import CollectingTracker, load_pipeline_str, run_pipeline

    yml = f"""
sources:
  - type: file
    name: cb_orders
    format: {{ type: parquet }}
    location: /root/testdata/sf0.001/orders.parquet
stages:
  - - name: cb_all
      query: SELECT * FROM cb_orders
destination:
  type: file
  name: cb_out
  format: {{ type: parquet }}
  single_file: false
  cluster_by: [o_orderdate]
  cluster_files: 4
  location: {tmp_path}/clustered
"""
    run_pipeline(spark, load_pipeline_str(yml, "yaml"), CollectingTracker())
    files = sorted(glob.glob(f"{tmp_path}/clustered/*.parquet"))
    assert len(files) >= 2, "need multiple files to demonstrate clustering"
    ranges = []
    for f in files:
        md = pq.ParquetFile(f).metadata
        idx = [md.schema.column(i).name for i in range(md.num_columns)].index(
            "o_orderdate"
        )
        mins, maxs = [], []
        for rg in range(md.num_row_groups):
            st = md.row_group(rg).column(idx).statistics
            mins.append(st.min)
            maxs.append(st.max)
        ranges.append((min(mins), max(maxs)))
    ranges.sort()
    overlaps = sum(
        1 for (a, b) in zip(ranges, ranges[1:]) if a[1] > b[0]
    )
    assert overlaps == 0, f"file date ranges overlap: {ranges}"
    for v in ("cb_orders", "cb_all"):
        try:
            spark.catalog.dropTempView(v)
        except Exception:
            pass


def test_cluster_by_exclusive_with_bucket_by():
    import pydantic
    import pytest as _pytest

    from aqueducts_spark.config.model import FileDestination

    with _pytest.raises(pydantic.ValidationError, match="mutually exclusive"):
        FileDestination.model_validate(
            {
                "type": "file",
                "name": "x",
                "location": "/tmp/x",
                "format": {"type": "parquet"},
                "single_file": False,
                "cluster_by": ["a"],
                "bucket_by": {"columns": ["a"], "buckets": 4},
            }
        )
