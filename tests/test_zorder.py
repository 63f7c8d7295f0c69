"""Z-order clustering (operators/zorder.py + zorder_by destinations)."""

import glob

import pyarrow.parquet as pq
import pytest
from pyspark.sql import functions as F

from aqueducts_spark.operators.zorder import (
    column_minmax,
    with_zorder_key,
    zorder_key,
)


def _interleave(buckets, bits):
    z = 0
    n = len(buckets)
    for i, b in enumerate(buckets):
        for j in range(bits):
            z |= ((b >> j) & 1) << (j * n + i)
    return z


@pytest.fixture(scope="module")
def grid(spark):
    rows = [(x, y) for x in range(16) for y in range(16)]
    return spark.createDataFrame(rows, "x long, y long")


def test_key_matches_reference_interleave(spark, grid):
    # 0..15 with bits=4 quantizes to identity, so the key must equal a
    # hand-rolled Morton interleave
    out = with_zorder_key(grid, ["x", "y"], bits=4, key_col="z").collect()
    for r in out:
        assert r["z"] == _interleave([r["x"], r["y"]], 4), (r["x"], r["y"])


def test_locality(spark, grid):
    # quadrants of the grid must map to disjoint key ranges: every key
    # in the low quadrant sorts before any key in the high quadrant
    out = with_zorder_key(grid, ["x", "y"], bits=4, key_col="z")
    low = out.where("x < 8 AND y < 8").agg(F.max("z")).collect()[0][0]
    high = out.where("x >= 8 AND y >= 8").agg(F.min("z")).collect()[0][0]
    assert low < high


def test_null_and_validation(spark, grid):
    mm = column_minmax(grid, ["x", "y"])
    with pytest.raises(ValueError):
        zorder_key(mm, ["x"], bits=4)  # < 2 cols
    with pytest.raises(ValueError):
        zorder_key(mm, ["x", "y"], bits=40)  # > 62 total bits via cap
    nulls = spark.createDataFrame([(None,), (None,)], "x long")
    with pytest.raises(ValueError):
        column_minmax(nulls, ["x"])


def test_zorder_destination_tightens_both_dims(spark, tmp_path):
    """zorder_by files must be tight in BOTH columns; a linear
    cluster_by on the first column cannot bound the second."""
    from aqueducts_spark import CollectingTracker, load_pipeline_str, run_pipeline

    yml = f"""
sources:
  - type: file
    name: zo_orders
    format: {{ type: parquet }}
    location: /root/testdata/sf0.001/orders.parquet
stages:
  - - name: zo_all
      query: SELECT * FROM zo_orders
destination:
  type: file
  name: zo_out
  format: {{ type: parquet }}
  single_file: false
  zorder_by: [o_custkey, o_orderkey]
  cluster_files: 4
  location: {tmp_path}/zordered
"""
    run_pipeline(spark, load_pipeline_str(yml, "yaml"), CollectingTracker())
    files = sorted(glob.glob(f"{tmp_path}/zordered/*.parquet"))
    assert len(files) >= 3, files

    def spans(col):
        glb_min, glb_max, out = None, None, []
        for f in files:
            md = pq.ParquetFile(f).metadata
            names = [md.schema.column(i).name for i in range(md.num_columns)]
            idx = names.index(col)
            mins, maxs = [], []
            for rg in range(md.num_row_groups):
                st = md.row_group(rg).column(idx).statistics
                mins.append(st.min)
                maxs.append(st.max)
            out.append((min(mins), max(maxs)))
            glb_min = min(mins) if glb_min is None else min(glb_min, *mins)
            glb_max = max(maxs) if glb_max is None else max(glb_max, *maxs)
        return out, glb_max - glb_min
    # z-key column must not leak into the written schema
    md0 = pq.ParquetFile(files[0]).metadata
    names = [md0.schema.column(i).name for i in range(md0.num_columns)]
    assert not any(n.startswith("__aqueducts") for n in names)
    # with 4 z-range files, the average per-file span in EACH dimension
    # must be well under the global span (a 1-D sort leaves the second
    # dimension's per-file span ~= the full global span)
    for col in ("o_custkey", "o_orderkey"):
        per_file, glb = spans(col)
        avg = sum(mx - mn for mn, mx in per_file) / len(per_file)
        assert avg < 0.8 * glb, (col, per_file, glb)


def test_zorder_config_validation():
    from aqueducts_spark.config.model import FileDestination

    with pytest.raises(Exception):
        FileDestination(
            name="d", location="/tmp/x", format={"type": "parquet"},
            zorder_by=["a"], single_file=False,
        )
    with pytest.raises(Exception):
        FileDestination(
            name="d", location="/tmp/x", format={"type": "parquet"},
            zorder_by=["a", "b"],  # single_file default True
        )
    with pytest.raises(Exception):
        FileDestination(
            name="d", location="/tmp/x", format={"type": "parquet"},
            zorder_by=["a", "b"], cluster_by=["a"], single_file=False,
        )


def test_zorder_stale_minmax_out_of_range_values_clamp(spark):
    """With caller-supplied (stale) min/max, out-of-range values must
    clamp to the edge buckets — the old post-multiply clamp overflowed
    int64 first (ANSI abort / legacy wrap)."""
    from pyspark.sql import functions as F

    from aqueducts_spark.operators.zorder import zorder_key

    df = spark.createDataFrame(
        [(0, 0), (1000, 0), (10**15, 0), (-(10**15), 0)], "a long, b long"
    )
    mm = {"a": (0, 1000), "b": (0, 1000)}
    keyed = df.select("a", zorder_key(mm, ["a", "b"], bits=16)).collect()
    by_a = {r.a: r.zorder_key for r in keyed}
    assert by_a[10**15] == by_a[1000]  # clamped to the top bucket
    assert by_a[-(10**15)] == by_a[0]  # clamped to the bottom bucket


def test_zorder_handles_hyphenated_and_dotted_names(spark):
    from aqueducts_spark.operators.zorder import with_zorder_key

    df = spark.createDataFrame(
        [(1, 2), (3, 4)], ["event-time", "a.b"]
    )
    out = with_zorder_key(df, ["event-time", "a.b"])
    assert out.count() == 2 and "zorder_key" in out.columns
