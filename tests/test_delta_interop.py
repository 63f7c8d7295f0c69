"""Delta interop evidence (VERDICT r2 "What's missing" #1).

The build environment has no external Delta engine, so interop is
pinned three ways (see tests/data/delta_golden/PROVENANCE.md):

1. a clean-room second reader (tests/_delta_reader.py — public
   PROTOCOL.md re-implemented on stdlib+pyarrow, zero aqueducts
   imports) must agree with the product reader on everything the
   product writer produces;
2. a committed golden fixture pins the writer's on-disk dialect;
3. real third-party round-trips auto-run when delta-rs (``deltalake``)
   or delta-spark IS installed, and skip loudly here.
"""

from __future__ import annotations

import importlib.util
import json
from pathlib import Path

import pytest

from aqueducts_spark.delta.protocol import DeltaProtocolTable
from aqueducts_spark.types import Field

from _delta_reader import read_delta_table

GOLDEN = Path(__file__).parent / "data" / "delta_golden"

FIELDS = [
    Field(name="id", data_type="int64", nullable=False),
    Field(name="name", data_type="string", nullable=True),
    Field(name="score", data_type="float64", nullable=True),
]


def _product_rows(df):
    return sorted(tuple(r) for r in df.collect())


def _independent_rows(root, version=None):
    columns, rows = read_delta_table(root, version)
    names = [n for n, _ in columns]
    return sorted(tuple(r[n] for n in names) for r in rows)


def _df(spark, rows):
    return spark.createDataFrame(rows, "id long, name string, score double")


# ---------------------------------------------------------------------------
# clean-room reader vs product writer
# ---------------------------------------------------------------------------


def test_independent_reader_agrees_after_append_upsert_replace(spark, tmp_path):
    root = tmp_path / "t1"
    t = DeltaProtocolTable(spark, str(root))
    t.create_if_absent(FIELDS, [], {}, {})
    t.append(_df(spark, [(1, "a", 1.0), (2, "b", 2.0)]))
    t.append(_df(spark, [(3, "c", None)]))
    t.upsert(_df(spark, [(2, "B", 20.0), (4, "d", 4.0)]), keys=["id"])
    t.replace(_df(spark, [(9, "z", 9.0)]), conditions=[("name", "a")])

    expected = [(2, "B", 20.0), (3, "c", None), (4, "d", 4.0), (9, "z", 9.0)]
    assert _product_rows(t.read()) == expected
    assert _independent_rows(root) == expected


def test_independent_reader_partitioned_table(spark, tmp_path):
    root = tmp_path / "t2"
    fields = FIELDS + [Field(name="part", data_type="string", nullable=True)]
    t = DeltaProtocolTable(spark, str(root))
    t.create_if_absent(fields, ["part"], {}, {})
    df = spark.createDataFrame(
        [(1, "a", 1.0, "x"), (2, "b", 2.0, "y"), (3, "c", 3.0, "x")],
        "id long, name string, score double, part string",
    )
    t.append(df)
    expected = [(1, "a", 1.0, "x"), (2, "b", 2.0, "y"), (3, "c", 3.0, "x")]
    # product reader returns columns in declared order too
    got_product = sorted(
        tuple(r) for r in t.read().select("id", "name", "score", "part").collect()
    )
    assert got_product == sorted(expected)
    # clean-room reader must refill partition columns from
    # partitionValues (data files omit them under hive layout)
    assert _independent_rows(root) == sorted(expected)


def test_independent_reader_replays_from_checkpoint_alone(spark, tmp_path):
    root = tmp_path / "t3"
    t = DeltaProtocolTable(spark, str(root))
    t.create_if_absent(FIELDS, [], {}, {})
    for i in range(11):  # versions 1..11 -> checkpoint at 10
        t.append(_df(spark, [(i, f"n{i}", float(i))]).coalesce(1))
    log = root / "_delta_log"
    assert (log / f"{10:020d}.checkpoint.parquet").is_file()
    # drop every pre-checkpoint commit: replay must come from the
    # checkpoint + trailing JSON only
    for v in range(10):
        (log / f"{v:020d}.json").unlink()
    expected = sorted((i, f"n{i}", float(i)) for i in range(11))
    assert _independent_rows(root) == expected
    t2 = DeltaProtocolTable(spark, str(root))
    assert _product_rows(t2.read()) == expected


def test_independent_reader_time_travel_matches_product(spark, tmp_path):
    root = tmp_path / "t4"
    t = DeltaProtocolTable(spark, str(root))
    t.create_if_absent(FIELDS, [], {}, {})
    t.append(_df(spark, [(1, "a", 1.0)]))
    t.append(_df(spark, [(2, "b", 2.0)]))
    t.upsert(_df(spark, [(1, "A", 10.0)]), keys=["id"])
    for v in (1, 2, 3):
        assert _independent_rows(root, version=v) == _product_rows(
            t.read(version=v)
        ), f"divergence at version {v}"


# ---------------------------------------------------------------------------
# committed golden fixture
# ---------------------------------------------------------------------------

GOLDEN_EXPECTED = [
    (1, "x", "alpha", 1.5),
    (2, "x", "BETA", 20.0),
    (3, "y", "gamma", None),
    (4, "y", "delta", 4.0),
    (5, "z", "epsilon", 5.0),
]


def test_golden_fixture_product_reader(spark):
    t = DeltaProtocolTable(spark, str(GOLDEN))
    got = sorted(
        tuple(r)
        for r in t.read().select("id", "category", "name", "score").collect()
    )
    assert got == GOLDEN_EXPECTED
    # time travel to v2 (before the upsert)
    v2 = sorted(
        tuple(r)
        for r in t.read(version=2).select("id", "category", "name", "score").collect()
    )
    assert v2 == [
        (1, "x", "alpha", 1.5),
        (2, "x", "beta", 2.5),
        (3, "y", "gamma", None),
        (4, "y", "delta", 4.0),
    ]


def test_golden_fixture_independent_reader():
    assert _independent_rows(GOLDEN) == GOLDEN_EXPECTED


def test_golden_log_format_stability():
    """The committed log bytes ARE the on-disk dialect contract: every
    action must keep the exact key set external engines expect."""
    log = GOLDEN / "_delta_log"
    v0 = [json.loads(l) for l in (log / f"{0:020d}.json").read_text().splitlines()]
    kinds = [next(iter(a)) for a in v0]
    assert kinds == ["commitInfo", "protocol", "metaData"]
    proto = next(a["protocol"] for a in v0 if "protocol" in a)
    assert proto == {"minReaderVersion": 1, "minWriterVersion": 2}
    meta = next(a["metaData"] for a in v0 if "metaData" in a)
    assert set(meta) >= {
        "id", "format", "schemaString", "partitionColumns",
        "configuration", "createdTime",
    }
    assert meta["format"] == {"provider": "parquet", "options": {}}
    assert meta["partitionColumns"] == ["category"]
    assert meta["configuration"] == {"golden": "v1"}
    schema = json.loads(meta["schemaString"])
    assert schema["type"] == "struct"
    assert [f["name"] for f in schema["fields"]] == [
        "id", "category", "name", "score",
    ]

    v1 = [json.loads(l) for l in (log / f"{1:020d}.json").read_text().splitlines()]
    adds = [a["add"] for a in v1 if "add" in a]
    assert adds, "append commit must carry add actions"
    for add in adds:
        assert set(add) >= {
            "path", "partitionValues", "size", "modificationTime",
            "dataChange", "stats",
        }
        assert add["dataChange"] is True
        assert add["path"].startswith("category=")
        assert set(add["partitionValues"]) == {"category"}
        stats = json.loads(add["stats"])
        assert {"numRecords", "minValues", "maxValues", "nullCount"} <= set(stats)

    v3 = [json.loads(l) for l in (log / f"{3:020d}.json").read_text().splitlines()]
    removes = [a["remove"] for a in v3 if "remove" in a]
    assert removes, "copy-on-write upsert must tombstone the old files"
    for rm in removes:
        assert {"path", "deletionTimestamp", "dataChange"} <= set(rm)


# ---------------------------------------------------------------------------
# true third-party round trip — runs wherever an external engine exists
# ---------------------------------------------------------------------------

HAVE_DELTALAKE = importlib.util.find_spec("deltalake") is not None


@pytest.mark.skipif(
    not HAVE_DELTALAKE,
    reason="deltalake (delta-rs) not installed; external round-trip "
    "runs on machines that have it — offline evidence is the "
    "clean-room reader + golden fixture above",
)
class TestRealDeltaRsRoundTrip:
    def test_delta_rs_reads_our_table(self, spark, tmp_path):
        from deltalake import DeltaTable  # type: ignore

        root = tmp_path / "ours"
        t = DeltaProtocolTable(spark, str(root))
        t.create_if_absent(FIELDS, [], {}, {})
        t.append(_df(spark, [(1, "a", 1.0), (2, "b", 2.0)]))
        t.upsert(_df(spark, [(2, "B", 20.0)]), keys=["id"])
        dt = DeltaTable(str(root))
        rows = sorted(
            (r["id"], r["name"], r["score"]) for r in dt.to_pyarrow_table().to_pylist()
        )
        assert rows == [(1, "a", 1.0), (2, "B", 20.0)]
        assert dt.version() == 2

    def test_we_read_delta_rs_table(self, spark, tmp_path):
        import pyarrow as pa
        from deltalake import write_deltalake  # type: ignore

        root = tmp_path / "theirs"
        data = pa.table({"id": [1, 2], "name": ["a", "b"], "score": [1.0, 2.0]})
        write_deltalake(str(root), data)
        write_deltalake(str(root), pa.table({"id": [3], "name": ["c"], "score": [3.0]}), mode="append")
        t = DeltaProtocolTable(spark, str(root))
        assert _product_rows(t.read().select("id", "name", "score")) == [
            (1, "a", 1.0), (2, "b", 2.0), (3, "c", 3.0),
        ]
        assert _product_rows(t.read(version=1).select("id", "name", "score"))[:2] == [
            (1, "a", 1.0), (2, "b", 2.0),
        ]


# ---------------------------------------------------------------------------
# feature-table golden fixture (protocol v7: CDF + checkConstraints)
# ---------------------------------------------------------------------------

GOLDEN_FEATURES = Path(__file__).parent / "data" / "delta_golden_features"

GOLDEN_FEATURES_EXPECTED = [
    (1, "alpha", 1.5),
    (2, "BETA", 20.0),
    (3, "gamma", 3.0),
]


def test_golden_features_product_reader_and_feed(spark):
    from aqueducts_spark.delta.protocol import DeltaProtocolError

    t = DeltaProtocolTable(spark, str(GOLDEN_FEATURES))
    got = sorted(
        tuple(r) for r in t.read().select("id", "name", "score").collect()
    )
    assert got == GOLDEN_FEATURES_EXPECTED
    feed = {
        (r.id, r.name, r._change_type, r._commit_version)
        for r in t.change_feed(0).collect()
    }
    assert (1, "alpha", "insert", 1) in feed and (2, "beta", "insert", 1) in feed
    assert (2, "beta", "delete", 2) in feed
    assert (2, "BETA", "insert", 2) in feed and (3, "gamma", "insert", 2) in feed
    # the frozen constraint still rejects violating writes
    with pytest.raises(DeltaProtocolError, match="nonneg"):
        t.append(_df(spark, [(9, "bad", -1.0)]))


def test_golden_features_independent_reader():
    # the clean-room reader ignores cdc actions for table state,
    # exactly like the spec's snapshot reconciliation
    assert _independent_rows(GOLDEN_FEATURES) == GOLDEN_FEATURES_EXPECTED


def test_golden_features_log_format_stability():
    log = GOLDEN_FEATURES / "_delta_log"
    v0 = [json.loads(l) for l in (log / f"{0:020d}.json").read_text().splitlines()]
    proto = next(a["protocol"] for a in v0 if "protocol" in a)
    assert proto["minReaderVersion"] == 1
    assert proto["minWriterVersion"] == 7
    assert set(proto["writerFeatures"]) == {"changeDataFeed", "checkConstraints"}
    meta = next(a["metaData"] for a in v0 if "metaData" in a)
    assert meta["configuration"] == {
        "delta.enableChangeDataFeed": "true",
        "delta.constraints.nonneg": "score >= 0",
    }
    v2 = [json.loads(l) for l in (log / f"{2:020d}.json").read_text().splitlines()]
    cdcs = [a["cdc"] for a in v2 if "cdc" in a]
    assert cdcs, "the MERGE commit must carry cdc actions"
    for c in cdcs:
        assert c["path"].startswith("_change_data/")
        assert c["dataChange"] is False and "stats" not in c
        assert (GOLDEN_FEATURES / c["path"]).is_file()
    kinds = [next(iter(a)) for a in v2]
    assert kinds[0] == "commitInfo"
    assert set(kinds) == {"commitInfo", "cdc", "remove", "add"}
