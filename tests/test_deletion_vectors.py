"""Deletion-vector READ support (delta/deletion_vectors.py + the
protocol reader's _apply_deletion_vectors).

Fixtures are hand-authored per the public Delta PROTOCOL.md ("Deletion
Vectors"): parquet files + a v3-reader commit whose add actions carry
DV descriptors, with the .bin sidecar written in the documented layout
(format-version byte, big-endian size + CRC-32 framing, portable
RoaringBitmapArray payload).  The container has no delta-rs/delta-spark
to cross-write, so structural assertions (magic, CRC, cardinality,
z85) pin the format and the encoder exists only for fixtures.
"""

from __future__ import annotations

import json
import struct
import zlib
from pathlib import Path
from uuid import UUID

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from aqueducts_spark.delta.deletion_vectors import (
    DeletionVectorError,
    decode_dv_bytes,
    dv_relative_path,
    encode_dv_bytes,
    read_dv_descriptor,
    z85_decode,
    z85_encode,
)
from aqueducts_spark.delta.protocol import DeltaProtocolError, DeltaProtocolTable


# ---------------------------------------------------------------------------
# unit: codecs
# ---------------------------------------------------------------------------


def test_z85_roundtrip():
    data = bytes(range(16))
    enc = z85_encode(data)
    assert len(enc) == 20
    assert z85_decode(enc) == data
    with pytest.raises(DeletionVectorError):
        z85_decode("abc")  # not a multiple of 5
    with pytest.raises(DeletionVectorError):
        z85_decode("~~~~~")  # invalid alphabet


def test_roaring_array_roundtrip():
    rows = [0, 1, 5, 65535, 65536, 100000, (1 << 32) + 7, (2 << 32) + 1]
    data = encode_dv_bytes(rows)
    assert decode_dv_bytes(data) == sorted(rows)
    assert decode_dv_bytes(encode_dv_bytes([])) == []


def test_roaring_bitmap_container_roundtrip():
    # >4096 values in one 2^16 chunk forces the 8KB bitset container
    rows = list(range(0, 10000, 2))
    assert decode_dv_bytes(encode_dv_bytes(rows)) == rows


def test_roaring_run_container_decodes():
    # hand-craft a cookie-12347 bitmap with one run container [10, 14]
    bm = struct.pack("<i", 12347)  # cookie, containerCount-1 = 0 in high
    bm += bytes([0b1])  # run flag for container 0
    bm += struct.pack("<HH", 0, 4)  # key 0, cardinality-1 = 4
    # containerCount < 4 with run cookie -> no offset header
    bm += struct.pack("<H", 1)  # one run
    bm += struct.pack("<HH", 10, 4)  # start 10, length-1 = 4
    payload = struct.pack("<iq", 1681511377, 1) + bm
    assert decode_dv_bytes(payload) == [10, 11, 12, 13, 14]


def test_bad_magic_rejected():
    with pytest.raises(DeletionVectorError, match="magic"):
        decode_dv_bytes(struct.pack("<iq", 99, 0))


def test_dv_relative_path():
    u = UUID("00112233-4455-6677-8899-aabbccddeeff")
    enc = z85_encode(u.bytes)
    assert dv_relative_path(enc) == f"deletion_vector_{u}.bin"
    assert dv_relative_path("ab" + enc) == f"ab/deletion_vector_{u}.bin"


# ---------------------------------------------------------------------------
# fixture authoring helpers
# ---------------------------------------------------------------------------


def _dv_file_bytes(rows: list[int]) -> tuple[bytes, int, int]:
    """On-disk DV file: version byte, then <size BE><data><crc BE>.
    Returns (file bytes, offset of the size field, data size)."""
    data = encode_dv_bytes(rows)
    blob = (
        bytes([1])
        + struct.pack(">i", len(data))
        + data
        + struct.pack(">I", zlib.crc32(data) & 0xFFFFFFFF)
    )
    return blob, 1, len(data)


def _schema_string() -> str:
    return json.dumps(
        {
            "type": "struct",
            "fields": [
                {"name": "id", "type": "long", "nullable": True, "metadata": {}},
                {"name": "v", "type": "double", "nullable": True, "metadata": {}},
            ],
        }
    )


def _write_dv_table(root: Path, inline: bool = False) -> None:
    """Two files x 5 rows; file A deletes row positions 1 and 3."""
    root.mkdir(parents=True)
    (root / "_delta_log").mkdir()
    for fname, base in (("a.parquet", 0), ("b.parquet", 100)):
        pq.write_table(
            pa.table(
                {
                    "id": pa.array([base + i for i in range(5)], pa.int64()),
                    "v": pa.array([float(base + i) for i in range(5)]),
                }
            ),
            root / fname,
        )
    deleted = [1, 3]
    if inline:
        data = encode_dv_bytes(deleted)
        pad = (-len(data)) % 4
        dv_desc = {
            "storageType": "i",
            "pathOrInlineDv": z85_encode(data + b"\x00" * pad),
            "sizeInBytes": len(data),
            "cardinality": len(deleted),
        }
    else:
        u = UUID("00112233-4455-6677-8899-aabbccddeeff")
        blob, offset, size = _dv_file_bytes(deleted)
        (root / f"deletion_vector_{u}.bin").write_bytes(blob)
        dv_desc = {
            "storageType": "u",
            "pathOrInlineDv": z85_encode(u.bytes),
            "offset": offset,
            "sizeInBytes": size,
            "cardinality": len(deleted),
        }
    actions = [
        {
            "protocol": {
                "minReaderVersion": 3,
                "minWriterVersion": 7,
                "readerFeatures": ["deletionVectors"],
                "writerFeatures": ["deletionVectors"],
            }
        },
        {
            "metaData": {
                "id": "dv-test-table",
                "format": {"provider": "parquet", "options": {}},
                "schemaString": _schema_string(),
                "partitionColumns": [],
                "configuration": {},
            }
        },
        {
            "add": {
                "path": "a.parquet",
                "partitionValues": {},
                "size": 1,
                "modificationTime": 1700000000000,
                "dataChange": True,
                "deletionVector": dv_desc,
            }
        },
        {
            "add": {
                "path": "b.parquet",
                "partitionValues": {},
                "size": 1,
                "modificationTime": 1700000000000,
                "dataChange": True,
            }
        },
    ]
    (root / "_delta_log" / f"{0:020d}.json").write_text(
        "\n".join(json.dumps(a) for a in actions)
    )


# ---------------------------------------------------------------------------
# integration: protocol reader
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("inline", [False, True])
def test_read_filters_deleted_rows(spark, tmp_path, inline):
    root = tmp_path / "tbl"
    _write_dv_table(root, inline=inline)
    t = DeltaProtocolTable(spark, str(root))
    got = sorted(r.id for r in t.read().collect())
    # file a: rows 0..4 at positions 0..4; positions 1 and 3 deleted
    assert got == [0, 2, 4, 100, 101, 102, 103, 104]


def test_read_dv_table_no_longer_refused(spark, tmp_path):
    # the r7 behavior was a loud refusal of readerFeatures
    # [deletionVectors]; the flip to supported must keep OTHER unknown
    # features refused
    root = tmp_path / "tbl"
    _write_dv_table(root)
    log = root / "_delta_log" / f"{0:020d}.json"
    actions = [json.loads(l) for l in log.read_text().splitlines()]
    actions[0]["protocol"]["readerFeatures"] = [
        "deletionVectors",
        "someFutureFeature",
    ]
    log.write_text("\n".join(json.dumps(a) for a in actions))
    with pytest.raises(DeltaProtocolError, match="someFutureFeature"):
        DeltaProtocolTable(spark, str(root)).read().collect()


def test_writes_to_dv_table_stay_refused(spark, tmp_path):
    root = tmp_path / "tbl"
    _write_dv_table(root)
    t = DeltaProtocolTable(spark, str(root))
    df = spark.createDataFrame([(7, 7.0)], "id bigint, v double")
    with pytest.raises(DeltaProtocolError, match="deletionVectors"):
        t.append(df)


def test_corrupt_dv_checksum_fails_loudly(spark, tmp_path):
    root = tmp_path / "tbl"
    _write_dv_table(root)
    u = UUID("00112233-4455-6677-8899-aabbccddeeff")
    binf = root / f"deletion_vector_{u}.bin"
    raw = bytearray(binf.read_bytes())
    raw[-1] ^= 0xFF  # flip a checksum byte
    binf.write_bytes(bytes(raw))
    with pytest.raises(Exception, match="checksum"):
        DeltaProtocolTable(spark, str(root)).read().collect()


def test_cardinality_mismatch_fails(tmp_path):
    data = encode_dv_bytes([1, 2, 3])
    pad = (-len(data)) % 4
    with pytest.raises(DeletionVectorError, match="cardinality"):
        read_dv_descriptor(
            None,
            {
                "storageType": "i",
                "pathOrInlineDv": z85_encode(data + b"\x00" * pad),
                "sizeInBytes": len(data),
                "cardinality": 99,
            },
        )


def test_change_feed_refuses_dv_commits(spark, tmp_path):
    root = tmp_path / "tbl"
    _write_dv_table(root)
    t = DeltaProtocolTable(spark, str(root))
    with pytest.raises(DeltaProtocolError, match="deletion"):
        t.change_feed(-1)


def test_time_travel_sees_dv_state(spark, tmp_path):
    # a later commit replacing the DV'd file must replay correctly
    root = tmp_path / "tbl"
    _write_dv_table(root)
    new = pa.table(
        {"id": pa.array([7], pa.int64()), "v": pa.array([7.0])}
    )
    pq.write_table(new, root / "c.parquet")
    actions = [
        {
            "remove": {
                "path": "a.parquet",
                "dataChange": True,
                "deletionTimestamp": 1700000001000,
                "deletionVector": {
                    "storageType": "u",
                    "pathOrInlineDv": z85_encode(
                        UUID("00112233-4455-6677-8899-aabbccddeeff").bytes
                    ),
                    "offset": 1,
                    "sizeInBytes": 1,
                    "cardinality": 2,
                },
            }
        },
        {
            "add": {
                "path": "c.parquet",
                "partitionValues": {},
                "size": 1,
                "modificationTime": 1700000001000,
                "dataChange": True,
            }
        },
    ]
    (root / "_delta_log" / f"{1:020d}.json").write_text(
        "\n".join(json.dumps(a) for a in actions)
    )
    t = DeltaProtocolTable(spark, str(root))
    assert sorted(r.id for r in t.read().collect()) == [
        7, 100, 101, 102, 103, 104,
    ]
    assert sorted(r.id for r in t.read(version=0).collect()) == [
        0, 2, 4, 100, 101, 102, 103, 104,
    ]


def test_explicit_offset_zero_rejected(tmp_path):
    # `offset or 1` would silently rewrite an explicit (invalid) 0 to 1
    # and decode from the wrong position; it must fail loudly instead
    blob, _, size = _dv_file_bytes([1, 3])
    p = tmp_path / "dv.bin"
    p.write_bytes(blob)
    with pytest.raises(DeletionVectorError, match="offset 0"):
        read_dv_descriptor(
            None,
            {
                "storageType": "p",
                "pathOrInlineDv": str(p),
                "offset": 0,
                "sizeInBytes": size,
                "cardinality": 2,
            },
        )


def test_byte_exact_dv_fixture_independent_of_encoder(tmp_path):
    """Byte-literal DV hand-packed from the spec TEXT (PROTOCOL.md
    "Deletion Vector Format" + the roaring RoaringFormatSpec), NOT via
    encode_dv_bytes — and deliberately using forms the encoder never
    emits (the 12347 run-container cookie, a run container, a 64-bit
    value in the second bitmap), so a shared encoder/decoder
    misreading of the spec cannot self-validate here.  No real engine
    (delta-spark/delta-rs) exists in this container to capture a
    cross-written fixture from; this is the strongest independent pin
    available (see tests/data/delta_golden/PROVENANCE.md)."""
    # --- bitmap 0: cookie 12347, 2 containers, run flags byte 0b10 ---
    bm0 = struct.pack("<i", 12347 | ((2 - 1) << 16))
    bm0 += bytes([0b10])  # container 1 is a run container
    bm0 += struct.pack("<HH", 0, 2 - 1)  # key 0, array card 2
    bm0 += struct.pack("<HH", 1, 3 - 1)  # key 1, run card 3
    # containerCount (2) < 4 with the run cookie -> no offset header
    bm0 += struct.pack("<HH", 3, 7)  # array container: values 3, 7
    bm0 += struct.pack("<H", 1)  # run container: one run
    bm0 += struct.pack("<HH", 0, 3 - 1)  # [65536 .. 65538] within key 1
    # --- bitmap 1: cookie 12346 (offset header ALWAYS present) -------
    bm1 = struct.pack("<ii", 12346, 1)
    bm1 += struct.pack("<HH", 0, 1 - 1)  # key 0, card 1
    bm1 += struct.pack("<i", 16)  # container start offset
    bm1 += struct.pack("<H", 5)  # value 5
    payload = struct.pack("<iq", 1681511377, 2) + bm0 + bm1
    expected = [3, 7, 65536, 65537, 65538, (1 << 32) + 5]
    assert decode_dv_bytes(payload) == expected
    # full on-disk framing: version byte, BE size, payload, BE CRC-32
    blob = (
        bytes([1])
        + struct.pack(">i", len(payload))
        + payload
        + struct.pack(">I", zlib.crc32(payload) & 0xFFFFFFFF)
    )
    p = tmp_path / "dv.bin"
    p.write_bytes(blob)
    got = read_dv_descriptor(
        None,
        {
            "storageType": "p",
            "pathOrInlineDv": str(p),
            "offset": 1,
            "sizeInBytes": len(payload),
            "cardinality": len(expected),
        },
    )
    assert got == expected


def _write_partitioned_dv_table(root: Path) -> None:
    """One partition whose VALUE contains a space: the data directory
    is `p=a b/` (hive escaping keeps spaces literal) while add.path is
    percent-encoded `p=a%20b/...` per PROTOCOL.md — and the parquet
    scan's _metadata.file_path re-encodes the space as %20, which is
    exactly the spelling mismatch that silently resurrected deleted
    rows before r9."""
    root.mkdir(parents=True)
    (root / "_delta_log").mkdir()
    part_dir = root / "p=a b"
    part_dir.mkdir()
    pq.write_table(
        pa.table(
            {
                "id": pa.array(list(range(5)), pa.int64()),
                "v": pa.array([float(i) for i in range(5)]),
            }
        ),
        part_dir / "part.parquet",
    )
    data = encode_dv_bytes([1, 3])
    pad = (-len(data)) % 4
    schema = json.dumps(
        {
            "type": "struct",
            "fields": [
                {"name": "id", "type": "long", "nullable": True, "metadata": {}},
                {"name": "v", "type": "double", "nullable": True, "metadata": {}},
                {"name": "p", "type": "string", "nullable": True, "metadata": {}},
            ],
        }
    )
    actions = [
        {
            "protocol": {
                "minReaderVersion": 3,
                "minWriterVersion": 7,
                "readerFeatures": ["deletionVectors"],
                "writerFeatures": ["deletionVectors"],
            }
        },
        {
            "metaData": {
                "id": "dv-space-table",
                "format": {"provider": "parquet", "options": {}},
                "schemaString": schema,
                "partitionColumns": ["p"],
                "configuration": {},
            }
        },
        {
            "add": {
                "path": "p=a%20b/part.parquet",
                "partitionValues": {"p": "a b"},
                "size": 1,
                "modificationTime": 1700000000000,
                "dataChange": True,
                "deletionVector": {
                    "storageType": "i",
                    "pathOrInlineDv": z85_encode(data + b"\x00" * pad),
                    "sizeInBytes": len(data),
                    "cardinality": 2,
                },
            }
        },
    ]
    (root / "_delta_log" / f"{0:020d}.json").write_text(
        "\n".join(json.dumps(a) for a in actions)
    )


def test_dv_with_space_in_partition_value(spark, tmp_path):
    root = tmp_path / "tbl spaced"
    _write_partitioned_dv_table(root)
    t = DeltaProtocolTable(spark, str(root))
    rows = t.read().collect()
    assert sorted(r.id for r in rows) == [0, 2, 4]
    assert all(r.p == "a b" for r in rows)


def test_dv_read_through_symlinked_root(spark, tmp_path):
    # descriptor side used .resolve() while the scan side did not: a
    # symlinked table root made the join keys differ and every deleted
    # row came back.  Both sides must use the UNresolved spelling.
    real = tmp_path / "real_tbl"
    _write_dv_table(real)
    link = tmp_path / "link_tbl"
    link.symlink_to(real, target_is_directory=True)
    t = DeltaProtocolTable(spark, str(link))
    assert sorted(r.id for r in t.read().collect()) == [
        0, 2, 4, 100, 101, 102, 103, 104,
    ]
