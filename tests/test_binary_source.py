"""binaryFile ingestion: whole media files as binary rows — the
multimodal entry point (Spark's built-in binaryFile source wired as the
'binary' file format)."""

import pytest

from aqueducts_spark.config.model import parse_source
from aqueducts_spark.sources.register import register_source


def _write_media(root):
    (root / "a.img").write_bytes(b"\x89IMG" + bytes(range(64)))
    (root / "b.img").write_bytes(b"\x89IMG" + bytes(200 for _ in range(2048)))
    (root / "notes.txt").write_text("not media")
    return root


def test_binary_file_source_reads_whole_files(spark, tmp_path):
    _write_media(tmp_path)
    src = parse_source(
        {
            "type": "file",
            "name": "media",
            "format": {"type": "binary", "options": {"path_glob_filter": "*.img"}},
            "location": str(tmp_path),
        }
    )
    df = register_source(spark, src)
    assert {"path", "modificationTime", "length", "content"} <= set(df.columns)
    rows = {r.path.rsplit("/", 1)[-1]: r for r in df.collect()}
    assert set(rows) == {"a.img", "b.img"}  # glob excluded notes.txt
    assert bytes(rows["a.img"].content) == b"\x89IMG" + bytes(range(64))
    assert rows["b.img"].length == 4 + 2048


def test_binary_source_max_bytes_filters_on_metadata(spark, tmp_path):
    _write_media(tmp_path)
    src = parse_source(
        {
            "type": "file",
            "name": "media_small",
            "format": {
                "type": "binary",
                "options": {"path_glob_filter": "*.img", "max_bytes": 100},
            },
            "location": str(tmp_path),
        }
    )
    df = register_source(spark, src)
    names = [r.path.rsplit("/", 1)[-1] for r in df.collect()]
    assert names == ["a.img"]


def test_binary_directory_source_hive_partitions(spark, tmp_path):
    for part in ("cam=front", "cam=rear"):
        d = tmp_path / part
        d.mkdir()
        (d / "x.img").write_bytes(b"DATA" + part.encode())
    src = parse_source(
        {
            "type": "directory",
            "name": "media_dir",
            "format": {"type": "binary"},
            "location": str(tmp_path),
            "partition_columns": [["cam", "string"]],
        }
    )
    df = register_source(spark, src)
    got = {(r.cam, bytes(r.content)) for r in df.collect()}
    assert got == {
        ("front", b"DATAcam=front"),
        ("rear", b"DATAcam=rear"),
    }


def test_binary_source_feeds_multimodal_byte_stats(spark, tmp_path):
    """The ingestion handshake: binaryFile rows flow straight into the
    multimodal byte-stats operator on the content column."""
    from pyspark.sql import functions as F

    from aqueducts_spark.operators.multimodal import byte_stats

    _write_media(tmp_path)
    src = parse_source(
        {
            "type": "file",
            "name": "media_bs",
            "format": {"type": "binary", "options": {"path_glob_filter": "*.img"}},
            "location": str(tmp_path),
        }
    )
    df = register_source(spark, src).withColumn(
        "media_id", F.regexp_extract("path", r"([^/]+)\.img$", 1)
    )
    stats = {r.media_id: r for r in byte_stats(df, "content", "media_id").collect()}
    assert stats["a"].n_bytes == 68
    assert stats["b"].n_bytes == 2052


def test_binary_options_validation():
    with pytest.raises(Exception, match="max_bytes"):
        parse_source(
            {
                "type": "file",
                "name": "bad",
                "format": {"type": "binary", "options": {"max_bytes": 0}},
                "location": "/tmp/x",
            }
        )


def test_binary_pipeline_end_to_end(spark, tmp_path):
    """Declarative: binary source -> SQL stage over length/content ->
    parquet destination."""
    from aqueducts_spark import CollectingTracker, load_pipeline_str, run_pipeline

    media = tmp_path / "media"
    media.mkdir()
    _write_media(media)
    out = tmp_path / "out"
    yml = f"""
sources:
  - type: file
    name: raw_media
    format:
      type: binary
      options: {{path_glob_filter: "*.img"}}
    location: {media}
stages:
  - name: media_summary
    query: >
      SELECT regexp_extract(path, '([^/]+)$', 1) AS file_name,
             length AS n_bytes,
             substring(content, 1, 4) AS magic
      FROM raw_media
destination:
  type: file
  name: media_out
  format: {{type: parquet}}
  location: {out}
"""
    run_pipeline(spark, load_pipeline_str(yml, params={}), CollectingTracker())
    back = {r.file_name: r for r in spark.read.parquet(str(out)).collect()}
    assert set(back) == {"a.img", "b.img"}
    assert bytes(back["a.img"].magic) == b"\x89IMG"


# ---------------------------------------------------------------------------
# text format (raw corpora: one row per line, or per file with wholetext)
# ---------------------------------------------------------------------------


def test_text_source_line_mode(spark, tmp_path):
    (tmp_path / "a.txt").write_text("alpha\nbeta\n")
    (tmp_path / "b.txt").write_text("gamma\n")
    src = parse_source(
        {
            "type": "file",
            "name": "lines",
            "format": {"type": "text"},
            "location": str(tmp_path),
        }
    )
    df = register_source(spark, src)
    assert df.columns == ["value"]
    assert sorted(r.value for r in df.collect()) == ["alpha", "beta", "gamma"]


def test_text_source_wholetext_one_doc_per_file(spark, tmp_path):
    (tmp_path / "doc1.txt").write_text("first doc\nsecond line")
    (tmp_path / "doc2.txt").write_text("other doc")
    (tmp_path / "skip.log").write_text("excluded")
    src = parse_source(
        {
            "type": "file",
            "name": "docs",
            "format": {
                "type": "text",
                "options": {"wholetext": True, "path_glob_filter": "*.txt"},
            },
            "location": str(tmp_path),
        }
    )
    df = register_source(spark, src)
    got = sorted(r.value for r in df.collect())
    assert got == ["first doc\nsecond line", "other doc"]


def test_text_source_custom_line_sep(spark, tmp_path):
    (tmp_path / "recs.txt").write_text("one\x1etwo\x1ethree")
    src = parse_source(
        {
            "type": "file",
            "name": "recs",
            "format": {"type": "text", "options": {"line_sep": "\x1e"}},
            "location": str(tmp_path / "recs.txt"),
        }
    )
    df = register_source(spark, src)
    assert sorted(r.value for r in df.collect()) == ["one", "three", "two"]


def test_text_directory_source_hive_partitions(spark, tmp_path):
    for part in ("lang=en", "lang=de"):
        d = tmp_path / part
        d.mkdir()
        (d / "f.txt").write_text(f"hello from {part}\n")
    src = parse_source(
        {
            "type": "directory",
            "name": "text_dir",
            "format": {"type": "text"},
            "location": str(tmp_path),
            "partition_columns": [["lang", "string"]],
        }
    )
    df = register_source(spark, src)
    got = {(r.lang, r.value) for r in df.collect()}
    assert got == {
        ("en", "hello from lang=en"),
        ("de", "hello from lang=de"),
    }


def test_recursive_with_partition_columns_fails_fast(spark, tmp_path):
    """Spark's recursiveFileLookup disables hive-partition inference;
    the two knobs together must be rejected with a clear error instead
    of a confusing 'partition column not found'."""
    from aqueducts_spark.sources.register import SourceError

    d = tmp_path / "lang=en"
    d.mkdir()
    (d / "f.txt").write_text("hi\n")
    src = parse_source(
        {
            "type": "directory",
            "name": "bad_combo",
            "format": {"type": "text", "options": {"recursive": True}},
            "location": str(tmp_path),
            "partition_columns": [["lang", "string"]],
        }
    )
    with pytest.raises(SourceError, match="recursive.*partition_columns"):
        register_source(spark, src)


def test_text_source_reads_gzip_transparently(spark, tmp_path):
    """Real crawls arrive compressed (WET/WARC-derived .gz shards);
    Spark's codec layer must decompress .gz text/JSONL transparently
    through the source surface — pinned here so a codec regression
    can't silently truncate an ingest."""
    import gzip

    d = tmp_path / "gz_text"
    d.mkdir()
    with gzip.open(d / "shard-00.txt.gz", "wt") as f:
        f.write("line one\nline two\n")
    with gzip.open(d / "shard-01.txt.gz", "wt") as f:
        f.write("line three\n")
    src = parse_source(
        {
            "type": "file",
            "name": "gz_lines",
            "format": {"type": "text"},
            "location": str(d),
        }
    )
    df = register_source(spark, src)
    assert sorted(r.value for r in df.collect()) == [
        "line one", "line three", "line two",
    ]


def test_json_source_reads_gzip_ndjson(spark, tmp_path):
    import gzip
    import json as jsonlib

    d = tmp_path / "gz_json"
    d.mkdir()
    docs = [{"doc_id": 1, "text": "a"}, {"doc_id": 2, "text": "b"}]
    with gzip.open(d / "part-0.json.gz", "wt") as f:
        for doc in docs:
            f.write(jsonlib.dumps(doc) + "\n")
    src = parse_source(
        {
            "type": "file",
            "name": "gz_docs",
            "format": {"type": "json"},
            "location": str(d),
        }
    )
    df = register_source(spark, src)
    rows = {r.doc_id: r.text for r in df.collect()}
    assert rows == {1: "a", 2: "b"}
