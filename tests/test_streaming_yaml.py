"""Declarative streaming pipelines (config/model.py StreamingSpec +
pipeline.py::_run_streaming_pipeline): YAML `streaming: true` sources,
stream-safe stage whitelist, memory/file/foreachBatch-delta sinks,
load-time validation. Spark extension (the reference has no streaming
surface); stateful operators stay in aqueducts_spark.streaming.ops.
"""

import shutil

import pytest

from aqueducts_spark import load_pipeline_str, run_pipeline

SCHEMA_YML = """
        schema:
          - {name: doc_id, data_type: int64}
          - {name: text, data_type: string}
          - {name: lang, data_type: string}
          - {name: source, data_type: string}
          - {name: n_chars, data_type: int64}
"""


def _src(in_dir, name="sdocs"):
    return f"""
sources:
  - type: file
    name: {name}
    streaming: true
    format:
      type: parquet
      options:
{SCHEMA_YML}
    location: {in_dir}
"""


@pytest.fixture()
def incoming(tmp_path):
    d = tmp_path / "incoming"
    d.mkdir()
    shutil.copy(
        "/root/testdata/sf0.001/documents.parquet", d / "b1.parquet"
    )
    return d


def _drop(spark, *names):
    for n in names:
        try:
            spark.catalog.dropTempView(n)
        except Exception:
            pass


def test_memory_sink_drains_to_named_view(spark, incoming):
    yml = _src(incoming) + """
stages:
  - - name: mem_kept
      query: SELECT doc_id, lang FROM sdocs WHERE lang = 'en'
streaming: {trigger: available_now, timeout_sec: 300}
destination:
  type: in_memory
  name: mem_stream_out
"""
    res = run_pipeline(spark, load_pipeline_str(yml))
    got = res.result.count()
    assert got > 0
    assert spark.table("mem_stream_out").count() == got
    assert {r.lang for r in res.result.collect()} == {"en"}
    _drop(spark, "sdocs", "mem_kept", "mem_stream_out")


def test_delta_upsert_sink_via_foreachbatch(spark, incoming, tmp_path):
    """Each microbatch goes through the BATCH delta upsert writer: a
    re-run with overlapping keys updates in place instead of
    duplicating — the exactly-once merge shape."""
    loc = tmp_path / "delta_out"
    yml = _src(incoming) + f"""
stages:
  - - name: du_kept
      query: SELECT doc_id, lang, n_chars FROM sdocs
streaming: {{trigger: available_now, timeout_sec: 300}}
destination:
  type: delta
  name: du_out
  location: {loc}
  write_mode:
    operation: upsert
    params: [doc_id]
"""
    r1 = run_pipeline(spark, load_pipeline_str(yml))
    n1 = r1.result.count()
    assert n1 > 0
    # same keys land again (fresh file, fresh checkpoint): upsert keeps
    # the table at n1 rows instead of doubling it
    shutil.copy(
        "/root/testdata/sf0.001/documents.parquet", incoming / "b2.parquet"
    )
    r2 = run_pipeline(spark, load_pipeline_str(yml))
    assert r2.result.count() == n1
    _drop(spark, "sdocs", "du_kept")


def test_stream_safe_operator_stage_runs(spark, incoming, tmp_path):
    yml = _src(incoming) + f"""
stages:
  - - name: op_counts
      operator:
        type: token_count
        input: sdocs
streaming: {{trigger: available_now, timeout_sec: 300}}
destination:
  type: file
  name: op_out
  format: {{type: parquet}}
  single_file: false
  location: {tmp_path}/op_out
"""
    res = run_pipeline(spark, load_pipeline_str(yml))
    assert res.result.count() > 0
    _drop(spark, "sdocs", "op_counts")


def test_unsafe_operator_rejected_at_load(spark, incoming):
    yml = _src(incoming) + """
stages:
  - - name: bad_op
      operator:
        type: exact_dedup
        input: sdocs
destination:
  type: in_memory
  name: bad_out
"""
    with pytest.raises(Exception, match="not stream-safe"):
        load_pipeline_str(yml)


def test_show_rejected_on_streaming_pipeline(spark, incoming):
    yml = _src(incoming) + """
stages:
  - - name: shown
      query: SELECT * FROM sdocs
      show: 5
"""
    with pytest.raises(Exception, match="streaming pipeline"):
        load_pipeline_str(yml)


def test_schema_required_for_streaming_source(tmp_path):
    yml = f"""
sources:
  - type: file
    name: noschema
    streaming: true
    format: {{type: parquet}}
    location: {tmp_path}
stages:
  - - name: s1
      query: SELECT * FROM noschema
"""
    with pytest.raises(Exception, match="explicit schema"):
        load_pipeline_str(yml)


def test_single_file_and_odbc_dest_rejected(tmp_path, incoming):
    base = _src(incoming) + """
stages:
  - - name: s1
      query: SELECT * FROM sdocs
"""
    with pytest.raises(Exception, match="single_file"):
        load_pipeline_str(
            base
            + f"""
destination:
  type: file
  name: f_out
  format: {{type: parquet}}
  location: {tmp_path}/x
"""
        )
    with pytest.raises(Exception, match="cannot terminate"):
        load_pipeline_str(
            base
            + """
destination:
  type: odbc
  name: o_out
  connection_string: jdbc:derby:memory:x
  write_mode: {operation: append}
"""
        )


def test_streaming_block_without_streaming_source_rejected():
    yml = """
sources:
  - type: file
    name: batch_docs
    format: {type: parquet}
    location: /root/testdata/sf0.001/documents.parquet
stages:
  - - name: s1
      query: SELECT * FROM batch_docs
streaming: {trigger: available_now}
"""
    with pytest.raises(Exception, match="no source has streaming"):
        load_pipeline_str(yml)


def test_interval_validation():
    from aqueducts_spark.config.model import StreamingSpec

    with pytest.raises(Exception, match="interval"):
        StreamingSpec(trigger="processing_time")
    with pytest.raises(Exception, match="interval"):
        StreamingSpec(trigger="available_now", interval="5 seconds")


def test_processing_time_returns_live_query(spark, incoming, tmp_path):
    yml = _src(incoming) + f"""
stages:
  - - name: pt_kept
      query: SELECT doc_id FROM sdocs
streaming:
  trigger: processing_time
  interval: 1 seconds
destination:
  type: file
  name: pt_out
  format: {{type: parquet}}
  single_file: false
  location: {tmp_path}/pt_out
"""
    res = run_pipeline(spark, load_pipeline_str(yml))
    q = res.streaming_query
    assert q is not None and q.isActive
    try:
        # the live query drains the backlog shortly
        import time

        deadline = time.time() + 120
        while time.time() < deadline:
            try:
                if spark.read.parquet(f"{tmp_path}/pt_out").count() > 0:
                    break
            except Exception:
                pass
            time.sleep(1)
        assert spark.read.parquet(f"{tmp_path}/pt_out").count() > 0
    finally:
        q.stop()
    _drop(spark, "sdocs", "pt_kept")


def test_stream_static_join_stage(spark, incoming, tmp_path):
    """A streaming view joined to a BATCH source in plain SQL — the
    stream-static enrichment shape."""
    yml = f"""
sources:
  - type: file
    name: js_stream
    streaming: true
    format:
      type: parquet
      options:
{SCHEMA_YML}
    location: {incoming}
  - type: file
    name: js_langs
    format: {{type: parquet}}
    location: /root/testdata/sf0.001/documents.parquet
stages:
  - - name: js_dim
      query: SELECT lang, COUNT(*) AS lang_docs FROM js_langs GROUP BY lang
  - - name: js_joined
      query: >
        SELECT s.doc_id, s.lang, d.lang_docs
        FROM js_stream s JOIN js_dim d ON s.lang = d.lang
streaming: {{trigger: available_now, timeout_sec: 300}}
destination:
  type: in_memory
  name: js_out
"""
    res = run_pipeline(spark, load_pipeline_str(yml))
    rows = res.result.collect()
    assert rows and all(r.lang_docs > 0 for r in rows)
    _drop(spark, "js_stream", "js_langs", "js_dim", "js_joined", "js_out")


def test_fuzzy_decontam_rowwise_streams_declaratively(spark, incoming):
    """The live-crawl decontamination screen fully in YAML: the
    STREAMING crawl drops rows near-duplicating a static benchmark via
    fuzzy_decontam_rowwise (per-row band keys + one stream-static
    broadcast condition anti-join — no stream-side aggregation).  The
    benchmark IS the incoming corpus, so everything with text screens
    out; empty/NULL-text rows have no shingles and are kept."""
    yml = f"""
sources:
  - type: file
    name: fd_stream
    streaming: true
    format:
      type: parquet
      options:
{SCHEMA_YML}
    location: {incoming}
  - type: file
    name: fd_bench
    format: {{type: parquet}}
    location: /root/testdata/sf0.001/documents.parquet
stages:
  - - name: fd_survivors
      operator:
        type: fuzzy_decontam_rowwise
        input: fd_stream
        options: {{benchmark: fd_bench, threshold: 0.8}}
streaming: {{trigger: available_now, timeout_sec: 300}}
destination:
  type: in_memory
  name: fd_out
"""
    import warnings

    with warnings.catch_warnings():
        warnings.simplefilter("ignore", UserWarning)
        res = run_pipeline(spark, load_pipeline_str(yml))
    import duckdb

    empties = duckdb.sql(
        "SELECT count(*) FROM read_parquet('/root/testdata/sf0.001/"
        "documents.parquet') WHERE text IS NULL OR trim(text) = ''"
    ).fetchone()[0]
    assert res.result.count() == empties
    _drop(spark, "fd_stream", "fd_bench", "fd_survivors", "fd_out")


def test_hamming_filter_streams_declaratively(spark, incoming, tmp_path):
    """The signature-index screen fully in YAML: incoming rows carry a
    stored simhash column (computed upstream / at rest); the screen is
    hamming_filter's stream-static broadcast condition anti-join.  At
    max_distance=0 every exact copy of an indexed signature drops."""
    from aqueducts_spark.operators.dedup import simhash

    # the "crawl at rest" carries signatures: build them in batch and
    # land the signed parquet as the stream's incoming file
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    signed = simhash(docs)
    sig_dir = tmp_path / "signed_incoming"
    signed.write.parquet(str(sig_dir / "b1.parquet"))
    yml = f"""
sources:
  - type: file
    name: hf_stream
    streaming: true
    format:
      type: parquet
      options:
        schema:
          - {{name: doc_id, data_type: int64}}
          - {{name: simhash, data_type: int64}}
    location: {sig_dir}
  - type: file
    name: hf_corpus
    format: {{type: parquet}}
    location: /root/testdata/sf0.001/documents.parquet
stages:
  - - name: hf_index
      operator:
        type: simhash
        input: hf_corpus
  - - name: hf_survivors
      operator:
        type: hamming_filter
        input: hf_stream
        options: {{index: hf_index, max_hamming: 0}}
streaming: {{trigger: available_now, timeout_sec: 300}}
destination:
  type: in_memory
  name: hf_out
"""
    res = run_pipeline(spark, load_pipeline_str(yml))
    # every incoming signature exists in the index -> all screened out
    assert res.result.count() == 0
    _drop(spark, "hf_stream", "hf_corpus", "hf_index", "hf_survivors", "hf_out")


def test_max_files_per_trigger_bounds_microbatches(spark, incoming, tmp_path):
    """Backpressure: with 3 incoming files and max_files_per_trigger=1,
    the available_now drain still ingests EVERYTHING — in bounded
    microbatches (>= 3 of them) instead of one giant batch."""
    shutil.copy(
        "/root/testdata/sf0.001/documents.parquet", incoming / "b2.parquet"
    )
    shutil.copy(
        "/root/testdata/sf0.001/documents.parquet", incoming / "b3.parquet"
    )
    yml = f"""
sources:
  - type: file
    name: mf_docs
    streaming: true
    max_files_per_trigger: 1
    format:
      type: parquet
      options:
{SCHEMA_YML}
    location: {incoming}
stages:
  - - name: mf_kept
      query: SELECT doc_id FROM mf_docs
streaming: {{trigger: available_now, timeout_sec: 300}}
destination:
  type: file
  name: mf_out
  format: {{type: parquet}}
  single_file: false
  location: {tmp_path}/mf_out
"""
    res = run_pipeline(spark, load_pipeline_str(yml))
    one = spark.read.parquet("/root/testdata/sf0.001/documents.parquet").count()
    assert res.result.count() == 3 * one
    # each microbatch committed separately: >= 3 sink log entries
    import os

    commits = os.listdir(f"{tmp_path}/mf_out/_spark_metadata")
    assert len([c for c in commits if not c.startswith(".")]) >= 3
    _drop(spark, "mf_docs", "mf_kept")


def test_max_files_per_trigger_requires_streaming():
    yml = """
sources:
  - type: file
    name: mfb_docs
    max_files_per_trigger: 2
    format: {type: parquet}
    location: /root/testdata/sf0.001/documents.parquet
stages:
  - - name: s1
      query: SELECT * FROM mfb_docs
"""
    with pytest.raises(Exception, match="streaming option"):
        load_pipeline_str(yml)


def test_batch_stage_show_still_works_in_streaming_pipeline(spark, incoming):
    """A BATCH stage (no streaming reference) inside a streaming
    pipeline keeps the full batch feature set — its show: output is
    produced, exactly as load-time validation promises."""
    from aqueducts_spark import CollectingTracker

    yml = f"""
sources:
  - type: file
    name: bs_stream
    streaming: true
    format:
      type: parquet
      options:
{SCHEMA_YML}
    location: {incoming}
  - type: file
    name: bs_static
    format: {{type: parquet}}
    location: /root/testdata/sf0.001/documents.parquet
stages:
  - - name: bs_dim
      query: SELECT lang, COUNT(*) AS n FROM bs_static GROUP BY lang
      show: 5
  - - name: bs_joined
      query: >
        SELECT s.doc_id, d.n FROM bs_stream s JOIN bs_dim d USING (lang)
streaming: {{trigger: available_now, timeout_sec: 300}}
destination:
  type: in_memory
  name: bs_out
"""
    tracker = CollectingTracker()
    res = run_pipeline(spark, load_pipeline_str(yml), tracker)
    assert res.result.count() > 0
    shows = [o for o in tracker.outputs if o[0] == "bs_dim" and o[1] == "show"]
    assert shows and "lang" in shows[0][2]
    _drop(spark, "bs_stream", "bs_static", "bs_dim", "bs_joined", "bs_out")


def test_complete_mode_streaming_aggregation_to_memory(spark, incoming):
    """SQL stages may aggregate the stream (only OPERATOR stages are
    whitelist-limited); complete mode + memory sink is the dashboard
    shape and must work end-to-end."""
    yml = _src(incoming, name="cm_docs") + """
stages:
  - - name: cm_counts
      query: SELECT lang, COUNT(*) AS n FROM cm_docs GROUP BY lang
streaming: {trigger: available_now, timeout_sec: 300, output_mode: complete}
destination:
  type: in_memory
  name: cm_out
"""
    res = run_pipeline(spark, load_pipeline_str(yml))
    rows = {r.lang: r.n for r in res.result.collect()}
    assert rows and sum(rows.values()) == spark.read.parquet(
        "/root/testdata/sf0.001/documents.parquet"
    ).count()
    _drop(spark, "cm_docs", "cm_counts", "cm_out")


def test_streaming_shuffle_partitions_scopes_to_query(spark, incoming):
    """streaming.shuffle_partitions sizes the query's state-store
    partition count (conf cloned at start()) and MUST NOT leak into
    the caller's session conf afterwards."""
    before = spark.conf.get("spark.sql.shuffle.partitions")
    yml = _src(incoming, name="sp_docs") + """
stages:
  - - name: sp_counts
      query: SELECT lang, COUNT(*) AS n FROM sp_docs GROUP BY lang
streaming: {trigger: available_now, timeout_sec: 300,
            output_mode: complete, shuffle_partitions: 4}
destination:
  type: in_memory
  name: sp_out
"""
    res = run_pipeline(spark, load_pipeline_str(yml))
    rows = {r.lang: r.n for r in res.result.collect()}
    assert rows and sum(rows.values()) == spark.read.parquet(
        "/root/testdata/sf0.001/documents.parquet"
    ).count()
    assert spark.conf.get("spark.sql.shuffle.partitions") == before
    _drop(spark, "sp_docs", "sp_counts", "sp_out")


def test_streaming_shuffle_partitions_validated():
    with pytest.raises(Exception, match="shuffle_partitions"):
        load_pipeline_str(
            """
sources:
  - type: file
    name: v_docs
    streaming: true
    format:
      type: parquet
      options:
        schema:
          - {name: doc_id, data_type: int64}
    location: /tmp/nowhere
stages:
  - - name: v_kept
      query: SELECT doc_id FROM v_docs
streaming: {trigger: available_now, shuffle_partitions: 0}
destination:
  type: in_memory
  name: v_out
"""
        )


def test_sink_output_mode_matrix_validated(tmp_path, incoming):
    base = _src(incoming) + """
stages:
  - - name: s1
      query: SELECT lang, COUNT(*) AS n FROM sdocs GROUP BY lang
"""
    # complete -> file sink: rejected at load (file sink is append-only)
    with pytest.raises(Exception, match="append-only"):
        load_pipeline_str(
            base
            + f"""
streaming: {{output_mode: complete}}
destination:
  type: file
  name: x_out
  format: {{type: parquet}}
  single_file: false
  location: {tmp_path}/x
"""
        )
    # update -> memory sink: rejected at load
    with pytest.raises(Exception, match="memory sink"):
        load_pipeline_str(
            base
            + """
streaming: {output_mode: update}
destination:
  type: in_memory
  name: y_out
"""
        )
    # checkpoint_dir + memory sink: silently-ignored config rejected
    with pytest.raises(Exception, match="checkpoint"):
        load_pipeline_str(
            base
            + f"""
streaming: {{checkpoint_dir: {tmp_path}/ck}}
destination:
  type: in_memory
  name: z_out
"""
        )


def test_watermarked_windowed_aggregation(spark, tmp_path):
    """Event-time watermark on a streaming source + a windowed SQL
    aggregation in update mode to a delta sink — the state-bounded
    streaming-rollup shape, fully declarative."""
    import shutil

    inc = tmp_path / "ev_incoming"
    inc.mkdir()
    shutil.copy("/root/testdata/sf0.001/events.parquet", inc / "e1.parquet")
    yml = f"""
sources:
  - type: file
    name: wm_events
    streaming: true
    watermark: {{column: ts, delay: 1 hour}}
    format:
      type: parquet
      options:
        schema:
          - {{name: event_id, data_type: int64}}
          - {{name: ts, data_type: "timestamp<microsecond,UTC>"}}
          - {{name: user_id, data_type: int64}}
          - {{name: event_type, data_type: string}}
          - {{name: value, data_type: float64}}
          - {{name: props, data_type: string}}
    location: {inc}
stages:
  - - name: wm_counts
      query: >
        SELECT window(ts, '1 day').start AS day, event_type,
               COUNT(*) AS n
        FROM wm_events GROUP BY window(ts, '1 day'), event_type
streaming: {{trigger: available_now, timeout_sec: 300, output_mode: update}}
destination:
  type: delta
  name: wm_out
  location: {tmp_path}/wm_delta
  write_mode:
    operation: upsert
    params: [day, event_type]
"""
    res = run_pipeline(spark, load_pipeline_str(yml))
    got = {(r.day, r.event_type): r.n for r in res.result.collect()}
    # update mode with a single available_now drain: watermark starts
    # at 0, so EVERY window is still open and emits its current count —
    # the totals must equal the SAME window expression run in batch
    # (session-timezone-identical by construction)
    want = {
        (r.day, r.event_type): r.n
        for r in spark.read.parquet(
            "/root/testdata/sf0.001/events.parquet"
        )
        .selectExpr(
            "window(ts, '1 day').start AS day", "event_type"
        )
        .groupBy("day", "event_type")
        .count()
        .withColumnRenamed("count", "n")
        .collect()
    }
    assert got == want
    _drop(spark, "wm_events", "wm_counts")


def test_watermark_validation():
    base = """
sources:
  - type: file
    name: wv_docs
    {extra}
    format: {{type: parquet}}
    location: /root/testdata/sf0.001/documents.parquet
stages:
  - - name: s1
      query: SELECT * FROM wv_docs
"""
    with pytest.raises(Exception, match="streaming option"):
        load_pipeline_str(base.format(extra="watermark: {column: ts, delay: 1 hour}"))


def test_delta_update_mode_requires_upsert(tmp_path, incoming):
    yml = _src(incoming) + f"""
stages:
  - - name: du2
      query: SELECT lang, COUNT(*) AS n FROM sdocs GROUP BY lang
streaming: {{output_mode: update}}
destination:
  type: delta
  name: du2_out
  location: {tmp_path}/du2
  write_mode: {{operation: append}}
"""
    with pytest.raises(Exception, match="requires write_mode operation: upsert"):
        load_pipeline_str(yml)


def test_streaming_without_destination_rejected(incoming):
    yml = _src(incoming) + """
stages:
  - - name: nd_kept
      query: SELECT doc_id FROM sdocs
"""
    with pytest.raises(Exception, match="needs a destination"):
        load_pipeline_str(yml)


def test_once_trigger_rejects_max_files_per_trigger(tmp_path, incoming):
    yml = f"""
sources:
  - type: file
    name: ot_docs
    streaming: true
    max_files_per_trigger: 2
    format:
      type: parquet
      options:
{SCHEMA_YML}
    location: {incoming}
stages:
  - - name: ot_kept
      query: SELECT doc_id FROM ot_docs
streaming: {{trigger: once}}
destination:
  type: file
  name: ot_out
  format: {{type: parquet}}
  single_file: false
  location: {tmp_path}/ot
"""
    with pytest.raises(Exception, match="trigger: once"):
        load_pipeline_str(yml)


def test_explain_and_print_schema_on_streaming_stage(spark, incoming, tmp_path):
    from aqueducts_spark import CollectingTracker

    yml = _src(incoming) + f"""
stages:
  - - name: ex_kept
      query: SELECT doc_id, lang FROM sdocs WHERE lang = 'en'
      explain: true
      print_schema: true
streaming: {{trigger: available_now, timeout_sec: 300}}
destination:
  type: file
  name: ex_out
  format: {{type: parquet}}
  single_file: false
  location: {tmp_path}/ex
"""
    tracker = CollectingTracker()
    res = run_pipeline(spark, load_pipeline_str(yml), tracker)
    assert res.result.count() > 0
    kinds = {(o[0], o[1]) for o in tracker.outputs}
    assert ("ex_kept", "explain") in kinds
    assert ("ex_kept", "schema") in kinds
    _drop(spark, "sdocs", "ex_kept")


def test_csv_sink_readback_preserves_declared_types(spark, incoming, tmp_path):
    """CSV read-back pins the drained schema: a string column whose
    values LOOK numeric must come back as string ('007' stays '007')."""
    yml = _src(incoming) + f"""
stages:
  - - name: cs_kept
      query: >
        SELECT doc_id, lpad(CAST(doc_id AS STRING), 5, '0') AS padded
        FROM sdocs
streaming: {{trigger: available_now, timeout_sec: 300}}
destination:
  type: file
  name: cs_out
  format: {{type: csv}}
  single_file: false
  location: {tmp_path}/cs
"""
    res = run_pipeline(spark, load_pipeline_str(yml))
    assert dict(res.result.dtypes)["padded"] == "string"
    assert dict(res.result.dtypes)["doc_id"] == "bigint"
    one = res.result.where("doc_id = 7").first()
    if one is not None:
        assert one.padded == "00007"  # leading zeros intact
    _drop(spark, "sdocs", "cs_kept")
