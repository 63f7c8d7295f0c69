"""Fixed-length training-sequence packing (operators/mixing.py::
sequence_spans): the loader's exact gather plan over the laid-out
token stream."""

import pytest

from aqueducts_spark.operators.mixing import sequence_spans


def _ref_spans(docs, seq_len):
    """Pure-Python reference: docs in stream order as (doc_id, n_tok)."""
    out, off = [], 0
    for doc_id, n in docs:
        n = n or 0
        if n <= 0:
            continue
        s = off
        while s < off + n:
            seq = s // seq_len
            e = min(off + n, (seq + 1) * seq_len)
            out.append((doc_id, seq, s - seq * seq_len, s - off, e - s))
            s = e
        off += n
    return sorted(out)


def _collect(df):
    return sorted(
        (r.doc_id, r.seq_id, r.seq_tok_start, r.doc_tok_start, r.span_len)
        for r in df.collect()
    )


DOCS = [(1, 7), (2, 3), (3, 0), (4, None), (5, 12), (6, 5), (7, 1)]
SCHEMA = "doc_id long, n_tokens long"


def test_known_vectors_single_stream(spark):
    df = spark.createDataFrame(DOCS, SCHEMA)
    got = _collect(sequence_spans(df, 10, ["doc_id"]))
    assert got == _ref_spans(sorted(DOCS), 10)
    # doc 1 spans [0,7), doc 2 [7,10): sequence 0 tiles exactly
    assert (1, 0, 0, 0, 7) in got and (2, 0, 7, 0, 3) in got
    # zero/NULL-token docs contribute no spans
    assert not any(d in (3, 4) for d, *_ in got)


def test_sharded_path_matches_reference(spark):
    rows = [(i, s, (i * 7) % 13 + 1) for i in range(40) for s in [(i * 3) % 4]]
    df = spark.createDataFrame(rows, "doc_id long, shard long, n long")
    got = _collect(
        sequence_spans(df, 16, ["doc_id"], token_col="n", shard_col="shard")
    )
    stream = [(i, n) for i, s, n in sorted(rows, key=lambda r: (r[1], r[0]))]
    assert got == _ref_spans(stream, 16)


@pytest.mark.parametrize("seq_len", [1, 5, 1000])
def test_tiling_invariants(spark, seq_len):
    df = spark.createDataFrame(DOCS, SCHEMA)
    got = _collect(sequence_spans(df, seq_len, ["doc_id"]))
    total = sum(n or 0 for _, n in DOCS)
    # every token lands exactly once
    assert sum(ln for *_, ln in got) == total
    # per-sequence spans tile [0, seq_len) — the last may be partial
    per_seq = {}
    for _, seq, st, _, ln in got:
        per_seq.setdefault(seq, []).append((st, ln))
    last = max(per_seq)
    for seq, spans in per_seq.items():
        spans.sort()
        pos = 0
        for st, ln in spans:
            assert st == pos and ln >= 1
            pos += ln
        if seq != last:
            assert pos == seq_len
    # per-doc spans tile [0, n_tokens) in order
    per_doc = {}
    for d, _, _, ds, ln in got:
        per_doc.setdefault(d, []).append((ds, ln))
    for d, spans in per_doc.items():
        spans.sort()
        pos = 0
        for ds, ln in spans:
            assert ds == pos
            pos += ln
        assert pos == dict(DOCS)[d]


def test_validation(spark):
    df = spark.createDataFrame(DOCS, SCHEMA)
    with pytest.raises(ValueError, match="seq_len"):
        sequence_spans(df, 0, ["doc_id"])
    with pytest.raises(ValueError, match="already exist"):
        sequence_spans(df.withColumnRenamed("n_tokens", "seq_id"), 10, ["doc_id"])
    with pytest.raises(ValueError, match="order_cols"):
        sequence_spans(df, 10, [])


def test_registry_stage(spark):
    from aqueducts_spark.operators.registry import run_operator

    spark.createDataFrame(DOCS, SCHEMA).createOrReplaceTempView("sq_docs")
    out = run_operator(
        spark,
        {
            "type": "sequence_spans",
            "input": "sq_docs",
            "options": {"seq_len": 10, "order_cols": "doc_id"},
        },
    )
    assert _collect(out) == _ref_spans(sorted(DOCS), 10)
    spark.catalog.dropTempView("sq_docs")


def test_registry_stage_missing_seq_len_raises_operator_error(spark):
    from aqueducts_spark.operators.registry import OperatorError, run_operator

    spark.createDataFrame(DOCS, SCHEMA).createOrReplaceTempView("sq_docs2")
    with pytest.raises(OperatorError, match="seq_len"):
        run_operator(
            spark,
            {"type": "sequence_spans", "input": "sq_docs2", "options": {}},
        )
    spark.catalog.dropTempView("sq_docs2")
