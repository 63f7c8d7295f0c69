"""minhash_signatures + fuzzy_filter_against (operators/dedup.py):
incremental fuzzy dedup against a signature index at rest — the
new-crawl-vs-existing-corpus screen with agreement-based verification
(E[agreement] = jaccard), the MinHash analogue of hamming_filter."""

import pytest
from pyspark.sql import functions as F

from aqueducts_spark.operators.dedup import (
    fuzzy_filter_against,
    minhash_bands,
    minhash_signatures,
)

DOCS = [
    (1, "the quick brown fox jumps over the lazy dog near the river bank"),
    (2, "an entirely different document about spark shuffle partitions"),
    (3, "tokenizers split text into subword units for language models"),
]
NEAR = [
    # near-dup of doc 1 (one word changed)
    (11, "the quick brown fox leaps over the lazy dog near the river bank"),
    # exact text of doc 2
    (12, "an entirely different document about spark shuffle partitions"),
    # novel
    (13, "completely novel content that matches nothing in the index"),
    # empty / NULL: no signature, always kept
    (14, ""),
    (15, None),
]
SCHEMA = "doc_id long, text string"


@pytest.fixture(scope="module")
def index(spark):
    return minhash_signatures(
        spark.createDataFrame(DOCS, SCHEMA), num_hashes=16
    )


def test_signature_shape_and_determinism(spark, index):
    rows = index.collect()
    assert {r.doc_id for r in rows} == {1, 2, 3}
    assert all(len(r.minhash) == 16 for r in rows)
    again = minhash_signatures(
        spark.createDataFrame(DOCS, SCHEMA), num_hashes=16
    ).collect()
    assert sorted(map(tuple, rows)) == sorted(map(tuple, again))


def test_band_keys_match_minhash_bands(spark, index):
    """Stored-signature band keys must equal the text-derived ones —
    otherwise an index at rest would bucket differently from a fresh
    computation and silently miss candidates."""
    from aqueducts_spark.operators.dedup import _band_keys_from_sig

    from_text = {
        (r.doc_id, r.band): r.band_hash
        for r in minhash_bands(
            spark.createDataFrame(DOCS, SCHEMA), num_hashes=16, bands=4
        ).collect()
    }
    from_sig = {
        (r.doc_id, r.band): r.band_hash
        for r in index.select(
            "doc_id",
            F.posexplode(
                F.array(*_band_keys_from_sig(F.col("minhash"), 16, 4, "md5"))
            ).alias("band", "band_hash"),
        ).collect()
    }
    assert from_text == from_sig


def test_filter_drops_near_dups_keeps_novel_and_empty(spark, index):
    new = spark.createDataFrame(NEAR, SCHEMA)
    kept = sorted(
        r.doc_id
        for r in fuzzy_filter_against(new, index, threshold=0.5, bands=8).collect()
    )
    # 12 is an exact dup (agreement 1.0); 11 is a near-dup; 13 novel;
    # 14/15 contentless -> kept
    assert 12 not in kept and 11 not in kept
    assert kept == [13, 14, 15]


def test_threshold_one_keeps_near_dup_drops_exact(spark, index):
    new = spark.createDataFrame(NEAR[:3], SCHEMA)
    kept = sorted(
        r.doc_id
        for r in fuzzy_filter_against(new, index, threshold=1.0, bands=8).collect()
    )
    assert 12 not in kept  # identical text: agreement exactly 1
    assert 11 in kept and 13 in kept


def test_agreement_matches_python_reference(spark, index):
    """The drop decision equals a Python replay of signature agreement
    over band-colliding pairs."""
    import hashlib

    def sig(text):
        toks = [t for t in text.lower().strip().split() if t]
        sh = {
            " ".join(toks[i : i + 3])
            for i in range(max(len(toks) - 2, 1))
        } - {""}
        out = []
        for s in range(16):
            hs = [
                int(
                    hashlib.md5(f"{s // 4}#{x}".encode()).hexdigest()[
                        (s % 4) * 8 : (s % 4) * 8 + 8
                    ],
                    16,
                )
                for x in sh
            ]
            out.append(min(hs) if hs else None)
        return out

    idx_sigs = {i: sig(t) for i, t in DOCS}
    expect_kept = []
    for i, t in NEAR:
        if not t:
            expect_kept.append(i)
            continue
        s = sig(t)

        def bands_of(v):
            return {
                b: hashlib.md5(
                    ",".join(str(x) for x in v[b * 2 : b * 2 + 2]).encode()
                ).hexdigest()
                for b in range(8)
            }

        nb = bands_of(s)
        drop = False
        for j, vs in idx_sigs.items():
            ib = bands_of(vs)
            if any(nb[b] == ib[b] for b in range(8)):
                agree = sum(a == b for a, b in zip(s, vs)) / 16
                if agree >= 0.5:
                    drop = True
        if not drop:
            expect_kept.append(i)
    new = spark.createDataFrame(NEAR, SCHEMA)
    kept = sorted(
        r.doc_id
        for r in fuzzy_filter_against(new, index, threshold=0.5, bands=8).collect()
    )
    assert kept == sorted(expect_kept)


def test_null_id_raises_and_index_size_validated(spark, index):
    bad = spark.createDataFrame([(None, "some text here ok")], SCHEMA)
    with pytest.raises(Exception) as exc:
        fuzzy_filter_against(bad, index).collect()
    assert "NULL id" in str(exc.value)
    short_idx = index.select(
        F.slice("minhash", 1, 8).alias("minhash")
    )
    new = spark.createDataFrame(NEAR[:1], SCHEMA)
    with pytest.raises(Exception) as exc:
        fuzzy_filter_against(new, short_idx).collect()
    assert "expected num_hashes" in str(exc.value)


def test_validation(spark, index):
    new = spark.createDataFrame(NEAR[:1], SCHEMA)
    with pytest.raises(ValueError, match="threshold"):
        fuzzy_filter_against(new, index, threshold=0.0)
    with pytest.raises(ValueError, match="divide"):
        fuzzy_filter_against(new, index, bands=5)


def test_index_roundtrips_through_parquet(spark, index, tmp_path):
    # the "at rest" claim: write the index, read it back, same decisions
    p = str(tmp_path / "sig_index")
    index.write.parquet(p)
    new = spark.createDataFrame(NEAR, SCHEMA)
    a = sorted(
        r.doc_id for r in fuzzy_filter_against(new, index).collect()
    )
    b = sorted(
        r.doc_id
        for r in fuzzy_filter_against(
            new, spark.read.parquet(p)
        ).collect()
    )
    assert a == b


def test_minhash_components_are_independent(spark):
    """REGRESSION for the correlated-family defect: the original
    construction mixed ONE base hash with non-wrapping linear maps, so
    every seed's argmin was the same shingle and component agreement
    was always 0/16 or 16/16 — LSH banding collapsed to a single-hash
    probe.  A near-dup pair (jaccard strictly between 0 and 1) must now
    show GRADED agreement: strictly between 0 and num_hashes, and close
    to jaccard * num_hashes in expectation."""
    pair = [
        (1, "the quick brown fox jumps over the lazy dog near the river bank"),
        (2, "the quick brown fox leaps over the lazy dog near the river bank"),
    ]
    sigs = {
        r.doc_id: r.minhash
        for r in minhash_signatures(
            spark.createDataFrame(pair, SCHEMA), num_hashes=64
        ).collect()
    }
    agree = sum(a == b for a, b in zip(sigs[1], sigs[2]))
    # true 3-shingle jaccard of this pair is 8 shared / 14 union = 0.571
    assert 0 < agree < 64
    assert abs(agree / 64 - 8 / 14) < 0.25  # ~4 sigma at k=64


def test_band_keys_interop_on_xxhash64_path(spark):
    """The fast-path band keys must also agree between stored
    signatures and fresh minhash_bands output — one drifting copy of
    the key hash would make LSH find zero candidates silently."""
    from aqueducts_spark.operators.dedup import _band_keys_from_sig

    df = spark.createDataFrame(DOCS, SCHEMA)
    from_text = {
        (r.doc_id, r.band): r.band_hash
        for r in minhash_bands(
            df, num_hashes=16, bands=4, hash_fn="xxhash64"
        ).collect()
    }
    sigs = minhash_signatures(df, num_hashes=16, hash_fn="xxhash64")
    from_sig = {
        (r.doc_id, r.band): r.band_hash
        for r in sigs.select(
            "doc_id",
            F.posexplode(
                F.array(
                    *_band_keys_from_sig(F.col("minhash"), 16, 4, "xxhash64")
                )
            ).alias("band", "band_hash"),
        ).collect()
    }
    assert from_text == from_sig and len(from_text) == 12


def test_null_index_signature_raises(spark, index):
    # a mis-populated (NULL-signature) index used to be silently
    # dropped row-by-row — an all-NULL index filtered NOTHING with no
    # signal.  It must raise loudly now.
    nulled = index.select(
        F.lit(None).cast("array<long>").alias("minhash")
    )
    new = spark.createDataFrame(NEAR[:1], SCHEMA)
    with pytest.raises(Exception) as exc:
        fuzzy_filter_against(new, nulled).collect()
    assert "NULL signature" in str(exc.value)
