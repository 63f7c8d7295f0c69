"""Declarative operator stages: YAML-usable wrappers over the
operator library, so training-data pipelines don't need Python.

A stage may declare ``operator:`` instead of ``query:``:

    stages:
      - name: near_dups
        operator:
          type: minhash_pairs
          input: documents
          options: {num_hashes: 16, bands: 4, shingle_n: 3}

``input`` (and ``queries`` for top-k) name previously-registered tables
(sources or earlier stages); the result registers under the stage name
exactly like a SQL stage.
"""

from __future__ import annotations

from typing import Any, Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


class OperatorError(ValueError):
    pass


def _bool_opt(options: dict[str, Any], key: str, default: bool) -> bool:
    """Boolean option tolerant of string forms: YAML-templated or
    string-typed specs send 'false'/'no'/'0', and bool('false') is
    True — the silently-opposite-policy trap."""
    v = options.get(key, default)
    if isinstance(v, bool):
        return v
    if isinstance(v, str):
        low = v.strip().lower()
        if low in ("true", "yes", "on", "1"):
            return True
        if low in ("false", "no", "off", "0"):
            return False
        raise OperatorError(
            f"option {key!r}: cannot parse {v!r} as a boolean"
        )
    return bool(v)


def _docs_args(options: dict[str, Any]) -> dict[str, Any]:
    out = {}
    if "id_col" in options:
        out["id_col"] = options["id_col"]
    if "text_col" in options:
        out["text_col"] = options["text_col"]
    return out


def _op_exact_dedup(spark, inp, options):
    from .dedup import exact_dedup

    return exact_dedup(
        inp,
        options.get("id_col", "doc_id"),
        options.get("columns", ["text"]),
        hash_fn=options.get("hash_fn", "md5"),
    )


def _op_dup_weights(spark, inp, options):
    from .dedup import dup_weights

    count_col = options.get("count_col", "dup_count")
    return dup_weights(
        inp,
        options.get("columns", ["text"]),
        alpha=float(options.get("alpha", 1.0)),
        weight_col=options.get("weight_col", "dup_weight"),
        count_col=count_col if count_col not in (None, "") else None,
        hash_fn=options.get("hash_fn", "md5"),
    )


def _op_minhash_bands(spark, inp, options):
    from .dedup import minhash_bands

    return minhash_bands(
        inp,
        num_hashes=int(options.get("num_hashes", 16)),
        bands=int(options.get("bands", 4)),
        shingle_n=int(options.get("shingle_n", 3)),
        hash_fn=options.get("hash_fn", "md5"),
        **_docs_args(options),
    )


def _op_minhash_pairs(spark, inp, options):
    from .dedup import minhash_candidate_pairs

    return minhash_candidate_pairs(
        inp,
        num_hashes=int(options.get("num_hashes", 16)),
        bands=int(options.get("bands", 4)),
        shingle_n=int(options.get("shingle_n", 3)),
        hash_fn=options.get("hash_fn", "md5"),
        **_docs_args(options),
    )


def _op_fuzzy_dedup(spark, inp, options):
    from .dedup import fuzzy_dedup

    return fuzzy_dedup(
        inp,
        num_hashes=int(options.get("num_hashes", 16)),
        bands=int(options.get("bands", 4)),
        shingle_n=int(options.get("shingle_n", 3)),
        hash_fn=options.get("hash_fn", "md5"),
        keep_by=options.get("keep_by"),
        descending=_bool_opt(options, "descending", True),
        **_docs_args(options),
    )


def _op_jaccard_pairs(spark, inp, options):
    from .dedup import jaccard_pairs

    return jaccard_pairs(
        inp,
        threshold=float(options.get("threshold", 0.5)),
        shingle_n=int(options.get("shingle_n", 3)),
        **_docs_args(options),
    )


def _op_simhash(spark, inp, options):
    from .dedup import simhash

    return simhash(
        inp, hash_fn=options.get("hash_fn", "md5"), **_docs_args(options)
    )


def _op_simhash_wide(spark, inp, options):
    from .dedup import simhash_wide

    return simhash_wide(
        inp,
        bits=int(options.get("bits", 120)),
        hash_fn=options.get("hash_fn", "md5"),
        **_docs_args(options),
    )


def _op_hamming_pairs_wide(spark, inp, options):
    from .dedup import hamming_pairs_wide

    mbs = options.get("max_bucket_size", 10_000)
    bands = options.get("bands")
    return hamming_pairs_wide(
        inp,
        sig_col=options.get("sig_col", "simhash"),
        id_col=options.get("id_col", "doc_id"),
        max_hamming=int(options.get("max_hamming", 3)),
        bands=None if bands is None else int(bands),
        sig_bits=int(options.get("sig_bits", 120)),
        max_bucket_size=None if mbs is None else int(mbs),
    )


def _op_hamming_filter_wide(spark, inp, options):
    from .dedup import hamming_filter_wide

    index_table = options.get("index")
    if not index_table:
        raise OperatorError(
            "hamming_filter_wide operator requires options.index (a table "
            "of wide signatures, e.g. a simhash_wide stage)"
        )
    return hamming_filter_wide(
        inp,
        spark.table(index_table),
        sig_col=options.get("sig_col", "simhash"),
        index_sig_col=options.get("index_sig_col"),
        max_hamming=int(options.get("max_hamming", 3)),
        sig_bits=int(options.get("sig_bits", 120)),
    )


def _op_hamming_pairs(spark, inp, options):
    from .dedup import hamming_pairs

    mbs = options.get("max_bucket_size", 10_000)
    bands = options.get("bands")
    return hamming_pairs(
        inp,
        sig_col=options.get("sig_col", "simhash"),
        id_col=options.get("id_col", "doc_id"),
        max_hamming=int(options.get("max_hamming", 3)),
        bands=None if bands is None else int(bands),
        sig_bits=int(options.get("sig_bits", 60)),
        max_bucket_size=None if mbs is None else int(mbs),
    )


def _op_minhash_signatures(spark, inp, options):
    from .dedup import minhash_signatures

    return minhash_signatures(
        inp,
        id_col=options.get("id_col", "doc_id"),
        text_col=options.get("text_col", "text"),
        num_hashes=int(options.get("num_hashes", 16)),
        shingle_n=int(options.get("shingle_n", 3)),
        hash_fn=options.get("hash_fn", "md5"),
    )


def _op_fuzzy_filter_against(spark, inp, options):
    from .dedup import fuzzy_filter_against

    index_table = options.get("index")
    if not index_table:
        raise OperatorError(
            "fuzzy_filter_against operator requires options.index (a "
            "(id, minhash) signature table, e.g. a minhash_signatures "
            "stage or one read back from disk)"
        )
    return fuzzy_filter_against(
        inp,
        spark.table(index_table),
        threshold=float(options.get("threshold", 0.5)),
        id_col=options.get("id_col", "doc_id"),
        text_col=options.get("text_col", "text"),
        num_hashes=int(options.get("num_hashes", 16)),
        bands=int(options.get("bands", 4)),
        shingle_n=int(options.get("shingle_n", 3)),
        hash_fn=options.get("hash_fn", "md5"),
        index_sig_col=options.get("index_sig_col", "minhash"),
    )


def _op_nb_fit(spark, inp, options):
    from .selection import nb_fit

    return nb_fit(
        inp,
        label_col=options.get("label_col", "label"),
        text_col=options.get("text_col", "text"),
        buckets=int(options.get("buckets", 10_000)),
    )


def _op_nb_classify(spark, inp, options):
    from .selection import nb_classify

    model_table = options.get("model")
    if not model_table:
        raise OperatorError(
            "nb_classify operator requires options.model (a (label, "
            "bucket, c) table, e.g. an nb_fit stage)"
        )
    bkts = options.get("buckets")
    return nb_classify(
        inp,
        spark.table(model_table),
        text_col=options.get("text_col", "text"),
        id_col=options.get("id_col", "doc_id"),
        smoothing=float(options.get("smoothing", 1.0)),
        # None (the default) reads the model's own metadata row
        buckets=None if bkts is None else int(bkts),
        all_scores=bool(options.get("all_scores", False)),
        cache_model=bool(options.get("cache_model", True)),
    )


def _op_corpus_overlap(spark, inp, options):
    from .sketch import corpus_overlap

    other = options.get("other")
    if not other:
        raise OperatorError(
            "corpus_overlap operator requires options.other (the second "
            "corpus table to estimate overlap against)"
        )
    return corpus_overlap(
        inp,
        spark.table(other),
        value_col=options.get("value_col", "doc_id"),
        value_col_b=options.get("value_col_b"),
        k=int(options.get("k", 256)),
        buckets=int(options.get("buckets", 64)),
        hash_fn=options.get("hash_fn", "md5"),
    )


def _op_hamming_filter(spark, inp, options):
    from .dedup import hamming_filter

    index_table = options.get("index")
    if not index_table:
        raise OperatorError(
            "hamming_filter operator requires options.index (a table of "
            "signatures to reject near-duplicates of)"
        )
    return hamming_filter(
        inp,
        spark.table(index_table),
        sig_col=options.get("sig_col", "simhash"),
        index_sig_col=options.get("index_sig_col"),
        max_hamming=int(options.get("max_hamming", 3)),
        sig_bits=int(options.get("sig_bits", 60)),
    )


def _op_perceptual_hash(spark, inp, options):
    from .multimodal import perceptual_hash

    grid = options.get("grid")
    return perceptual_hash(
        inp,
        payload_col=options.get("payload_col", "payload"),
        id_col=options.get("id_col", "doc_id"),
        codec=options.get("codec"),
        grid=tuple(int(x) for x in grid) if grid else (7, 8),
        on_undecodable=options.get("on_undecodable", "fail"),
    )


def _op_embed_neardup(spark, inp, options):
    from .dedup import embedding_near_duplicates

    return embedding_near_duplicates(
        inp,
        id_col=options.get("id_col", "vec_id"),
        vec_col=options.get("vec_col", "embedding"),
        threshold=float(options.get("threshold", 0.8)),
    )


def _op_embed_neardup_lsh(spark, inp, options):
    from .dedup import embedding_near_duplicates_lsh

    return embedding_near_duplicates_lsh(
        inp,
        id_col=options.get("id_col", "vec_id"),
        vec_col=options.get("vec_col", "embedding"),
        threshold=float(options.get("threshold", 0.8)),
        # "auto" passes through: bits/tables then solve from the corpus
        # count (solve_lsh_params) instead of fixed widths
        num_tables=(
            "auto"
            if options.get("num_tables") == "auto"
            else int(options.get("num_tables", 64))
        ),
        bits_per_table=(
            "auto"
            if options.get("bits_per_table") == "auto"
            else int(options.get("bits_per_table", 10))
        ),
        seed=int(options.get("seed", 42)),
        max_bucket_size=(
            int(options["max_bucket_size"])
            if options.get("max_bucket_size") is not None
            else 10_000
        ),
        target_miss=float(options.get("target_miss", 1e-3)),
        candidates_per_row=int(options.get("candidates_per_row", 128)),
        max_tables=int(options.get("max_tables", 512)),
    )


def _op_quality_score(spark, inp, options):
    from .text import quality_score

    return quality_score(
        inp, options.get("text_col", "text"), options.get("id_col", "doc_id")
    )


def _op_text_features(spark, inp, options):
    from .text import text_features

    return text_features(
        inp, options.get("text_col", "text"), options.get("id_col", "doc_id")
    )


def _op_langid(spark, inp, options):
    from .text import detect_language

    return detect_language(
        inp, options.get("text_col", "text"), options.get("id_col", "doc_id")
    )


def _op_fingerprint(spark, inp, options):
    from .text import fingerprint

    id_col = options.get("id_col", "doc_id")
    text_col = options.get("text_col", "text")
    return inp.select(F.col(id_col), fingerprint(F.col(text_col)).alias("fp"))


def _op_token_count(spark, inp, options):
    from .text import token_count

    id_col = options.get("id_col", "doc_id")
    text_col = options.get("text_col", "text")
    return inp.select(
        F.col(id_col), token_count(F.col(text_col)).cast("bigint").alias("n_tokens")
    )


def _op_topk(spark, inp, options):
    from .similarity import brute_force_topk

    queries_table = options.get("queries")
    if not queries_table:
        raise OperatorError("topk operator requires options.queries (a table name)")
    return brute_force_topk(
        inp,
        spark.table(queries_table),
        k=int(options.get("k", 10)),
        id_col=options.get("id_col", "vec_id"),
        vec_col=options.get("vec_col", "embedding"),
        query_id_col=options.get("query_id_col", "query_id"),
    )


def _op_quantized_topk(spark, inp, options):
    from .similarity import quantized_topk

    queries_table = options.get("queries")
    if not queries_table:
        raise OperatorError(
            "quantized_topk operator requires options.queries (a table name)"
        )
    return quantized_topk(
        inp,
        spark.table(queries_table),
        k=int(options.get("k", 10)),
        id_col=options.get("id_col", "vec_id"),
        vec_col=options.get("vec_col", "embedding"),
        query_id_col=options.get("query_id_col", "query_id"),
    )


def _op_pq_topk(spark, inp, options):
    from .similarity import pq_topk, train_pq

    queries_table = options.get("queries")
    if not queries_table:
        raise OperatorError(
            "pq_topk operator requires options.queries (a table name)"
        )
    vec_col = options.get("vec_col", "embedding")
    codebooks = options.get("codebooks")
    if codebooks is None:
        codebooks = train_pq(
            inp,
            vec_col=vec_col,
            n_subspaces=int(options.get("n_subspaces", 8)),
            n_centroids=int(options.get("n_centroids", 16)),
            sample_size=int(options.get("sample_size", 4096)),
            seed=int(options.get("seed", 42)),
        )
    rerank = options.get("rerank")
    return pq_topk(
        inp,
        spark.table(queries_table),
        codebooks,
        k=int(options.get("k", 10)),
        id_col=options.get("id_col", "vec_id"),
        vec_col=vec_col,
        query_id_col=options.get("query_id_col", "query_id"),
        code_col=options.get("code_col"),
        # "auto" passes through: rerank then scales with the corpus
        # count (a fixed depth thins out as density grows)
        rerank=(
            None if rerank is None
            else "auto" if rerank == "auto"
            else int(rerank)
        ),
        rerank_frac=float(options.get("rerank_frac", 0.05)),
        max_rerank=int(options.get("max_rerank", 10_000)),
    )


def _op_ivfpq_topk(spark, inp, options):
    from .similarity import ivfpq_topk

    queries_table = options.get("queries")
    if not queries_table:
        raise OperatorError(
            "ivfpq_topk operator requires options.queries (a table name)"
        )
    rerank = options.get("rerank")
    return ivfpq_topk(
        inp,
        spark.table(queries_table),
        k=int(options.get("k", 10)),
        # "auto" passes through: sqrt(n) coarse-quantizer sizing
        n_centroids=(
            "auto"
            if options.get("n_centroids") == "auto"
            else int(options.get("n_centroids", 16))
        ),
        nprobe=(
            "auto"
            if options.get("nprobe") == "auto"
            else int(options.get("nprobe", 4))
        ),
        n_subspaces=int(options.get("n_subspaces", 8)),
        n_pq_centroids=int(options.get("n_pq_centroids", 16)),
        rerank=None if rerank is None else int(rerank),
        seed=int(options.get("seed", 42)),
        id_col=options.get("id_col", "vec_id"),
        vec_col=options.get("vec_col", "embedding"),
        query_id_col=options.get("query_id_col", "query_id"),
        by_residual=bool(options.get("by_residual", False)),
    )


def _op_pq_encode(spark, inp, options):
    from .similarity import pq_encode, train_pq

    vec_col = options.get("vec_col", "embedding")
    codebooks = options.get("codebooks")
    if codebooks is None:
        codebooks = train_pq(
            inp,
            vec_col=vec_col,
            n_subspaces=int(options.get("n_subspaces", 8)),
            n_centroids=int(options.get("n_centroids", 16)),
            sample_size=int(options.get("sample_size", 4096)),
            seed=int(options.get("seed", 42)),
        )
    return pq_encode(
        inp, codebooks, vec_col=vec_col, out_col=options.get("out_col", "pq_code")
    )


def _op_oov_rate(spark, inp, options):
    from .text import oov_rate

    vocab_table = options.get("vocab")
    if not vocab_table:
        raise OperatorError(
            "oov_rate operator requires options.vocab (a table name)"
        )
    return oov_rate(
        inp,
        spark.table(vocab_table),
        text_col=options.get("text_col", "text"),
        id_col=options.get("id_col", "doc_id"),
        vocab_col=options.get("vocab_col", "token"),
    )


def _op_normalize_text(spark, inp, options):
    from .text import normalize_text

    return normalize_text(
        inp,
        text_col=options.get("text_col", "text"),
        out_col=options.get("out_col", "norm_text"),
        lower=_bool_opt(options, "lower", True),
        fold_diacritics=_bool_opt(options, "fold_diacritics", True),
        strip_punct=_bool_opt(options, "strip_punct", False),
        collapse_whitespace=_bool_opt(options, "collapse_whitespace", True),
    )


def _op_lsh_topk(spark, inp, options):
    from .similarity import lsh_topk

    queries_table = options.get("queries")
    if not queries_table:
        raise OperatorError("lsh_topk operator requires options.queries (a table name)")
    return lsh_topk(
        inp,
        spark.table(queries_table),
        k=int(options.get("k", 10)),
        num_planes=int(options.get("num_planes", 8)),
        seed=int(options.get("seed", 42)),
        id_col=options.get("id_col", "vec_id"),
        vec_col=options.get("vec_col", "embedding"),
        query_id_col=options.get("query_id_col", "query_id"),
        multiprobe=int(options.get("multiprobe", 0)),
    )


def _op_ivf_topk(spark, inp, options):
    from .similarity import ivf_topk

    queries_table = options.get("queries")
    if not queries_table:
        raise OperatorError("ivf_topk operator requires options.queries (a table name)")
    return ivf_topk(
        inp,
        spark.table(queries_table),
        k=int(options.get("k", 10)),
        # "auto" passes through: sqrt(n) coarse-quantizer sizing
        n_centroids=(
            "auto"
            if options.get("n_centroids") == "auto"
            else int(options.get("n_centroids", 16))
        ),
        nprobe=(
            "auto"
            if options.get("nprobe") == "auto"
            else int(options.get("nprobe", 4))
        ),
        seed=int(options.get("seed", 42)),
        id_col=options.get("id_col", "vec_id"),
        vec_col=options.get("vec_col", "embedding"),
        query_id_col=options.get("query_id_col", "query_id"),
    )


def _op_hash_sample(spark, inp, options):
    from .sampling import hash_sample

    return hash_sample(
        inp,
        options.get("id_col", "doc_id"),
        float(options["rate"]),
        salt=options.get("salt", ""),
        hash_fn=options.get("hash_fn", "md5"),
    )


def _op_weighted_sample(spark, inp, options):
    from .sampling import weighted_sample

    return weighted_sample(
        inp,
        options.get("id_col", "doc_id"),
        options.get("weight_col", "dup_weight"),
        salt=options.get("salt", ""),
        hash_fn=options.get("hash_fn", "md5"),
    )


def _op_stratified_sample(spark, inp, options):
    from .sampling import stratified_sample

    return stratified_sample(
        inp,
        options.get("id_col", "doc_id"),
        options["stratum_col"],
        {str(k): float(v) for k, v in options.get("rates", {}).items()},
        default_rate=float(options.get("default_rate", 0.0)),
        salt=options.get("salt", ""),
        hash_fn=options.get("hash_fn", "md5"),
    )


def _op_split(spark, inp, options):
    from .sampling import deterministic_split

    return deterministic_split(
        inp,
        options.get("id_col", "doc_id"),
        {str(k): float(v) for k, v in options["weights"].items()},
        out_col=options.get("out_col", "split"),
        salt=options.get("salt", "split"),
        hash_fn=options.get("hash_fn", "md5"),
    )


def _op_connected_components(spark, inp, options):
    from .cluster import connected_components

    return connected_components(
        inp,
        src=options.get("src", "id_a"),
        dst=options.get("dst", "id_b"),
        max_iter=int(options.get("max_iter", 50)),
        driver_edges=int(options.get("driver_edges", 1_000_000)),
    )


def _op_cluster_dedup(spark, inp, options):
    from .cluster import cluster_dedup

    pairs_table = options.get("pairs")
    if not pairs_table:
        raise OperatorError("cluster_dedup operator requires options.pairs (a table name)")
    return cluster_dedup(
        inp,
        spark.table(pairs_table),
        id_col=options.get("id_col", "doc_id"),
        src=options.get("src", "id_a"),
        dst=options.get("dst", "id_b"),
        keep_by=options.get("keep_by"),
        descending=_bool_opt(options, "descending", True),
    )


def _op_vocabulary(spark, inp, options):
    from .text import vocabulary

    return vocabulary(
        inp,
        text_col=options.get("text_col", "text"),
        top_n=int(options.get("top_n", 1000)),
    )


def _op_tfidf(spark, inp, options):
    from .text import tfidf_top_terms

    return tfidf_top_terms(
        inp,
        text_col=options.get("text_col", "text"),
        id_col=options.get("id_col", "doc_id"),
        top_n=int(options.get("top_n", 5)),
    )


def _op_rrf_fuse(spark, inp, options):
    from .similarity import rrf_fuse

    others = options.get("others")
    if not others:
        raise OperatorError(
            "rrf_fuse operator requires options.others (table names of the "
            "additional ranked lists to fuse with the stage input)"
        )
    if isinstance(others, str):
        others = [others]
    return rrf_fuse(
        [inp] + [spark.table(t) for t in others],
        id_col=options.get("id_col", "vec_id"),
        rank_col=options.get("rank_col", "rank"),
        k=int(options.get("k", 60)),
        query_col=options.get("query_col"),
    )


def _op_gopher_rules(spark, inp, options):
    from .text import gopher_rules

    kw = {}
    for opt, conv in (
        ("min_words", int), ("max_words", int),
        ("min_mean_word_len", float), ("max_mean_word_len", float),
        ("max_symbol_word_ratio", float),
        ("max_bullet_line_frac", float), ("max_ellipsis_line_frac", float),
        ("min_alpha_word_frac", float), ("min_stop_hits", int),
    ):
        if opt in options:
            kw[opt] = conv(options[opt])
    return gopher_rules(
        inp,
        text_col=options.get("text_col", "text"),
        id_col=options.get("id_col", "doc_id"),
        **kw,
    )


def _op_fineweb_rules(spark, inp, options):
    from .text import fineweb_rules

    kw = {}
    for opt, conv in (
        ("min_line_punct_frac", float), ("max_short_line_frac", float),
        ("short_line_chars", int), ("max_dup_line_char_frac", float),
        ("max_newline_word_ratio", float),
    ):
        if opt in options:
            kw[opt] = conv(options[opt])
    return fineweb_rules(
        inp,
        text_col=options.get("text_col", "text"),
        id_col=options.get("id_col", "doc_id"),
        **kw,
    )


def _op_c4_rules(spark, inp, options):
    from .text import c4_rules

    kw = {}
    for opt, conv in (
        ("min_line_words", int), ("min_sentences", int),
    ):
        if opt in options:
            kw[opt] = conv(options[opt])
    if "bad_words" in options:
        kw["bad_words"] = [str(w) for w in options["bad_words"]]
    return c4_rules(
        inp,
        text_col=options.get("text_col", "text"),
        id_col=options.get("id_col", "doc_id"),
        require_line_terminal_punct=_bool_opt(
            options, "require_line_terminal_punct", True
        ),
        **kw,
    )


def _op_hybrid_topk(spark, inp, options):
    from .similarity import hybrid_topk

    vectors = options.get("vectors")
    if not vectors:
        raise OperatorError(
            "hybrid_topk operator requires options.vectors (the embedding "
            "table name; the stage input is the TEXT corpus)"
        )
    terms = options.get("query_terms")
    if not terms or not isinstance(terms, list):
        raise OperatorError(
            "hybrid_topk operator requires options.query_terms "
            "(a list of terms)"
        )
    qvec = options.get("query_vec")
    if not qvec or not isinstance(qvec, list):
        raise OperatorError(
            "hybrid_topk operator requires options.query_vec "
            "(the query embedding as a list of floats)"
        )
    return hybrid_topk(
        inp,
        spark.table(vectors),
        [str(t) for t in terms],
        [float(x) for x in qvec],
        k=int(options.get("k", 10)),
        lexical_k=int(options.get("lexical_k", 100)),
        vector_k=int(options.get("vector_k", 100)),
        rrf_k=int(options.get("rrf_k", 60)),
        text_col=options.get("text_col", "text"),
        id_col=options.get("id_col", "doc_id"),
        vec_col=options.get("vec_col", "embedding"),
        vec_id_col=options.get("vec_id_col", "vec_id"),
        k1=float(options.get("k1", 1.2)),
        b=float(options.get("b", 0.75)),
    )


def _op_bm25(spark, inp, options):
    from .text import bm25_scores

    terms = options.get("query_terms")
    if not terms:
        raise OperatorError(
            "bm25 operator requires options.query_terms (a list of terms)"
        )
    if isinstance(terms, str):
        terms = terms.split()
    return bm25_scores(
        inp,
        list(terms),
        text_col=options.get("text_col", "text"),
        id_col=options.get("id_col", "doc_id"),
        k1=float(options.get("k1", 1.2)),
        b=float(options.get("b", 0.75)),
    )


def _op_salted_join(spark, inp, options):
    from .skew import salted_join

    right_table = options.get("right")
    if not right_table:
        raise OperatorError("salted_join operator requires options.right (a table name)")
    # YAML 1.1 parses a bare `on:` mapping key as boolean True — accept
    # `key` (canonical), `on`, or that parsed-boolean form
    join_key = options.get("key") or options.get("on") or options.get(True)
    if not join_key:
        raise OperatorError("salted_join operator requires options.key (join column)")
    return salted_join(
        inp,
        spark.table(right_table),
        on=join_key,
        how=options.get("how", "inner"),
        salt_buckets=int(options.get("salt_buckets", 16)),
        seed_col=options.get("seed_col"),
        # hot-key-only salting: profile the big side, salt only keys
        # above this row share (small-side replication bounded)
        hot_share=(
            float(options["hot_share"])
            if options.get("hot_share") is not None
            else None
        ),
        max_hot_keys=int(options.get("max_hot_keys", 1000)),
    )


def _op_asof_join(spark, inp, options):
    from .temporal import asof_join

    right_table = options.get("right")
    if not right_table:
        raise OperatorError("asof_join operator requires options.right (a table name)")
    keys = options.get("key") or options.get("on") or options.get(True)
    if not keys:
        raise OperatorError("asof_join operator requires options.key (join column(s))")
    if isinstance(keys, str):
        keys = [keys]
    value_cols = options.get("value_cols")
    if not value_cols:
        raise OperatorError("asof_join operator requires options.value_cols")
    tol = options.get("tolerance_seconds")
    return asof_join(
        inp,
        spark.table(right_table),
        on=keys,
        left_ts=options.get("left_ts", "ts"),
        right_ts=options.get("right_ts", "ts"),
        value_cols=value_cols,
        tolerance_seconds=float(tol) if tol is not None else None,
        direction=options.get("direction", "backward"),
    )


def _op_range_join(spark, inp, options):
    from .temporal import range_join

    right_table = options.get("right")
    if not right_table:
        raise OperatorError("range_join operator requires options.right (a table name)")
    if "lower_seconds" not in options or "upper_seconds" not in options:
        raise OperatorError(
            "range_join operator requires options.lower_seconds and options.upper_seconds"
        )
    keys = options.get("key") or options.get("on") or options.get(True) or []
    if isinstance(keys, str):
        keys = [keys]
    return range_join(
        inp,
        spark.table(right_table),
        left_ts=options.get("left_ts", "ts"),
        right_ts=options.get("right_ts", "ts"),
        lower_seconds=float(options["lower_seconds"]),
        upper_seconds=float(options["upper_seconds"]),
        on=keys,
    )


def _op_time_rollup(spark, inp, options):
    from .temporal import time_rollup

    if "value_col" not in options:
        raise OperatorError("time_rollup operator requires options.value_col")
    return time_rollup(
        inp,
        ts_col=options.get("ts_col", "ts"),
        value_col=options["value_col"],
        granularities=options.get("granularities", ["hour", "day", "month"]),
        group_cols=options.get("group_cols", []),
        value_decimal=options.get("value_decimal", "decimal(38,9)"),
    )


def _op_dd_sketch(spark, inp, options):
    from .sketch import dd_sketch

    if "value_col" not in options:
        raise OperatorError("dd_sketch operator requires options.value_col")
    return dd_sketch(
        inp,
        group_cols=options.get("group_cols", []),
        value_col=options["value_col"],
        gamma=float(options.get("gamma", 1.02)),
    )


def _op_dd_quantiles(spark, inp, options):
    from .sketch import dd_quantile, dd_sketch

    if "value_col" not in options:
        raise OperatorError("dd_quantiles operator requires options.value_col")
    grp = options.get("group_cols", [])
    gamma = float(options.get("gamma", 1.02))
    sk = dd_sketch(inp, grp, options["value_col"], gamma=gamma)
    return dd_quantile(
        sk,
        grp,
        [float(q) for q in options.get("quantiles", [0.5, 0.95, 0.99])],
        gamma=gamma,
    )


def _op_kmv_distinct(spark, inp, options):
    from .sketch import kmv_distinct

    if "value_col" not in options:
        raise OperatorError("kmv_distinct operator requires options.value_col")
    return kmv_distinct(
        inp,
        group_cols=options.get("group_cols", []),
        value_col=options["value_col"],
        k=int(options.get("k", 64)),
        buckets=int(options.get("buckets", 64)),
        hash_fn=options.get("hash_fn", "md5"),
    )


def _op_hll_distinct(spark, inp, options):
    from .sketch import hll_distinct

    if "value_col" not in options:
        raise OperatorError("hll_distinct operator requires options.value_col")
    return hll_distinct(
        inp,
        group_cols=options.get("group_cols", []),
        value_col=options["value_col"],
        m=int(options.get("m", 64)),
        hash_fn=options.get("hash_fn", "md5"),
    )


def _op_weighted_mix(spark, inp, options):
    from .mixing import weighted_mix

    for req in ("group_col", "id_col", "weights"):
        if req not in options:
            raise OperatorError(f"weighted_mix operator requires options.{req}")
    return weighted_mix(
        inp,
        group_col=options["group_col"],
        id_col=options["id_col"],
        weights={str(k): float(v) for k, v in dict(options["weights"]).items()},
        default_weight=float(options.get("default_weight", 1.0)),
        copy_col=options.get("copy_col", "mix_copy"),
        hash_fn=options.get("hash_fn", "md5"),
    )


def _op_temperature_mix(spark, inp, options):
    from .mixing import temperature_mix

    return temperature_mix(
        inp,
        group_col=options.get("group_col", "source"),
        id_col=options.get("id_col", "doc_id"),
        alpha=float(options.get("alpha", 0.3)),
        target_total=(
            float(options["target_total"])
            if options.get("target_total") is not None
            else None
        ),
        copy_col=options.get("copy_col", "mix_copy"),
        hash_fn=options.get("hash_fn", "md5"),
    )


def _op_token_budget_mix(spark, inp, options):
    from .mixing import token_budget_mix

    for req in ("group_col", "id_col", "token_col", "budget", "shares"):
        if req not in options:
            raise OperatorError(
                f"token_budget_mix operator requires options.{req}"
            )
    return token_budget_mix(
        inp,
        group_col=options["group_col"],
        id_col=options["id_col"],
        token_col=options["token_col"],
        budget=float(options["budget"]),
        shares={str(k): float(v) for k, v in dict(options["shares"]).items()},
        copy_col=options.get("copy_col", "mix_copy"),
        max_groups=int(options.get("max_groups", 1000)),
        hash_fn=options.get("hash_fn", "md5"),
    )


def _op_corpus_diff(spark, inp, options):
    from .profile import corpus_diff

    if "old_table" not in options:
        raise OperatorError(
            "corpus_diff operator requires options.old_table (the "
            "registered name of the previous corpus version; the stage "
            "input is the NEW version)"
        )
    return corpus_diff(
        spark.table(options["old_table"]),
        inp,
        id_col=options.get("id_col", "doc_id"),
        content_cols=options.get("content_cols"),
        summary=_bool_opt(options, "summary", False),
    )


def _op_pack_shards(spark, inp, options):
    from .mixing import pack_shards

    for req in ("token_col", "order_col", "budget"):
        if req not in options:
            raise OperatorError(f"pack_shards operator requires options.{req}")
    return pack_shards(
        inp,
        token_col=options["token_col"],
        order_col=options["order_col"],
        budget=int(options["budget"]),
        parts=int(options.get("parts", 64)),
        tiebreak_cols=options.get("tiebreak_cols", ()),
    )


def _op_shuffle_corpus(spark, inp, options):
    from .mixing import shuffle_corpus

    n_shards = options.get("n_shards")
    return shuffle_corpus(
        inp,
        id_col=options.get("id_col", "doc_id"),
        seed=str(options.get("seed", "")),
        n_shards=int(n_shards) if n_shards is not None else None,
        key_col=options.get("key_col", "shuffle_key"),
        shard_col=options.get("shard_col", "shard_id"),
        hash_fn=options.get("hash_fn", "md5"),
    )


def _op_corpus_offsets(spark, inp, options):
    from .mixing import corpus_offsets

    order_cols = options.get("order_cols", ["shuffle_key", "doc_id"])
    if isinstance(order_cols, str):
        order_cols = [c.strip() for c in order_cols.split(",") if c.strip()]
    kwargs = {}
    if "max_shards" in options:
        kwargs["max_shards"] = int(options["max_shards"])
    return corpus_offsets(
        inp,
        order_cols,
        shard_col=options.get("shard_col"),
        token_col=options.get("token_col"),
        pos_col=options.get("pos_col", "global_pos"),
        offset_col=options.get("offset_col", "token_start"),
        **kwargs,
    )


def _op_luhn_cards(spark, inp, options):
    from .text import luhn_cards

    keep = options.get("keep_cols")
    if isinstance(keep, str):
        keep = [c.strip() for c in keep.split(",") if c.strip()]
    return luhn_cards(
        inp,
        text_col=options.get("text_col", "text"),
        id_col=options.get("id_col", "doc_id"),
        tag=options.get("tag", "[CARD]"),
        keep_cols=keep,
    )


def _bpe_stage_args(options):
    """Shared byte_level/end_marker option handling for the BPE stages:
    ``byte_level: true`` defaults the marker to none (byte-level BPE
    has no word-end marker) — an EXPLICIT non-null end_marker alongside
    byte_level still reaches the operator and raises its loud error."""
    byte_level = bool(options.get("byte_level", False))
    default_marker = None if byte_level else "</w>"
    end_marker = options.get("end_marker", default_marker)
    if end_marker in ("", None, "none", "null"):
        end_marker = None
    return byte_level, end_marker


def _op_bpe_pairs(spark, inp, options):
    from .text import bpe_pair_counts

    merges = options.get("merges") or []
    byte_level, end_marker = _bpe_stage_args(options)
    return bpe_pair_counts(
        inp,
        text_col=options.get("text_col", "text"),
        merges=[tuple(m) for m in merges],
        end_marker=end_marker,
        min_count=int(options.get("min_count", 1)),
        byte_level=byte_level,
    )


def _op_bpe_encode(spark, inp, options):
    from .text import bpe_encode

    keep = options.get("keep_cols")
    byte_level, end_marker = _bpe_stage_args(options)
    return bpe_encode(
        inp,
        merges=[tuple(m) for m in (options.get("merges") or [])],
        text_col=options.get("text_col", "text"),
        id_col=options.get("id_col", "doc_id"),
        keep_cols=list(keep) if keep else None,
        end_marker=end_marker,
        method=options.get("method", "auto"),
        byte_level=byte_level,
    )


def _op_bpe_vocab(spark, inp, options):
    from .text import bpe_vocab

    byte_level, end_marker = _bpe_stage_args(options)
    return bpe_vocab(
        inp,
        merges=[tuple(m) for m in (options.get("merges") or [])],
        text_col=options.get("text_col", "text"),
        end_marker=end_marker,
        byte_level=byte_level,
    )


def _op_tokens_to_ids(spark, inp, options):
    from .text import tokens_to_ids

    vocab_table = options.get("vocab")
    if not vocab_table:
        raise OperatorError(
            "tokens_to_ids operator requires options.vocab (a (token, "
            "token_id) table, e.g. a bpe_vocab stage)"
        )
    keep = options.get("keep_cols")
    unk = options.get("unk_id")
    return tokens_to_ids(
        inp,
        spark.table(vocab_table),
        tokens_col=options.get("tokens_col", "tokens"),
        id_col=options.get("id_col", "doc_id"),
        keep_cols=list(keep) if keep else None,
        out_col=options.get("out_col", "token_ids"),
        unk_id=None if unk is None else int(unk),
        method=options.get("method", "auto"),
    )


def _op_sequence_spans(spark, inp, options):
    from .mixing import sequence_spans

    order_cols = options.get("order_cols", ["shuffle_key", "doc_id"])
    if isinstance(order_cols, str):
        order_cols = [c.strip() for c in order_cols.split(",") if c.strip()]
    kwargs = {}
    if "max_shards" in options:
        kwargs["max_shards"] = int(options["max_shards"])
    if "seq_len" not in options:
        raise OperatorError(
            "sequence_spans operator requires options.seq_len "
            "(the packed sequence length in tokens)"
        )
    return sequence_spans(
        inp,
        int(options["seq_len"]),
        order_cols,
        token_col=options.get("token_col", "n_tokens"),
        shard_col=options.get("shard_col"),
        **kwargs,
    )


def _op_tokenizer_fertility(spark, inp, options):
    from .text import tokenizer_fertility

    byte_level, end_marker = _bpe_stage_args(options)
    return tokenizer_fertility(
        inp,
        merges=[tuple(m) for m in (options.get("merges") or [])],
        text_col=options.get("text_col", "text"),
        id_col=options.get("id_col", "doc_id"),
        group_col=options.get("group_col"),
        end_marker=end_marker,
        method=options.get("method", "auto"),
        byte_level=byte_level,
    )


def _op_contamination_report(spark, inp, options):
    from .decontam import contamination_report

    if "benchmark" not in options:
        raise OperatorError(
            "contamination_report operator requires options.benchmark "
            "(the registered benchmark table name)"
        )
    bench = spark.table(options["benchmark"])
    return contamination_report(
        inp,
        bench,
        text_col=options.get("text_col", "text"),
        id_col=options.get("id_col", "doc_id"),
        bench_id_col=options.get("bench_id_col", "doc_id"),
        bench_text_col=options.get("bench_text_col"),
        n=int(options.get("n", 13)),
        min_dirty_grams=int(options.get("min_dirty_grams", 1)),
    )


def _op_shard_manifest(spark, inp, options):
    from .mixing import shard_manifest

    return shard_manifest(
        inp,
        shard_col=options.get("shard_col", "shard_id"),
        id_col=options.get("id_col", "doc_id"),
        token_col=options.get("token_col"),
        hash_fn=options.get("hash_fn", "md5"),
    )


def _op_corpus_datacard(spark, inp, options):
    from .profile import corpus_datacard

    lang = options.get("lang_col", "lang")
    if lang in ("", None, "none", "null"):
        lang = None
    return corpus_datacard(
        inp,
        group_col=options.get("group_col", "source"),
        text_col=options.get("text_col", "text"),
        lang_col=lang,
    )


def _op_skew_profile(spark, inp, options):
    from .skew import key_skew_profile

    return key_skew_profile(inp, options["key"], top=int(options.get("top", 10)))


def _op_repetition(spark, inp, options):
    from .text import repetition_features

    return repetition_features(
        inp,
        text_col=options.get("text_col", "text"),
        id_col=options.get("id_col", "doc_id"),
        n=int(options.get("n", 2)),
    )


def _op_drop_common_lines(spark, inp, options):
    from .dedup import drop_common_lines

    return drop_common_lines(
        inp,
        text_col=options.get("text_col", "text"),
        id_col=options.get("id_col", "doc_id"),
        max_docs=int(options.get("max_docs", 2)),
        sep=options.get("sep", "\n"),
    )


def _op_strip_markup(spark, inp, options):
    from .text import strip_markup

    return strip_markup(
        inp,
        text_col=options.get("text_col", "text"),
        id_col=options.get("id_col", "doc_id"),
        keep_cols=options.get("keep_cols"),
    )


def _op_redact_pii(spark, inp, options):
    from .text import redact_pii

    return redact_pii(
        inp,
        text_col=options.get("text_col", "text"),
        id_col=options.get("id_col", "doc_id"),
        patterns=options.get("patterns"),
        keep_cols=options.get("keep_cols"),
    )


def _op_stratified_fixed_n(spark, inp, options):
    from .sampling import stratified_fixed_n

    for req in ("stratum_col", "n_per_stratum"):
        if req not in options:
            raise OperatorError(f"stratified_fixed_n operator requires options.{req}")
    return stratified_fixed_n(
        inp,
        options.get("id_col", "doc_id"),
        options["stratum_col"],
        int(options["n_per_stratum"]),
        salt=options.get("salt", ""),
        hash_fn=options.get("hash_fn", "md5"),
    )


def _op_group_cap(spark, inp, options):
    from .sampling import group_cap

    for req in ("group_cols", "order_col", "n"):
        if req not in options:
            raise OperatorError(f"group_cap operator requires options.{req}")
    groups = options["group_cols"]
    return group_cap(
        inp,
        [groups] if isinstance(groups, str) else list(groups),
        options["order_col"],
        int(options["n"]),
        descending=_bool_opt(options, "descending", True),
        tiebreak_col=options.get("tiebreak_col"),
    )


def _op_chunk_documents(spark, inp, options):
    from .text import chunk_documents

    return chunk_documents(
        inp,
        text_col=options.get("text_col", "text"),
        id_col=options.get("id_col", "doc_id"),
        chunk_tokens=int(options.get("chunk_tokens", 64)),
        overlap=int(options.get("overlap", 8)),
    )


def _op_ngram_overlap(spark, inp, options):
    from .decontam import ngram_overlap

    bench_table = options.get("benchmark")
    if not bench_table:
        raise OperatorError("ngram_overlap operator requires options.benchmark (a table name)")
    return ngram_overlap(
        inp,
        spark.table(bench_table),
        text_col=options.get("text_col", "text"),
        id_col=options.get("id_col", "doc_id"),
        n=int(options.get("n", 13)),
    )


def _op_decontaminate(spark, inp, options):
    from .decontam import decontaminate

    bench_table = options.get("benchmark")
    if not bench_table:
        raise OperatorError("decontaminate operator requires options.benchmark (a table name)")
    return decontaminate(
        inp,
        spark.table(bench_table),
        text_col=options.get("text_col", "text"),
        id_col=options.get("id_col", "doc_id"),
        n=int(options.get("n", 13)),
        threshold=int(options.get("threshold", 1)),
    )


def _op_bigram_logprob(spark, inp, options):
    from .text import bigram_logprob

    return bigram_logprob(inp, **_docs_args(options))


def _op_dedup_against(spark, inp, options):
    from .dedup import dedup_against

    corpus_table = options.get("corpus")
    if not corpus_table:
        raise OperatorError(
            "dedup_against operator requires options.corpus (a table name)"
        )
    return dedup_against(
        inp,
        spark.table(corpus_table),
        cols=options.get("columns", ["text"]),
        broadcast_corpus=_bool_opt(options, "broadcast_corpus", False),
        hash_fn=options.get("hash_fn", "md5"),
    )


def _op_fuzzy_decontaminate(spark, inp, options):
    from .decontam import fuzzy_decontaminate

    bench_table = options.get("benchmark")
    if not bench_table:
        raise OperatorError(
            "fuzzy_decontaminate operator requires options.benchmark "
            "(a table name)"
        )
    return fuzzy_decontaminate(
        inp,
        spark.table(bench_table),
        id_col=options.get("id_col", "doc_id"),
        bench_id_col=options.get("bench_id_col", "doc_id"),
        text_col=options.get("text_col", "text"),
        bench_text_col=options.get("bench_text_col"),
        num_hashes=int(options.get("num_hashes", 16)),
        bands=int(options.get("bands", 4)),
        shingle_n=int(options.get("shingle_n", 3)),
        threshold=float(options.get("threshold", 0.8)),
        hash_fn=options.get("hash_fn", "md5"),
        validate_ids=bool(options.get("validate_ids", False)),
    )


def _op_fuzzy_decontam_rowwise(spark, inp, options):
    from .decontam import fuzzy_decontaminate_rowwise

    bench_table = options.get("benchmark")
    if not bench_table:
        raise OperatorError(
            "fuzzy_decontam_rowwise operator requires options.benchmark "
            "(a table name)"
        )
    return fuzzy_decontaminate_rowwise(
        inp,
        spark.table(bench_table),
        text_col=options.get("text_col", "text"),
        bench_text_col=options.get("bench_text_col"),
        num_hashes=int(options.get("num_hashes", 16)),
        bands=int(options.get("bands", 4)),
        shingle_n=int(options.get("shingle_n", 3)),
        threshold=float(options.get("threshold", 0.8)),
        hash_fn=options.get("hash_fn", "md5"),
    )


def _op_minhash_overlap(spark, inp, options):
    from .decontam import minhash_overlap

    bench_table = options.get("benchmark")
    if not bench_table:
        raise OperatorError(
            "minhash_overlap operator requires options.benchmark "
            "(a table name)"
        )
    return minhash_overlap(
        inp,
        spark.table(bench_table),
        id_col=options.get("id_col", "doc_id"),
        bench_id_col=options.get("bench_id_col", "doc_id"),
        text_col=options.get("text_col", "text"),
        bench_text_col=options.get("bench_text_col"),
        num_hashes=int(options.get("num_hashes", 16)),
        bands=int(options.get("bands", 4)),
        shingle_n=int(options.get("shingle_n", 3)),
        threshold=float(options.get("threshold", 0.8)),
        hash_fn=options.get("hash_fn", "md5"),
        validate_ids=_bool_opt(options, "validate_ids", False),
    )


def _op_cms_sketch(spark, inp, options):
    from .sketch import cms_sketch

    if "value_col" not in options:
        raise OperatorError("cms_sketch operator requires options.value_col")
    return cms_sketch(
        inp,
        group_cols=options.get("group_cols", []),
        value_col=options["value_col"],
        width=int(options.get("width", 1024)),
        depth=int(options.get("depth", 3)),
        hash_fn=options.get("hash_fn", "md5"),
    )


def _op_cms_freq(spark, inp, options):
    from .sketch import cms_estimate, cms_sketch

    if "value_col" not in options:
        raise OperatorError("cms_freq operator requires options.value_col")
    items_table = options.get("items")
    if not items_table:
        raise OperatorError("cms_freq operator requires options.items (a table name)")
    width = int(options.get("width", 1024))
    depth = int(options.get("depth", 3))
    grp = options.get("group_cols", [])
    hash_fn = options.get("hash_fn", "md5")
    sketch = cms_sketch(inp, grp, options["value_col"], width, depth, hash_fn)
    return cms_estimate(
        sketch,
        spark.table(items_table),
        item_col=options.get("item_col", options["value_col"]),
        width=width,
        depth=depth,
        group_cols=grp,
        hash_fn=hash_fn,
    )


def _op_bloom_prefilter(spark, inp, options):
    from .sketch import bloom_filter, bloom_sketch

    build_table = options.get("build")
    if not build_table:
        raise OperatorError(
            "bloom_prefilter operator requires options.build (a table name)"
        )
    if "value_col" not in options:
        raise OperatorError("bloom_prefilter operator requires options.value_col")
    num_bits = int(options.get("num_bits", 8192))
    num_hashes = int(options.get("num_hashes", 4))
    hash_fn = options.get("hash_fn", "md5")
    bits = bloom_sketch(
        spark.table(build_table),
        options.get("build_col", options["value_col"]),
        num_bits=num_bits,
        num_hashes=num_hashes,
        hash_fn=hash_fn,
    )
    return bloom_filter(
        inp,
        options["value_col"],
        bits,
        num_bits=num_bits,
        num_hashes=num_hashes,
        hash_fn=hash_fn,
    )


def _op_validate(spark, inp, options):
    from .validate import validate_rules

    rules = options.get("rules")
    if not rules:
        raise OperatorError("validate operator requires options.rules (a list)")
    return validate_rules(inp, rules)


def _op_profile_table(spark, inp, options):
    from .profile import profile_table

    return profile_table(
        inp,
        columns=options.get("columns"),
        exact_distinct=_bool_opt(options, "exact_distinct", True),
    )


def _op_kn_bigram_logprob(spark, inp, options):
    from .text import kn_bigram_logprob

    return kn_bigram_logprob(
        inp,
        discount=float(options.get("discount", 0.75)),
        **_docs_args(options),
    )


def _op_kn_trigram_logprob(spark, inp, options):
    from .text import kn_trigram_logprob

    return kn_trigram_logprob(
        inp,
        discount=float(options.get("discount", 0.75)),
        **_docs_args(options),
    )


def _op_kn_bigram_fit(spark, inp, options):
    from .text import kn_bigram_fit

    return kn_bigram_fit(inp, text_col=options.get("text_col", "text"))


def _op_kn_bigram_score(spark, inp, options):
    from .text import kn_bigram_score

    model_table = options.get("model")
    if not model_table:
        raise OperatorError(
            "kn_bigram_score operator requires options.model (a (w1, w2, "
            "ct) table, e.g. a kn_bigram_fit stage or one read from disk)"
        )
    return kn_bigram_score(
        inp,
        spark.table(model_table),
        discount=float(options.get("discount", 0.75)),
        **_docs_args(options),
    )


def _op_kn_trigram_fit(spark, inp, options):
    from .text import kn_trigram_fit

    return kn_trigram_fit(inp, text_col=options.get("text_col", "text"))


def _op_kn_trigram_score(spark, inp, options):
    from .text import kn_trigram_score

    model_table = options.get("model")
    if not model_table:
        raise OperatorError(
            "kn_trigram_score operator requires options.model (a (w1, w2, "
            "w3, ct) table, e.g. a kn_trigram_fit stage or one read from "
            "disk)"
        )
    return kn_trigram_score(
        inp,
        spark.table(model_table),
        discount=float(options.get("discount", 0.75)),
        **_docs_args(options),
    )


def _op_unigram_logprob(spark, inp, options):
    from .text import unigram_logprob

    return unigram_logprob(inp, **_docs_args(options))


def _op_remove_duplicated_spans(spark, inp, options):
    from .dedup import remove_duplicated_spans

    return remove_duplicated_spans(
        inp,
        n=int(options.get("n", 8)),
        max_docs=int(options.get("max_docs", 1)),
        **_docs_args(options),
    )


def _op_quantize_embeddings(spark, inp, options):
    from .embedding import quantize_embeddings

    return quantize_embeddings(
        inp,
        vec_col=options.get("vec_col", "embedding"),
        id_col=options.get("id_col", "vec_id"),
    )


def _op_label_centroids(spark, inp, options):
    from .embedding import label_centroids

    return label_centroids(
        inp,
        vec_col=options.get("vec_col", "embedding"),
        label_col=options.get("label_col", "label"),
    )


def _op_linear_probe(spark, inp, options):
    from .embedding import linear_probe_score

    weights = options.get("weights")
    if not isinstance(weights, (list, tuple)) or not weights:
        raise OperatorError(
            "linear_probe requires options.weights (non-empty list of floats)"
        )
    return linear_probe_score(
        inp,
        weights=[float(w) for w in weights],
        bias=float(options.get("bias", 0.0)),
        vec_col=options.get("vec_col", "embedding"),
        id_col=options.get("id_col", "vec_id"),
        threshold=(
            float(options["threshold"]) if "threshold" in options else None
        ),
    )


def _op_byte_stats(spark, inp, options):
    from .multimodal import byte_stats

    return byte_stats(
        inp, options.get("payload_col", "payload"), options.get("id_col", "doc_id")
    )


def _op_byte_histogram(spark, inp, options):
    from .multimodal import byte_histogram_features

    return byte_histogram_features(
        inp, options.get("payload_col", "payload"), options.get("id_col", "doc_id")
    )


def _op_url_parts(spark, inp, options):
    from .web import url_parts

    return url_parts(inp, options.get("url_col", "url"))


def _op_semantic_dedup(spark, inp, options):
    from .dedup import semantic_dedup

    return semantic_dedup(
        inp,
        id_col=options.get("id_col", "vec_id"),
        vec_col=options.get("vec_col", "embedding"),
        # default None derives ~sqrt(N) clusters — a fixed small count
        # is a quadratic-join footgun on a real corpus
        n_clusters=(
            int(options["n_clusters"]) if "n_clusters" in options else None
        ),
        threshold=float(options.get("threshold", 0.95)),
        sample_size=int(options.get("sample_size", 4096)),
        iters=int(options.get("iters", 8)),
        seed=int(options.get("seed", 42)),
        max_cluster_size=(
            int(options["max_cluster_size"])
            if options.get("max_cluster_size") is not None
            else None
        )
        if "max_cluster_size" in options
        else 100_000,
        quantize=bool(options.get("quantize", False)),
    )


def _op_dsir_weights(spark, inp, options):
    from .selection import dsir_weights

    target_table = options.get("target")
    ratios_table = options.get("ratios")
    if bool(target_table) == bool(ratios_table):
        raise OperatorError(
            "dsir_weights requires exactly one of options.target (fit "
            "inline) or options.ratios (a pre-fitted dsir_log_ratios "
            "table)"
        )
    raw_table = options.get("raw")
    # fit-only knobs (smoothing/raw/target_text_col) are forwarded only
    # on the fit path — dsir_weights rejects them alongside a pre-fitted
    # ratios table rather than silently ignoring them
    fit_kw = {}
    if ratios_table:
        bad = [
            o for o in ("smoothing", "raw", "target_text_col") if o in options
        ]
        if bad:
            raise OperatorError(
                f"dsir_weights: options {bad} are fit-time parameters — "
                "they are baked into the pre-fitted options.ratios table; "
                "refit with dsir_log_ratios instead"
            )
    if target_table:
        fit_kw = dict(
            smoothing=(
                float(options["smoothing"]) if "smoothing" in options else None
            ),
            raw=spark.table(raw_table) if raw_table else None,
            target_text_col=options.get("target_text_col"),
        )
    return dsir_weights(
        inp,
        spark.table(target_table) if target_table else None,
        text_col=options.get("text_col", "text"),
        id_col=options.get("id_col", "doc_id"),
        buckets=int(options.get("buckets", 10_000)),
        ratios=spark.table(ratios_table) if ratios_table else None,
        **fit_kw,
    )


def _op_dsir_log_ratios(spark, inp, options):
    from .selection import dsir_log_ratios

    target_table = options.get("target")
    if not target_table:
        raise OperatorError(
            "dsir_log_ratios requires options.target (the "
            "target-distribution corpus); the stage input is the raw corpus"
        )
    return dsir_log_ratios(
        spark.table(target_table),
        inp,
        text_col=options.get("text_col", "text"),
        buckets=int(options.get("buckets", 10_000)),
        smoothing=float(options.get("smoothing", 1.0)),
        target_text_col=options.get("target_text_col"),
    )


def _op_dsir_select(spark, inp, options):
    from .selection import dsir_select

    if "k" not in options:
        raise OperatorError("dsir_select requires options.k (rows to keep)")
    return dsir_select(
        inp,
        int(options["k"]),
        id_col=options.get("id_col", "doc_id"),
        logw_col=options.get("logw_col", "logw"),
        temperature=float(options.get("temperature", 1.0)),
        salt=options.get("salt", "dsir"),
        max_driver_k=int(options.get("max_driver_k", 100_000)),
        quantile_error=float(options.get("quantile_error", 1e-4)),
    )


def _op_perplexity_buckets(spark, inp, options):
    from .selection import perplexity_buckets

    if "score_col" not in options:
        raise OperatorError(
            "perplexity_buckets requires options.score_col (the "
            "smaller-is-better score to bucket by)"
        )
    return perplexity_buckets(
        inp,
        score_col=options["score_col"],
        id_col=options.get("id_col", "doc_id"),
        group_col=options.get("group_col"),
        head=float(options.get("head", 1.0 / 3.0)),
        middle=float(options.get("middle", 1.0 / 3.0)),
        bucket_col=options.get("bucket_col", "ppl_bucket"),
        method=options.get("method", "exact"),
        accuracy=int(options.get("accuracy", 10_000)),
    )


def _op_url_blocklist(spark, inp, options):
    from .web import url_blocklist

    blocked_table = options.get("blocked")
    return url_blocklist(
        inp,
        blocked=spark.table(blocked_table) if blocked_table else None,
        keywords=[str(k) for k in options.get("keywords", [])],
        url_col=options.get("url_col", "url"),
        domain_col=options.get("domain_col", "domain"),
        host_out=options.get("host_out", "host"),
        domain_out=options.get("domain_out", "domain"),
    )


def _op_script_profile(spark, inp, options):
    from .text import script_profile

    return script_profile(
        inp,
        text_col=options.get("text_col", "text"),
        id_col=options.get("id_col", "doc_id"),
    )


def _op_random_projection(spark, inp, options):
    from .embedding import random_projection

    for req in ("k", "in_dim"):
        if req not in options:
            raise OperatorError(
                f"random_projection requires options.{req}"
            )
    return random_projection(
        inp,
        k=int(options["k"]),
        in_dim=int(options["in_dim"]),
        vec_col=options.get("vec_col", "embedding"),
        id_col=options.get("id_col", "vec_id"),
        out_col=options.get("out_col", "proj"),
        seed=str(options.get("seed", "jl")),
    )


def _op_registered_domain_psl(spark, inp, options):
    from .web import registered_domain_psl

    psl_table = options.get("psl")
    if not psl_table:
        raise OperatorError(
            "registered_domain_psl requires options.psl (a table of "
            "public-suffix-list rules)"
        )
    return registered_domain_psl(
        inp,
        spark.table(psl_table),
        host_col=options.get("host_col", "host"),
        out_col=options.get("out_col", "domain"),
        max_labels=int(options.get("max_labels", 5)),
    )


def _op_url_dedup(spark, inp, options):
    from .web import url_dedup

    return url_dedup(
        inp, options.get("url_col", "url"), options.get("id_col", "doc_id")
    )


def _op_domain_cap(spark, inp, options):
    from .web import domain_cap

    if "n" not in options:
        raise OperatorError("domain_cap requires options.n (max docs per domain)")
    return domain_cap(
        inp,
        int(options["n"]),
        options.get("url_col", "url"),
        options.get("id_col", "doc_id"),
        hash_fn=options.get("hash_fn", "md5"),
    )


OPERATORS: dict[str, Callable[[SparkSession, DataFrame, dict], DataFrame]] = {
    "exact_dedup": _op_exact_dedup,
    "dup_weights": _op_dup_weights,
    "minhash_bands": _op_minhash_bands,
    "minhash_signatures": _op_minhash_signatures,
    "fuzzy_filter_against": _op_fuzzy_filter_against,
    "minhash_pairs": _op_minhash_pairs,
    "fuzzy_dedup": _op_fuzzy_dedup,
    "jaccard_pairs": _op_jaccard_pairs,
    "simhash": _op_simhash,
    "hamming_pairs": _op_hamming_pairs,
    "hamming_filter": _op_hamming_filter,
    "simhash_wide": _op_simhash_wide,
    "hamming_pairs_wide": _op_hamming_pairs_wide,
    "hamming_filter_wide": _op_hamming_filter_wide,
    "perceptual_hash": _op_perceptual_hash,
    "embed_neardup": _op_embed_neardup,
    "embed_neardup_lsh": _op_embed_neardup_lsh,
    "quality_score": _op_quality_score,
    "text_features": _op_text_features,
    "langid": _op_langid,
    "fingerprint": _op_fingerprint,
    "token_count": _op_token_count,
    "topk": _op_topk,
    "quantized_topk": _op_quantized_topk,
    "pq_encode": _op_pq_encode,
    "pq_topk": _op_pq_topk,
    "ivfpq_topk": _op_ivfpq_topk,
    "lsh_topk": _op_lsh_topk,
    "ivf_topk": _op_ivf_topk,
    "hash_sample": _op_hash_sample,
    "weighted_sample": _op_weighted_sample,
    "stratified_sample": _op_stratified_sample,
    "split": _op_split,
    "connected_components": _op_connected_components,
    "cluster_dedup": _op_cluster_dedup,
    "salted_join": _op_salted_join,
    "asof_join": _op_asof_join,
    "range_join": _op_range_join,
    "time_rollup": _op_time_rollup,
    "kmv_distinct": _op_kmv_distinct,
    "corpus_overlap": _op_corpus_overlap,
    "hll_distinct": _op_hll_distinct,
    "dd_sketch": _op_dd_sketch,
    "dd_quantiles": _op_dd_quantiles,
    "weighted_mix": _op_weighted_mix,
    "temperature_mix": _op_temperature_mix,
    "token_budget_mix": _op_token_budget_mix,
    "corpus_diff": _op_corpus_diff,
    "pack_shards": _op_pack_shards,
    "shuffle_corpus": _op_shuffle_corpus,
    "corpus_offsets": _op_corpus_offsets,
    "sequence_spans": _op_sequence_spans,
    "shard_manifest": _op_shard_manifest,
    "contamination_report": _op_contamination_report,
    "skew_profile": _op_skew_profile,
    "vocabulary": _op_vocabulary,
    "tfidf_top_terms": _op_tfidf,
    "gopher_rules": _op_gopher_rules,
    "c4_rules": _op_c4_rules,
    "fineweb_rules": _op_fineweb_rules,
    "bm25": _op_bm25,
    "rrf_fuse": _op_rrf_fuse,
    "hybrid_topk": _op_hybrid_topk,
    "repetition_features": _op_repetition,
    "chunk_documents": _op_chunk_documents,
    "luhn_cards": _op_luhn_cards,
    "bpe_pairs": _op_bpe_pairs,
    "bpe_encode": _op_bpe_encode,
    "bpe_vocab": _op_bpe_vocab,
    "tokens_to_ids": _op_tokens_to_ids,
    "tokenizer_fertility": _op_tokenizer_fertility,
    "redact_pii": _op_redact_pii,
    "strip_markup": _op_strip_markup,
    "normalize_text": _op_normalize_text,
    "oov_rate": _op_oov_rate,
    "drop_common_lines": _op_drop_common_lines,
    "stratified_fixed_n": _op_stratified_fixed_n,
    "group_cap": _op_group_cap,
    "ngram_overlap": _op_ngram_overlap,
    "remove_duplicated_spans": _op_remove_duplicated_spans,
    "unigram_logprob": _op_unigram_logprob,
    "kn_bigram_logprob": _op_kn_bigram_logprob,
    "kn_bigram_fit": _op_kn_bigram_fit,
    "kn_bigram_score": _op_kn_bigram_score,
    "kn_trigram_logprob": _op_kn_trigram_logprob,
    "kn_trigram_fit": _op_kn_trigram_fit,
    "kn_trigram_score": _op_kn_trigram_score,
    "profile_table": _op_profile_table,
    "corpus_datacard": _op_corpus_datacard,
    "bigram_logprob": _op_bigram_logprob,
    "quantize_embeddings": _op_quantize_embeddings,
    "label_centroids": _op_label_centroids,
    "linear_probe": _op_linear_probe,
    "decontaminate": _op_decontaminate,
    "fuzzy_decontaminate": _op_fuzzy_decontaminate,
    "fuzzy_decontam_rowwise": _op_fuzzy_decontam_rowwise,
    "minhash_overlap": _op_minhash_overlap,
    "byte_stats": _op_byte_stats,
    "byte_histogram": _op_byte_histogram,
    "url_parts": _op_url_parts,
    "url_dedup": _op_url_dedup,
    "url_blocklist": _op_url_blocklist,
    "registered_domain_psl": _op_registered_domain_psl,
    "perplexity_buckets": _op_perplexity_buckets,
    "script_profile": _op_script_profile,
    "random_projection": _op_random_projection,
    "dsir_weights": _op_dsir_weights,
    "nb_fit": _op_nb_fit,
    "nb_classify": _op_nb_classify,
    "dsir_log_ratios": _op_dsir_log_ratios,
    "dsir_select": _op_dsir_select,
    "semantic_dedup": _op_semantic_dedup,
    "domain_cap": _op_domain_cap,
    "dedup_against": _op_dedup_against,
    "cms_sketch": _op_cms_sketch,
    "cms_freq": _op_cms_freq,
    "bloom_prefilter": _op_bloom_prefilter,
    "validate": _op_validate,
}


def run_operator(spark: SparkSession, config: dict[str, Any]) -> DataFrame:
    op_type = config.get("type")
    fn = OPERATORS.get(str(op_type))
    if fn is None:
        raise OperatorError(
            f"unknown operator type: {op_type!r} (available: {sorted(OPERATORS)})"
        )
    unknown = set(config) - {"type", "input", "options"}
    if unknown:
        # a misplaced option (url_col at top level instead of under
        # options:) would otherwise be silently ignored and the
        # operator would run with defaults
        raise OperatorError(
            f"operator '{op_type}': unknown keys {sorted(unknown)} — "
            "operator parameters go under 'options'"
        )
    input_table = config.get("input")
    if not input_table:
        raise OperatorError(f"operator '{op_type}' requires an 'input' table name")
    try:
        inp = spark.table(input_table)
    except Exception:
        raise OperatorError(
            f"operator '{op_type}': input table '{input_table}' is not registered"
        ) from None
    try:
        return fn(spark, inp, config.get("options") or {})
    except KeyError as exc:
        # the wrappers index required options directly; surface a
        # descriptive error instead of a bare quoted key name
        raise OperatorError(
            f"operator '{op_type}' is missing required option {exc}"
        ) from exc


def referenced_tables(config: dict[str, Any]) -> list[str]:
    """Table names an operator stage reads (for TTL bookkeeping)."""
    out = []
    if config.get("input"):
        out.append(str(config["input"]))
    options = config.get("options") or {}
    if options.get("queries"):
        out.append(str(options["queries"]))
    if options.get("pairs"):
        out.append(str(options["pairs"]))
    if options.get("right"):
        out.append(str(options["right"]))
    if options.get("benchmark"):
        out.append(str(options["benchmark"]))
    if options.get("corpus"):
        out.append(str(options["corpus"]))
    if options.get("items"):
        out.append(str(options["items"]))
    if options.get("build"):
        out.append(str(options["build"]))
    if options.get("target"):
        out.append(str(options["target"]))
    if options.get("raw"):
        out.append(str(options["raw"]))
    if options.get("psl"):
        out.append(str(options["psl"]))
    if options.get("ratios"):
        out.append(str(options["ratios"]))
    return out
