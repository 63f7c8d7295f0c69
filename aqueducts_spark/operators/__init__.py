"""Large-scale training-data operators (beyond reference parity).

The reference stops at SQL stages; these add the operations a 100 TB
training-data pipeline needs, each expressed Spark-first (built-in
functions and relational re-formulations; Python only at genuinely
non-relational boundaries):

* :mod:`.dedup` — exact, MinHash+LSH, SimHash, n-gram Jaccard,
  embedding-cosine near-duplicate detection; banded Hamming-space
  pairing/filtering for any <=60-bit signature; incremental fuzzy
  dedup against a persistable signature index;
* :mod:`.similarity` — brute-force cosine top-k, LSH-bucketed and
  IVF/PQ/IVFPQ ANN (persisted partition-pruned indexes, exact rerank);
* :mod:`.text` — tokenization, quality rules, language ID,
  fingerprinting, BPE train/encode/vocab/ids, retrieval scores;
* :mod:`.sketch` — deterministic mergeable sketches (KMV, HLL,
  count-min, bloom, DDSketch) and cross-corpus overlap estimates;
* :mod:`.sampling` / :mod:`.mixing` / :mod:`.selection` —
  deterministic/stratified/weighted sampling, mix weighting, corpus
  layout, DSIR data selection;
* :mod:`.multimodal` — opaque binary columns with typed metadata,
  Arrow-batched feature extraction, perceptual image hashing.
"""

from . import dedup, multimodal, similarity, text

__all__ = ["dedup", "similarity", "text", "multimodal"]
