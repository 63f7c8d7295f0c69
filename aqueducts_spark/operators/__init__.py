"""Large-scale training-data operators (beyond reference parity).

The reference stops at SQL stages; these add the operations a 100 TB
training-data pipeline needs, each expressed Spark-first (built-in
functions and relational re-formulations; Python only at genuinely
non-relational boundaries):

* :mod:`.dedup` — exact, MinHash+LSH, SimHash, n-gram Jaccard,
  embedding-cosine near-duplicate detection;
* :mod:`.similarity` — brute-force cosine top-k and LSH-bucketed ANN;
* :mod:`.text` — tokenization, quality scoring, language ID,
  fingerprinting;
* :mod:`.multimodal` — opaque binary columns with typed metadata and
  Arrow-batched feature extraction.
"""

from . import dedup, multimodal, similarity, text

__all__ = ["dedup", "similarity", "text", "multimodal"]
