"""PySpark-native near-duplicate detection & clustering engine.

A from-scratch re-expression of the capabilities of
SC-SGS/Distributed_GPU_LSH_using_SYCL (distributed LSH k-NN over dense
vectors, IWOCL '21) as an idiomatic PySpark pipeline over image+caption
tables:

- MinHash over caption shingles (E2LSH-style pool-then-select parameter
  draw, mirroring ``random_projections.cpp:44-72`` of the reference)
- SimHash over perceptual image features (stored phash + decoded-pixel
  block hashes)
- suffix-array / rolling-hash exact-substring pass over captions
- banded LSH bucketing via salted hash-partitioned shuffle with explicit
  skew splitting (the Spark analog of the reference's CSR hash tables,
  ``hash_tables.hpp:212-383``)
- Hamming / Jaccard pair verification (analog of the squared-L2 predicate,
  ``hash_tables.hpp:586-592``)
- connected components (large-star / small-star) -> cluster assignments
- checkpointed, resumable stage execution with lineage + metrics tables
  (analog of the reference profiler, ``profiler.cpp:105-176``)

All heavy math is vectorized numpy inside Arrow-batched pandas UDFs —
zero per-row Python.
"""

__version__ = "0.1.0"

from distributed_gpu_lsh_using_sycl_spark.config import LshConfig  # noqa: F401
