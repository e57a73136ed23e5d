"""Seeded NumPy reference oracle: the reference's LSH bucket/neighbor
structure, reimplemented from its published semantics.

This is the "reference cluster assignments" arbiter from BASELINE.md:
``random_projections`` bucket assignment (random_projections.hpp:72-85)
over the CSR counting-sort bucket structure (hash_tables.hpp:212-383),
plus the bucket-join candidate semantics of the search kernel
(hash_tables.hpp:566-578). Parity mode in Spark must reproduce the
bucket ids bit-exactly (same seed, same config) and ≥0.99 of the
oracle's dup pairs.

Deliberate divergences (documented; SURVEY §1.5, §4.2):
- no dummy-point padding (fake rows would fabricate dup pairs);
- no BLOCKING_SIZE=10 tail-padding artifact (constants.hpp:38-44).
"""

from __future__ import annotations

import numpy as np

from distributed_gpu_lsh_using_sycl_spark.config import LshConfig
from distributed_gpu_lsh_using_sycl_spark.functions import hashing as H


def bucket_assignments(points: np.ndarray, cfg: LshConfig) -> np.ndarray:
    """(n, L) int64 bucket ids under the reference hash chain."""
    funcs = H.random_projection_pool(cfg.seed, cfg.num_bands, cfg.rows_per_band,
                                     cfg.signature_pool_size, points.shape[1], cfg.w)
    return H.random_projection_buckets(points, funcs, cfg.w, cfg.bucket_modulus)


def csr_tables(buckets: np.ndarray, cfg: LshConfig) -> list[tuple[np.ndarray, np.ndarray]]:
    """Counting-sort CSR structure per table: (offsets, values) — the
    NumPy transliteration of count_hash_values/calculate_offsets/
    fill_hash_tables (hash_tables.hpp:212-383)."""
    n, L = buckets.shape
    out = []
    for t in range(L):
        counts = np.bincount(buckets[:, t], minlength=cfg.bucket_modulus)
        offsets = np.zeros(cfg.bucket_modulus + 1, dtype=np.int64)
        np.cumsum(counts, out=offsets[1:])
        order = np.argsort(buckets[:, t], kind="stable")
        out.append((offsets, order))
    return out


def candidate_pairs(buckets: np.ndarray) -> set[tuple[int, int]]:
    """All (i < j) pairs sharing a bucket in ANY table — the oracle's
    bucket-join candidate set (J1 semantics, hash_tables.hpp:566-578)."""
    n, L = buckets.shape
    pairs: set[tuple[int, int]] = set()
    for t in range(L):
        order = np.argsort(buckets[:, t], kind="stable")
        sorted_b = buckets[order, t]
        # group boundaries
        starts = np.flatnonzero(np.concatenate([[True], sorted_b[1:] != sorted_b[:-1]]))
        ends = np.concatenate([starts[1:], [n]])
        for s, e in zip(starts, ends):
            if e - s > 1:
                members = np.sort(order[s:e])
                for ii in range(len(members)):
                    for jj in range(ii + 1, len(members)):
                        pairs.add((int(members[ii]), int(members[jj])))
    return pairs


def knn_oracle(points: np.ndarray, buckets: np.ndarray, k: int) -> np.ndarray:
    """Reference search semantics: per point, scan its bucket in every
    table, keep the k nearest by squared L2 (self excluded; "not found"
    slots keep the point's own id — nearest_neighbors.cpp:99-131)."""
    n = len(points)
    result = np.full((n, k), -1, dtype=np.int64)
    for i in range(n):
        cands: set[int] = set()
        for t in range(buckets.shape[1]):
            cands.update(np.flatnonzero(buckets[:, t] == buckets[i, t]).tolist())
        cands.discard(i)
        if not cands:
            result[i] = i  # own id == not found (reference convention)
            continue
        cl = np.fromiter(cands, dtype=np.int64)
        d = ((points[cl] - points[i]) ** 2).sum(axis=1)
        order = cl[np.lexsort((cl, d))][:k]
        row = np.full(k, i, dtype=np.int64)
        row[: len(order)] = order
        result[i] = row
    return result
