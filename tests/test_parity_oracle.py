"""Reference-parity: Spark parity mode must reproduce the seeded NumPy
oracle's bucket structure bit-exactly at identical config (the
BASELINE.md recall arbiter)."""

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from distributed_gpu_lsh_using_sycl_spark.config import LshConfig
from distributed_gpu_lsh_using_sycl_spark.functions import hashing as H
from distributed_gpu_lsh_using_sycl_spark.parity import oracle

CFG = LshConfig()  # reference defaults: pool=32, k=12, L=8, table=105613, w=1.0
N, DIMS = 300, 10


def _blobs(n=N, dims=DIMS, seed=1):
    """Gaussian blobs, 3 centers, minmax-scaled to [0,1] — the analog of
    generate_data.py:42-46 (make_blobs, random_state=1, scaled)."""
    rng = np.random.Generator(np.random.PCG64(seed))
    centers = rng.uniform(-5, 5, size=(3, dims))
    pts = np.concatenate([
        centers[i % 3] + rng.standard_normal(dims) * 1.0
        for i in range(n)
    ]).reshape(n, dims)
    lo, hi = pts.min(axis=0), pts.max(axis=0)
    return (pts - lo) / np.maximum(hi - lo, 1e-12)


@pytest.fixture(scope="module")
def points():
    return _blobs()


@pytest.fixture(scope="module")
def oracle_buckets(points):
    return oracle.bucket_assignments(points, CFG)


def test_spark_parity_buckets_bit_exact(spark, points, oracle_buckets):
    """The Spark parity operator (pandas UDF, same seeded pool) produces
    the identical (point, table) -> bucket assignment."""
    funcs = H.random_projection_pool(CFG.seed, CFG.num_bands, CFG.rows_per_band,
                                     CFG.signature_pool_size, DIMS, CFG.w)

    @F.pandas_udf(T.ArrayType(T.LongType()))
    def rp_udf(vs: pd.Series) -> pd.Series:
        pts = np.asarray(vs.tolist(), dtype=np.float64)
        return pd.Series(
            H.random_projection_buckets(pts, funcs, CFG.w, CFG.bucket_modulus).tolist())

    pdf = pd.DataFrame({"id": np.arange(N), "features": points.tolist()})
    df = spark.createDataFrame(pdf)
    got = (df.withColumn("buckets", rp_udf("features"))
           .select("id", "buckets").toPandas().sort_values("id"))
    got_m = np.array(got["buckets"].tolist())
    assert got_m.shape == oracle_buckets.shape
    assert (got_m == oracle_buckets).all(), "bucket parity broken"


def test_spark_candidates_cover_oracle_pairs(spark, points, oracle_buckets):
    """Banded candidate generation over the parity buckets surfaces every
    oracle bucket-join pair (dup-pair recall 1.0 >= 0.99 bar) with no
    extras (same buckets -> same pairs; salting must not change the set)."""
    from distributed_gpu_lsh_using_sycl_spark.operators.banding import (
        candidate_pairs_from_bands)

    truth = oracle.candidate_pairs(oracle_buckets)
    rows = [(int(i), int(t), int(oracle_buckets[i, t]))
            for i in range(N) for t in range(CFG.num_bands)]
    bands = spark.createDataFrame(rows, ["image_id", "band_id", "bucket"])
    cfg = LshConfig(hot_bucket_threshold=16, n_salts=4, max_bucket_size=0)
    got = {(r["a"], r["b"]) for r in
           candidate_pairs_from_bands(bands, cfg).select("a", "b").collect()}
    assert truth, "oracle produced no candidate pairs — fixture degenerate"
    missed = truth - got
    recall = 1 - len(missed) / len(truth)
    assert recall >= 0.99, f"recall {recall}"
    assert not (got - truth), "salting fabricated pairs"


def test_knn_oracle_recall_vs_brute(points, oracle_buckets):
    """The reference-semantics LSH kNN should recover most true neighbors
    on blob data at default config — and its recall is measured exactly
    like the reference's recall metric (nearest_neighbors_result.cpp:
    104-143): membership count / total."""
    k = 5
    pred = oracle.knn_oracle(points, oracle_buckets, k)
    d2 = ((points[:, None, :] - points[None, :, :]) ** 2).sum(axis=2)
    np.fill_diagonal(d2, np.inf)
    hits = total = 0
    for i in range(N):
        true_k = set(np.argsort(d2[i], kind="stable")[:k].tolist())
        total += k
        hits += len(true_k & set(int(x) for x in pred[i] if x != i))
    recall = hits / total
    assert recall >= 0.5, f"LSH kNN recall suspiciously low: {recall}"


def test_csr_tables_structure(oracle_buckets):
    offs_vals = oracle.csr_tables(oracle_buckets, CFG)
    assert len(offs_vals) == CFG.num_bands
    for t, (offsets, values) in enumerate(offs_vals):
        assert offsets[-1] == N and len(values) == N
        # every point sits in the CSR range of its bucket
        for i in (0, N // 2, N - 1):
            b = oracle_buckets[i, t]
            seg = values[offsets[b]:offsets[b + 1]]
            assert i in seg
