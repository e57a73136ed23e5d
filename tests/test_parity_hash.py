"""Entropy-based (F4) and mixed (F5) hash families: the distributed Spark
chain must reproduce the seeded numpy reference-semantics oracle
BIT-EXACTLY (bucket-identical assignments — the same bar as the
random-projections parity test), and the uint32 hash_combine emulation in
masked int64 column arithmetic must equal the numpy uint32 kernel."""

import numpy as np
import pytest

from distributed_gpu_lsh_using_sycl_spark.config import LshConfig
from distributed_gpu_lsh_using_sycl_spark.functions import hashing as H


@pytest.fixture(scope="module")
def pts():
    rng = np.random.Generator(np.random.PCG64(99))
    # 150 points, 16 dims — enough for non-degenerate order statistics
    return rng.standard_normal((150, 16))


def _df(spark, pts):
    rows = [(i, [float(x) for x in pts[i]]) for i in range(len(pts))]
    return spark.createDataFrame(rows, "vec_id long, v array<double>")


def _collect_buckets(df):
    out = {}
    for r in df.collect():
        out[(r["vec_id"], r["band_id"])] = r["bucket"]
    return out


def test_entropy_spark_equals_numpy(spark, pts):
    cfg = LshConfig(num_bands=4, rows_per_band=5, signature_pool_size=8,
                    num_cut_off_points=6)
    from distributed_gpu_lsh_using_sycl_spark.operators.parity_hash import (
        entropy_buckets_df)

    pool, sel = H.entropy_params(7, cfg.signature_pool_size, pts.shape[1],
                                 cfg.num_bands, cfg.rows_per_band)
    want = H.entropy_buckets_np(pts, pool, sel, cfg.num_cut_off_points,
                                cfg.bucket_modulus)
    got = _collect_buckets(
        entropy_buckets_df(_df(spark, pts), cfg, 7, dims=pts.shape[1]))
    assert len(got) == len(pts) * cfg.num_bands
    for (i, t), b in got.items():
        assert b == want[i, t], (i, t, b, want[i, t])


def test_mixed_spark_equals_numpy(spark, pts):
    cfg = LshConfig(num_bands=4, rows_per_band=5, signature_pool_size=8,
                    num_cut_off_points=6, w=0.7)
    from distributed_gpu_lsh_using_sycl_spark.operators.parity_hash import (
        mixed_buckets_df)

    pool, sel = H.mixed_params(11, cfg.signature_pool_size, pts.shape[1],
                               cfg.w, cfg.num_bands, cfg.rows_per_band)
    want = H.mixed_buckets_np(pts, pool, sel, cfg.w, cfg.num_cut_off_points,
                              cfg.bucket_modulus)
    got = _collect_buckets(
        mixed_buckets_df(_df(spark, pts), cfg, 11, dims=pts.shape[1]))
    assert len(got) == len(pts) * cfg.num_bands
    for (i, t), b in got.items():
        assert b == want[i, t], (i, t, b, want[i, t])
    # the clamp: max hash value is cops-1, so every bucket < cops
    assert max(got.values()) < cfg.num_cut_off_points


def test_mixed_cutoff_indices_remainder():
    """Remainder-distributed cumulative indices, mixed_hash_functions.cpp:
    160-166: idx += jump + (cop < rem)."""
    n, cops = 20, 6  # jump 3, rem 2
    idx = []
    cur = 0
    jump, rem = divmod(n, cops)
    for cop in range(cops - 1):
        cur += jump + (1 if cop < rem else 0)
        idx.append(cur)
    assert H.mixed_cutoff_indices(n, cops).tolist() == idx
    # entropy variant: plain (c+1)*jump
    assert H.entropy_cutoff_indices(n, cops).tolist() == [
        (c + 1) * (n // cops) for c in range(cops - 1)]


def test_hash_combine_masked_bigint_matches_uint32(spark):
    """The masked int64 column emulation == numpy uint32 hash_combine on
    adversarial values (top-bit set, wrap-inducing)."""
    import pyspark.sql.functions as F

    from distributed_gpu_lsh_using_sycl_spark.operators.parity_hash import _hc_col

    rng = np.random.Generator(np.random.PCG64(5))
    seeds = rng.integers(0, 2**32, size=50, dtype=np.uint64)
    vals = rng.integers(0, 2**32, size=50, dtype=np.uint64)
    want = H.hash_combine_u32(seeds.astype(np.uint32), vals.astype(np.uint32))
    df = spark.createDataFrame(
        [(int(s), int(v)) for s, v in zip(seeds, vals)], "s long, v long")
    got = [r["h"] for r in
           df.select(_hc_col(F.col("s"), F.col("v")).alias("h"))
           .orderBy("s", "v").collect()]
    order = np.lexsort((vals, seeds))
    assert got == [int(want[i]) for i in order]


def test_rp_buckets_df_equals_seqdot_numpy(spark, pts):
    """The JVM random-projections plan (rp_buckets_df) == the numpy chain
    recomputed with SEQUENTIAL fold-dot (hashing.seqdot) — the FP order
    the DuckDB oracle (rp_oracle_sql) also uses."""
    from distributed_gpu_lsh_using_sycl_spark.operators.parity_hash import (
        _MASK, rp_buckets_df)

    cfg = LshConfig(num_bands=4, rows_per_band=5, signature_pool_size=8)
    got = _collect_buckets(rp_buckets_df(_df(spark, pts), cfg,
                                          dims=pts.shape[1]))

    funcs = H.random_projection_pool(cfg.seed, cfg.num_bands, cfg.rows_per_band,
                                     cfg.signature_pool_size, pts.shape[1],
                                     cfg.w)
    scaled = np.clip((pts + 1.0) * 0.5, 0.0, 1.0)
    for t in range(cfg.num_bands):
        # h = seqdot + bias; floor/quantize; u32 wrap; hash_combine fold
        proj = H.seqdot(scaled, funcs[t, :, :-1]) + funcs[t, :, -1][None, :]
        q = (np.floor(proj / cfg.w).astype(np.int64) & _MASK).astype(np.uint32)
        acc = np.full(len(pts), cfg.rows_per_band, dtype=np.uint32)
        for j in range(cfg.rows_per_band):
            acc = H.hash_combine_u32(acc, q[:, j])
        want = acc % np.uint32(cfg.bucket_modulus)
        for i in range(len(pts)):
            assert got[(i, t)] == int(want[i]), (i, t)


def test_hyperplane_buckets_df_equals_seqdot_numpy(spark, pts):
    """The JVM hyperplane plan (hyperplane_buckets_df) == numpy sign bits
    under the identical sequential fold."""
    from distributed_gpu_lsh_using_sycl_spark.operators.embedding import (
        hyperplane_planes)
    from distributed_gpu_lsh_using_sycl_spark.operators.parity_hash import (
        hyperplane_buckets_df)

    n_tables, bits, seed = 3, 5, 11
    planes = hyperplane_planes(seed, n_tables * bits, pts.shape[1])
    proj = H.seqdot(pts, planes)  # (n, n_tables*bits)
    signs = (proj > 0).reshape(len(pts), n_tables, bits)
    want = signs @ (1 << np.arange(bits)).astype(np.int64)

    df = hyperplane_buckets_df(_df(spark, pts), n_tables, bits, seed,
                               dims=pts.shape[1])
    got = {(r["image_id"], r["band_id"]): r["bucket"] for r in df.collect()}
    for i in range(len(pts)):
        for t in range(n_tables):
            assert got[(i, t)] == int(want[i, t]), (i, t)


def test_sampled_cutoffs_agree_with_exact(spark):
    """Production cut-off learning (cutoff_sample_rate in (0,1)): the
    per-function sort runs over a deterministic ~rate*n sample, cut-offs
    become approximate. The honest accuracy metric is PER-FUNCTION hash
    agreement (a k-function band bucket flips if ANY of its k hash counts
    flips — the fold amplifies per-function error as ~(1-eps)^k, and the
    quantile error itself shrinks as 1/sqrt(rate*n), so tiny-fixture
    full-band agreement understates production accuracy). Measured via
    rows_per_band=1 configs, where bucket <-> single hash count:
    agreement >= 0.9 at rate=0.5 on a 2000-point fixture. rate=0 stays
    the exact parity path (pinned by the tests above); the sampled path
    is itself deterministic across re-runs."""
    import dataclasses

    from distributed_gpu_lsh_using_sycl_spark.operators.parity_hash import (
        entropy_buckets_df, mixed_buckets_df)

    rng = np.random.Generator(np.random.PCG64(123))
    pts = rng.standard_normal((2000, 16))
    for fn, kw in ((entropy_buckets_df, {}), (mixed_buckets_df, {"w": 0.7})):
        cfg = LshConfig(num_bands=8, rows_per_band=1, signature_pool_size=8,
                        num_cut_off_points=6, **kw)
        exact = _collect_buckets(fn(_df(spark, pts), cfg, 7, dims=16))
        scfg = dataclasses.replace(cfg, cutoff_sample_rate=0.5)
        sampled = _collect_buckets(fn(_df(spark, pts), scfg, 7, dims=16))
        assert sampled.keys() == exact.keys()
        agree = sum(1 for k in exact if sampled[k] == exact[k]) / len(exact)
        assert agree >= 0.90, (fn.__name__, agree)
        # determinism of the sampled path itself
        again = _collect_buckets(fn(_df(spark, pts), scfg, 7, dims=16))
        assert again == sampled


def test_rp_and_hyperplane_kernel_match_jvm(spark, pts):
    """kernel=True (Arrow seqdot chain) == kernel=False (pure-JVM fold
    plan) bit-for-bit — the kernel is the default execution mode, the JVM
    plan stays the parity/oracle mode."""
    from distributed_gpu_lsh_using_sycl_spark.config import LshConfig
    from distributed_gpu_lsh_using_sycl_spark.operators.parity_hash import (
        hyperplane_buckets_df, rp_buckets_df)

    cfg = LshConfig()
    df = _df(spark, pts)
    a = sorted(tuple(r) for r in
               rp_buckets_df(df, cfg, dims=pts.shape[1],
                             kernel=False).collect())
    b = sorted(tuple(r) for r in
               rp_buckets_df(df, cfg, dims=pts.shape[1],
                             kernel=True).collect())
    assert a == b
    a = sorted(tuple(r) for r in
               hyperplane_buckets_df(df, 8, 6, 11, dims=pts.shape[1],
                                     kernel=False).collect())
    b = sorted(tuple(r) for r in
               hyperplane_buckets_df(df, 8, 6, 11, dims=pts.shape[1],
                                     kernel=True).collect())
    assert a == b
