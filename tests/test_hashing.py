"""Unit tests for the parity-exact hash kernels."""

import numpy as np

from distributed_gpu_lsh_using_sycl_spark.functions import hashing as H


def _hash_combine_u32_scalar(seed: int, val: int) -> int:
    """Pure-python transliteration of hash_combine.hpp:23-32 (independent
    of the numpy implementation under test)."""
    mask = 0xFFFFFFFF
    x = (seed + 0x9E3779B9 + val) & mask
    x ^= x >> 16
    x = (x * 0x21F0AAAD) & mask
    x ^= x >> 15
    x = (x * 0x735A2D97) & mask
    x ^= x >> 15
    return x


def _hash_combine_u64_scalar(seed: int, val: int) -> int:
    mask = (1 << 64) - 1
    x = (seed + 0x9E3779B97F4A7C15 + val) & mask
    x ^= x >> 32
    x = (x * 0x0E9846AF9B1A615D) & mask
    x ^= x >> 32
    x = (x * 0x0E9846AF9B1A615D) & mask
    x ^= x >> 28
    return x


def test_hash_combine_u32_parity():
    rng = np.random.Generator(np.random.PCG64(7))
    seeds = rng.integers(0, 1 << 32, size=200, dtype=np.uint64).astype(np.uint32)
    vals = rng.integers(0, 1 << 32, size=200, dtype=np.uint64).astype(np.uint32)
    got = H.hash_combine_u32(seeds, vals)
    for s, v, g in zip(seeds.tolist(), vals.tolist(), got.tolist()):
        assert g == _hash_combine_u32_scalar(s, v)


def test_hash_combine_u64_parity():
    rng = np.random.Generator(np.random.PCG64(8))
    seeds = rng.integers(0, 1 << 63, size=200, dtype=np.uint64)
    vals = rng.integers(0, 1 << 63, size=200, dtype=np.uint64)
    got = H.hash_combine_u64(seeds, vals)
    for s, v, g in zip(seeds.tolist(), vals.tolist(), got.tolist()):
        assert g == _hash_combine_u64_scalar(s, v)


def test_minhash_matches_naive():
    a, b = H.minhash_params(seed=42, num_rows=16, pool_size=8)
    rng = np.random.Generator(np.random.PCG64(9))
    rows = [rng.integers(0, 1 << 32, size=rng.integers(1, 40), dtype=np.uint64)
            for _ in range(20)]
    rows.append(np.zeros(0, dtype=np.uint64))  # empty shingle set
    sigs = H.minhash_signatures(rows, a, b)
    p = int(H.MINHASH_PRIME)
    for i, hs in enumerate(rows):
        for j in range(16):
            if len(hs) == 0:
                assert sigs[i, j] == H.MINHASH_EMPTY
            else:
                expect = min((int(a[j]) * int(h) + int(b[j])) % p for h in hs.tolist())
                assert int(sigs[i, j]) == expect


def test_minhash_similarity_estimate():
    """Jaccard ~ fraction of matching signature rows."""
    a, b = H.minhash_params(seed=1, num_rows=256, pool_size=256)
    rng = np.random.Generator(np.random.PCG64(10))
    base = rng.integers(0, 1 << 32, size=100, dtype=np.uint64)
    variant = base.copy()
    variant[:20] = rng.integers(0, 1 << 32, size=20, dtype=np.uint64)  # J ≈ 2/3
    sigs = H.minhash_signatures([base, variant], a, b)
    est = float((sigs[0] == sigs[1]).mean())
    assert 0.5 < est < 0.82


def test_band_buckets_shape_and_determinism():
    a, b = H.minhash_params(seed=42, num_rows=96, pool_size=32)
    rng = np.random.Generator(np.random.PCG64(11))
    rows = [rng.integers(0, 1 << 32, size=30, dtype=np.uint64) for _ in range(5)]
    sigs = H.minhash_signatures(rows, a, b)
    bk1 = H.band_buckets(sigs, 8, 12, 105_613)
    bk2 = H.band_buckets(sigs, 8, 12, 105_613)
    assert bk1.shape == (5, 8)
    assert (bk1 == bk2).all()
    assert (bk1 >= 0).all() and (bk1 < 105_613).all()
    # identical signatures → identical buckets in every band
    sigs2 = np.vstack([sigs[0], sigs[0]])
    bk = H.band_buckets(sigs2, 8, 12, 105_613)
    assert (bk[0] == bk[1]).all()


def test_random_projection_buckets_reference_chain():
    """Cross-check the vectorized kernel against a literal transliteration
    of lsh_hash<random_projections>::operator() (random_projections.hpp:72-85)."""
    funcs = H.random_projection_pool(seed=3, num_bands=4, rows_per_band=6,
                                     pool_size=8, dims=5, w=1.0)
    rng = np.random.Generator(np.random.PCG64(12))
    pts = rng.uniform(0, 1, size=(10, 5))
    got = H.random_projection_buckets(pts, funcs, w=1.0, bucket_modulus=105_613)
    for n in range(10):
        for t in range(4):
            combined = 6  # num_hash_functions
            for f in range(6):
                h = funcs[t, f, 5]
                for d in range(5):
                    h += pts[n, d] * funcs[t, f, d]
                combined = _hash_combine_u32_scalar(combined, int(h / 1.0) & 0xFFFFFFFF)
            assert got[n, t] == combined % 105_613


def test_simhash_and_hamming():
    rng = np.random.Generator(np.random.PCG64(13))
    feats_a = rng.integers(0, 1 << 63, size=50, dtype=np.uint64)
    feats_b = feats_a.copy()
    feats_b[:3] = rng.integers(0, 1 << 63, size=3, dtype=np.uint64)
    feats_c = rng.integers(0, 1 << 63, size=50, dtype=np.uint64)
    flat = np.concatenate([feats_a, feats_b, feats_c])
    offs = np.array([0, 50, 100])
    sh = H.simhash64(flat, offs, 3)
    d_ab = int(H.hamming64(sh[:1], sh[1:2])[0])
    d_ac = int(H.hamming64(sh[:1], sh[2:3])[0])
    assert d_ab < d_ac
    assert d_ab <= 12
    assert 16 <= d_ac <= 48  # unrelated → ~32


def test_hamming_popcount_exact():
    rng = np.random.Generator(np.random.PCG64(14))
    xs = rng.integers(0, 1 << 63, size=100, dtype=np.uint64)
    ys = rng.integers(0, 1 << 63, size=100, dtype=np.uint64)
    got = H.hamming64(xs, ys)
    for x, y, g in zip(xs.tolist(), ys.tolist(), got.tolist()):
        assert g == bin(x ^ y).count("1")
