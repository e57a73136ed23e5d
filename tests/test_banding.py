"""Salt-pair expansion must produce exactly the naive pair set — skew
splitting is a physical rewrite, never a semantic one."""

import numpy as np
from pyspark.sql import functions as F

from distributed_gpu_lsh_using_sycl_spark.config import LshConfig


def _naive_pairs(rows):
    from collections import defaultdict

    buckets = defaultdict(list)
    for rid, band, bucket in rows:
        buckets[(band, bucket)].append(rid)
    out = set()
    for members in buckets.values():
        ms = sorted(set(members))
        for i in range(len(ms)):
            for j in range(i + 1, len(ms)):
                out.add((ms[i], ms[j]))
    return out


def test_salted_pairs_equal_naive(spark):
    from distributed_gpu_lsh_using_sycl_spark.operators.banding import (
        candidate_pairs_from_bands)

    rng = np.random.Generator(np.random.PCG64(5))
    rows = []
    # one huge hot bucket (forces salting), several medium, many singles
    for i in range(60):
        rows.append((f"x{i:03d}", 0, 999))
    for i in range(12):
        rows.append((f"y{i:03d}", 1, 7))
    for i in range(30):
        rows.append((f"z{i:03d}", int(rng.integers(0, 4)), int(rng.integers(0, 1000))))
    cfg = LshConfig(hot_bucket_threshold=8, n_salts=4, max_bucket_size=0)
    bands = spark.createDataFrame(rows, ["image_id", "band_id", "bucket"])
    got = {(r["a"], r["b"]) for r in
           candidate_pairs_from_bands(bands, cfg).select("a", "b").collect()}
    assert got == _naive_pairs(rows)


def test_bucket_cap_downsamples_degenerate_bucket(spark):
    from distributed_gpu_lsh_using_sycl_spark.operators.banding import (
        candidate_pairs_from_bands)

    rows = [(f"d{i:04d}", 0, 1) for i in range(200)]
    cfg = LshConfig(hot_bucket_threshold=8, n_salts=4, max_bucket_size=20)
    bands = spark.createDataFrame(rows, ["image_id", "band_id", "bucket"])
    n = candidate_pairs_from_bands(bands, cfg).count()
    # without the cap: C(200,2) = 19900 pairs; capped: ~C(20,2)-ish
    assert n < 2000


def test_hash_band_pairs_guarantee(spark):
    """hamming < n_bands ⇒ pair is surfaced (pigeonhole on byte bands)."""
    from distributed_gpu_lsh_using_sycl_spark.operators.banding import hash_band_pairs

    base = 0x0123456789ABCDEF
    near = base ^ 0b1011  # hamming 3, all in one byte
    far = base ^ 0x8181818181818181  # hamming 8, one bit per band
    df = spark.createDataFrame(
        [("a", base), ("b", near), ("c", far)], ["image_id", "h"]
    ).select("image_id", F.col("h").cast("long").alias("simhash"),
             F.col("h").cast("long").alias("phash"), F.lit(None).alias("shingles"))
    cfg = LshConfig()
    pairs = {(r["a"], r["b"]) for r in
             hash_band_pairs(df, "simhash", cfg, "simhash").select("a", "b").collect()}
    assert ("a", "b") in pairs
    assert ("a", "c") not in pairs  # every band differs by construction
