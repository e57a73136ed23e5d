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
    """hamming <= hamming_threshold ⇒ pair is surfaced (pigeonhole with
    threshold+combine bit-bands partitioning all 64 bits), including
    pairs AT the threshold; a pair with at most one clean band is missed
    under combine=2 (no clean band-pair exists)."""
    from distributed_gpu_lsh_using_sycl_spark.operators.banding import (
        _band_widths, hash_band_pairs)

    cfg = LshConfig()  # hamming_threshold = 8; combine=2 -> 10 bands
    widths = _band_widths(cfg.hamming_threshold + 2)
    offs = [sum(widths[:i]) for i in range(len(widths))]
    base = 0x0123456789ABCDEF
    near = base ^ 0b1011  # hamming 3, one band
    # hamming exactly 8 = one bit in each of the FIRST 8 bands; the two
    # remaining clean bands form the guaranteed shared band-pair
    at_threshold = base
    for o in offs[:8]:
        at_threshold ^= 1 << o
    # one bit in 9 of 10 bands (hamming 9 > threshold): at most one clean
    # band -> no clean pair -> guaranteed miss
    far = base
    for o in offs[:9]:
        far ^= 1 << o
    df = spark.createDataFrame(
        [("a", base), ("b", near), ("c", far), ("d", at_threshold)],
        ["image_id", "h"],
    ).select("image_id", F.col("h").cast("long").alias("simhash"),
             F.col("h").cast("long").alias("phash"), F.lit(None).alias("shingles"))
    pairs = {(r["a"], r["b"]) for r in
             hash_band_pairs(df, "simhash", cfg, "simhash").select("a", "b").collect()}
    assert ("a", "b") in pairs
    assert ("a", "d") in pairs  # the boundary case a t-band split would miss
    assert ("a", "c") not in pairs

    # combine=1 (classic single-band keys) keeps the same boundary guarantee
    pairs1 = {(r["a"], r["b"]) for r in
              hash_band_pairs(df, "simhash", cfg, "simhash", combine=1)
              .select("a", "b").collect()}
    assert ("a", "d") in pairs1


def test_downsample_dropped_accounting(spark):
    """The degenerate-bucket cap's drop count is exact: kept + dropped ==
    bucket size, and the kept set matches what pair generation used."""
    from distributed_gpu_lsh_using_sycl_spark.operators.banding import (
        downsample_dropped)

    rows = [(f"d{i:04d}", 0, 1) for i in range(200)] + [("e1", 0, 2), ("e2", 0, 2)]
    cfg = LshConfig(hot_bucket_threshold=8, n_salts=4, max_bucket_size=20)
    bands = spark.createDataFrame(rows, ["image_id", "band_id", "bucket"])
    drops = downsample_dropped(bands, cfg).collect()
    assert len(drops) == 1  # only the degenerate bucket appears
    d = drops[0]
    assert d["bucket"] == 1 and d["cnt"] == 200
    assert 0 < d["dropped"] < 200


def test_cap_enforced_when_cap_below_hot_threshold(spark):
    """max_bucket_size < hot_bucket_threshold: a bucket between the two
    (degenerate but not hot) must still be down-sampled, with pair
    generation and the drop accounting agreeing on the SAME kept set —
    a bucket missing from the broadcast plan would otherwise skip the
    cap (coalesced cnt 0 reads as under-cap) while downsample_dropped
    reports its members as dropped."""
    from distributed_gpu_lsh_using_sycl_spark.operators.banding import (
        candidate_pairs_from_bands, downsample_dropped)

    rows = [(f"m{i:04d}", 0, 5) for i in range(100)]
    cfg = LshConfig(hot_bucket_threshold=200, n_salts=4, max_bucket_size=50)
    bands = spark.createDataFrame(rows, ["image_id", "band_id", "bucket"])

    pairs = candidate_pairs_from_bands(bands, cfg).select("a", "b").collect()
    members_in_pairs = {x for r in pairs for x in (r["a"], r["b"])}
    drops = downsample_dropped(bands, cfg).collect()
    assert len(drops) == 1 and drops[0]["cnt"] == 100
    n_dropped = drops[0]["dropped"]
    assert 0 < n_dropped < 100
    # every member is either in the pair set or accounted as dropped
    assert len(members_in_pairs) == 100 - n_dropped
    # and the pair count reflects the capped bucket, not C(100,2)
    assert len(pairs) == len(members_in_pairs) * (len(members_in_pairs) - 1) // 2


def test_compute_signatures_python_shingles_matches_jvm(spark):
    """python_shingles=True (one-hop Python twin) == python_shingles=False
    (pure-JVM shingle chain) bit-for-bit, including NULL/empty/short
    captions — the twin is the default execution mode, the JVM chain the
    parity mode."""
    from distributed_gpu_lsh_using_sycl_spark.config import LshConfig
    from distributed_gpu_lsh_using_sycl_spark.operators.signatures import (
        compute_signatures)

    cfg = LshConfig(num_bands=4, rows_per_band=2)
    rows = [(0, "the quick brown fox jumps over the lazy dog"),
            (1, None), (2, ""), (3, "one"), (4, "two words"),
            (5, "  padded   whitespace \t tabs "),
            (6, "the quick brown fox jumps over the lazy dog"),
            (7, "caffé déjà vu ünicode words here and there")]
    df = spark.createDataFrame(rows, "image_id long, caption string")
    a = sorted(map(tuple, compute_signatures(
        df, cfg, with_image=False, python_shingles=False).collect()))
    b = sorted(map(tuple, compute_signatures(
        df, cfg, with_image=False, python_shingles=True).collect()))
    assert a == b


def test_candidate_pairs_fast_path_equals_salted(spark):
    """The no-hot-bucket fast path (plain self-join) emits exactly the
    salted grid's pair set; with a hot bucket present, the salted path
    still engages and both produce the same pairs as a brute
    per-bucket enumeration."""
    from pyspark.sql import functions as F

    from distributed_gpu_lsh_using_sycl_spark.config import LshConfig
    from distributed_gpu_lsh_using_sycl_spark.operators.banding import (
        candidate_pairs_from_bands)

    # cold buckets only -> fast path
    rows = [(i, 0, i % 37) for i in range(200)]
    bands = spark.createDataFrame(rows, "image_id long, band_id int, bucket long")
    cfg = LshConfig(hot_bucket_threshold=64, max_bucket_size=4096)
    got = {(r["a"], r["b"]) for r in
           candidate_pairs_from_bands(bands, cfg).collect()}
    want = {(a, b) for a in range(200) for b in range(200)
            if a < b and a % 37 == b % 37}
    assert got == want
    # one hot bucket -> salted path; same enumeration
    rows = [(i, 0, 0 if i < 150 else i) for i in range(200)]
    bands = spark.createDataFrame(rows, "image_id long, band_id int, bucket long")
    cfg = LshConfig(hot_bucket_threshold=16, max_bucket_size=4096, n_salts=4)
    got = {(r["a"], r["b"]) for r in
           candidate_pairs_from_bands(bands, cfg).collect()}
    want = {(a, b) for a in range(150) for b in range(150) if a < b}
    assert got == want
