"""Banded LSH bucketing with explicit skew splitting (salt-pair expansion).

The reference materializes CSR hash tables per band (count → prefix-sum →
atomic scatter, ``hash_tables.hpp:212-383``) and probes them rank-by-rank.
In Spark the band bucket IS the shuffle key; what remains our job is the
thing the reference only *plots* (bucket-occupancy histogram,
``hash_tables.hpp:245-269``): LSH buckets are Zipfian, and a naive
self-join puts a hot bucket's O(n²) pair generation in ONE task.

Skew policy (explicit, AQE skew-join as backstop):

1. ``bucket_stats`` — groupBy (band_id, bucket) count (A1 analog).
2. buckets over ``max_bucket_size`` are deterministically down-sampled
   (hash filter) — a degenerate bucket (e.g. empty-ish captions all
   hashing together) would emit O(n²) pairs at 10^12 scale; the dropped
   count is reported, never silent.
3. buckets over ``hot_bucket_threshold`` get ``m = clamp(ceil(cnt/thr),
   1, n_salts)`` salts; each member takes salt s = xxhash64(id) % m and
   is replicated into the (s, t) salt-pair grid:
   left role: (s, t) for t in s..m-1; right role: (r, salt) for r in 0..s.
   Joining left.(s,t) == right.(s,t) yields every unordered member pair
   exactly once across C(m+1, 2) independent tasks of ~(cnt/m)² work —
   same total work, bounded per-task memory.

Cold buckets take m = 1 and degrade to the plain self-join — one code
path, no special-casing.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from distributed_gpu_lsh_using_sycl_spark.config import LshConfig


def explode_bands(signatures: DataFrame, buckets_col: str = "buckets") -> DataFrame:
    """signatures -> (image_id, band_id, bucket); NULL bucket rows (empty
    docs) never enter a band."""
    return (
        signatures
        .select("image_id", F.posexplode(buckets_col).alias("band_id", "bucket"))
    )


def bucket_stats(bands: DataFrame) -> DataFrame:
    """Occupancy histogram — the skew detector (A1 analog)."""
    return bands.groupBy("band_id", "bucket").agg(F.count("*").alias("cnt"))


def candidate_pairs_from_bands(bands: DataFrame, cfg: LshConfig,
                               source: str = "minhash") -> DataFrame:
    """(image_id, band_id, bucket) -> distinct candidate pairs (a < b).

    One aggregation for stats, one salted self-join, one (a, b) distinct.
    The distinct is the reference's dedup-before-distance rewrite
    (hash_tables.hpp:547-557): never verify a pair twice.
    """
    stats = bucket_stats(bands)
    hot = stats.filter(F.col("cnt") > cfg.hot_bucket_threshold)

    # hot-bucket plan is broadcast — hot buckets are by definition few.
    m_col = F.least(
        F.lit(cfg.n_salts),
        F.ceil(F.col("cnt") / F.lit(cfg.hot_bucket_threshold)).cast("int"),
    )
    plan = hot.select("band_id", "bucket", "cnt", m_col.alias("m"))

    b = (
        bands.join(F.broadcast(plan), ["band_id", "bucket"], "left")
        .withColumn("m", F.coalesce(F.col("m"), F.lit(1)))
        .withColumn("cnt", F.coalesce(F.col("cnt"), F.lit(0)))
    )
    if cfg.max_bucket_size > 0:
        # deterministic down-sample of degenerate buckets; survivors keep
        # expected ~max_bucket_size members.
        keep = (F.col("cnt") <= F.lit(cfg.max_bucket_size)) | (
            F.pmod(F.xxhash64("image_id", F.lit(cfg.seed)), F.col("cnt"))
            < F.lit(cfg.max_bucket_size)
        )
        b = b.filter(keep)
    b = b.withColumn(
        "salt", F.pmod(F.xxhash64("image_id", F.lit(cfg.seed + 1)), F.col("m")).cast("int")
    )

    left = b.withColumn("t", F.explode(F.sequence(F.col("salt"), F.col("m") - 1))) \
            .select("band_id", "bucket", F.col("salt").alias("s"), "t",
                    F.col("image_id").alias("a"))
    right = b.withColumn("s", F.explode(F.sequence(F.lit(0), F.col("salt")))) \
             .select("band_id", "bucket", "s", F.col("salt").alias("t"),
                     F.col("image_id").alias("b"))
    # The grid guarantees each unordered pair meets with the smaller-salt
    # member on the left — which says nothing about id order, so CANONICALIZE
    # (least/greatest), don't filter on a < b (that would drop every pair
    # whose smaller id carries the larger salt).
    pairs = (
        left.join(right, ["band_id", "bucket", "s", "t"])
        .filter(F.col("a") != F.col("b"))
        .select(F.least("a", "b").alias("a"), F.greatest("a", "b").alias("b"))
        .distinct()
        .withColumn("source", F.lit(source))
    )
    return pairs


def simhash_band_cols(simhash_col, n_bands: int = 8):
    """Split a 64-bit simhash/phash into n_bands byte-bands for exact-match
    blocking. Pigeonhole: hamming(x, y) < n_bands ⇒ at least one band equal,
    so recall is 1.0 for distance < n_bands and measured (≥0.99 on the
    fixture) at the configured threshold."""
    width = 64 // n_bands
    mask = (1 << width) - 1
    return [
        F.shiftrightunsigned(simhash_col, i * width).bitwiseAND(F.lit(mask)).alias(f"hb{i}")
        for i in range(n_bands)
    ]


def hash_band_pairs(signatures: DataFrame, hash_col: str, cfg: LshConfig,
                    source: str, n_bands: int = 8) -> DataFrame:
    """Candidate pairs from byte-banding a 64-bit hash column (simhash or
    phash). Reuses the salted-pair machinery by mapping each (band, value)
    block to the (band_id, bucket) shape."""
    base = signatures.filter(F.col(hash_col).isNotNull()).select(
        "image_id", F.col(hash_col).alias("h"))
    width = 64 // n_bands
    mask = (1 << width) - 1
    bands = base.select(
        "image_id",
        F.posexplode(F.array(*[
            F.shiftrightunsigned(F.col("h"), i * width).bitwiseAND(F.lit(mask))
            for i in range(n_bands)
        ])).alias("band_id", "bucket"),
    )
    return candidate_pairs_from_bands(bands, cfg, source=source)
