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
   count is reported, never silent: ``downsample_dropped`` computes the
   exact per-bucket drop counts and the pipeline records the total into
   its ``metrics`` table (stage ``cand_*:dropped``).
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


def _downsample_keep(cfg: LshConfig):
    """The deterministic survive-predicate for degenerate-bucket members
    (expects ``cnt`` attached). Shared by pair generation and the drop
    accounting so the two can never disagree."""
    return (F.col("cnt") <= F.lit(cfg.max_bucket_size)) | (
        F.pmod(F.xxhash64("image_id", F.lit(cfg.seed)), F.col("cnt"))
        < F.lit(cfg.max_bucket_size)
    )


def plan_threshold(cfg: LshConfig) -> int:
    """The single cnt threshold above which a bucket influences the pair
    plan: min(hot_bucket_threshold, max_bucket_size-if-on). Shared by
    ``over_threshold_stats`` and ``candidate_pairs_from_bands`` so the
    pre-filtered stats frame and the pair plan's own filter can never
    disagree — a bucket missing from the broadcast plan coalesces cnt to
    0 downstream, which reads as "under the cap" and silently skips its
    down-sample."""
    thr = cfg.hot_bucket_threshold
    if cfg.max_bucket_size > 0:
        thr = min(thr, cfg.max_bucket_size)
    return thr


def over_threshold_stats(bands: DataFrame, cfg: LshConfig) -> DataFrame:
    """``bucket_stats`` filtered to every bucket any salt/cap decision
    needs: cnt > ``plan_threshold(cfg)``. Small by the skew assumption
    (hot + degenerate buckets are by definition few), so callers
    localCheckpoint it and feed the SAME frame to both
    ``candidate_pairs_from_bands`` and ``downsample_dropped`` — the
    full-width stats shuffle then runs ONCE per banding frame instead of
    once per consumer (the pipeline previously re-ran it just to count
    drops)."""
    return bucket_stats(bands).filter(F.col("cnt") > plan_threshold(cfg))


def downsample_dropped(bands: DataFrame, cfg: LshConfig,
                       stats: DataFrame | None = None) -> DataFrame:
    """Per-bucket drop accounting for the ``max_bucket_size`` cap —
    (band_id, bucket, cnt, dropped). Empty when the cap is off or no
    bucket is degenerate. The no-silent-caps rule: callers (the pipeline)
    aggregate + record this; it shares the exact predicate used by
    ``candidate_pairs_from_bands``. Pass the ``over_threshold_stats``
    frame as ``stats`` to skip the full stats shuffle (a broadcast join +
    partial agg is all that remains)."""
    if cfg.max_bucket_size <= 0:
        return (bands.sparkSession.createDataFrame(
            [], "band_id int, bucket long, cnt long, dropped long"))
    if stats is None:
        stats = bucket_stats(bands)
    degen = stats.filter(F.col("cnt") > cfg.max_bucket_size)
    # no degenerate bucket -> the drop count is provably zero; skip the
    # bands-wide join+agg job (callers pass the materialized
    # over_threshold_stats frame, so this probe costs ~nothing)
    if not degen.head(1):
        return (bands.sparkSession.createDataFrame(
            [], "band_id int, bucket long, cnt long, dropped long"))
    dropped = (bands.join(F.broadcast(degen), ["band_id", "bucket"])
               .filter(~_downsample_keep(cfg))
               .groupBy("band_id", "bucket", "cnt")
               .agg(F.count("*").alias("dropped")))
    return dropped


def candidate_pairs_from_bands(bands: DataFrame, cfg: LshConfig,
                               source: str = "minhash",
                               stats: DataFrame | None = None) -> DataFrame:
    """(image_id, band_id, bucket) -> distinct candidate pairs (a < b).

    One aggregation for stats, one salted self-join, one (a, b) distinct.
    The distinct is the reference's dedup-before-distance rewrite
    (hash_tables.hpp:547-557): never verify a pair twice. ``stats``
    (an ``over_threshold_stats`` frame) skips the stats aggregation —
    only buckets past the hot threshold influence the plan, so the
    filtered frame is exactly equivalent.
    """
    stats_was_none = stats is None
    if stats_was_none:
        stats = bucket_stats(bands)
    # The broadcast plan must carry EVERY bucket any decision touches —
    # hot buckets (salted) AND degenerate-but-not-hot buckets (possible
    # when max_bucket_size < hot_bucket_threshold): a bucket absent from
    # the plan coalesces cnt to 0 downstream, which the keep-predicate
    # reads as "under the cap", silently skipping the down-sample while
    # downsample_dropped (driven by the same stats) reports its members
    # as dropped. plan_threshold is the one shared definition (equal to
    # over_threshold_stats' filter, so passing that frame in makes this a
    # no-op); still few rows by the skew assumption, so the broadcast
    # stands.
    over = stats.filter(F.col("cnt") > plan_threshold(cfg))
    if stats_was_none:
        # materialize the (tiny, filtered) plan frame so the emptiness
        # probe below and the broadcast share one stats shuffle
        over = over.localCheckpoint(eager=True)
    # FAST PATH: when NO bucket crosses the plan threshold (the common
    # case away from degenerate corpora — true for every sf0.1 banding
    # frame measured), every m is 1 and every salt is 0, so the salted
    # grid degenerates to a plain (band, bucket) self-join. Emitting that
    # join directly skips the broadcast build, the per-row salt hash and
    # the two sequence-explodes — same pair set by construction (the
    # m=1 grid joins on (band, bucket, 0, 0)).
    if not over.head(1):
        left = bands.select("band_id", "bucket", F.col("image_id").alias("a"))
        right = bands.select("band_id", "bucket", F.col("image_id").alias("b"))
        return (left.join(right, ["band_id", "bucket"])
                .filter(F.col("a") != F.col("b"))
                .select(F.least("a", "b").alias("a"),
                        F.greatest("a", "b").alias("b"))
                .distinct()
                .withColumn("source", F.lit(source)))

    m_col = F.when(
        F.col("cnt") > cfg.hot_bucket_threshold,
        F.least(
            F.lit(cfg.n_salts),
            F.ceil(F.col("cnt") / F.lit(cfg.hot_bucket_threshold))
             .cast("int"),
        ),
    ).otherwise(F.lit(1))
    plan = over.select("band_id", "bucket", "cnt", m_col.alias("m"))

    b = (
        bands.join(F.broadcast(plan), ["band_id", "bucket"], "left")
        .withColumn("m", F.coalesce(F.col("m"), F.lit(1)))
        .withColumn("cnt", F.coalesce(F.col("cnt"), F.lit(0)))
    )
    if cfg.max_bucket_size > 0:
        # deterministic down-sample of degenerate buckets; survivors keep
        # expected ~max_bucket_size members. Dropped members are accounted
        # by downsample_dropped (same predicate) — see module docstring.
        b = b.filter(_downsample_keep(cfg))
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


def _band_widths(n_bands: int) -> list[int]:
    """Widths of n_bands contiguous bit-bands that PARTITION all 64 bits
    (remainder bits spread over the first bands), so the pigeonhole bound
    holds with no uncovered bits."""
    base, rem = divmod(64, n_bands)
    return [base + (1 if i < rem else 0) for i in range(n_bands)]


def simhash_band_cols(simhash_col, n_bands: int = 9):
    """Split a 64-bit simhash/phash into n_bands bit-bands for exact-match
    blocking. Pigeonhole: the bands partition all 64 bits, so
    hamming(x, y) < n_bands ⇒ at least one band equal. With
    n_bands = hamming_threshold + 1 blocking recall is exactly 1.0 at the
    verification boundary (pairs at hamming == threshold are guaranteed a
    shared band)."""
    out, off = [], 0
    for i, width in enumerate(_band_widths(n_bands)):
        mask = (1 << width) - 1
        out.append(F.shiftrightunsigned(simhash_col, off)
                   .bitwiseAND(F.lit(mask)).alias(f"hb{i}"))
        off += width
    return out


def hash_band_pairs(signatures: DataFrame, hash_col: str, cfg: LshConfig,
                    source: str, n_bands: int | None = None,
                    combine: int = 2) -> DataFrame:
    """Candidate pairs from bit-banding a 64-bit hash column (simhash or
    phash). Reuses the salted-pair machinery by mapping each (band, value)
    block to the (band_id, bucket) shape.

    Pigeonhole with combined keys (multi-index hashing): with
    ``n_bands = hamming_threshold + combine`` bands partitioning all 64
    bits, hamming <= t leaves at least ``combine`` clean bands, so some
    ``combine``-subset of bands matches exactly — blocking recall is 1.0
    INCLUDING pairs at the threshold, for any combine >= 1.

    Why combine=2 by default: a 64-bit code split into t+1 = 9 bands has
    only ~2^7 key values per band, so at n rows EVERY bucket holds ~n/128
    members and candidates grow as 9·n²/128 — fine at 10^4 rows, fatal at
    10^9. Pairing bands (C(10,2) = 45 keys of ~13 bits) trades 5x more
    exploded rows for ~2^6x sparser buckets: same exact guarantee, an
    order of magnitude fewer candidate pairs (measured 835k -> ~80k on
    the sf0.1 documents). combine=1 keeps the classic one-band scheme.
    """
    bands = bit_bands(signatures, hash_col, cfg, n_bands=n_bands,
                      combine=combine)
    return candidate_pairs_from_bands(bands, cfg, source=source)


def bit_bands(signatures: DataFrame, hash_col: str, cfg: LshConfig,
              n_bands: int | None = None, combine: int = 2) -> DataFrame:
    """The (image_id, band_id, bucket) frame hash_band_pairs joins on —
    exposed so callers can also run the drop accounting
    (``downsample_dropped``) over the SAME banding a capped candidate
    join saw (the pipeline's no-silent-caps rule applies to the bit-band
    paths exactly as to the MinHash path)."""
    if n_bands is None:
        n_bands = cfg.hamming_threshold + combine
    base = signatures.filter(F.col(hash_col).isNotNull()).select(
        "image_id", F.col(hash_col).alias("h"))
    widths = _band_widths(n_bands)
    vals, off = [], 0
    for width in widths:
        mask = (1 << width) - 1
        vals.append(F.shiftrightunsigned(F.col("h"), off).bitwiseAND(F.lit(mask)))
        off += width
    if combine == 1:
        keys = vals
    elif combine == 2:
        shift = 1 << max(widths)  # v_i, v_j < 2^max_width: collision-free pack
        keys = [vals[i] * F.lit(shift) + vals[j]
                for i in range(n_bands) for j in range(i + 1, n_bands)]
    else:
        raise ValueError(f"combine must be 1 or 2, got {combine}")
    return base.select(
        "image_id", F.posexplode(F.array(*keys)).alias("band_id", "bucket"))
