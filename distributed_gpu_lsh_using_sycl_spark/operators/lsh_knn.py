"""The reference's user-facing query: LSH k-nearest-neighbors
(``./prog input_file k`` — main.cpp:46-55, fit + kneighbors) as a
distributed DataFrame plan over any of the three hash families.

Search semantics reproduce ``nearest_neighbors.cpp:99-131`` (and the
repo's numpy restatement, parity/oracle.knn_oracle): per point, the
candidate set is every point sharing a bucket in ANY of the L tables
(OR-construction, hash_tables.hpp:566-578), self excluded; keep the k
nearest by squared L2 (id ascending tie-break); slots with no candidate
keep the point's OWN id — the reference's "not found" convention — with
dist_sq = -1.0 (the reference leaves those distance entries unwritten).

Scale shape: bucket assignment is a broadcast crossJoin + fold (no
shuffle beyond the groupBy per table); the candidate self-join rides the
salted/skew-split machinery of banding.candidate_pairs_from_bands; the
verify is one JVM fold per (q, m); ranking is a per-q window. At 10^12
rows the only all-to-all stage is the bucket join, exactly as in the
reference's distributed hash tables.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import Window as W

from distributed_gpu_lsh_using_sycl_spark.config import LshConfig

FAMILIES = ("random_projections", "entropy_based", "mixed")


def family_buckets(e: DataFrame, family: str, cfg: LshConfig,
                   seed: int | None = None, id_col: str = "vec_id",
                   vec_col: str = "v", dims: int | None = None) -> DataFrame:
    """Runtime family dispatch (hash_function_types.hpp:22-29;
    nearest_neighbors.cpp:44-58) -> (vec_id, band_id, bucket)."""
    from distributed_gpu_lsh_using_sycl_spark.operators.parity_hash import (
        entropy_buckets_df, mixed_buckets_df, rp_buckets_df)

    seed = cfg.seed if seed is None else seed
    if family in ("random_projections", "0"):
        return rp_buckets_df(e, cfg, id_col=id_col, vec_col=vec_col,
                             dims=dims)
    if family in ("entropy_based", "1"):
        return entropy_buckets_df(e, cfg, seed, id_col=id_col,
                                  vec_col=vec_col, dims=dims)
    if family in ("mixed", "2"):
        return mixed_buckets_df(e, cfg, seed, id_col=id_col,
                                vec_col=vec_col, dims=dims)
    raise ValueError(
        f"unknown hash_function family {family!r}; expected one of "
        f"{FAMILIES} (or the reference's enum values 0/1/2)")


def _dsq(a, b):
    """Squared L2 as a SEQUENTIAL fold (index order) — matches the
    reference's scalar loop and DuckDB's list_reduce bit-for-bit."""
    return F.aggregate(F.zip_with(a, b, lambda x, y: (x - y) * (x - y)),
                       F.lit(0.0), lambda acc, x: acc + x)


def lsh_kneighbors(e: DataFrame, k: int, family: str = "random_projections",
                   cfg: LshConfig | None = None, seed: int | None = None,
                   id_col: str = "vec_id", vec_col: str = "v",
                   dims: int | None = None) -> DataFrame:
    """(id, vec) -> (vec_id, rank, neighbor_id, dist_sq), k rows per input
    point, rank 1-based by (squared L2 asc, neighbor id asc).

    For exact parity with the brute bucket-scan oracle the bucket cap is
    disabled here (max_bucket_size=0): a capped bucket would *silently*
    drop true neighbors, which is fine for dedup candidates (reported via
    downsample_dropped) but wrong for a kNN answer. Hot-bucket salting
    stays on — it only splits work, never drops it.
    """
    from distributed_gpu_lsh_using_sycl_spark.operators.banding import (
        candidate_pairs_from_bands)

    cfg = cfg or LshConfig()
    if cfg.max_bucket_size:
        cfg = LshConfig(**{**_cfg_dict(cfg), "max_bucket_size": 0})
    src = (e.select(F.col(id_col).alias("vec_id"),
                    F.col(vec_col).cast("array<double>").alias("v"))
           .localCheckpoint(eager=True))
    # buckets feed stats + both sides of the salted self-join, and the
    # pair set feeds both directions of the union — materialize each once
    # (without this the hash-chain subtree executes 2-4x; audit shows the
    # exchange count collapse in PLANS.md)
    buckets = family_buckets(src, family, cfg, seed, dims=dims) \
        .localCheckpoint(eager=True)
    bands = buckets.select(F.col("vec_id").alias("image_id"),
                           "band_id", "bucket")
    und = candidate_pairs_from_bands(bands, cfg, source=f"knn_{family}")
    # compute the (symmetric) distance ONCE per unordered pair, then fan
    # out both directions — (x-y)*(x-y) folds to the bit-identical double
    # either way, and the fold is the re-rank's dominant cost. The
    # checkpoint sits ON the distance frame (not the raw pair set): both
    # union branches read the materialized (a, b, d) rows, so the salted
    # join AND the fold execute exactly once (a bare union of two selects
    # over a lazy frame runs the subtree once per branch).
    va = src.select(F.col("vec_id").alias("a"), F.col("v").alias("va"))
    vb = src.select(F.col("vec_id").alias("b"), F.col("v").alias("vb"))
    dund = (und.join(va, "a").join(vb, "b")
            .select("a", "b", _dsq(F.col("va"), F.col("vb")).alias("d"))
            .localCheckpoint(eager=True))
    cand = (dund.select(F.col("a").alias("q"), F.col("b").alias("m"), "d")
            .union(dund.select(F.col("b").alias("q"), F.col("a").alias("m"),
                               "d")))
    ranked = (cand
              .withColumn("rank", F.row_number().over(
                  W.partitionBy("q").orderBy(F.col("d"), F.col("m"))))
              .filter(F.col("rank") <= k)
              .select("q", "rank", "m", "d"))
    slots = src.select("vec_id").withColumn(
        "rank", F.explode(F.sequence(F.lit(1), F.lit(k))))
    return (slots.join(ranked, (slots.vec_id == ranked.q)
                       & (slots.rank == ranked.rank), "left")
            .select(slots.vec_id,
                    slots.rank.cast("int").alias("rank"),
                    F.coalesce(ranked.m, slots.vec_id).alias("neighbor_id"),
                    F.round(F.coalesce(ranked.d, F.lit(-1.0)), 6)
                    .alias("dist_sq")))


def _cfg_dict(cfg: LshConfig) -> dict:
    from dataclasses import asdict
    return asdict(cfg)


def knn_recall(pred: DataFrame, truth: DataFrame) -> DataFrame:
    """Reference recall metric (nearest_neighbors_result.cpp:104-148):
    |pred ∩ truth| / (n*k) over the long-format (vec_id, neighbor_id)
    sets, returned with the correct/total counts like the reference's
    tuple. Scale matches the reference exactly: PERCENT (the reference
    multiplies by 100, nearest_neighbors_result.cpp:131)."""
    hits = pred.join(truth.select("vec_id", "neighbor_id"),
                     ["vec_id", "neighbor_id"], "left_semi").count()
    total = pred.count()
    spark = pred.sparkSession
    return spark.createDataFrame(
        [(round(100.0 * hits / total, 6) if total else 0.0, hits, total)],
        "recall double, hits long, total long")


def knn_error_ratio(pred: DataFrame, truth: DataFrame) -> DataFrame:
    """Reference error-ratio metric (nearest_neighbors_result.cpp:151-214):
    a point with ANY not-found slot (dist_sq < 0 here; the reference's
    real_type::max sentinel) is skipped entirely; otherwise distances are
    compared rank-by-rank (both sides already sorted ascending) as
    sqrt(pred/true) — the reference stores plain distances, we carry
    squared (F7 deferred sqrt) — with the 0-vs-0 "same position" rule
    counting as an exact 1.0. Returns (mean_ratio, n_points, n_skipped)."""
    bad = (pred.filter(F.col("dist_sq") < 0)
           .select("vec_id").distinct())
    p = (pred.join(bad, "vec_id", "left_anti")
         .select("vec_id", "rank", F.col("dist_sq").alias("pd")))
    t = truth.select("vec_id", "rank", F.col("dist_sq").alias("td"))
    ratio = (F.when((F.col("td") == 0) & (F.col("pd") == 0), F.lit(1.0))
             .when(F.col("td") > 0, F.sqrt(F.col("pd") / F.col("td"))))
    per_point = (p.join(t, ["vec_id", "rank"])
                 .groupBy("vec_id")
                 .agg(F.avg(ratio).alias("ratio")))
    n_skipped = bad.count()
    return (per_point.agg(F.round(F.avg("ratio"), 6).alias("mean_ratio"),
                          F.count("*").alias("n_points"))
            .withColumn("n_skipped", F.lit(n_skipped).cast("long")))
