"""Candidate-pair verification — the distance predicate of the pipeline.

Analog of the reference's theta-join predicate (squared L2,
``hash_tables.hpp:586-592``) with the north rule's measures: exact
Jaccard over distinct shingle CRCs, and Hamming over phash/simhash.
Everything here is JVM-side built-ins (array_intersect / bit_count in
whole-stage codegen) — no Python in the verify hot path at all, which
beats even a pandas UDF.

Like the reference defers sqrt until after search (deferred-monotone
rewrite, nearest_neighbors.cpp:126-135), we compute thresholds on integer
intersection counts / popcounts and only materialize the float jaccard in
the output.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from distributed_gpu_lsh_using_sycl_spark.config import LshConfig


def attach_features(pairs: DataFrame, signatures: DataFrame) -> DataFrame:
    """Rehydrate (a, b) with both rows' features. Two hash-joins on id —
    signatures are pre-shuffled once per side; at 1000-executor scale this
    is the standard rehydration pattern and both joins share the exchange
    when signatures are bucketed by image_id."""
    fa = signatures.select(
        F.col("image_id").alias("a"), F.col("shingles").alias("sh_a"),
        F.col("phash").alias("ph_a"), F.col("simhash").alias("sim_a"))
    fb = signatures.select(
        F.col("image_id").alias("b"), F.col("shingles").alias("sh_b"),
        F.col("phash").alias("ph_b"), F.col("simhash").alias("sim_b"))
    return pairs.join(fa, "a").join(fb, "b")


def verify_pairs(pairs_with_features: DataFrame, cfg: LshConfig) -> DataFrame:
    """-> (a, b, jaccard, hamming_phash, hamming_simhash, source, verified)."""
    inter = F.size(F.array_intersect("sh_a", "sh_b"))
    union = F.size("sh_a") + F.size("sh_b") - inter
    jaccard = F.when(union > 0, inter.cast("double") / union.cast("double")) \
               .otherwise(F.lit(0.0))
    # text-only runs carry NULL phash/simhash: coalesce to 64 (max distance)
    # so the Hamming clauses are cleanly false, never three-valued.
    ham_ph = F.coalesce(F.bit_count(F.col("ph_a").bitwiseXOR(F.col("ph_b"))), F.lit(64))
    ham_sim = F.coalesce(F.bit_count(F.col("sim_a").bitwiseXOR(F.col("sim_b"))), F.lit(64))
    out = (
        pairs_with_features
        .withColumn("jaccard", jaccard)
        .withColumn("hamming_phash", ham_ph.cast("int"))
        .withColumn("hamming_simhash", ham_sim.cast("int"))
        .withColumn(
            "verified",
            (F.col("jaccard") >= F.lit(cfg.jaccard_threshold))
            | (F.col("hamming_phash") <= F.lit(cfg.hamming_threshold))
            | (F.col("hamming_simhash") <= F.lit(cfg.hamming_threshold))
            | F.col("source").contains("substring"),
        )
        .select("a", "b", "jaccard", "hamming_phash", "hamming_simhash",
                "source", "verified")
    )
    return out


def verified_edges(verified: DataFrame) -> DataFrame:
    """Distinct undirected edges for connected components."""
    return (verified.filter("verified")
            .select("a", "b")
            .distinct())


def merge_candidates(*pair_dfs: DataFrame) -> DataFrame:
    """Union candidate sets from the MinHash / SimHash / substring paths,
    keeping one row per (a, b) with the sources concatenated — so a pair
    is verified once no matter how many paths surfaced it (the reference's
    dedup-before-distance rewrite, hash_tables.hpp:547-557)."""
    from functools import reduce

    all_pairs = reduce(lambda x, y: x.unionByName(y), pair_dfs)
    return (all_pairs.groupBy("a", "b")
            .agg(F.array_join(F.array_sort(F.collect_set("source")), "+").alias("source")))
