"""End-to-end STREAMING dedup: incremental signatures → stateful bucket
join → periodic batch verify + connected-components reconcile.

Composes the three streaming pieces into the continuous-ingest regime's
full contract (the reference is single-shot batch, main.cpp:46-55; this
is the north rule's resumable-pipeline surface driven by streams):

1. ``signature_stream`` (streaming/ingest.py) drains newly-landed input
   files into the ``signatures`` stage table — exactly-once via Spark's
   streaming checkpoint; only NEW files are signed.
2. ``candidate_pair_stream`` (streaming/stateful.py) drains newly-landed
   signatures through the stateful (band, bucket)-keyed incremental
   bucket join — each unordered candidate pair is emitted once per
   bucket across the stream's lifetime.
3. A BATCH reconcile re-verifies the accumulated candidate set (exact
   Jaccard, JVM-side) and re-runs connected components over the verified
   edges, overwriting the ``clusters`` table. CC is a global fixpoint —
   a new edge can merge two old components — so the reconcile is
   deliberately batch over accumulated state, not incremental: it is
   cheap relative to signing (the amortized stage) and always produces
   the same clusters as a from-scratch batch run over everything seen so
   far (asserted in tests/test_resume_and_streaming.py).

Each ``streaming_dedup_cycle`` call is one availableNow drain of stages
1+2 plus one reconcile — the "micro-batch dedup" loop a scheduler would
run continuously.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from distributed_gpu_lsh_using_sycl_spark.config import LshConfig


def _reconcile(spark: SparkSession, sigs: DataFrame,
               cands: DataFrame, cfg: LshConfig) -> DataFrame:
    """Accumulated signatures + candidate pairs -> full cluster
    assignment (verified-edge CC; singletons = self)."""
    from distributed_gpu_lsh_using_sycl_spark.operators.components import (
        assign_clusters)
    from distributed_gpu_lsh_using_sycl_spark.operators.pairs import (
        attach_features, verified_edges, verify_pairs)

    id_type = sigs.schema["image_id"].dataType
    pairs = (cands.select(F.col("a").cast(id_type).alias("a"),
                          F.col("b").cast(id_type).alias("b"))
             .distinct()
             .withColumn("source", F.lit("minhash")))
    verified = verify_pairs(attach_features(pairs, sigs), cfg)
    return assign_clusters(sigs, verified_edges(verified),
                           id_col="image_id")


def streaming_dedup_cycle(spark: SparkSession, input_dir: str,
                          warehouse: str, cfg: LshConfig | None = None,
                          with_image: bool = False,
                          timeout_s: int = 600,
                          state_partitions: int | None = None,
                          reconcile: bool = True) -> dict:
    """One incremental dedup cycle over ``input_dir`` (a parquet dir that
    accumulates input files between cycles). Returns
    ``{"clusters": DataFrame, "n_signatures": int, "n_candidates": int}``
    — clusters is also written to ``<warehouse>/clusters``.

    ``reconcile=False`` drains stages 1+2 only (signatures + candidate
    state advance; clusters table left as-is, returned as None). A
    scheduler ingesting many small waves between reads runs drain-only
    cycles and reconciles once per read window: CC is a global fixpoint
    over ACCUMULATED edges, so the final reconcile alone produces the
    same clusters as reconciling every wave (asserted in
    tests/test_resume_and_streaming.py)."""
    from distributed_gpu_lsh_using_sycl_spark.streaming.ingest import (
        signature_stream)
    from distributed_gpu_lsh_using_sycl_spark.streaming.stateful import (
        candidate_pair_stream)

    cfg = cfg or LshConfig()
    sigs_dir = os.path.join(warehouse, "signatures")
    pairs_dir = os.path.join(warehouse, "cand_pairs")

    q = signature_stream(spark, input_dir, sigs_dir,
                         os.path.join(warehouse, "ckpt_sigs"), cfg,
                         with_image=with_image, available_now=True)
    q.awaitTermination(timeout_s)
    # The stateful join's state-store partition count is captured from
    # spark.sql.shuffle.partitions at the query's FIRST start and pinned
    # in the checkpoint; this knob overrides it for the candidate stream
    # only. Leave None to inherit the session: an interleaved A/B at
    # sf0.1/local[32] measured FEWER partitions strictly slower (best 36s
    # at 32 vs 69s at 8) — the stateful stage is bound by the Python emit
    # over (band,bucket) groups, not by store-commit overhead, so
    # shrinking partitions just forfeits task parallelism. Size it DOWN
    # only when state volume per partition, not compute, is the binding
    # constraint (huge deployments with small per-batch deltas).
    prev = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions",
                   str(state_partitions or prev))
    try:
        q = candidate_pair_stream(spark, sigs_dir, pairs_dir,
                                  os.path.join(warehouse, "ckpt_pairs"), cfg,
                                  available_now=True)
        q.awaitTermination(timeout_s)
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev)

    sigs = spark.read.parquet(sigs_dir)
    try:
        cands = spark.read.parquet(pairs_dir).select("a", "b")
    except Exception:  # no candidate ever emitted yet -> all singletons
        cands = spark.createDataFrame([], "a string, b string")
    if not reconcile:
        return {"clusters": None,
                "n_signatures": sigs.count(),
                "n_candidates": cands.count()}
    clusters = _reconcile(spark, sigs, cands, cfg)
    out_dir = os.path.join(warehouse, "clusters")
    clusters.write.mode("overwrite").parquet(out_dir)
    return {"clusters": spark.read.parquet(out_dir),
            "n_signatures": sigs.count(),
            "n_candidates": cands.count()}


def batch_dedup_reference(spark: SparkSession, images: DataFrame,
                          cfg: LshConfig | None = None,
                          with_image: bool = False) -> DataFrame:
    """The from-scratch batch computation the streaming cycles must
    converge to: same operators (compute_signatures, banding, verify,
    CC), no streams — the equality oracle for the e2e test."""
    from distributed_gpu_lsh_using_sycl_spark.operators.banding import (
        candidate_pairs_from_bands, explode_bands)
    from distributed_gpu_lsh_using_sycl_spark.operators.signatures import (
        compute_signatures)

    cfg = cfg or LshConfig()
    sigs = compute_signatures(images, cfg, with_image=with_image) \
        .localCheckpoint(eager=True)
    cands = candidate_pairs_from_bands(explode_bands(sigs), cfg,
                                       source="minhash").select("a", "b")
    return _reconcile(spark, sigs, cands, cfg)
