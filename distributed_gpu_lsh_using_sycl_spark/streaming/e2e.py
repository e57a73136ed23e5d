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
3. An INCREMENTAL batch reconcile: candidate pairs already adjudicated
   (verified or rejected) in a previous cycle are persisted in the
   ``adjudicated`` table; each cycle anti-joins the accumulated
   candidates against it and runs the expensive verification
   (signature rehydration + exact Jaccard/Hamming, JVM-side) ONLY over
   the not-yet-adjudicated pairs — so verify work is proportional to
   the new wave, not to everything ever seen. Connected components
   then re-run over the FULL verified-edge set: CC is a global
   fixpoint — a new edge can merge two old components — so the
   cluster assignment is deliberately recomputed from all verified
   edges, and always equals a from-scratch batch run over everything
   seen so far (asserted in tests/test_resume_and_streaming.py).
   Adjudications are append-only and idempotent: a crash between the
   append and the cluster write at worst re-verifies one wave (the
   anti-join skips whatever landed) or leaves duplicate adjudication
   rows, which the distinct() in verified_edges absorbs. The table is
   config-fingerprint stamped (_check_adj_fingerprint — a threshold
   change refuses to reuse stale verdicts instead of silently merging
   wrong clusters) and compacted once its wave-append file count passes
   _ADJ_COMPACT_FILES, so a scheduler running thousands of cycles never
   accretes unbounded small files.

Each ``streaming_dedup_cycle`` call is one availableNow drain of stages
1+2 plus one reconcile — the "micro-batch dedup" loop a scheduler would
run continuously.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from distributed_gpu_lsh_using_sycl_spark.config import LshConfig


def _await_drained(q, timeout_s: int) -> None:
    """Block until the availableNow query terminates; if it outlives the
    timeout, STOP it and raise instead of proceeding — the cycle's next
    step batch-reads the stage tables, and reading them while the stream
    is still committing would yield partial signatures/candidates with no
    error at all (the worst failure mode: silently wrong clusters)."""
    if not q.awaitTermination(timeout_s):
        q.stop()
        q.awaitTermination()
        raise TimeoutError(
            f"streaming stage {q.name or q.id} did not drain within "
            f"{timeout_s}s; stopped it rather than read partial stage tables")


#: Adjudicated-table layout/semantics version. BUMP whenever the
#: verify_pairs output schema changes — persisted verdicts written under
#: another layout must not be silently reused.
ADJ_FORMAT_VERSION = 1
_ADJ_STAMP_FILE = "_DLSH_ADJ_FINGERPRINT"
#: Compact the adjudicated table once its parquet part-file count passes
#: this bound — append-only waves otherwise grow file listings and footer
#: reads without limit at scheduler cycle counts (thousands of waves).
_ADJ_COMPACT_FILES = 48


def _adj_fingerprint(cfg: LshConfig) -> str:
    """What a persisted verdict's validity ACTUALLY depends on: the
    adjudicated layout version plus the verdict-semantic config fields —
    the thresholds verify_pairs applies and the shingle size the compared
    features were built with. Perf-only knobs (shuffle partitions, Arrow
    batch size, state grouping, salting) must NOT invalidate the table:
    hashing the full config would brick every existing warehouse on a
    tuning change even though all persisted verdicts remain valid."""
    import hashlib as _hashlib
    import json as _json

    sem = {"shingle_size": cfg.shingle_size,
           "jaccard_threshold": cfg.jaccard_threshold,
           "hamming_threshold": cfg.hamming_threshold}
    blob = _json.dumps(sem, sort_keys=True).encode()
    return f"v{ADJ_FORMAT_VERSION}:{_hashlib.sha256(blob).hexdigest()[:16]}"


def _check_adj_fingerprint(adjudicated_dir: str, cfg: LshConfig) -> None:
    """Stamp a fresh adjudicated dir with the config fingerprint; refuse a
    non-empty one stamped otherwise (or pre-stamp) — the anti-join would
    otherwise silently reuse verdicts computed under a different
    jaccard/hamming config and the clusters would come out wrong with no
    error at all (the exact failure _check_state_version guards for the
    state store). Local-FS only, same contract as _check_state_version."""
    if "://" in adjudicated_dir:
        raise ValueError(
            f"adjudicated dir {adjudicated_dir!r} is a URI; the config-"
            "fingerprint guard only supports local paths — a URI would "
            "silently bypass it.")
    # Crash recovery for _compact_adjudicated's dir swap: a death between
    # its two renames leaves the whole table at .compact.old and nothing
    # at the live path — restore it BEFORE the has-data probe, or this
    # function would stamp a fresh empty dir and every persisted verdict
    # would be silently re-verified from scratch.
    old = adjudicated_dir.rstrip("/") + ".compact.old"
    if os.path.isdir(old):
        import shutil

        if _parquet_dir_has_data(adjudicated_dir):
            # crash fell between publish and cleanup: live table is
            # intact, the pre-compaction copy is now redundant
            shutil.rmtree(old, ignore_errors=True)
        else:
            shutil.rmtree(adjudicated_dir, ignore_errors=True)
            os.rename(old, adjudicated_dir)
    want = _adj_fingerprint(cfg)
    stamp = os.path.join(adjudicated_dir, _ADJ_STAMP_FILE)
    if _parquet_dir_has_data(adjudicated_dir):
        have = None
        if os.path.exists(stamp):
            with open(stamp) as f:
                have = f.read().strip()
        if have != want:
            raise RuntimeError(
                f"adjudicated table {adjudicated_dir!r} was written under "
                f"config fingerprint {have or 'pre-versioning'}, but this "
                f"cycle runs under {want} (LshConfig thresholds/schema "
                "changed). Reusing those verdicts would silently produce "
                "wrong clusters — delete the adjudicated dir (verdicts "
                "will be recomputed from the candidate table) or restore "
                "the original config.")
        return
    os.makedirs(adjudicated_dir, exist_ok=True)
    with open(stamp, "w") as f:
        f.write(want)


def _compact_adjudicated(spark: SparkSession, adjudicated_dir: str) -> None:
    """Rewrite the adjudicated table into O(shuffle-partition) files once
    the append-only wave files pass _ADJ_COMPACT_FILES. Runs at cycle
    START (before the prior-verdicts read), so no live plan points at the
    replaced files. distinct() during the rewrite absorbs the duplicate
    rows a crash between append and cluster-write can leave (documented
    idempotence), shrinking the table to its logical content."""
    parts = [os.path.join(r, f)
             for r, _, files in os.walk(adjudicated_dir)
             for f in files if f.endswith(".parquet")]
    if len(parts) <= _ADJ_COMPACT_FILES:
        return
    import shutil

    df = spark.read.parquet(adjudicated_dir).distinct()
    tmp = adjudicated_dir.rstrip("/") + ".compact.tmp"
    old = adjudicated_dir.rstrip("/") + ".compact.old"
    shutil.rmtree(tmp, ignore_errors=True)
    # the write executes the read — source files are still in place here
    df.coalesce(4).write.mode("overwrite").parquet(tmp)
    stamp = os.path.join(adjudicated_dir, _ADJ_STAMP_FILE)
    if os.path.exists(stamp):
        shutil.copy(stamp, os.path.join(tmp, _ADJ_STAMP_FILE))
    shutil.rmtree(old, ignore_errors=True)
    os.rename(adjudicated_dir, old)
    os.rename(tmp, adjudicated_dir)
    shutil.rmtree(old)


#: advisory bytes per ingest split for the python signing stage — much
#: smaller than a scan-stage advisory (the UDF is compute-bound, not
#: IO-bound), so small waves still fan out across several workers.
_INGEST_SPLIT_BYTES = 8 * 1024 * 1024
#: floor so a tiny wave never signs serially (a one-file 2.5k-doc wave
#: measured 3.5s on 1 core vs ~1.2s spread)
_MIN_WAVE_PARTITIONS = 8


def _adaptive_partitions(spark: SparkSession, input_dir: str) -> int:
    """SCALE-ADAPTIVE partition count for the streaming stages: derived
    from the wave's input bytes (advisory-size rule, guide §2.2/§6), not
    from the local core count. Small waves take few partitions (fewer
    state-store commits, fewer task launches, fewer output files per
    micro-batch — measured ~2x on the sf0.1 two-wave cycle vs the
    core-count constant); big waves grow to the session parallelism
    exactly as before. Local-FS sizing, same contract as the rest of
    this module; a URI input falls back to the session parallelism."""
    par = spark.sparkContext.defaultParallelism
    root = input_dir[:-2] if input_dir.endswith("/*") else input_dir
    if "://" in root or not os.path.isdir(root):
        return par
    total = 0
    for r, _, files in os.walk(root):
        for f in files:
            if not f.startswith(("_", ".")):
                try:
                    total += os.path.getsize(os.path.join(r, f))
                except OSError:
                    pass
    want = max(_MIN_WAVE_PARTITIONS,
               -(-total // _INGEST_SPLIT_BYTES))  # ceil div
    return int(min(par, want))


def _parquet_dir_rows(path: str) -> int:
    """Exact row count of a local parquet dir from the file footers — no
    Spark job. The cycle's returned n_signatures/n_candidates metrics
    previously cost one full count() job each per cycle; footer metadata
    is the same number for the append-only stage tables (local-FS
    contract, same as every other path check in this module)."""
    import pyarrow.parquet as _pq

    total = 0
    for r, _, files in os.walk(path):
        for f in files:
            if f.endswith(".parquet"):
                total += _pq.ParquetFile(os.path.join(r, f)).metadata.num_rows
    return total


def _parquet_dir_has_data(path: str) -> bool:
    """True iff ``path`` is a directory with at least one parquet part —
    the only condition under which the candidate table is batch-readable.
    A local-FS check suffices here (the sandbox warehouse is a local
    dir); a real deployment points the warehouse at an Iceberg table
    whose existence the catalog answers (sources/tables.py)."""
    if not os.path.isdir(path):
        return False
    return any(f.endswith(".parquet")
               for _, _, files in os.walk(path) for f in files)


#: Default bound for the reconcile's driver union-find fast path: edge
#: sets at or under this are solved driver-side (Arrow-collected id
#: pairs — tens of MB at the bound), larger ones take the distributed
#: star loop. Callers with bigger drivers raise it per call.
RECONCILE_SMALL_GRAPH_EDGES = 200_000


def _reconcile(spark: SparkSession, sigs: DataFrame,
               cands: DataFrame, cfg: LshConfig,
               adjudicated_dir: str | None = None,
               small_graph_threshold: int = RECONCILE_SMALL_GRAPH_EDGES,
               ) -> tuple[DataFrame, int]:
    """Accumulated signatures + candidate pairs -> (full cluster
    assignment, n pairs newly verified this cycle).

    With ``adjudicated_dir`` the verification is INCREMENTAL: pairs
    whose verdict (verified True/False) is already persisted there are
    anti-joined away, only the remainder pays the rehydration join +
    Jaccard/Hamming predicates, and the new verdicts are appended.
    Signatures are immutable once written (exactly-once ingest, one
    signature per image_id), so a verdict never needs revisiting. CC
    stays global over ALL verified edges (singletons = self)."""
    from distributed_gpu_lsh_using_sycl_spark.operators.components import (
        assign_clusters)
    from distributed_gpu_lsh_using_sycl_spark.operators.pairs import (
        attach_features, verified_edges, verify_pairs)

    id_type = sigs.schema["image_id"].dataType
    pairs = (cands.select(F.col("a").cast(id_type).alias("a"),
                          F.col("b").cast(id_type).alias("b"))
             .distinct()
             .withColumn("source", F.lit("minhash")))
    prior = None
    if adjudicated_dir:
        _check_adj_fingerprint(adjudicated_dir, cfg)
        _compact_adjudicated(spark, adjudicated_dir)  # before any read
        if _parquet_dir_has_data(adjudicated_dir):
            prior = spark.read.parquet(adjudicated_dir)
            pairs = pairs.join(prior.select("a", "b"), ["a", "b"],
                               "left_anti")
    new_verdicts = verify_pairs(attach_features(pairs, sigs), cfg)
    if adjudicated_dir:
        # Materialize the wave ONCE before appending: the append must not
        # share a plan with a read of the same directory (on an object
        # store — or with plan recomputation — the write job could list
        # its own partial output). The checkpointed copy also yields the
        # wave-size metric for free, with no full-table counts.
        new_verdicts = new_verdicts.localCheckpoint(eager=True)
        n_new = new_verdicts.count()
        new_verdicts.write.mode("append").parquet(adjudicated_dir)
        # prior's file index was pinned before the append; union it with
        # the materialized wave instead of re-listing the whole table.
        all_verdicts = (prior.unionByName(new_verdicts)
                        if prior is not None else new_verdicts)
    else:
        all_verdicts = new_verdicts
        n_new = -1  # not tracked in the non-persistent mode
    # Reconcile cycles run CONTINUOUSLY; at wave-scale edge counts the
    # star loop's ~4 rounds of shuffle-stage scheduling latency dominate
    # CC (measured 2.2s for 256 edges). Opt into the driver union-find
    # fast path under a caller-tunable bound (identical assignments,
    # pinned in tests); past the bound the distributed loop engages
    # automatically.
    return (assign_clusters(sigs, verified_edges(all_verdicts),
                            id_col="image_id",
                            small_graph_threshold=small_graph_threshold),
            n_new)


def streaming_dedup_cycle(spark: SparkSession, input_dir: str,
                          warehouse: str, cfg: LshConfig | None = None,
                          with_image: bool = False,
                          timeout_s: int = 600,
                          state_partitions: int | None = None,
                          reconcile: bool = True,
                          ingest_partitions: int | None = None,
                          small_graph_threshold: int =
                          RECONCILE_SMALL_GRAPH_EDGES) -> dict:
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

    # ingest_partitions: spread the signature UDF when waves land as few
    # files (see signature_stream — the file source parallelizes by file,
    # so a narrow wave otherwise signs on a fraction of the cores).
    # Default: SCALE-ADAPTIVE from the wave's bytes (_adaptive_partitions)
    # — a core-count constant over-partitions small waves (32 state
    # commits + 32 files per micro-batch for a 2 MB wave) and a
    # fixed small number would serialize big ones.
    if ingest_partitions is None:
        ingest_partitions = _adaptive_partitions(spark, input_dir)
    if state_partitions is None:
        state_partitions = ingest_partitions
    q = signature_stream(spark, input_dir, sigs_dir,
                         os.path.join(warehouse, "ckpt_sigs"), cfg,
                         with_image=with_image, available_now=True,
                         ingest_partitions=ingest_partitions)
    _await_drained(q, timeout_s)
    # The stateful join's state-store partition count is captured from
    # spark.sql.shuffle.partitions at the query's FIRST start and pinned
    # in the checkpoint; this knob overrides it for the candidate stream
    # only. Default: the same scale-adaptive count as the ingest stage.
    # (History: round 5 measured fewer partitions strictly SLOWER — the
    # stage was bound by the per-row Python emit, so shrinking partitions
    # forfeited task parallelism. Round 6 vectorized the emit's common
    # path, after which the per-partition fixed costs — state-store
    # get/commit, delta files, task launches — dominate small waves and
    # the byte-derived count measured ~2x faster on the sf0.1 two-wave
    # cycle; big waves still grow to the session parallelism.)
    prev = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions",
                   str(state_partitions or prev))
    try:
        q = candidate_pair_stream(spark, sigs_dir, pairs_dir,
                                  os.path.join(warehouse, "ckpt_pairs"), cfg,
                                  available_now=True)
        _await_drained(q, timeout_s)
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev)

    sigs = spark.read.parquet(sigs_dir)
    # An empty-so-far candidate table is normal (no pair emitted yet ->
    # all singletons); any OTHER read failure (corrupt/partial parquet,
    # permissions, transient FS error) must propagate — swallowing it
    # would silently overwrite the clusters table with all-singletons.
    if _parquet_dir_has_data(pairs_dir):
        cands = spark.read.parquet(pairs_dir).select("a", "b")
    else:
        cands = spark.createDataFrame([], "a string, b string")
    if not reconcile:
        return {"clusters": None,
                "n_signatures": _parquet_dir_rows(sigs_dir),
                "n_candidates": _parquet_dir_rows(pairs_dir)}
    clusters, n_new = _reconcile(
        spark, sigs, cands, cfg,
        adjudicated_dir=os.path.join(warehouse, "adjudicated"),
        small_graph_threshold=small_graph_threshold)
    out_dir = os.path.join(warehouse, "clusters")
    # a handful of right-sized files instead of one per shuffle
    # partition: the table is O(|V|) skinny rows, and every consumer
    # re-reads it (listing + footer cost per cycle)
    clusters.coalesce(4).write.mode("overwrite").parquet(out_dir)
    return {"clusters": spark.read.parquet(out_dir),
            "n_signatures": _parquet_dir_rows(sigs_dir),
            "n_candidates": _parquet_dir_rows(pairs_dir),
            "n_new_adjudicated": n_new}


def unload_state_stores(spark: SparkSession) -> None:
    """Stop the executor-side StateStore machinery: unload every loaded
    provider and cancel the background maintenance task. Call AFTER the
    streaming queries have terminated and BEFORE deleting their
    checkpoint dirs — the maintenance thread otherwise keeps snapshotting
    loaded state asynchronously and races the deletion (observed as a
    StateStore$MaintenanceTask stack trace on stderr during teardown).
    Spark lazily restarts the machinery on the next stateful query, so
    this is safe between runs in one session."""
    spark._jvm.org.apache.spark.sql.execution.streaming.state.StateStore.stop()


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
    return _reconcile(spark, sigs, cands, cfg)[0]
