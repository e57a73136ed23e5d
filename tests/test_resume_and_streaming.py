"""Checkpoint/resume semantics + incremental streaming ingest."""

import json
import os

import pytest

from distributed_gpu_lsh_using_sycl_spark.config import LshConfig
from distributed_gpu_lsh_using_sycl_spark.sources.fixture import make_fixture_pandas

CFG = LshConfig(num_bands=16, rows_per_band=6)


def _clusters_dict(res):
    return {r["image_id"]: r["cluster_id"] for r in res["clusters"].collect()}


@pytest.fixture(scope="module")
def images_df(spark):
    images, _ = make_fixture_pandas(80, seed=42)
    return spark.createDataFrame(images)


def test_resume_skips_done_stages_and_is_identical(spark, images_df, tmp_path_factory):
    from distributed_gpu_lsh_using_sycl_spark.plans.pipeline import run_dedup

    wh = str(tmp_path_factory.mktemp("wh"))
    r1 = run_dedup(spark, images_df, CFG, warehouse=wh)
    c1 = _clusters_dict(r1)
    # INFO rows are informational metrics (e.g. the down-sample drop
    # count), not stages — only stages carry DONE/SKIPPED semantics
    assert all(m["status"] == "DONE" for m in r1.metrics
               if m["status"] != "INFO")

    # full rerun: everything skipped, same clusters
    r2 = run_dedup(spark, images_df, CFG, warehouse=wh)
    assert all(m["status"] == "SKIPPED" for m in r2.metrics
               if m["status"] != "INFO")
    assert _clusters_dict(r2) == c1

    # partial resume: invalidate the tail stages (simulates a crash after
    # the pairs stage); only those recompute, result identical
    mpath = os.path.join(wh, "_manifest.json")
    with open(mpath) as f:
        manifest = json.load(f)
    for stage in ("edges", "clusters"):
        manifest["stages"][stage]["status"] = "CRASHED"
    with open(mpath, "w") as f:
        json.dump(manifest, f)
    r3 = run_dedup(spark, images_df, CFG, warehouse=wh)
    statuses = {m["stage"]: m["status"] for m in r3.metrics}
    assert statuses["signatures"] == "SKIPPED"
    assert statuses["pairs"] == "SKIPPED"
    assert statuses["edges"] == "DONE"
    assert statuses["clusters"] == "DONE"
    assert _clusters_dict(r3) == c1

    # config change invalidates everything
    r4 = run_dedup(spark, images_df, LshConfig(num_bands=16, rows_per_band=6,
                                               jaccard_threshold=0.6),
                   warehouse=wh)
    assert all(m["status"] == "DONE" for m in r4.metrics
               if m["status"] != "INFO")

    # lineage + metrics tables exist and carry every stage
    lineage = spark.read.parquet(os.path.join(wh, "lineage"))
    assert lineage.select("stage").distinct().count() >= 9
    metrics = spark.read.parquet(os.path.join(wh, "metrics"))
    assert metrics.filter("status = 'DONE'").count() >= 9


def test_streaming_incremental_signatures(spark, tmp_path_factory):
    from distributed_gpu_lsh_using_sycl_spark.operators.signatures import compute_signatures
    from distributed_gpu_lsh_using_sycl_spark.streaming.ingest import signature_stream

    base = tmp_path_factory.mktemp("stream")
    inp, out, ckpt = str(base / "in"), str(base / "out"), str(base / "ckpt")
    os.makedirs(inp)

    images, _ = make_fixture_pandas(60, seed=42)
    chunk1, chunk2 = images.iloc[:40], images.iloc[40:]
    spark.createDataFrame(chunk1).write.mode("overwrite").parquet(os.path.join(inp, "c1"))

    cfg = LshConfig()
    q = signature_stream(spark, inp + "/*", out, ckpt, cfg, available_now=True)
    q.awaitTermination(300)
    got1 = spark.read.parquet(out)
    assert got1.count() == 40

    # second chunk lands; incremental run signs ONLY the new files
    spark.createDataFrame(chunk2).write.mode("overwrite").parquet(os.path.join(inp, "c2"))
    q = signature_stream(spark, inp + "/*", out, ckpt, cfg, available_now=True)
    q.awaitTermination(300)
    got = spark.read.parquet(out)
    assert got.count() == 60

    # streamed signatures == batch signatures (same operator, same rows)
    batch = compute_signatures(spark.createDataFrame(images), cfg)
    bp = batch.select("image_id", "minhash", "simhash").toPandas() \
              .sort_values("image_id").reset_index(drop=True)
    sp = got.select("image_id", "minhash", "simhash").toPandas() \
            .sort_values("image_id").reset_index(drop=True)
    assert (bp["simhash"] == sp["simhash"]).all()
    assert all((a == b) for a, b in zip(bp["minhash"].map(list), sp["minhash"].map(list)))


def test_stateful_incremental_candidates(spark, images_df, tmp_path_factory):
    """The stateful streaming bucket join (applyInPandasWithState) must
    emit, across two availableNow drains, EXACTLY the batch bucket join's
    canonical pair set — each unordered pair once per (band, bucket),
    deduped to the same distinct (a, b) set."""
    from pyspark.sql import functions as F

    from distributed_gpu_lsh_using_sycl_spark.operators.banding import (
        candidate_pairs_from_bands, explode_bands)
    from distributed_gpu_lsh_using_sycl_spark.operators.signatures import (
        compute_signatures)
    from distributed_gpu_lsh_using_sycl_spark.streaming.stateful import (
        candidate_pair_stream)

    base = tmp_path_factory.mktemp("stateful")
    in_dir = str(base / "sigs_in")
    out_dir = str(base / "pairs_out")
    ckpt = str(base / "ckpt")
    os.makedirs(in_dir)

    sigs = (compute_signatures(images_df, CFG, with_image=False)
            .select("image_id", "buckets").localCheckpoint(eager=True))
    # batch truth: canonical distinct pair set from the same bands
    batch = {(r["a"], r["b"]) for r in
             candidate_pairs_from_bands(explode_bands(sigs), CFG).collect()}

    half1 = sigs.filter(F.crc32(F.col("image_id")) % 2 == 0)
    half2 = sigs.filter(F.crc32(F.col("image_id")) % 2 == 1)
    half1.write.mode("append").parquet(in_dir)
    q = candidate_pair_stream(spark, in_dir, out_dir, ckpt, CFG)
    q.awaitTermination(120)
    half2.write.mode("append").parquet(in_dir)
    q = candidate_pair_stream(spark, in_dir, out_dir, ckpt, CFG)
    q.awaitTermination(120)

    got_rows = spark.read.parquet(out_dir).collect()
    got = {(r["a"], r["b"]) for r in got_rows}
    assert got == batch
    # once per (band,bucket): no duplicate emissions under replay-safe state
    keyed = [(r["a"], r["b"], r["band_id"], r["bucket"]) for r in got_rows]
    assert len(keyed) == len(set(keyed))
    # trigger-invariance: force 1-file micro-batches over the SAME input;
    # the emitted distinct pair set must not change (splitting a drain
    # multiplies per-key state round-trips, never alters the semantics)
    out_split = str(base / "pairs_out_split")
    ckpt_split = str(base / "ckpt_split")
    q = candidate_pair_stream(spark, in_dir, out_split, ckpt_split, CFG,
                              max_files_per_trigger=1)
    q.awaitTermination(180)
    got_split = {(r["a"], r["b"]) for r in
                 spark.read.parquet(out_split).collect()}
    assert got_split == batch


def test_streaming_e2e_dedup_equals_batch(spark, tmp_path_factory):
    """Full streaming chain: incremental signature ingest → stateful
    bucket join → batch verify+CC reconcile, over TWO input waves. After
    each cycle the cluster table must equal a from-scratch batch dedup
    over everything seen so far, and the second cycle must be truly
    incremental (signature count grows only by the new wave)."""
    from distributed_gpu_lsh_using_sycl_spark.streaming.e2e import (
        batch_dedup_reference, streaming_dedup_cycle)

    base = tmp_path_factory.mktemp("e2e_stream")
    inp = str(base / "in")
    wh = str(base / "wh")
    os.makedirs(inp)

    images, _ = make_fixture_pandas(80, seed=42)
    wave1, wave2 = images.iloc[:50], images.iloc[50:]

    def clusters_of(df):
        return {r["image_id"]: r["cluster_id"] for r in df.collect()}

    spark.createDataFrame(wave1).write.mode("overwrite") \
        .parquet(os.path.join(inp, "w1"))
    r1 = streaming_dedup_cycle(spark, inp + "/*", wh, CFG)
    assert r1["n_signatures"] == 50
    want1 = clusters_of(batch_dedup_reference(
        spark, spark.createDataFrame(wave1), CFG))
    assert clusters_of(r1["clusters"]) == want1

    spark.createDataFrame(wave2).write.mode("overwrite") \
        .parquet(os.path.join(inp, "w2"))
    r2 = streaming_dedup_cycle(spark, inp + "/*", wh, CFG)
    assert r2["n_signatures"] == 80
    want2 = clusters_of(batch_dedup_reference(
        spark, spark.createDataFrame(images), CFG))
    assert clusters_of(r2["clusters"]) == want2
    # the fixture plants dups -> the equality is not vacuous
    joined = sum(1 for k, v in want2.items() if k != v)
    assert joined > 0
    # incremental reconcile: cycle 2 adjudicates ONLY the pairs cycle 1
    # hadn't seen — the two waves' adjudications partition the distinct
    # accumulated candidate set, and wave-1 pairs are never re-verified
    n_distinct = (spark.read.parquet(os.path.join(wh, "cand_pairs"))
                  .select("a", "b").distinct().count())
    assert r1["n_new_adjudicated"] > 0
    assert r1["n_new_adjudicated"] + r2["n_new_adjudicated"] == n_distinct
    assert r2["n_new_adjudicated"] < n_distinct


def test_streaming_drain_only_then_reconcile_equals_batch(
        spark, tmp_path_factory):
    """Drain-only cycles (reconcile=False) advance signature + candidate
    state without the batch verify+CC pass; one final reconciling cycle
    must still produce exactly the from-scratch batch clusters — CC is a
    fixpoint over ACCUMULATED edges, so skipping intermediate reconciles
    loses nothing (the scheduler regime: many small ingest waves, one
    reconcile per read window)."""
    from distributed_gpu_lsh_using_sycl_spark.streaming.e2e import (
        batch_dedup_reference, streaming_dedup_cycle)

    base = tmp_path_factory.mktemp("drain_only")
    inp = str(base / "in")
    wh = str(base / "wh")
    os.makedirs(inp)

    images, _ = make_fixture_pandas(80, seed=42)
    waves = [images.iloc[:30], images.iloc[30:60], images.iloc[60:]]
    for i, w in enumerate(waves[:-1]):
        spark.createDataFrame(w).write.mode("overwrite") \
            .parquet(os.path.join(inp, f"w{i}"))
        r = streaming_dedup_cycle(spark, inp + "/*", wh, CFG,
                                  reconcile=False)
        assert r["clusters"] is None        # no reconcile ran
    spark.createDataFrame(waves[-1]).write.mode("overwrite") \
        .parquet(os.path.join(inp, "w_last"))
    r = streaming_dedup_cycle(spark, inp + "/*", wh, CFG)
    assert r["n_signatures"] == 80
    want = {row["image_id"]: row["cluster_id"]
            for row in batch_dedup_reference(
                spark, spark.createDataFrame(images), CFG).collect()}
    got = {row["image_id"]: row["cluster_id"]
           for row in r["clusters"].collect()}
    assert got == want
    assert sum(1 for k, v in want.items() if k != v) > 0


def test_state_checkpoint_version_guard(tmp_path):
    """A checkpoint written under another state layout (schema or
    grouping key changed) must be refused with a clear error, not
    resumed into an opaque state-store deserialization failure."""
    from distributed_gpu_lsh_using_sycl_spark.streaming.stateful import (
        STATE_FORMAT_VERSION, _VERSION_FILE, _check_state_version)

    ck = tmp_path / "ckpt"
    _check_state_version(str(ck))  # fresh dir -> created + stamped
    stamp = ck / _VERSION_FILE
    assert stamp.read_text() == str(STATE_FORMAT_VERSION)
    _check_state_version(str(ck))  # matching stamp -> accepted

    stamp.write_text("1")          # older layout -> refused, named
    with pytest.raises(RuntimeError, match="state layout 1"):
        _check_state_version(str(ck))

    # grouping-factor change (same schema version): resuming would
    # silently remap bucket state and MISS pairs -> refused
    import dataclasses

    from distributed_gpu_lsh_using_sycl_spark.streaming.stateful import (
        _state_layout_stamp)
    stamp.write_text(_state_layout_stamp(CFG))
    _check_state_version(str(ck), CFG)  # matching cfg stamp -> accepted
    other = dataclasses.replace(CFG, state_group_buckets=7)
    with pytest.raises(RuntimeError, match="g7"):
        _check_state_version(str(ck), other)
    # signature-chain change (bucket VALUES remap, not just the coarse
    # key): every field that moves a row's (band, bucket) must refuse a
    # resume — prior members would be invisible to new arrivals
    for field, val in [("num_bands", CFG.num_bands + 1),
                       ("rows_per_band", CFG.rows_per_band + 1),
                       ("signature_pool_size", CFG.signature_pool_size + 1),
                       ("bucket_modulus", 105_607),
                       ("shingle_size", CFG.shingle_size + 1),
                       ("seed", CFG.seed + 1)]:
        rechained = dataclasses.replace(CFG, **{field: val})
        with pytest.raises(RuntimeError, match="state layout"):
            _check_state_version(str(ck), rechained)
    stamp.write_text("1")  # restore for the tail of the test

    stamp.unlink()                 # pre-versioning checkpoint with
    (ck / "offsets").mkdir()       # real content -> also refused
    with pytest.raises(RuntimeError, match="pre-versioning"):
        _check_state_version(str(ck))


def test_state_checkpoint_version_guard_rejects_uri(tmp_path):
    """URI checkpoints would silently bypass the local os.path guard
    (os.makedirs would create a bogus local dir) — refuse them loudly."""
    from distributed_gpu_lsh_using_sycl_spark.streaming.stateful import (
        _check_state_version)

    with pytest.raises(ValueError, match="URI"):
        _check_state_version("s3a://bucket/ckpt")


def test_adjudicated_fingerprint_guard(spark, tmp_path_factory):
    """Persisted verdicts are only valid under the config that produced
    them: a cycle under a changed jaccard/hamming config against the same
    warehouse must REFUSE to reuse the adjudicated table (silently
    anti-joining stale verdicts away would yield wrong clusters with no
    error). Same-config cycles keep working."""
    from distributed_gpu_lsh_using_sycl_spark.streaming.e2e import (
        streaming_dedup_cycle)

    base = tmp_path_factory.mktemp("adj_guard")
    inp = str(base / "in")
    wh = str(base / "wh")
    os.makedirs(inp)
    images, _ = make_fixture_pandas(40, seed=42)
    spark.createDataFrame(images).write.mode("overwrite") \
        .parquet(os.path.join(inp, "w1"))
    streaming_dedup_cycle(spark, inp + "/*", wh, CFG)

    other = LshConfig(num_bands=16, rows_per_band=6, jaccard_threshold=0.9)
    with pytest.raises(RuntimeError, match="config fingerprint"):
        streaming_dedup_cycle(spark, inp + "/*", wh, other)

    # unchanged config: still accepted (idempotent re-run)
    r = streaming_dedup_cycle(spark, inp + "/*", wh, CFG)
    assert r["n_signatures"] == 40


def test_adjudicated_compaction_bounds_files(spark, tmp_path_factory,
                                             monkeypatch):
    """Many reconcile cycles must not accrete unbounded small parquet
    files in the adjudicated table (wave appends are compacted once past
    the file bound), and compaction must never change the final clusters
    — they still equal a from-scratch batch dedup over everything."""
    from distributed_gpu_lsh_using_sycl_spark.streaming import e2e
    from distributed_gpu_lsh_using_sycl_spark.streaming.e2e import (
        batch_dedup_reference, streaming_dedup_cycle)

    monkeypatch.setattr(e2e, "_ADJ_COMPACT_FILES", 6)
    base = tmp_path_factory.mktemp("adj_compact")
    inp = str(base / "in")
    wh = str(base / "wh")
    os.makedirs(inp)
    images, _ = make_fixture_pandas(60, seed=42)
    adj_dir = os.path.join(wh, "adjudicated")

    def n_parts():
        return sum(1 for _, _, files in os.walk(adj_dir)
                   for f in files if f.endswith(".parquet"))

    waves = [images.iloc[i * 6:(i + 1) * 6] for i in range(10)]
    r = None
    for i, w in enumerate(waves):
        spark.createDataFrame(w).write.mode("overwrite") \
            .parquet(os.path.join(inp, f"w{i}"))
        r = streaming_dedup_cycle(spark, inp + "/*", wh, CFG)
        # compaction runs at cycle start: bound = threshold + one wave's
        # worth of appended part files (<= shuffle partitions)
        assert n_parts() <= 6 + int(
            spark.conf.get("spark.sql.shuffle.partitions"))
    assert r["n_signatures"] == 60
    want = {row["image_id"]: row["cluster_id"]
            for row in batch_dedup_reference(
                spark, spark.createDataFrame(images), CFG).collect()}
    got = {row["image_id"]: row["cluster_id"]
           for row in r["clusters"].collect()}
    assert got == want


def test_adjudicated_reuse_survives_perf_only_config_change(
        spark, tmp_path_factory):
    """The adjudicated fingerprint covers only verdict-semantic fields:
    retuning a perf knob (here arrow_batch_size) against the same
    warehouse must KEEP the persisted verdicts — a full-config hash would
    brick every warehouse on any tuning change even though the verdicts
    remain valid."""
    import dataclasses

    from distributed_gpu_lsh_using_sycl_spark.streaming.e2e import (
        streaming_dedup_cycle)

    base = tmp_path_factory.mktemp("adj_perf")
    inp = str(base / "in")
    wh = str(base / "wh")
    os.makedirs(inp)
    images, _ = make_fixture_pandas(40, seed=42)
    spark.createDataFrame(images).write.mode("overwrite") \
        .parquet(os.path.join(inp, "w1"))
    r1 = streaming_dedup_cycle(spark, inp + "/*", wh, CFG)
    assert r1["n_new_adjudicated"] > 0

    tuned = dataclasses.replace(CFG, arrow_batch_size=512)
    r2 = streaming_dedup_cycle(spark, inp + "/*", wh, tuned)
    # same wave, perf-only retune: every pair is already adjudicated
    assert r2["n_new_adjudicated"] == 0


def test_adjudicated_compaction_crash_recovery(spark, tmp_path_factory):
    """A crash between compaction's two renames leaves the table at
    .compact.old and nothing live; the next cycle must restore it (and
    re-verify nothing) instead of stamping a fresh dir and silently
    re-adjudicating the world."""
    import shutil

    from distributed_gpu_lsh_using_sycl_spark.streaming.e2e import (
        streaming_dedup_cycle)

    base = tmp_path_factory.mktemp("adj_crash")
    inp = str(base / "in")
    wh = str(base / "wh")
    os.makedirs(inp)
    images, _ = make_fixture_pandas(40, seed=42)
    spark.createDataFrame(images).write.mode("overwrite") \
        .parquet(os.path.join(inp, "w1"))
    r1 = streaming_dedup_cycle(spark, inp + "/*", wh, CFG)
    assert r1["n_new_adjudicated"] > 0
    want = {row["image_id"]: row["cluster_id"]
            for row in r1["clusters"].collect()}

    adj = os.path.join(wh, "adjudicated")
    # simulate the crash window: table moved aside, live path gone
    shutil.move(adj, adj + ".compact.old")
    r2 = streaming_dedup_cycle(spark, inp + "/*", wh, CFG)
    assert r2["n_new_adjudicated"] == 0  # recovered, nothing re-verified
    got = {row["image_id"]: row["cluster_id"]
           for row in r2["clusters"].collect()}
    assert got == want
    assert not os.path.exists(adj + ".compact.old")
