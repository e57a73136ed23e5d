"""Benchmark harness.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "sec", "queries": {name: sec, ...},
   "sf": ..., "scaling": {...}}

Two parts:
1. Headline queries at $SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1)
   on local[$SPARK_GRAFT_CPUS]: the caption-dedup pipeline over documents
   plus representative analytic operators.
2. Strong-scaling evidence (north rule; the sandbox stand-in for N vs 4N
   executors): the signature+banding stage over an identical synthetic
   image fixture at local[8] and local[32] in SEPARATE taskset-pinned
   JVMs, run as INTERLEAVED rounds (8, 32, 8, 32) within one window so a
   noisy-neighbor burst cannot land entirely on one side; reports
   images/sec per round, the steady-state (min-seconds) throughput per
   parallelism, paired per-window efficiencies, and the headline
   efficiency = (ips_32 / ips_8) / 4 from the steady states. Mirrors the
   reference's strong-scaling benchmark (README.md:27-28: speedup 7.6 on
   8 GPUs ≈ 0.95 efficiency). Results also written to BENCH/RUN_LATEST.md.

Worker mode (internal): bench.py --stage-worker --cores N --fixture F
--passes P prints a single JSON line with the stage timing.
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, REPO)

N_IMAGES = int(os.environ.get("DLSH_BENCH_IMAGES", "24000"))
FIXTURE = os.environ.get("DLSH_BENCH_FIXTURE",
                         f"/tmp/dlsh_bench/images_{N_IMAGES}.parquet")


def _spark(cores: int):
    from distributed_gpu_lsh_using_sycl_spark.sources.tables import get_spark

    return get_spark(f"bench-{cores}", parallelism=cores, shuffle_partitions=cores)


def ensure_fixture(cores: int) -> None:
    if os.path.exists(os.path.join(FIXTURE, "_SUCCESS")):
        return
    from distributed_gpu_lsh_using_sycl_spark.sources.fixture import make_fixture_spark

    spark = _spark(cores)
    os.makedirs(os.path.dirname(FIXTURE), exist_ok=True)
    make_fixture_spark(spark, N_IMAGES, seed=42, partitions=cores * 2) \
        .write.mode("overwrite").parquet(FIXTURE)
    spark.stop()


def stage_worker(cores: int, fixture: str, passes: int = 4) -> dict:
    """Signature+banding stage timing at a given parallelism (own JVM)."""
    from pyspark.sql import functions as F

    from distributed_gpu_lsh_using_sycl_spark.config import LshConfig
    from distributed_gpu_lsh_using_sycl_spark.operators.banding import explode_bands
    from distributed_gpu_lsh_using_sycl_spark.operators.signatures import compute_signatures

    cfg = LshConfig()
    spark = _spark(cores)
    images = spark.read.parquet(fixture)
    n = images.count()  # warm the scan / page cache before timing

    def one_pass() -> float:
        t0 = time.perf_counter()
        # persist: signatures feed both the signature sink and the band
        # explode — without it the UDF chain runs twice (like the
        # pipeline's materialized stage table, which this stands in for)
        sigs = compute_signatures(images, cfg).persist()
        # noop sink forces full computation of every column (a bare
        # count() would let Catalyst prune the UDF columns away)
        sigs.write.format("noop").mode("overwrite").save()
        explode_bands(sigs).write.format("noop").mode("overwrite").save()
        secs = time.perf_counter() - t0
        sigs.unpersist()
        return secs

    # Steady-state protocol: python-worker fork + imports + scratch
    # first-touch are per-executor-LIFETIME costs (cluster executors are
    # long-lived), and the sandbox host has multi-second noisy-neighbor
    # bursts — so run a warm-up pass, then `passes` measured passes, and
    # report the min (the unloaded, warm measurement).
    all_passes = [one_pass() for _ in range(passes + 2)]
    secs = min(all_passes[2:])
    spark.stop()
    return {"cores": cores, "n_images": n, "secs": round(secs, 2),
            "images_per_sec": round(n / secs, 1),
            "passes": [round(p, 1) for p in all_passes]}


def _run_worker_subprocess(cores: int, passes: int = 4) -> dict:
    env = dict(os.environ, PYTHONPATH=REPO)
    # PIN the whole process tree (JVM + python workers) to `cores` CPUs:
    # un-pinned, a local[8] JVM's GC/shuffle/Arrow threads and its python
    # workers spread onto the idle 24 cores, inflating the small-N
    # baseline and corrupting the N->4N efficiency ratio.
    out = subprocess.run(
        ["taskset", "-c", f"0-{cores - 1}",
         sys.executable, os.path.abspath(__file__), "--stage-worker",
         "--cores", str(cores), "--fixture", FIXTURE,
         "--passes", str(passes)],
        capture_output=True, text=True, env=env, check=True, timeout=1800)
    return json.loads(out.stdout.strip().splitlines()[-1])


def run_scaling() -> dict:
    """Interleaved A/B rounds: 8, 32, 8, 32 — each its own pinned JVM.

    The headline efficiency uses the per-parallelism STEADY STATE (min
    seconds across both rounds, warm passes only); per-window paired
    efficiencies are reported alongside so the number is auditable — a
    credible ratio must come from measurements taken inside one window,
    not from one cold and one warm run."""
    order = (8, 32, 8, 32)
    rounds = [_run_worker_subprocess(c) for c in order]
    best: dict[int, dict] = {}
    for r in rounds:
        c = r["cores"]
        if c not in best or r["secs"] < best[c]["secs"]:
            best[c] = r
    pair_effs = []
    for i in range(0, len(order) - 1, 2):
        r8, r32 = rounds[i], rounds[i + 1]
        pair_effs.append(round((r32["images_per_sec"] / r8["images_per_sec"]) / 4.0, 3))
    eff = (best[32]["images_per_sec"] / best[8]["images_per_sec"]) / 4.0
    return {"n_images": rounds[0]["n_images"], "order": list(order),
            "rounds": rounds, "w8": best[8], "w32": best[32],
            "paired_efficiencies": pair_effs, "efficiency": round(eff, 3)}


def headline_queries(sf_dir: str, cores: int) -> dict[str, float]:
    import __spark_entry__ as E

    spark = _spark(cores)
    picks = ["dedup_minhash_lsh_pairs", "dedup_substring_pairs", "lcs_window_pairs",
             "doc_simhash_pairs", "cc_clusters", "lang_id", "token_counts",
             "knn_block_matmul_topk", "ann_lsh_topk", "embedding_neardup_lsh_pairs",
             "entropy_lsh_buckets", "mixed_lsh_buckets", "image_phash_pairs",
             "q1_pricing_summary", "revenue_by_nation",
             "topk_per_group", "sessionization", "windowed_events"]
    qs = E.queries()
    # Warm the python worker pool THROUGH the real UDF path: workers are
    # forked lazily and each pays numpy/pandas/engine imports plus scratch
    # first-touch on its first pandas-UDF task (measured 40-70s across 32
    # workers on this sandbox's fault-slow mmap). A plain JVM warm-up does
    # not touch them; run a small signature pass over every core instead.
    from pyspark.sql import functions as F

    from distributed_gpu_lsh_using_sycl_spark.config import LshConfig
    from distributed_gpu_lsh_using_sycl_spark.operators.signatures import (
        compute_signatures)

    warm = (spark.range(cores * 8)
            .repartition(cores)
            .select(F.col("id").alias("doc_id"),
                    F.concat(F.lit("warm up text "), F.col("id")).alias("text")))
    compute_signatures(warm, LshConfig(), id_col="doc_id", text_col="text",
                       with_image=False) \
        .write.format("noop").mode("overwrite").save()
    times: dict[str, float] = {}
    for name in picks:
        t0 = time.perf_counter()
        df = qs[name](spark, sf_dir)
        df.write.format("noop").mode("overwrite").save()
        times[name] = round(time.perf_counter() - t0, 2)
        spark.catalog.clearCache()  # drop persists left by query builders

    # end-to-end caption dedup over documents (flagship)
    from distributed_gpu_lsh_using_sycl_spark.plans.pipeline import run_dedup

    docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
    t0 = time.perf_counter()
    res = run_dedup(spark, docs, E._dedup_cfg(), with_image=False,
                    id_col="doc_id", text_col="text")
    res["clusters"].write.format("noop").mode("overwrite").save()
    times["e2e_caption_dedup"] = round(time.perf_counter() - t0, 2)
    spark.stop()
    return times


def write_bench_md(scaling: dict, times: dict, sf_dir: str) -> None:
    """Per-run snapshot -> BENCH/RUN_LATEST.md. BENCH/BASELINE.md is the
    curated steady-state record (methodology + best observed) and is
    never overwritten by a run."""
    os.makedirs(os.path.join(REPO, "BENCH"), exist_ok=True)
    lines = [
        "# BENCH — this run's measurements (see BASELINE.md for methodology)",
        "",
        f"Input: deterministic synthetic image+caption fixture, {scaling['n_images']} rows",
        "(sources/fixture.py, seed 42); identical parquet input for both runs.",
        "",
        "## Signature+banding stage (the north-rule scaling criterion)",
        "",
        "Protocol: interleaved pinned-JVM rounds (8, 32, 8, 32 cores) in one",
        "window; per round, 2 warm-up + 4 measured passes, min reported.",
        "",
        "| round | parallelism | wall (s) | images/sec | passes (s) |",
        "|---|---|---|---|---|",
    ] + [
        f"| {i} | local[{r['cores']}] | {r['secs']} | {r['images_per_sec']} "
        f"| {r['passes']} |"
        for i, r in enumerate(scaling["rounds"])
    ] + [
        "",
        f"Steady state: local[8] {scaling['w8']['images_per_sec']} img/s, "
        f"local[32] {scaling['w32']['images_per_sec']} img/s; "
        f"paired per-window efficiencies {scaling['paired_efficiencies']}.",
        "",
        f"**Scaling efficiency (N→4N cores) = (ips_32 / ips_8) / 4 = "
        f"{scaling['efficiency']:.3f}** (target ≥ 0.8; reference's own "
        "strong-scaling result: speedup 7.6 on 8 GPUs ≈ 0.95, README.md:27-28).",
        "",
        f"## Headline query times at {sf_dir} (local[{os.environ.get('SPARK_GRAFT_CPUS', '32')}])",
        "",
        "| query | sec |",
        "|---|---|",
    ] + [f"| {k} | {v} |" for k, v in times.items()] + [""]
    with open(os.path.join(REPO, "BENCH", "RUN_LATEST.md"), "w") as f:
        f.write("\n".join(lines))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--stage-worker", action="store_true")
    ap.add_argument("--cores", type=int, default=None)
    ap.add_argument("--fixture", default=FIXTURE)
    ap.add_argument("--passes", type=int, default=4)
    ap.add_argument("--skip-scaling", action="store_true")
    ap.add_argument("--scaling-only", action="store_true")
    args = ap.parse_args()

    if args.stage_worker:
        print(json.dumps(stage_worker(args.cores, args.fixture, args.passes)))
        return

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))

    times = {} if args.scaling_only else headline_queries(sf_dir, cpus)

    scaling = None
    if not args.skip_scaling:
        ensure_fixture(cpus)
        scaling = run_scaling()
        write_bench_md(scaling, times, sf_dir)

    total = round(sum(times.values()), 2)
    out = {
        "metric": "headline_queries_total",
        "value": total,
        "unit": "sec",
        "queries": times,
        "sf": sf_dir,
    }
    if scaling:
        out["scaling"] = scaling
    print(json.dumps(out))


if __name__ == "__main__":
    main()
