"""Larger-scale headline run — the in-sandbox 100x proxy.

Every steady-state record is measured at sf0.1; this tool provides the
next datapoint up: a FACTOR-times larger input derived deterministically
from the sf0.1 tables, the top headline queries timed on it, and the
static-plan markers compared against the sf0.1 plans so AQE/skew plan
flips under real volume are visible.

Scaling construction (deterministic, JVM-side, no external data — the
north rule's synthesize-at-small-scale contract):
- documents: FACTOR replicas; replica k remaps doc_id += k * 10^9 and
  applies a per-replica character SUBSTITUTION CIPHER (alphabet
  rotation by k; replica 0 = identity). A character bijection preserves
  EVERY within-replica statistic the text operators see — word-shingle
  Jaccard, substring containment, char-window collision structure —
  exactly (verified: pair counts scale exactly linearly), while
  cross-replica text shares nothing, so pair density scales linearly
  with data (the honest dedup workload at 10x), not quadratically
  (replica-identical text would fabricate O(K^2) dups; a token-tag
  suffix was measured to INFLATE within-replica char-window collisions
  and grind the substring verify).
- embeddings: FACTOR replicas; replica k remaps vec_id += k * n and
  applies a per-replica ORTHOGONAL transform (coordinate rotation by
  17k mod dims + deterministic sign flips; replica 0 = identity).
  Orthogonality preserves every within-replica dot product / cosine
  EXACTLY (planted neighbor structure intact), while sign flips
  decorrelate replicas (cross-replica cosine ~ 0) — an epsilon
  perturbation would instead make every replica a near-dup of its
  original (cosine ~ 1) and fabricate quadratic pair density.

Usage: python tools/scaled_run.py [--factor 10] [--queries a,b,...]
       [--passes 2] [--out-dir /tmp/dlsh_scaled]
Writes BENCH/RUN_SCALED_x{factor}.md (+ .json) and prints one JSON line.
"""

from __future__ import annotations

import argparse
import json
import os
import re
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

DEFAULT_QUERIES = [
    "e2e_caption_dedup",
    "streaming_dedup_clusters",
    "cc_clusters",
    "embedding_neardup_lsh_pairs",
    "ivf_kcenter_topk_scaledcfg",
    "dedup_minhash_lsh_pairs",
]

MARKERS = {
    "exchanges": r"\bExchange\b",
    "bcast_joins": r"BroadcastHashJoin|BroadcastNestedLoopJoin",
    "smj_joins": r"SortMergeJoin",
    "python": r"ArrowEvalPython|MapInPandas|FlatMapGroupsInPandas",
}


def make_scaled_dir(spark, base: str, out: str, factor: int) -> None:
    from pyspark.sql import functions as F

    from distributed_gpu_lsh_using_sycl_spark.sources.artifacts import (
        source_fingerprint)

    # stamp carries the base snapshot fingerprint: regenerated sf0.1
    # tables must rebuild the scaled copies, not silently reuse ones
    # derived from the old base
    want = (f"base={base} factor={factor} "
            f"fp={source_fingerprint(base)}\n")
    stamp = os.path.join(out, "_SCALED_OK")
    if os.path.exists(stamp):
        with open(stamp) as f:
            if f.read() == want:
                return
        import shutil

        shutil.rmtree(out)
    os.makedirs(out, exist_ok=True)
    docs = spark.read.parquet(os.path.join(base, "documents.parquet"))
    reps = spark.range(factor).select(F.col("id").cast("int").alias("rep"))
    alpha = "abcdefghijklmnopqrstuvwxyz"
    # Per-replica AFFINE letter bijection i -> (a*i + b) mod 26 with a
    # coprime to 26: k < 26 is the pure rotation (a=1, b=k; replica 0 =
    # identity), k >= 26 steps the multiplier — a plain rotation would
    # degenerate to the IDENTITY at every k % 26 == 0 (replica 26
    # byte-identical to replica 0, fabricating exactly the O(K^2)
    # cross-replica dups this construction exists to avoid). 12
    # multipliers x 26 shifts = 312 distinct bijections, hence the bound.
    coprimes = [1, 3, 5, 7, 9, 11, 15, 17, 19, 21, 23, 25]
    if factor > len(coprimes) * 26:
        raise ValueError(
            f"--factor {factor} exceeds the {len(coprimes) * 26} distinct "
            "per-replica cipher bijections; replicas would repeat and "
            "fabricate cross-replica dup pairs")
    ciphered = F.col("text")
    for k in range(1, factor):  # rep 0 = identity
        a, b = coprimes[k // 26], k % 26
        perm = "".join(alpha[(a * i + b) % 26] for i in range(26))
        ciphered = F.when(F.col("rep") == k,
                          F.translate(F.col("text"), alpha, perm)) \
            .otherwise(ciphered)
    (docs.crossJoin(reps)
     .select((F.col("doc_id") + F.col("rep").cast("long") * 1_000_000_000)
             .alias("doc_id"),
             ciphered.alias("text"),
             "lang", "source", "n_chars")
     .repartition(32)
     .write.mode("overwrite")
     .parquet(os.path.join(out, "documents.parquet")))

    emb = spark.read.parquet(os.path.join(base, "embeddings.parquet"))
    n = emb.count()
    dims = len(emb.select("embedding").first()[0])
    # orthogonal per-replica transform: rotate coordinates by 17*rep mod
    # dims, flip signs by a deterministic per-(rep, dim) parity; rep 0 is
    # the identity so the original table embeds verbatim
    sign = lambda i: (  # noqa: E731
        F.lit(1.0) - F.lit(2.0) * F.pmod(
            (F.col("rep") * 131 + i * 17 + F.pmod(F.col("rep") * i, F.lit(7))),
            F.lit(2)).cast("double"))
    rotated = F.transform(
        F.sequence(F.lit(0), F.lit(dims - 1)),
        lambda i: F.element_at(
            F.col("embedding").cast("array<double>"),
            (F.pmod(i + F.col("rep") * 17, F.lit(dims)) + 1).cast("int"))
        * sign(i))
    (emb.crossJoin(reps)
     .select((F.col("vec_id") + F.col("rep").cast("long") * n)
             .alias("vec_id"),
             F.when(F.col("rep") == 0,
                    F.col("embedding").cast("array<double>"))
             .otherwise(rotated).cast("array<float>").alias("embedding"),
             "label")
     .repartition(32)
     .write.mode("overwrite")
     .parquet(os.path.join(out, "embeddings.parquet")))
    with open(stamp, "w") as f:
        f.write(want)


def plan_markers(df) -> dict:
    jvm = df.sparkSession._jvm
    txt = jvm.org.apache.spark.sql.api.python.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted")
    return {k: len(re.findall(rx, txt)) for k, rx in MARKERS.items()}


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--base", default="/root/testdata/sf0.1")
    ap.add_argument("--out-dir", default=None)
    ap.add_argument("--factor", type=int, default=10)
    ap.add_argument("--passes", type=int, default=2)
    ap.add_argument("--queries", default=",".join(DEFAULT_QUERIES))
    ap.add_argument("--force", action="store_true",
                    help="re-time queries already in the record")
    args = ap.parse_args()
    out = args.out_dir or f"/tmp/dlsh_scaled_x{args.factor}"

    import __spark_entry__ as E
    from pyspark.sql import functions as F

    from distributed_gpu_lsh_using_sycl_spark.config import LshConfig
    from distributed_gpu_lsh_using_sycl_spark.operators.signatures import (
        compute_signatures)
    from distributed_gpu_lsh_using_sycl_spark.sources.tables import get_spark

    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = get_spark(f"scaled-x{args.factor}", parallelism=cpus,
                      shuffle_partitions=cpus)
    make_scaled_dir(spark, args.base, out, args.factor)
    # warm the python worker pool through the real UDF path (bench.py
    # protocol)
    warm = (spark.range(cpus * 8).repartition(cpus)
            .select(F.col("id").alias("doc_id"),
                    F.concat(F.lit("warm "), F.col("id")).alias("text")))
    compute_signatures(warm, LshConfig(), id_col="doc_id",
                       text_col="text", with_image=False) \
        .write.format("noop").mode("overwrite").save()

    qs = E.queries()

    def q_ivf_kcenter_scaledcfg(spark, sf_dir):
        """q_ivf_kcenter_topk with the quantizer sized for the input —
        the headline query pins n_centroids=16 for oracle parity, but
        the operator's scale contract (embedding.ivf_topk docstring)
        grows n_centroids as sqrt(n): per-task candidate work stays
        O(n/sqrt(n) * nprobe) instead of O(n) per probe."""
        import math

        from distributed_gpu_lsh_using_sycl_spark.operators.embedding import (
            ivf_topk, kcenter_codebook)
        e = spark.read.parquet(os.path.join(sf_dir, "embeddings.parquet")) \
            .select("vec_id", F.col("embedding").cast("array<double>")
                    .alias("v"))
        nc = max(16, int(math.sqrt(e.count())))
        cents = kcenter_codebook(
            e, os.path.join(sf_dir, "embeddings.parquet"), n_centroids=nc,
            rounds=2)
        return ivf_topk(e, k=5, n_centroids=nc, nprobe=4, cents=cents)

    qs = dict(qs)
    qs["ivf_kcenter_topk_scaledcfg"] = q_ivf_kcenter_scaledcfg
    names = [q for q in args.queries.split(",") if q]
    rec = {}
    try:
        with open(os.path.join(REPO, "BENCH", "steady_state.json")) as f:
            rec = json.load(f).get("queries", {})
    except OSError:
        pass
    json_path = os.path.join(REPO, "BENCH",
                             f"RUN_SCALED_x{args.factor}.json")
    result: dict = {"factor": args.factor, "base": args.base,
                    "cpus": cpus, "queries": {}, "plans": {}}
    # merge: always reuse the prior record; --force re-times the NAMED
    # queries only (never discards other queries' rows)
    try:
        with open(json_path) as f:
            prior = json.load(f)
        if prior.get("factor") == args.factor:
            result["queries"].update(prior.get("queries", {}))
            result["plans"].update(prior.get("plans", {}))
    except OSError:
        pass

    # Builders that RUN their pipeline eagerly and return a read of the
    # output table: invoking them costs a full end-to-end run, and the
    # returned frame's plan is a trivial parquet scan — static markers
    # would say nothing about the dedup plan, so skip them (runtime AQE
    # decisions for these live in their own BENCH records).
    eager_builders = {"e2e_caption_dedup", "streaming_dedup_clusters"}

    def timed(name, sf_dir, passes):
        walls, df = [], None
        for _ in range(passes):
            t0 = time.perf_counter()
            df = qs[name](spark, sf_dir)
            df.write.format("noop").mode("overwrite").save()
            walls.append(round(time.perf_counter() - t0, 2))
            spark.catalog.clearCache()
        return walls, df

    for name in names:
        r = result["queries"].get(name, {})
        if args.force:
            r = {}
        if "walls" not in r:
            r["walls"], scaled_df = timed(name, out, args.passes)
            r["best"] = min(r["walls"])
            # static-plan markers at BOTH scales, same session: a marker
            # delta = a plan flip under volume (AQE broadcast decisions
            # show at runtime, not here; exchange/python counts still
            # flag structure changes). Frames are REUSED from the timed
            # passes / built lazily — never a fresh eager-builder run.
            if name in eager_builders:
                result["plans"][name] = {
                    "skipped": "eager builder — returned frame is a "
                               "plain output-table scan"}
            else:
                result["plans"][name] = {
                    "scaled": plan_markers(scaled_df),
                    "sf0.1": plan_markers(qs[name](spark, args.base)),
                }
        if name not in rec and "base_best" not in r:
            # *_scaledcfg variants have no steady-state record; time the
            # same (n-adaptive) query on the base tables so the growth
            # column compares like against like
            base_walls, _ = timed(name, args.base, args.passes)
            r["base_walls"] = base_walls
            r["base_best"] = min(base_walls)
        result["queries"][name] = r
        print(f"SCALED {name}: {r['walls']} (best {r['best']}"
              + (f", base {r['base_best']}" if "base_best" in r else "")
              + ")", flush=True)
    spark.stop()

    md = [f"# Scaled headline run — {args.factor}x sf0.1 "
          f"(~sf{args.factor / 10:g}-equivalent)", "",
          f"Input: deterministic {args.factor}x replication of sf0.1 "
          "documents/embeddings (replica k: doc ids remapped; text under "
          "a per-replica character substitution cipher — a bijection, so "
          "every within-replica statistic the text operators see is "
          "preserved EXACTLY while cross-replica text shares nothing; "
          "embeddings under a per-replica orthogonal transform — "
          "within-replica dot products exact, cross-replica cosine ~ 0). "
          "Pair density therefore scales linearly with data — the honest "
          f"dedup workload at {args.factor}x, not a fabricated O(K^2) "
          "blowup. Protocol: "
          f"{args.passes} passes per query on local[{cpus}], best wall "
          "reported; pass 1 includes first-touch/artifact training. "
          "`base` column = steady-state sf0.1 record where one exists, "
          "else the same (n-adaptive) query timed on the sf0.1 tables "
          "in this window. Growth below ~1.2x at small factors reads as "
          "fixed-cost dominance plus warm-session vs cold-record window "
          "variance, not sublinear work.", "",
          "| query | walls (s) | best (s) | base sf0.1 (s) | growth @"
          f"{args.factor}x data | plan flips |",
          "|---|---|---|---|---|---|"]
    for name, r in result["queries"].items():
        pl = result["plans"].get(name, {})
        if "sf0.1" in pl and "scaled" in pl:
            diffs = [f"{k}: {pl['sf0.1'][k]}→{pl['scaled'][k]}"
                     for k in MARKERS if pl["sf0.1"][k] != pl["scaled"][k]]
            flips = "; ".join(diffs) or "none (static plans identical)"
        else:
            # eager builders carry {"skipped": reason} instead of marker
            # dicts (their returned frame is a plain output-table scan)
            flips = pl.get("skipped", "—")
        base = rec.get(name, r.get("base_best"))
        growth = f"{r['best'] / base:.1f}x" if base else "—"
        md.append(f"| {name} | {r['walls']} | {r['best']} | "
                  f"{base or '—'} | {growth} | {flips} |")
    md_path = os.path.join(REPO, "BENCH", f"RUN_SCALED_x{args.factor}.md")
    with open(md_path, "w") as f:
        f.write("\n".join(md) + "\n")
    with open(json_path, "w") as f:
        json.dump(result, f, indent=1, sort_keys=True)
    print(json.dumps({"metric": f"scaled_x{args.factor}_best_total",
                      "value": round(sum(r["best"] for r in
                                         result["queries"].values()), 2),
                      "unit": "sec",
                      "queries": {k: v["best"]
                                  for k, v in result["queries"].items()}}))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
