"""Parameter auto-tuner — the analog of the reference's Optuna TPE search
(utility_scripts/tune_parameter.py:40-146: maximize recall over hash_pool
size, num_hash_functions, num_hash_tables, hash_table_size, w).

The sandbox has no optuna, so this is a DETERMINISTIC seeded random
search with the same objective shape: maximize planted-dup-pair recall on
the synthetic fixture, tie-broken by candidate workload (the quantity a
10^12-row deployment pays for). The search space mirrors the reference's
(tune_parameter.py:118-131), including drawing the bucket modulus from a
prime sieve (:30-38 — primality decorrelates the modulo).

Evaluation runs the engine's OWN kernels (functions/hashing.py: the same
minhash_signatures / band_buckets bit-exact code the Spark UDFs call) on
a driver-size slice — the tuner is a utility like the reference's, not a
cluster job; the chosen config is then a plain LshConfig for the
pipeline.

Usage: python tools/tune.py [--trials 40] [--n 400] [--tau 0.5] [--seed 7]
Prints one JSON line: {"best": {...}, "recall": r, "candidates": c, ...}
"""

from __future__ import annotations

import argparse
import json
import os
import re
import sys
import zlib
from collections import defaultdict

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from distributed_gpu_lsh_using_sycl_spark.functions import hashing as H  # noqa: E402
from distributed_gpu_lsh_using_sycl_spark.sources.fixture import (  # noqa: E402
    make_fixture_pandas)

SHINGLE_K = 3


def primes_between(lo: int, hi: int) -> list[int]:
    """Sieve — the reference's prime pool for hash_table_size
    (tune_parameter.py:30-38)."""
    sieve = np.ones(hi + 1, dtype=bool)
    sieve[:2] = False
    for p in range(2, int(hi ** 0.5) + 1):
        if sieve[p]:
            sieve[p * p:: p] = False
    return [int(p) for p in np.flatnonzero(sieve) if p >= lo]


def _shingle_sets(texts: list[str]) -> list[np.ndarray]:
    out = []
    for t in texts:
        toks = [x for x in re.split(r"\s+", (t or "").lower().strip()) if x]
        if not toks:
            sh = []
        elif len(toks) < SHINGLE_K:
            sh = [" ".join(toks)]
        else:
            sh = sorted({" ".join(toks[i:i + SHINGLE_K])
                         for i in range(len(toks) - SHINGLE_K + 1)})
        out.append(np.array([zlib.crc32(s.encode()) for s in sh], dtype=np.uint64))
    return out


def _truth_pairs(shingles: list[np.ndarray], tau: float) -> set[tuple[int, int]]:
    sets = [set(s.tolist()) for s in shingles]
    truth = set()
    for i in range(len(sets)):
        for j in range(i + 1, len(sets)):
            u = len(sets[i] | sets[j])
            if u and len(sets[i] & sets[j]) / u >= tau:
                truth.add((i, j))
    return truth


def evaluate(shingles, truth, num_bands, rows_per_band, signature_pool_size,
             bucket_modulus, seed) -> tuple[float, int]:
    """Recall of banded MinHash candidates vs brute truth + candidate load."""
    a, b = H.minhash_params(seed, num_bands * rows_per_band, signature_pool_size)
    sigs = H.minhash_signatures(shingles, a, b)
    buckets = H.band_buckets(sigs, num_bands, rows_per_band, bucket_modulus)
    nonempty = np.array([len(s) > 0 for s in shingles])
    by_bucket: dict[tuple[int, int], list[int]] = defaultdict(list)
    for i in np.flatnonzero(nonempty):
        for t in range(num_bands):
            by_bucket[(t, int(buckets[i, t]))].append(int(i))
    cands: set[tuple[int, int]] = set()
    for members in by_bucket.values():
        for x in range(len(members)):
            for y in range(x + 1, len(members)):
                cands.add((members[x], members[y]))
    hit = len(cands & truth)
    recall = hit / len(truth) if truth else 1.0
    return recall, len(cands)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--trials", type=int, default=40)
    ap.add_argument("--n", type=int, default=400)
    ap.add_argument("--tau", type=float, default=0.5)
    ap.add_argument("--seed", type=int, default=7)
    args = ap.parse_args()

    images, _ = make_fixture_pandas(args.n, seed=42)
    shingles = _shingle_sets(images["caption"].tolist())
    truth = _truth_pairs(shingles, args.tau)

    # search space mirrors tune_parameter.py:118-131 (pool 16..64, k 4..16,
    # L 4..64, prime table sizes); seeded — reruns reproduce the choice
    rng = np.random.Generator(np.random.PCG64(args.seed))
    primes = primes_between(1009, 120_000)
    best = None
    trials = []
    for trial in range(args.trials):
        params = {
            "num_bands": int(rng.integers(4, 65)),
            "rows_per_band": int(rng.integers(1, 9)),
            "signature_pool_size": int(rng.integers(16, 65)),
            "bucket_modulus": int(primes[rng.integers(0, len(primes))]),
        }
        recall, n_cands = evaluate(shingles, truth, seed=42, **params)
        trials.append({**params, "recall": round(recall, 4), "candidates": n_cands})
        # objective: recall first (the reference maximizes recall alone,
        # tune_parameter.py:81-93), candidate workload as tie-break
        key = (recall, -n_cands)
        if best is None or key > best[0]:
            best = (key, trials[-1])
    print(json.dumps({"n_rows": args.n, "tau": args.tau,
                      "truth_pairs": len(truth), "trials": len(trials),
                      "best": best[1]}))


if __name__ == "__main__":
    main()
