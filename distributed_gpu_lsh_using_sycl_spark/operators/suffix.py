"""Exact-substring duplicate pass (the suffix-array stage).

At 10^12 rows you cannot build one global suffix array; the distributed
decomposition (the standard one from suffix-array-based training-data
dedup) is:

1. **Candidate generation** — every caption emits the rolling polynomial
   hashes of ALL of its length-L character windows (L =
   ``min_substring_len``), computed in one vectorized numpy pass per
   Arrow batch (prefix-hash trick: O(len) per doc, zero per-row Python).
   Two captions sharing any substring of length ≥ L share a window hash,
   so the equi-join on (window_hash) is a complete blocking scheme —
   recall 1.0 by construction, modulo 31-bit hash collisions which only
   ADD candidates.
2. **Exact verification** — for each candidate pair, a suffix-array
   longest-common-substring check over the two captions (suffix array by
   prefix-doubling + Kasai LCP, numpy), inside a pandas-grouped UDF.
   Collisions are eliminated here, so the hash width costs nothing in
   precision.

Full-containment pairs (caption_a inside caption_b) are the verified
subset with lcs == len(shorter); they're flagged separately.
"""

from __future__ import annotations

import functools as _functools

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from distributed_gpu_lsh_using_sycl_spark.config import LshConfig

_MOD = np.uint64((1 << 31) - 1)
_BASE = np.uint64(131)


def _gram_hashes(c: np.ndarray, L: int) -> np.ndarray:
    """Per-position rolling hashes of all length-L windows of codepoint
    array ``c`` (one hash per start position, NOT deduped). O(len·L/4)
    numpy with exact mod arithmetic."""
    n = len(c)
    if n < L:
        return np.zeros(0, dtype=np.uint64)
    # hash of the window starting at i is sum_{j<L} c[i+j] * B^(L-1-j)
    # mod M — a correlation of c with the power vector, done blockwise
    # with exact mod arithmetic.
    powers = np.empty(L, dtype=np.uint64)
    powers[L - 1] = np.uint64(1)
    for j in range(L - 2, -1, -1):
        powers[j] = (powers[j + 1] * _BASE) % _MOD
    # windows matrix-free: strided view (n-L+1, L) — values < 2^31, powers
    # < 2^31, products < 2^62: sum in chunks of 4 with interleaved mod to
    # stay exact in uint64.
    w = np.lib.stride_tricks.sliding_window_view(c, L)  # (n-L+1, L)
    acc = np.zeros(w.shape[0], dtype=np.uint64)
    for j0 in range(0, L, 4):
        part = (w[:, j0:j0 + 4] % _MOD) * powers[None, j0:j0 + 4]
        acc = (acc + part.sum(axis=1, dtype=np.uint64)) % _MOD
    return acc


def _codepoints(text: str) -> np.ndarray:
    return np.frombuffer(text.encode("utf-32-le"),
                         dtype=np.uint32).astype(np.uint64)


def _window_hashes(text: str, L: int) -> np.ndarray:
    """Distinct rolling hashes of all length-L windows. O(len) numpy."""
    return np.unique(_gram_hashes(_codepoints(text), L)).astype(np.int64)


#: shortest k-gram winnowing is allowed to hash on: below this, natural-
#: text grams collide broadly and the candidate set (verified away, but
#: paid for) outgrows the row savings. L below this + stride falls back
#: to the all-windows scheme.
_MIN_GRAM = 12


def _winnowed_hashes(text: str, L: int, stride: int) -> np.ndarray:
    """Distinct WINNOWED fingerprints: k-gram hashes (k = L - stride + 1)
    selected as the minimum of every ``stride`` consecutive positions —
    ~2/(stride+1) of the all-windows density.

    EXACT by the winnowing guarantee (Schleimer/Wilkerson/Aiken, SIGMOD
    '03): a shared substring of length >= L = k + stride - 1 contains, in
    BOTH strings, the same full window of ``stride`` consecutive k-grams;
    the min hash VALUE of that window is selected on both sides (selection
    is by value, so it cannot diverge on ties), hence the equi-join on
    fingerprints keeps recall 1.0 over >=L-window pairs. Shorter grams
    only ADD candidates (killed in verify), exactly like hash collisions.
    Texts shorter than L cannot be in any >=L pair and emit nothing."""
    k = L - stride + 1
    if stride <= 1 or k < _MIN_GRAM:
        return _window_hashes(text, L)
    c = _codepoints(text)
    if len(c) < L:
        return np.zeros(0, dtype=np.int64)
    h = _gram_hashes(c, k)  # len(c) - k + 1 >= stride positions
    mins = np.lib.stride_tricks.sliding_window_view(h, stride).min(axis=1)
    return np.unique(mins).astype(np.int64)


def _spread(df: DataFrame) -> DataFrame:
    """Round-robin the frame across the session's parallelism when the
    upstream scan plans fewer partitions than cores — a single-row-group
    parquet file otherwise runs every narrow stage above the first
    exchange (the fingerprint UDF included) on ONE task. The projection
    is (id, text) only, so the exchange moves a few MB; inputs already at
    or above core count (any real table at scale) pass through untouched."""
    target = df.sparkSession.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() < target:
        return df.repartition(target)
    return df


def window_hash_df(docs: DataFrame, cfg: LshConfig,
                   id_col: str = "image_id", text_col: str = "caption") -> DataFrame:
    """(id, text) -> exploded (image_id, whash): winnowed window
    fingerprints (see ``_winnowed_hashes``; stride <= 1 = every window)."""
    L = cfg.min_substring_len
    stride = cfg.substring_winnow_stride

    @F.pandas_udf(T.ArrayType(T.LongType()))
    def win_udf(texts: pd.Series) -> pd.Series:
        return pd.Series([_winnowed_hashes(t or "", L, stride).tolist()
                          for t in texts])

    return (_spread(docs.select(F.col(id_col).alias("image_id"),
                                F.col(text_col).alias("text")))
            .withColumn("whash", F.explode(win_udf(F.col("text"))))
            .select("image_id", "whash"))


def substring_candidates(docs: DataFrame, cfg: LshConfig,
                         id_col: str = "image_id", text_col: str = "caption") -> DataFrame:
    """Distinct (a, b) candidate pairs sharing ≥1 length-L window hash.

    Reuses the salted-band machinery for skew: a window hash shared by a
    crowd (boilerplate strings) is exactly a hot LSH bucket. The exploded
    fingerprint frame feeds the plan three ways (bucket-stats agg + both
    sides of the salted self-join) — materialize it once (localCheckpoint)
    instead of running the fingerprint UDF per consumer.
    """
    from distributed_gpu_lsh_using_sycl_spark.operators.banding import (
        candidate_pairs_from_bands)

    wh = window_hash_df(docs, cfg, id_col, text_col)
    bands = (wh.select("image_id", F.lit(-1).alias("band_id"),
                       F.col("whash").alias("bucket"))
             .localCheckpoint(eager=True))
    return candidate_pairs_from_bands(bands, cfg, source="substring")


# --------------------------------------------------------------------------- #
# suffix-array LCS verification
# --------------------------------------------------------------------------- #

def suffix_array(s: np.ndarray) -> np.ndarray:
    """Suffix array by prefix doubling (O(n log^2 n), numpy lexsort)."""
    n = len(s)
    rank = np.argsort(s, kind="stable")
    # initial ranks from values
    order = np.empty(n, dtype=np.int64)
    sa = np.argsort(s, kind="stable")
    vals = s[sa]
    r = np.zeros(n, dtype=np.int64)
    r[sa] = np.cumsum(np.concatenate([[0], (vals[1:] != vals[:-1]).astype(np.int64)]))
    k = 1
    while k < n:
        key2 = np.full(n, -1, dtype=np.int64)
        key2[: n - k] = r[k:]
        sa = np.lexsort((key2, r))
        new_r = np.zeros(n, dtype=np.int64)
        prev = (r[sa[1:]] != r[sa[:-1]]) | (key2[sa[1:]] != key2[sa[:-1]])
        new_r[sa] = np.cumsum(np.concatenate([[0], prev.astype(np.int64)]))
        r = new_r
        if r[sa[-1]] == n - 1:
            break
        k <<= 1
    return sa


def _kasai_lcp(s: np.ndarray, sa: np.ndarray) -> np.ndarray:
    n = len(s)
    rank = np.empty(n, dtype=np.int64)
    rank[sa] = np.arange(n)
    lcp = np.zeros(n, dtype=np.int64)
    h = 0
    for i in range(n):
        if rank[i] > 0:
            j = sa[rank[i] - 1]
            while i + h < n and j + h < n and s[i + h] == s[j + h]:
                h += 1
            lcp[rank[i]] = h
            if h:
                h -= 1
        else:
            h = 0
    return lcp


def lcs_fast(a: str, b: str) -> int:
    """Exact LCS length via containment short-circuit + binary search on
    shared fixed-length windows (Rabin-Karp shape, but with real string
    sets — C-speed hashing, zero collisions). Equivalent to
    ``longest_common_substring`` (property-tested) and ~an order of
    magnitude faster in Python for caption-sized strings, because every
    inner operation is a C-level slice/hash instead of a numpy
    prefix-doubling pass."""
    if not a or not b:
        return 0
    if len(a) > len(b):
        a, b = b, a
    if a in b:
        return len(a)
    lo, hi = 0, len(a) - 1  # not contained -> lcs < len(a)

    def shared(k: int) -> bool:
        wa = {a[i:i + k] for i in range(len(a) - k + 1)}
        return any(b[i:i + k] in wa for i in range(len(b) - k + 1))

    while lo < hi:
        mid = (lo + hi + 1) >> 1
        if shared(mid):
            lo = mid
        else:
            hi = mid - 1
    return lo


def longest_common_substring(a: str, b: str) -> int:
    """Exact LCS length via suffix array + Kasai over a#b."""
    if not a or not b:
        return 0
    ca = np.frombuffer(a.encode("utf-32-le"), dtype=np.uint32).astype(np.int64)
    cb = np.frombuffer(b.encode("utf-32-le"), dtype=np.uint32).astype(np.int64)
    sep = np.array([-1], dtype=np.int64)  # below any codepoint
    s = np.concatenate([ca, sep, cb])
    sa = suffix_array(s)
    lcp = _kasai_lcp(s, sa)
    na = len(ca)
    side = sa < na  # suffix starts in a (separator suffix starts "in b" side-safe)
    cross = side[1:] != side[:-1]
    if not cross.any():
        return 0
    return int(lcp[1:][cross].max())


@_functools.lru_cache(maxsize=1024)
def _window_set(t: str, L: int) -> frozenset:
    """Frozen set of ``t``'s length-L windows, memoized WORKER-WIDE (a
    module-level cache survives across Arrow batches): a doc participates
    in many candidate pairs, so each text pays the slice pass once and
    every later pair is a C-level ``isdisjoint``. 1024 entries ≈ 30 MB
    per worker at caption-scale texts — eviction only costs a rebuild."""
    return frozenset(t[i:i + L] for i in range(len(t) - L + 1))


def shares_window(a: str, b: str, L: int) -> bool:
    """Exact "∃ shared length-L substring" — EQUIVALENT to
    ``lcs_fast(a, b) >= L`` (an LCS of length >= L contains a length-L
    window and vice versa; property-pinned in tests) at a fraction of the
    cost: one window-set probe at k=L instead of lcs_fast's ~log2(len)
    binary-search probes. This is the verify's whole question — the exact
    LCS length is never consumed downstream."""
    if len(a) > len(b):
        a, b = b, a
    if len(a) < L:
        return False
    if a in b:
        return True  # len(a) >= L here, so containment implies a window
    wa = {a[i:i + L] for i in range(len(a) - L + 1)}
    return any(b[i:i + L] in wa for i in range(len(b) - L + 1))


def verify_substring_pairs(cands: DataFrame, docs: DataFrame, cfg: LshConfig,
                           id_col: str = "image_id", text_col: str = "caption") -> DataFrame:
    """(a, b) candidates -> (a, b, contains, source), keeping exactly the
    pairs with a true shared length-L window (kills the window-hash
    join's collision + short-gram false positives).

    The probe is exact (raw length-L windows, no hashes — collision and
    short-gram candidates die here) and AMORTIZED: a doc participates in
    many candidate pairs, so its frozen window set is built once per
    worker (LRU on the text) and each pair costs one C-level
    ``isdisjoint``. A JVM variant (``arrays_overlap`` over substring
    arrays) was measured 5-13x SLOWER — higher-order functions are
    interpreted per element, so 280 UTF8String windows per row per side
    beat the one Arrow hop they save. This verify stays cheap enough
    that winnowed candidate generation (see ``_winnowed_hashes``) is a
    net win even though shorter grams admit more candidates."""
    L = cfg.min_substring_len
    d = docs.select(F.col(id_col).alias("image_id"), F.col(text_col).alias("text"))
    withs = (cands
             .join(d.select(F.col("image_id").alias("a"), F.col("text").alias("text_a")), "a")
             .join(d.select(F.col("image_id").alias("b"), F.col("text").alias("text_b")), "b"))

    @F.pandas_udf(T.BooleanType())
    def shares_udf(ta: pd.Series, tb: pd.Series) -> pd.Series:
        out = []
        for x, y in zip(ta, tb):
            x, y = x or "", y or ""
            if len(x) > len(y):
                x, y = y, x
            if len(x) < L:
                out.append(False)
            elif x in y:
                out.append(True)
            else:
                out.append(not _window_set(x, L).isdisjoint(_window_set(y, L)))
        return pd.Series(out, dtype="bool")

    return (withs
            .filter(shares_udf("text_a", "text_b"))
            .withColumn("contains",
                        F.col("text_b").contains(F.col("text_a"))
                        | F.col("text_a").contains(F.col("text_b")))
            .select("a", "b", "contains", F.lit("substring").alias("source")))
