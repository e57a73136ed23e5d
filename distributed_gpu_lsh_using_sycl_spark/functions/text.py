"""Text kernels: shingling, Jaccard, fingerprints, quality heuristics.

Tokenization/shingling semantics are defined ONCE here and mirrored
exactly by (a) the Spark built-in expression pipeline in
``operators/signatures.py`` (split/transform/crc32, JVM-side) and (b) the
DuckDB oracle SQL in ``__spark_entry__.py``. Any change here must change
all three.

- token: maximal run of non-whitespace in ``lower(trim(text))``
- shingle: ``shingle_size`` consecutive tokens joined by one space;
  documents with fewer tokens than ``shingle_size`` contribute one
  shingle = all tokens joined (so short docs are still comparable)
- shingle hash: CRC-32 of the UTF-8 shingle (zlib.crc32 == Spark F.crc32)
"""

from __future__ import annotations

import zlib

import numpy as np

from distributed_gpu_lsh_using_sycl_spark.functions.hashing import hash_combine_u64


def tokenize(text: str) -> list[str]:
    return text.strip().lower().split()


def shingles(text: str, k: int) -> list[str]:
    toks = tokenize(text)
    if not toks:
        return []
    if len(toks) < k:
        return [" ".join(toks)]
    return [" ".join(toks[i:i + k]) for i in range(len(toks) - k + 1)]


def distinct_shingles(text: str, k: int) -> list[str]:
    seen: dict[str, None] = {}
    for s in shingles(text, k):
        seen.setdefault(s)
    return list(seen)


def shingle_crc32s(text: str, k: int) -> np.ndarray:
    """Distinct shingle CRC-32 values, uint64 (values < 2^32)."""
    return np.fromiter(
        {zlib.crc32(s.encode("utf-8")) for s in shingles(text, k)},
        dtype=np.uint64,
    )


def jaccard(a, b) -> float:
    sa, sb = set(a), set(b)
    if not sa and not sb:
        return 0.0
    return len(sa & sb) / len(sa | sb)


# --------------------------------------------------------------------------- #
# Document fingerprint (rolling polynomial hash)
# --------------------------------------------------------------------------- #

FINGERPRINT_MOD = 1_000_000_007
FINGERPRINT_BASE = 31


def doc_fingerprint(text: str) -> int:
    """Polynomial rolling hash over unicode codepoints, mod 1e9+7.

    ``acc = (acc * 31 + codepoint) % 1_000_000_007`` — expressible
    identically in Spark (``aggregate``) and DuckDB (``list_reduce``),
    which is why it is this and not crc32 of the whole string.
    """
    acc = 0
    for ch in text:
        acc = (acc * FINGERPRINT_BASE + ord(ch)) % FINGERPRINT_MOD
    return acc


# --------------------------------------------------------------------------- #
# Language-ID heuristic (marker-token voting)
# --------------------------------------------------------------------------- #

#: tiny deterministic marker lists; predicted language = argmax of marker
#: hits with ties → 'und'. Chosen to be exactly reproducible in SQL.
LANG_MARKERS: dict[str, tuple[str, ...]] = {
    "en": ("the", "and", "of", "to", "is", "in", "that", "it"),
    "es": ("el", "la", "de", "que", "los", "una", "por", "con"),
    "fr": ("le", "les", "des", "est", "une", "dans", "pour", "qui"),
    "de": ("der", "die", "und", "das", "ist", "nicht", "ein", "mit"),
}
LANG_ORDER = ("en", "es", "fr", "de")  # tie-break evaluation order


def lang_id(text: str) -> str:
    toks = tokenize(text)
    counts = {lang: sum(t in set(LANG_MARKERS[lang]) for t in toks) for lang in LANG_ORDER}
    best = max(counts.values())
    if best == 0:
        return "und"
    winners = [lang for lang in LANG_ORDER if counts[lang] == best]
    return winners[0] if len(winners) == 1 else "und"


# --------------------------------------------------------------------------- #
# SimHash features for text (used by the documents-table simhash query)
# --------------------------------------------------------------------------- #

def text_simhash_features(text: str, k: int) -> np.ndarray:
    """uint64 feature hashes = hash_combine_u64(seed0, crc32(shingle))."""
    crcs = shingle_crc32s(text, k)
    if len(crcs) == 0:
        return np.zeros(0, dtype=np.uint64)
    return hash_combine_u64(np.uint64(k), crcs)
