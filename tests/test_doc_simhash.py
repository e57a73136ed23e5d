"""doc_simhash_pairs pinned by an INDEPENDENT oracle: a from-scratch
python/numpy recomputation (re tokenizer + zlib.crc32 + the u64
hash_combine + simhash + brute-force popcount over all pairs) must equal
the Spark query's banded-blocking + verify output exactly. This is the
no-SQL-oracle query's correctness gate — blocking completeness at the
hamming threshold is exactly where LSH bugs hide."""

import re
import zlib

import numpy as np
import pandas as pd
import pytest

SF = "/root/testdata/sf0.001"
K = 3
THRESH = 8


def _shingles(text: str) -> list[str]:
    toks = [t for t in re.split(r"\s+", (text or "").lower().strip()) if t]
    if not toks:
        return []
    if len(toks) < K:
        return [" ".join(toks)]
    return sorted({" ".join(toks[i:i + K]) for i in range(len(toks) - K + 1)})


def _simhash(text: str) -> int:
    from distributed_gpu_lsh_using_sycl_spark.functions.hashing import (
        hash_combine_u64, simhash64)

    crcs = np.array([zlib.crc32(s.encode()) for s in _shingles(text)],
                    dtype=np.uint64)
    if len(crcs) == 0:
        return 0
    feats = hash_combine_u64(np.uint64(K), crcs)
    return int(simhash64(feats, np.array([0]), 1)[0])


def test_doc_simhash_pairs_matches_numpy_oracle(spark):
    import __spark_entry__ as E

    docs = pd.read_parquet(f"{SF}/documents.parquet")
    hashes = {int(r.doc_id): _simhash(r.text) for r in docs.itertuples()}
    ids = sorted(hashes)
    want = set()
    for i, a in enumerate(ids):
        for b in ids[i + 1:]:
            ham = bin(hashes[a] ^ hashes[b]).count("1")
            if ham <= THRESH:
                want.add((a, b, ham))

    got = {(r["a"], r["b"], r["hamming"]) for r in
           E.q_doc_simhash_pairs(spark, SF).collect()}
    assert got == want
    assert len(want) > 0  # the fixture really contains planted caption dups
