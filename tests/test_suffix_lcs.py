"""lcs_fast (binary-search window sets, the hot verify path) must agree
exactly with the suffix-array+Kasai LCS on arbitrary strings."""

import numpy as np

from distributed_gpu_lsh_using_sycl_spark.operators.suffix import (
    lcs_fast, longest_common_substring)


def _rand_str(rng, n, alphabet="abcd "):
    return "".join(alphabet[i] for i in rng.integers(0, len(alphabet), size=n))


def test_lcs_fast_equals_suffix_array():
    rng = np.random.Generator(np.random.PCG64(7))
    cases = [("", ""), ("a", ""), ("abc", "abc"), ("abc", "zabcy"),
             ("hello world", "yell low orld"), ("aaaa", "aa")]
    # small alphabet forces long shared runs; varied lengths hit the
    # binary-search boundaries
    for _ in range(60):
        a = _rand_str(rng, int(rng.integers(0, 80)))
        b = _rand_str(rng, int(rng.integers(0, 80)))
        cases.append((a, b))
    for a, b in cases:
        assert lcs_fast(a, b) == longest_common_substring(a, b), (a, b)


def test_lcs_fast_containment_short_circuit():
    assert lcs_fast("abc", "xxabcxx") == 3
    assert lcs_fast("xxabcxx", "abc") == 3
    assert lcs_fast("abc", "abc") == 3
    assert lcs_fast("abcdef", "xyz") == 0
