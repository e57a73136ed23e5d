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


def test_shares_window_equals_lcs_threshold():
    """shares_window(a, b, L) must be exactly lcs_fast(a, b) >= L — it is
    the verify's single-probe replacement for the full LCS binary
    search."""
    import numpy as np

    from distributed_gpu_lsh_using_sycl_spark.operators.suffix import (
        lcs_fast, shares_window)

    rng = np.random.Generator(np.random.PCG64(11))
    alphabet = "abcd "
    cases = []
    for _ in range(120):
        n1, n2 = int(rng.integers(0, 40)), int(rng.integers(0, 40))
        a = "".join(rng.choice(list(alphabet), n1))
        b = "".join(rng.choice(list(alphabet), n2))
        # plant a shared run half the time
        if rng.integers(0, 2):
            run = "".join(rng.choice(list(alphabet), int(rng.integers(1, 12))))
            a += run
            b = run + b
        cases.append((a, b))
    cases += [("", ""), ("abc", ""), ("abc", "abc"), ("abc", "xxabcxx")]
    for a, b in cases:
        for L in (1, 2, 3, 5, 8, 24):
            assert shares_window(a, b, L) == (lcs_fast(a, b) >= L), (a, b, L)
