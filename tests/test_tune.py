"""The tuner (tune_parameter.py analog) is deterministic and finds a
config with high planted-dup recall on the fixture."""

import json
import subprocess
import sys


def test_tuner_deterministic_and_effective():
    cmd = [sys.executable, "tools/tune.py", "--trials", "12", "--n", "200",
           "--seed", "7"]
    out1 = json.loads(subprocess.run(cmd, capture_output=True, text=True,
                                     check=True, timeout=300).stdout)
    out2 = json.loads(subprocess.run(cmd, capture_output=True, text=True,
                                     check=True, timeout=300).stdout)
    assert out1 == out2  # seeded search reproduces its choice
    assert out1["truth_pairs"] > 0
    assert out1["best"]["recall"] >= 0.95


def test_prime_sieve():
    from tools.tune import primes_between

    ps = primes_between(1009, 1100)
    assert ps[0] == 1009 and all(p > 1000 for p in ps)
    for p in ps:
        assert all(p % d for d in range(2, int(p ** 0.5) + 1))
    # the reference default 105613 is prime and in the pool range
    assert 105613 in primes_between(1009, 120000)
