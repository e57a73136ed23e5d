"""CLI: generate the deterministic image+caption fixture (+ truth pairs).

Analog of the reference's generate_data.py (seeded synthetic input).

    python tools/make_fixture.py --n 10000 --out /tmp/fixture [--seed 42]
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, required=True)
    ap.add_argument("--out", required=True)
    ap.add_argument("--seed", type=int, default=42)
    ap.add_argument("--cores", type=int, default=None)
    args = ap.parse_args()

    from distributed_gpu_lsh_using_sycl_spark.sources.fixture import (
        make_fixture_spark, truth_pairs)
    from distributed_gpu_lsh_using_sycl_spark.sources.tables import get_spark

    spark = get_spark("make-fixture", parallelism=args.cores)
    os.makedirs(args.out, exist_ok=True)
    make_fixture_spark(spark, args.n, seed=args.seed) \
        .write.mode("overwrite").parquet(os.path.join(args.out, "images"))
    spark.createDataFrame(truth_pairs(args.seed, args.n)) \
        .write.mode("overwrite").parquet(os.path.join(args.out, "truth_pairs"))
    print(f"wrote {args.n} images + truth pairs to {args.out}")
    spark.stop()


if __name__ == "__main__":
    main()
