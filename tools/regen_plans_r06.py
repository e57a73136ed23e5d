"""Regenerate plans/r06/<query>_after.txt from the CURRENT tree: the
.explain("formatted") of each touched query at the bench sf, so the
committed after-plans always reflect HEAD (the before-plans come from a
git archive of the round-start commit and are never rewritten).

Usage: python tools/regen_plans_r06.py [--sf DIR] [--only name,...]
"""

from __future__ import annotations

import argparse
import contextlib
import io
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.1")
    ap.add_argument("--only", default=None)
    args = ap.parse_args()

    import __spark_entry__ as entrymod
    from distributed_gpu_lsh_using_sycl_spark.sources.tables import get_spark

    plan_dir = os.path.join(REPO, "plans", "r06")
    names = (args.only.split(",") if args.only else
             sorted({f[: -len("_after.txt")]
                     for f in os.listdir(plan_dir)
                     if f.endswith("_after.txt")}))

    spark = get_spark("regen-plans-r06", parallelism=8, shuffle_partitions=8)
    qs = entrymod.queries()
    for name in names:
        df = qs[name](spark, args.sf)
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            df.explain("formatted")
        out = os.path.join(plan_dir, name + "_after.txt")
        with open(out, "w") as fh:
            fh.write(buf.getvalue())
        print(f"wrote {out} ({buf.getvalue().count(chr(10))} lines)")
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
