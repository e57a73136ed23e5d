"""spark-submit entry for the near-dup detection pipeline (SURVEY §2.10).

Thin launcher over plans.pipeline — the pipeline module owns the arg
surface (--input/--out/--config/--no-image/--cores) so library users and
spark-submit users hit identical code:

    spark-submit --py-files dist.zip jobs/run_pipeline.py \
        --input warehouse/images --out warehouse --config lsh.json
"""

import sys

sys.path.insert(0, __file__.rsplit("/", 2)[0])

from distributed_gpu_lsh_using_sycl_spark.plans.pipeline import _main  # noqa: E402

if __name__ == "__main__":
    _main()
