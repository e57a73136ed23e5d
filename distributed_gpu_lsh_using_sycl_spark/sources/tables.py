"""Session factory + table IO.

On the sandbox, tables are parquet directories under a warehouse path; on
a real cluster the same ``TableIO`` speaks Iceberg (``writeTo`` /
``read.format("iceberg")``) when a catalog is configured — Iceberg gives
what the reference's binary-file header gave it (schema + count,
binary_parser.hpp:33-47) plus snapshot isolation, partition pruning and
min/max skipping. The engine code is format-agnostic through this module.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

# The sandbox VM makes first-touch page faults on fresh mmap'd memory
# ~100x normal cost, and glibc mmaps every allocation over the (adaptive)
# threshold — so numpy temporaries above ~a few MB pay full fault cost on
# EVERY kernel invocation. Pin the malloc thresholds high so big blocks
# stay in the (warm, reused) heap. Applied to the driver here and to the
# python workers via executorEnv below.
_MALLOC_ENV = {
    "MALLOC_MMAP_THRESHOLD_": str(128 * 1024 * 1024),
    "MALLOC_TRIM_THRESHOLD_": str(256 * 1024 * 1024),
}
os.environ.update(_MALLOC_ENV)


def get_spark(app_name: str = "dlsh", parallelism: int | None = None,
              shuffle_partitions: int | None = None,
              extra_conf: dict | None = None,
              master: str | None = None) -> SparkSession:
    """Local-mode session tuned per the scale guidance: AQE on (runtime
    re-plan + skew-join backstop), Arrow on (vectorized UDF transfer),
    shuffle partitions sized to cores, not the 200 default.

    ``master`` overrides the default ``local[parallelism]`` — used by the
    bench's executor-level scaling evidence, which runs the stage on a
    ``local-cluster[N, cores, mem]`` master: a real in-process standalone
    cluster whose N executors are SEPARATE JVM processes, each with its
    own memory, python workers and shuffle endpoints — the closest this
    sandbox gets to the north rule's literal "N and 4N executors"."""
    cores = parallelism or int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    builder = SparkSession.builder
    # under spark-submit (PythonRunner exports the gateway port) the
    # master/deploy config belongs to the submit command line — forcing
    # local[n] here would silently turn a cluster submission into a
    # local run; everywhere else default to local[cores]
    if "PYSPARK_GATEWAY_PORT" not in os.environ:
        builder = builder.master(master or f"local[{cores}]")
    builder = (
        builder
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions or cores))
        .config("spark.default.parallelism", str(cores))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        # 1024: keeps each Arrow batch's worker live set under the ~10 MB
        # allocator knee (same law as blob_scan.SLICE_ROWS — fresh multi-MB
        # allocations serialize on kernel mmap faults across procs).
        # Re-measured post-slicing-insight, interleaved min-fold at
        # local[32]: blob-carrying signature stage 96k imgs 16384→6.3s,
        # 2048→4.0s, 1024→3.8s, 512→3.5s; text-only and embedding stages
        # flat-to-better at 1024 (entropy 2.05→1.72, ivfpq 4.53→4.03, knn
        # flat). The round-2 choice of 16384 predated the slicing insight
        # and was measured in a noisier protocol.
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "1024")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "24g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        # one BLAS thread per python worker — N workers x N BLAS threads
        # oversubscribes the box quadratically
        .config("spark.executorEnv.OMP_NUM_THREADS", "1")
        .config("spark.executorEnv.OPENBLAS_NUM_THREADS", "1")
        .config("spark.executorEnv.MKL_NUM_THREADS", "1")
    )
    for k, v in _MALLOC_ENV.items():
        builder = builder.config(f"spark.executorEnv.{k}", v)
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark


class TableIO:
    """Read/write named stage tables (parquet dir or Iceberg table)."""

    def __init__(self, spark: SparkSession, warehouse: str, fmt: str = "parquet"):
        self.spark = spark
        self.warehouse = warehouse
        self.fmt = fmt
        if fmt == "parquet":
            os.makedirs(warehouse, exist_ok=True)

    def _path(self, name: str) -> str:
        return os.path.join(self.warehouse, name)

    def write(self, df: DataFrame, name: str, partition_by: list[str] | None = None) -> None:
        if self.fmt == "iceberg":
            w = df.writeTo(f"{self.warehouse}.{name}")
            if partition_by:
                from pyspark.sql import functions as F
                w = w.partitionedBy(*[F.col(c) for c in partition_by])
            w.createOrReplace()
            return
        w = df.write.mode("overwrite")
        if partition_by:
            w = w.partitionBy(*partition_by)
        w.parquet(self._path(name))

    def append(self, df: DataFrame, name: str) -> None:
        if self.fmt == "iceberg":
            df.writeTo(f"{self.warehouse}.{name}").append()
        else:
            df.write.mode("append").parquet(self._path(name))

    def read(self, name: str) -> DataFrame:
        if self.fmt == "iceberg":
            return self.spark.read.format("iceberg").load(f"{self.warehouse}.{name}")
        return self.spark.read.parquet(self._path(name))

    def exists(self, name: str) -> bool:
        if self.fmt == "iceberg":
            return self.spark.catalog.tableExists(f"{self.warehouse}.{name}")
        p = self._path(name)
        return os.path.isdir(p) and (
            os.path.exists(os.path.join(p, "_SUCCESS")) or any(
                f.endswith(".parquet") for f in os.listdir(p))
        )
