"""spark-submit analog of the reference's CLI (``./prog input_file k``).

Flag names, defaults and sanity checks mirror ``options.cpp:55-161``
one-for-one (hash_function 0/1/2, hash_pool_size 32, num_hash_functions
12, num_hash_tables 8, hash_table_size 105613, w 1.0,
num_cut_off_points 6; checks at options.cpp:32-51 with the same error
text), so a reference user can re-run their exact invocation:

    spark-submit --py-files dist.zip jobs/run_lsh_knn.py \
        data.parquet 10 --hash_function 1 --num_hash_tables 16 \
        --indices_save_file out/indices \
        --indices_ground_truth_file truth.parquet

Differences, by design (Spark-first, SURVEY §2.10):
- ``file_parser 0`` (the reference's "binary") reads the reference's
  OWN .bin format (header [type_size, total, dims] + row-major floats,
  binary_parser.hpp:126-236 — sources/binary_format.py, distributed
  ranged reads, positional ids) when the path is a regular file, and
  parquet when the path is a parquet file/dir — so both a reference
  user's existing data files and the engine's stage tables load;
  ``file_parser 1`` = headerless numeric CSV (the arff analog — the
  reference's arff parser is itself unimplemented, arff_parser.hpp:44).
- saves are long-format parquet tables (vec_id, rank, neighbor_id,
  dist_sq), not raw matrices; ground-truth files use the same shape.
- ``work_group_size`` is accepted for invocation parity but ignored — a
  SYCL work-group has no Spark analog; parallelism comes from --cores.
- ``profiling_type 1`` emits the runtime-events YAML the reference's
  profiler writes (profiler.cpp:105-176) with per-stage wall-clocks.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, __file__.rsplit("/", 2)[0])  # repo root for --py-files-less runs


class InvalidLshOption(ValueError):
    """Analog of sycl_lsh::invalid_lsh_option_exception."""


def sanity_check(ns: argparse.Namespace) -> None:
    """options.cpp:32-51, same messages."""
    for name in ("hash_pool_size", "num_hash_functions", "num_hash_tables",
                 "hash_table_size", "num_cut_off_points"):
        if getattr(ns, name) <= 0:
            raise InvalidLshOption(
                f"Invalid '{name}'! Must be larger than 0 but is "
                f"{getattr(ns, name)}.")
    if ns.w <= 0:
        raise InvalidLshOption(
            f"Invalid 'w'! Must be larger than 0 but is {ns.w}.")


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(
        prog="run_lsh_knn",
        description="k-nearest-neighbors using Locality Sensitive Hashing "
                    "and PySpark")
    p.add_argument("file", help="the input data file")
    p.add_argument("knn", type=int, help="the number of nearest-neighbors "
                   "to calculate")
    p.add_argument("--file_parser", default="0", choices=["0", "1"],
                   help="0: binary (the reference's .bin format for a "
                        "regular file; parquet for a table path), "
                        "1: csv (arff analog)")
    p.add_argument("--hash_function", default="0",
                   help="0/random_projections, 1/entropy_based, 2/mixed")
    p.add_argument("--hash_pool_size", type=int, default=32)
    p.add_argument("--num_hash_functions", type=int, default=12)
    p.add_argument("--num_hash_tables", type=int, default=8)
    p.add_argument("--hash_table_size", type=int, default=105_613)
    p.add_argument("--w", type=float, default=1.0)
    p.add_argument("--num_cut_off_points", type=int, default=6)
    p.add_argument("--work_group_size", type=int, default=512,
                   help="accepted for parity; ignored (no Spark analog)")
    p.add_argument("--indices_save_file", default=None)
    p.add_argument("--distances_save_file", default=None)
    p.add_argument("--indices_ground_truth_file", default=None)
    p.add_argument("--distances_ground_truth_file", default=None)
    p.add_argument("--profiling_type", default="0", choices=["0", "1"],
                   help="0: none, 1: runtimes (YAML)")
    p.add_argument("--profiling_file", default=None)
    p.add_argument("--cores", type=int, default=None)
    p.add_argument("--id_col", default="vec_id")
    p.add_argument("--vec_col", default="embedding")
    p.add_argument("--seed", type=int, default=42)
    return p


def main(argv: list[str] | None = None) -> dict:
    from pyspark.sql import functions as F

    from distributed_gpu_lsh_using_sycl_spark.config import LshConfig
    from distributed_gpu_lsh_using_sycl_spark.operators.lsh_knn import (
        knn_error_ratio, knn_recall, lsh_kneighbors)
    from distributed_gpu_lsh_using_sycl_spark.sources.tables import get_spark

    ns = build_parser().parse_args(argv)
    sanity_check(ns)
    cfg = LshConfig(num_bands=ns.num_hash_tables,
                    rows_per_band=ns.num_hash_functions,
                    signature_pool_size=ns.hash_pool_size,
                    bucket_modulus=ns.hash_table_size,
                    w=ns.w, num_cut_off_points=ns.num_cut_off_points,
                    seed=ns.seed, max_bucket_size=0)

    from pyspark.sql import SparkSession

    events: list[tuple[str, float]] = []
    t0 = time.perf_counter()
    owns_session = SparkSession.getActiveSession() is None
    spark = get_spark("lsh-knn", parallelism=ns.cores)
    events.append(("spark_session", time.perf_counter() - t0))

    t = time.perf_counter()
    if ns.file_parser == "1":
        from pyspark.sql import types as T

        raw = spark.read.csv(ns.file, inferSchema=True)
        cols = F.array(*[F.col(c).cast("double") for c in raw.columns])
        vecs = raw.select(cols.alias(ns.vec_col))
        # Stable 0..n-1 POSITIONAL ids (zipWithIndex follows partition
        # order == file byte order for a single CSV), matching the
        # reference's file-row-position ids. monotonically_increasing_id
        # would encode partition layout — ids would shift with core count
        # / file splits and silently misalign recall/error_ratio against
        # a ground-truth file produced under different partitioning.
        e = spark.createDataFrame(
            vecs.rdd.zipWithIndex().map(lambda t: (t[1], list(t[0][0]))),
            T.StructType([T.StructField(ns.id_col, T.LongType()),
                          T.StructField(ns.vec_col,
                                        T.ArrayType(T.DoubleType()))]))
        dims = len(raw.columns)
    elif (os.path.isfile(ns.file)
          and not ns.file.endswith(".parquet")):
        # the reference's own binary vector format (binary_parser.hpp)
        from distributed_gpu_lsh_using_sycl_spark.sources.binary_format import (
            read_binary_vectors, read_header)

        e = read_binary_vectors(spark, ns.file, id_col=ns.id_col,
                                vec_col=ns.vec_col)
        dims = read_header(ns.file)[2]
    else:
        e = spark.read.parquet(ns.file)
        # parquet's array<> schema doesn't carry the width; ONE explicit
        # probe at the job level (operators refuse to probe implicitly)
        dims = len(e.select(ns.vec_col).head()[0])
    e = e.select(ns.id_col, ns.vec_col)
    n = e.count()
    events.append(("read", time.perf_counter() - t))

    t = time.perf_counter()
    result = lsh_kneighbors(e, ns.knn, family=ns.hash_function, cfg=cfg,
                            id_col=ns.id_col, vec_col=ns.vec_col, dims=dims
                            ).localCheckpoint(eager=True)
    events.append(("fit_and_kneighbors", time.perf_counter() - t))

    out: dict = {"n_points": n, "k": ns.knn,
                 "hash_function": ns.hash_function}
    if ns.indices_save_file:
        t = time.perf_counter()
        (result.select("vec_id", "rank", "neighbor_id")
         .write.mode("overwrite").parquet(ns.indices_save_file))
        events.append(("save_indices", time.perf_counter() - t))
    if ns.distances_save_file:
        t = time.perf_counter()
        (result.select("vec_id", "rank", "dist_sq")
         .write.mode("overwrite").parquet(ns.distances_save_file))
        events.append(("save_distances", time.perf_counter() - t))

    truth = None
    if ns.indices_ground_truth_file:
        t = time.perf_counter()
        truth = spark.read.parquet(ns.indices_ground_truth_file)
        rec = knn_recall(result, truth).head()
        out["recall"] = {"recall": rec["recall"], "correct_count": rec["hits"],
                         "total_count": rec["total"]}
        events.append(("recall", time.perf_counter() - t))
    if ns.distances_ground_truth_file:
        t = time.perf_counter()
        dtruth = spark.read.parquet(ns.distances_ground_truth_file)
        er = knn_error_ratio(result, dtruth).head()
        out["error_ratio"] = {"mean_error_ratio": er["mean_ratio"],
                              "num_points": er["n_points"],
                              "num_points_not_found": er["n_skipped"]}
        events.append(("error_ratio", time.perf_counter() - t))

    if ns.profiling_type == "1" and ns.profiling_file:
        # profiler.cpp:105-176 — runtime events as YAML
        with open(ns.profiling_file, "w") as f:
            f.write("runtimes:\n")
            for name, sec in events:
                f.write(f"  {name}: {sec:.6f}\n")
    print(json.dumps(out))
    if owns_session:  # never stop a session some caller (or pytest) owns
        spark.stop()
    return out


if __name__ == "__main__":
    main()
