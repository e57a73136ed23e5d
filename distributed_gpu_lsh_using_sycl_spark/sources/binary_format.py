"""The reference's raw binary vector file format as a DISTRIBUTED Spark
source/sink (binary_parser.hpp:126-236) — closing the one deliberate
I/O divergence (parquet everywhere) with a real interop path, so a
reference user's existing ``.bin`` data files load directly.

Format (binary_parser.hpp):
- header: 3 little-endian uint64 — [sizeof(parsing_type), total_size,
  dims] (validate_parsing_type / parse_total_size / parse_dims);
- body: total_size * dims values of parsing_type (float32 by default,
  float64 behind the reference's SYCL_LSH_USE_DOUBLE), row-major.

Validation mirrors the reference's checks with the SAME error messages
(type-size mismatch, file-size-vs-header mismatch). The reference's
last-rank dummy-point padding (binary_parser.hpp:203-210) is
deliberately NOT reproduced — SURVEY §1.5: padding fabricates duplicate
points; Spark partitions are ragged by design.

Scale shape: the READ is genuinely distributed — ``spark.range(n)``
gives contiguous id runs per partition, and each Arrow batch does ONE
seek + ONE bulk read of its contiguous byte range (no per-row I/O).
Rows get POSITIONAL ids (0..n-1), matching the reference's row ids, at
any parallelism. The WRITE streams partitions in id order through the
driver into one file (the reference's MPI_File_write_ordered is a
rank-ordered collective; a single POSIX file has no parallel-append
analog) — it exists for CLI/interop parity; the production sink is the
parquet/Iceberg stage table (sources/tables.py).
"""

from __future__ import annotations

import os
import struct

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession

HEADER_BYTES = 24  # 3 * uint64


class FileParsingError(ValueError):
    """Analog of sycl_lsh::file_parsing_exception."""


def read_header(path: str) -> tuple[int, int, int]:
    """(type_size_bytes, total_size, dims) from the 24-byte header, with
    the reference's validation (same messages)."""
    with open(path, "rb") as f:
        raw = f.read(HEADER_BYTES)
    if len(raw) < HEADER_BYTES:
        raise FileParsingError(f"Broken file '{path}'! Missing header.")
    type_size, total_size, dims = struct.unpack("<QQQ", raw)
    if type_size not in (4, 8):
        raise FileParsingError(
            f"The data was stored using a {type_size} Byte type but is now "
            f"read using a 4 Byte type which is not supported!")
    file_size = os.path.getsize(path) - HEADER_BYTES
    if file_size != total_size * dims * type_size:
        raise FileParsingError(
            f"Broken file '{path}'! File size ({file_size}) doesn't match "
            f"header information ({total_size} * {dims} * "
            f"sizeof(parsing_type) = {total_size * dims * type_size})")
    return type_size, total_size, dims


def read_binary_vectors(spark: SparkSession, path: str,
                        id_col: str = "vec_id",
                        vec_col: str = "embedding") -> DataFrame:
    """.bin file -> (vec_id long, vec array<double>) with positional ids.

    Each Arrow batch reads its contiguous byte range with one seek — the
    Spark analog of the reference's per-rank MPI_File_read_at offsets
    (binary_parser.hpp:184-189)."""
    type_size, total_size, dims = read_header(path)
    dtype = np.float32 if type_size == 4 else np.float64
    row_bytes = dims * type_size
    schema = f"{id_col} long, {vec_col} array<double>"

    def gen(batches):
        with open(path, "rb") as f:
            for pdf in batches:
                ids = pdf["id"].to_numpy(dtype=np.int64)
                if len(ids) == 0:
                    continue
                lo = int(ids.min())
                # range partitions are contiguous id runs; assert rather
                # than silently mis-slice if that ever changes
                assert int(ids.max()) - lo + 1 == len(ids)
                f.seek(HEADER_BYTES + lo * row_bytes)
                buf = f.read(len(ids) * row_bytes)
                m = np.frombuffer(buf, dtype=dtype) \
                    .reshape(len(ids), dims).astype(np.float64)
                yield pd.DataFrame({id_col: ids, vec_col: list(m)})

    return spark.range(total_size).mapInPandas(gen, schema=schema)


def write_binary_vectors(df: DataFrame, path: str, dims: int,
                         id_col: str = "vec_id",
                         vec_col: str = "embedding",
                         use_double: bool = False) -> int:
    """(id, vec) -> one reference-format .bin file, rows in id order
    (the MPI_File_write_ordered analog). Returns total rows written.
    Streams via toLocalIterator — bounded driver memory."""
    dtype = np.float64 if use_double else np.float32
    type_size = 8 if use_double else 4
    it = (df.select(id_col, vec_col).orderBy(id_col)
          .toLocalIterator(prefetchPartitions=True))
    n = 0
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        f.write(struct.pack("<QQQ", type_size, 0, dims))  # patched below
        for row in it:
            v = np.asarray(row[vec_col], dtype=dtype)
            if len(v) != dims:
                raise FileParsingError(
                    f"Row {row[id_col]} has {len(v)} dims, expected {dims}")
            f.write(v.tobytes())
            n += 1
        f.seek(8)
        f.write(struct.pack("<Q", n))
    os.replace(tmp, path)
    return n
