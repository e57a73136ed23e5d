"""Reference binary file format (binary_parser.hpp:126-236): round-trip,
positional ids, header validation with the reference's error messages,
and CLI integration (file_parser 0 on a regular file)."""

import struct

import numpy as np
import pytest

from distributed_gpu_lsh_using_sycl_spark.sources.binary_format import (
    FileParsingError, read_binary_vectors, read_header, write_binary_vectors)


def _mk(path, n=100, dims=6, seed=3, dtype=np.float32):
    rng = np.random.Generator(np.random.PCG64(seed))
    m = rng.standard_normal((n, dims)).astype(dtype)
    with open(path, "wb") as f:
        f.write(struct.pack("<QQQ", m.itemsize, n, dims))
        f.write(m.tobytes())
    return m


def test_round_trip_and_positional_ids(spark, tmp_path):
    p = str(tmp_path / "in.bin")
    m = _mk(p)
    df = read_binary_vectors(spark, p)
    rows = {r["vec_id"]: r["embedding"] for r in df.collect()}
    assert len(rows) == 100
    for i in range(100):
        np.testing.assert_allclose(rows[i], m[i].astype(np.float64))
    # ids are positional at ANY parallelism (ranged reads, not
    # partition-layout ids)
    df2 = read_binary_vectors(spark, p).repartition(7)
    assert {r["vec_id"] for r in df2.collect()} == set(range(100))

    out = str(tmp_path / "out.bin")
    n = write_binary_vectors(df, out, dims=6)
    assert n == 100
    assert read_header(out) == (4, 100, 6)
    m2 = {r["vec_id"]: r["embedding"] for r in
          read_binary_vectors(spark, out).collect()}
    for i in range(100):
        np.testing.assert_allclose(m2[i], rows[i])


def test_float64_body(spark, tmp_path):
    p = str(tmp_path / "d.bin")
    m = _mk(p, n=20, dims=4, dtype=np.float64)
    rows = {r["vec_id"]: r["embedding"] for r in
            read_binary_vectors(spark, p).collect()}
    for i in range(20):
        np.testing.assert_array_equal(rows[i], m[i])


def test_validation_messages(tmp_path):
    bad_type = tmp_path / "t.bin"
    bad_type.write_bytes(struct.pack("<QQQ", 2, 1, 1) + b"\x00\x00")
    with pytest.raises(FileParsingError, match="2 Byte type"):
        read_header(str(bad_type))
    truncated = tmp_path / "s.bin"
    truncated.write_bytes(struct.pack("<QQQ", 4, 10, 3) + b"\x00" * 16)
    with pytest.raises(FileParsingError, match="doesn't match header"):
        read_header(str(truncated))


def test_cli_reads_reference_binary(spark, tmp_path):
    from jobs import run_lsh_knn

    p = str(tmp_path / "cli.bin")
    _mk(p, n=30, dims=5)
    out = run_lsh_knn.main([p, "3", "--cores", "4",
                            "--indices_save_file",
                            str(tmp_path / "idx")])
    assert out["n_points"] == 30
