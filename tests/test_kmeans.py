"""Deterministic k-means: cross-engine exactness at extra iterations
(the driver gate only runs n_iter=2) and clustering sanity on planted
blobs — fixed-point centroid sums make Spark and DuckDB agree
value-for-value, which a double-sum k-means cannot do."""

import duckdb
import numpy as np
import pandas as pd
import pytest

from distributed_gpu_lsh_using_sycl_spark.operators.kmeans import (
    kmeans_assign, kmeans_oracle_sql)

SF = "/root/testdata/sf0.001"


def test_three_iterations_match_duckdb(spark):
    e = spark.read.parquet(f"{SF}/embeddings.parquet").select(
        "vec_id", "embedding")
    got = {r["vec_id"]: (r["cluster"], r["dist"]) for r in
           kmeans_assign(e, n_centroids=6, n_iter=3,
                         vec_col="embedding").collect()}
    con = duckdb.connect()
    con.execute(f"create view embeddings as select * from "
                f"read_parquet('{SF}/embeddings.parquet')")
    dims = len(con.execute("select embedding from embeddings limit 1"
                           ).fetchone()[0])
    want = {r[0]: (r[1], r[2]) for r in con.execute(
        kmeans_oracle_sql(n_centroids=6, n_iter=3, dims=dims)).fetchall()}
    assert got == want
    assert len({c for c, _ in got.values()}) > 1  # not everything in one cell


def test_planted_blobs_recovered(spark):
    rng = np.random.Generator(np.random.PCG64(9))
    centers = np.array([[2.0, 0, 0, 0], [0, 2.0, 0, 0], [0, 0, 2.0, 0]])
    labels = np.arange(90) % 3
    pts = centers[labels] + rng.standard_normal((90, 4)) * 0.05
    # ids 0..2 are one point from each blob -> init centroids = one per blob
    order = np.argsort(labels, kind="stable")
    first = [np.flatnonzero(labels == b)[0] for b in range(3)]
    rest = [i for i in order if i not in first]
    perm = first + rest
    pdf = pd.DataFrame({"vec_id": np.arange(90),
                        "v": [pts[i].tolist() for i in perm]})
    truth = {int(i): int(labels[p]) for i, p in enumerate(perm)}
    df = spark.createDataFrame(pdf)
    got = {r["vec_id"]: r["cluster"] for r in
           kmeans_assign(df, n_centroids=3, n_iter=3).collect()}
    assert all(got[i] == truth[i] for i in got), "blob structure not recovered"
