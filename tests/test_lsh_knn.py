"""The reference's user-facing kNN query (fit + kneighbors,
main.cpp:46-55) pinned end-to-end: the distributed lsh_kneighbors plan
must equal the numpy restatement of the reference search semantics
(parity/oracle.knn_oracle — bucket scan over ALL tables, self excluded,
k nearest by squared L2, own-id fill) slot for slot, and the
spark-submit CLI (jobs/run_lsh_knn.py) must parse/sanity-check exactly
like options.cpp:32-51."""

import numpy as np
import pandas as pd
import pytest

from distributed_gpu_lsh_using_sycl_spark.config import LshConfig
from distributed_gpu_lsh_using_sycl_spark.functions import hashing as H
from distributed_gpu_lsh_using_sycl_spark.parity import oracle

N, DIMS, K = 120, 8, 4
CFG = LshConfig(max_bucket_size=0)


def _points(n=N, dims=DIMS, seed=5):
    rng = np.random.Generator(np.random.PCG64(seed))
    centers = rng.uniform(-1, 1, size=(4, dims))
    pts = centers[np.arange(n) % 4] + rng.standard_normal((n, dims)) * 0.05
    return np.clip(pts, -1, 1)


def _seq_buckets(points01: np.ndarray, cfg: LshConfig) -> np.ndarray:
    """rp chain with the SEQUENTIAL fold order of rp_buckets_df."""
    funcs = H.random_projection_pool(cfg.seed, cfg.num_bands, cfg.rows_per_band,
                                     cfg.signature_pool_size,
                                     points01.shape[1], cfg.w)
    L, k, _ = funcs.shape
    dims = points01.shape[1]
    out = np.zeros((len(points01), L), dtype=np.int64)
    for t in range(L):
        proj = H.seqdot(points01, funcs[t, :, :dims]) + funcs[t, :, dims][None, :]
        q = (np.floor(proj / cfg.w).astype(np.int64) & 0xFFFFFFFF).astype(np.uint32)
        acc = np.full(len(points01), k, dtype=np.uint32)
        for j in range(k):
            acc = H.hash_combine_u32(acc, q[:, j])
        out[:, t] = acc.astype(np.int64) % cfg.bucket_modulus
    return out


def test_lsh_kneighbors_matches_reference_oracle(spark):
    from distributed_gpu_lsh_using_sycl_spark.operators.lsh_knn import (
        lsh_kneighbors)

    pts = _points()
    # rp_buckets_df applies the fixed affine01 [−1,1]→[0,1] map; mirror it
    # with the identical double ops so buckets agree bit-exactly.
    p01 = np.clip((pts + 1.0) * 0.5, 0.0, 1.0)
    buckets = _seq_buckets(p01, CFG)
    want = oracle.knn_oracle(pts, buckets, K)  # distances on the raw points

    pdf = pd.DataFrame({"vec_id": np.arange(N), "v": pts.tolist()})
    df = spark.createDataFrame(pdf)
    got = (lsh_kneighbors(df, K, family="random_projections", cfg=CFG,
                          dims=DIMS)
           .toPandas().sort_values(["vec_id", "rank"]))
    got_m = got["neighbor_id"].to_numpy().reshape(N, K)
    assert got_m.shape == want.shape
    mism = (got_m != want).sum()
    assert mism == 0, f"{mism} neighbor slots differ from the reference oracle"
    # not-found slots carry the sentinel distance
    own = got[got["neighbor_id"] == got["vec_id"]]
    assert (own["dist_sq"] == -1.0).all()


def test_cli_sanity_checks_match_options_cpp():
    from jobs.run_lsh_knn import InvalidLshOption, build_parser, sanity_check

    ns = build_parser().parse_args(["in.parquet", "5", "--hash_pool_size", "0"])
    with pytest.raises(InvalidLshOption, match="Invalid 'hash_pool_size'! "
                       "Must be larger than 0 but is 0."):
        sanity_check(ns)
    ns = build_parser().parse_args(["in.parquet", "5", "--w", "-1"])
    with pytest.raises(InvalidLshOption, match="Invalid 'w'!"):
        sanity_check(ns)
    # reference defaults (options.cpp:74-82)
    ns = build_parser().parse_args(["in.parquet", "5"])
    assert (ns.hash_pool_size, ns.num_hash_functions, ns.num_hash_tables,
            ns.hash_table_size, ns.w, ns.num_cut_off_points) == (
        32, 12, 8, 105_613, 1.0, 6)


def test_cli_end_to_end(tmp_path, spark):
    """Full CLI run on a small parquet: saves indices+distances, computes
    recall==1 and error_ratio==1 against its own output as ground truth."""
    from jobs import run_lsh_knn

    pts = _points(40)
    pd.DataFrame({"vec_id": np.arange(40), "embedding": pts.tolist()}
                 ).to_parquet(tmp_path / "in.parquet")
    out = run_lsh_knn.main([
        str(tmp_path / "in.parquet"), str(K),
        "--indices_save_file", str(tmp_path / "idx"),
        "--distances_save_file", str(tmp_path / "dist"),
        "--profiling_type", "1",
        "--profiling_file", str(tmp_path / "prof.yaml"),
        "--cores", "4",
    ])
    assert out["n_points"] == 40
    idx = pd.read_parquet(tmp_path / "idx")
    dist = pd.read_parquet(tmp_path / "dist")
    assert len(idx) == len(dist) == 40 * K
    assert "runtimes:" in (tmp_path / "prof.yaml").read_text()

    truth = idx.merge(dist, on=["vec_id", "rank"])
    truth.to_parquet(tmp_path / "truth.parquet")
    out2 = run_lsh_knn.main([
        str(tmp_path / "in.parquet"), str(K),
        "--indices_ground_truth_file", str(tmp_path / "truth.parquet"),
        "--distances_ground_truth_file", str(tmp_path / "truth.parquet"),
        "--cores", "4",
    ])
    # reference reports recall in PERCENT (nearest_neighbors_result.cpp:131)
    assert out2["recall"]["recall"] == 100.0
    assert out2["error_ratio"]["mean_error_ratio"] == pytest.approx(1.0)
