"""Connected components vs a driver-side union-find oracle."""

import numpy as np
import pytest


def _union_find_clusters(n_ids, edges):
    parent = {i: i for i in n_ids}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    return {i: find(i) for i in n_ids}


@pytest.mark.parametrize("seed,n,p", [(1, 60, 0.03), (2, 100, 0.01), (3, 40, 0.15)])
def test_cc_matches_union_find(spark, seed, n, p):
    from distributed_gpu_lsh_using_sycl_spark.operators.components import assign_clusters

    rng = np.random.Generator(np.random.PCG64(seed))
    ids = [f"v{i:04d}" for i in range(n)]
    edges = [(ids[i], ids[j]) for i in range(n) for j in range(i + 1, n)
             if rng.random() < p]
    expect = _union_find_clusters(ids, edges)

    vdf = spark.createDataFrame([(i,) for i in ids], ["image_id"])
    edf = spark.createDataFrame(edges or [("v0000", "v0000")], ["a", "b"])
    got = {r["image_id"]: r["cluster_id"]
           for r in assign_clusters(vdf, edf).collect()}
    assert got == expect


def test_cc_chain_and_star(spark):
    """A long path (worst case for propagation) and a star collapse to one
    cluster rooted at the min."""
    from distributed_gpu_lsh_using_sycl_spark.operators.components import assign_clusters

    chain = [(f"c{i:03d}", f"c{i+1:03d}") for i in range(30)]
    star = [("s000", f"s{i:03d}") for i in range(1, 10)]
    ids = sorted({x for e in chain + star for x in e}) + ["lonely"]
    vdf = spark.createDataFrame([(i,) for i in ids], ["image_id"])
    edf = spark.createDataFrame(chain + star, ["a", "b"])
    got = {r["image_id"]: r["cluster_id"] for r in assign_clusters(vdf, edf).collect()}
    assert {got[f"c{i:03d}"] for i in range(31)} == {"c000"}
    assert {got[f"s{i:03d}"] for i in range(10)} == {"s000"}
    assert got["lonely"] == "lonely"


@pytest.mark.parametrize("seed", [7, 11])
def test_small_graph_path_equals_distributed(spark, seed):
    """The driver union-find fast path must produce assignments IDENTICAL
    to the large-star/small-star loop (same component-min cluster ids,
    same node set), and the threshold must gate which path runs: above
    the edge count the distributed loop engages (and still matches)."""
    from distributed_gpu_lsh_using_sycl_spark.operators.components import (
        connected_components)

    rng = np.random.default_rng(seed)
    ids = [f"v{i:04d}" for i in range(120)]
    edges = [(ids[i], ids[j]) for i in range(120) for j in range(i + 1, 120)
             if rng.random() < 0.02]
    edf = spark.createDataFrame(edges, ["a", "b"])

    dist = {(r["image_id"], r["cluster_id"])
            for r in connected_components(edf).collect()}
    fast = {(r["image_id"], r["cluster_id"])
            for r in connected_components(
                edf, small_graph_threshold=10**6).collect()}
    assert fast == dist and len(fast) > 0
    # threshold below the edge count -> distributed path (still equal)
    over = {(r["image_id"], r["cluster_id"])
            for r in connected_components(
                edf, small_graph_threshold=1).collect()}
    assert over == dist
