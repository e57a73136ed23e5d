"""Blob-scan pushdown parity: sources/blob_scan.scan_signatures must be
bit-identical to operators/signatures.compute_signatures on the same
parquet table — same ids, shingle CRCs, minhash, buckets, phash,
simhash. The fast path exists purely for transport (blobs skip the JVM);
any semantic drift is a correctness bug."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from distributed_gpu_lsh_using_sycl_spark.config import LshConfig
from distributed_gpu_lsh_using_sycl_spark.operators.signatures import (
    compute_signatures, shingle_crc_col, shingle_crcs_py)
from distributed_gpu_lsh_using_sycl_spark.sources import blob_scan
from distributed_gpu_lsh_using_sycl_spark.sources.fixture import make_fixture_spark

CFG = LshConfig()


# adversarial tokenization inputs: Java \s is ASCII-only, F.trim strips
# 0x20 only, NBSP/thin-space must NOT split, casing must fold identically
_EDGE_CAPTIONS = [
    "  Hello   World  ",
    "\tTab\nNewline\x0bVt\x0cFf\rCr end",
    "one",
    "",
    "   ",
    "a b c d e f",
    "ÜNICODE Ss   nbsp",
    "x thinspace y",
    "UPPER lower MiXeD",
    "dup dup dup dup dup",
]


def test_shingle_crcs_py_matches_jvm(spark):
    df = spark.createDataFrame([(c,) for c in _EDGE_CAPTIONS], "caption string")
    jvm = df.select(
        "caption", shingle_crc_col(F.col("caption"), CFG.shingle_size).alias("crcs")
    ).collect()
    for row in jvm:
        assert shingle_crcs_py(row.caption, CFG.shingle_size) == row.crcs, row.caption


@pytest.fixture(scope="module")
def fixture_parquet(spark, tmp_path_factory):
    path = str(tmp_path_factory.mktemp("blobscan") / "images.parquet")
    # several files and >1 row group per file so the split planner is
    # exercised beyond the one-file case
    make_fixture_spark(spark, 180, seed=11, partitions=3) \
        .write.option("parquet.block.size", 64 * 1024) \
        .mode("overwrite").parquet(path)
    return path


def _key(df):
    rows = df.collect()
    return {
        r.image_id: (list(r.shingles or []), list(r.minhash),
                     None if r.buckets is None else list(r.buckets),
                     r.phash, r.simhash)
        for r in rows
    }, len(rows)


def test_scan_signatures_parity(spark, fixture_parquet):
    fast = blob_scan.scan_signatures(spark, fixture_parquet, CFG)
    ref = compute_signatures(spark.read.parquet(fixture_parquet), CFG)
    fast_map, n_fast = _key(fast)
    ref_map, n_ref = _key(ref)
    assert n_fast == n_ref == 180  # no dup/missing rows across splits
    assert fast_map == ref_map


def test_scan_signatures_no_image_parity(spark, fixture_parquet):
    fast = blob_scan.scan_signatures(spark, fixture_parquet, CFG, with_image=False)
    ref = compute_signatures(spark.read.parquet(fixture_parquet), CFG,
                             with_image=False)
    cols = ["image_id", "shingles", "minhash", "buckets", "phash", "simhash"]
    fast_map, _ = _key(fast.select(cols))
    ref_map, _ = _key(ref.select(cols))
    assert fast_map == ref_map


def test_scan_signatures_null_and_edge_captions(spark, tmp_path):
    """NULL captions must mirror the JVM chain exactly: shingles = NULL
    (not []), minhash = empty-set signature, buckets = NULL; int64 ids
    keep their type through the inferred schema."""
    path = str(tmp_path / "edge.parquet")
    rows = [(i, c) for i, c in enumerate([None, "", "   ", "one",
                                          "a b c d", "  Mixed   CASE  "])]
    spark.createDataFrame(rows, "doc_id long, text string") \
        .coalesce(1).write.mode("overwrite").parquet(path)
    fast = blob_scan.scan_signatures(spark, path, CFG, with_image=False,
                                     id_col="doc_id", text_col="text")
    ref = compute_signatures(spark.read.parquet(path), CFG,
                             id_col="doc_id", text_col="text",
                             with_image=False)
    cols = ["image_id", "shingles", "minhash", "buckets"]
    fast_rows = {r.image_id: (r.shingles, list(r.minhash), r.buckets)
                 for r in fast.select(cols).collect()}
    ref_rows = {r.image_id: (r.shingles, list(r.minhash), r.buckets)
                for r in ref.select(cols).collect()}
    assert fast_rows == ref_rows
    assert dict(fast.dtypes)["image_id"] == "bigint"


def test_pipeline_scan_path_same_clusters(spark, fixture_parquet):
    from distributed_gpu_lsh_using_sycl_spark.plans.pipeline import run_dedup

    images = spark.read.parquet(fixture_parquet)
    base = run_dedup(spark, images, CFG)["clusters"].collect()
    fast = run_dedup(spark, images, CFG, scan_path=fixture_parquet)["clusters"].collect()
    assert {(r.image_id, r.cluster_id) for r in base} == \
           {(r.image_id, r.cluster_id) for r in fast}


def test_parquet_splits_cover_all_row_groups(fixture_parquet):
    import pyarrow.parquet as pq

    splits = blob_scan.parquet_splits(fixture_parquet)
    assert len(splits) == len(set(splits))
    total = sum(
        pq.ParquetFile(f).metadata.row_group(rg).num_rows for f, rg in splits)
    assert total == 180
