"""Codec invariants + fixture determinism (the input-contract tests)."""

import numpy as np
import pytest

from distributed_gpu_lsh_using_sycl_spark.functions import image_codec as C
from distributed_gpu_lsh_using_sycl_spark.functions.hashing import hamming64
from distributed_gpu_lsh_using_sycl_spark.sources import fixture as FX


def _rand_img(seed, h=64, w=80):
    rng = np.random.Generator(np.random.PCG64(seed))
    return rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)


def test_png_roundtrip_lossless():
    img = _rand_img(1)
    dec, fmt = C.decode_image(C.encode_image(img, "png"))
    assert fmt == "png"
    assert (dec == img).all()


def test_jpeg_roundtrip_psnr_ge_40():
    img = _rand_img(2)
    dec, fmt = C.decode_image(C.encode_image(img, "jpeg"))
    assert fmt == "jpeg"
    assert dec.shape == img.shape
    assert C.psnr(img, dec) >= 40.0


def test_phash_stability_under_lossy_and_noise():
    img = FX._base_pixels(42, 0)
    h0 = C.phash64(img)
    dec, _ = C.decode_image(C.encode_image(img, "jpeg"))
    h1 = C.phash64(dec)
    assert int(hamming64(np.array([h0]).astype(np.uint64),
                         np.array([h1]).astype(np.uint64))[0]) <= 4
    # unrelated image → large distance
    h2 = C.phash64(FX._base_pixels(42, 5))
    assert int(hamming64(np.array([h0]).astype(np.uint64),
                         np.array([h2]).astype(np.uint64))[0]) >= 10


def test_fixture_deterministic_and_invariants():
    images, truth = FX.make_fixture_pandas(40, seed=42)
    images2, _ = FX.make_fixture_pandas(40, seed=42)
    assert images.equals(images2)
    assert len(images) == 40
    assert set(truth["kind"]) == {"combined", "image", "caption", "substring"}
    # per-row invariant: decode(bytes) vs generation-time pixels
    for _, row in images.iterrows():
        idx = int(row["image_id"].split("_")[1])
        pixels, caption, fmt = FX.row_content(42, idx)
        dec, dfmt = C.decode_image(row["bytes"])
        assert dfmt == row["fmt"] == fmt
        assert caption == row["caption"]  # exact caption equality
        assert dec.shape == pixels.shape
        if fmt == "png":
            assert (dec == pixels).all()
        else:
            assert C.psnr(pixels, dec) >= 40.0


def test_fixture_planted_dups_are_near():
    """Planted image dups must be near in phash/blocks; planted caption
    dups near in shingle Jaccard; substring dups must actually contain."""
    from distributed_gpu_lsh_using_sycl_spark.functions.text import jaccard, shingles

    images, truth = FX.make_fixture_pandas(60, seed=42)
    by_id = images.set_index("image_id")
    for _, t in truth.iterrows():
        ra, rb = by_id.loc[t["a"]], by_id.loc[t["b"]]
        if t["kind"] in ("image", "combined"):
            d = int(hamming64(np.array([ra["phash"]]).astype(np.int64).view(np.uint64),
                              np.array([rb["phash"]]).astype(np.int64).view(np.uint64))[0])
            assert d <= 10, f"{t['a']}-{t['b']} phash hamming {d}"
        if t["kind"] in ("caption", "combined"):
            j = jaccard(shingles(ra["caption"], 3), shingles(rb["caption"], 3))
            assert j >= 0.5, f"{t['a']}-{t['b']} jaccard {j}"
        if t["kind"] == "substring":
            assert ra["caption"] in rb["caption"]


def test_perturbed_image_psnr_vs_anchor():
    anchor = FX._base_pixels(42, 10)
    pert = FX._perturb_pixels(anchor, 42, 17)
    hh = min(anchor.shape[0], pert.shape[0])
    ww = min(anchor.shape[1], pert.shape[1])
    assert C.psnr(anchor[:hh, :ww], pert[:hh, :ww]) >= 40.0
