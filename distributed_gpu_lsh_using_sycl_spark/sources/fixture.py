"""Deterministic synthetic image+caption fixture with planted duplicates.

Analog of the reference's ``generate_data.py`` (seeded ``make_blobs``,
``random_state=1`` — generate_data.py:37-47): every byte is a pure
function of ``(seed, row_index)``, so generation parallelizes over Spark
with any partitioning and regenerating a row for invariant checks is
exact.

Planted structure (FIXTURES.md §1): rows come in blocks of 10; within a
block, row 0..5 are independent, and

=====  =======================================================
idx%10 role (anchor = the block's row 0)
=====  =======================================================
6      combined dup: near-dup image AND near-dup caption
7      image near-dup (re-encode other fmt, ±1px resize, ±2 noise;
       PSNR vs anchor kept ≥ 40 dB), fresh caption
8      caption near-dup (1 token substituted), fresh image
9      exact-substring dup: anchor caption embedded verbatim in a
       ~3x longer caption (suffix/substring-pass target), fresh image
=====  =======================================================

``truth_pairs(a, b, kind)`` (a < b) records the planted pairs; the
*measured* ground truth for recall is brute force over the generated
rows (tests/oracle), mirroring the reference's brute-force k-NN oracle
(utility_scripts/calculate_exact_nearest_neighbors.py:66-72).
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from distributed_gpu_lsh_using_sycl_spark.functions.image_codec import encode_image, phash64

SIZES = (64, 96, 128)
FMTS = ("png", "jpeg")
VOCAB_SIZE = 500
#: marker tokens woven in so the language-ID heuristic has signal.
_MARKERS = ("the", "and", "of", "to", "is", "in", "el", "la", "de", "que",
            "le", "les", "der", "die", "und", "das")

IMAGES_COLUMNS = ["image_id", "bytes", "w", "h", "fmt", "caption", "phash"]


def _vocab(seed: int) -> list[str]:
    rng = np.random.Generator(np.random.PCG64([seed, 811]))
    words = [f"w{i:03d}" for i in range(VOCAB_SIZE - len(_MARKERS))] + list(_MARKERS)
    rng.shuffle(words)
    return words


_VOCAB_CACHE: dict[int, list[str]] = {}


def vocab(seed: int) -> list[str]:
    v = _VOCAB_CACHE.get(seed)
    if v is None:
        v = _vocab(seed)
        _VOCAB_CACHE[seed] = v
    return v


def _rng(seed: int, idx: int, stream: int) -> np.random.Generator:
    return np.random.Generator(np.random.PCG64([seed, idx, stream]))


def _base_pixels(seed: int, idx: int) -> np.ndarray:
    """Gradient + seeded noise + a few solid rectangles, (h, w, 3) uint8."""
    rng = _rng(seed, idx, 1)
    h = int(SIZES[rng.integers(0, len(SIZES))])
    w = int(SIZES[rng.integers(0, len(SIZES))])
    yy = np.linspace(0, 255, h)[:, None]
    xx = np.linspace(0, 255, w)[None, :]
    base = np.stack([yy + 0 * xx, 0 * yy + xx, (yy + xx) / 2], axis=2)
    img = base + rng.normal(0, 12, size=(h, w, 3))
    for _ in range(int(rng.integers(2, 5))):
        y0, x0 = int(rng.integers(0, h - 8)), int(rng.integers(0, w - 8))
        hh, ww = int(rng.integers(8, h // 2)), int(rng.integers(8, w // 2))
        img[y0:y0 + hh, x0:x0 + ww] = rng.integers(0, 256, size=3)
    return img.clip(0, 255).astype(np.uint8)


def _base_caption(seed: int, idx: int) -> str:
    rng = _rng(seed, idx, 2)
    v = vocab(seed)
    n = int(rng.integers(8, 41))
    return " ".join(v[i] for i in rng.integers(0, VOCAB_SIZE, size=n))


def _perturb_pixels(anchor: np.ndarray, seed: int, idx: int) -> np.ndarray:
    """±1px resize (edge crop) + low-amplitude noise; PSNR vs anchor ≥ 40 dB."""
    rng = _rng(seed, idx, 3)
    img = anchor.astype(np.int16)
    img = img + rng.integers(-2, 3, size=img.shape)  # MSE ≤ 2 → ~45 dB
    img = img.clip(0, 255).astype(np.uint8)
    if rng.random() < 0.5 and img.shape[0] > 8 and img.shape[1] > 8:
        img = img[: img.shape[0] - 1, : img.shape[1] - 1]  # −1 px crop
    return img


def _perturb_caption(anchor: str, seed: int, idx: int) -> str:
    """Substitute the FINAL token — that kills exactly one k-shingle, so
    Jaccard = (n−k)/(n−k+2) ≥ 0.71 for n ≥ 8: a guaranteed-above-threshold
    planted near-dup at jaccard_threshold = 0.5."""
    rng = _rng(seed, idx, 4)
    toks = anchor.split()
    toks[-1] = vocab(seed)[int(rng.integers(0, VOCAB_SIZE))]
    return " ".join(toks)


def _substring_caption(anchor: str, seed: int, idx: int) -> str:
    """Anchor caption embedded verbatim inside a ~3x longer caption."""
    rng = _rng(seed, idx, 5)
    v = vocab(seed)
    n_anchor = len(anchor.split())
    pre = " ".join(v[i] for i in rng.integers(0, VOCAB_SIZE, size=n_anchor))
    post = " ".join(v[i] for i in rng.integers(0, VOCAB_SIZE, size=n_anchor))
    return f"{pre} {anchor} {post}"


def row_content(seed: int, idx: int) -> tuple[np.ndarray, str, str]:
    """(pixels, caption, fmt) for a row — pure function of (seed, idx)."""
    role = idx % 10
    rng = _rng(seed, idx, 6)
    fmt = FMTS[int(rng.integers(0, 2))]
    anchor = idx - role
    if role == 6:  # combined dup
        return (_perturb_pixels(_base_pixels(seed, anchor), seed, idx),
                _perturb_caption(_base_caption(seed, anchor), seed, idx), fmt)
    if role == 7:  # image near-dup
        return (_perturb_pixels(_base_pixels(seed, anchor), seed, idx),
                _base_caption(seed, idx), fmt)
    if role == 8:  # caption near-dup
        return (_base_pixels(seed, idx),
                _perturb_caption(_base_caption(seed, anchor), seed, idx), fmt)
    if role == 9:  # substring dup
        return (_base_pixels(seed, idx),
                _substring_caption(_base_caption(seed, anchor), seed, idx), fmt)
    return _base_pixels(seed, idx), _base_caption(seed, idx), fmt


def image_id(idx: int) -> str:
    return f"img_{idx:09d}"


def rows_for_indices(seed: int, indices) -> pd.DataFrame:
    """Generate fixture rows for an arbitrary index set (mapInPandas body)."""
    recs = []
    for idx in indices:
        idx = int(idx)
        pixels, caption, fmt = row_content(seed, idx)
        recs.append({
            "image_id": image_id(idx),
            "bytes": encode_image(pixels, fmt),
            "w": int(pixels.shape[1]),
            "h": int(pixels.shape[0]),
            "fmt": fmt,
            "caption": caption,
            "phash": phash64(pixels),
        })
    return pd.DataFrame(recs, columns=IMAGES_COLUMNS)


def truth_pairs(seed: int, n_rows: int) -> pd.DataFrame:
    """Planted pair list (a < b lexicographically == numerically here)."""
    kinds = {6: "combined", 7: "image", 8: "caption", 9: "substring"}
    recs = []
    for idx in range(n_rows):
        role = idx % 10
        if role in kinds and idx - role >= 0 and idx - role != idx:
            recs.append({"a": image_id(idx - role), "b": image_id(idx),
                         "kind": kinds[role]})
    return pd.DataFrame(recs, columns=["a", "b", "kind"])


def make_fixture_pandas(n_rows: int, seed: int = 42) -> tuple[pd.DataFrame, pd.DataFrame]:
    """Driver-side generation for small test fixtures."""
    return rows_for_indices(seed, range(n_rows)), truth_pairs(seed, n_rows)


def make_fixture_spark(spark, n_rows: int, seed: int = 42, partitions: int | None = None):
    """Distributed generation: spark.range → mapInPandas → images DataFrame.

    Row content depends only on (seed, idx), so the result is identical
    for any partitioning — the property that makes the fixture usable as
    a determinism probe across parallelism levels.
    """
    from pyspark.sql import types as T

    schema = T.StructType([
        T.StructField("image_id", T.StringType(), False),
        T.StructField("bytes", T.BinaryType(), False),
        T.StructField("w", T.IntegerType(), False),
        T.StructField("h", T.IntegerType(), False),
        T.StructField("fmt", T.StringType(), False),
        T.StructField("caption", T.StringType(), False),
        T.StructField("phash", T.LongType(), False),
    ])

    def gen(batches):
        for pdf in batches:
            yield rows_for_indices(seed, pdf["id"].to_numpy())

    rng_df = spark.range(0, n_rows, numPartitions=partitions or spark.sparkContext.defaultParallelism)
    return rng_df.mapInPandas(gen, schema=schema)
