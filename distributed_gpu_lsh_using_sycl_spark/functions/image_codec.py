"""Deterministic pure-numpy image codec + perceptual hashing.

The container has no PIL/OpenCV, so the ``bytes`` column uses a small
deterministic container format ("SIMG") with a genuinely lossless mode
("png" stand-in: zlib over raw RGB) and a genuinely lossy mode ("jpeg"
stand-in: 6-bit uniform quantization per channel, zlib-compressed). The
lossy mode has a real, measurable reconstruction error with
PSNR ≈ 46 dB ≥ the 40 dB input-contract floor, so the per-row invariant
check exercises a real decode, not a mock.

Swapping in a real codec on a cluster is a 2-function change
(``encode_image`` / ``decode_image``); every other component consumes
decoded ``(h, w, 3) uint8`` arrays.

Perceptual hashing:
- ``phash64``: classic 32x32 DCT-II, top-left 8x8 minus DC, median
  threshold — the hash stored in the input table's ``phash`` column.
- ``block_features``: 8x8 grid of quantized block means — the
  decoded-pixel features that seed the image SimHash (north-rule analog
  of the reference's dense feature vector, data_set.hpp:41-150).
"""

from __future__ import annotations

import zlib

import numpy as np

MAGIC = b"SIMG"
FMT_CODES = {"png": 0, "jpeg": 1}
FMT_NAMES = {v: k for k, v in FMT_CODES.items()}
#: lossy quantization: stored value v = pixel >> 2, decoded as (v << 2) + 1
#: → error in {-2,-1,0,1}, MSE = 1.5, PSNR = 10*log10(255^2/1.5) ≈ 46.4 dB.
_Q_SHIFT = 2
_Q_BIAS = 1


def encode_image(pixels: np.ndarray, fmt: str) -> bytes:
    """Encode an (h, w, 3) uint8 array into SIMG bytes."""
    if pixels.dtype != np.uint8 or pixels.ndim != 3 or pixels.shape[2] != 3:
        raise ValueError("expected (h, w, 3) uint8 pixels")
    h, w = pixels.shape[:2]
    header = MAGIC + bytes([FMT_CODES[fmt]]) + int(w).to_bytes(2, "little") + int(h).to_bytes(2, "little")
    payload = pixels if fmt == "png" else (pixels >> _Q_SHIFT)
    return header + zlib.compress(payload.tobytes(), 6)


def decode_image(blob: bytes) -> tuple[np.ndarray, str]:
    """Decode SIMG bytes → ((h, w, 3) uint8 pixels, fmt)."""
    if blob[:4] != MAGIC:
        raise ValueError("not a SIMG blob")
    fmt = FMT_NAMES[blob[4]]
    w = int.from_bytes(blob[5:7], "little")
    h = int.from_bytes(blob[7:9], "little")
    raw = np.frombuffer(zlib.decompress(blob[9:]), dtype=np.uint8).reshape(h, w, 3)
    if fmt == "jpeg":
        raw = ((raw.astype(np.uint16) << _Q_SHIFT) + _Q_BIAS).clip(0, 255).astype(np.uint8)
    return raw, fmt


def decode_images_grouped(blobs) -> list[tuple[np.ndarray, np.ndarray]]:
    """Batch decode of a sequence of SIMG blobs.

    Per-blob Python work is only the 9-byte header parse and ONE zlib C
    call; dequantize + reshape run once per (fmt, w, h) shape group over
    the concatenated payload buffer, so a fixed-shape corpus (the normal
    case per row group) decodes with zero per-image numpy work. Returns
    ``[(indices int64 array, (m, h, w, 3) uint8 pixels), ...]`` — indices
    are positions in the input sequence.
    """
    groups: dict[tuple, tuple[list, list]] = {}
    for i, blob in enumerate(blobs):
        if blob[:4] != MAGIC:
            raise ValueError("not a SIMG blob")
        key = (blob[4], int.from_bytes(blob[5:7], "little"),
               int.from_bytes(blob[7:9], "little"))
        idxs, raws = groups.setdefault(key, ([], []))
        idxs.append(i)
        raws.append(zlib.decompress(blob[9:]))
    out = []
    for (fc, w, h), (idxs, raws) in groups.items():
        arr = np.frombuffer(b"".join(raws), dtype=np.uint8) \
            .reshape(len(idxs), h, w, 3)
        if FMT_NAMES[fc] == "jpeg":
            arr = ((arr.astype(np.uint16) << _Q_SHIFT) + _Q_BIAS) \
                .clip(0, 255).astype(np.uint8)
        out.append((np.asarray(idxs, dtype=np.int64), arr))
    return out


def psnr(a: np.ndarray, b: np.ndarray) -> float:
    """Peak signal-to-noise ratio in dB between two uint8 images."""
    mse = np.mean((a.astype(np.float64) - b.astype(np.float64)) ** 2)
    if mse == 0:
        return float("inf")
    return float(10.0 * np.log10(255.0 ** 2 / mse))


# --------------------------------------------------------------------------- #
# grayscale / resize / DCT — building blocks (all pure numpy)
# --------------------------------------------------------------------------- #

def to_gray(pixels: np.ndarray) -> np.ndarray:
    """ITU-R 601 luma, float64 (h, w)."""
    p = pixels.astype(np.float64)
    return 0.299 * p[:, :, 0] + 0.587 * p[:, :, 1] + 0.114 * p[:, :, 2]


def resize_area(img: np.ndarray, out_h: int, out_w: int) -> np.ndarray:
    """Area-style resize of a 2-D array via index-bucket means.

    Deterministic and monotone under small input resizes — good enough
    for perceptual hashing (we need stability, not fidelity). Buckets are
    the contiguous runs of (i * out) // n, so two ``add.reduceat`` passes
    compute the bucket sums (~10x faster than the equivalent np.add.at).
    """
    h, w = img.shape
    if out_h > h or out_w > w:  # upscaling: repeat-pad first (rare path)
        img = np.repeat(np.repeat(img, -(-out_h // h), axis=0),
                        -(-out_w // w), axis=1)
        h, w = img.shape
    row_idx = (np.arange(h) * out_h) // h
    col_idx = (np.arange(w) * out_w) // w
    row_bounds = np.searchsorted(row_idx, np.arange(out_h))
    col_bounds = np.searchsorted(col_idx, np.arange(out_w))
    sums = np.add.reduceat(np.add.reduceat(img, row_bounds, axis=0),
                           col_bounds, axis=1)
    rcnt = np.diff(np.append(row_bounds, h)).astype(np.float64)
    ccnt = np.diff(np.append(col_bounds, w)).astype(np.float64)
    cnt = rcnt[:, None] * ccnt[None, :]
    return sums / np.maximum(cnt, 1.0)


_DCT_CACHE: dict[int, np.ndarray] = {}


def _dct_matrix(n: int) -> np.ndarray:
    """Orthonormal DCT-II basis matrix (n x n)."""
    m = _DCT_CACHE.get(n)
    if m is None:
        k = np.arange(n)[:, None]
        i = np.arange(n)[None, :]
        m = np.cos(np.pi * (2 * i + 1) * k / (2 * n)) * np.sqrt(2.0 / n)
        m[0] *= np.sqrt(0.5)
        _DCT_CACHE[n] = m
    return m


def phash64(pixels: np.ndarray) -> int:
    """Classic 64-bit perceptual hash: gray → 32x32 → DCT-II → top-left
    8x8 minus DC → median threshold. Returned as a *signed* int64 value
    (two's-complement view) to match the table's ``phash:int64`` column.
    """
    g = resize_area(to_gray(pixels), 32, 32)
    d = _dct_matrix(32)
    coefs = d @ g @ d.T
    block = coefs[:8, :8].flatten()[1:]  # drop DC
    med = np.median(block)
    bits = (block > med).astype(np.uint64)
    h = np.uint64(0)
    for i, b in enumerate(bits):
        h |= b << np.uint64(i)
    return int(h.view(np.int64))


# --------------------------------------------------------------------------- #
# batched kernels — bit-identical to the scalar versions above (same
# elementwise expressions / same reduceat boundaries / same matmul
# associativity, vectorized over a leading batch axis; pinned by
# tests/test_batch_codec.py)
# --------------------------------------------------------------------------- #

def to_gray_batch(pixels: np.ndarray) -> np.ndarray:
    """(m, h, w, 3) uint8 -> (m, h, w) float64 ITU-R 601 luma."""
    p = pixels.astype(np.float64)
    return 0.299 * p[..., 0] + 0.587 * p[..., 1] + 0.114 * p[..., 2]


def resize_area_batch(imgs: np.ndarray, out_h: int, out_w: int) -> np.ndarray:
    """Batched ``resize_area``: (m, h, w) -> (m, out_h, out_w)."""
    m, h, w = imgs.shape
    if out_h > h or out_w > w:  # upscaling: repeat-pad first (rare path)
        imgs = np.repeat(np.repeat(imgs, -(-out_h // h), axis=1),
                         -(-out_w // w), axis=2)
        m, h, w = imgs.shape
    row_idx = (np.arange(h) * out_h) // h
    col_idx = (np.arange(w) * out_w) // w
    row_bounds = np.searchsorted(row_idx, np.arange(out_h))
    col_bounds = np.searchsorted(col_idx, np.arange(out_w))
    sums = np.add.reduceat(np.add.reduceat(imgs, row_bounds, axis=1),
                           col_bounds, axis=2)
    rcnt = np.diff(np.append(row_bounds, h)).astype(np.float64)
    ccnt = np.diff(np.append(col_bounds, w)).astype(np.float64)
    cnt = rcnt[:, None] * ccnt[None, :]
    return sums / np.maximum(cnt, 1.0)


def phash64_batch(pixels: np.ndarray) -> np.ndarray:
    """Batched ``phash64``: (m, h, w, 3) uint8 -> (m,) int64."""
    m = pixels.shape[0]
    g = resize_area_batch(to_gray_batch(pixels), 32, 32)
    d = _dct_matrix(32)
    coefs = (d @ g) @ d.T  # (32,32)@(m,32,32)@(32,32): per-slice gemm
    block = coefs[:, :8, :8].reshape(m, 64)[:, 1:]  # drop DC
    med = np.median(block, axis=1)
    bits = (block > med[:, None]).astype(np.uint64)
    packed = (bits << np.arange(63, dtype=np.uint64)[None, :]) \
        .sum(axis=1, dtype=np.uint64)
    return packed.view(np.int64)


def block_features_batch(pixels: np.ndarray, grid: int = 8,
                         levels_shift: int = 4) -> np.ndarray:
    """Batched ``block_features``: (m, h, w, 3) uint8 -> (m, grid²) int64."""
    g = resize_area_batch(to_gray_batch(pixels), grid, grid)
    q = (g.astype(np.int64) >> levels_shift).clip(0, 15)
    return q.reshape(pixels.shape[0], grid * grid)


def block_features(pixels: np.ndarray, grid: int = 8, levels_shift: int = 4) -> np.ndarray:
    """Quantized block-mean features of the decoded image.

    gray → (grid x grid) block means → quantize to 16 levels (>> 4).
    Returns a (grid*grid,) int64 array of small feature codes; coarse
    quantization makes the features stable under the lossy re-encode /
    ±1px resize / low-amplitude noise perturbations of near-dups.
    """
    g = resize_area(to_gray(pixels), grid, grid)
    q = (g.astype(np.int64) >> levels_shift).clip(0, 15)
    return q.flatten()
