"""Deterministic pure-numpy audio / video codecs + feature kernels.

Completes the multimodal column family next to image_codec: audio and
video travel as opaque ``binary`` columns with typed metadata, exactly
like the image path. The container has no libav/soundfile, so each
modality gets a small deterministic container ("SAUD" / "SVID") whose
decode is REAL (zlib + quantization with measurable reconstruction
error), not a mock — swapping in a production codec on a cluster is a
2-function change per modality; every downstream kernel consumes plain
numpy arrays.

Formats:
- SAUD: int16 mono PCM. "wav" is lossless; "ogg" (lossy stand-in)
  quantizes to 12 bits (SNR ≈ 62 dB — comfortably above any perceptual
  floor, but with a real, measurable error).
- SVID: a stack of SIMG frames (n_frames, then each frame length-
  prefixed) with fps metadata — so every image kernel (phash, block
  features, resize) applies per frame unchanged.

Feature kernels (all vectorized numpy, called from Arrow-batched UDFs):
- ``audio_features``: per-window RMS energy + zero-crossing rate, the
  audio analog of block_features.
- ``audio_fingerprint64``: 64-bit sign-of-energy-delta fingerprint over
  64 equal windows — the audio analog of phash64 (Haitsma-Kalker style
  energy-difference sign bits, computed on one channel × one band).
- ``sample_frames``: deterministic every-k-th frame selection (video
  frame-sample operator); per-frame hashing then rides image_codec.
"""

from __future__ import annotations

import zlib

import numpy as np

from distributed_gpu_lsh_using_sycl_spark.functions.image_codec import (
    decode_image, encode_image)

AUD_MAGIC = b"SAUD"
AUD_FMT_CODES = {"wav": 0, "ogg": 1}
AUD_FMT_NAMES = {v: k for k, v in AUD_FMT_CODES.items()}
#: lossy audio: 12-bit quantization of int16 → error uniform in ±8,
#: SNR = 10*log10((32768^2/3) / (8^2/3)) ≈ 72 dB worst-case signal.
_AQ_SHIFT = 4

VID_MAGIC = b"SVID"


def encode_audio(samples: np.ndarray, sample_rate: int, fmt: str) -> bytes:
    """Encode 1-D int16 PCM into SAUD bytes."""
    if samples.dtype != np.int16 or samples.ndim != 1:
        raise ValueError("expected 1-D int16 samples")
    header = (AUD_MAGIC + bytes([AUD_FMT_CODES[fmt]])
              + int(sample_rate).to_bytes(4, "little")
              + len(samples).to_bytes(4, "little"))
    payload = samples if fmt == "wav" else (samples >> _AQ_SHIFT).astype(np.int16)
    return header + zlib.compress(payload.tobytes(), 6)


def decode_audio(blob: bytes) -> tuple[np.ndarray, int, str]:
    """Decode SAUD bytes → (1-D int16 samples, sample_rate, fmt)."""
    if blob[:4] != AUD_MAGIC:
        raise ValueError("not a SAUD blob")
    fmt = AUD_FMT_NAMES[blob[4]]
    rate = int.from_bytes(blob[5:9], "little")
    n = int.from_bytes(blob[9:13], "little")
    raw = np.frombuffer(zlib.decompress(blob[13:]), dtype=np.int16)[:n]
    if fmt == "ogg":
        raw = (raw.astype(np.int32) << _AQ_SHIFT).clip(-32768, 32767).astype(np.int16)
    return raw, rate, fmt


def decode_audio_grouped(blobs) -> list[tuple[np.ndarray, np.ndarray]]:
    """Batch decode of SAUD blobs: per-blob Python work is only the
    13-byte header parse and one zlib C call; dequantize + reshape run
    once per (fmt, n_samples) group over the concatenated buffer.
    Returns ``[(indices int64 array, (m, n) int16 samples), ...]``."""
    groups: dict[tuple, tuple[list, list]] = {}
    for i, blob in enumerate(blobs):
        if blob[:4] != AUD_MAGIC:
            raise ValueError("not a SAUD blob")
        key = (blob[4], int.from_bytes(blob[9:13], "little"))
        idxs, raws = groups.setdefault(key, ([], []))
        idxs.append(i)
        raws.append(zlib.decompress(blob[13:]))
    out = []
    for (fc, n), (idxs, raws) in groups.items():
        arr = np.frombuffer(b"".join(raws), dtype=np.int16) \
            .reshape(len(idxs), -1)[:, :n]
        if AUD_FMT_NAMES[fc] == "ogg":
            arr = (arr.astype(np.int32) << _AQ_SHIFT) \
                .clip(-32768, 32767).astype(np.int16)
        out.append((np.asarray(idxs, dtype=np.int64), arr))
    return out


def audio_snr(clean: np.ndarray, decoded: np.ndarray) -> float:
    """SNR in dB of a decoded signal vs the original (per-row invariant
    for lossy audio, the analog of image PSNR ≥ 40 dB)."""
    clean = clean.astype(np.float64)
    err = decoded.astype(np.float64) - clean
    p_sig = float((clean ** 2).mean())
    p_err = float((err ** 2).mean())
    if p_err == 0:
        return float("inf")
    return 10.0 * np.log10(p_sig / max(p_err, 1e-30))


def audio_features(samples: np.ndarray, n_windows: int = 16) -> np.ndarray:
    """(n_windows, 2) float64: per-window RMS energy (normalized) and
    zero-crossing rate. Truncates the tail partial window (deterministic)."""
    n = len(samples) // n_windows
    if n == 0:
        return np.zeros((n_windows, 2), dtype=np.float64)
    x = samples[: n * n_windows].astype(np.float64).reshape(n_windows, n)
    rms = np.sqrt((x ** 2).mean(axis=1)) / 32768.0
    zcr = (np.signbit(x[:, 1:]) != np.signbit(x[:, :-1])).mean(axis=1)
    return np.stack([rms, zcr], axis=1)


def audio_fingerprint64(samples: np.ndarray) -> int:
    """64-bit audio fingerprint: sign of successive window-energy deltas
    over 65 windows (bit b = 1 iff E[b+1] > E[b]) — band-collapsed
    Haitsma-Kalker. Hamming-comparable like phash64."""
    n = len(samples) // 65
    if n == 0:
        return 0
    x = samples[: n * 65].astype(np.float64).reshape(65, n)
    e = (x ** 2).mean(axis=1)
    bits = (e[1:] > e[:-1]).astype(np.uint64)
    return int((bits << np.arange(64, dtype=np.uint64)).sum(dtype=np.uint64))


def audio_features_batch(samples: np.ndarray, n_windows: int = 16) -> np.ndarray:
    """Batched ``audio_features``: (m, n) int16 -> (m, n_windows, 2)
    float64 — bit-identical to the scalar kernel (same truncation, same
    contiguous-axis means)."""
    m, total = samples.shape
    n = total // n_windows
    if n == 0:
        return np.zeros((m, n_windows, 2), dtype=np.float64)
    x = samples[:, : n * n_windows].astype(np.float64).reshape(m, n_windows, n)
    rms = np.sqrt((x ** 2).mean(axis=2)) / 32768.0
    zcr = (np.signbit(x[:, :, 1:]) != np.signbit(x[:, :, :-1])).mean(axis=2)
    return np.stack([rms, zcr], axis=2)


def audio_fingerprint64_batch(samples: np.ndarray) -> np.ndarray:
    """Batched ``audio_fingerprint64``: (m, n) int16 -> (m,) uint64."""
    m, total = samples.shape
    n = total // 65
    if n == 0:
        return np.zeros(m, dtype=np.uint64)
    x = samples[:, : n * 65].astype(np.float64).reshape(m, 65, n)
    e = (x ** 2).mean(axis=2)
    bits = (e[:, 1:] > e[:, :-1]).astype(np.uint64)
    return (bits << np.arange(64, dtype=np.uint64)[None, :]) \
        .sum(axis=1, dtype=np.uint64)


# --------------------------------------------------------------------------- #
# video = length-prefixed SIMG frame stack
# --------------------------------------------------------------------------- #

def encode_video(frames: list[np.ndarray], fps: int, fmt: str = "jpeg") -> bytes:
    """Encode a list of (h, w, 3) uint8 frames into SVID bytes; each frame
    is an independent SIMG blob (so frame decode is random-access)."""
    parts = [VID_MAGIC, int(fps).to_bytes(2, "little"),
             len(frames).to_bytes(4, "little")]
    for fr in frames:
        blob = encode_image(fr, fmt)
        parts.append(len(blob).to_bytes(4, "little"))
        parts.append(blob)
    return b"".join(parts)


def decode_video_meta(blob: bytes) -> tuple[int, int]:
    """(fps, n_frames) without touching frame payloads."""
    if blob[:4] != VID_MAGIC:
        raise ValueError("not a SVID blob")
    return int.from_bytes(blob[4:6], "little"), int.from_bytes(blob[6:10], "little")


def iter_frames(blob: bytes):
    """Yield decoded (h, w, 3) uint8 frames (lazy random-access walk)."""
    _, n = decode_video_meta(blob)
    off = 10
    for _ in range(n):
        ln = int.from_bytes(blob[off:off + 4], "little")
        off += 4
        yield decode_image(blob[off:off + ln])[0]
        off += ln


def sample_frames(blob: bytes, every_k: int) -> list[np.ndarray]:
    """Deterministic every-k-th frame selection (frame-sample operator);
    always includes frame 0."""
    return [fr for i, fr in enumerate(iter_frames(blob)) if i % every_k == 0]


def sampled_frame_blobs(blob: bytes, every_k: int) -> list[tuple[int, bytes]]:
    """[(frame_idx, SIMG bytes)] for every k-th frame — pure payload
    slicing (no decode), so frame decoding can be batched across videos
    via ``image_codec.decode_images_grouped``."""
    _, n = decode_video_meta(blob)
    off = 10
    out = []
    for i in range(n):
        ln = int.from_bytes(blob[off:off + 4], "little")
        off += 4
        if i % every_k == 0:
            out.append((i, blob[off:off + ln]))
        off += ln
    return out
