"""Deterministic image codec + perceptual hash + PSNR (SURVEY.md §2 O11).

Reference analogue: content validation/extraction — the VAT scraper's
format + checksum checks (`/root/reference/src/mock-servers.MD:16-20`).
Our payload invariant (BASELINE.json:15): decoded-pixel allclose
(PSNR ≥ 40 dB for lossy formats, bit-exact for lossless) + caption equality.

PIL is not available in this container, so the codec is a clearly-specified
deterministic stand-in (brief: stub the decode step, keep the Spark-side
plumbing — schema, partitioning, UDF signature, Arrow batch shape — real):

  * ``png``  — header ``MPNG`` + w:u16le + h:u16le + raw grayscale uint8
               pixels. Lossless: decode is bit-exact.
  * ``jpeg`` — header ``MJPG`` + w + h + pixels quantized to 4 levels/step
               (stored as value//4; decode = q*4+2). Max abs error 2 →
               MSE ≤ 1.5 → PSNR ≈ 46 dB, comfortably ≥ the 40 dB gate while
               still *lossy* (exercises the tolerance path).

Pristine pixels are derived deterministically from ``image_id`` (seeded
numpy PCG), so any worker can regenerate the reference decode without
shipping a second copy of the corpus — this is what makes the per-row
invariant checkable at 100 TB without a second 100 TB table.

If PIL becomes available, only ``encode``/``decode`` change; every caller
(validation UDF, datagen, tests) is codec-agnostic.
"""

from __future__ import annotations

import struct

import numpy as np

from monocator_spark.functions.hashing import xxh64_str

FORMATS = ("png", "jpeg")
_MAGIC = {"png": b"MPNG", "jpeg": b"MJPG"}
_MAGIC_REV = {v: k for k, v in _MAGIC.items()}


def pixels_for(image_id: str, w: int, h: int) -> np.ndarray:
    """Pristine grayscale pixels, deterministic in image_id (uint8, h×w)."""
    seed = xxh64_str("px|" + image_id) & 0xFFFFFFFFFFFFFFFF
    rng = np.random.Generator(np.random.PCG64(seed))
    return rng.integers(0, 256, size=(h, w), dtype=np.uint8)


def encode(pixels: np.ndarray, fmt: str) -> bytes:
    h, w = pixels.shape
    hdr = _MAGIC[fmt] + struct.pack("<HH", w, h)
    if fmt == "png":
        return hdr + pixels.tobytes()
    return hdr + (pixels // 4).astype(np.uint8).tobytes()


def decode(data: bytes) -> tuple[np.ndarray, str]:
    """→ (pixels uint8 h×w, fmt). Raises ValueError on corrupt payload."""
    if len(data) < 8:
        raise ValueError("truncated header")
    fmt = _MAGIC_REV.get(bytes(data[:4]))
    if fmt is None:
        raise ValueError("bad magic")
    w, h = struct.unpack("<HH", data[4:8])
    body = np.frombuffer(data, dtype=np.uint8, offset=8)
    if body.size != w * h:
        raise ValueError("payload size mismatch")
    px = body.reshape(h, w)
    if fmt == "jpeg":
        px = (px.astype(np.uint16) * 4 + 2).clip(0, 255).astype(np.uint8)
    return px, fmt


def phash64(pixels: np.ndarray) -> int:
    """64-bit average perceptual hash: 8×8 block means vs global mean.

    Signed int64 so it round-trips through Spark LongType / parquet int64.
    """
    h, w = pixels.shape
    bh, bw = h // 8, w // 8
    blocks = (
        pixels[: bh * 8, : bw * 8]
        .reshape(8, bh, 8, bw)
        .mean(axis=(1, 3))
    )
    bits = (blocks > blocks.mean()).flatten()
    val = 0
    for b in bits:
        val = (val << 1) | int(b)
    return val - (1 << 64) if val >= (1 << 63) else val


def psnr_db(ref: np.ndarray, got: np.ndarray) -> float:
    """Peak signal-to-noise ratio in dB; inf for identical images."""
    if ref.shape != got.shape:
        return 0.0
    mse = float(np.mean((ref.astype(np.float64) - got.astype(np.float64)) ** 2))
    if mse == 0.0:
        return float("inf")
    return 10.0 * np.log10(255.0 * 255.0 / mse)
