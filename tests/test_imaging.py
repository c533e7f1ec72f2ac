"""Codec/phash/PSNR invariants (BASELINE.json:15 payload gates)."""

import numpy as np
import pytest

from monocator_spark import spec
from monocator_spark.functions.imaging import (
    decode, encode, phash64, pixels_for, psnr_db,
)


def test_png_lossless_roundtrip():
    px = pixels_for("img0000000001", 64, 32)
    got, fmt = decode(encode(px, "png"))
    assert fmt == "png"
    assert np.array_equal(got, px)


def test_jpeg_lossy_but_above_gate():
    px = pixels_for("img0000000002", 128, 64)
    got, fmt = decode(encode(px, "jpeg"))
    assert fmt == "jpeg"
    assert not np.array_equal(got, px)  # genuinely lossy
    p = psnr_db(px, got)
    assert spec.PSNR_MIN_DB <= p < float("inf")


def test_pixels_deterministic():
    a = pixels_for("imgX", 32, 32)
    b = pixels_for("imgX", 32, 32)
    c = pixels_for("imgY", 32, 32)
    assert np.array_equal(a, b)
    assert not np.array_equal(a, c)


def test_phash_stable_and_sensitive():
    px = pixels_for("img0000000003", 64, 64)
    h1 = phash64(px)
    assert h1 == phash64(px.copy())
    other = pixels_for("img0000000004", 64, 64)
    assert h1 != phash64(other)
    assert -(1 << 63) <= h1 < (1 << 63)


def test_corpus_phash_recomputable_from_decode():
    """The stored phash is the phash of the *decoded* pixels, so a clean
    row always validates (quantization may flip raw-pixel phash bits)."""
    from monocator_spark.datagen.corpus import corpus_row

    for i in range(30):
        row = corpus_row(i)
        dec, _ = decode(row["bytes"])
        assert phash64(dec) == row["phash"], i


@pytest.mark.parametrize("junk", [b"", b"xyz", b"MPNG\x01\x00\x01\x00" + b"toolong" * 5])
def test_corrupt_decode_raises(junk):
    with pytest.raises(ValueError):
        decode(junk)


def test_resize_nearest_pixel_content():
    """The SQL oracle for image_resize_thumb pins geometry + encoded size;
    this pins the half it can't: the thumbnail's actual pixel values under
    the nearest-neighbor spec (src = dst * src_dim // dst_dim)."""
    px = pixels_for("42", 63, 30)  # doc_id 42 under the op's dim rule
    m = max(px.shape)
    nh = max(1, px.shape[0] * 16 // m)
    nw = max(1, px.shape[1] * 16 // m)
    yi = (np.arange(nh) * px.shape[0]) // nh
    xi = (np.arange(nw) * px.shape[1]) // nw
    thumb = px[yi][:, xi]
    assert thumb.shape == (nh, nw)
    # every thumb pixel is an exact source pixel at the spec'd index
    for r in range(nh):
        for c in range(nw):
            assert thumb[r, c] == px[(r * px.shape[0]) // nh, (c * px.shape[1]) // nw]
    # lossless round trip of the thumbnail through the codec
    got, fmt = decode(encode(thumb, "png"))
    assert fmt == "png" and np.array_equal(got, thumb)


def test_audio_window_energy_math():
    """Pure-Python twin of the audio_window_energy UDF's per-doc math: a
    known byte string, stereo (channels=2), window 64 frames — checks
    frame truncation, per-window sums, first-argmax peak index."""
    from monocator_spark.queries.imaging import _AWIN

    payload = bytes(range(200)) + bytes([255] * 57)  # 257 bytes, odd tail
    ch = 2
    n_samples = len(payload) // ch  # 128; final byte dropped
    used = list(payload[: n_samples * ch])
    n_windows = -(-n_samples // _AWIN)  # 2
    wsz = _AWIN * ch
    wsums = [sum(used[i : i + wsz]) for i in range(0, len(used), wsz)]
    assert n_windows == 2 and len(wsums) == 2
    # window 0 = bytes 0..127 of an ascending ramp; window 1 has the 255s
    assert wsums[0] == sum(range(128))
    assert wsums[1] == sum(range(128, 200)) + 255 * 56
    peak_w = wsums.index(max(wsums))
    assert peak_w == 1 and sum(wsums) == sum(used)

    import numpy as np

    a = np.frombuffer(payload, dtype=np.uint8)[: n_samples * ch].astype(np.int64)
    starts = np.arange(0, n_samples * ch, wsz)
    np_sums = np.add.reduceat(a, starts)
    assert np_sums.tolist() == wsums
    assert int(np.argmax(np_sums)) == peak_w


def test_image_quality_gate_codec_loss_and_verdicts(spark):
    """The gate's stats must reflect the REAL codec round trip: the same
    bytes scored via the jpeg path lose variance/gradient to the 4-level
    quantization, and every verdict branch is reachable on testdata."""
    import numpy as np

    from monocator_spark.functions import imaging as img
    from monocator_spark.queries.imaging import (
        _GATE_FLAT_GRAD,
        _GATE_LOW_VAR,
        _GATE_MIN_PX,
        q_image_quality_gate,
    )

    # pure-Python twin of one doc's math, both codec paths
    raw = np.frombuffer(b"The quick brown fox jumps over the lazy dog!" * 3,
                        dtype=np.uint8)
    w = 11
    h = len(raw) // w
    n = w * h
    for fmt in ("png", "jpeg"):
        px, got_fmt = img.decode(img.encode(raw[:n].reshape(h, w), fmt))
        v = px.astype(np.int64)
        if fmt == "jpeg":
            assert np.array_equal(
                v, ((raw[:n].astype(np.int64) // 4) * 4 + 2).reshape(h, w)
            )
        else:
            assert np.array_equal(v, raw[:n].reshape(h, w))
        assert got_fmt == fmt
    # quantization can only shrink the horizontal gradient sum
    png_g = int(np.abs(np.diff(raw[:n].reshape(h, w).astype(np.int64), axis=1)).sum())
    jq = ((raw[:n].astype(np.int64) // 4) * 4 + 2).reshape(h, w)
    assert int(np.abs(np.diff(jq, axis=1)).sum()) <= png_g

    rows = q_image_quality_gate(spark, "/root/testdata/sf0.001").collect()
    assert rows
    by_verdict = {}
    for r in rows:
        by_verdict.setdefault(r["verdict"], 0)
        by_verdict[r["verdict"]] += 1
        # verdict is a pure function of the emitted stats
        if r["n_px"] < _GATE_MIN_PX:
            assert r["verdict"] == "undersized"
        elif r["grad_milli"] < _GATE_FLAT_GRAD:
            assert r["verdict"] == "flat"
        elif r["var_milli"] < _GATE_LOW_VAR:
            assert r["verdict"] == "low_contrast"
        else:
            assert r["verdict"] == "ok"
        assert r["fmt"] == ("png" if r["doc_id"] % 2 == 0 else "jpeg")
        assert r["n_px"] == r["w"] * r["h"]
    assert "ok" in by_verdict and len(by_verdict) >= 2
