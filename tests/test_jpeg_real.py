"""REAL baseline JPEG codec (operators/jpeg.py) — round-trip and
adversarial validation without any media library.

Independence argument: the encoder and decoder share only the public
Annex-K constant tables and the DCT basis matrix; the entropy coder /
decoder, the marker writer / parser, and the subsampling / upsampling
paths are separate code. Round-trip agreement therefore validates both
directions of the T.81 baseline pipeline, and the DCT/IDCT inversion
property is checked directly. (No independent JPEG implementation
exists in this container — Pillow is absent, which is why the codec
exists at all.)
"""

from __future__ import annotations

import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from epl_cas_etl_2026_spark.operators.jpeg import (
    decode_jpeg,
    decode_jpeg_real,
    dct2,
    encode_jpeg_baseline,
    idct2,
    parse_jpeg_meta,
    quality_scaled,
    QUANT_LUMA,
)


def _gradient(w: int, h: int) -> np.ndarray:
    yy, xx = np.mgrid[0:h, 0:w]
    return np.stack(
        [(xx * 7) % 256, (yy * 5) % 256, ((xx + yy) * 3) % 256], axis=-1
    ).astype(float)


def _src_luma_milli(img: np.ndarray) -> float:
    l = (
        0.299 * img[..., 0] + 0.587 * img[..., 1] + 0.114 * img[..., 2]
    ).mean()
    return l / 255.0 * 1000.0


def test_dct_idct_inversion():
    rng = np.random.default_rng(7)
    for _ in range(10):
        b = rng.uniform(0, 255, (8, 8))
        assert np.allclose(idct2(dct2(b)), b, atol=1e-9)
    # orthonormality: DCT of a constant block is DC-only
    c = dct2(np.full((8, 8), 100.0))
    assert abs(c[0, 0] - 800.0) < 1e-9
    assert np.abs(c).sum() - abs(c[0, 0]) < 1e-9


def test_quality_scaling_bounds():
    q1 = quality_scaled(QUANT_LUMA, 1)
    q50 = quality_scaled(QUANT_LUMA, 50)
    q100 = quality_scaled(QUANT_LUMA, 100)
    assert (q100 == 1).all()  # lossless-ish ceiling
    assert (q50 == QUANT_LUMA).all()  # 50 == Annex-K base
    assert (q1 <= 255).all() and (q1 >= q50).all()


def test_flat_field_near_exact():
    img = np.full((24, 17, 3), 200.0)
    buf = encode_jpeg_baseline(17, 24, rgb_rows=img, quality=90)
    w, h, nc, ml = parse_jpeg_meta(buf)
    assert (w, h, nc) == (17, 24, 3)
    assert abs(ml - round(200 / 255 * 1000)) <= 1  # DC-only: ~exact


@pytest.mark.parametrize("subsample,quality", [(False, 92), (True, 85)])
def test_gradient_roundtrip(subsample, quality):
    img = _gradient(33, 40)
    buf = encode_jpeg_baseline(
        33, 40, rgb_rows=img, quality=quality, subsample_420=subsample
    )
    w, h, nc, ml = parse_jpeg_meta(buf)
    assert (w, h, nc) == (33, 40, 3)
    assert abs(ml - _src_luma_milli(img)) <= 10  # quantization tolerance


def test_grayscale_single_component():
    yy, xx = np.mgrid[0:40, 0:33]
    g = ((xx * 13 + yy * 3) % 256).astype(float)
    buf = encode_jpeg_baseline(33, 40, gray_rows=g, quality=80)
    w, h, nc, ml = parse_jpeg_meta(buf)
    assert (w, h, nc) == (33, 40, 1)
    assert abs(ml - g.mean() / 255 * 1000) <= 10


@pytest.mark.parametrize("interval", [1, 3, 7])
def test_restart_markers(interval):
    img = _gradient(33, 40)
    base = parse_jpeg_meta(encode_jpeg_baseline(33, 40, rgb_rows=img, quality=92))
    with_rst = parse_jpeg_meta(
        encode_jpeg_baseline(
            33, 40, rgb_rows=img, quality=92, restart_interval=interval
        )
    )
    assert with_rst == base  # RSTn is framing, not content


def test_pixel_level_fidelity_high_quality():
    """At q=100 the quant table is all-ones — the decoded Y plane must
    match the source luma to within DCT rounding (<1.5 levels)."""
    img = _gradient(16, 16)
    buf = encode_jpeg_baseline(16, 16, rgb_rows=img, quality=100)
    _w, _h, _nc, y = decode_jpeg(buf)
    src_y = 0.299 * img[..., 0] + 0.587 * img[..., 1] + 0.114 * img[..., 2]
    assert np.abs(y - src_y).max() < 1.5


def test_non_multiple_of_mcu_dimensions():
    """Edge-replication padding must not leak into the cropped output:
    a 9x7 image (both dims far from the 16px 4:2:0 MCU) round-trips
    with exact dimensions."""
    img = _gradient(9, 7)
    for sub in (False, True):
        buf = encode_jpeg_baseline(9, 7, rgb_rows=img, quality=90,
                                   subsample_420=sub)
        w, h, nc, ml = parse_jpeg_meta(buf)
        assert (w, h) == (9, 7)
        assert abs(ml - _src_luma_milli(img)) <= 25


def test_adversarial_rejects():
    img = np.full((8, 8, 3), 128.0)
    good = encode_jpeg_baseline(8, 8, rgb_rows=img, quality=75)
    with pytest.raises(ValueError, match="SOI"):
        decode_jpeg(b"BM" + good)
    with pytest.raises(Exception):
        decode_jpeg(good[:20])  # truncated in headers
    # progressive SOF2 rejected loudly, not mis-decoded
    bad = bytearray(good)
    sof = bad.find(b"\xff\xc0")
    bad[sof + 1] = 0xC2
    with pytest.raises(ValueError, match="baseline"):
        decode_jpeg(bytes(bad))


def test_decode_jpeg_real_quarantine(spark):
    import pandas as pd  # noqa: F401

    img = _gradient(17, 12)
    good = encode_jpeg_baseline(17, 12, rgb_rows=img, quality=88)
    rows = [
        (1, bytearray(good)),
        (2, bytearray(b"\xff\xd8garbage")),
        (3, bytearray(good[: len(good) // 2])),
    ]
    df = spark.createDataFrame(rows, "doc_id long, payload binary")
    out = {
        r["id"]: r
        for r in decode_jpeg_real(df, on_error="quarantine").collect()
    }
    assert out[1]["err"] is None
    assert (out[1]["width"], out[1]["height"]) == (17, 12)
    assert out[2]["err"] is not None and out[2]["width"] is None
    assert out[3]["err"] is not None
    with pytest.raises(Exception):
        decode_jpeg_real(df, on_error="fail").collect()
