"""REAL GIF codec (operators/gif.py) — LZW round-trips (variable
code widths, CLEAR resets, KwKwK), interlace, container framing, and
adversarial rejection. GIF is lossless on indexed pixels, so every
round-trip is bit-exact.
"""

from __future__ import annotations

import os
import random
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from epl_cas_etl_2026_spark.operators.gif import (
    decode_gif,
    decode_gif_real,
    encode_gif,
    lzw_decode,
    lzw_encode,
)


def _pal(n, seed=1):
    rng = random.Random(seed)
    return [
        (rng.randrange(256), rng.randrange(256), rng.randrange(256))
        for _ in range(n)
    ]


def _idx(w, h, n, seed=2):
    rng = np.random.default_rng(seed)
    return rng.integers(0, n, size=(h, w), dtype=np.uint8)


# ---------------------------------------------------------------------------
# LZW core.
# ---------------------------------------------------------------------------
def test_lzw_kwkwk_case():
    # 'ababab...' forces the code-equals-table-size case early
    xs = [0, 1] * 50 + [0, 0, 0, 0]
    assert lzw_decode(lzw_encode(xs, 2), 2, len(xs)) == xs


def test_lzw_table_overflow_clear_reset():
    # incompressible noise still round-trips through the 4096-entry
    # CLEAR reset path (it just expands, as LZW must on noise)
    rng = random.Random(3)
    xs = [rng.randrange(256) for _ in range(50000)]
    assert lzw_decode(lzw_encode(xs, 8), 8, len(xs)) == xs
    # structured data both overflows the table AND compresses
    ys = []
    i = 0
    while len(ys) < 60000:
        ys.extend([i % 256] * (i % 23 + 2))
        i += 1
    enc = lzw_encode(ys, 8)
    assert lzw_decode(enc, 8, len(ys)) == ys
    assert len(enc) < len(ys) // 2


def test_lzw_rejects_truncation_and_overrun():
    xs = [1, 2, 3] * 100
    enc = lzw_encode(xs, 2)
    with pytest.raises(ValueError):
        lzw_decode(enc[: len(enc) // 2], 2, len(xs))
    with pytest.raises(ValueError, match="expected|more pixels"):
        lzw_decode(enc, 2, len(xs) - 5)


# ---------------------------------------------------------------------------
# Full container round-trips.
# ---------------------------------------------------------------------------
@pytest.mark.parametrize("interlace", [False, True])
@pytest.mark.parametrize("n_colors", [2, 4, 7, 16, 200, 256])
def test_roundtrip_matrix(n_colors, interlace):
    w, h = 13, 9
    pal = _pal(n_colors, seed=n_colors)
    idx = _idx(w, h, n_colors, seed=n_colors + 7)
    buf = encode_gif(
        w, h, indices=idx, palette=pal, interlace=interlace,
        comment="fixture",
    )
    out = decode_gif(buf)
    assert (out["width"], out["height"]) == (w, h)
    assert out["interlaced"] == interlace
    want = np.array(pal, dtype=np.uint8)[idx]
    np.testing.assert_array_equal(out["pixels"], want)


def test_single_row_and_column():
    for w, h in [(1, 1), (9, 1), (1, 9)]:
        pal = _pal(5)
        idx = _idx(w, h, 5)
        for inter in (False, True):
            out = decode_gif(
                encode_gif(w, h, indices=idx, palette=pal, interlace=inter)
            )
            np.testing.assert_array_equal(
                out["pixels"], np.array(pal, dtype=np.uint8)[idx]
            )


def test_extension_blocks_are_traversed():
    pal = _pal(4)
    idx = _idx(6, 6, 4)
    buf = encode_gif(6, 6, indices=idx, palette=pal, comment="x" * 600)
    assert b"\x21\xfe" in buf  # multi-sub-block comment present
    np.testing.assert_array_equal(
        decode_gif(buf)["pixels"], np.array(pal, dtype=np.uint8)[idx]
    )


# ---------------------------------------------------------------------------
# Adversarial rejection.
# ---------------------------------------------------------------------------
def _valid():
    return encode_gif(8, 8, indices=_idx(8, 8, 8), palette=_pal(8))


def test_rejects_bad_signature():
    with pytest.raises(ValueError, match="not a GIF"):
        decode_gif(b"JIF89a" + _valid()[6:])


def test_rejects_truncations():
    buf = _valid()
    for cut in (4, 10, len(buf) // 2, len(buf) - 3):
        with pytest.raises(ValueError):
            decode_gif(buf[:cut])


def test_rejects_missing_trailer_after_frame():
    # the ADVICE r8 case: a GIF truncated right after the image data
    # (trailer byte dropped) must be rejected, not decoded silently
    buf = _valid()
    assert buf[-1] == 0x3B
    with pytest.raises(ValueError, match="missing trailer"):
        decode_gif(buf[:-1])


def test_post_frame_blocks_walked_to_trailer():
    # trailing comment extension between the frame and the trailer is
    # traversed; truncating inside it is rejected
    buf = _valid()
    ext = b"\x21\xfe\x05hello\x00"
    ok = buf[:-1] + ext + b"\x3b"
    assert decode_gif(ok)["pixels"].shape == decode_gif(buf)["pixels"].shape
    with pytest.raises(ValueError):
        decode_gif(buf[:-1] + ext[:-1])


def test_rejects_no_image():
    # header + trailer only
    buf = _valid()
    with pytest.raises(ValueError, match="no image data"):
        decode_gif(buf[:13] + buf[13 : 13 + 8 * 3] + b"\x3b")


def test_rejects_descriptor_out_of_screen():
    buf = bytearray(_valid())
    at = bytes(buf).index(b"\x2c")
    import struct

    struct.pack_into("<H", buf, at + 1, 5)  # left=5 with w=8 > screen 8
    with pytest.raises(ValueError, match="illegal GIF image descriptor"):
        decode_gif(bytes(buf))


def test_decode_gif_real_quarantine(spark):
    pal = _pal(4)
    idx = _idx(5, 4, 4)
    good = encode_gif(5, 4, indices=idx, palette=pal)
    rows = [(1, bytearray(good)), (2, bytearray(b"GIF89a garbage"))]
    df = spark.createDataFrame(rows, "doc_id long, payload binary")
    out = decode_gif_real(df, on_error="quarantine").orderBy("id").collect()
    px = np.array(pal, dtype=np.uint8)[idx].astype(np.int64)
    luma = 299 * px[..., 0] + 587 * px[..., 1] + 114 * px[..., 2]
    assert out[0]["err"] is None
    assert out[0]["luma_sum"] == int(luma.sum()) and out[0]["n_px"] == 20
    assert out[1]["err"] is not None
    with pytest.raises(Exception):
        decode_gif_real(df, on_error="fail").collect()
