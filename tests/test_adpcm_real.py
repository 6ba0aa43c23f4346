"""REAL IMA ADPCM codec (operators/adpcm.py) — round-trip, state
machine, container parsing, and adversarial rejection. The gate query
docs_adpcm_roundtrip_stats replays the decoder in DuckDB SQL (a
genuine third implementation); these tests cover the ENCODER and the
container paths the SQL oracle can't reach.
"""

from __future__ import annotations

import os
import struct
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from epl_cas_etl_2026_spark.operators.adpcm import (
    INDEX_TABLE,
    STEP_TABLE,
    adpcm_payload_from_nibbles,
    decode_adpcm_ima,
    decode_adpcm_real,
    decode_nibble,
    encode_adpcm_ima,
    encode_sample,
)


def _sine(n, freq=440.0, rate=16000, amp=12000):
    t = np.arange(n) / rate
    return (amp * np.sin(2 * np.pi * freq * t)).astype(np.int16)


def test_nibble_fixture_decodes_to_recurrence():
    nibs = [(3 + 7 * i) % 16 for i in range(64)]
    buf = adpcm_payload_from_nibbles(nibs, pred0=-700, idx0=12)
    d = decode_adpcm_ima(buf)
    pred, idx, want = -700, 12, [-700]
    for n in nibs:
        pred, idx = decode_nibble(n, pred, idx)
        want.append(pred)
    assert d["n_samples"] == 65
    np.testing.assert_array_equal(d["samples"][:, 0], np.array(want))


def test_state_machine_clamps():
    # drive pred to the rail: max positive nibbles from max step index
    pred, idx = 32000, 88
    for _ in range(4):
        pred, idx = decode_nibble(7, pred, idx)
    assert pred == 32767 and idx == 88
    pred, idx = 10, 0
    for _ in range(50):
        pred, idx = decode_nibble(8 | 7, pred, idx)
    assert pred == -32768
    # index clamps low
    _, idx = decode_nibble(0, 0, 0)
    assert idx == 0


def test_encoder_tracks_decoder():
    pred, idx = 0, 0
    rng = np.random.default_rng(11)
    for s in rng.integers(-32768, 32768, size=300):
        nib, pred2, idx2 = encode_sample(int(s), pred, idx)
        assert (pred2, idx2) == decode_nibble(nib, pred, idx)
        pred, idx = pred2, idx2


def test_roundtrip_sine_snr():
    x = _sine(1000)
    d = decode_adpcm_ima(encode_adpcm_ima(x))
    y = d["samples"][: len(x), 0].astype(np.float64)
    err = y - x.astype(np.float64)
    snr = 10 * np.log10((x.astype(np.float64) ** 2).sum() / (err**2).sum())
    assert d["n_samples"] == len(x)
    assert snr > 20.0  # IMA ADPCM nominal quality on a mid-band sine


def test_roundtrip_constant_is_exact_from_cold_state():
    x = np.full(200, 1234, dtype=np.int16)
    d = decode_adpcm_ima(encode_adpcm_ima(x))
    # step index starts at 0 (step 7, 7>>3 == 0): constant stays exact
    np.testing.assert_array_equal(d["samples"][:, 0], x)


def test_roundtrip_stereo():
    left = _sine(500, freq=440)
    right = _sine(500, freq=660)
    x = np.stack([left, right], axis=-1)
    d = decode_adpcm_ima(encode_adpcm_ima(x, channels=2))
    assert d["channels"] == 2 and d["n_samples"] == 500
    # the strongest interleave check: each stereo channel decodes
    # BIT-IDENTICALLY to its own mono encode (the IMA state machines
    # are fully independent per channel)
    for ch, ref in ((0, left), (1, right)):
        mono = decode_adpcm_ima(encode_adpcm_ima(ref))
        np.testing.assert_array_equal(
            d["samples"][:500, ch], mono["samples"][:500, 0]
        )


def test_multi_block_boundaries_reseed_predictor():
    # 3 blocks mono at default align: 65 samples per block
    x = _sine(65 * 3)
    buf = encode_adpcm_ima(x)
    d = decode_adpcm_ima(buf)
    # block-leading samples are LOSSLESS (carried in the header)
    for b in range(3):
        assert d["samples"][65 * b, 0] == x[65 * b]


def test_rejects_pcm_fmt_tag():
    from epl_cas_etl_2026_spark.operators.multimodal import encode_wav_pcm16

    with pytest.raises(ValueError, match="not IMA ADPCM"):
        decode_adpcm_ima(encode_wav_pcm16([0, 1, 2]))


def test_rejects_partial_block_and_bad_align():
    buf = bytearray(encode_adpcm_ima(_sine(65)))
    # truncation without fixing the RIFF size → container-level reject
    with pytest.raises(ValueError, match="RIFF size exceeds payload"):
        decode_adpcm_ima(bytes(buf)[:-8])
    # truncation WITH a consistent RIFF size → chunk-level reject
    short = bytearray(buf)[:-8]
    struct.pack_into("<I", short, 4, len(short) - 8)
    with pytest.raises(ValueError, match="truncated"):
        decode_adpcm_ima(bytes(short))
    # a self-consistent data chunk that is not a whole block count
    # (data is the final chunk: grow its clen + the RIFF size and
    # append 8 junk bytes)
    odd = bytearray(buf)
    at_data = bytes(buf).index(b"data") + 4
    (dlen,) = struct.unpack_from("<I", odd, at_data)
    struct.pack_into("<I", odd, at_data, dlen + 8)
    odd += b"\x00" * 8
    struct.pack_into("<I", odd, 4, len(odd) - 8)
    with pytest.raises(ValueError, match="whole number of blocks"):
        decode_adpcm_ima(bytes(odd))
    # corrupt block align to an illegal value (3 < 4*channels+1)
    at = bytes(buf).index(b"fmt ") + 8 + 12
    struct.pack_into("<H", buf, at, 3)
    with pytest.raises(ValueError, match="illegal block align"):
        decode_adpcm_ima(bytes(buf))


def test_rejects_trailing_bytes_beyond_riff():
    # the ADVICE r8 case: bytes after the RIFF container (size field
    # untouched) must be rejected, not silently tolerated
    buf = encode_adpcm_ima(_sine(65))
    with pytest.raises(ValueError, match="trailing bytes"):
        decode_adpcm_ima(buf + b"\x00" * 7)


def test_rejects_step_index_out_of_range():
    nibs = [0] * 8
    buf = bytearray(adpcm_payload_from_nibbles(nibs))
    at = bytes(buf).index(b"data") + 8 + 2  # header: pred(2) idx(1)
    buf[at] = 120
    with pytest.raises(ValueError, match="out of range"):
        decode_adpcm_ima(bytes(buf))


def test_public_tables_shape():
    assert len(STEP_TABLE) == 89 and len(INDEX_TABLE) == 16
    assert STEP_TABLE[0] == 7 and STEP_TABLE[-1] == 32767
    assert all(a < b for a, b in zip(STEP_TABLE, STEP_TABLE[1:]))


def test_decode_adpcm_real_quarantine(spark):
    good = adpcm_payload_from_nibbles([1] * 16, pred0=100, idx0=5)
    rows = [(1, bytearray(good)), (2, bytearray(b"RIFFxxxxWAVE"))]
    df = spark.createDataFrame(rows, "doc_id long, payload binary")
    out = decode_adpcm_real(df, on_error="quarantine").orderBy("id").collect()
    assert out[0]["err"] is None and out[0]["n_samples"] == 17
    pred, idx, s = 100, 5, [100]
    for n in [1] * 16:
        pred, idx = decode_nibble(n, pred, idx)
        s.append(pred)
    assert out[0]["sum_pred"] == sum(s)
    assert out[0]["energy"] == sum(v * v for v in s)
    assert out[1]["err"] is not None
    with pytest.raises(Exception):
        decode_adpcm_real(df, on_error="fail").collect()
