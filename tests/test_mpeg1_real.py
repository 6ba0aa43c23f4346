"""MPEG-1 Audio Layer I decode (operators/mpeg1.py): bit-exact
encode→decode round trips, requantization arithmetic vs an
independent float evaluation, malformed-stream rejection, and the
Spark mapInPandas wrapper incl. quarantine mode."""

from __future__ import annotations

import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from epl_cas_etl_2026_spark.operators.mpeg1 import (
    _BitReader,
    _BitWriter,
    decode_mpeg1_l1,
    decode_mpeg1_subbands_real,
    encode_mpeg1_l1,
    l1_frame_slots,
    subband_samples,
    synthesize_pcm,
)


def _frame(seed: int) -> dict:
    alloc = [0 if (seed + sb) % 4 == 0 else 2 + ((seed + sb) % 14) for sb in range(32)]
    sfidx = [(seed + 5 * sb) % 63 for sb in range(32)]
    codes = [
        [(seed * 31 + sb * 12 + j) % (1 << alloc[sb]) if alloc[sb] else 0 for j in range(12)]
        for sb in range(32)
    ]
    return {"alloc": alloc, "sfidx": sfidx, "codes": codes}


def test_bit_reader_writer_roundtrip():
    w = _BitWriter()
    fields = [(0xFFF, 12), (1, 1), (5, 3), (0, 1), (1023, 10), (7, 15)]
    for v, n in fields:
        w.write(v, n)
    r = _BitReader(w.tobytes())
    assert [(r.read(n)) for _, n in fields] == [v for v, _ in fields]
    with pytest.raises(ValueError, match="does not fit"):
        _BitWriter().write(8, 3)


def test_frame_slots_exact():
    # 448 kbit/s at 32 kHz: 12*448000/32000 = 168 slots, no remainder
    assert l1_frame_slots(14, 2) == 168


def test_encode_decode_roundtrip_bit_exact():
    frames = [_frame(3), _frame(17), _frame(40)]
    buf = encode_mpeg1_l1(frames)
    assert len(buf) == 3 * 168 * 4
    d = decode_mpeg1_l1(buf)
    assert d["n_frames"] == 3
    assert d["sampling_rate"] == 32000 and d["bitrate_kbps"] == 448
    for fr_in, fr_out in zip(frames, d["frames"]):
        assert fr_out["alloc"] == fr_in["alloc"]
        assert fr_out["codes"] == fr_in["codes"]
        for sb in range(32):
            if fr_in["alloc"][sb]:
                assert fr_out["sfidx"][sb] == fr_in["sfidx"][sb]
            nb = fr_in["alloc"][sb]
            for j in range(12):
                expect = (
                    fr_in["codes"][sb][j] - (1 << (nb - 1)) + 1 if nb else 0
                )
                assert fr_out["shift_num"][sb][j] == expect


def test_requantization_matches_float_reference():
    d = decode_mpeg1_l1(encode_mpeg1_l1([_frame(9)]))
    s = subband_samples(d)
    fr = d["frames"][0]
    for sb in range(32):
        nb = fr["alloc"][sb]
        if not nb:
            assert np.all(s[0, sb] == 0.0)
            continue
        sf = 2.0 * 2.0 ** (-fr["sfidx"][sb] / 3.0)
        for j in range(12):
            code = fr["codes"][sb][j]
            # ISO 11172-3 2.4.3.3 evaluated the spec's way
            s3 = code / (1 << (nb - 1)) - 1.0
            s2 = ((1 << nb) / ((1 << nb) - 1)) * (s3 + 2.0 ** (1 - nb))
            assert s[0, sb, j] == pytest.approx(sf * s2, rel=1e-12)
            # and the exact-rational reduction the gate uses
            assert s[0, sb, j] == pytest.approx(
                sf * 2.0 * fr["shift_num"][sb][j] / ((1 << nb) - 1), rel=1e-12
            )


def test_rejections():
    good = encode_mpeg1_l1([_frame(1)])
    with pytest.raises(ValueError, match="bad syncword"):
        decode_mpeg1_l1(b"\x00" + good[1:])
    with pytest.raises(ValueError, match="truncated MPEG frame body"):
        decode_mpeg1_l1(good[:-8])
    with pytest.raises(ValueError, match="truncated MPEG frame header"):
        decode_mpeg1_l1(good + b"\xff\xfd")
    # layer II header bits ('10' in the layer field)
    bad_layer = bytearray(good)
    bad_layer[1] = (bad_layer[1] & ~0x06) | 0x04
    with pytest.raises(ValueError, match="not Layer I"):
        decode_mpeg1_l1(bytes(bad_layer))
    # stereo mode
    stereo = bytearray(good)
    stereo[3] = stereo[3] & ~0xC0
    with pytest.raises(ValueError, match="single_channel"):
        decode_mpeg1_l1(bytes(stereo))
    # forbidden bitrate index 15
    bad_br = bytearray(good)
    bad_br[2] = bad_br[2] | 0xF0
    with pytest.raises(ValueError, match="bitrate index"):
        decode_mpeg1_l1(bytes(bad_br))
    # reserved sampling frequency
    bad_fs = bytearray(good)
    bad_fs[2] = bad_fs[2] | 0x0C
    with pytest.raises(ValueError, match="reserved sampling"):
        decode_mpeg1_l1(bytes(bad_fs))
    # forbidden allocation 15: header is 4 bytes, bitalloc starts at
    # bit 32; force the first 4 allocation bits to 1111
    bad_alloc = bytearray(good)
    bad_alloc[4] = bad_alloc[4] | 0xF0
    with pytest.raises(ValueError, match="forbidden bit allocation"):
        decode_mpeg1_l1(bytes(bad_alloc))
    with pytest.raises(ValueError, match="no MPEG frames"):
        decode_mpeg1_l1(b"")


def test_rejects_forbidden_scalefactor():
    fr = _frame(2)
    fr["sfidx"] = [62] * 32
    buf = bytearray(encode_mpeg1_l1([fr]))
    # scalefactors start right after 4B header + 16B allocation; the
    # first allocated subband's 6 sf bits are the top of byte 20
    assert fr["alloc"][0] != 0
    buf[20] = buf[20] | 0xFC  # 111111 -> index 63
    with pytest.raises(ValueError, match="scalefactor index 63"):
        decode_mpeg1_l1(bytes(buf))


def test_synthesis_is_loudly_stubbed():
    d = decode_mpeg1_l1(encode_mpeg1_l1([_frame(1)]))
    with pytest.raises(ValueError, match="3-B.3"):
        synthesize_pcm(d)


def test_spark_wrapper_and_quarantine(spark):
    rows = [(1, encode_mpeg1_l1([_frame(1)])), (2, b"garbage-not-mpeg")]
    df = spark.createDataFrame(rows, "doc_id long, payload binary")
    out = decode_mpeg1_subbands_real(df, on_error="quarantine").collect()
    good = [r for r in out if r["err"] is None]
    bad = [r for r in out if r["err"] is not None]
    assert len(bad) == 1 and bad[0]["id"] == 2
    assert len(good) == sum(1 for sb in range(32) if _frame(1)["alloc"][sb])
    one = next(r for r in good if r["sb"] == 1)
    fr = _frame(1)
    assert one["nb"] == fr["alloc"][1]
    assert one["sum_shift"] == sum(
        c - (1 << (fr["alloc"][1] - 1)) + 1 for c in fr["codes"][1]
    )
    with pytest.raises(Exception):
        decode_mpeg1_subbands_real(df, on_error="fail").collect()
