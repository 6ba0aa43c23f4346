"""Real media decode (no media libraries needed): round-trip encoded
BMP images and PCM16 WAV audio through the mapInPandas decoders and
check every decoded field against the generation ground truth."""

from __future__ import annotations

import math

from epl_cas_etl_2026_spark.operators.multimodal import (
    decode_audio_real,
    decode_image_real,
    encode_bmp,
    encode_wav_pcm16,
)


def test_bmp_round_trip(spark):
    imgs = []
    truth = {}
    for i, (w, h, color) in enumerate(
        [(3, 2, (255, 0, 0)), (5, 5, (0, 255, 0)), (7, 1, (10, 20, 30))]
    ):
        rows = [[color] * w for _ in range(h)]
        imgs.append((i, bytearray(encode_bmp(w, h, rows))))
        luma = (
            0.299 * color[0] + 0.587 * color[1] + 0.114 * color[2]
        ) / 255.0
        truth[i] = (w, h, int(luma * 1000 + 0.5))
    df = spark.createDataFrame(imgs, "doc_id long, payload binary")
    out = {r.id: r for r in decode_image_real(df).collect()}
    assert len(out) == 3
    for i, (w, h, luma) in truth.items():
        r = out[i]
        assert (r.width, r.height, r.bpp) == (w, h, 24)
        assert abs(r.mean_luma_milli - luma) <= 1

    # gradient image: decoded luma must track the analytic mean
    w, h = 4, 4
    rows = [
        [(x * 60, x * 60, x * 60) for x in range(w)] for _ in range(h)
    ]
    df2 = spark.createDataFrame(
        [(9, bytearray(encode_bmp(w, h, rows)))],
        "doc_id long, payload binary",
    )
    r = decode_image_real(df2).first()
    expect = sum(x * 60 for x in range(w)) / w / 255.0
    assert abs(r.mean_luma_milli - int(expect * 1000 + 0.5)) <= 1


def test_bmp_row_padding_and_bottom_up_order(spark):
    # width 3 → stride 12 with 3 pad bytes per row; distinct rows pin
    # the bottom-up storage inversion
    rows = [[(255, 255, 255)] * 3, [(0, 0, 0)] * 3]  # top bright
    buf = encode_bmp(3, 2, rows)
    from epl_cas_etl_2026_spark.operators.multimodal import _parse_bmp

    w, h, bpp, luma = _parse_bmp(buf)
    assert (w, h, bpp) == (3, 2, 24)
    assert luma == 500  # half bright, half black


def test_wav_round_trip(spark):
    sr = 8000
    # 1 s of a full-scale square wave: rms = peak = full scale
    square = [32767 if i % 2 == 0 else -32767 for i in range(sr)]
    # 0.5 s silence
    silence = [0] * (sr // 2)
    rows = [
        (1, bytearray(encode_wav_pcm16(square, sr))),
        (2, bytearray(encode_wav_pcm16(silence, sr))),
    ]
    df = spark.createDataFrame(rows, "doc_id long, payload binary")
    out = {r.id: r for r in decode_audio_real(df).collect()}
    r1 = out[1]
    assert (r1.channels, r1.sample_rate, r1.n_samples) == (1, sr, sr)
    assert r1.duration_ms == 1000
    assert r1.peak_milli == 1000 and abs(r1.rms_milli - 1000) <= 1
    r2 = out[2]
    assert (r2.n_samples, r2.duration_ms) == (sr // 2, 500)
    assert r2.rms_milli == 0 and r2.peak_milli == 0


def test_wav_stereo_and_sine_rms(spark):
    sr = 4000
    amp = 16384  # half scale → rms = amp/sqrt(2)
    sine = [
        int(amp * math.sin(2 * math.pi * 440 * t / sr))
        for t in range(sr)
    ]
    stereo = []
    for s in sine:
        stereo += [s, -s]
    df = spark.createDataFrame(
        [(1, bytearray(encode_wav_pcm16(stereo, sr, channels=2)))],
        "doc_id long, payload binary",
    )
    r = decode_audio_real(df).first()
    assert r.channels == 2 and r.n_samples == sr
    expect_rms = amp / math.sqrt(2) / 32768.0 * 1000
    assert abs(r.rms_milli - expect_rms) <= 5


def test_decoders_reject_garbage(spark):
    from epl_cas_etl_2026_spark.operators.multimodal import (
        _parse_bmp,
        _parse_wav,
    )
    import pytest

    with pytest.raises(ValueError):
        _parse_bmp(b"NOTABMP" * 4)
    with pytest.raises(ValueError):
        _parse_wav(b"NOTAWAV" * 4)


def test_quarantine_mode_dead_letters_bad_payloads(spark):
    rows = [
        (1, bytearray(encode_bmp(2, 2, [[(9, 9, 9)] * 2] * 2))),
        (2, bytearray(b"garbage-not-a-bmp")),
    ]
    df = spark.createDataFrame(rows, "doc_id long, payload binary")
    out = {
        r.id: r
        for r in decode_image_real(df, on_error="quarantine").collect()
    }
    assert out[1].err is None and out[1].width == 2
    assert out[2].err is not None and out[2].width is None

    import pytest

    with pytest.raises(Exception):
        decode_image_real(df, on_error="fail").collect()
    with pytest.raises(ValueError):
        decode_image_real(df, on_error="nonsense")

    wav_rows = [
        (1, bytearray(encode_wav_pcm16([0, 1, 2], 8000))),
        (2, bytearray(b"garbage-not-a-wav")),
    ]
    wdf = spark.createDataFrame(wav_rows, "doc_id long, payload binary")
    wout = {
        r.id: r
        for r in decode_audio_real(wdf, on_error="quarantine").collect()
    }
    assert wout[1].err is None and wout[1].n_samples == 3
    assert wout[2].err is not None and wout[2].n_samples is None


def test_quarantine_catches_non_valueerror_corruption(spark):
    """Review-found: truncated payloads raise struct.error and a
    zero-channel WAV raises ValueError from the explicit guard — all
    must land in the err column, not abort the job."""
    import struct

    bad_wav = (
        struct.pack("<4sI4s", b"RIFF", 30, b"WAVE")
        + struct.pack("<4sIHHIIHH", b"fmt ", 16, 1, 0, 8000, 0, 0, 16)
        + struct.pack("<4sI", b"data", 4)
        + b"\x00\x00\x00\x00"
    )
    rows = [
        (1, bytearray(b"BM" + b"\x01" * 6)),       # truncated BMP header
        (2, bytearray(encode_bmp(1, 1, [[(1, 2, 3)]]))),
    ]
    df = spark.createDataFrame(rows, "doc_id long, payload binary")
    out = {
        r.id: r
        for r in decode_image_real(df, on_error="quarantine").collect()
    }
    assert out[1].err is not None and out[2].err is None

    wrows = [
        (1, bytearray(bad_wav)),                    # channels=0
        (2, bytearray(b"RIFF")),                    # truncated
        (3, bytearray(encode_wav_pcm16([1, 2], 8000))),
    ]
    wdf = spark.createDataFrame(wrows, "doc_id long, payload binary")
    wout = {
        r.id: r
        for r in decode_audio_real(wdf, on_error="quarantine").collect()
    }
    assert wout[1].err is not None
    assert wout[2].err is not None
    assert wout[3].err is None
