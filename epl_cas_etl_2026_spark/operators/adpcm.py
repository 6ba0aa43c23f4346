"""Real IMA ADPCM audio codec (WAVE format tag 0x0011) in stdlib
struct + numpy — 4:1 compressed audio the engine decodes FOR REAL,
extending the multimodal real-decode surface (BMP/WAV/JPEG/PNG
precedent) to a genuinely COMPRESSED audio format. MP3 remains
honestly stubbed (psychoacoustic + Huffman machinery needs the absent
libs); IMA ADPCM is the compressed format that doesn't: the entire
codec is the public integer state machine from the IMA Digital Audio
Pack recommendation (step/index tables + a 4-bit delta quantizer),
exactly as shipped in Microsoft's WAVE spec for format 0x11.

Container coverage: canonical block layout (per-channel 4-byte block
header carrying the int16 predictor seed — which IS the block's first
sample — and the step index), mono and stereo (stereo interleaves
4-byte nibble groups per channel), 'fact' total-sample chunk, loud
rejection of non-ADPCM fmt tags, bad block alignment, truncated
blocks, and out-of-range step indices.

The decode state machine is pure integer arithmetic (shifts, adds,
clamps) — so a gate oracle can replay it EXACTLY in SQL (DuckDB
list_reduce over the step tables as literals); see
plans/extensions.docs_adpcm_roundtrip_stats.

At 100 TB the decode runs scan-stage parallel inside mapInPandas
(decode_audio_real's batch shape); payload bytes never leave the
partition.
"""

from __future__ import annotations

import struct
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame

# Public IMA tables (IMA Digital Audio Pack, 1992).
STEP_TABLE = (
    7, 8, 9, 10, 11, 12, 13, 14, 16, 17, 19, 21, 23, 25, 28, 31, 34, 37,
    41, 45, 50, 55, 60, 66, 73, 80, 88, 97, 107, 118, 130, 143, 157, 173,
    190, 209, 230, 253, 279, 307, 337, 371, 408, 449, 494, 544, 598, 658,
    724, 796, 876, 963, 1060, 1166, 1282, 1411, 1552, 1707, 1878, 2066,
    2272, 2499, 2749, 3024, 3327, 3660, 4026, 4428, 4871, 5358, 5894,
    6484, 7132, 7845, 8630, 9493, 10442, 11487, 12635, 13899, 15289,
    16818, 18500, 20350, 22385, 24623, 27086, 29794, 32767,
)
INDEX_TABLE = (-1, -1, -1, -1, 2, 4, 6, 8, -1, -1, -1, -1, 2, 4, 6, 8)

_FMT_IMA_ADPCM = 0x0011


def _clamp16(v: int) -> int:
    return -32768 if v < -32768 else (32767 if v > 32767 else v)


def _clamp_idx(i: int) -> int:
    return 0 if i < 0 else (88 if i > 88 else i)


def decode_nibble(nib: int, pred: int, idx: int) -> tuple[int, int]:
    """One step of the IMA state machine: returns (new_pred, new_idx).
    Pure integer arithmetic — shifts and clamps only."""
    step = STEP_TABLE[idx]
    diff = step >> 3
    if nib & 4:
        diff += step
    if nib & 2:
        diff += step >> 1
    if nib & 1:
        diff += step >> 2
    pred = _clamp16(pred - diff if nib & 8 else pred + diff)
    return pred, _clamp_idx(idx + INDEX_TABLE[nib])


def encode_sample(sample: int, pred: int, idx: int) -> tuple[int, int, int]:
    """Quantize one sample against the current state: returns
    (nibble, new_pred, new_idx) with new_pred the DECODER's
    reconstruction (encoder tracks the decoder exactly)."""
    step = STEP_TABLE[idx]
    delta = sample - pred
    nib = 8 if delta < 0 else 0
    if delta < 0:
        delta = -delta
    if delta >= step:
        nib |= 4
        delta -= step
    if delta >= step >> 1:
        nib |= 2
        delta -= step >> 1
    if delta >= step >> 2:
        nib |= 1
    return nib, *decode_nibble(nib, pred, idx)


def _block_samples(block_align: int, channels: int) -> int:
    # per channel: 4 header bytes (1st sample) + nibble bytes
    return (block_align - 4 * channels) * 2 // channels + 1


def encode_adpcm_ima(
    samples: np.ndarray,
    sample_rate: int = 16000,
    channels: int = 1,
    block_align: int | None = None,
) -> bytes:
    """Encode int16 PCM (shape (n,) mono or (n, channels)) to an IMA
    ADPCM WAV. Each block header seeds the predictor with the block's
    first sample (the canonical WAVE layout, so silence decodes to
    exact silence)."""
    x = np.asarray(samples, dtype=np.int64).reshape(-1, channels)
    n = x.shape[0]
    if block_align is None:
        block_align = 36 * channels  # 65 samples/block mono
    spb = _block_samples(block_align, channels)
    data = bytearray()
    idx = [0] * channels
    for b0 in range(0, n, spb):
        blk = x[b0 : b0 + spb]
        nib_rows: list[list[int]] = []
        for ch in range(channels):
            pred = int(blk[0, ch])
            data_hdr = struct.pack("<hBB", pred, idx[ch], 0)
            data += data_hdr
            nibs = []
            for s in blk[1:, ch]:
                nb, pred, idx[ch] = encode_sample(int(s), pred, idx[ch])
                nibs.append(nb)
            # pad the block's nibble area to full length
            nibs += [0] * (spb - 1 - len(nibs))
            nib_rows.append(nibs)
            if channels == 1:
                for i in range(0, len(nibs), 2):
                    data.append(nibs[i] | (nibs[i + 1] << 4))
        if channels == 2:
            # interleave per 8-nibble (4-byte) groups, L then R
            for g in range(0, spb - 1, 8):
                for ch in range(2):
                    grp = nib_rows[ch][g : g + 8]
                    grp += [0] * (8 - len(grp))
                    for i in range(0, 8, 2):
                        data.append(grp[i] | (grp[i + 1] << 4))
    byte_rate = sample_rate * block_align // spb
    fmt = struct.pack(
        "<4sIHHIIHHHH", b"fmt ", 20, _FMT_IMA_ADPCM, channels,
        sample_rate, byte_rate, block_align, 4, 2, spb,
    )
    fact = struct.pack("<4sII", b"fact", 4, n)
    data_chunk = struct.pack("<4sI", b"data", len(data)) + bytes(data)
    if len(data) & 1:
        data_chunk += b"\x00"
    riff = struct.pack(
        "<4sI4s", b"RIFF", 4 + len(fmt) + len(fact) + len(data_chunk),
        b"WAVE",
    )
    return riff + fmt + fact + data_chunk


def decode_adpcm_ima(buf: bytes) -> dict:
    """Decode an IMA ADPCM WAV → {channels, sample_rate, n_samples,
    samples: (n, channels) int16}. Raises ValueError on anything
    malformed: wrong fmt tag, bad block align, truncated blocks,
    step index out of range."""
    if buf[:4] != b"RIFF" or buf[8:12] != b"WAVE":
        raise ValueError("not a WAV payload")
    # the RIFF size field bounds the chunk walk: riff_end is the first
    # byte past the container, and anything beyond it is rejected
    (riff_size,) = struct.unpack_from("<I", buf, 4)
    riff_end = 8 + riff_size
    if riff_end > len(buf):
        raise ValueError("RIFF size exceeds payload")
    if riff_end < len(buf):
        raise ValueError(
            f"{len(buf) - riff_end} trailing bytes beyond RIFF container"
        )
    pos = 12
    fmt = None
    fact_samples = None
    data = None
    while pos < riff_end:
        if pos + 8 > riff_end:
            raise ValueError("truncated chunk header inside RIFF container")
        cid, clen = struct.unpack_from("<4sI", buf, pos)
        body = buf[pos + 8 : pos + 8 + clen]
        if len(body) < clen:
            raise ValueError(f"truncated {cid!r} chunk")
        if cid == b"fmt ":
            if clen < 16:
                raise ValueError("fmt chunk too short")
            tag, channels, rate, _br, balign, bits = struct.unpack_from(
                "<HHIIHH", body, 0
            )
            if tag != _FMT_IMA_ADPCM:
                raise ValueError(f"not IMA ADPCM (fmt tag 0x{tag:04x})")
            if bits != 4:
                raise ValueError(f"IMA ADPCM requires 4 bits, got {bits}")
            if channels not in (1, 2):
                raise ValueError(f"unsupported channel count {channels}")
            if balign < 4 * channels + channels or (
                (balign - 4 * channels) * 2
            ) % channels:
                raise ValueError(f"illegal block align {balign}")
            fmt = (channels, rate, balign)
        elif cid == b"fact":
            (fact_samples,) = struct.unpack_from("<I", body, 0)
        elif cid == b"data":
            data = body
        pos += 8 + clen + (clen & 1)
    if fmt is None or data is None:
        raise ValueError("WAV missing fmt/data chunk")
    channels, rate, balign = fmt
    if len(data) % balign:
        raise ValueError("data chunk is not a whole number of blocks")
    spb = _block_samples(balign, channels)
    out: list[np.ndarray] = []
    for b0 in range(0, len(data), balign):
        blk = data[b0 : b0 + balign]
        chans = []
        for ch in range(channels):
            pred, idx, _ = struct.unpack_from("<hBB", blk, 4 * ch)
            if idx > 88:
                raise ValueError(f"step index {idx} out of range")
            samples = [pred]
            nibs: list[int] = []
            body = blk[4 * channels :]
            if channels == 1:
                for byte in body:
                    nibs.append(byte & 0xF)
                    nibs.append(byte >> 4)
            else:
                for g in range(0, len(body), 8):
                    grp = body[g + 4 * ch : g + 4 * ch + 4]
                    for byte in grp:
                        nibs.append(byte & 0xF)
                        nibs.append(byte >> 4)
            for nb in nibs[: spb - 1]:
                pred, idx = decode_nibble(nb, pred, idx)
                samples.append(pred)
            chans.append(np.array(samples, dtype=np.int16))
        out.append(np.stack(chans, axis=-1))
    samples = np.concatenate(out, axis=0) if out else np.zeros(
        (0, channels), dtype=np.int16
    )
    if fact_samples is not None:
        if fact_samples > samples.shape[0]:
            raise ValueError("fact chunk claims more samples than decoded")
        samples = samples[:fact_samples]
    return {
        "channels": channels,
        "sample_rate": rate,
        "n_samples": int(samples.shape[0]),
        "samples": samples,
    }


def adpcm_payload_from_nibbles(
    nibbles: list[int],
    *,
    pred0: int = 0,
    idx0: int = 0,
    sample_rate: int = 8000,
) -> bytes:
    """Build a mono single-block IMA ADPCM WAV directly from a nibble
    stream (fixture path for exact-arithmetic gates: the decoded
    samples are then the pure integer recurrence an SQL oracle can
    replay). Pads the block with trailing zero nibbles; the 'fact'
    chunk pins the true sample count 1 + len(nibbles)."""
    nb = len(nibbles)
    if nb % 2:
        raise ValueError("nibble count must be even (2 per byte)")
    balign = 4 + nb // 2
    data = bytearray(struct.pack("<hBB", pred0, idx0, 0))
    for i in range(0, nb, 2):
        data.append((nibbles[i] & 0xF) | ((nibbles[i + 1] & 0xF) << 4))
    spb = _block_samples(balign, 1)
    byte_rate = sample_rate * balign // spb
    fmt = struct.pack(
        "<4sIHHIIHHHH", b"fmt ", 20, _FMT_IMA_ADPCM, 1, sample_rate,
        byte_rate, balign, 4, 2, spb,
    )
    fact = struct.pack("<4sII", b"fact", 4, 1 + nb)
    data_chunk = struct.pack("<4sI", b"data", len(data)) + bytes(data)
    if len(data) & 1:
        data_chunk += b"\x00"
    riff = struct.pack(
        "<4sI4s", b"RIFF", 4 + len(fmt) + len(fact) + len(data_chunk),
        b"WAVE",
    )
    return riff + fmt + fact + data_chunk


ADPCM_REAL_SCHEMA = (
    "id long, channels long, sample_rate long, n_samples long, "
    "sum_pred long, sum_abs long, energy long, err string"
)


def decode_adpcm_real(
    df: DataFrame,
    id_col: str = "doc_id",
    payload_col: str = "payload",
    on_error: str = "fail",
) -> DataFrame:
    """Real IMA ADPCM decode via mapInPandas (decode_audio_real's
    batch shape). Emits exact-integer sample statistics — sum,
    sum of |s|, and energy Σs² — so gate aggregates are tie-free."""
    if on_error not in ("fail", "quarantine"):
        raise ValueError(f"on_error must be fail|quarantine: {on_error}")
    cols = [id_col, payload_col]

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            parsed = []
            for b in pdf[payload_col]:
                try:
                    d = decode_adpcm_ima(bytes(b))
                    s = d["samples"].astype(np.int64)
                    parsed.append(
                        (
                            d["channels"], d["sample_rate"], d["n_samples"],
                            int(s.sum()), int(np.abs(s).sum()),
                            int((s * s).sum()), None,
                        )
                    )
                except Exception as e:  # noqa: BLE001 — quarantine is
                    # the catch-everything path by contract
                    if on_error == "fail":
                        raise
                    parsed.append((None,) * 6 + (str(e),))
            yield pd.DataFrame(
                {
                    "id": pdf[id_col].astype("int64"),
                    "channels": [p[0] for p in parsed],
                    "sample_rate": [p[1] for p in parsed],
                    "n_samples": [p[2] for p in parsed],
                    "sum_pred": [p[3] for p in parsed],
                    "sum_abs": [p[4] for p in parsed],
                    "energy": [p[5] for p in parsed],
                    "err": [p[6] for p in parsed],
                }
            )

    return df.select(*cols).mapInPandas(batches, ADPCM_REAL_SCHEMA)
