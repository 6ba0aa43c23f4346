"""MPEG-1 Audio Layer I (ISO/IEC 11172-3) — REAL bitstream decode to
exactly-dequantized subband samples, stdlib + numpy, no media
libraries. Round-9 continuation of the r8 from-scratch codec family
(JPEG/PNG/GIF/IMA-ADPCM), upgrading the engine's MPEG-audio story
from "opaque payload" to real frame machinery:

* frame walk: 12-bit syncword, header field decode (ID / layer /
  protection / bitrate index / sampling frequency / padding / mode),
  slot-exact frame length (N = 12 * bitrate / fs slots of 4 bytes for
  Layer I), multi-frame streams, loud rejection of bad sync, forbidden
  bitrate index (15), reserved sampling frequency (3), forbidden bit
  allocation (15), forbidden scalefactor index (63), and truncation;
* bit allocation: 4 bits per subband (0 = silent, else nb = value+1
  sample bits, 2..15);
* scalefactors: 6 bits per allocated subband, sf = 2.0 * 2^(-idx/3)
  (ISO 11172-3 2.4.2.5, Table 3-B.1 is exactly this formula);
* requantization (ISO 11172-3 2.4.3.3, Layer I):
      s''' = code / 2^(nb-1) - 1
      s''  = (2^nb / (2^nb - 1)) * (s''' + 2^(1-nb))
      s    = sf * s''
  which reduces to the EXACT rational
      s = sf * 2 * (code - 2^(nb-1) + 1) / (2^nb - 1)
  — the decoder exposes the integer numerator term
  (code - 2^(nb-1) + 1) per sample so downstream consumers (and the
  DuckDB gate oracle) can stay in exact integer arithmetic; float
  subband values are also provided for analysis paths.

HONESTLY STUBBED: the polyphase synthesis filterbank to PCM. Its
window coefficients (ISO 11172-3 Table 3-B.3, 512 normative values)
are a printed table, not a formula — they cannot be derived in this
environment without the standard text or a media library, and a
from-memory approximation would not be the standard's decoder.
``synthesize_pcm`` rejects loudly with that citation; everything up
to the subband domain is real and exact. (Same posture as the r8
MP3/H.264 stubs, one layer deeper into the format.)

LAYER II, CHECKED AND DECLINED (round-10; the r9 verdict asked
whether Layer II needs tables beyond the Layer I path): the grouped
3-sample granules and the Table 3-B.4 requantization constants ARE
formula-derivable (C = 2^k/(2^k-1), D = 2^(1-k) for 2^k-1 steps;
C = 2^k/nsteps, D = 1/2 for the grouped 3/5/9-step classes), but the
BIT-ALLOCATION tables (ISO 11172-3 Tables 3-B.2a-d — which allocation
index selects which quantization class, per subband, per
bitrate/sampling-rate regime) are quality-tuned arbitrary printed
tables with no generating formula and no copy in this environment.
A from-memory reconstruction would silently diverge from the
standard, which is worse than a stub — so Layer II stays out, with
this citation as the boundary.

Reference parity note: the reference pipeline treats media payloads
as opaque binaries (SURVEY.md §2.10); this module is part of the
beyond-reference multimodal extension surface.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame

# Layer I bitrate table (kbit/s), index 1..14; 0 is "free format"
# (rejected here), 15 is forbidden.
BITRATES_L1 = (
    None, 32, 64, 96, 128, 160, 192, 224, 256, 288, 320, 352, 384, 416, 448
)
SAMPLING_FREQ = {0: 44100, 1: 48000, 2: 32000}
_SB = 32  # subbands
_SPG = 12  # samples per subband per Layer I frame


class _BitReader:
    def __init__(self, buf: bytes, pos_bits: int = 0):
        self.buf = buf
        self.pos = pos_bits

    def read(self, n: int) -> int:
        end = self.pos + n
        if end > len(self.buf) * 8:
            raise ValueError("truncated MPEG frame payload")
        out = 0
        pos = self.pos
        while n > 0:
            byte = self.buf[pos >> 3]
            avail = 8 - (pos & 7)
            take = min(avail, n)
            shift = avail - take
            out = (out << take) | ((byte >> shift) & ((1 << take) - 1))
            pos += take
            n -= take
        self.pos = pos
        return out


class _BitWriter:
    def __init__(self):
        self.bits: list[tuple[int, int]] = []

    def write(self, value: int, n: int) -> None:
        if value < 0 or value >> n:
            raise ValueError(f"value {value} does not fit in {n} bits")
        self.bits.append((value, n))

    def tobytes(self) -> bytes:
        out = bytearray()
        acc = 0
        nacc = 0
        for value, n in self.bits:
            acc = (acc << n) | value
            nacc += n
            while nacc >= 8:
                nacc -= 8
                out.append((acc >> nacc) & 0xFF)
        if nacc:
            out.append((acc << (8 - nacc)) & 0xFF)
        return bytes(out)


def l1_frame_slots(bitrate_index: int, sampling_frequency: int) -> int:
    """Layer I frame length in 4-byte slots (ISO 11172-3 2.4.3.1),
    padding off: N = 12 * bitrate / fs."""
    return 12 * BITRATES_L1[bitrate_index] * 1000 // SAMPLING_FREQ[
        sampling_frequency
    ]


def encode_mpeg1_l1(
    frames: list[dict], bitrate_index: int = 14, sampling_frequency: int = 2
) -> bytes:
    """Real single-channel Layer I frame writer (fixture/sink format,
    the codec-gate convention: the encoder builds REAL bitstreams the
    decoder must parse bit-exactly). Each frame dict: ``alloc`` (32
    ints: 0 silent, else nb in 2..15), ``sfidx`` (32 ints 0..62),
    ``codes`` (32 lists of 12 ints, each < 2^nb). Frames are padded to
    the exact slot length with zero ancillary bits."""
    out = bytearray()
    slots = l1_frame_slots(bitrate_index, sampling_frequency)
    for fr in frames:
        alloc, sfidx, codes = fr["alloc"], fr["sfidx"], fr["codes"]
        w = _BitWriter()
        w.write(0xFFF, 12)  # syncword
        w.write(1, 1)  # ID: MPEG-1
        w.write(0b11, 2)  # layer I
        w.write(1, 1)  # protection_bit: 1 = no CRC
        w.write(bitrate_index, 4)
        w.write(sampling_frequency, 2)
        w.write(0, 1)  # padding_bit
        w.write(0, 1)  # private_bit
        w.write(0b11, 2)  # mode: single_channel
        w.write(0, 2)  # mode_extension
        w.write(0, 1)  # copyright
        w.write(1, 1)  # original
        w.write(0, 2)  # emphasis
        for sb in range(_SB):
            nb = alloc[sb]
            if nb == 0:
                w.write(0, 4)
            elif 2 <= nb <= 15:
                w.write(nb - 1, 4)
            else:
                raise ValueError(f"illegal allocation {nb} bits")
        for sb in range(_SB):
            if alloc[sb]:
                if not 0 <= sfidx[sb] <= 62:
                    raise ValueError(f"illegal scalefactor index {sfidx[sb]}")
                w.write(sfidx[sb], 6)
        for j in range(_SPG):
            for sb in range(_SB):
                if alloc[sb]:
                    w.write(codes[sb][j], alloc[sb])
        body = w.tobytes()
        if len(body) > slots * 4:
            raise ValueError(
                f"frame content {len(body)} B exceeds {slots * 4} B"
            )
        out += body + b"\x00" * (slots * 4 - len(body))
    return bytes(out)


def decode_mpeg1_l1(buf: bytes) -> dict:
    """Decode a mono MPEG-1 Layer I stream → {sampling_rate,
    bitrate_kbps, n_frames, frames: [{alloc, sfidx, codes,
    shift_num}]} where ``shift_num[sb][j] = code - 2^(nb-1) + 1`` is
    the exact integer numerator of the requantized sample
    (s = sf * 2 * shift_num / (2^nb - 1)). Raises ValueError on
    anything malformed."""
    frames = []
    pos = 0
    rate = None
    br = None
    while pos < len(buf):
        if pos + 4 > len(buf):
            raise ValueError("truncated MPEG frame header")
        r = _BitReader(buf, pos * 8)
        if r.read(12) != 0xFFF:
            raise ValueError(f"bad syncword at byte {pos}")
        if r.read(1) != 1:
            raise ValueError("not MPEG-1 (ID bit 0)")
        if r.read(2) != 0b11:
            raise ValueError("not Layer I")
        protection = r.read(1)
        bitrate_index = r.read(4)
        if bitrate_index in (0, 15):
            raise ValueError(f"unsupported bitrate index {bitrate_index}")
        sfreq = r.read(2)
        if sfreq == 3:
            raise ValueError("reserved sampling frequency")
        padding = r.read(1)
        r.read(1)  # private
        mode = r.read(2)
        if mode != 0b11:
            raise ValueError("only single_channel streams supported")
        r.read(2 + 1 + 1 + 2)  # mode_ext, copyright, original, emphasis
        if protection == 0:
            r.read(16)  # CRC word (present; value not checked)
        this_rate = SAMPLING_FREQ[sfreq]
        if rate is not None and (this_rate != rate or bitrate_index != br):
            raise ValueError("header fields change mid-stream")
        rate, br = this_rate, bitrate_index
        frame_len = (l1_frame_slots(bitrate_index, sfreq) + padding) * 4
        if pos + frame_len > len(buf):
            raise ValueError("truncated MPEG frame body")
        alloc = []
        for _ in range(_SB):
            a = r.read(4)
            if a == 15:
                raise ValueError("forbidden bit allocation 15")
            alloc.append(0 if a == 0 else a + 1)
        sfidx = []
        for sb in range(_SB):
            if alloc[sb]:
                idx = r.read(6)
                if idx == 63:
                    raise ValueError("forbidden scalefactor index 63")
                sfidx.append(idx)
            else:
                sfidx.append(0)
        codes = [[0] * _SPG for _ in range(_SB)]
        for j in range(_SPG):
            for sb in range(_SB):
                if alloc[sb]:
                    codes[sb][j] = r.read(alloc[sb])
        if r.pos > (pos + frame_len) * 8:
            raise ValueError("frame content overruns its slot length")
        shift = [
            [codes[sb][j] - (1 << (alloc[sb] - 1)) + 1 for j in range(_SPG)]
            if alloc[sb]
            else [0] * _SPG
            for sb in range(_SB)
        ]
        frames.append(
            {"alloc": alloc, "sfidx": sfidx, "codes": codes,
             "shift_num": shift}
        )
        pos += frame_len
    if not frames:
        raise ValueError("no MPEG frames in payload")
    return {
        "sampling_rate": rate,
        "bitrate_kbps": BITRATES_L1[br],
        "n_frames": len(frames),
        "frames": frames,
    }


def subband_samples(decoded: dict) -> np.ndarray:
    """Float64 dequantized subband samples, shape (n_frames, 32, 12) —
    the analysis-domain output (exact-rational evaluated in float for
    downstream numeric consumers; the gate consumes the integer
    ``shift_num`` form instead)."""
    out = np.zeros((decoded["n_frames"], _SB, _SPG))
    for f, fr in enumerate(decoded["frames"]):
        for sb in range(_SB):
            nb = fr["alloc"][sb]
            if not nb:
                continue
            sf = 2.0 * 2.0 ** (-fr["sfidx"][sb] / 3.0)
            scale = sf * 2.0 / ((1 << nb) - 1)
            out[f, sb] = np.array(fr["shift_num"][sb], dtype=np.float64) * scale
    return out


def synthesize_pcm(decoded: dict) -> np.ndarray:
    """NOT IMPLEMENTED — loudly, by design: the polyphase synthesis
    window (ISO/IEC 11172-3 Table 3-B.3, 512 normative printed values)
    is not derivable by formula and no copy exists in this
    environment; a from-memory approximation would not be the
    standard's decoder. Subband-domain decode above is complete and
    exact; synthesis is the single remaining step."""
    raise ValueError(
        "MPEG-1 Layer I PCM synthesis requires the normative window "
        "table (ISO 11172-3 Table 3-B.3), unavailable in this "
        "environment; use subband_samples() for the exact "
        "analysis-domain decode"
    )


MPEG1_SB_SCHEMA = (
    "id long, frame long, sb long, nb long, sfidx long, "
    "sum_shift long, n_codes long, err string"
)


def decode_mpeg1_subbands_real(
    df: DataFrame,
    id_col: str = "doc_id",
    payload_col: str = "payload",
    on_error: str = "fail",
) -> DataFrame:
    """Real Layer I decode via mapInPandas (the codec-family batch
    shape): one output row per (doc, frame, allocated subband) with
    the exact integer requantization terms — scan-stage, no shuffle;
    quarantine mode emits a single err row per bad payload."""
    if on_error not in ("fail", "quarantine"):
        raise ValueError(f"on_error must be fail|quarantine: {on_error}")
    cols = [id_col, payload_col]

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for did, b in zip(pdf[id_col], pdf[payload_col]):
                did = int(did)
                try:
                    d = decode_mpeg1_l1(bytes(b))
                    for f, fr in enumerate(d["frames"]):
                        for sb in range(_SB):
                            nb = fr["alloc"][sb]
                            if not nb:
                                continue
                            rows.append(
                                (
                                    did, f, sb, nb, fr["sfidx"][sb],
                                    sum(fr["shift_num"][sb]), _SPG, None,
                                )
                            )
                except Exception as e:  # noqa: BLE001 — quarantine is
                    # the catch-everything path by contract
                    if on_error == "fail":
                        raise
                    rows.append((did,) + (None,) * 6 + (str(e),))
            yield pd.DataFrame(
                rows,
                columns=[
                    "id", "frame", "sb", "nb", "sfidx",
                    "sum_shift", "n_codes", "err",
                ],
            )

    return df.select(*cols).mapInPandas(batches, MPEG1_SB_SCHEMA)
