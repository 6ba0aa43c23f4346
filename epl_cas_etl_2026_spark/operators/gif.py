"""Real GIF codec (GIF89a, CompuServe/W3C spec) in pure stdlib +
numpy — the fourth REAL image format after BMP/JPEG/PNG
(operators/multimodal.py, jpeg.py, png.py). GIF's compression is LZW
with variable-width codes (3..12 bits), which needs no external
library: both the encoder's dictionary builder and the decoder's
code-stream reconstruction are implemented here in full, including
the CLEAR/EOI control codes, dictionary overflow reset, the
little-endian sub-block byte framing, and the 4-pass interlace row
order.

Coverage:
- header + logical screen descriptor, global AND local color tables;
- image descriptor, interlaced and sequential row order;
- full LZW: variable code width growth at dictionary size 2^w,
  CLEAR-code dictionary reset (emitted by the encoder when the table
  hits 4096 — the decoder path every real-world GIF exercises), EOI;
- extension blocks (graphics control / comment / application)
  traversed by sub-block framing and CRC-less per spec;
- loud rejection: bad signature, truncated sub-blocks, missing
  trailer, out-of-range LZW codes, palette index overflow.

GIF is lossless on indexed pixels, so round-trips are bit-exact and
the gate oracle (plans/extensions.docs_gif_roundtrip_stats) is the
generation arithmetic itself — the PNG gate's oracle form.

At 100 TB the decode runs scan-stage parallel inside mapInPandas
(decode_image_real's batch shape); see decode_gif_real below.
"""

from __future__ import annotations

import struct
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame

_MAX_CODE_WIDTH = 12


# ---------------------------------------------------------------------------
# LZW (GIF variant: variable width, little-endian bit packing,
# CLEAR = 2^min_sz, EOI = CLEAR + 1, first free code = CLEAR + 2).
# ---------------------------------------------------------------------------
def lzw_encode(indices: list[int], min_code_size: int) -> bytes:
    clear = 1 << min_code_size
    eoi = clear + 1
    out_bits: list[tuple[int, int]] = []  # (code, width)
    width = min_code_size + 1
    table: dict[tuple[int, ...], int] = {
        (i,): i for i in range(clear)
    }
    next_code = eoi + 1
    out_bits.append((clear, width))
    prefix: tuple[int, ...] = ()
    for px in indices:
        cand = prefix + (px,)
        if cand in table:
            prefix = cand
            continue
        out_bits.append((table[prefix], width))
        if next_code < (1 << _MAX_CODE_WIDTH):
            table[cand] = next_code
            next_code += 1
            # the DECODER widens when its table size hits 2^w — the
            # encoder must mirror that so the NEXT emitted code uses
            # the width the decoder will read it with
            if next_code == (1 << width) and width < _MAX_CODE_WIDTH:
                width += 1
        else:
            # table full: reset via CLEAR (the real-world GIF path)
            out_bits.append((clear, width))
            table = {(i,): i for i in range(clear)}
            next_code = eoi + 1
            width = min_code_size + 1
        prefix = (px,)
    if prefix:
        out_bits.append((table[prefix], width))
    out_bits.append((eoi, width))
    # little-endian bit packing
    acc = n = 0
    data = bytearray()
    for code, w in out_bits:
        acc |= code << n
        n += w
        while n >= 8:
            data.append(acc & 0xFF)
            acc >>= 8
            n -= 8
    if n:
        data.append(acc & 0xFF)
    return bytes(data)


def lzw_decode(data: bytes, min_code_size: int, n_expected: int) -> list[int]:
    clear = 1 << min_code_size
    eoi = clear + 1
    width = min_code_size + 1
    table: list[tuple[int, ...]] = [(i,) for i in range(clear)] + [(), ()]
    # size counts codes the ENCODER has assigned — one per data code
    # read, like giflib's RunningCode. It runs one ahead of
    # len(table) because the first code after CLEAR assigns a slot
    # whose content only becomes known at the next code; widening on
    # size (not len(table)) keeps the read width in encoder lockstep.
    size = clear + 2
    out: list[int] = []
    acc = n = pos = 0
    prev: tuple[int, ...] | None = None

    def next_code():
        nonlocal acc, n, pos
        while n < width:
            if pos >= len(data):
                return None
            acc |= data[pos] << n
            pos += 1
            n += 8
        code = acc & ((1 << width) - 1)
        acc >>= width
        n -= width
        return code

    while True:
        code = next_code()
        if code is None:
            raise ValueError("LZW stream ended without EOI")
        if code == clear:
            table = [(i,) for i in range(clear)] + [(), ()]
            width = min_code_size + 1
            size = clear + 2
            prev = None
            continue
        if code == eoi:
            break
        if code < len(table) and (code < clear or code > eoi):
            entry = table[code]
        elif code == len(table) and prev is not None:
            entry = prev + (prev[0],)  # the KwKwK case
        else:
            raise ValueError(f"LZW code {code} out of range")
        out.extend(entry)
        if prev is not None:
            table.append(prev + (entry[0],))
        if size < (1 << _MAX_CODE_WIDTH):
            size += 1
            if size == (1 << width) and width < _MAX_CODE_WIDTH:
                width += 1
        prev = entry
        if len(out) > n_expected:
            raise ValueError("LZW produced more pixels than the image holds")
    if len(out) != n_expected:
        raise ValueError(
            f"LZW produced {len(out)} pixels, expected {n_expected}"
        )
    return out


def _sub_blocks(body: bytes) -> bytes:
    """Wrap raw bytes into <=255-byte GIF sub-blocks + terminator."""
    out = bytearray()
    for i in range(0, len(body), 255):
        chunk = body[i : i + 255]
        out.append(len(chunk))
        out += chunk
    out.append(0)
    return bytes(out)


_INTERLACE_PASSES = ((0, 8), (4, 8), (2, 4), (1, 2))


def _interlace_order(height: int) -> list[int]:
    rows: list[int] = []
    for y0, dy in _INTERLACE_PASSES:
        rows.extend(range(y0, height, dy))
    return rows


def encode_gif(
    width: int,
    height: int,
    *,
    indices: np.ndarray,
    palette: list,
    interlace: bool = False,
    comment: str | None = None,
) -> bytes:
    """Encode a single-frame GIF89a from palette indices (h, w) and an
    RGB palette (padded to a power of two per the spec)."""
    n_colors = len(palette)
    if not 0 < n_colors <= 256:
        raise ValueError("palette must hold 1..256 colors")
    depth = max(1, (int(n_colors) - 1).bit_length())
    size = 1 << depth
    idx = np.asarray(indices, dtype=np.uint8).reshape(height, width)
    if int(idx.max(initial=0)) >= n_colors:
        raise ValueError("palette index out of range")
    out = bytearray(b"GIF89a")
    # logical screen descriptor with a global color table
    out += struct.pack("<HHBBB", width, height, 0x80 | (depth - 1), 0, 0)
    for i in range(size):
        r, g, b = palette[i] if i < n_colors else (0, 0, 0)
        out += bytes((r, g, b))
    if comment is not None:
        out += b"\x21\xfe" + _sub_blocks(comment.encode())
    flags = 0x40 if interlace else 0
    out += b"\x2c" + struct.pack("<HHHHB", 0, 0, width, height, flags)
    rows = idx[_interlace_order(height)] if interlace else idx
    min_sz = max(2, depth)
    out.append(min_sz)
    out += _sub_blocks(lzw_encode([int(v) for v in rows.reshape(-1)], min_sz))
    out += b"\x3b"
    return bytes(out)


def decode_gif(buf: bytes) -> dict:
    """Decode the first frame of a GIF87a/89a → {width, height,
    interlaced, n_colors, pixels (h, w, 3 uint8 RGB)}. Raises
    ValueError on any malformation."""
    buf = bytes(buf)
    if buf[:6] not in (b"GIF87a", b"GIF89a"):
        raise ValueError("not a GIF payload")
    if len(buf) < 13:
        raise ValueError("truncated GIF header")
    sw, sh, packed, _bg, _ar = struct.unpack_from("<HHBBB", buf, 6)
    pos = 13
    gct = None
    if packed & 0x80:
        n = 2 << (packed & 0x07)
        gct = np.frombuffer(buf, np.uint8, n * 3, pos).reshape(-1, 3)
        pos += n * 3

    def skip_sub_blocks(p):
        while True:
            if p >= len(buf):
                raise ValueError("truncated GIF sub-blocks")
            ln = buf[p]
            p += 1
            if ln == 0:
                return p
            if p + ln > len(buf):
                raise ValueError("truncated GIF sub-block body")
            p += ln

    while True:
        if pos >= len(buf):
            raise ValueError("GIF missing trailer")
        marker = buf[pos]
        pos += 1
        if marker == 0x3B:
            raise ValueError("GIF has no image data")
        if marker == 0x21:  # extension
            if pos >= len(buf):
                raise ValueError("truncated GIF extension")
            pos = skip_sub_blocks(pos + 1)
            continue
        if marker != 0x2C:
            raise ValueError(f"unknown GIF block 0x{marker:02x}")
        if pos + 9 > len(buf):
            raise ValueError("truncated GIF image descriptor")
        left, top, w, h, flags = struct.unpack_from("<HHHHB", buf, pos)
        pos += 9
        if w <= 0 or h <= 0 or left + w > sw or top + h > sh:
            raise ValueError("illegal GIF image descriptor")
        palette = gct
        if flags & 0x80:
            n = 2 << (flags & 0x07)
            palette = np.frombuffer(buf, np.uint8, n * 3, pos).reshape(-1, 3)
            pos += n * 3
        if palette is None:
            raise ValueError("GIF image without any color table")
        if pos >= len(buf):
            raise ValueError("truncated GIF image data")
        min_sz = buf[pos]
        pos += 1
        if not 2 <= min_sz <= 11:
            raise ValueError(f"illegal LZW min code size {min_sz}")
        # gather data sub-blocks
        chunks = []
        while True:
            if pos >= len(buf):
                raise ValueError("truncated GIF sub-blocks")
            ln = buf[pos]
            pos += 1
            if ln == 0:
                break
            if pos + ln > len(buf):
                raise ValueError("truncated GIF sub-block body")
            chunks.append(buf[pos : pos + ln])
            pos += ln
        idx = lzw_decode(b"".join(chunks), min_sz, w * h)
        arr = np.array(idx, dtype=np.int32).reshape(h, w)
        if flags & 0x40:
            deinter = np.zeros_like(arr)
            deinter[_interlace_order(h)] = arr
            arr = deinter
        if int(arr.max(initial=0)) >= len(palette):
            raise ValueError("palette index out of range")
        px = palette[arr]
        # require the trailer to be reachable: walk (without decoding)
        # any remaining frames/extensions to the 0x3B trailer so a GIF
        # truncated right after this frame's data is rejected loudly
        scan = pos
        while True:
            if scan >= len(buf):
                raise ValueError("GIF missing trailer")
            marker = buf[scan]
            scan += 1
            if marker == 0x3B:
                break
            if marker == 0x21:  # extension: label byte + sub-blocks
                if scan >= len(buf):
                    raise ValueError("truncated GIF extension")
                scan = skip_sub_blocks(scan + 1)
                continue
            if marker != 0x2C:
                raise ValueError(f"unknown GIF block 0x{marker:02x}")
            if scan + 9 > len(buf):
                raise ValueError("truncated GIF image descriptor")
            lflags = buf[scan + 8]
            scan += 9
            if lflags & 0x80:
                scan += (2 << (lflags & 0x07)) * 3
            if scan >= len(buf):
                raise ValueError("truncated GIF image data")
            scan = skip_sub_blocks(scan + 1)  # lzw min size + sub-blocks
        return {
            "width": w,
            "height": h,
            "interlaced": bool(flags & 0x40),
            "n_colors": int(len(palette)),
            "pixels": px,
        }


GIF_REAL_SCHEMA = (
    "id long, width long, height long, n_colors long, interlaced boolean, "
    "luma_sum long, n_px long, err string"
)


def decode_gif_real(
    df: DataFrame,
    id_col: str = "doc_id",
    payload_col: str = "payload",
    on_error: str = "fail",
) -> DataFrame:
    """Real GIF decode via mapInPandas (decode_image_real's batch
    shape); luma_sum = Σ(299R + 587G + 114B) exact-integer, as in the
    PNG path."""
    if on_error not in ("fail", "quarantine"):
        raise ValueError(f"on_error must be fail|quarantine: {on_error}")
    cols = [id_col, payload_col]

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            parsed = []
            for b in pdf[payload_col]:
                try:
                    d = decode_gif(bytes(b))
                    px = d["pixels"].astype(np.int64)
                    luma = (
                        299 * px[..., 0] + 587 * px[..., 1] + 114 * px[..., 2]
                    )
                    parsed.append(
                        (
                            d["width"], d["height"], d["n_colors"],
                            d["interlaced"], int(luma.sum()),
                            int(luma.size), None,
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
                    "width": [p[0] for p in parsed],
                    "height": [p[1] for p in parsed],
                    "n_colors": [p[2] for p in parsed],
                    "interlaced": [p[3] for p in parsed],
                    "luma_sum": [p[4] for p in parsed],
                    "n_px": [p[5] for p in parsed],
                    "err": [p[6] for p in parsed],
                }
            )

    return df.select(*cols).mapInPandas(batches, GIF_REAL_SCHEMA)
