"""Pure-stdlib JPEG codec: header metadata AND baseline pixel decode.

Two scopes, both real in a PIL-less sandbox:

1. `parse_sof` — the marker-segment walk of ITU-T T.81 up to the
   Start-of-Frame, extracting (width, height, n_components, bit depth)
   from any SOFn marker — baseline (SOF0), extended sequential (SOF1),
   progressive (SOF2), lossless/arithmetic variants alike. Powers
   `decode_metadata` (operators/multimodal.py) on real JPEG bytes.
2. `decode_pixels` / `encode_baseline` / `encode_progressive` — a full
   Huffman JPEG codec covering baseline sequential (SOF0/SOF1) AND
   progressive (SOF2) streams: DQT/DHT/DRI/SOS parsing, entropy decode
   with restart markers, spectral selection, successive approximation
   (DC/AC first + refinement passes, cross-block EOBn runs),
   dequantize, vectorized numpy IDCT, chroma upsampling, YCbCr→RGB.
   The encoders use the public Annex K quant and Huffman tables
   (quality-scaled per the classic libjpeg formula) with optional
   4:2:0 subsampling and restart intervals; both quantize identically,
   so sequential and progressive encodings of the same image decode to
   bit-identical pixels — the round-trip tests pin exactly that.

Disclosed remaining boundary: arithmetic-coded and lossless pixel
decode raise NotImplementedError (metadata still parses); PIL is
picked up automatically when installed for those paths.

Same role as png_codec/wav_codec/y4m_codec: the per-batch inner loop of
the Arrow-batched mapInPandas metadata/resize stages; the distributed
plumbing is format-agnostic. Entropy coding is per-block Python (it is
inherently bit-serial); the transform/color math is numpy over all
blocks at once, and the whole codec runs inside Arrow-batched workers —
per-batch, never per-row-dispatch.

Reference parity: the reference's sink side shows per-format output
plumbing as in-scope work (citygml/src/main/java/.../CitygmlBuilder.java
:140-151); this is the ingest-side analog for the dominant compressed
image format.
"""

from __future__ import annotations

import struct

import numpy as np

SOI = b"\xff\xd8"

# SOFn marker codes: 0xC0-0xCF minus DHT (0xC4), JPG (0xC8), DAC (0xCC)
_SOF = {
    0xC0, 0xC1, 0xC2, 0xC3, 0xC5, 0xC6, 0xC7,
    0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF,
}
# standalone markers that carry NO length field
_STANDALONE = {0x01, 0xD8, 0xD9} | set(range(0xD0, 0xD8))  # TEM, SOI, EOI, RSTn


def is_jpeg(buf: bytes) -> bool:
    return buf[:2] == SOI


def parse_sof(buf: bytes) -> tuple[int, int, int, int]:
    """(width, height, n_components, bit_depth) from the first SOFn.

    Walks marker segments from SOI, skipping APPn/COM/DQT/DHT/DRI and
    tolerating 0xFF fill bytes before markers (T.81 B.1.1.2). Raises
    ValueError on a non-JPEG buffer, a truncated stream, or a stream
    whose scan starts before any frame header.
    """
    if not is_jpeg(buf):
        raise ValueError("not a JPEG (no SOI marker)")
    pos, n = 2, len(buf)
    while pos + 2 <= n:
        if buf[pos] != 0xFF:
            raise ValueError(f"corrupt JPEG: expected marker at byte {pos}")
        # any number of 0xFF fill bytes may precede the marker code
        while pos < n and buf[pos] == 0xFF:
            pos += 1
        if pos >= n:
            break
        code = buf[pos]
        pos += 1
        if code in _STANDALONE:
            continue
        if pos + 2 > n:
            break
        (seg_len,) = struct.unpack(">H", buf[pos : pos + 2])
        if seg_len < 2 or pos + seg_len > n:
            raise ValueError("corrupt JPEG: segment overruns buffer")
        if code in _SOF:
            # payload: precision(1) height(2) width(2) n_components(1)
            depth, h, w, comps = struct.unpack(
                ">BHHB", buf[pos + 2 : pos + 8]
            )
            if w == 0 or h == 0:
                # h == 0 is legal pre-DNL; out of scope, fail loudly
                raise ValueError("JPEG with deferred (DNL) height unsupported")
            return w, h, comps, depth
        if code == 0xDA:  # SOS before any SOF: no frame header to find
            raise ValueError("corrupt JPEG: scan data before frame header")
        pos += seg_len
    raise ValueError("truncated JPEG: no frame header found")


# ---------------------------------------------------------------------------
# Baseline pixel codec (T.81 sequential DCT, Huffman entropy coding)
# ---------------------------------------------------------------------------

# zigzag position i -> natural (row-major) index, T.81 Figure 5
ZIGZAG = np.array([
    0, 1, 8, 16, 9, 2, 3, 10,
    17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34,
    27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36,
    29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46,
    53, 60, 61, 54, 47, 55, 62, 63,
], dtype=np.int64)

# Annex K.1/K.2 example quantization tables (natural order)
_QT_LUMA = np.array([
    16, 11, 10, 16, 24, 40, 51, 61,
    12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56,
    14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77,
    24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101,
    72, 92, 95, 98, 112, 100, 103, 99,
], dtype=np.int64)
_QT_CHROMA = np.array([
    17, 18, 24, 47, 99, 99, 99, 99,
    18, 21, 26, 66, 99, 99, 99, 99,
    24, 26, 56, 99, 99, 99, 99, 99,
    47, 66, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
], dtype=np.int64)

# Annex K.3 typical Huffman tables: (bits[16], values)
_DC_LUMA = ([0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0], list(range(12)))
_DC_CHROMA = ([0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0], list(range(12)))
_AC_LUMA = (
    [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D],
    [
        0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12,
        0x21, 0x31, 0x41, 0x06, 0x13, 0x51, 0x61, 0x07,
        0x22, 0x71, 0x14, 0x32, 0x81, 0x91, 0xA1, 0x08,
        0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0,
        0x24, 0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16,
        0x17, 0x18, 0x19, 0x1A, 0x25, 0x26, 0x27, 0x28,
        0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38, 0x39,
        0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49,
        0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59,
        0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69,
        0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
        0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89,
        0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98,
        0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5, 0xA6, 0xA7,
        0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6,
        0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5,
        0xC6, 0xC7, 0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4,
        0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1, 0xE2,
        0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA,
        0xF1, 0xF2, 0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8,
        0xF9, 0xFA,
    ],
)
_AC_CHROMA = (
    [0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77],
    [
        0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21,
        0x31, 0x06, 0x12, 0x41, 0x51, 0x07, 0x61, 0x71,
        0x13, 0x22, 0x32, 0x81, 0x08, 0x14, 0x42, 0x91,
        0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0,
        0x15, 0x62, 0x72, 0xD1, 0x0A, 0x16, 0x24, 0x34,
        0xE1, 0x25, 0xF1, 0x17, 0x18, 0x19, 0x1A, 0x26,
        0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37, 0x38,
        0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48,
        0x49, 0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58,
        0x59, 0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68,
        0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78,
        0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87,
        0x88, 0x89, 0x8A, 0x92, 0x93, 0x94, 0x95, 0x96,
        0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5,
        0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4,
        0xB5, 0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3,
        0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9, 0xCA, 0xD2,
        0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA,
        0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9,
        0xEA, 0xF2, 0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8,
        0xF9, 0xFA,
    ],
)


def _dct_matrix() -> np.ndarray:
    """8x8 orthonormal DCT-II matrix C: forward F = C @ f @ C.T."""
    x = np.arange(8)
    c = np.cos((2 * x[None, :] + 1) * x[:, None] * np.pi / 16)
    c[0] *= np.sqrt(0.5)
    return c * 0.5


_DCT = _dct_matrix()


def _canonical_codes(bits: list[int], values: list[int]) -> dict[int, tuple[int, int]]:
    """T.81 C.2 canonical code assignment: symbol -> (code, length)."""
    out, code = {}, 0
    i = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            out[values[i]] = (code, length)
            code += 1
            i += 1
        code <<= 1
    return out


def _decode_table(bits: list[int], values: list[int]) -> tuple[np.ndarray, np.ndarray]:
    """Flat 16-bit-prefix lookup: peek16 -> (symbol, code length)."""
    sym = np.zeros(1 << 16, dtype=np.int16)
    ln = np.zeros(1 << 16, dtype=np.int8)
    for v, (code, length) in _canonical_codes(bits, values).items():
        lo = code << (16 - length)
        hi = (code + 1) << (16 - length)
        sym[lo:hi] = v
        ln[lo:hi] = length
    return sym, ln


class _BitReader:
    """MSB-first bit reader over an unstuffed entropy segment."""

    __slots__ = ("acc", "bits", "d", "n", "pos")

    def __init__(self, d: bytes) -> None:
        self.d, self.n, self.pos, self.acc, self.bits = d, len(d), 0, 0, 0

    def _fill(self, need: int) -> None:
        while self.bits < need:
            b = self.d[self.pos] if self.pos < self.n else 0
            self.pos += 1
            self.acc = (self.acc << 8) | b
            self.bits += 8

    def peek16(self) -> int:
        self._fill(16)
        return (self.acc >> (self.bits - 16)) & 0xFFFF

    def skip(self, k: int) -> None:
        self.bits -= k
        self.acc &= (1 << self.bits) - 1

    def get(self, k: int) -> int:
        if k == 0:
            return 0
        self._fill(k)
        v = (self.acc >> (self.bits - k)) & ((1 << k) - 1)
        self.skip(k)
        return v

    def overrun(self) -> bool:
        # reads past the segment return zero padding; more than 2 bytes
        # of it means the entropy stream ended mid-MCU
        return self.pos > self.n + 2


class _BitWriter:
    """MSB-first bit writer with T.81 byte stuffing (0xFF -> 0xFF00)."""

    __slots__ = ("acc", "bits", "out")

    def __init__(self) -> None:
        self.out, self.acc, self.bits = bytearray(), 0, 0

    def put(self, val: int, n: int) -> None:
        if n == 0:
            return
        self.acc = (self.acc << n) | (val & ((1 << n) - 1))
        self.bits += n
        while self.bits >= 8:
            b = (self.acc >> (self.bits - 8)) & 0xFF
            self.out.append(b)
            if b == 0xFF:
                self.out.append(0x00)
            self.bits -= 8
            self.acc &= (1 << self.bits) - 1

    def flush(self) -> None:
        if self.bits:
            pad = 8 - self.bits
            self.put((1 << pad) - 1, pad)


def _extend(v: int, s: int) -> int:
    """T.81 F.12: map s received bits to the signed coefficient value."""
    return v - (1 << s) + 1 if v < (1 << (s - 1)) else v


def _huff_decode(br: _BitReader, tbl: tuple[np.ndarray, np.ndarray]) -> int:
    sym, ln = tbl
    idx = br.peek16()
    length = int(ln[idx])
    if length == 0:
        raise ValueError("corrupt JPEG: invalid Huffman code")
    br.skip(length)
    return int(sym[idx])


def _decode_block(
    br: _BitReader,
    dc_tbl: tuple[np.ndarray, np.ndarray],
    ac_tbl: tuple[np.ndarray, np.ndarray],
    pred: int,
    out: np.ndarray,
) -> int:
    """One 8x8 block into `out` (64 zigzag-order coefficients); returns
    the new DC predictor."""
    s = _huff_decode(br, dc_tbl)
    dc = pred + (_extend(br.get(s), s) if s else 0)
    out[0] = dc
    k = 1
    while k < 64:
        rs = _huff_decode(br, ac_tbl)
        r, s = rs >> 4, rs & 0x0F
        if s == 0:
            if r == 15:  # ZRL: 16 zeros
                k += 16
                continue
            break  # EOB
        k += r
        if k > 63:
            raise ValueError("corrupt JPEG: AC run past block end")
        out[k] = _extend(br.get(s), s)
        k += 1
    return dc


def _split_scan(buf: bytes, pos: int) -> tuple[list[bytes], int]:
    """Unstuff the entropy-coded data starting at `pos`, splitting at
    restart markers. Returns (segments, position of the terminating
    marker's 0xFF)."""
    segs, cur = [], bytearray()
    n = len(buf)
    i = pos
    while i < n:
        b = buf[i]
        if b != 0xFF:
            cur.append(b)
            i += 1
            continue
        if i + 1 >= n:
            break
        nb = buf[i + 1]
        if nb == 0x00:  # stuffed data byte
            cur.append(0xFF)
            i += 2
        elif nb == 0xFF:  # fill byte
            i += 1
        elif 0xD0 <= nb <= 0xD7:  # RSTn: new entropy segment
            segs.append(bytes(cur))
            cur = bytearray()
            i += 2
        else:  # real marker terminates the scan
            break
    segs.append(bytes(cur))
    return segs, i


def decode_pixels(buf: bytes) -> np.ndarray:
    """JPEG -> uint8 pixels, (H, W) grayscale or (H, W, 3) RGB.

    Supports sequential (SOF0/SOF1) AND progressive (SOF2) Huffman
    streams with any 1..4 components, sampling factors whose max is an
    integer multiple of each component's (4:4:4, 4:2:0, 4:2:2, ...),
    multiple DQT/DHT segments (including between progressive scans),
    DRI restart intervals, spectral selection, and successive
    approximation. Arithmetic-coded and lossless streams raise
    NotImplementedError (their metadata still parses via parse_sof).
    """
    buf = bytes(buf)
    if not is_jpeg(buf):
        raise ValueError("not a JPEG (no SOI marker)")
    qt: dict[int, np.ndarray] = {}
    huff: dict[tuple[int, int], tuple[np.ndarray, np.ndarray]] = {}
    frame = None
    grids = None
    restart = 0
    pos, n = 2, len(buf)
    while pos + 2 <= n:
        if buf[pos] != 0xFF:
            raise ValueError(f"corrupt JPEG: expected marker at byte {pos}")
        while pos < n and buf[pos] == 0xFF:
            pos += 1
        if pos >= n:
            break
        code = buf[pos]
        pos += 1
        if code == 0xD9:  # EOI: ignore anything after (trailing junk)
            break
        if code in _STANDALONE:
            continue
        if pos + 2 > n:
            break
        (seg_len,) = struct.unpack(">H", buf[pos : pos + 2])
        if seg_len < 2 or pos + seg_len > n:
            raise ValueError("corrupt JPEG: segment overruns buffer")
        body = buf[pos + 2 : pos + seg_len]
        if code == 0xDB:  # DQT: one or more tables per segment
            j = 0
            while j < len(body):
                pq, tq = body[j] >> 4, body[j] & 0x0F
                if pq != 0:
                    raise NotImplementedError("16-bit quant tables unsupported")
                qt[tq] = np.frombuffer(
                    body[j + 1 : j + 65], dtype=np.uint8
                ).astype(np.int64)
                j += 65
        elif code == 0xC4:  # DHT: one or more tables per segment
            j = 0
            while j < len(body):
                tc, th = body[j] >> 4, body[j] & 0x0F
                bits = list(body[j + 1 : j + 17])
                nv = sum(bits)
                values = list(body[j + 17 : j + 17 + nv])
                huff[(tc, th)] = _decode_table(bits, values)
                j += 17 + nv
        elif code in _SOF:
            if code not in (0xC0, 0xC1, 0xC2):
                raise NotImplementedError(
                    "only Huffman sequential/progressive JPEG pixel decode "
                    "is supported (arithmetic/lossless: metadata only — "
                    "install PIL for pixels)"
                )
            depth, h, w, ncomp = struct.unpack(">BHHB", body[:6])
            if depth != 8:
                raise NotImplementedError("only 8-bit JPEG supported")
            if h == 0:
                raise ValueError("JPEG with deferred (DNL) height unsupported")
            comps = []
            for c in range(ncomp):
                cid, hv, tq = body[6 + 3 * c : 9 + 3 * c]
                comps.append({"id": cid, "h": hv >> 4, "v": hv & 0x0F, "tq": tq})
            frame = {"w": w, "h": h, "comps": comps, "progressive": code == 0xC2}
        elif code == 0xDD:  # DRI
            (restart,) = struct.unpack(">H", body[:2])
        elif code == 0xDA:  # SOS
            if frame is None:
                raise ValueError("corrupt JPEG: scan data before frame header")
            ns = body[0]
            sel = {}
            scomps = []
            for c in range(ns):
                cs, tt = body[1 + 2 * c : 3 + 2 * c]
                sel[cs] = (tt >> 4, tt & 0x0F)
                scomps.append(cs)
            segs, endpos = _split_scan(buf, pos + seg_len)
            if grids is None:
                grids = _alloc_grids(frame)
            if not frame["progressive"]:
                # sequential scans may be interleaved (one SOS, all
                # components) or per-component (several SOS) — decode
                # each into the persistent grids and keep walking
                _decode_scan(frame, huff, sel, scomps, restart, segs, grids)
            else:
                ss, se = body[1 + 2 * ns], body[2 + 2 * ns]
                ahal = body[3 + 2 * ns]
                _progressive_scan(
                    frame, huff, sel, scomps, restart, segs, grids,
                    ss, se, ahal >> 4, ahal & 0x0F,
                )
            pos = endpos
            continue
        pos += seg_len
    if frame is not None and grids is not None:
        return _reconstruct(frame, qt, grids)
    raise ValueError("truncated JPEG: no scan found")


def _geometry(frame: dict) -> tuple[int, int, int, int]:
    """(hmax, vmax, mcus_x, mcus_y), validating sampling factors."""
    w, h, comps = frame["w"], frame["h"], frame["comps"]
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    for c in comps:
        if c["h"] < 1 or c["v"] < 1 or hmax % c["h"] or vmax % c["v"]:
            raise NotImplementedError(
                f"unsupported sampling {c['h']}x{c['v']} vs max {hmax}x{vmax}"
            )
    return hmax, vmax, -(-w // (8 * hmax)), -(-h // (8 * vmax))


def _alloc_grids(frame: dict) -> list[np.ndarray]:
    """Per-component zigzag-order coefficient grids, MCU-padded."""
    _hmax, _vmax, mcus_x, mcus_y = _geometry(frame)
    return [
        np.zeros((mcus_y * c["v"], mcus_x * c["h"], 64), dtype=np.int32)
        for c in frame["comps"]
    ]


def _scan_tables(
    huff: dict,
    sel: dict[int, tuple[int, int]],
    comps: list[dict],
    need_dc: bool = True,
    need_ac: bool = True,
):
    tables = []
    for c in comps:
        dc_id, ac_id = sel[c["id"]]
        try:
            tables.append(
                (
                    huff[(0, dc_id)] if need_dc else None,
                    huff[(1, ac_id)] if need_ac else None,
                )
            )
        except KeyError as exc:
            raise ValueError("corrupt JPEG: missing Huffman table") from exc
    return tables


def _decode_scan(
    frame: dict,
    huff: dict[tuple[int, int], tuple[np.ndarray, np.ndarray]],
    sel: dict[int, tuple[int, int]],
    scomps: list[int],
    restart: int,
    segs: list[bytes],
    grids: list[np.ndarray],
) -> None:
    """One sequential scan (full DC+AC entropy decode) into the
    persistent grids. Ns > 1 scans walk MCUs interleaved; Ns == 1 scans
    walk the component's own block grid (libjpeg emits valid baseline
    files as one scan per component in non-interleaved mode)."""
    comps = frame["comps"]
    by_id = {c["id"]: ci for ci, c in enumerate(comps)}
    try:
        members = [(by_id[cid], comps[by_id[cid]]) for cid in scomps]
    except KeyError as exc:
        raise ValueError("corrupt JPEG: scan names unknown component") from exc
    _hmax, _vmax, mcus_x, mcus_y = _geometry(frame)
    interleaved = len(members) > 1
    if interleaved:
        n_units = mcus_x * mcus_y
        grid_w = 0
    else:
        bh, grid_w = _noninterleaved_grid(frame, members[0][1])
        n_units = bh * grid_w
    tables = _scan_tables(huff, sel, [c for _, c in members])

    per_seg = restart if restart else n_units
    expect_segs = -(-n_units // per_seg)
    if len(segs) < expect_segs:
        raise ValueError("truncated JPEG: missing restart segments")
    unit = 0
    for seg_i in range(expect_segs):
        br = _BitReader(segs[seg_i])
        preds = [0] * len(members)
        for _ in range(min(per_seg, n_units - unit)):
            if interleaved:
                my, mx = divmod(unit, mcus_x)
                for mi, (ci, c) in enumerate(members):
                    for by in range(c["v"]):
                        for bx in range(c["h"]):
                            preds[mi] = _decode_block(
                                br,
                                tables[mi][0],
                                tables[mi][1],
                                preds[mi],
                                grids[ci][my * c["v"] + by, mx * c["h"] + bx],
                            )
            else:
                ci, _c = members[0]
                uy, ux = divmod(unit, grid_w)
                preds[0] = _decode_block(
                    br, tables[0][0], tables[0][1], preds[0], grids[ci][uy, ux]
                )
            unit += 1
            if br.overrun():
                raise ValueError("truncated JPEG: entropy stream ended early")


def _reconstruct(
    frame: dict, qt: dict[int, np.ndarray], grids: list[np.ndarray]
) -> np.ndarray:
    """Coefficient grids -> pixels: dequantize, IDCT, upsample, color."""
    w, h, comps = frame["w"], frame["h"], frame["comps"]
    hmax, vmax, _mx, _my = _geometry(frame)
    planes = []
    for ci, c in enumerate(comps):
        q = qt.get(c["tq"])
        if q is None:
            raise ValueError("corrupt JPEG: missing quant table")
        gh, gw, _ = grids[ci].shape
        deq = grids[ci].reshape(-1, 64).astype(np.float64) * q[None, :]
        nat = np.empty_like(deq)
        nat[:, ZIGZAG] = deq  # zigzag -> natural order
        blocks = nat.reshape(-1, 8, 8)
        pix = _DCT.T @ blocks @ _DCT + 128.0  # vectorized IDCT + level shift
        plane = (
            pix.reshape(gh, gw, 8, 8)
            .transpose(0, 2, 1, 3)
            .reshape(gh * 8, gw * 8)
        )
        # crop to this component's true size, then upsample to full res
        cw = -(-w * c["h"] // hmax)
        ch = -(-h * c["v"] // vmax)
        plane = plane[:ch, :cw]
        plane = np.repeat(plane, vmax // c["v"], axis=0)
        plane = np.repeat(plane, hmax // c["h"], axis=1)
        planes.append(plane[:h, :w])

    if len(planes) == 1:
        return np.clip(np.round(planes[0]), 0, 255).astype(np.uint8)
    if len(planes) != 3:
        raise NotImplementedError(f"{len(planes)}-component JPEG unsupported")
    y, cb, cr = planes[0], planes[1] - 128.0, planes[2] - 128.0
    rgb = np.stack(
        [
            y + 1.402 * cr,
            y - 0.344136 * cb - 0.714136 * cr,
            y + 1.772 * cb,
        ],
        axis=-1,
    )
    return np.clip(np.round(rgb), 0, 255).astype(np.uint8)


def _dc_progressive(
    br: _BitReader,
    dc_tbl,
    coef: np.ndarray,
    ah: int,
    al: int,
    pred: int,
) -> int:
    """DC scan contribution for one block (T.81 G.1.2.1). First pass
    (Ah=0) decodes the arithmetic-shifted diff chain; refinement passes
    append one magnitude bit (two's-complement OR, like the baseline
    codecs do in C ints)."""
    if ah == 0:
        s = _huff_decode(br, dc_tbl)
        pred += _extend(br.get(s), s) if s else 0
        coef[0] = pred << al
        return pred
    if br.get(1):
        coef[0] |= 1 << al
    return pred


def _ac_first(
    br: _BitReader, ac_tbl, coef: np.ndarray, ss: int, se: int, al: int, eobrun: int
) -> int:
    """First AC pass over one block's band (T.81 G.1.2.2): run-length +
    EOBn band-end runs; new coefficients arrive shifted by Al."""
    if eobrun > 0:
        return eobrun - 1
    k = ss
    while k <= se:
        rs = _huff_decode(br, ac_tbl)
        r, s = rs >> 4, rs & 0x0F
        if s == 0:
            if r < 15:  # EOBn: run of (1<<r)-1+bits MORE all-done blocks
                eobrun = (1 << r) - 1
                if r:
                    eobrun += br.get(r)
                return eobrun
            k += 16  # ZRL
            continue
        k += r
        if k > se:
            raise ValueError("corrupt JPEG: AC run past band end")
        coef[k] = _extend(br.get(s), s) << al
        k += 1
    return 0


def _ac_refine(
    br: _BitReader, ac_tbl, coef: np.ndarray, ss: int, se: int, al: int, eobrun: int
) -> int:
    """AC refinement pass over one block's band (T.81 G.1.2.3):
    newly-significant coefficients arrive as ±1<<Al; every
    already-nonzero coefficient passed reads one correction bit."""
    p1 = 1 << al
    k = ss
    if eobrun == 0:
        while k <= se:
            rs = _huff_decode(br, ac_tbl)
            r, s = rs >> 4, rs & 0x0F
            val = 0
            if s == 0:
                if r < 15:  # EOBn, current block included in the count
                    eobrun = 1 << r
                    if r:
                        eobrun += br.get(r)
                    break
                # ZRL: r stays 15 → skip 16 zero-history positions
            else:
                if s != 1:
                    raise ValueError("corrupt JPEG: bad AC refinement symbol")
                val = p1 if br.get(1) else -p1
            while k <= se:
                c = int(coef[k])
                if c != 0:
                    if br.get(1) and (abs(c) & p1) == 0:
                        coef[k] = c + (p1 if c > 0 else -p1)
                else:
                    if r == 0:
                        break
                    r -= 1
                k += 1
            if val and k <= se:
                coef[k] = val
            k += 1
    if eobrun > 0:
        while k <= se:  # band remainder: correction bits only
            c = int(coef[k])
            if c != 0:
                if br.get(1) and (abs(c) & p1) == 0:
                    coef[k] = c + (p1 if c > 0 else -p1)
            k += 1
        eobrun -= 1
    return eobrun


def _noninterleaved_grid(frame: dict, c: dict) -> tuple[int, int]:
    """Block-grid dims of a single-component (non-interleaved) scan."""
    hmax, vmax, _mx, _my = _geometry(frame)
    cw = -(-frame["w"] * c["h"] // hmax)
    ch = -(-frame["h"] * c["v"] // vmax)
    return -(-ch // 8), -(-cw // 8)


def _progressive_scan(
    frame: dict,
    huff: dict,
    sel: dict[int, tuple[int, int]],
    scomps: list[int],
    restart: int,
    segs: list[bytes],
    grids: list[np.ndarray],
    ss: int,
    se: int,
    ah: int,
    al: int,
) -> None:
    """One SOF2 scan applied onto the persistent coefficient grids."""
    comps = frame["comps"]
    by_id = {c["id"]: ci for ci, c in enumerate(comps)}
    try:
        members = [(by_id[cid], comps[by_id[cid]]) for cid in scomps]
    except KeyError as exc:
        raise ValueError("corrupt JPEG: scan names unknown component") from exc
    if ss == 0 and se != 0:
        raise ValueError("corrupt JPEG: DC scan with nonzero Se")
    if ss > 0 and len(members) != 1:
        raise ValueError("corrupt JPEG: AC scans must be non-interleaved")
    _hmax, _vmax, mcus_x, mcus_y = _geometry(frame)
    interleaved = len(members) > 1
    if interleaved:
        n_units = mcus_x * mcus_y
        bh = bw = 0
    else:
        bh, bw = _noninterleaved_grid(frame, members[0][1])
        n_units = bw * bh
    tables = _scan_tables(
        huff,
        sel,
        [c for _, c in members],
        need_dc=(ss == 0 and ah == 0),
        need_ac=(ss > 0),
    )
    per_seg = restart if restart else n_units
    expect_segs = -(-n_units // per_seg)
    if len(segs) < expect_segs:
        raise ValueError("truncated JPEG: missing restart segments")
    unit = 0
    for seg_i in range(expect_segs):
        br = _BitReader(segs[seg_i])
        preds = [0] * len(members)
        eobrun = 0
        for _ in range(min(per_seg, n_units - unit)):
            if interleaved:  # DC scan over MCUs
                my, mx = divmod(unit, mcus_x)
                for mi, (ci, c) in enumerate(members):
                    for by in range(c["v"]):
                        for bx in range(c["h"]):
                            preds[mi] = _dc_progressive(
                                br,
                                tables[mi][0],
                                grids[ci][my * c["v"] + by, mx * c["h"] + bx],
                                ah,
                                al,
                                preds[mi],
                            )
            else:
                ci, _c = members[0]
                uy, ux = divmod(unit, bw)
                coef = grids[ci][uy, ux]
                if ss == 0:
                    preds[0] = _dc_progressive(
                        br, tables[0][0], coef, ah, al, preds[0]
                    )
                elif ah == 0:
                    eobrun = _ac_first(
                        br, tables[0][1], coef, ss, se, al, eobrun
                    )
                else:
                    eobrun = _ac_refine(
                        br, tables[0][1], coef, ss, se, al, eobrun
                    )
            unit += 1
            if br.overrun():
                raise ValueError("truncated JPEG: entropy stream ended early")


def _scale_qt(base: np.ndarray, quality: int) -> np.ndarray:
    """Classic libjpeg quality scaling of an Annex K table."""
    quality = min(100, max(1, quality))
    scale = 5000 // quality if quality < 50 else 200 - 2 * quality
    return np.clip((base * scale + 50) // 100, 1, 255)


def _fdct_quant(plane: np.ndarray, q: np.ndarray) -> np.ndarray:
    """Plane (multiple-of-8 dims) -> (bh*bw, 64) zigzag-order quantized
    coefficients, numpy-vectorized over all blocks."""
    ph, pw = plane.shape
    blocks = (
        plane.reshape(ph // 8, 8, pw // 8, 8)
        .transpose(0, 2, 1, 3)
        .reshape(-1, 8, 8)
        .astype(np.float64)
        - 128.0
    )
    coefs = _DCT @ blocks @ _DCT.T
    qc = np.round(coefs.reshape(-1, 64) / q[None, :]).astype(np.int32)
    return qc[:, ZIGZAG]  # natural -> zigzag order


def _encode_block(
    bw: _BitWriter,
    zz: np.ndarray,
    pred: int,
    dc_codes: dict[int, tuple[int, int]],
    ac_codes: dict[int, tuple[int, int]],
) -> int:
    diff = int(zz[0]) - pred
    s = abs(diff).bit_length()
    code, length = dc_codes[s]
    bw.put(code, length)
    if s:
        bw.put(diff if diff >= 0 else diff + (1 << s) - 1, s)
    run = 0
    nz = np.nonzero(zz[1:])[0]
    last = int(nz[-1]) + 1 if len(nz) else 0
    for k in range(1, last + 1):
        v = int(zz[k])
        if v == 0:
            run += 1
            continue
        while run > 15:
            code, length = ac_codes[0xF0]  # ZRL
            bw.put(code, length)
            run -= 16
        s = abs(v).bit_length()
        code, length = ac_codes[(run << 4) | s]
        bw.put(code, length)
        bw.put(v if v >= 0 else v + (1 << s) - 1, s)
        run = 0
    if last < 63:
        code, length = ac_codes[0x00]  # EOB
        bw.put(code, length)
    return int(zz[0])


def _pad_edge(plane: np.ndarray, mult: int) -> np.ndarray:
    ph = -(-plane.shape[0] // mult) * mult
    pw = -(-plane.shape[1] // mult) * mult
    return np.pad(
        plane,
        ((0, ph - plane.shape[0]), (0, pw - plane.shape[1])),
        mode="edge",
    )


def _prep_frame(img: np.ndarray, quality: int, subsample: bool):
    """Pixels -> quantized zigzag coefficient grids (shared by the
    sequential and progressive encoders). Returns (gray, h, w, comps,
    coefs, mcus_x, mcus_y, q_luma, q_chroma)."""
    img = np.asarray(img, dtype=np.uint8)
    gray = img.ndim == 2
    if not gray and (img.ndim != 3 or img.shape[2] != 3):
        raise ValueError("expected (H, W) grayscale or (H, W, 3) RGB")
    h, w = img.shape[:2]
    if h == 0 or w == 0:
        raise ValueError("empty image")

    q_luma = _scale_qt(_QT_LUMA, quality)
    q_chroma = _scale_qt(_QT_CHROMA, quality)
    if gray:
        comps = [{"id": 1, "h": 1, "v": 1, "tq": 0}]
        hmax = vmax = 1
        r = img.astype(np.float64)
        planes = [r]
    else:
        r, g, b = (img[..., i].astype(np.float64) for i in range(3))
        y = 0.299 * r + 0.587 * g + 0.114 * b
        cb = 128.0 - 0.168736 * r - 0.331264 * g + 0.5 * b
        cr = 128.0 + 0.5 * r - 0.418688 * g - 0.081312 * b
        # subsample: True -> 4:2:0, False -> 4:4:4, or an explicit
        # (sh, sv) luma sampling pair — (2, 1) is 4:2:2, (4, 1) is 4:1:1
        if subsample is True:
            sh, sv = 2, 2
        elif subsample is False:
            sh, sv = 1, 1
        else:
            sh, sv = subsample
            if not (1 <= sh <= 4 and 1 <= sv <= 4):
                raise ValueError(f"bad sampling {subsample}")
        hmax, vmax = sh, sv
        comps = [
            {"id": 1, "h": sh, "v": sv, "tq": 0},
            {"id": 2, "h": 1, "v": 1, "tq": 1},
            {"id": 3, "h": 1, "v": 1, "tq": 1},
        ]
        sub = []
        for p in (cb, cr):
            if (sh, sv) == (1, 1):
                sub.append(p)
                continue
            p = _pad_edge(p, max(sh, sv))  # even multiple for the fold
            ph, pw = p.shape[0] // sv * sv, p.shape[1] // sh * sh
            sub.append(
                p[:ph, :pw].reshape(ph // sv, sv, pw // sh, sh).mean(axis=(1, 3))
            )
        planes = [y, *sub]

    mcus_x = -(-w // (8 * hmax))
    mcus_y = -(-h // (8 * vmax))
    # per component: pad to its MCU-aligned block grid and transform
    coefs, grid_w = [], []
    for c, p in zip(comps, planes):
        bw_c, bh_c = mcus_x * c["h"], mcus_y * c["v"]
        p = _pad_edge(p, 8)
        p = np.pad(
            p,
            ((0, bh_c * 8 - p.shape[0]), (0, bw_c * 8 - p.shape[1])),
            mode="edge",
        )
        q = q_luma if c["tq"] == 0 else q_chroma
        coefs.append(_fdct_quant(p, q).reshape(bh_c, bw_c, 64))
        grid_w.append(bw_c)
    return gray, h, w, comps, coefs, mcus_x, mcus_y, q_luma, q_chroma


def _seg(code: int, payload: bytes) -> bytes:
    return bytes([0xFF, code]) + struct.pack(">H", len(payload) + 2) + payload


def _frame_headers(
    gray: bool,
    h: int,
    w: int,
    comps: list[dict],
    q_luma: np.ndarray,
    q_chroma: np.ndarray,
    sof_code: int,
    restart_interval: int,
) -> bytearray:
    out = bytearray(SOI)
    out += _seg(0xE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00")
    out += _seg(0xDB, b"\x00" + bytes(q_luma[ZIGZAG].astype(np.uint8)))
    if not gray:
        out += _seg(0xDB, b"\x01" + bytes(q_chroma[ZIGZAG].astype(np.uint8)))
    sof = struct.pack(">BHHB", 8, h, w, len(comps))
    for c in comps:
        sof += bytes([c["id"], (c["h"] << 4) | c["v"], c["tq"]])
    out += _seg(sof_code, sof)
    if restart_interval:
        out += _seg(0xDD, struct.pack(">H", restart_interval))
    return out


def encode_baseline(
    img: np.ndarray,
    quality: int = 85,
    subsample: bool = True,
    restart_interval: int = 0,
    interleave: bool = True,
) -> bytes:
    """uint8 pixels -> baseline JFIF JPEG bytes.

    img: (H, W) grayscale or (H, W, 3) RGB. Annex K quant (quality-
    scaled) + typical Huffman tables; color uses 4:2:0 subsampling when
    `subsample` is True (box average), 4:4:4 when False, or an explicit
    (sh, sv) luma sampling pair — (2, 1) = 4:2:2, (4, 1) = 4:1:1.
    restart_interval > 0 emits DRI + RSTn markers every that many MCUs.
    interleave=False writes libjpeg-style non-interleaved output: one
    SOS per component walking that component's own block grid.
    """
    gray, h, w, comps, coefs, mcus_x, mcus_y, q_luma, q_chroma = _prep_frame(
        img, quality, subsample
    )
    frame = {"w": w, "h": h, "comps": comps}
    dc_tbls = [_DC_LUMA, _DC_CHROMA]
    ac_tbls = [_AC_LUMA, _AC_CHROMA]
    dc_codes = [_canonical_codes(*t) for t in dc_tbls]
    ac_codes = [_canonical_codes(*t) for t in ac_tbls]

    out = _frame_headers(
        gray, h, w, comps, q_luma, q_chroma, 0xC0, restart_interval
    )
    used = [0] if gray else [0, 1]
    for t in used:
        bits, values = dc_tbls[t]
        out += _seg(0xC4, bytes([t]) + bytes(bits) + bytes(values))
        bits, values = ac_tbls[t]
        out += _seg(0xC4, bytes([0x10 | t]) + bytes(bits) + bytes(values))

    def sos_header(members: list[dict]) -> bytes:
        sos = bytes([len(members)])
        for c in members:
            t = 0 if c["tq"] == 0 else 1
            sos += bytes([c["id"], (t << 4) | t])
        return _seg(0xDA, sos + b"\x00\x3f\x00")

    def run_scan(members_idx: list[int]) -> bytes:
        writer = _BitWriter()
        members = [(ci, comps[ci]) for ci in members_idx]
        if len(members) > 1:
            n_units = mcus_x * mcus_y
            grid_w = 0
        else:
            bh, grid_w = _noninterleaved_grid(frame, members[0][1])
            n_units = bh * grid_w
        preds = [0] * len(members)
        rst = 0
        for unit in range(n_units):
            if restart_interval and unit and unit % restart_interval == 0:
                writer.flush()
                writer.out += bytes([0xFF, 0xD0 + rst])
                rst = (rst + 1) & 7
                preds = [0] * len(members)
            if len(members) > 1:
                my, mx = divmod(unit, mcus_x)
                for mi, (ci, c) in enumerate(members):
                    t = 0 if c["tq"] == 0 else 1
                    for by in range(c["v"]):
                        for bx in range(c["h"]):
                            preds[mi] = _encode_block(
                                writer,
                                coefs[ci][my * c["v"] + by, mx * c["h"] + bx],
                                preds[mi],
                                dc_codes[t],
                                ac_codes[t],
                            )
            else:
                ci, c = members[0]
                t = 0 if c["tq"] == 0 else 1
                uy, ux = divmod(unit, grid_w)
                preds[0] = _encode_block(
                    writer, coefs[ci][uy, ux], preds[0], dc_codes[t], ac_codes[t]
                )
        writer.flush()
        return bytes(writer.out)

    if interleave:
        out += sos_header(comps)
        out += run_scan(list(range(len(comps))))
    else:
        for ci, c in enumerate(comps):
            out += sos_header([c])
            out += run_scan([ci])
    out += b"\xff\xd9"
    return bytes(out)


# AC Huffman table for progressive scans: every symbol representable —
# the Annex K tables omit the EOBn codes (0x10..0xE0) that band-end
# runs need. 252 symbols at 8 bits + 4 at 9 bits satisfies Kraft with
# slack (no all-ones max-length code), at a small size cost.
_AC_FLAT = (
    [0, 0, 0, 0, 0, 0, 0, 252, 4, 0, 0, 0, 0, 0, 0, 0],
    list(range(256)),
)


def _flush_eobrun(
    wtr: _BitWriter, ac_codes: dict, eobrun: int, pending: list[int]
) -> int:
    """Emit the accumulated EOBn run plus the correction bits buffered
    for the blocks it covers."""
    if eobrun > 0:
        nbits = eobrun.bit_length() - 1
        code, ln = ac_codes[nbits << 4]
        wtr.put(code, ln)
        if nbits:
            wtr.put(eobrun - (1 << nbits), nbits)
        for b in pending:
            wtr.put(b, 1)
        pending.clear()
    elif pending:
        raise AssertionError("correction bits buffered without an EOB run")
    return 0


def _enc_ac_first(
    wtr: _BitWriter,
    ac_codes: dict,
    zz: np.ndarray,
    ss: int,
    se: int,
    al: int,
    eobrun: int,
    pending: list[int],
) -> int:
    """First AC pass for one block (T.81 G.1.2.2 encoder side): point
    transform truncates magnitudes toward zero; all-done blocks join
    the cross-block EOBn run."""
    vals = []
    for k in range(ss, se + 1):
        v = int(zz[k])
        vals.append(-((-v) >> al) if v < 0 else v >> al)
    nz = [i for i, v in enumerate(vals) if v]
    if not nz:
        eobrun += 1
        return _flush_eobrun(wtr, ac_codes, eobrun, pending) if eobrun == 0x7FFF else eobrun
    eobrun = _flush_eobrun(wtr, ac_codes, eobrun, pending)
    run = 0
    for i in range(nz[-1] + 1):
        v = vals[i]
        if v == 0:
            run += 1
            continue
        while run > 15:
            code, ln = ac_codes[0xF0]
            wtr.put(code, ln)
            run -= 16
        s = abs(v).bit_length()
        code, ln = ac_codes[(run << 4) | s]
        wtr.put(code, ln)
        wtr.put(v if v >= 0 else v + (1 << s) - 1, s)
        run = 0
    if nz[-1] < se - ss:
        eobrun += 1
        if eobrun == 0x7FFF:
            eobrun = _flush_eobrun(wtr, ac_codes, eobrun, pending)
    return eobrun


def _enc_ac_refine(
    wtr: _BitWriter,
    ac_codes: dict,
    zz: np.ndarray,
    ss: int,
    se: int,
    al: int,
    eobrun: int,
    pending: list[int],
) -> int:
    """AC refinement pass for one block (T.81 G.1.2.3 encoder side):
    newly-significant coefficients (magnitude bit Al is their MSB) get
    (run, 1) symbols + sign; already-significant ones ride along as
    buffered correction bits after the next emitted symbol or EOB run."""
    absv = [abs(int(zz[k])) >> al for k in range(ss, se + 1)]
    eob_idx = -1  # index of last newly-significant coefficient
    for i, t in enumerate(absv):
        if t == 1:
            eob_idx = i
    run = 0
    bits: list[int] = []
    for i, t in enumerate(absv):
        if t == 0:
            run += 1
            continue
        while run > 15 and i <= eob_idx:
            eobrun = _flush_eobrun(wtr, ac_codes, eobrun, pending)
            code, ln = ac_codes[0xF0]
            wtr.put(code, ln)
            run -= 16
            for b in bits:
                wtr.put(b, 1)
            bits = []
        if t > 1:
            bits.append(t & 1)
            continue
        eobrun = _flush_eobrun(wtr, ac_codes, eobrun, pending)
        code, ln = ac_codes[(run << 4) | 1]
        wtr.put(code, ln)
        wtr.put(0 if int(zz[ss + i]) < 0 else 1, 1)
        for b in bits:
            wtr.put(b, 1)
        bits = []
        run = 0
    if run > 0 or bits:
        eobrun += 1
        pending.extend(bits)
        if eobrun == 0x7FFF:
            eobrun = _flush_eobrun(wtr, ac_codes, eobrun, pending)
    return eobrun


def encode_progressive(
    img: np.ndarray,
    quality: int = 85,
    subsample: bool = True,
    restart_interval: int = 0,
) -> bytes:
    """uint8 pixels -> progressive (SOF2) JFIF JPEG bytes.

    Same pixel pipeline as encode_baseline (identical quantized
    coefficients — decode_pixels output is bit-identical across the two
    encoders), emitted as a multi-scan script exercising spectral
    selection AND successive approximation: DC first at Al=1 then
    refined, luma AC split into two bands at Al=2 refined twice, chroma
    AC at Al=1 refined once. restart_interval applies per scan in that
    scan's MCU unit (blocks for non-interleaved AC scans)."""
    gray, h, w, comps, coefs, mcus_x, mcus_y, q_luma, q_chroma = _prep_frame(
        img, quality, subsample
    )
    frame = {"w": w, "h": h, "comps": comps}
    dc_tbls = [_DC_LUMA, _DC_CHROMA]
    dc_codes = [_canonical_codes(*t) for t in dc_tbls]
    ac_flat = _canonical_codes(*_AC_FLAT)

    out = _frame_headers(
        gray, h, w, comps, q_luma, q_chroma, 0xC2, restart_interval
    )
    out += _seg(0xC4, bytes([0x00]) + bytes(_DC_LUMA[0]) + bytes(_DC_LUMA[1]))
    if not gray:
        out += _seg(
            0xC4, bytes([0x01]) + bytes(_DC_CHROMA[0]) + bytes(_DC_CHROMA[1])
        )
    out += _seg(0xC4, bytes([0x10]) + bytes(_AC_FLAT[0]) + bytes(_AC_FLAT[1]))

    if gray:
        script = [
            ("dc", [0], 0, 0, 0, 1),
            ("ac", 0, 1, 5, 0, 1),
            ("ac", 0, 6, 63, 0, 1),
            ("ac", 0, 1, 63, 1, 0),
            ("dc", [0], 0, 0, 1, 0),
        ]
    else:
        script = [
            ("dc", [0, 1, 2], 0, 0, 0, 1),
            ("ac", 0, 1, 5, 0, 2),
            ("ac", 1, 1, 63, 0, 1),
            ("ac", 2, 1, 63, 0, 1),
            ("ac", 0, 6, 63, 0, 2),
            ("ac", 0, 1, 63, 2, 1),
            ("dc", [0, 1, 2], 0, 0, 1, 0),
            ("ac", 1, 1, 63, 1, 0),
            ("ac", 2, 1, 63, 1, 0),
            ("ac", 0, 1, 63, 1, 0),
        ]

    for kind, target, ss, se, ah, al in script:
        wtr = _BitWriter()
        if kind == "dc":
            members = [(ci, comps[ci]) for ci in target]
            n_units = mcus_x * mcus_y
            grid_w = 0
        else:
            ci = target
            _bh_g, grid_w = _noninterleaved_grid(frame, comps[ci])
            n_units = _bh_g * grid_w
        preds = [0] * len(comps)
        eobrun = 0
        pending: list[int] = []
        rst = 0
        for unit in range(n_units):
            if restart_interval and unit and unit % restart_interval == 0:
                eobrun = _flush_eobrun(wtr, ac_flat, eobrun, pending)
                wtr.flush()
                wtr.out += bytes([0xFF, 0xD0 + rst])
                rst = (rst + 1) & 7
                preds = [0] * len(comps)
            if kind == "dc":
                my, mx = divmod(unit, mcus_x)
                for ci2, c in members:
                    t = 0 if c["tq"] == 0 else 1
                    for by in range(c["v"]):
                        for bx in range(c["h"]):
                            zz = coefs[ci2][my * c["v"] + by, mx * c["h"] + bx]
                            if ah == 0:
                                v = int(zz[0]) >> al  # arithmetic shift
                                diff = v - preds[ci2]
                                preds[ci2] = v
                                s = abs(diff).bit_length()
                                code, ln = dc_codes[t][s]
                                wtr.put(code, ln)
                                if s:
                                    wtr.put(
                                        diff if diff >= 0 else diff + (1 << s) - 1,
                                        s,
                                    )
                            else:
                                wtr.put((int(zz[0]) >> al) & 1, 1)
            else:
                uy, ux = divmod(unit, grid_w)
                zz = coefs[ci][uy, ux]
                if ah == 0:
                    eobrun = _enc_ac_first(
                        wtr, ac_flat, zz, ss, se, al, eobrun, pending
                    )
                else:
                    eobrun = _enc_ac_refine(
                        wtr, ac_flat, zz, ss, se, al, eobrun, pending
                    )
        eobrun = _flush_eobrun(wtr, ac_flat, eobrun, pending)
        wtr.flush()
        if kind == "dc":
            sos = bytes([len(members)])
            for _ci2, c in members:
                t = 0 if c["tq"] == 0 else 1
                sos += bytes([c["id"], t << 4])
        else:
            sos = bytes([1, comps[ci]["id"], 0x00])
        sos += bytes([ss, se, (ah << 4) | al])
        out += _seg(0xDA, sos)
        out += wtr.out
    out += b"\xff\xd9"
    return bytes(out)


def resize_nearest(buf: bytes, new_w: int, new_h: int, quality: int = 90) -> bytes:
    """Decode a baseline JPEG, nearest-neighbor resize, re-encode.

    The JPEG twin of y4m_codec.resize / png_codec.resize_nearest — used
    by operators/multimodal.resize_media so compressed images resize
    for real in a PIL-less sandbox."""
    from .png_codec import nearest_indices

    px = decode_pixels(buf)
    h, w = px.shape[:2]
    out = px[nearest_indices(h, new_h)][:, nearest_indices(w, new_w)]
    return encode_baseline(out, quality=quality, subsample=False)
