"""Real-JPEG metadata: the pure-stdlib SOFn walk (operators/jpeg_codec)
and its wiring into the Arrow-batched decode_metadata stage.

The fixtures are structurally faithful baseline/progressive JPEG
streams (SOI → APP0/APP1 → DQT → SOFn → DHT → SOS → entropy → EOI)
built segment-by-segment — the parser must find the frame header by
walking real marker segments, not by luck. Pixel decode is out of scope
(disclosed boundary); when PIL is installed these same streams would
still parse headers identically.
"""

from __future__ import annotations

import struct

import pytest

from data_pipeline_spark.operators import jpeg_codec
from data_pipeline_spark.operators.multimodal import decode_metadata


def _seg(code: int, payload: bytes) -> bytes:
    return bytes([0xFF, code]) + struct.pack(">H", len(payload) + 2) + payload


def _app0_jfif() -> bytes:
    return _seg(0xE0, b"JFIF\x00\x01\x02\x00\x00\x01\x00\x01\x00\x00")


def _dqt() -> bytes:
    return _seg(0xDB, b"\x00" + bytes(64))


def _sof(code: int, w: int, h: int, comps: int, depth: int = 8) -> bytes:
    body = struct.pack(">BHHB", depth, h, w, comps)
    for c in range(comps):
        body += bytes([c + 1, 0x11, 0])  # id, 1x1 sampling, quant table 0
    return _seg(code, body)


def _dht() -> bytes:
    return _seg(0xC4, b"\x00" + bytes(16) + b"\x00")


def _sos(comps: int) -> bytes:
    body = bytes([comps])
    for c in range(comps):
        body += bytes([c + 1, 0x00])
    body += b"\x00\x3f\x00"
    return _seg(0xDA, body)


def make_jpeg(
    w: int, h: int, comps: int = 3, sof_code: int = 0xC0, pre: bytes = b""
) -> bytes:
    return (
        jpeg_codec.SOI
        + pre
        + _app0_jfif()
        + _dqt()
        + _sof(sof_code, w, h, comps)
        + _dht()
        + _sos(comps)
        + b"\xaa\xbb\xcc"  # entropy-coded data (never parsed)
        + b"\xff\xd9"  # EOI
    )


def test_parse_sof_baseline_rgb():
    assert jpeg_codec.parse_sof(make_jpeg(640, 480, 3)) == (640, 480, 3, 8)


def test_parse_sof_grayscale_and_cmyk():
    assert jpeg_codec.parse_sof(make_jpeg(5, 7, 1)) == (5, 7, 1, 8)
    assert jpeg_codec.parse_sof(make_jpeg(5, 7, 4)) == (5, 7, 4, 8)


def test_parse_sof_progressive():
    # SOF2 — the other common wild format; DHT segments before the
    # frame header must be skipped, never misread as SOF (0xC4 vs 0xCn)
    buf = jpeg_codec.SOI + _dht() + _dqt() + _sof(0xC2, 1920, 1080, 3) + _sos(3)
    assert jpeg_codec.parse_sof(buf) == (1920, 1080, 3, 8)


def test_parse_sof_skips_exif_and_fill_bytes():
    # EXIF APP1 (with embedded 0xFF bytes in its payload — segment
    # lengths, not byte scanning, must drive the walk), then fill bytes
    # before the next marker (T.81 B.1.1.2)
    exif = _seg(0xE1, b"Exif\x00\x00" + b"\xff\xc0\x00\x11" + bytes(20))
    buf = jpeg_codec.SOI + exif + b"\xff" + _dqt() + _sof(0xC0, 33, 44, 3)
    assert jpeg_codec.parse_sof(buf)[:2] == (33, 44)


def test_parse_sof_rejects_bad_streams():
    with pytest.raises(ValueError, match="SOI"):
        jpeg_codec.parse_sof(b"\x89PNG\r\n\x1a\n")
    with pytest.raises(ValueError, match="truncated"):
        jpeg_codec.parse_sof(jpeg_codec.SOI + _app0_jfif())
    with pytest.raises(ValueError, match="scan data before frame"):
        jpeg_codec.parse_sof(jpeg_codec.SOI + _dqt() + _sos(3) + b"\x00")
    with pytest.raises(ValueError, match="overruns"):
        jpeg_codec.parse_sof(jpeg_codec.SOI + b"\xff\xe0\xff\xff")


def test_parse_sof_rejects_deferred_dnl_height():
    # height 0 in SOF defers the real height to a DNL marker after the
    # scan (T.81 B.2.2) — out of scope, must fail loudly, never report
    # a 0-pixel frame
    buf = jpeg_codec.SOI + _dqt() + _sof(0xC0, 640, 0, 3) + _sos(3)
    with pytest.raises(ValueError, match="DNL"):
        jpeg_codec.parse_sof(buf)


def test_decode_metadata_on_real_jpeg_bytes(spark):
    """The driver-facing stage handles real JPEG payloads end-to-end:
    binary column in, (width, height, n_frames, n_bytes) out through
    mapInPandas — the same Arrow plumbing every other codec uses."""
    payloads = [
        (1, make_jpeg(640, 480, 3)),
        (2, make_jpeg(64, 32, 1, sof_code=0xC2)),  # progressive grayscale
    ]
    df = spark.createDataFrame(payloads, "id long, media binary")
    out = {r["id"]: r for r in decode_metadata(df).collect()}
    assert (out[1]["width"], out[1]["height"], out[1]["n_frames"]) == (640, 480, 1)
    assert (out[2]["width"], out[2]["height"], out[2]["n_frames"]) == (64, 32, 1)
    assert out[1]["n_bytes"] == len(payloads[0][1])
