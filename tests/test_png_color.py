"""Full-color PNG decode (operators/png_codec decode_pixels /
encode_pixels): every 8-bit color type, every scanline filter, palette
and transparency resolution, and the resize wiring.

PNG is lossless, so round trips assert exact equality. The filter
fixtures are built by hand (per-row filter bytes chosen explicitly) so
the un-filter path is tested against the spec, not just against our
own filter-0 encoder.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np
import pytest

from data_pipeline_spark.operators import png_codec as P
from data_pipeline_spark.operators.multimodal import resize_media


def _rand(h: int, w: int, c: int, seed: int = 0) -> np.ndarray:
    rng = np.random.default_rng(seed)
    shape = (h, w) if c == 1 else (h, w, c)
    return rng.integers(0, 256, shape, dtype=np.uint8)


@pytest.mark.parametrize("channels", [1, 2, 3, 4])
def test_roundtrip_every_color_type(channels):
    img = _rand(13, 17, channels, seed=channels)
    out = P.decode_pixels(P.encode_pixels(img))
    assert out.dtype == np.uint8 and np.array_equal(out, img)


def _chunk(ct: bytes, data: bytes) -> bytes:
    return (
        struct.pack(">I", len(data))
        + ct
        + data
        + struct.pack(">I", zlib.crc32(ct + data) & 0xFFFFFFFF)
    )


def _png_with_filters(img: np.ndarray, filters: list[int]) -> bytes:
    """Hand-filter an RGB image with an explicit per-row filter choice."""
    h, w, c = img.shape
    arr = img.astype(np.int32)
    raw = bytearray()
    for y in range(h):
        f = filters[y % len(filters)]
        row = arr[y].reshape(-1)
        prev = arr[y - 1].reshape(-1) if y else np.zeros(w * c, np.int32)
        left = np.concatenate([np.zeros(c, np.int32), row[:-c]])
        ul = np.concatenate([np.zeros(c, np.int32), prev[:-c]])
        if f == 0:
            enc = row
        elif f == 1:
            enc = row - left
        elif f == 2:
            enc = row - prev
        elif f == 3:
            enc = row - (left + prev) // 2
        else:  # Paeth
            enc = row - np.array(
                [P._paeth(int(a), int(b), int(cc)) for a, b, cc in zip(left, prev, ul)]
            )
        raw.append(f)
        raw += (enc % 256).astype(np.uint8).tobytes()
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
    return (
        P.SIG
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", zlib.compress(bytes(raw)))
        + _chunk(b"IEND", b"")
    )


def test_all_five_filters_unapply_on_rgb():
    img = _rand(15, 11, 3, seed=9)
    buf = _png_with_filters(img, [0, 1, 2, 3, 4])
    assert np.array_equal(P.decode_pixels(buf), img)


def test_palette_png_resolves_plte_and_trns():
    pal = np.array([[255, 0, 0], [0, 255, 0], [0, 0, 255]], np.uint8)
    idx = np.array([[0, 1, 2], [2, 1, 0]], np.uint8)
    raw = b"".join(b"\x00" + idx[y].tobytes() for y in range(2))
    ihdr = struct.pack(">IIBBBBB", 3, 2, 8, 3, 0, 0, 0)
    base = P.SIG + _chunk(b"IHDR", ihdr) + _chunk(b"PLTE", pal.tobytes())
    plain = base + _chunk(b"IDAT", zlib.compress(raw)) + _chunk(b"IEND", b"")
    out = P.decode_pixels(plain)
    assert out.shape == (2, 3, 3) and np.array_equal(out, pal[idx])
    # tRNS: entry 1 fully transparent -> RGBA output
    trans = (
        base
        + _chunk(b"tRNS", bytes([255, 0]))
        + _chunk(b"IDAT", zlib.compress(raw))
        + _chunk(b"IEND", b"")
    )
    out = P.decode_pixels(trans)
    assert out.shape == (2, 3, 4)
    assert list(out[0, 1]) == [0, 255, 0, 0]  # palette 1: transparent
    assert list(out[0, 0]) == [255, 0, 0, 255]


def test_16bit_roundtrip_every_color_type():
    """16-bit samples survive exactly (big-endian on the wire, native
    uint16 in memory); filters unapply at byte granularity per spec."""
    rng = np.random.default_rng(6)
    for c in (1, 2, 3, 4):
        shape = (11, 13) if c == 1 else (11, 13, c)
        img = rng.integers(0, 65536, shape, dtype=np.uint16)
        out = P.decode_pixels(P.encode_pixels(img))
        assert out.dtype == np.uint16 and np.array_equal(out, img)


def test_adam7_interlaced_roundtrip():
    """Adam7 pass extraction/reassembly, including dimensions small
    enough that some passes are empty (spec: omitted, not zero-size)."""
    rng = np.random.default_rng(7)
    for shape, dt in (
        ((13, 17, 3), np.uint8),
        ((5, 3), np.uint8),
        ((1, 1), np.uint8),
        ((10, 9, 4), np.uint16),
    ):
        hi = 256 if dt == np.uint8 else 65536
        img = rng.integers(0, hi, shape, dtype=dt)
        buf = P.encode_pixels(img, interlace=True)
        assert buf[28] == 1  # IHDR interlace flag actually set
        assert np.array_equal(P.decode_pixels(buf), img)


@pytest.mark.parametrize("depth", [1, 2, 4])
def test_low_depth_grayscale_decodes_with_rescale(depth):
    """1/2/4-bit grayscale: bit-packed MSB-first rows with byte-padded
    boundaries, rescaled to the full 0-255 presentation range."""
    rng = np.random.default_rng(depth)
    img = rng.integers(0, 1 << depth, (9, 13), dtype=np.uint8)  # odd width
    buf = P.encode_pixels(img, depth=depth)
    assert P.parse_ihdr(buf) == (13, 9, depth, 0)
    scale = 255 // ((1 << depth) - 1)
    assert np.array_equal(P.decode_pixels(buf), img * scale)


def test_low_depth_palette_resolves():
    pal = np.array([[255, 0, 0], [0, 255, 0], [0, 0, 255], [9, 9, 9]], np.uint8)
    idx = np.array([[0, 1, 2, 3, 0], [3, 2, 1, 0, 1]], np.uint8)  # 2-bit
    bits = np.packbits(
        ((idx[..., None] >> np.arange(1, -1, -1)) & 1).reshape(2, 10), axis=1
    )
    raw = b"".join(b"\x00" + bits[y].tobytes() for y in range(2))
    buf = (
        P.SIG
        + _chunk(b"IHDR", struct.pack(">IIBBBBB", 5, 2, 2, 3, 0, 0, 0))
        + _chunk(b"PLTE", pal.tobytes())
        + _chunk(b"IDAT", zlib.compress(raw))
        + _chunk(b"IEND", b"")
    )
    assert np.array_equal(P.decode_pixels(buf), pal[idx])


def test_encode_rejects_bad_or_contradictory_depth():
    img8 = np.zeros((4, 4), np.uint8)
    with pytest.raises(ValueError, match="illegal PNG bit depth"):
        P.encode_pixels(img8, depth=3)
    with pytest.raises(ValueError, match="contradicts"):
        P.encode_pixels(img8, depth=16)


def test_illegal_depth_combination_is_loud():
    # 4-bit RGB is not a legal PNG shape — metadata parses, decode raises
    ihdr = struct.pack(">IIBBBBB", 4, 4, 4, 2, 0, 0, 0)
    buf = (
        P.SIG
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", zlib.compress(bytes(4 * 7)))
        + _chunk(b"IEND", b"")
    )
    assert P.parse_ihdr(buf) == (4, 4, 4, 2)
    with pytest.raises(ValueError, match="illegal"):
        P.decode_pixels(buf)


def test_resize_nearest_rgba_exact():
    img = _rand(10, 8, 4, seed=3)
    out = P.decode_pixels(P.resize_nearest(P.encode_pixels(img), 4, 5))
    rows = np.minimum((np.arange(5) * 10) // 5, 9)
    cols = np.minimum((np.arange(4) * 8) // 4, 7)
    assert np.array_equal(out, img[rows][:, cols])


def test_resize_media_stage_on_color_png(spark):
    """The Arrow-batched resize stage handles RGB PNGs without PIL."""
    img = _rand(12, 16, 3, seed=4)
    df = spark.createDataFrame(
        [(1, P.encode_pixels(img))], "id long, media binary"
    )
    row = resize_media(df, 8, 6).collect()[0]
    out = P.decode_pixels(bytes(row["media"]))
    rows = np.minimum((np.arange(6) * 12) // 6, 11)
    cols = np.minimum((np.arange(8) * 16) // 8, 15)
    assert np.array_equal(out, img[rows][:, cols])
