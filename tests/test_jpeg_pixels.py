"""Baseline JPEG pixel codec (operators/jpeg_codec decode_pixels /
encode_baseline) and its wiring into the Arrow-batched resize stage.

The encoder is the test-vector generator: spec-shaped JFIF streams with
the public Annex K quant + Huffman tables, optional 4:2:0 subsampling
and restart intervals. Round-trips are verified by PSNR against the
source pixels (lossy codec — exactness is the wrong bar) plus exact
invariants where the spec demands them (restart markers must not change
decoded output; dimensions survive non-multiple-of-8 sizes).
"""

from __future__ import annotations

import numpy as np
import pytest

from data_pipeline_spark.operators import jpeg_codec as jc
from data_pipeline_spark.operators.multimodal import decode_metadata, resize_media


def _psnr(a: np.ndarray, b: np.ndarray) -> float:
    mse = np.mean((a.astype(np.float64) - b.astype(np.float64)) ** 2)
    return 99.0 if mse == 0 else 10 * np.log10(255.0**2 / mse)


def _smooth(h: int, w: int) -> np.ndarray:
    yy, xx = np.mgrid[0:h, 0:w]
    return np.clip(
        128 + 80 * np.sin(xx / 9.0) + 60 * np.cos(yy / 7.0), 0, 255
    ).astype(np.uint8)


def _rgb(h: int, w: int) -> np.ndarray:
    base = _smooth(h, w)
    grad = ((np.mgrid[0:h, 0:w][1] * 2) % 256).astype(np.uint8)
    return np.stack([base, grad, 255 - base], axis=-1)


def test_roundtrip_grayscale_quality_ladder():
    img = _smooth(48, 64)
    prev = 0.0
    for q in (75, 90, 95):
        dec = jc.decode_pixels(jc.encode_baseline(img, quality=q))
        assert dec.shape == img.shape and dec.dtype == np.uint8
        p = _psnr(img, dec)
        assert p > 40.0
        assert p >= prev  # higher quality must not decode worse
        prev = p


def test_roundtrip_rgb_444_and_420():
    img = _rgb(48, 64)
    d444 = jc.decode_pixels(jc.encode_baseline(img, quality=90, subsample=False))
    d420 = jc.decode_pixels(jc.encode_baseline(img, quality=90, subsample=True))
    assert d444.shape == d420.shape == img.shape
    assert _psnr(img, d444) > 35.0
    assert _psnr(img, d420) > 28.0  # chroma subsampling is lossier
    # luma survives subsampling nearly as well as 4:4:4
    as_y = lambda a: 0.299 * a[..., 0] + 0.587 * a[..., 1] + 0.114 * a[..., 2]
    assert _psnr(as_y(img), as_y(d420)) > 33.0


def test_odd_dimensions_and_metadata_agree():
    # 37x29 exercises edge-replication padding in every sampling mode
    img = _rgb(37, 29)
    for sub in (False, True):
        buf = jc.encode_baseline(img, quality=90, subsample=sub)
        assert jc.parse_sof(buf) == (29, 37, 3, 8)
        assert jc.decode_pixels(buf).shape == (37, 29, 3)


def test_restart_markers_do_not_change_pixels():
    """DRI/RSTn carve the entropy stream but encode identical quantized
    coefficients — decoded output must be bit-identical."""
    img = _rgb(37, 29)
    plain = jc.encode_baseline(img, quality=90, subsample=True)
    rst = jc.encode_baseline(img, quality=90, subsample=True, restart_interval=2)
    assert b"\xff\xdd" in rst and b"\xff\xdd" not in plain  # DRI present
    assert b"\xff\xd0" in rst  # at least one RST0
    assert np.array_equal(jc.decode_pixels(plain), jc.decode_pixels(rst))


def test_decoder_rejects_arithmetic_and_corrupt_streams():
    from tests.test_jpeg_codec import make_jpeg

    # arithmetic-coded frames (SOF9) stay behind the disclosed boundary
    with pytest.raises(NotImplementedError, match="arithmetic"):
        jc.decode_pixels(make_jpeg(64, 32, 3, sof_code=0xC9))
    # truncating the entropy stream must fail loudly, never return a
    # silently half-decoded frame
    buf = jc.encode_baseline(_smooth(64, 64), quality=90)
    with pytest.raises(ValueError):
        jc.decode_pixels(buf[: len(buf) // 2])
    with pytest.raises(ValueError, match="SOI"):
        jc.decode_pixels(b"\x89PNG\r\n\x1a\n")


def test_progressive_decodes_identically_to_baseline():
    """Both encoders quantize identically, so decode_pixels must return
    BIT-IDENTICAL pixels for the SOF0 and SOF2 encodings of the same
    image — across grayscale, 4:4:4, and 4:2:0."""
    gray = _smooth(48, 64)
    assert np.array_equal(
        jc.decode_pixels(jc.encode_baseline(gray, quality=85, subsample=False)),
        jc.decode_pixels(jc.encode_progressive(gray, quality=85, subsample=False)),
    )
    img = _rgb(48, 64)
    for sub in (False, True):
        assert np.array_equal(
            jc.decode_pixels(jc.encode_baseline(img, quality=90, subsample=sub)),
            jc.decode_pixels(jc.encode_progressive(img, quality=90, subsample=sub)),
        )


def test_progressive_odd_dims_restarts_and_metadata():
    """Restart markers inside progressive scans (per-scan MCU units,
    EOB-run flush at segment boundaries) must not change output, and
    the SOFn metadata walk sees the same frame header."""
    img = _rgb(37, 29)
    plain = jc.encode_progressive(img, quality=90)
    rst = jc.encode_progressive(img, quality=90, restart_interval=3)
    assert jc.parse_sof(plain) == (29, 37, 3, 8)
    assert b"\xff\xdd" in rst
    assert np.array_equal(jc.decode_pixels(plain), jc.decode_pixels(rst))
    assert np.array_equal(
        jc.decode_pixels(plain),
        jc.decode_pixels(jc.encode_baseline(img, quality=90)),
    )


@pytest.mark.parametrize("samp", [(2, 1), (1, 2), (4, 1)])
def test_asymmetric_chroma_sampling(samp):
    """4:2:2 / 4:4:0 / 4:1:1 exercise per-axis chroma upsampling
    factors the square modes never hit — in both entropy codings."""
    img = _rgb(37, 51)
    seq = jc.encode_baseline(img, quality=90, subsample=samp)
    pro = jc.encode_progressive(img, quality=90, subsample=samp)
    d = jc.decode_pixels(seq)
    assert d.shape == img.shape
    assert np.array_equal(d, jc.decode_pixels(pro))
    assert _psnr(img, d) > 30.0


def test_noninterleaved_sequential_scans():
    """libjpeg's non-interleaved baseline mode writes one SOS per
    component — the decoder must keep consuming scans after the first
    instead of reconstructing early, and per-scan restart intervals
    count blocks, not MCUs."""
    img = _rgb(37, 51)
    inter = jc.encode_baseline(img, quality=90, subsample=True)
    non = jc.encode_baseline(img, quality=90, subsample=True, interleave=False)
    assert non.count(b"\xff\xda") == 3 and inter.count(b"\xff\xda") == 1
    assert np.array_equal(jc.decode_pixels(inter), jc.decode_pixels(non))
    rst = jc.encode_baseline(
        img, quality=90, subsample=True, interleave=False, restart_interval=4
    )
    assert np.array_equal(jc.decode_pixels(inter), jc.decode_pixels(rst))


def test_trailing_junk_after_eoi_is_ignored():
    """Cameras append junk after EOI; both entropy codings must stop at
    the trailer instead of trying to parse beyond it."""
    img = _smooth(24, 32)
    for enc in (jc.encode_baseline, jc.encode_progressive):
        buf = enc(img, quality=90)
        assert np.array_equal(
            jc.decode_pixels(buf + b"\x00\x01junk\xff"), jc.decode_pixels(buf)
        )


def test_progressive_eob_runs_span_blocks():
    """A flat image makes every AC band empty → the encoder accumulates
    multi-block EOBn runs (the Annex-K-table-less symbols); the decoder
    must honor run lengths > 1 in both first and refinement passes."""
    flat = np.full((64, 48, 3), 77, dtype=np.uint8)
    dec = jc.decode_pixels(jc.encode_progressive(flat, quality=90))
    assert np.array_equal(
        dec, jc.decode_pixels(jc.encode_baseline(flat, quality=90))
    )
    assert np.abs(dec.astype(int) - 77).max() <= 2


def test_resize_nearest_roundtrip():
    img = _rgb(40, 56)
    out = jc.resize_nearest(jc.encode_baseline(img, quality=95), 28, 20)
    assert jc.parse_sof(out)[:2] == (28, 20)
    dec = jc.decode_pixels(out)
    assert dec.shape == (20, 28, 3)
    # nearest-resize of a smooth image stays close to the ideal
    # nearest-downsample of the source
    rows = np.minimum((np.arange(20) * 40) // 20, 39)
    cols = np.minimum((np.arange(28) * 56) // 28, 55)
    assert _psnr(img[rows][:, cols], dec) > 28.0


def test_resize_media_stage_on_real_jpeg(spark):
    """The driver-facing resize stage now handles compressed images for
    real: JPEG in, resized JPEG out, through the same Arrow-batched
    mapInPandas plumbing as PNG/Y4M."""
    flat = np.full((32, 32, 3), 200, dtype=np.uint8)
    payloads = [
        (1, jc.encode_baseline(_rgb(32, 48), quality=90)),
        (2, jc.encode_baseline(flat, quality=90)),
    ]
    df = spark.createDataFrame(payloads, "id long, media binary")
    out = {r["id"]: r for r in resize_media(df, 16, 8).collect()}
    for i in (1, 2):
        assert (out[i]["width"], out[i]["height"]) == (16, 8)
        assert jc.parse_sof(bytes(out[i]["media"]))[:2] == (16, 8)
    # a flat image stays flat through decode → resize → re-encode
    dec = jc.decode_pixels(bytes(out[2]["media"]))
    assert np.abs(dec.astype(float) - 200.0).max() < 8.0


def test_decode_metadata_stage_on_encoded_jpeg(spark):
    df = spark.createDataFrame(
        [(7, jc.encode_baseline(_smooth(24, 40), quality=85))],
        "id long, media binary",
    )
    row = decode_metadata(df).collect()[0]
    assert (row["width"], row["height"], row["n_frames"]) == (40, 24, 1)
