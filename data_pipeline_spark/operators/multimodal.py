"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Images/audio/video ride through the engine as `binary` columns with a
metadata struct, exactly how the reference treats geometry: an opaque
nested payload carried alongside typed attributes and only interpreted
at dedicated stages (/root/reference/citygml/src/main/java/org/
opencitymodel/citygml/Geometry.java:6-7, consumed only at extrusion,
FootprintExtruder.java:19-49).

The Spark-side plumbing here is REAL and tested: schema, Arrow batch
shape, mapInPandas signatures, partition sizing. The codec is
feature-detected per payload, most to least capable at each format:
the deterministic fake header parses directly; REAL PNG images, REAL
WAV/PCM audio, and REAL Y4M video parse via the pure-stdlib codecs
(png_codec / wav_codec / y4m_codec — all three run in this sandbox,
tested by tests/test_multimodal_real.py and test_multimodal_av.py);
REAL JPEG bytes — baseline AND progressive — decode, resize, and
re-encode via the pure-stdlib Huffman+IDCT codec
(jpeg_codec.decode_pixels / encode_baseline / encode_progressive;
arithmetic-coded streams are header-metadata-only); REAL compressed
WAV audio (G.711 A-law/μ-law, IMA ADPCM) expands transparently to
PCM16 through the same wav_codec tier; REAL GIFs
— including animated, interlaced, transparent ones — decode, resize,
and frame-sample via the pure-stdlib LZW codec (gif_codec); PIL takes
over for other image formats when installed; and perceptual-codec
audio/video (mp3/aac/h264 — needs librosa/ffmpeg) stays behind the
disclosed NotImplementedError boundary.

Metadata contract across modalities (one fixed, prunable schema):
image/video → (width, height, n_frames); audio → width=sample_rate,
height=n_channels, n_frames=sample frames (WAV terminology: one frame
= one sample per channel). frame_sample's every-Nth selection is frame
subsampling for video and decimation for audio; resize_media resizes
image AND video pixels for real, and resample_audio is the audio twin.

Scale notes: binary payloads dominate row size → keep
spark.sql.execution.arrow.maxRecordsPerBatch low (session.py pins 4096)
and let maxPartitionBytes split scans; metadata-only queries never touch
the bytes thanks to Parquet column pruning.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
import pyspark.sql.functions as F
from pyspark.sql import DataFrame

MEDIA_SCHEMA = (
    "id bigint, media binary, media_type string, width int, height int, n_frames int"
)

# deterministic fake codec header: b"FAKE" + media_type[1] + width:4 + height:4
_MAGIC = b"FAKE"


def pack_fake_media(df: DataFrame, id_col: str, w_col: str, h_col: str, kind: str = "image") -> DataFrame:
    """Build a binary media column from numeric metadata — the test-side
    encoder for the fake codec (pure built-in exprs: no Python)."""
    header = F.concat(
        F.lit(_MAGIC),
        F.encode(F.lit(kind[0]), "UTF-8"),
        F.unhex(F.lpad(F.hex(F.col(w_col).cast("int")), 8, "0")),
        F.unhex(F.lpad(F.hex(F.col(h_col).cast("int")), 8, "0")),
    )
    return df.select(
        F.col(id_col).cast("long").alias("id"),
        header.alias("media"),
        F.lit(kind).alias("media_type"),
    )


def _pil():
    """Feature-detect PIL once per worker; None when absent."""
    try:
        from PIL import Image  # noqa: PLC0415

        return Image
    except ImportError:
        return None


def _decode_stub(buf: bytes) -> tuple[int, int, int]:
    """(width, height, n_frames). Codec tiers, most to least capable at
    each format: (1) the deterministic fake header parses directly;
    (2) REAL PNG / JPEG / WAV / Y4M bytes parse via the pure-stdlib
    codecs (struct/zlib/ASCII — real-media metadata works in a PIL-less
    sandbox; JPEG metadata is the SOFn walk and both baseline and
    progressive pixels decode for real via jpeg_codec.decode_pixels;
    audio maps to width=sample_rate,
    height=n_channels, n_frames=sample frames); (3) every other real
    image format goes through PIL when installed; else the disclosed
    NotImplementedError boundary (compressed audio/video needs
    librosa/ffmpeg)."""
    buf = bytes(buf)
    if buf[:4] == _MAGIC:
        w = int.from_bytes(buf[5:9], "big")
        h = int.from_bytes(buf[9:13], "big")
        return w, h, 1
    from . import gif_codec, jpeg_codec, png_codec, wav_codec, y4m_codec

    if png_codec.is_png(buf):
        w, h, _, _ = png_codec.parse_ihdr(buf)
        return w, h, 1
    if gif_codec.is_gif(buf):
        # sub-block walk: real frame count for animated GIFs, no LZW work
        return gif_codec.parse_header(buf)
    if jpeg_codec.is_jpeg(buf):
        # SOFn walk: metadata for real JPEG bytes (baseline AND
        # progressive) without pixel decode — see jpeg_codec scope
        w, h, _comps, _depth = jpeg_codec.parse_sof(buf)
        return w, h, 1
    if wav_codec.is_wav(buf):
        ch, rate, _bits, n = wav_codec.parse_header(buf)
        return rate, ch, n
    if y4m_codec.is_y4m(buf):
        w, h, _fn, _fd, _cs, _pos = y4m_codec.parse_header(buf)
        return w, h, y4m_codec.n_frames(buf)
    image_mod = _pil()
    if image_mod is not None:
        import io

        with image_mod.open(io.BytesIO(buf)) as im:
            return im.width, im.height, getattr(im, "n_frames", 1)
    raise NotImplementedError(
        "real media decoding needs PIL/ffmpeg — not installed in this sandbox"
    )


def decode_metadata(df: DataFrame, id_col: str = "id", media_col: str = "media") -> DataFrame:
    """Arrow-batched metadata extraction: binary → (width, height,
    n_frames, n_bytes). mapInPandas so one Python worker handles a whole
    Arrow batch (no per-row Python dispatch)."""

    out_schema = f"{id_col} long, width int, height int, n_frames int, n_bytes long"

    def _batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            meta = pdf[media_col].map(_decode_stub)
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col],
                    "width": meta.map(lambda t: t[0]).astype("int32"),
                    "height": meta.map(lambda t: t[1]).astype("int32"),
                    "n_frames": meta.map(lambda t: t[2]).astype("int32"),
                    "n_bytes": pdf[media_col].map(len).astype("int64"),
                }
            )

    return df.select(id_col, media_col).mapInPandas(_batches, out_schema)


def resize_media(
    df: DataFrame,
    width: int,
    height: int,
    id_col: str = "id",
    media_col: str = "media",
) -> DataFrame:
    """Resize stage: binary → binary with new dimensions. Real images
    AND real video resize for real: Y4M via the stdlib plane codec
    (every frame, nearest-neighbor), JPEG — baseline AND progressive —
    via the stdlib Huffman+IDCT codec (decode → nearest resize →
    re-encode), animated GIF via the stdlib LZW codec, PNG of every
    legal depth/color shape via the stdlib filter codec (PIL is only a
    fallback for the stdlib codecs' disclosed edges, e.g. CMYK JPEG);
    the fake codec rewrites its header.
    Audio rejects loudly (resolution is meaningless — use
    resample_audio). The Arrow round-trip of binary payloads in and out
    of Python is identical across tiers."""

    out_schema = f"{id_col} long, media binary, width int, height int"

    def _batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        wb = width.to_bytes(4, "big")
        hb = height.to_bytes(4, "big")
        for pdf in it:
            def _pil_resize(buf: bytes) -> bytes:
                import io

                with _pil().open(io.BytesIO(buf)) as im:
                    out = io.BytesIO()
                    im.resize((width, height)).save(out, format="PNG")
                    return out.getvalue()

            def _rs(buf: bytes) -> bytes:
                buf = bytes(buf)
                if buf[:4] != _MAGIC:
                    from . import gif_codec, jpeg_codec, png_codec, wav_codec, y4m_codec

                    if y4m_codec.is_y4m(buf):  # real video → real resize
                        return y4m_codec.resize(buf, width, height)
                    if wav_codec.is_wav(buf):
                        raise ValueError(
                            "resize_media on audio — use resample_audio"
                        )
                    # image tiers: stdlib codec first; its disclosed
                    # edges (CMYK/12-bit/arithmetic JPEG, >256-color
                    # GIF frames) fall through to PIL when installed,
                    # and stay loud — never the fake-header rewrite —
                    # when not
                    is_image = (
                        jpeg_codec.is_jpeg(buf)
                        or gif_codec.is_gif(buf)
                        or png_codec.is_png(buf)
                    )
                    if is_image:
                        try:
                            if jpeg_codec.is_jpeg(buf):
                                return jpeg_codec.resize_nearest(buf, width, height)
                            if gif_codec.is_gif(buf):  # every frame, delays kept
                                return gif_codec.resize(buf, width, height)
                            return png_codec.resize_nearest(buf, width, height)
                        except (NotImplementedError, ValueError):
                            if _pil() is None:
                                raise
                            return _pil_resize(buf)
                    if _pil() is not None:  # other real formats via PIL
                        return _pil_resize(buf)
                _decode_stub(buf)  # validates the format
                return buf[:5] + wb + hb + buf[13:]

            yield pd.DataFrame(
                {
                    id_col: pdf[id_col],
                    "media": pdf[media_col].map(_rs),
                    "width": width,
                    "height": height,
                }
            )

    return df.select(id_col, media_col).mapInPandas(_batches, out_schema)


def extract_features(
    df: DataFrame,
    dim: int = 16,
    id_col: str = "id",
    media_col: str = "media",
) -> DataFrame:
    """Feature-extraction stage: binary → embedding array<double>.

    The 'model' is a disclosed deterministic fake — per-payload features
    derived from a seeded byte hash (numpy-vectorized per Arrow batch; a
    real encoder forward pass slots into the same batch loop). Output
    plugs directly into operators/similarity (cosine_topk, LSH, IVF,
    embed_cosine_dedup) — media dedup-by-embedding end to end.
    """
    import hashlib

    import numpy as np

    out_schema = f"{id_col} long, embedding array<double>"

    def _feat(buf: bytes) -> list[float]:
        seed = int.from_bytes(hashlib.md5(bytes(buf)).digest()[:8], "big")
        rng = np.random.default_rng(seed)
        v = rng.standard_normal(dim)
        return (v / np.linalg.norm(v)).tolist()

    def _batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            yield pd.DataFrame(
                {id_col: pdf[id_col], "embedding": pdf[media_col].map(_feat)}
            )

    return df.select(id_col, media_col).mapInPandas(_batches, out_schema)


def _frame_payloads(buf: bytes, fns: list[int]) -> list[bytes]:
    """Per-frame bytes for frame_sample: Y4M → each frame's raw YUV
    planes (O(1) slices); WAV → PCM blocks (decimation); animated GIF →
    composited standalone single-frame GIFs, decoded ONCE for the whole
    index list (per-frame decode would be quadratic in frame count);
    single-frame formats (fake header, PNG, JPEG) → the whole payload."""
    from . import gif_codec, wav_codec, y4m_codec

    if y4m_codec.is_y4m(buf):
        return [y4m_codec.get_frame(buf, i) for i in fns]
    if wav_codec.is_wav(buf):
        # one decode for the whole index list (ADPCM per-frame access
        # would re-run the block decoder per sampled frame)
        return wav_codec.frames_pcm16(buf, fns)
    if gif_codec.is_gif(buf):
        return gif_codec.frames_at(buf, fns)
    return [buf for _ in fns]


def frame_sample(
    df: DataFrame, every_n: int, id_col: str = "id", media_col: str = "media"
) -> DataFrame:
    """1→N frame expansion (UDTF shape, like the reference's footprint→
    surfaces extrusion, FootprintExtruder.java:19-49). Real Y4M video
    expands to its actual frame planes and real WAV audio to decimated
    PCM blocks (every_n-th frame each); single-frame formats emit one
    row carrying the payload."""

    out_schema = f"{id_col} long, frame_no int, frame binary"

    def _batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = {"ids": [], "fno": [], "frame": []}
            for i, buf in zip(pdf[id_col], pdf[media_col]):
                buf = bytes(buf)
                n = _decode_stub(buf)[2]
                fns = list(range(0, n, every_n))
                rows["ids"].extend([i] * len(fns))
                rows["fno"].extend(fns)
                rows["frame"].extend(_frame_payloads(buf, fns))
            yield pd.DataFrame(
                {id_col: rows["ids"], "frame_no": rows["fno"], "frame": rows["frame"]}
            )

    return df.select(id_col, media_col).mapInPandas(_batches, out_schema)


def resample_audio(
    df: DataFrame, new_rate: int, id_col: str = "id", media_col: str = "media"
) -> DataFrame:
    """Audio resample stage: PCM16 WAV → PCM16 WAV at new_rate
    (nearest-neighbor, wav_codec.resample_nearest) — the audio twin of
    resize_media, same Arrow-batched mapInPandas plumbing."""

    out_schema = f"{id_col} long, media binary, sample_rate int, n_frames int"

    def _batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from . import wav_codec

        for pdf in it:
            out = pdf[media_col].map(
                lambda b: wav_codec.resample_nearest(bytes(b), new_rate)
            )
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col],
                    "media": out,
                    "sample_rate": new_rate,
                    "n_frames": out.map(
                        lambda b: wav_codec.parse_header(b)[3]
                    ).astype("int32"),
                }
            )

    return df.select(id_col, media_col).mapInPandas(_batches, out_schema)
