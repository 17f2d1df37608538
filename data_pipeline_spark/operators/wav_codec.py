"""Minimal pure-stdlib WAV (RIFF/PCM) codec — the REAL-audio tier that
runs in any Python (struct only, no librosa/ffmpeg).

Scope (disclosed): integer PCM (format 1) and WAVE_FORMAT_EXTENSIBLE
wrapping PCM, 8/16/24/32-bit, any channel count and rate. Header
metadata (channels/rate/bits/frame count) parses for every spec-valid
RIFF chunk layout (chunks walked, word-aligned); sample decode is
16-bit (the training-data norm). Encode emits canonical PCM16.

Audio rides the engine like every other modality (an opaque binary
column, operators/multimodal.py) the way the reference carries geometry
as an opaque nested payload interpreted only at dedicated stages
(/root/reference/citygml/src/main/java/org/opencitymodel/citygml/
Geometry.java:6-7). 'Frames' follow WAV terminology: one frame = one
sample per channel, so frame_sample's every-Nth-frame selection IS
audio decimation and resample_nearest is the audio twin of the image
nearest-neighbor resize.

Cross-checked against the stdlib `wave` module in both directions by
tests/test_multimodal_av.py (our encoder's output read by `wave`;
`wave`'s output parsed by us) — the two implementations are
independent, so agreement is real evidence.
"""

from __future__ import annotations

import struct
import sys
from array import array

_PCM_FORMATS = (1, 0xFFFE)  # PCM, EXTENSIBLE (assumed to wrap PCM)


def is_wav(buf: bytes) -> bool:
    return buf[:4] == b"RIFF" and buf[8:12] == b"WAVE"


def _chunks(buf: bytes):
    pos = 12
    while pos + 8 <= len(buf):
        cid = buf[pos : pos + 4]
        (length,) = struct.unpack("<I", buf[pos + 4 : pos + 8])
        yield cid, pos + 8, length
        pos += 8 + length + (length & 1)  # chunks are word-aligned


def parse_header(buf: bytes) -> tuple[int, int, int, int]:
    """(n_channels, sample_rate, bits_per_sample, n_frames).

    n_frames = data-chunk bytes // block_align (one frame = one sample
    per channel, `wave` module terminology)."""
    if not is_wav(buf):
        raise ValueError("not a WAV (bad RIFF/WAVE signature)")
    fmt = None
    data_len = None
    for cid, off, length in _chunks(buf):
        if cid == b"fmt ":
            tag, ch, rate, _br, block, bits = struct.unpack(
                "<HHIIHH", buf[off : off + 16]
            )
            if tag not in _PCM_FORMATS:
                raise NotImplementedError(
                    f"WAV format tag {tag}: only integer PCM is supported "
                    "(librosa/ffmpeg handle compressed audio when installed)"
                )
            fmt = (ch, rate, bits, block)
        elif cid == b"data":
            data_len = length
    if fmt is None or data_len is None:
        raise ValueError("corrupt WAV: missing fmt or data chunk")
    ch, rate, bits, block = fmt
    return ch, rate, bits, data_len // block


def _data_span(buf: bytes) -> tuple[int, int]:
    for cid, off, length in _chunks(buf):
        if cid == b"data":
            return off, length
    raise ValueError("corrupt WAV: missing data chunk")


def frame_bytes(buf: bytes, i: int) -> bytes:
    """Raw bytes of frame i (all channels) — frame_sample's per-frame
    payload; O(1) slicing, no full decode."""
    ch, _rate, bits, n = parse_header(buf)
    if not 0 <= i < n:
        raise IndexError(f"frame {i} out of range (n_frames={n})")
    off, _length = _data_span(buf)
    block = ch * bits // 8
    return buf[off + i * block : off + (i + 1) * block]


def decode_pcm16(buf: bytes) -> tuple[int, list[int]]:
    """(sample_rate, interleaved int16 samples) for 16-bit PCM."""
    ch, rate, bits, n = parse_header(buf)
    if bits != 16:
        raise NotImplementedError(
            f"stdlib WAV decode supports 16-bit PCM; got {bits}-bit"
        )
    off, length = _data_span(buf)
    a = array("h")
    a.frombytes(buf[off : off + min(length, n * ch * 2)])
    if sys.byteorder == "big":  # WAV data is little-endian
        a.byteswap()
    return rate, a.tolist()


def encode_pcm16(samples: list[int], sample_rate: int, n_channels: int = 1) -> bytes:
    """Canonical PCM16 WAV from interleaved samples."""
    a = array("h", samples)
    if sys.byteorder == "big":
        a.byteswap()
    data = a.tobytes()
    block = n_channels * 2
    fmt = struct.pack(
        "<HHIIHH", 1, n_channels, sample_rate, sample_rate * block, block, 16
    )
    body = b"WAVE" + b"fmt " + struct.pack("<I", len(fmt)) + fmt
    body += b"data" + struct.pack("<I", len(data)) + data
    return b"RIFF" + struct.pack("<I", len(body)) + body


def resample_nearest(buf: bytes, new_rate: int) -> bytes:
    """Nearest-neighbor resample of a PCM16 WAV to new_rate — the audio
    twin of png_codec.resize_gray (same index arithmetic over frames
    instead of pixels)."""
    ch, rate, _bits, n = parse_header(buf)
    rate2, samples = decode_pcm16(buf)
    new_n = max(1, n * new_rate // rate2)
    out: list[int] = []
    for i in range(new_n):
        src = min(i * n // new_n, n - 1)
        out.extend(samples[src * ch : (src + 1) * ch])
    return encode_pcm16(out, new_rate, ch)
