"""Compressed-audio WAV decode (operators/wav_codec): G.711 A-law and
μ-law companding and IMA/DVI ADPCM.

Verification is NOT a round-trip tautology: every G.711 code point is
checked against the stdlib `audioop` implementation when present
(an independent C implementation of the same CCITT tables), and
against pinned sha256 digests of that audioop-verified mapping always
— so the table check runs identically on Pythons where audioop is
gone (3.13+). ADPCM is lossy-verified by SNR plus an exact invariant:
samples-per-block=1 stores every sample as a block-header predictor,
making the codec losslessly degenerate.
"""

from __future__ import annotations

import hashlib
import math

import numpy as np
import pytest

from data_pipeline_spark.operators import wav_codec as W
from data_pipeline_spark.operators.multimodal import (
    decode_metadata,
    resample_audio,
)

# sha256 of the full mappings, produced by this codec and verified
# byte-identical against stdlib audioop (Python 3.11) at pin time
_DIGESTS = {
    "ulaw_enc": "81d633c9e6972a18c74a58720b96cb8ca0bdd096d4060b646dd708c3b846019a",
    "alaw_enc": "38488f6fd710f4686360edc4d38639f96c491595ef93f8eb8d62d5e07ca6ce7b",
    "ulaw_dec": "3dab54339e520bb2c924826e3b72a917a2b612e9fd12fc867500f1d983a75827",
    "alaw_dec": "e04788d110e58ff8c70c93b8480190d973e3b67876b6119abbaec766cc75c174",
}


def _sig(n: int = 2000) -> list[int]:
    t = np.arange(n)
    return (8000 * np.sin(t / 10.0) + 3000 * np.sin(t / 3.1)).astype(int).tolist()


def _snr(ref: list[int], got: list[int]) -> float:
    noise = sum((a - b) ** 2 for a, b in zip(ref, got))
    return 10 * math.log10(sum(x * x for x in ref) / max(1, noise))


def test_g711_tables_match_pinned_independent_reference():
    ue = bytes(W.lin2ulaw(s) for s in range(-32768, 32768))
    ae = bytes(W.lin2alaw(s) for s in range(-32768, 32768))
    ud = np.array([W.ulaw2lin(c) for c in range(256)], np.int16).tobytes()
    ad = np.array([W.alaw2lin(c) for c in range(256)], np.int16).tobytes()
    assert hashlib.sha256(ue).hexdigest() == _DIGESTS["ulaw_enc"]
    assert hashlib.sha256(ae).hexdigest() == _DIGESTS["alaw_enc"]
    assert hashlib.sha256(ud).hexdigest() == _DIGESTS["ulaw_dec"]
    assert hashlib.sha256(ad).hexdigest() == _DIGESTS["alaw_dec"]
    try:  # live cross-check against the independent C implementation
        import audioop
    except ImportError:
        return  # the pinned digests above carry the same evidence
    pcm = np.arange(-32768, 32768, dtype=np.int16).tobytes()
    assert ue == audioop.lin2ulaw(pcm, 2)
    assert ae == audioop.lin2alaw(pcm, 2)
    codes = bytes(range(256))
    assert ud == audioop.ulaw2lin(codes, 2)
    assert ad == audioop.alaw2lin(codes, 2)


@pytest.mark.parametrize("law", ["ulaw", "alaw"])
def test_g711_wav_roundtrip_and_metadata(law):
    sig = _sig()
    buf = W.encode_g711(sig, 8000, 1, law=law)
    assert W.parse_header(buf) == (1, 8000, 8, len(sig))
    rate, dec = W.decode_pcm16(buf)
    assert rate == 8000 and len(dec) == len(sig)
    assert _snr(sig, dec) > 30.0  # G.711 ≈ 35-38 dB on speech-band signals
    # frame payloads come back expanded to PCM16 — uniform across
    # compressed containers, never raw companded code bytes
    assert np.frombuffer(W.frame_bytes(buf, 7), "<i2").tolist() == [dec[7]]


def test_ima_adpcm_roundtrip_mono_and_stereo():
    sig = _sig()
    buf = W.encode_ima(sig, 16000, 1, samples_per_block=505)
    ch, rate, bits, n = W.parse_header(buf)
    # the fact chunk records the true pre-padding length
    assert (ch, rate, bits, n) == (1, 16000, 4, len(sig))
    _r, dec = W.decode_pcm16(buf)
    assert len(dec) == len(sig)
    assert _snr(sig, dec) > 20.0  # 4-bit ADPCM ≈ 25 dB
    stereo = [v for s in sig for v in (s, -s // 2)]
    buf = W.encode_ima(stereo, 16000, 2, samples_per_block=505)
    _r, dec = W.decode_pcm16(buf)
    assert len(dec) == len(stereo)
    assert _snr(stereo, dec) > 20.0
    # frame_bytes on ADPCM decodes through the block (not a raw slice),
    # and the batch path returns identical payloads with one decode
    frame = np.frombuffer(W.frame_bytes(buf, 3), "<i2").tolist()
    assert frame == dec[6:8]
    batch = W.frames_pcm16(buf, [0, 3, 100])
    assert batch == [W.frame_bytes(buf, i) for i in (0, 3, 100)]


def test_ima_adpcm_hostile_and_truncated_inputs():
    """A header whose samples-per-block exceeds block capacity must be
    rejected BEFORE allocation (memory-amplification guard); a
    truncated payload decodes gracefully to fewer samples, never an
    IndexError."""
    import struct as st

    sig = _sig(600)
    good = W.encode_ima(sig, 8000, 1, samples_per_block=505)
    # corrupt the samplesPerBlock extension field to a huge value
    pos = good.index(b"fmt ") + 8 + 18
    bad = good[:pos] + st.pack("<H", 65529) + good[pos + 2 :]
    with pytest.raises(ValueError, match="exceeds block_align"):
        W.parse_header(bad)
    # truncation: decode returns a prefix, same values as the full file
    _r, full = W.decode_pcm16(good)
    _r, part = W.decode_pcm16(good[:-220])  # cuts into block 2's words
    assert 0 < len(part) < len(full)
    assert part == full[: len(part)]


def test_ima_spb1_is_losslessly_degenerate():
    """samples_per_block=1 stores every sample as a block-header
    predictor — an exact-equality anchor for the block layout."""
    sig = _sig(64)
    buf = W.encode_ima(sig, 8000, 1, samples_per_block=1)
    _r, dec = W.decode_pcm16(buf)
    assert dec == sig


def test_compressed_wavs_ride_the_media_stages(spark):
    """Metadata and resample stages are format-blind: a μ-law payload
    reports real (rate, channels, frames) and resamples to PCM16."""
    sig = _sig(800)
    rows = [
        (1, W.encode_g711(sig, 8000, 1, law="ulaw")),
        (2, W.encode_ima(sig, 16000, 1, samples_per_block=505)),
    ]
    df = spark.createDataFrame(rows, "id long, media binary")
    meta = {r["id"]: r for r in decode_metadata(df).collect()}
    assert (meta[1]["width"], meta[1]["height"], meta[1]["n_frames"]) == (8000, 1, 800)
    assert (meta[2]["width"], meta[2]["height"]) == (16000, 1)
    out = {r["id"]: r for r in resample_audio(df, 4000).collect()}
    for i in (1, 2):
        ch, rate, bits, _n = W.parse_header(bytes(out[i]["media"]))
        assert (ch, rate, bits) == (1, 4000, 16)  # expanded to PCM16
