"""Minimal pure-stdlib YUV4MPEG2 (.y4m) codec — the REAL-video tier
that runs in any Python (plain-text header + raw planes, no ffmpeg).

Y4M is the uncompressed interchange format ffmpeg/x264 pipelines use:
one ASCII stream header (`YUV4MPEG2 W.. H.. F25:1 ... C420 ...\\n`),
then per frame an ASCII `FRAME...\\n` marker followed by raw Y, U, V
planes. Because frames are fixed-size and byte-addressable, frame
extraction is O(1) slicing — exactly the access pattern frame_sample
(operators/multimodal.py) needs, and the video analog of the
reference's footprint→surfaces expansion (FootprintExtruder.java:19-49).

Scope (disclosed): C420 (any variant suffix: jpeg/paldv/mpeg2), C422,
C444 and Cmono colorspaces, constant frame size (the spec's stream-level
W/H; per-FRAME overrides are rejected loudly). Compressed video (mp4,
webm) needs ffmpeg and stays behind the disclosed NotImplementedError
boundary in multimodal._decode_stub.
"""

from __future__ import annotations

MAGIC = b"YUV4MPEG2"


def is_y4m(buf: bytes) -> bool:
    return buf[: len(MAGIC)] == MAGIC


def _plane_divs(colorspace: str) -> tuple[int, int] | None:
    """(x_div, y_div) for the chroma planes; None = no chroma (mono)."""
    if colorspace.startswith("420"):
        return 2, 2
    if colorspace.startswith("422"):
        return 2, 1
    if colorspace.startswith("444"):
        return 1, 1
    if colorspace.startswith("mono"):
        return None
    raise NotImplementedError(f"y4m colorspace C{colorspace} not supported")


def frame_size(w: int, h: int, colorspace: str) -> int:
    divs = _plane_divs(colorspace)
    if divs is None:
        return w * h
    xd, yd = divs
    return w * h + 2 * ((w // xd) * (h // yd))


def parse_header(buf: bytes) -> tuple[int, int, int, int, str, int]:
    """(width, height, fps_num, fps_den, colorspace, header_end)."""
    if not is_y4m(buf):
        raise ValueError("not a y4m (bad YUV4MPEG2 signature)")
    nl = buf.index(b"\n")
    w = h = None
    fn, fd = 25, 1
    cs = "420jpeg"  # the spec default when C is absent
    for tok in buf[len(MAGIC) : nl].split():
        t = tok.decode("ascii")
        if t[0] == "W":
            w = int(t[1:])
        elif t[0] == "H":
            h = int(t[1:])
        elif t[0] == "F":
            fn, fd = (int(x) for x in t[1:].split(":"))
        elif t[0] == "C":
            cs = t[1:]
    if w is None or h is None:
        raise ValueError("corrupt y4m: missing W or H in stream header")
    return w, h, fn, fd, cs, nl + 1


def _frame_offsets(buf: bytes) -> tuple[int, list[int]]:
    """(frame_size, [offset of each frame's first plane byte])."""
    w, h, _fn, _fd, cs, pos = parse_header(buf)
    fsize = frame_size(w, h, cs)
    offs: list[int] = []
    while pos < len(buf):
        if buf[pos : pos + 5] != b"FRAME":
            raise ValueError(f"corrupt y4m: expected FRAME marker at {pos}")
        nl = buf.index(b"\n", pos)
        if nl != pos + 5:
            raise NotImplementedError(
                "per-FRAME parameter overrides not supported (variable "
                "frame size) — re-encode with a constant stream header"
            )
        offs.append(nl + 1)
        pos = nl + 1 + fsize
    return fsize, offs


def n_frames(buf: bytes) -> int:
    return len(_frame_offsets(buf)[1])


def get_frame(buf: bytes, i: int) -> bytes:
    """Raw Y+U+V plane bytes of frame i — O(frames) marker walk, O(1)
    per-frame slice, no plane decode."""
    fsize, offs = _frame_offsets(buf)
    if not 0 <= i < len(offs):
        raise IndexError(f"frame {i} out of range (n_frames={len(offs)})")
    return buf[offs[i] : offs[i] + fsize]


def encode(
    w: int, h: int, frames: list[bytes], fps: tuple[int, int] = (25, 1), colorspace: str = "420jpeg"
) -> bytes:
    fsize = frame_size(w, h, colorspace)
    for f in frames:
        if len(f) != fsize:
            raise ValueError(f"frame has {len(f)} bytes, expected {fsize}")
    head = f"YUV4MPEG2 W{w} H{h} F{fps[0]}:{fps[1]} Ip A1:1 C{colorspace}\n"
    return head.encode("ascii") + b"".join(b"FRAME\n" + bytes(f) for f in frames)


def _resize_plane(src: bytes, w: int, h: int, nw: int, nh: int) -> bytes:
    return bytes(
        src[min(y * h // nh, h - 1) * w + min(x * w // nw, w - 1)]
        for y in range(nh)
        for x in range(nw)
    )


def resize(buf: bytes, new_w: int, new_h: int) -> bytes:
    """Nearest-neighbor resize of every frame's planes, re-encoded with
    the same fps/colorspace — the video twin of png_codec.resize_gray.
    Chroma-subsampled colorspaces need even target dims."""
    w, h, fn, fd, cs, _pos = parse_header(buf)
    divs = _plane_divs(cs)
    if divs is not None and (new_w % divs[0] or new_h % divs[1]):
        raise ValueError(f"C{cs} needs dims divisible by {divs}, got {new_w}x{new_h}")
    out_frames: list[bytes] = []
    fsize, offs = _frame_offsets(buf)
    for off in offs:
        fr = buf[off : off + fsize]
        y_plane = _resize_plane(fr[: w * h], w, h, new_w, new_h)
        if divs is None:
            out_frames.append(y_plane)
            continue
        xd, yd = divs
        cw, ch_ = w // xd, h // yd
        ncw, nch = new_w // xd, new_h // yd
        u0, v0 = w * h, w * h + cw * ch_
        u = _resize_plane(fr[u0:v0], cw, ch_, ncw, nch)
        v = _resize_plane(fr[v0 : v0 + cw * ch_], cw, ch_, ncw, nch)
        out_frames.append(y_plane + u + v)
    return encode(new_w, new_h, out_frames, fps=(fn, fd), colorspace=cs)
