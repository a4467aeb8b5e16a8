"""REAL uncompressed-AVI (RIFF) demuxer/muxer — pure stdlib+numpy.

AVI is a RIFF container: nested LIST chunks with a header block
(``avih``/``strh``/``strf``) and a ``movi`` LIST whose ``00db``
chunks carry uncompressed DIB frames (bottom-up BGR rows, 4-byte
padded — the same pixel layout as BMP). Walking that structure needs
no codec library, so uncompressed AVI gets a genuine decoder here;
compressed streams (``00dc`` with a non-DIB fourcc) return None —
that's where ffmpeg would slot in.

``encode_avi`` writes a minimal conforming file so tests and
fixtures can exercise the demuxer without ffmpeg.
"""

from __future__ import annotations

import struct

import numpy as np


def decode_avi_frames(payload: bytes) -> list[np.ndarray] | None:
    """AVI bytes -> list of (h, w, 3) uint8 RGB frames, or None if
    not an uncompressed-DIB AVI."""
    try:
        return _decode(payload)
    except Exception:
        return None


def _decode(payload: bytes) -> list[np.ndarray] | None:
    d = bytes(payload) if payload is not None else b""
    if len(d) < 12 or d[:4] != b"RIFF" or d[8:12] != b"AVI ":
        return None
    w = h = None
    compression = None
    frames: list[np.ndarray] = []

    def walk(start: int, end: int):
        nonlocal w, h, compression
        pos = start
        while pos + 8 <= end:
            fcc = d[pos : pos + 4]
            (size,) = struct.unpack("<I", d[pos + 4 : pos + 8])
            body = d[pos + 8 : pos + 8 + size]
            if fcc == b"LIST":
                walk(pos + 12, pos + 8 + size)
            elif fcc == b"strf" and len(body) >= 40 and w is None:
                # BITMAPINFOHEADER: width/height/planes/bpp/compression
                w_, h_ = struct.unpack("<ii", body[4:12])
                bpp = struct.unpack("<H", body[14:16])[0]
                compression = struct.unpack("<I", body[16:20])[0]
                if bpp == 24:
                    w, h = w_, abs(h_)
            elif fcc[2:4] in (b"db", b"dc") and w is not None:
                if compression != 0:
                    raise ValueError("compressed stream")
                stride = (w * 3 + 3) & ~3
                if len(body) < stride * h:
                    raise ValueError("short frame")
                rows = np.frombuffer(
                    body, dtype=np.uint8, count=stride * h
                ).reshape(h, stride)[:, : w * 3].reshape(h, w, 3)
                frames.append(rows[::-1, :, ::-1].copy())  # flip + BGR->RGB
            pos += 8 + size + (size & 1)

    walk(12, len(d))
    if w is None or not frames:
        return None
    return frames


def encode_avi(frames: list[np.ndarray], fps: int = 10) -> bytes:
    """List of (h, w, 3) uint8 RGB frames -> minimal uncompressed
    AVI bytes (single 24-bit DIB video stream)."""
    h, w, _ = frames[0].shape
    stride = (w * 3 + 3) & ~3
    frame_bytes = []
    for f in frames:
        img = np.zeros((h, stride), dtype=np.uint8)
        img[:, : w * 3] = f[::-1, :, ::-1].reshape(h, w * 3)
        frame_bytes.append(img.tobytes())

    def chunk(fcc: bytes, body: bytes) -> bytes:
        pad = b"\x00" if len(body) & 1 else b""
        return fcc + struct.pack("<I", len(body)) + body + pad

    def lst(fourcc: bytes, body: bytes) -> bytes:
        return chunk(b"LIST", fourcc + body)

    avih = struct.pack(
        "<14I",
        1_000_000 // fps,  # microseconds per frame
        stride * h * fps,  # max bytes/sec
        0, 0x10,           # padding, flags (HASINDEX off)
        len(frames), 0, 1, stride * h, w, h, 0, 0, 0, 0,
    )
    strh = (
        b"vids" + b"DIB " + struct.pack("<IHHIIIIIIIII", 0, 0, 0, 0, 1, fps,
                                        0, len(frames), stride * h, 0, 0, 0)
    )
    strf = struct.pack(
        "<IiiHHIIiiII", 40, w, h, 1, 24, 0, stride * h, 0, 0, 0, 0
    )
    hdrl = lst(
        b"hdrl",
        chunk(b"avih", avih)
        + lst(b"strl", chunk(b"strh", strh) + chunk(b"strf", strf)),
    )
    movi = lst(b"movi", b"".join(chunk(b"00db", fb) for fb in frame_bytes))
    riff_body = b"AVI " + hdrl + movi
    return b"RIFF" + struct.pack("<I", len(riff_body)) + riff_body
