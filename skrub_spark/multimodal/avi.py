"""REAL AVI (RIFF) demuxer/muxer — pure stdlib+numpy.

AVI is a RIFF container: nested LIST chunks with a header block
(``avih`` + per-stream ``strl`` lists holding ``strh``/``strf``) and
a ``movi`` LIST whose ``NNdb``/``NNdc`` chunks carry frame data for
stream NN. The demuxer walks the ``strl`` lists in order, binds the
FIRST ``vids`` stream (by its strl position, which defines the NN
chunk prefix per the AVI spec), and only accepts movi chunks whose
two-digit prefix matches that stream — a leading audio stream or a
second video stream can no longer be mis-bound or mixed in.

Supported codecs, both without any codec library:

- uncompressed DIB (biCompression=0, 24 bpp): bottom-up BGR rows,
  4-byte padded — the same pixel layout as BMP.
- MJPEG (handler/biCompression ``MJPG``): each frame chunk is a
  standalone baseline JPEG, decoded by the repo's own pure-numpy
  decoder (``multimodal/jpeg.py``).

Other compressed streams return None — that's where ffmpeg would
slot in. ``encode_avi`` writes a minimal conforming file (DIB or
MJPG) so tests and fixtures can exercise the demuxer without ffmpeg.
"""

from __future__ import annotations

import struct

import numpy as np


def decode_avi_frames(payload: bytes) -> list[np.ndarray] | None:
    """AVI bytes -> list of (h, w, 3) uint8 RGB frames, or None if
    not a DIB or MJPEG AVI."""
    try:
        return _decode(payload)
    except Exception:
        return None


_MJPG = struct.unpack("<I", b"MJPG")[0]


def _decode(payload: bytes) -> list[np.ndarray] | None:
    d = bytes(payload) if payload is not None else b""
    if len(d) < 12 or d[:4] != b"RIFF" or d[8:12] != b"AVI ":
        return None
    # stream binding state: streams appear as strl lists in order;
    # the n-th strl's movi chunks are prefixed with the 2-digit n.
    stream_idx = -1          # index of the strl currently being read
    pending_type = None      # fccType of the current strl's strh
    pending_handler = None
    bound = None             # (prefix, codec, w, h) of the first vids stream
    frames: list[np.ndarray] = []

    def walk(start: int, end: int):
        nonlocal stream_idx, pending_type, pending_handler, bound
        pos = start
        while pos + 8 <= end:
            fcc = d[pos : pos + 4]
            (size,) = struct.unpack("<I", d[pos + 4 : pos + 8])
            body = d[pos + 8 : pos + 8 + size]
            if fcc == b"LIST":
                if body[:4] == b"strl":
                    stream_idx += 1
                    pending_type = pending_handler = None
                walk(pos + 12, pos + 8 + size)
            elif fcc == b"strh" and len(body) >= 8:
                pending_type = body[0:4]
                pending_handler = body[4:8]
            elif fcc == b"strf" and pending_type == b"vids" and bound is None:
                if len(body) < 40:
                    raise ValueError("short BITMAPINFOHEADER")
                # BITMAPINFOHEADER: width/height/planes/bpp/compression
                w_, h_ = struct.unpack("<ii", body[4:12])
                bpp = struct.unpack("<H", body[14:16])[0]
                compression = struct.unpack("<I", body[16:20])[0]
                if compression == 0 and bpp == 24:
                    codec = "dib"
                elif compression == _MJPG or pending_handler in (b"MJPG", b"mjpg"):
                    codec = "mjpg"
                else:
                    raise ValueError("unsupported video codec")
                bound = (b"%02d" % stream_idx, codec, w_, abs(h_))
            elif (
                bound is not None
                and fcc[:2] == bound[0]
                and fcc[2:4] in (b"db", b"dc")
            ):
                prefix, codec, w, h = bound
                if codec == "dib":
                    stride = (w * 3 + 3) & ~3
                    if len(body) < stride * h:
                        raise ValueError("short frame")
                    rows = np.frombuffer(
                        body, dtype=np.uint8, count=stride * h
                    ).reshape(h, stride)[:, : w * 3].reshape(h, w, 3)
                    frames.append(rows[::-1, :, ::-1].copy())  # flip + BGR->RGB
                else:  # mjpg: the chunk body is a standalone baseline JPEG
                    from .jpeg import decode_jpeg

                    px = decode_jpeg(body)
                    if px is None:
                        raise ValueError("undecodable MJPEG frame")
                    frames.append(px)
            pos += 8 + size + (size & 1)

    walk(12, len(d))
    if bound is None or not frames:
        return None
    return frames


def encode_avi(
    frames: list[np.ndarray], fps: int = 10, codec: str = "dib", quality: int = 90
) -> bytes:
    """List of (h, w, 3) uint8 RGB frames -> minimal AVI bytes with a
    single video stream. ``codec="dib"`` writes uncompressed 24-bit
    DIB frames; ``codec="mjpg"`` writes each frame as a standalone
    baseline JPEG (``multimodal/jpeg.py`` encoder) in ``00dc`` chunks
    with an ``MJPG`` handler/biCompression."""
    h, w, _ = frames[0].shape
    stride = (w * 3 + 3) & ~3
    if codec == "dib":
        frame_bytes = []
        for f in frames:
            img = np.zeros((h, stride), dtype=np.uint8)
            img[:, : w * 3] = f[::-1, :, ::-1].reshape(h, w * 3)
            frame_bytes.append(img.tobytes())
        handler, compression, data_fcc = b"DIB ", 0, b"00db"
    elif codec == "mjpg":
        from .jpeg import encode_jpeg

        frame_bytes = [encode_jpeg(f, quality=quality) for f in frames]
        handler, compression, data_fcc = b"MJPG", _MJPG, b"00dc"
    else:
        raise ValueError(f"unsupported codec: {codec!r}")
    buf_size = max(len(fb) for fb in frame_bytes)

    def chunk(fcc: bytes, body: bytes) -> bytes:
        pad = b"\x00" if len(body) & 1 else b""
        return fcc + struct.pack("<I", len(body)) + body + pad

    def lst(fourcc: bytes, body: bytes) -> bytes:
        return chunk(b"LIST", fourcc + body)

    avih = struct.pack(
        "<14I",
        1_000_000 // fps,  # microseconds per frame
        buf_size * fps,    # max bytes/sec
        0, 0x10,           # padding, flags (HASINDEX off)
        len(frames), 0, 1, buf_size, w, h, 0, 0, 0, 0,
    )
    strh = (
        b"vids" + handler + struct.pack("<IHHIIIIIIIII", 0, 0, 0, 0, 1, fps,
                                        0, len(frames), buf_size, 0, 0, 0)
    )
    strf = struct.pack(
        "<IiiHHIIiiII", 40, w, h, 1, 24, compression, stride * h, 0, 0, 0, 0
    )
    hdrl = lst(
        b"hdrl",
        chunk(b"avih", avih)
        + lst(b"strl", chunk(b"strh", strh) + chunk(b"strf", strf)),
    )
    movi = lst(b"movi", b"".join(chunk(data_fcc, fb) for fb in frame_bytes))
    riff_body = b"AVI " + hdrl + movi
    return b"RIFF" + struct.pack("<I", len(riff_body)) + riff_body
