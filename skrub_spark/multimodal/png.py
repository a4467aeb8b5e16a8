"""REAL PNG codec — stdlib ``zlib`` + numpy, no PIL.

PNG is a chunked container around zlib-compressed scanlines, each
prefixed with a filter byte (0 none / 1 sub / 2 up / 3 average /
4 paeth). Decoding = parse chunks, inflate, invert the per-row
filter. That needs no imaging library, so unlike JPEG (Huffman+DCT)
this container gets a genuine decoder in this environment.

Supported: 8-bit depth, color types 0 (gray), 2 (RGB), 4 (gray+
alpha), 6 (RGBA), no interlace — the shapes ML image corpora
actually carry. Everything else returns None (never raises
mid-job).

``encode_png(pixels, filter_type=...)`` exists so tests can
exercise every filter's inverse without fixture files.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

_SIG = b"\x89PNG\r\n\x1a\n"
_CHANNELS = {0: 1, 2: 3, 4: 2, 6: 4}


def _paeth(a: int, b: int, c: int) -> int:
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    return b if pb <= pc else c


def decode_png(payload: bytes) -> np.ndarray | None:
    """PNG bytes -> (h, w, 3) uint8 RGB (alpha dropped, gray
    broadcast) or None if not a decodable PNG."""
    if payload is None or len(payload) < 8 or payload[:8] != _SIG:
        return None
    pos, idat, meta = 8, [], None
    try:
        while pos + 8 <= len(payload):
            (length,) = struct.unpack(">I", payload[pos : pos + 4])
            ctype = payload[pos + 4 : pos + 8]
            data = payload[pos + 8 : pos + 8 + length]
            if len(data) < length:
                return None
            if ctype == b"IHDR":
                w, h, depth, color, comp, filt, interlace = struct.unpack(
                    ">IIBBBBB", data
                )
                if (
                    depth != 8
                    or color not in _CHANNELS
                    or comp != 0
                    or filt != 0
                    or interlace != 0
                    or w == 0
                    or h == 0
                ):
                    return None
                meta = (w, h, _CHANNELS[color])
            elif ctype == b"IDAT":
                idat.append(data)
            elif ctype == b"IEND":
                break
            pos += 12 + length
        if meta is None or not idat:
            return None
        w, h, ch = meta
        raw = zlib.decompress(b"".join(idat))
    except Exception:
        return None
    stride = w * ch
    if len(raw) < h * (stride + 1):
        return None
    out = np.zeros((h, stride), dtype=np.uint8)
    prior = np.zeros(stride, dtype=np.uint8)
    for y in range(h):
        line = np.frombuffer(
            raw, dtype=np.uint8, count=stride, offset=y * (stride + 1) + 1
        )
        f = raw[y * (stride + 1)]
        if f == 0:
            rec = line.copy()
        elif f == 1:  # sub: per-channel lane prefix sum
            rec = line.copy()
            for o in range(ch):
                rec[o::ch] = np.cumsum(line[o::ch], dtype=np.uint64) & 0xFF
        elif f == 2:  # up
            rec = line + prior
        elif f == 3:  # average — left is reconstructed: sequential
            rec = np.zeros(stride, dtype=np.uint8)
            for i in range(stride):
                left = int(rec[i - ch]) if i >= ch else 0
                rec[i] = (int(line[i]) + ((left + int(prior[i])) >> 1)) & 0xFF
        elif f == 4:  # paeth — sequential
            rec = np.zeros(stride, dtype=np.uint8)
            for i in range(stride):
                a = int(rec[i - ch]) if i >= ch else 0
                c = int(prior[i - ch]) if i >= ch else 0
                rec[i] = (int(line[i]) + _paeth(a, int(prior[i]), c)) & 0xFF
        else:
            return None
        out[y] = rec
        prior = out[y]
    px = out.reshape(h, w, ch)
    if ch == 1:
        return np.repeat(px, 3, axis=2)
    if ch == 2:
        return np.repeat(px[:, :, :1], 3, axis=2)
    return px[:, :, :3].copy()


def _chunk(ctype: bytes, data: bytes) -> bytes:
    return (
        struct.pack(">I", len(data))
        + ctype
        + data
        + struct.pack(">I", zlib.crc32(ctype + data) & 0xFFFFFFFF)
    )


def encode_png(pixels: np.ndarray, filter_type: int = 0) -> bytes:
    """(h, w) or (h, w, ch∈{1,2,3,4}) uint8 -> PNG bytes, every
    scanline filtered with ``filter_type`` (0-4). Filtering operates
    on original bytes, which equal the decoder's reconstructed bytes
    — so each filter_type round-trips exactly through decode_png."""
    px = np.asarray(pixels, dtype=np.uint8)
    if px.ndim == 2:
        px = px[:, :, None]
    h, w, ch = px.shape
    color = {1: 0, 2: 4, 3: 2, 4: 6}[ch]
    flat = px.reshape(h, w * ch).astype(np.int32)
    stride = w * ch
    lines = []
    for y in range(h):
        cur = flat[y]
        prior = flat[y - 1] if y > 0 else np.zeros(stride, dtype=np.int32)
        left = np.concatenate([np.zeros(ch, dtype=np.int32), cur[:-ch]])
        ul = np.concatenate([np.zeros(ch, dtype=np.int32), prior[:-ch]])
        if filter_type == 0:
            out = cur
        elif filter_type == 1:
            out = cur - left
        elif filter_type == 2:
            out = cur - prior
        elif filter_type == 3:
            out = cur - ((left + prior) >> 1)
        elif filter_type == 4:
            pa = np.abs(prior - ul)
            pb = np.abs(left - ul)
            pc = np.abs(left + prior - 2 * ul)
            pred = np.where(
                (pa <= pb) & (pa <= pc), left, np.where(pb <= pc, prior, ul)
            )
            out = cur - pred
        else:
            raise ValueError("filter_type must be 0-4")
        lines.append(bytes([filter_type]) + (out & 0xFF).astype(np.uint8).tobytes())
    ihdr = struct.pack(">IIBBBBB", w, h, 8, color, 0, 0, 0)
    return (
        _SIG
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", zlib.compress(b"".join(lines)))
        + _chunk(b"IEND", b"")
    )
