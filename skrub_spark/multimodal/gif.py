"""Pure-numpy GIF decoder (and a minimal valid encoder for test
fixtures) — no imaging libraries.

GIF87a/GIF89a: logical screen descriptor + global color table,
extension blocks skipped, first image descriptor decoded — local
color table, interlacing, and the LZW-compressed index stream
(LSB-first bit packing across data sub-blocks, dynamic code widths
up to 12 bits, CLEAR/END control codes). Output composites the
frame onto the logical screen filled with the background color and
returns (h, w, 3) uint8 RGB, or None for anything malformed —
junk payloads must never crash a decode pass (same contract as
``multimodal/png.py`` / ``jpeg.py``).

The encoder writes each pixel as a literal code preceded by CLEAR —
bulky but spec-valid, which is all a round-trip fixture needs.
"""

from __future__ import annotations

import numpy as np


def _lzw_decode(data: bytes, min_code_size: int, max_pixels: int):
    clear = 1 << min_code_size
    end = clear + 1
    code_size = min_code_size + 1
    table: list[list[int]] = [[i] for i in range(clear)] + [[], []]
    out: list[int] = []
    prev: list[int] | None = None
    acc = 0
    nbits = 0
    pos = 0
    n = len(data)
    while pos < n or nbits >= code_size:
        while nbits < code_size and pos < n:
            acc |= data[pos] << nbits
            nbits += 8
            pos += 1
        if nbits < code_size:
            break
        code = acc & ((1 << code_size) - 1)
        acc >>= code_size
        nbits -= code_size
        if code == clear:
            table = [[i] for i in range(clear)] + [[], []]
            code_size = min_code_size + 1
            prev = None
            continue
        if code == end:
            break
        if code < len(table) and table[code]:
            entry = table[code]
        elif code == len(table) and prev is not None:
            entry = prev + [prev[0]]
        else:
            return None  # corrupt stream
        out.extend(entry)
        if prev is not None:
            table.append(prev + [entry[0]])
        prev = entry
        if len(table) == (1 << code_size) and code_size < 12:
            code_size += 1
        if len(out) >= max_pixels:
            break
    return out


_INTERLACE_PASSES = ((0, 8), (4, 8), (2, 4), (1, 2))


def decode_gif(payload: bytes) -> np.ndarray | None:
    """First frame of a GIF87a/GIF89a as (h, w, 3) uint8 RGB, or
    None on any malformation."""
    try:
        b = bytes(payload or b"")
        if b[:4] != b"GIF8" or len(b) < 13:
            return None
        sw = int.from_bytes(b[6:8], "little")
        sh = int.from_bytes(b[8:10], "little")
        flags = b[10]
        bg_idx = b[11]
        pos = 13
        gct = None
        if flags & 0x80:
            gct_len = 2 << (flags & 0x07)
            gct = np.frombuffer(
                b[pos : pos + 3 * gct_len], dtype=np.uint8
            ).reshape(-1, 3)
            pos += 3 * gct_len
        if sw == 0 or sh == 0 or sw * sh > 64_000_000:
            return None
        while pos < len(b):
            block = b[pos]
            if block == 0x21:  # extension: skip sub-blocks
                pos += 2
                while pos < len(b) and b[pos] != 0:
                    pos += 1 + b[pos]
                pos += 1
            elif block == 0x2C:  # image descriptor
                ix = int.from_bytes(b[pos + 1 : pos + 3], "little")
                iy = int.from_bytes(b[pos + 3 : pos + 5], "little")
                iw = int.from_bytes(b[pos + 5 : pos + 7], "little")
                ih = int.from_bytes(b[pos + 7 : pos + 9], "little")
                iflags = b[pos + 9]
                pos += 10
                pal = gct
                if iflags & 0x80:
                    lct_len = 2 << (iflags & 0x07)
                    pal = np.frombuffer(
                        b[pos : pos + 3 * lct_len], dtype=np.uint8
                    ).reshape(-1, 3)
                    pos += 3 * lct_len
                if pal is None or iw == 0 or ih == 0:
                    return None
                min_code = b[pos]
                pos += 1
                if not (2 <= min_code <= 11):
                    return None
                chunks = []
                while pos < len(b) and b[pos] != 0:
                    ln = b[pos]
                    chunks.append(b[pos + 1 : pos + 1 + ln])
                    pos += 1 + ln
                idx = _lzw_decode(b"".join(chunks), min_code, iw * ih)
                if idx is None or len(idx) < iw * ih:
                    return None
                arr = np.asarray(idx[: iw * ih], dtype=np.int32)
                if arr.max() >= len(pal):
                    return None
                frame = pal[arr].reshape(ih, iw, 3)
                if iflags & 0x40:  # interlaced: reorder rows
                    de = np.empty_like(frame)
                    src = 0
                    for start, step in _INTERLACE_PASSES:
                        rows = range(start, ih, step)
                        for r in rows:
                            de[r] = frame[src]
                            src += 1
                    frame = de
                # background index refers to the GLOBAL color table,
                # never a frame's local one
                bg = (
                    gct[bg_idx]
                    if gct is not None and bg_idx < len(gct)
                    else np.zeros(3, dtype=np.uint8)
                )
                canvas = np.tile(
                    bg.astype(np.uint8), (sh, sw, 1)
                )
                y2, x2 = min(sh, iy + ih), min(sw, ix + iw)
                if iy >= sh or ix >= sw:
                    return None
                canvas[iy:y2, ix:x2] = frame[: y2 - iy, : x2 - ix]
                return canvas
            elif block == 0x3B:  # trailer
                return None
            else:
                return None
        return None
    except Exception:
        return None


def encode_gif(pixels: np.ndarray) -> bytes:
    """Minimal valid GIF89a for a (h, w, 3) uint8 image: palette =
    unique colors (<= 256 required), every pixel a literal LZW code
    preceded by CLEAR (bulky, spec-valid — a fixture encoder)."""
    px = np.asarray(pixels, dtype=np.uint8)
    h, w = px.shape[:2]
    flat = px.reshape(-1, 3)
    pal, inv = np.unique(flat, axis=0, return_inverse=True)
    if len(pal) > 256:
        raise ValueError("encode_gif: more than 256 distinct colors")
    pal_bits = max(1, int(np.ceil(np.log2(max(2, len(pal))))))
    pal_size = 1 << pal_bits
    pal_full = np.zeros((pal_size, 3), dtype=np.uint8)
    pal_full[: len(pal)] = pal
    min_code = max(2, pal_bits)
    clear = 1 << min_code
    code_size = min_code + 1

    bits = bytearray()
    acc = 0
    nbits = 0

    def emit(code):
        nonlocal acc, nbits
        acc |= code << nbits
        nbits += code_size
        while nbits >= 8:
            bits.append(acc & 0xFF)
            acc >>= 8
            nbits -= 8

    emit(clear)
    for v in inv.tolist():
        emit(int(v))
        emit(clear)
    emit(clear + 1)  # END
    if nbits:
        bits.append(acc & 0xFF)

    sub = bytearray()
    for i in range(0, len(bits), 255):
        chunk = bits[i : i + 255]
        sub.append(len(chunk))
        sub.extend(chunk)
    sub.append(0)

    header = (
        b"GIF89a"
        + w.to_bytes(2, "little")
        + h.to_bytes(2, "little")
        + bytes([0x80 | (pal_bits - 1), 0, 0])
        + pal_full.tobytes()
    )
    img_desc = (
        b"\x2c"
        + (0).to_bytes(2, "little")
        + (0).to_bytes(2, "little")
        + w.to_bytes(2, "little")
        + h.to_bytes(2, "little")
        + b"\x00"
        + bytes([min_code])
    )
    return header + img_desc + bytes(sub) + b"\x3b"
