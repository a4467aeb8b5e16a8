"""GIF decoder contracts: round-trip against the fixture encoder,
a REAL dictionary-based LZW stream (dynamic code widths), interlace
reordering, and junk tolerance."""

from __future__ import annotations

import numpy as np

from skrub_spark.multimodal.gif import (
    _INTERLACE_PASSES,
    decode_gif,
    encode_gif,
)


def _lzw_compress(indices, min_code_size):
    """Independent textbook LZW compressor (variable code widths,
    dictionary growth, CLEAR only at start) — produces the stream a
    real GIF writer would, unlike encode_gif's literal-only trick."""
    clear = 1 << min_code_size
    end = clear + 1
    table = {(i,): i for i in range(clear)}
    next_code = end + 1
    code_size = min_code_size + 1
    out_bits = bytearray()
    acc = 0
    nbits = 0

    def emit(code, size):
        nonlocal acc, nbits
        acc |= code << nbits
        nbits += size
        while nbits >= 8:
            out_bits.append(acc & 0xFF)
            acc >>= 8
            nbits -= 8

    emit(clear, code_size)
    w = ()
    for k in indices:
        wk = w + (k,)
        if wk in table:
            w = wk
        else:
            emit(table[w], code_size)
            table[wk] = next_code
            next_code += 1
            if next_code - 1 == (1 << code_size) and code_size < 12:
                code_size += 1
            w = (k,)
    if w:
        emit(table[w], code_size)
    emit(end, code_size)
    if nbits:
        out_bits.append(acc & 0xFF)
    return bytes(out_bits)


def _build_gif(px, pal, min_code, data, interlaced=False):
    h, w = px.shape[:2]
    pal_bits = max(1, (len(pal) - 1).bit_length())
    pal_full = np.zeros((1 << pal_bits, 3), np.uint8)
    pal_full[: len(pal)] = pal
    sub = bytearray()
    for i in range(0, len(data), 255):
        chunk = data[i : i + 255]
        sub.append(len(chunk))
        sub.extend(chunk)
    sub.append(0)
    return (
        b"GIF89a"
        + w.to_bytes(2, "little") + h.to_bytes(2, "little")
        + bytes([0x80 | (pal_bits - 1), 0, 0]) + pal_full.tobytes()
        + b"\x2c" + bytes(4)
        + w.to_bytes(2, "little") + h.to_bytes(2, "little")
        + bytes([0x40 if interlaced else 0x00, min_code])
        + bytes(sub) + b"\x3b"
    )


def test_roundtrip_fixture_encoder():
    rng = np.random.default_rng(3)
    img = rng.integers(0, 255, (9, 11, 3), dtype=np.uint8)
    assert np.array_equal(decode_gif(encode_gif(img)), img)


def test_real_lzw_stream_with_code_growth():
    # 64x64 of 4 colors -> dictionary far past the first width bump
    rng = np.random.default_rng(7)
    pal = np.array([[0, 0, 0], [255, 0, 0], [0, 255, 0], [0, 0, 255]], np.uint8)
    idx = rng.integers(0, 4, 64 * 64)
    px = pal[idx].reshape(64, 64, 3)
    data = _lzw_compress(idx.tolist(), 2)
    out = decode_gif(_build_gif(px, pal, 2, data))
    assert np.array_equal(out, px)


def test_interlaced():
    pal = np.array([[i, i, i] for i in range(16)], np.uint8)
    idx = np.arange(16).repeat(4)  # row r = color r, 16x4
    px = pal[idx.reshape(16, 4)]
    # rows stored in interlace pass order
    order = [r for start, step in _INTERLACE_PASSES for r in range(start, 16, step)]
    stored = np.concatenate([idx.reshape(16, 4)[r] for r in order])
    data = _lzw_compress(stored.tolist(), 4)
    out = decode_gif(_build_gif(px, pal, 4, data, interlaced=True))
    assert np.array_equal(out, px)


def test_local_color_table_and_gct_background():
    """A frame with a small LOCAL color table must decode, and the
    canvas background must come from the GLOBAL table even when
    bg_idx is out of range for the LCT (regression: bg was read from
    the active palette)."""
    gct = np.array([[9, 9, 9], [1, 1, 1], [2, 2, 2], [7, 7, 7]], np.uint8)
    lct = np.array([[0, 0, 0], [255, 255, 255]], np.uint8)
    idx = np.array([0, 1, 1, 0])
    data = _lzw_compress(idx.tolist(), 2)
    sub = bytes([len(data)]) + data + b"\x00"
    b = (
        b"GIF89a"
        + (4).to_bytes(2, "little") + (2).to_bytes(2, "little")
        # GCT present (4 entries), bg_idx = 3
        + bytes([0x80 | 0x01, 3, 0]) + gct.tobytes()
        # frame 2x1 at (1,0) with a 2-entry LCT
        + b"\x2c" + (1).to_bytes(2, "little") + (0).to_bytes(2, "little")
        + (2).to_bytes(2, "little") + (1).to_bytes(2, "little")
        + bytes([0x80]) + lct.tobytes() + bytes([2]) + sub + b"\x3b"
    )
    # stored idx has 4 values but frame is 2x1 -> decoder takes first 2
    out = decode_gif(b)
    assert out is not None and out.shape == (2, 4, 3)
    assert np.array_equal(out[0, 1], lct[0]) and np.array_equal(out[0, 2], lct[1])
    # everything else = GCT background color 7,7,7
    assert np.array_equal(out[1, 0], gct[3]) and np.array_equal(out[0, 0], gct[3])


def test_junk_and_truncation_return_none():
    img = np.zeros((5, 5, 3), np.uint8)
    good = encode_gif(img)
    assert decode_gif(good[: len(good) // 2]) is None
    assert decode_gif(b"GIF89a" + b"\x01" * 10) is None
    assert decode_gif(b"not a gif at all") is None
    assert decode_gif(b"") is None
    assert decode_gif(None) is None


def test_dispatch_via_decode_image():
    from skrub_spark.multimodal.columns import decode_image

    img = np.full((6, 7, 3), 42, np.uint8)
    out = decode_image(encode_gif(img))
    assert np.array_equal(out, img)
