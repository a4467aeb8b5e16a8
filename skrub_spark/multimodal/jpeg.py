"""REAL baseline JPEG codec — pure numpy, no libjpeg/PIL.

Decoder: baseline sequential DCT (SOF0/SOF1), 8-bit, any chroma
subsampling (4:4:4 / 4:2:2 / 4:2:0 / grayscale), restart markers,
Huffman + quantization tables read from the file's own DHT/DQT
segments (per ITU T.81 every baseline JPEG carries its tables, so
nothing is hardcoded from the spec's annexes). Progressive (SOF2),
arithmetic coding and 12-bit depth return None — never raise.

Encoder (test/fixture path): baseline 4:4:4 with a FLAT quality-
controlled quantization table and fixed-length canonical Huffman
tables (DC: 12 symbols @ 4 bits, AC: 162 @ 8 bits). Both tables are
written into DQT/DHT, so the output is a conforming JPEG any decoder
reads; fixed-length codes trade compression ratio for simplicity —
fine for fixtures, and the flat table makes round-trip error
analyzable (|err| per DCT coefficient <= quant/2).

IDCT/DCT are exact 8x8 basis-matrix multiplies (vectorized over all
blocks at once), so codec error comes only from quantization.
"""

from __future__ import annotations

import struct

import numpy as np

# ---- shared 8x8 DCT basis -------------------------------------------------

_C = np.zeros((8, 8))
for _u in range(8):
    for _x in range(8):
        _cu = (1.0 / np.sqrt(2.0)) if _u == 0 else 1.0
        _C[_u, _x] = 0.5 * _cu * np.cos((2 * _x + 1) * _u * np.pi / 16.0)

_ZIGZAG = np.array(
    [
        0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
        12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
        35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
        58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
    ]
)  # zigzag scan order -> raster index (T.81 figure A.6 order)


def _idct2(blocks: np.ndarray) -> np.ndarray:
    """(n, 8, 8) coefficient blocks -> spatial, exact basis multiply."""
    return np.einsum("ux,nuv,vy->nxy", _C, blocks, _C)


def _dct2(blocks: np.ndarray) -> np.ndarray:
    return np.einsum("ux,nxy,vy->nuv", _C, blocks, _C)


# ---- decoder --------------------------------------------------------------


class _BitReader:
    """Entropy-segment bit reader: un-stuffs 0xFF00; a bare marker in
    the stream (EOI, or an RST the MCU loop didn't expect) raises,
    which the top-level decode turns into None."""

    def __init__(self, data: bytes, pos: int):
        self.data = data
        self.pos = pos
        self.cur = 0
        self.nbits = 0

    def read_bit(self) -> int:
        if self.nbits == 0:
            d, p = self.data, self.pos
            if p >= len(d):
                raise ValueError("entropy data exhausted")
            b = d[p]
            if b == 0xFF:
                nxt = d[p + 1] if p + 1 < len(d) else 0xD9
                if nxt != 0x00:
                    raise ValueError("marker inside entropy data")
                self.pos = p + 2  # stuffed FF00 -> literal 0xFF
            else:
                self.pos = p + 1
            self.cur = b
            self.nbits = 8
        self.nbits -= 1
        return (self.cur >> self.nbits) & 1

    def receive(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.read_bit()
        return v

    def align_restart(self):
        """Skip to just past the next RSTn marker, reset bit state."""
        self.nbits = 0
        d, p = self.data, self.pos
        while p + 1 < len(d):
            if d[p] == 0xFF and 0xD0 <= d[p + 1] <= 0xD7:
                self.pos = p + 2
                return
            p += 1
        self.pos = len(d)


def _build_huff(bits: list[int], vals: bytes) -> dict[tuple[int, int], int]:
    """DHT (BITS, HUFFVAL) -> {(length, code): symbol} canonical map."""
    table, code, k = {}, 0, 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            table[(length, code)] = vals[k]
            code += 1
            k += 1
        code <<= 1
    return table


def _extend(v: int, size: int) -> int:
    return v - (1 << size) + 1 if size and v < (1 << (size - 1)) else v


def decode_jpeg(payload: bytes) -> np.ndarray | None:
    """Baseline JPEG bytes -> (h, w, 3) uint8 RGB, or None."""
    try:
        return _decode(payload)
    except Exception:
        return None


def _decode(payload: bytes) -> np.ndarray | None:
    if payload is None or len(payload) < 4 or payload[:2] != b"\xff\xd8":
        return None
    d = bytes(payload)
    pos = 2
    qt: dict[int, np.ndarray] = {}
    huff: dict[tuple[int, int], dict] = {}  # (class, id) -> table
    frame = None
    restart = 0
    while pos + 4 <= len(d):
        if d[pos] != 0xFF:
            return None
        marker = d[pos + 1]
        pos += 2
        if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
            continue
        (seglen,) = struct.unpack(">H", d[pos : pos + 2])
        seg = d[pos + 2 : pos + seglen]
        if marker == 0xDB:  # DQT
            s = 0
            while s < len(seg):
                pq, tq = seg[s] >> 4, seg[s] & 15
                if pq != 0:
                    return None  # 16-bit tables: not baseline-8
                qt[tq] = np.frombuffer(
                    seg, dtype=np.uint8, count=64, offset=s + 1
                ).astype(np.int32)
                s += 65
        elif marker == 0xC4:  # DHT
            s = 0
            while s < len(seg):
                tc, th = seg[s] >> 4, seg[s] & 15
                bits = list(seg[s + 1 : s + 17])
                n = sum(bits)
                huff[(tc, th)] = _build_huff(bits, seg[s + 17 : s + 17 + n])
                s += 17 + n
        elif marker in (0xC0, 0xC1):  # SOF0/1 baseline
            prec, h, w, nc = seg[0], *struct.unpack(">HH", seg[1:5]), seg[5]
            if prec != 8 or nc not in (1, 3):
                return None
            comps = []
            for i in range(nc):
                cid, hv, tq = seg[6 + 3 * i : 9 + 3 * i]
                comps.append({"id": cid, "h": hv >> 4, "v": hv & 15, "tq": tq})
            frame = {"h": h, "w": w, "comps": comps}
        elif marker in (0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB):
            return None  # progressive / arithmetic: not baseline
        elif marker == 0xDD:  # DRI
            (restart,) = struct.unpack(">H", seg[:2])
        elif marker == 0xDA:  # SOS -> entropy data follows
            if frame is None:
                return None
            ns = seg[0]
            scan = []
            for i in range(ns):
                cs, tt = seg[1 + 2 * i], seg[2 + 2 * i]
                comp = next(c for c in frame["comps"] if c["id"] == cs)
                scan.append((comp, tt >> 4, tt & 15))
            return _decode_scan(d, pos + seglen, frame, scan, qt, huff, restart)
        elif marker == 0xD9:
            return None
        pos += seglen
    return None


def _huff_decode(br: _BitReader, table: dict) -> int:
    code, length = 0, 0
    while length < 16:
        code = (code << 1) | br.read_bit()
        length += 1
        sym = table.get((length, code))
        if sym is not None:
            return sym
    raise ValueError("bad huffman code")


def _decode_scan(d, pos, frame, scan, qt, huff, restart):
    h, w, comps = frame["h"], frame["w"], frame["comps"]
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    mcux = (w + 8 * hmax - 1) // (8 * hmax)
    mcuy = (h + 8 * vmax - 1) // (8 * vmax)
    planes = {}
    for c in comps:
        planes[c["id"]] = np.zeros(
            (mcuy * c["v"] * 8, mcux * c["h"] * 8), dtype=np.float64
        )
    br = _BitReader(d, pos)
    pred = {c["id"]: 0 for c in comps}
    n_mcu = 0
    for my in range(mcuy):
        for mx in range(mcux):
            if restart and n_mcu and n_mcu % restart == 0:
                br.align_restart()
                pred = {c["id"]: 0 for c in comps}
            n_mcu += 1
            for comp, tdc, tac in scan:
                for by in range(comp["v"]):
                    for bx in range(comp["h"]):
                        zz = np.zeros(64, dtype=np.int32)
                        s = _huff_decode(br, huff[(0, tdc)])
                        diff = _extend(br.receive(s), s) if s else 0
                        pred[comp["id"]] += diff
                        zz[0] = pred[comp["id"]]
                        k = 1
                        while k < 64:
                            rs = _huff_decode(br, huff[(1, tac)])
                            r, s = rs >> 4, rs & 15
                            if s == 0:
                                if r == 15:
                                    k += 16
                                    continue
                                break  # EOB
                            k += r
                            if k > 63:
                                raise ValueError("AC overflow")
                            zz[k] = _extend(br.receive(s), s)
                            k += 1
                        block = np.zeros(64, dtype=np.int32)
                        block[_ZIGZAG] = zz * qt[comp["tq"]]
                        px = _idct2(block.reshape(1, 8, 8))[0] + 128.0
                        y0 = (my * comp["v"] + by) * 8
                        x0 = (mx * comp["h"] + bx) * 8
                        planes[comp["id"]][y0 : y0 + 8, x0 : x0 + 8] = px
    # upsample to full res, crop, color-convert
    full = []
    for c in comps:
        p = planes[c["id"]]
        ry, rx = vmax // c["v"], hmax // c["h"]
        if ry > 1 or rx > 1:
            p = np.repeat(np.repeat(p, ry, axis=0), rx, axis=1)
        full.append(p[:h, :w])
    if len(full) == 1:
        g = np.clip(full[0], 0, 255).astype(np.uint8)
        return np.repeat(g[:, :, None], 3, axis=2)
    y, cb, cr = full[0], full[1] - 128.0, full[2] - 128.0
    r = y + 1.402 * cr
    g = y - 0.344136 * cb - 0.714136 * cr
    b = y + 1.772 * cb
    return np.clip(np.stack([r, g, b], axis=2), 0, 255).astype(np.uint8)


# ---- encoder (fixture path) ----------------------------------------------


def _fixed_table(symbols: bytes, length: int) -> tuple[list[int], bytes]:
    """All symbols at one code length (canonical; needs
    2**length > len(symbols) so the all-ones code stays unused, and
    len(symbols) <= 255 to fit a DHT BITS byte)."""
    assert (1 << length) > len(symbols) and len(symbols) <= 255
    bits = [0] * 16
    bits[length - 1] = len(symbols)
    return bits, symbols


# DC: size categories 0..11. AC: the 162 symbols baseline can emit —
# EOB, ZRL, and (run 0..15, size 1..10); that count is why the
# spec's example AC tables also carry 162 values.
_DC_SYMS = bytes(range(12))
_AC_SYMS = bytes(
    sorted({0x00, 0xF0} | {(r << 4) | s for r in range(16) for s in range(1, 11)})
)
_DC_BITS, _DC_VALS = _fixed_table(_DC_SYMS, 4)
_AC_BITS, _AC_VALS = _fixed_table(_AC_SYMS, 8)
_DC_CODE = {v: (4, i) for i, v in enumerate(_DC_VALS)}
_AC_CODE = {v: (8, i) for i, v in enumerate(_AC_VALS)}


class _BitWriter:
    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, value: int, length: int):
        self.acc = (self.acc << length) | (value & ((1 << length) - 1))
        self.nbits += length
        while self.nbits >= 8:
            self.nbits -= 8
            b = (self.acc >> self.nbits) & 0xFF
            self.out.append(b)
            if b == 0xFF:
                self.out.append(0x00)

    def flush(self):
        if self.nbits:
            pad = 8 - self.nbits
            self.write((1 << pad) - 1, pad)

    def marker(self, byte2: int):
        """1-pad to a byte boundary and emit a raw (unstuffed) marker."""
        self.flush()
        self.out += bytes([0xFF, byte2])


def _size_cat(v: int) -> int:
    return int(abs(v)).bit_length()


def encode_jpeg(
    pixels: np.ndarray,
    quality: int = 90,
    subsample: str = "444",
    restart_interval: int = 0,
) -> bytes:
    """(h, w, 3) RGB or (h, w) gray uint8 -> baseline JPEG bytes.

    ``quality`` 1-100 maps to a flat quant step (100 -> 1, 50 -> 8).
    ``subsample``: "444" (one 8x8 block per component per MCU) or
    "420" (2x2 luma blocks + mean-downsampled chroma per 16x16 MCU).
    ``restart_interval``: emit DRI + RSTn every N MCUs (0 = none) —
    exercises decoder resync + DC-predictor reset.
    """
    px = np.asarray(pixels, dtype=np.float64)
    gray = px.ndim == 2
    if gray:
        px = px[:, :, None]
    h, w = px.shape[:2]
    q = int(round(np.interp(quality, [1, 50, 100], [64, 8, 1])))
    qtab = np.full(64, q, dtype=np.int32)

    def downsample2(p):
        hh = -(-p.shape[0] // 2) * 2
        ww = -(-p.shape[1] // 2) * 2
        p = np.pad(p, ((0, hh - p.shape[0]), (0, ww - p.shape[1])), mode="edge")
        return p.reshape(hh // 2, 2, ww // 2, 2).mean(axis=(1, 3))

    if gray:
        planes = [(px[:, :, 0] - 128.0, 1, 1)]
    else:
        r, g, b = px[:, :, 0], px[:, :, 1], px[:, :, 2]
        y = 0.299 * r + 0.587 * g + 0.114 * b - 128.0
        cb = -0.168736 * r - 0.331264 * g + 0.5 * b
        cr = 0.5 * r - 0.418688 * g - 0.081312 * b
        if subsample == "420":
            planes = [(y, 2, 2), (downsample2(cb), 1, 1), (downsample2(cr), 1, 1)]
        elif subsample == "444":
            planes = [(y, 1, 1), (cb, 1, 1), (cr, 1, 1)]
        else:
            raise ValueError("subsample must be '444' or '420'")
    hmax = max(hv for _, hv, _ in planes)
    vmax = max(vv for _, _, vv in planes)
    mcux = -(-w // (8 * hmax))
    mcuy = -(-h // (8 * vmax))

    coefs = []
    for plane, hv, vv in planes:
        ph, pw = mcuy * vv * 8, mcux * hv * 8
        p = np.pad(
            plane,
            ((0, ph - plane.shape[0]), (0, pw - plane.shape[1])),
            mode="edge",
        )
        blocks = (
            p.reshape(ph // 8, 8, pw // 8, 8).transpose(0, 2, 1, 3)
        ).reshape(-1, 8, 8)
        c = np.round(_dct2(blocks) / qtab.reshape(8, 8)).astype(np.int32)
        coefs.append(c.reshape(ph // 8, pw // 8, 64))

    bw = _BitWriter()
    pred = [0] * len(planes)
    n_mcu, n_rst = 0, 0

    def put_block(zz, ci):
        diff = int(zz[0]) - pred[ci]
        pred[ci] = int(zz[0])
        s = _size_cat(diff)
        ln, code = _DC_CODE[s]
        bw.write(code, ln)
        if s:
            bw.write(diff if diff >= 0 else diff + (1 << s) - 1, s)
        run = 0
        last_nz = max((k for k in range(1, 64) if zz[k]), default=0)
        for k in range(1, last_nz + 1):
            v = int(zz[k])
            if v == 0:
                run += 1
                continue
            while run > 15:
                ln, code = _AC_CODE[0xF0]
                bw.write(code, ln)
                run -= 16
            s = _size_cat(v)
            ln, code = _AC_CODE[(run << 4) | s]
            bw.write(code, ln)
            bw.write(v if v >= 0 else v + (1 << s) - 1, s)
            run = 0
        if last_nz < 63:
            ln, code = _AC_CODE[0x00]
            bw.write(code, ln)

    for my in range(mcuy):
        for mx in range(mcux):
            if restart_interval and n_mcu and n_mcu % restart_interval == 0:
                bw.marker(0xD0 + (n_rst % 8))
                n_rst += 1
                pred = [0] * len(planes)
            n_mcu += 1
            for ci, (coef, (_, hv, vv)) in enumerate(zip(coefs, planes)):
                for by in range(vv):
                    for bx in range(hv):
                        put_block(
                            coef[my * vv + by, mx * hv + bx][_ZIGZAG], ci
                        )
    bw.flush()

    def seg(marker, body):
        return bytes([0xFF, marker]) + struct.pack(">H", len(body) + 2) + body

    nc = len(planes)
    sof = struct.pack(">BHHB", 8, h, w, nc) + b"".join(
        struct.pack(">BBB", i + 1, (hv << 4) | vv, 0)
        for i, (_, hv, vv) in enumerate(planes)
    )
    dht = (
        bytes([0x00]) + bytes(_DC_BITS) + _DC_VALS
        + bytes([0x10]) + bytes(_AC_BITS) + _AC_VALS
    )
    sos = bytes([nc]) + b"".join(
        struct.pack(">BB", i + 1, 0x00) for i in range(nc)
    ) + bytes([0, 63, 0])
    dri = seg(0xDD, struct.pack(">H", restart_interval)) if restart_interval else b""
    return (
        b"\xff\xd8"
        + seg(0xDB, bytes([0x00]) + qtab.astype(np.uint8).tobytes())
        + seg(0xC0, sof)
        + seg(0xC4, dht)
        + dri
        + seg(0xDA, sos)
        + bytes(bw.out)
        + b"\xff\xd9"
    )
