"""IMA ADPCM codec (WAV format tag 0x11) — pure python/numpy.

The classic compressed-audio WAV codec: 4 bits per sample, each
block carrying a (predictor, step-index) header so blocks decode
independently — which is exactly what a distributed decode pass
wants (any byte range of blocks is self-contained). Mono only; the
encoder exists for test fixtures (same nibble quantizer the decoder
inverts, so round-trips are bit-exact on the decoder's own output).

Standard IMA tables (IMA ADPCM reference algorithm, public spec).
"""

from __future__ import annotations

import numpy as np

_INDEX_TABLE = np.array([-1, -1, -1, -1, 2, 4, 6, 8], dtype=np.int64)

_STEP_TABLE = np.array([
    7, 8, 9, 10, 11, 12, 13, 14, 16, 17, 19, 21, 23, 25, 28, 31, 34, 37,
    41, 45, 50, 55, 60, 66, 73, 80, 88, 97, 107, 118, 130, 143, 157, 173,
    190, 209, 230, 253, 279, 307, 337, 371, 408, 449, 494, 544, 598, 658,
    724, 796, 876, 963, 1060, 1166, 1282, 1411, 1552, 1707, 1878, 2066,
    2272, 2499, 2749, 3024, 3327, 3660, 4026, 4428, 4871, 5358, 5894,
    6484, 7132, 7845, 8630, 9493, 10442, 11487, 12635, 13899, 15289,
    16818, 18500, 20350, 22385, 24623, 27086, 29794, 32767,
], dtype=np.int64)


def _step_sample(nibble: int, pred: int, idx: int) -> tuple[int, int]:
    """One IMA ADPCM step: returns (new predictor, new step index)."""
    step = int(_STEP_TABLE[idx])
    diff = step >> 3
    if nibble & 1:
        diff += step >> 2
    if nibble & 2:
        diff += step >> 1
    if nibble & 4:
        diff += step
    if nibble & 8:
        pred -= diff
    else:
        pred += diff
    pred = max(-32768, min(32767, pred))
    idx = max(0, min(88, idx + int(_INDEX_TABLE[nibble & 7])))
    return pred, idx


def decode_ima_blocks(
    data: bytes, block_align: int, samples_per_block: int
) -> np.ndarray | None:
    """Decode mono IMA ADPCM blocks to int16 samples."""
    if block_align < 4 or samples_per_block < 1:
        return None
    out: list[int] = []
    for off in range(0, len(data) - block_align + 1, block_align):
        block = data[off : off + block_align]
        pred = int.from_bytes(block[0:2], "little", signed=True)
        idx = block[2]
        if idx > 88:
            return None
        out.append(pred)
        produced = 1
        for byte in block[4:]:
            for nib in (byte & 0x0F, byte >> 4):
                if produced >= samples_per_block:
                    break
                pred, idx = _step_sample(nib, pred, idx)
                out.append(pred)
                produced += 1
    if not out:
        return None
    return np.asarray(out, dtype=np.int16)


def encode_ima(
    samples: np.ndarray, samples_per_block: int = 505
) -> tuple[bytes, int]:
    """Mono IMA ADPCM encode (test-fixture helper): returns
    (blocks, block_align). Standard quantizer — the decoder
    reconstructs the same predictor sequence the encoder tracked."""
    x = np.asarray(samples, dtype=np.int64)
    if (samples_per_block - 1) % 2:
        raise ValueError("samples_per_block must be odd (1 + 2*nibbles_pairs)")
    block_align = 4 + (samples_per_block - 1) // 2
    out = bytearray()
    pos = 0
    idx = 0
    while pos < len(x):
        chunk = x[pos : pos + samples_per_block]
        pred = int(chunk[0])
        out += int(pred).to_bytes(2, "little", signed=True)
        out.append(idx)
        out.append(0)
        nibbles: list[int] = []
        for s in chunk[1:]:
            step = int(_STEP_TABLE[idx])
            diff = int(s) - pred
            nib = 0
            if diff < 0:
                nib = 8
                diff = -diff
            if diff >= step:
                nib |= 4
                diff -= step
            if diff >= step >> 1:
                nib |= 2
                diff -= step >> 1
            if diff >= step >> 2:
                nib |= 1
            pred, idx = _step_sample(nib, pred, idx)
            nibbles.append(nib)
        nibbles += [0] * (((samples_per_block - 1) - len(nibbles)))
        for lo, hi in zip(nibbles[0::2], nibbles[1::2]):
            out.append(lo | (hi << 4))
        pos += samples_per_block
    return bytes(out), block_align
