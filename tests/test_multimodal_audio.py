"""Audio feature extraction (pure-numpy FFT fingerprint) and the
end-to-end audio near-dup pipeline."""

from __future__ import annotations

import numpy as np

from skrub_spark.multimodal import decode_wav, encode_wav, extract_audio_features


def _tone(freq: float, n: int = 4096, rate: int = 16000, seed: int = 0):
    rng = np.random.default_rng(seed)
    t = np.arange(n) / rate
    x = np.sin(2 * np.pi * freq * t) + rng.standard_normal(n) * 0.005
    return (x / np.abs(x).max() * 20000).astype("<i2")


def test_wav_roundtrip():
    s = _tone(440.0)
    dec = decode_wav(encode_wav(s, rate=16000))
    assert dec is not None
    samples, rate = dec
    assert rate == 16000 and np.array_equal(samples, s)


def test_band_features_localize_frequency(spark):
    """A low tone's energy lands in low bands, a high tone's in high
    bands; a noisy copy of the same tone is near-identical while the
    other tone is far — the locality the near-dup pipeline needs."""
    low, high = _tone(500.0), _tone(7000.0)
    low_noisy = np.clip(
        low.astype(int)
        + (np.random.default_rng(1).standard_normal(len(low)) * 100).astype(int),
        -32768, 32767,
    ).astype("<i2")
    df = spark.createDataFrame(
        [
            (1, bytearray(encode_wav(low))),
            (2, bytearray(encode_wav(high))),
            (3, bytearray(encode_wav(low_noisy))),
            (4, bytearray(b"not a wav")),
        ],
        "id int, payload binary",
    )
    out = {
        r["id"]: r["features"]
        for r in extract_audio_features(df, n_features=16).collect()
    }
    assert out[4] is None
    a, b, c = (np.array(out[i]) for i in (1, 2, 3))
    assert int(np.argmax(a)) < 4 and int(np.argmax(b)) > 10
    def cos(u, v):
        u, v = u - u.mean(), v - v.mean()
        return float(u @ v / (np.linalg.norm(u) * np.linalg.norm(v)))
    assert cos(a, c) > 0.99
    assert cos(a, b) < 0.9


def test_audio_near_dup_pipeline_finds_planted_pairs(spark, sf_dir):
    from skrub_spark.queries import q_audio_near_dup
    from skrub_spark.sources import load_table

    ids = {
        r["doc_id"]
        for r in load_table(spark, sf_dir, "documents").select("doc_id").collect()
    }
    want = {(d - 1, d) for d in ids if d % 10 == 1 and (d - 1) in ids}
    got = {
        (r["id_a"], r["id_b"])
        for r in q_audio_near_dup(spark, sf_dir).collect()
    }
    assert got == want and len(want) > 0


def _wav_bytes(tag, bits, rate, data):
    fmt = (
        tag.to_bytes(2, "little") + (1).to_bytes(2, "little")
        + rate.to_bytes(4, "little")
        + (rate * bits // 8).to_bytes(4, "little")
        + (bits // 8).to_bytes(2, "little") + bits.to_bytes(2, "little")
    )
    chunks = b"fmt " + len(fmt).to_bytes(4, "little") + fmt
    chunks += b"data" + len(data).to_bytes(4, "little") + data
    return b"RIFF" + (4 + len(chunks)).to_bytes(4, "little") + b"WAVE" + chunks


def test_decode_wav_pcm8():
    import numpy as np

    # unsigned 8-bit: 128 -> 0, 255 -> 32512, 0 -> -32768
    out = decode_wav(_wav_bytes(1, 8, 8000, bytes([128, 255, 0])))
    assert out is not None
    samples, rate = out
    assert rate == 8000
    assert samples.tolist() == [0, (255 - 128) << 8, -32768]
    assert samples.dtype == np.int16


def test_decode_wav_ulaw():
    import numpy as np

    # G.711 landmark codes: the two zero codes and the two extremes.
    enc = bytes([0xFF, 0x7F, 0x80, 0x00])
    out = decode_wav(_wav_bytes(7, 8, 8000, enc))
    assert out is not None
    samples, rate = out
    assert samples.dtype == np.int16
    # 0xFF is +0, 0x7F is -0 in mu-law
    assert samples[0] == 0 and samples[1] == 0
    # 0x80 / 0x00 are the extremes +-32124 (8031 << 2, the standard
    # 16-bit-scaled decode table), sign-symmetric
    assert samples[2] == 32124 and samples[3] == -32124


def test_decode_wav_rejects_unknown_format():
    assert decode_wav(_wav_bytes(3, 32, 8000, b"\x00" * 8)) is None  # float
    assert decode_wav(b"RIFFxxxxWAVE") is None
    assert decode_wav(b"junk") is None


def test_decode_wav_pcm16_still_roundtrips():
    import numpy as np

    s = (np.sin(np.linspace(0, 20, 400)) * 20000).astype(np.int16)
    out = decode_wav(_wav_bytes(1, 16, 16000, s.tobytes()))
    assert out is not None and np.array_equal(out[0], s) and out[1] == 16000


def _ima_wav_bytes(rate, blocks, block_align, spb):
    fmt = (
        (0x11).to_bytes(2, "little") + (1).to_bytes(2, "little")
        + rate.to_bytes(4, "little")
        + (rate // 2).to_bytes(4, "little")
        + block_align.to_bytes(2, "little") + (4).to_bytes(2, "little")
        + (2).to_bytes(2, "little")       # cbSize
        + spb.to_bytes(2, "little")       # samples per block
    )
    chunks = b"fmt " + len(fmt).to_bytes(4, "little") + fmt
    chunks += b"data" + len(blocks).to_bytes(4, "little") + blocks
    return b"RIFF" + (4 + len(chunks)).to_bytes(4, "little") + b"WAVE" + chunks


def test_decode_wav_ima_adpcm_tracks_signal():
    """IMA ADPCM round trip: a slow sine encoded with the standard
    quantizer must decode CLOSE to the original (4-bit ADPCM is
    lossy; the adaptive step keeps error small on smooth signals),
    across multiple independently-seeded blocks."""
    import numpy as np

    from skrub_spark.multimodal.adpcm import encode_ima

    t = np.arange(2000)
    sig = (8000 * np.sin(2 * np.pi * t / 200)).astype(np.int16)
    blocks, align = encode_ima(sig, samples_per_block=505)
    out = decode_wav(_ima_wav_bytes(8000, blocks, align, 505))
    assert out is not None
    dec, rate = out
    assert rate == 8000
    assert len(dec) >= len(sig) - 505  # final block zero-padded
    err = np.abs(dec[: len(sig)].astype(np.int64) - sig[: len(dec)].astype(np.int64))
    assert float(np.mean(err)) < 200          # tracks the waveform
    assert float(np.max(err)) < 4000          # no runaway divergence


def test_decode_wav_ima_adpcm_block_header_exact():
    """Each block's first sample is the stored predictor verbatim."""
    import numpy as np

    from skrub_spark.multimodal.adpcm import encode_ima

    sig = np.array([1234] + [1234] * 504 + [-4321] + [-4321] * 504, np.int16)
    blocks, align = encode_ima(sig, samples_per_block=505)
    dec, _ = decode_wav(_ima_wav_bytes(8000, blocks, align, 505))
    assert dec[0] == 1234 and dec[505] == -4321


def test_decode_wav_ima_adpcm_fact_clips_padded_tail():
    """encode_wav_adpcm writes a fact chunk, so a signal whose length
    is NOT a multiple of samples_per_block decodes to EXACTLY its
    true length — the zero-padded tail of the final block is clipped
    (ADVICE r5); a fact-less file keeps the documented padded tail."""
    import numpy as np

    from skrub_spark.multimodal.adpcm import encode_ima
    from skrub_spark.multimodal.columns import encode_wav_adpcm

    n = 505 + 123  # one full block + a partial one
    t = np.arange(n)
    sig = (6000 * np.sin(2 * np.pi * t / 150)).astype(np.int16)
    dec, rate = decode_wav(encode_wav_adpcm(sig, rate=8000))
    assert rate == 8000
    assert len(dec) == n
    # without a fact chunk the padded tail survives (back-compat)
    blocks, align = encode_ima(sig, samples_per_block=505)
    dec2, _ = decode_wav(_ima_wav_bytes(8000, blocks, align, 505))
    assert len(dec2) == 2 * 505


def test_decode_wav_ima_adpcm_rejects_short_and_junk():
    # data shorter than one block -> no decodable samples
    assert decode_wav(_ima_wav_bytes(8000, b"\x00" * 3, 256, 505)) is None
    bad = bytearray(_ima_wav_bytes(8000, b"\x00\x00\x60\x00" + b"\x00" * 252, 256, 505))
    # step index 0x60 = 96 > 88 -> malformed
    assert decode_wav(bytes(bad)) is None
