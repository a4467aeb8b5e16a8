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
