"""Baseline JPEG codec (pure numpy — no libjpeg/PIL).

The decoder reads Huffman/quant tables from the file's own DHT/DQT
segments, so these tests build conforming JPEGs with the in-repo
encoder across the feature grid (gray/color, 4:4:4 / 4:2:0, restart
markers, odd dimensions) and assert the round-trip error is bounded
by the quantization step — plus rejection (not crash) of junk and
non-baseline streams.
"""

from __future__ import annotations

import numpy as np
import pytest

from skrub_spark.multimodal.jpeg import decode_jpeg, encode_jpeg


def _smooth(h, w):
    yy, xx = np.mgrid[0:h, 0:w]
    base = (128 + 60 * np.sin(xx / 6.0) + 40 * np.cos(yy / 5.0)).clip(0, 255)
    return np.stack(
        [base, np.roll(base, 3, axis=0), 255 - base], axis=2
    ).astype(np.uint8)


@pytest.mark.parametrize("subsample", ["444", "420"])
@pytest.mark.parametrize("restart", [0, 3])
def test_jpeg_roundtrip_modes(subsample, restart):
    img = _smooth(37, 50)  # odd dims: exercises MCU padding + crop
    dec = decode_jpeg(
        encode_jpeg(img, quality=90, subsample=subsample, restart_interval=restart)
    )
    assert dec is not None and dec.shape == img.shape
    err = np.abs(dec.astype(int) - img.astype(int))
    # 444 q90: quant step 2 -> tiny error; 420 adds chroma smoothing
    assert err.mean() < (1.0 if subsample == "444" else 4.0)
    assert err.max() <= (6 if subsample == "444" else 40)


def test_jpeg_quality_monotone():
    img = _smooth(24, 24)
    errs = []
    for q in (100, 90, 50, 10):
        dec = decode_jpeg(encode_jpeg(img, quality=q))
        errs.append(float(np.abs(dec.astype(int) - img.astype(int)).mean()))
    assert errs[0] <= errs[1] <= errs[2] <= errs[3]
    assert errs[0] < 1.0  # q100 = unit quant: only colorspace rounding


def test_jpeg_grayscale():
    g = _smooth(16, 21)[:, :, 0]
    dec = decode_jpeg(encode_jpeg(g, quality=95))
    assert dec is not None and dec.shape == (16, 21, 3)
    # single-component JPEG broadcasts to RGB
    assert np.array_equal(dec[:, :, 0], dec[:, :, 1])
    assert np.abs(dec[:, :, 0].astype(int) - g.astype(int)).mean() < 1.0


def test_jpeg_noise_q100_near_lossless():
    """Unit quant step: error is colorspace round-trip only (<=2/px),
    even on pure noise (the hardest image for a DCT codec)."""
    rng = np.random.default_rng(5)
    noise = rng.integers(0, 256, size=(16, 16, 3), dtype=np.uint8)
    dec = decode_jpeg(encode_jpeg(noise, quality=100))
    assert np.abs(dec.astype(int) - noise.astype(int)).max() <= 2


def test_jpeg_rejects_junk_and_nonbaseline():
    assert decode_jpeg(None) is None
    assert decode_jpeg(b"") is None
    assert decode_jpeg(b"not a jpeg") is None
    assert decode_jpeg(b"\xff\xd8\xff\xe0junkjunk") is None
    real = encode_jpeg(_smooth(8, 8))
    assert decode_jpeg(real[: len(real) // 2]) is None
    # flip SOF0 -> SOF2 (progressive): must return None, not garbage
    prog = bytearray(real)
    idx = prog.find(b"\xff\xc0")
    prog[idx + 1] = 0xC2
    assert decode_jpeg(bytes(prog)) is None


def test_image_near_dup_pipeline_finds_planted_pairs(spark, sf_dir):
    """q_image_near_dup: decode (3 containers) -> grid features ->
    centered-cosine LSH pairs == exactly the planted (d-1, d) pairs."""
    from skrub_spark.queries import q_image_near_dup
    from skrub_spark.sources import load_table

    ids = [
        r["doc_id"]
        for r in load_table(spark, sf_dir, "documents").select("doc_id").collect()
    ]
    want = {(d - 1, d) for d in ids if d % 10 == 1 and (d - 1) in set(ids)}
    got = {
        (r["id_a"], r["id_b"])
        for r in q_image_near_dup(spark, sf_dir).collect()
    }
    assert got == want and len(want) > 0


def test_extract_image_features_real_path(spark):
    """Real features: near-identical pixels -> near-identical
    vectors; different structure -> different vectors; junk -> null."""
    from skrub_spark.multimodal import encode_bmp, extract_image_features

    base = _smooth(24, 24)
    near = (base.astype(int) + 2).clip(0, 255).astype(np.uint8)
    other = (255 - base.astype(int)).astype(np.uint8)
    df = spark.createDataFrame(
        [
            (1, bytearray(encode_bmp(base))),
            (2, bytearray(encode_bmp(near))),
            (3, bytearray(encode_bmp(other))),
            (4, bytearray(b"junk")),
        ],
        "id int, payload binary",
    )
    out = {
        r["id"]: r["features"]
        for r in extract_image_features(df, n_features=16, use_stub=False).collect()
    }
    assert out[4] is None
    a, b, c = (np.array(out[i]) for i in (1, 2, 3))
    assert np.abs(a - b).max() < 0.02
    assert np.abs(a - c).max() > 0.1


def test_decode_image_dispatch_jpeg(spark):
    """decode_images(use_stub=False) handles a JPEG payload through
    the same Arrow-batched pass as BMP/PNG."""
    from skrub_spark.multimodal import decode_images

    img = _smooth(12, 10)
    df = spark.createDataFrame(
        [(1, bytearray(encode_jpeg(img, quality=100)))],
        "id int, payload binary",
    )
    row = decode_images(df, use_stub=False).first()
    assert row["decode_ok"]
    assert abs(row["px_mean"] - float(img.mean())) < 2.0


def test_frame_sample_videos_real_avi(spark):
    """Uncompressed-AVI demux in the Spark pass: evenly-spaced frames
    come back as BMP payloads that re-enter decode_images; junk
    payloads produce one null-frame row."""
    from skrub_spark.multimodal import decode_images, encode_avi, frame_sample_videos

    rng = np.random.default_rng(4)
    frames = [
        rng.integers(0, 256, size=(8, 10, 3), dtype=np.uint8) for _ in range(10)
    ]
    df = spark.createDataFrame(
        [(1, bytearray(encode_avi(frames))), (2, bytearray(b"junk"))],
        "id int, payload binary",
    )
    out = frame_sample_videos(df, n_frames=4, use_stub=False)
    rows = out.collect()
    vid = sorted(
        (r for r in rows if r["id"] == 1), key=lambda r: r["frame_idx"]
    )
    assert [r["frame_idx"] for r in vid] == [0, 2, 5, 7]
    for r in vid:
        assert abs(r["frame_px_mean"] - float(frames[r["frame_idx"]].mean())) < 1e-9
    junk = [r for r in rows if r["id"] == 2]
    assert len(junk) == 1 and junk[0]["frame_idx"] is None
    # frame payloads are decodable BMPs: run them through decode_images
    redec = decode_images(
        out.filter(out.frame_idx.isNotNull()).select(
            "id", "frame_idx", out.frame_payload.alias("payload")
        ),
        use_stub=False,
    ).collect()
    assert len(redec) == 4 and all(r["decode_ok"] for r in redec)
