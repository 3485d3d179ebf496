"""Pure-python baseline JPEG codec (multimodal/jpeg.py) — roundtrips,
real-file goldens vs an independent decoder, honest failure modes.

The external golden uses Spark's built-in `image` data source (Java
ImageIO, a fully independent JPEG implementation) over the sample photos
shipped inside the local Spark distribution — decoded pixels must agree
within IDCT rounding (|diff| <= 2). Roundtrip tests pin the bitstream
writer/reader pair; all-ones quantization makes the DCT path near-lossless
so the error bound is tight.
"""

from __future__ import annotations

import glob
import os

import numpy as np
import pytest

from geomesa_spark.multimodal.jpeg import decode_jpeg, encode_jpeg

ONES = (np.ones(64, dtype=np.int64), np.ones(64, dtype=np.int64))
SPARK_IMAGES = sorted(
    glob.glob("/opt/spark-*/data/mllib/images/origin/**/*.jpg", recursive=True)
)


def _maxdiff(a, b):
    return int(np.abs(a.astype(int) - b.astype(int)).max())


def test_gray_flat_exact():
    px = np.full((16, 24), 130, dtype=np.uint8)
    w, h, got = decode_jpeg(encode_jpeg(px, quant_tables=ONES))
    assert (w, h) == (24, 16)
    assert got.shape == (16, 24)
    assert _maxdiff(got, px) == 0


def test_gray_random_ones_quant():
    rng = np.random.default_rng(1)
    px = rng.integers(0, 256, size=(33, 41), dtype=np.uint8)  # non-multiple-of-8
    w, h, got = decode_jpeg(encode_jpeg(px, quant_tables=ONES))
    assert (w, h) == (41, 33)
    assert _maxdiff(got, px) <= 2


def test_rgb_444_roundtrip():
    yy, xx = np.mgrid[0:40, 0:56]
    px = np.stack([(yy * 3) % 256, (xx * 2) % 256, (xx + yy) % 256], axis=-1).astype(
        np.uint8
    )
    w, h, got = decode_jpeg(encode_jpeg(px, quant_tables=ONES))
    assert (w, h) == (56, 40) and got.shape == (40, 56, 3)
    assert _maxdiff(got, px) <= 3


def test_rgb_420_constant_chroma():
    rng = np.random.default_rng(5)
    g = rng.integers(0, 256, size=(24, 24), dtype=np.uint8)
    px = np.stack([g, g, g], axis=-1)  # gray content -> constant chroma planes
    w, h, got = decode_jpeg(encode_jpeg(px, subsample="4:2:0", quant_tables=ONES))
    assert (w, h) == (24, 24)
    assert _maxdiff(got, px) <= 2


def test_restart_markers_roundtrip():
    rng = np.random.default_rng(7)
    px = rng.integers(0, 256, size=(40, 40), dtype=np.uint8)
    blob = encode_jpeg(px, quant_tables=ONES, restart_interval=2)
    assert b"\xff\xd0" in blob or b"\xff\xd1" in blob, "RSTn must be on the wire"
    w, h, got = decode_jpeg(blob)
    assert _maxdiff(got, px) <= 2


def test_default_quality_bounded_on_smooth():
    yy, xx = np.mgrid[0:32, 0:32]
    px = ((yy * 4 + xx * 2) % 256).astype(np.uint8)
    w, h, got = decode_jpeg(encode_jpeg(px, quality=90))
    assert _maxdiff(got, px) <= 24  # lossy, but bounded on a smooth ramp


def test_unsupported_sofs_raise_cleanly():
    # hierarchical (SOF5) still raises with a clear message
    blob = (
        b"\xff\xd8\xff\xc5" + b"\x00\x0b" + b"\x08\x00\x08\x00\x08\x01\x01\x11\x00"
    )
    with pytest.raises(NotImplementedError, match="SOF5"):
        decode_jpeg(blob)


def test_progressive_roundtrips():
    """SOF2 encode->decode: interleaved DC scan + per-component AC scans,
    gray / 4:4:4 / 4:2:0 (non-16-multiple dims exercise the effective-vs-
    padded block-grid mapping)."""
    rng = np.random.default_rng(3)
    px = rng.integers(0, 256, size=(33, 41), dtype=np.uint8)
    w, h, got = decode_jpeg(encode_jpeg(px, quant_tables=ONES, progressive=True))
    assert (w, h) == (41, 33)
    assert _maxdiff(got, px) <= 2

    yy, xx = np.mgrid[0:40, 0:56]
    px3 = np.stack([(yy * 3) % 256, (xx * 2) % 256, (xx + yy) % 256], axis=-1).astype(
        np.uint8
    )
    w, h, got = decode_jpeg(encode_jpeg(px3, quant_tables=ONES, progressive=True))
    assert _maxdiff(got, px3) <= 3

    g = rng.integers(0, 256, size=(26, 22), dtype=np.uint8)
    px4 = np.stack([g, g, g], axis=-1)
    w, h, got = decode_jpeg(
        encode_jpeg(px4, subsample="4:2:0", quant_tables=ONES, progressive=True)
    )
    assert _maxdiff(got, px4) <= 2


@pytest.mark.skipif(not SPARK_IMAGES, reason="no Spark sample images on disk")
def test_progressive_real_file_matches_imageio_golden(spark):
    """The progressive sample in the Spark distribution uses EVERY SOF2
    path (DC first Al=1, AC first bands, AC refinement Ah=2->1 and 1->0,
    DC refinement) — decoded pixels must match Java ImageIO within
    rounding."""
    gray = [f for f in SPARK_IMAGES if f.endswith("grayscale.jpg")]
    if not gray:
        pytest.skip("progressive sample absent")
    f = gray[0]
    row = spark.read.format("image").load(f).collect()[0]["image"]
    H, W, C = row["height"], row["width"], row["nChannels"]
    assert C == 1
    ref = np.frombuffer(bytes(row["data"]), dtype=np.uint8).reshape(H, W)
    w, h, got = decode_jpeg(open(f, "rb").read())
    assert (w, h) == (W, H)
    d = np.abs(got.astype(int) - ref.astype(int))
    assert d.max() <= 2, (d.max(), d.mean())


def test_corrupt_jpeg_raises_value_error():
    with pytest.raises(ValueError):
        decode_jpeg(b"\xff\xd8\xff\xe0\x00\x10JFIF\x00\x01" + b"\x00" * 32)


@pytest.mark.skipif(not SPARK_IMAGES, reason="no Spark sample images on disk")
def test_real_photos_decode():
    """EVERY sample photo in the Spark distribution decodes (baseline
    4:2:0 color photos AND the progressive grayscale one) with the
    dimensions its SOF header declares."""
    decoded = 0
    for f in SPARK_IMAGES:
        w, h, px = decode_jpeg(open(f, "rb").read())
        assert px.shape[:2] == (h, w)
        assert px.ndim == 2 or px.shape[2] == 3
        decoded += 1
    assert decoded >= 5, "expected all sample photos to decode"


@pytest.mark.skipif(not SPARK_IMAGES, reason="no Spark sample images on disk")
def test_real_photo_matches_imageio_golden(spark):
    """Independent-decoder golden: Spark's `image` source (Java ImageIO)
    and this codec must produce near-identical pixels on a real 4:2:0
    photo (|diff| <= 2 — IDCT/upsample rounding only)."""
    f = next(f for f in SPARK_IMAGES if f.endswith("54893.jpg"))
    row = spark.read.format("image").load(f).collect()[0]["image"]
    H, W, C = row["height"], row["width"], row["nChannels"]
    assert C == 3
    ref = np.frombuffer(bytes(row["data"]), dtype=np.uint8).reshape(H, W, C)[..., ::-1]
    w, h, got = decode_jpeg(open(f, "rb").read())
    assert (w, h) == (W, H)
    d = np.abs(got.astype(int) - ref.astype(int))
    assert d.max() <= 2, (d.max(), d.mean())


def test_media_pipeline_decodes_real_jpeg(spark):
    """decode_image_meta + resize_image handle real baseline JPEG blobs:
    metadata decodes, resize emits a VALID JPEG at the new dimensions, and
    corrupt JPEG bytes degrade to null metadata instead of failing the
    job."""
    import pandas as pd

    from geomesa_spark.multimodal.media import decode_image_meta, resize_image

    rng = np.random.default_rng(11)
    yy, xx = np.mgrid[0:32, 0:48]
    px = np.stack(
        [(yy * 5) % 256, (xx * 3) % 256, ((xx + yy) * 2) % 256], axis=-1
    ).astype(np.uint8)
    good = encode_jpeg(px, subsample="4:2:0", quality=92)
    corrupt = b"\xff\xd8\xff\xe0\x00\x10JFIF\x00\x01" + bytes(rng.integers(0, 256, 24, dtype=np.uint8))
    df = spark.createDataFrame(
        pd.DataFrame(
            {
                "media_ref": ["ok", "bad"],
                "media_type": ["image/jpeg", "image/jpeg"],
                "content": [good, corrupt],
                "width": [48, 0],
                "height": [32, 0],
            }
        )
    )
    meta = {r.media_ref: r for r in decode_image_meta(df).collect()}
    assert (meta["ok"].decoded_w, meta["ok"].decoded_h) == (48, 32)
    assert meta["bad"].decoded_w is None and meta["bad"].checksum is None

    out = {
        r.media_ref: r
        for r in resize_image(df.filter("media_ref = 'ok'"), 24, 16).collect()
    }
    blob = bytes(out["ok"].content)
    assert blob.startswith(b"\xff\xd8")
    w2, h2, rp = decode_jpeg(blob)
    assert (w2, h2) == (24, 16) and rp.shape == (16, 24, 3)
