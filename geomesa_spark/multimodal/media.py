"""Multimodal columns: image/audio/video as opaque binary + typed metadata.

The Spark-side plumbing (schema, partition-aware batching, Arrow UDF
signatures, batch shapes) is real and tested, and so are the image codecs:
PNG (multimodal/png.py — every legal bit depth / color type / interlace,
including Adam7) and JPEG (multimodal/jpeg.py — baseline AND progressive,
ImageIO-cross-checked) decode with pure stdlib+numpy, no Pillow required.
`synth_media`'s deterministic fake header format additionally keeps the
plumbing testable with zero codec work; other real formats (GIF, WebP,
audio, video) raise NotImplementedError unless Pillow is installed, in
which case `_pil_decode` handles them transparently. Corrupt or truncated
blobs of ANY format produce null metadata, never job death."""

from __future__ import annotations

import struct

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    FloatType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

MEDIA_SCHEMA = StructType(
    [
        StructField("media_ref", StringType(), False),
        StructField("media_type", StringType()),
        StructField("content", BinaryType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("duration_ms", LongType()),
    ]
)

_MAGIC = b"FAKEIMG1"


def synth_media(spark: SparkSession, n: int, partitions: int = 8) -> DataFrame:
    """Deterministic fake media blobs: 8-byte magic + packed (w, h, seed) +
    seed-derived payload bytes."""

    def gen(batches):
        for pdf in batches:
            rows = []
            for i in pdf["id"]:
                w = 32 + (int(i) * 31) % 224
                h = 32 + (int(i) * 37) % 224
                seed = int(i) & 0xFFFFFFFF
                rng = np.random.default_rng(seed)
                payload = rng.integers(0, 256, 64, dtype=np.uint8).tobytes()
                content = _MAGIC + struct.pack("<III", w, h, seed) + payload
                mtype = ["image/fake", "audio/fake", "video/fake"][int(i) % 3]
                rows.append(
                    {
                        "media_ref": f"media://{int(i):08x}",
                        "media_type": mtype,
                        "content": content,
                        "width": w,
                        "height": h,
                        "duration_ms": (int(i) % 600) * 1000,
                    }
                )
            yield pd.DataFrame(rows)

    return spark.range(0, n, 1, partitions).mapInPandas(gen, schema=MEDIA_SCHEMA)


def _pil_decode(content: bytes):
    """Optional real-image path: used automatically when Pillow is installed
    (it is NOT in this sandbox — the deterministic header format below keeps
    the Spark-side plumbing fully testable without it)."""
    try:
        import io

        from PIL import Image  # noqa: F401
    except ImportError:
        return None
    img = Image.open(io.BytesIO(content))
    w, h = img.size
    # stable checksum seed from the decoded pixel bytes
    import zlib

    return w, h, zlib.crc32(img.tobytes())


def _parse_header(content: bytes) -> tuple[int, int, int]:
    """Decode one blob to (width, height, checksum_seed).

    Failure contract: raises ValueError for corrupt/truncated data of a
    RECOGNIZED format (any underlying struct.error / IndexError /
    zlib.error / KeyError from the codecs is re-raised as ValueError here,
    ADVICE r6), NotImplementedError for unrecognized formats. Callers in
    the decode UDFs below additionally catch Exception as the last-resort
    null-metadata guard — at 100 TB one bad blob must never kill the job.
    """
    if content is None or not content.startswith(_MAGIC):
        if content:
            from .png import PNG_SIGNATURE, decode_png

            try:
                if content.startswith(PNG_SIGNATURE):
                    # real codec path, pure stdlib+numpy — no Pillow needed
                    import zlib

                    w, h, px = decode_png(bytes(content))
                    return w, h, zlib.crc32(px.tobytes())
                if content.startswith(b"\xff\xd8"):
                    # real JPEG codec, pure numpy (multimodal/jpeg.py;
                    # baseline AND progressive; arithmetic/hierarchical
                    # raise cleanly)
                    import zlib

                    from .jpeg import decode_jpeg

                    w, h, px = decode_jpeg(bytes(content))
                    return w, h, zlib.crc32(px.tobytes())
            except (ValueError, NotImplementedError):
                raise
            except Exception as e:
                # truncated SOF -> struct.error, truncated DHT ->
                # IndexError, corrupt IDAT -> zlib.error, ...: all mean
                # "corrupt blob", normalize so callers need one except arm
                raise ValueError(f"corrupt media blob: {type(e).__name__}: {e}") from e
            real = _pil_decode(content)
            if real is not None:
                return real
        raise NotImplementedError(
            "real media decoding beyond PNG and JPEG requires an image "
            "library (Pillow) not present in this environment — when "
            "installed, _pil_decode handles other formats transparently; "
            "PNG and JPEG (baseline + progressive) decode via the "
            "pure-python codecs (multimodal/png.py, multimodal/jpeg.py)"
        )
    if len(content) < len(_MAGIC) + 12:
        raise ValueError("corrupt media blob: truncated synthetic header")
    w, h, seed = struct.unpack_from("<III", content, len(_MAGIC))
    return w, h, seed


def _log_unexpected_decode_error(e: Exception) -> None:
    """Last-resort guard bookkeeping: ValueError (corrupt blob, normalized
    by _parse_header) and NotImplementedError (unsupported format) are the
    EXPECTED null-metadata cases; anything else is a codec programming bug
    that must stay visible (ADVICE r7) — log one warning per exception type
    per python worker, then still null the row (one bad blob must never
    kill a 100 TB job)."""
    if isinstance(e, (ValueError, NotImplementedError)):
        return
    key = type(e).__name__
    if key not in _UNEXPECTED_DECODE_ERRORS:
        _UNEXPECTED_DECODE_ERRORS.add(key)
        import logging

        logging.getLogger(__name__).warning(
            "unexpected %s while decoding media blob (nulled, but this is "
            "a codec bug, not corrupt data): %s", key, e
        )


_UNEXPECTED_DECODE_ERRORS: set = set()


def decode_image_meta(df: DataFrame, content_col: str = "content") -> DataFrame:
    """mapInPandas decode: per Arrow batch, parse headers -> (decoded_w,
    decoded_h, checksum). The batch shape/schema plumbing is exactly what a
    real decoder uses; only _parse_header changes."""
    out_schema = StructType(
        df.schema.fields
        + [
            StructField("decoded_w", IntegerType()),
            StructField("decoded_h", IntegerType()),
            StructField("checksum", LongType()),
        ]
    )

    def run(batches):
        for pdf in batches:
            ws, hs, cks = [], [], []
            for b in pdf[content_col]:
                try:
                    w, h, seed = _parse_header(bytes(b))
                    ws.append(w)
                    hs.append(h)
                    cks.append(int(np.int64(seed * 2654435761 % (1 << 31))))
                except Exception as e:
                    # unsupported format / corrupt bytes -> null metadata;
                    # unexpected exception types are logged as codec bugs
                    # before nulling (never kill a 100 TB job on one blob)
                    _log_unexpected_decode_error(e)
                    ws.append(None)
                    hs.append(None)
                    cks.append(None)
            pdf["decoded_w"] = pd.array(ws, dtype="Int32")
            pdf["decoded_h"] = pd.array(hs, dtype="Int32")
            pdf["checksum"] = pd.array(cks, dtype="Int64")
            yield pdf

    return df.mapInPandas(run, schema=out_schema)


def extract_features(df: DataFrame, dim: int = 16, content_col: str = "content") -> DataFrame:
    """Feature-extraction plumbing: content -> array<float> embedding.
    Deterministic fake features (seed-derived); a real model would replace
    `fake_embed` with an ONNX/torch call over the same Arrow batches."""
    out_schema = StructType(df.schema.fields + [StructField("features", ArrayType(FloatType()))])

    def run(batches):
        for pdf in batches:
            feats = []
            for b in pdf[content_col]:
                try:
                    _, _, seed = _parse_header(bytes(b))
                    rng = np.random.default_rng(seed)
                    v = rng.normal(0, 1, dim).astype(np.float32)
                    v /= np.linalg.norm(v)
                    feats.append([float(x) for x in v])
                except Exception as e:
                    _log_unexpected_decode_error(e)
                    feats.append(None)
            pdf["features"] = feats
            yield pdf

    return df.mapInPandas(run, schema=out_schema)


def resize_image(df: DataFrame, width: int, height: int) -> DataFrame:
    """Resize image blobs. PNG and baseline-JPEG content are REALLY
    resized: decode via the pure-python codecs, nearest-neighbor resample,
    re-encode — output blobs are valid files of the same format at the new
    dimensions (previously the PNG path prepended the fake-format header
    onto the PNG tail, emitting a corrupt hybrid, ADVICE r5). The synthetic
    fake-format path rewrites its header dims (exercises binary-out UDF
    plumbing); other real formats raise NotImplementedError from
    _parse_header as before."""
    out_schema = df.schema

    def _nn(px, h, w):
        if px.ndim == 2:
            px = px[:, :, None]
        yi = np.minimum(np.arange(height) * h // height, h - 1)
        xi = np.minimum(np.arange(width) * w // width, w - 1)
        return px[yi][:, xi]

    def run(batches):
        from .jpeg import decode_jpeg, encode_jpeg
        from .png import PNG_SIGNATURE, decode_png, encode_png

        for pdf in batches:
            out = []
            for b in pdf["content"]:
                bb = bytes(b)
                if bb.startswith(PNG_SIGNATURE):
                    w, h, px = decode_png(bb)
                    out.append(encode_png(_nn(px, h, w)))
                elif bb.startswith(b"\xff\xd8"):
                    w, h, px = decode_jpeg(bb)
                    rp = _nn(px, h, w)
                    out.append(encode_jpeg(rp[:, :, 0] if rp.shape[2] == 1 else rp))
                else:
                    w, h, seed = _parse_header(bb)
                    out.append(
                        _MAGIC + struct.pack("<III", width, height, seed) + bb[20:]
                    )
            pdf["content"] = out
            pdf["width"] = width
            pdf["height"] = height
            yield pdf

    return df.mapInPandas(run, schema=out_schema)


def frame_sample(df: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Video frame sampling plumbing: one output row per sampled frame
    timestamp (explode). Frame DECODE stays out of scope — no video codec
    in this environment; the image codecs (PNG/JPEG) cover stills."""
    frames = F.sequence(
        F.lit(0),
        F.greatest(F.col("duration_ms") - 1, F.lit(0)),
        F.lit(int(every_ms)),
    )
    return (
        df.filter(F.col("media_type").startswith("video"))
        .withColumn("frame_ms", F.explode(frames))
        .select("media_ref", "frame_ms", "content")
    )


def join_docs_media(docs: DataFrame, media: DataFrame) -> DataFrame:
    """Attach media blobs to documents via the span media_ref (broadcast if
    media is a dimension table; else plain hash join on media_ref)."""
    refs = docs.select(
        "doc_id",
        F.explode(
            F.expr("filter(spans, s -> s.kind = 'media')")
        ).alias("_m"),
    ).select("doc_id", F.col("_m.media_ref").alias("media_ref"))
    return refs.join(media, "media_ref")
