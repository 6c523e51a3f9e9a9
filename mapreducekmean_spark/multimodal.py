"""Multimodal column plumbing: image/audio/video as opaque ``binary``
payloads with typed metadata, processed by Arrow-batched ``mapInPandas``
operators.

The Spark-side machinery here is real and tested — schema, partitioning,
UDF signatures, batch shapes. The *codec* step (actual JPEG/PNG/audio
decode) is stubbed: the image/audio libraries are not in this container,
so ``decode_payload`` raises ``NotImplementedError`` unless
``fake_codec=True``, in which case a deterministic md5-derived fake
"decode" stands in (same output schema as a real decoder would have).

Scale notes: payloads stay in executor memory as Arrow binary columns and
never pass through the driver; per-batch processing bounds peak memory by
``spark.sql.execution.arrow.maxRecordsPerBatch``; feature extraction is a
narrow projection (no shuffle).
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

#: The multimodal asset schema: opaque payload + typed metadata.
ASSET_SCHEMA = T.StructType(
    [
        T.StructField("asset_id", T.LongType(), False),
        T.StructField("modality", T.StringType(), False),  # image|audio|video
        T.StructField("payload", T.BinaryType(), True),
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("width", T.IntegerType(), True),
                    T.StructField("height", T.IntegerType(), True),
                    T.StructField("sample_rate", T.IntegerType(), True),
                    T.StructField("n_frames", T.IntegerType(), True),
                ]
            ),
            True,
        ),
    ]
)

FEATURE_DIM = 8

_FEATURES_SCHEMA = (
    "asset_id bigint, modality string, n_bytes bigint, "
    "checksum string, features array<double>"
)


def assets_from_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Build a deterministic multimodal fixture: document text encoded as
    the binary payload (stand-in for real image/audio bytes), modality
    round-robined, metadata synthesized."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    modality = F.element_at(
        F.array(F.lit("image"), F.lit("audio"), F.lit("video")),
        (F.col("doc_id") % 3 + 1).cast("int"),
    )
    return docs.select(
        F.col("doc_id").alias("asset_id"),
        modality.alias("modality"),
        F.encode("text", "UTF-8").alias("payload"),
        F.struct(
            (F.col("doc_id") % 640 + 1).cast("int").alias("width"),
            (F.col("doc_id") % 480 + 1).cast("int").alias("height"),
            F.lit(16000).alias("sample_rate"),
            (F.col("doc_id") % 30 + 1).cast("int").alias("n_frames"),
        ).alias("meta"),
    )


def _fake_decode(payload: bytes) -> list[float]:
    """Deterministic md5-derived pseudo-features (the stub codec)."""
    h = hashlib.md5(payload).digest()
    return [b / 255.0 for b in h[:FEATURE_DIM]]


try:  # runtime codec detection — PIL is optional in this container
    from PIL import Image as _PILImage
except ImportError:  # pragma: no cover - container has no PIL
    _PILImage = None


def _decode_image_rgb(payload: bytes):
    """Decode image bytes to an HxWx3 uint8 RGB numpy array.

    PIL handles any format it knows when installed; otherwise a
    dependency-free binary-PPM (P6, maxval 255) decoder covers the
    uncompressed case, so the real-bytes pipeline is exercisable even in
    codec-less environments. Returns None when neither applies.
    """
    import io

    import numpy as np

    if _PILImage is not None:
        try:
            with _PILImage.open(io.BytesIO(payload)) as im:
                return np.asarray(im.convert("RGB"), dtype=np.uint8)
        except Exception:
            pass  # fall through to the PPM parser / stub gate
    if payload[:2] == b"P6":
        # header: "P6" <ws> width <ws> height <ws> maxval <single-ws> pixels
        # ('#' comment lines allowed between tokens). Truncated/malformed
        # payloads (b"P6" alone, comment without newline, short pixel data)
        # raise ValueError/IndexError inside the parse — treat them as
        # not-decodable so the caller's capability gate fires instead of a
        # raw parse exception surfacing from executor tasks.
        try:
            pos, tokens = 2, []
            while len(tokens) < 3:
                while pos < len(payload) and payload[pos : pos + 1].isspace():
                    pos += 1
                if payload[pos : pos + 1] == b"#":
                    pos = payload.index(b"\n", pos) + 1
                    continue
                start = pos
                while pos < len(payload) and not payload[pos : pos + 1].isspace():
                    pos += 1
                tokens.append(int(payload[start:pos]))
            w, h, maxval = tokens
            if maxval != 255 or w <= 0 or h <= 0:
                return None
            pix = np.frombuffer(
                payload, dtype=np.uint8, count=w * h * 3, offset=pos + 1
            )
            return pix.reshape(h, w, 3)
        except (ValueError, IndexError):
            return None
    return None


def _image_features(rgb) -> list[float]:
    """FEATURE_DIM deterministic stats from an HxWx3 uint8 array:
    (h/4096, w/4096, mean R, mean G, mean B, min, max, std) — all in
    [0, 1], rounded to 6 dp so results are platform-stable."""
    import numpy as np

    h, w = rgb.shape[:2]
    flat = rgb.astype(np.float64) / 255.0
    feats = [
        h / 4096.0,
        w / 4096.0,
        float(flat[:, :, 0].mean()),
        float(flat[:, :, 1].mean()),
        float(flat[:, :, 2].mean()),
        float(flat.min()),
        float(flat.max()),
        float(flat.std()),
    ]
    return [round(v, 6) for v in feats[:FEATURE_DIM]]


def decode_payload(payload: bytes, modality: str, fake_codec: bool) -> list[float]:
    """Decode one payload to FEATURE_DIM features.

    Real branch: images decode via PIL when installed, else via the
    built-in binary-PPM parser. Everything else (compressed images
    without PIL, audio, video) stays an honest capability gate: raises
    unless ``fake_codec=True``, which substitutes the deterministic
    md5-derived stand-in.
    """
    if fake_codec:
        return _fake_decode(payload)
    rgb = _decode_image_rgb(payload)
    if rgb is not None:
        return _image_features(rgb)
    raise NotImplementedError(
        "real decode for this payload requires codec libraries "
        "(PIL/libav) not present in this environment; supported without "
        "them: binary PPM (P6) images. Pass fake_codec=True for the "
        "deterministic stand-in."
    )


def extract_features(assets: DataFrame, fake_codec: bool = True) -> DataFrame:
    """Arrow-batched feature extraction over binary payloads
    (``mapInPandas``: Iterator[pd.DataFrame] → Iterator[pd.DataFrame],
    one Arrow batch at a time — the multimodal hot-path shape)."""

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = pdf["payload"]
            yield pd.DataFrame(
                {
                    "asset_id": pdf["asset_id"],
                    "modality": pdf["modality"],
                    "n_bytes": payloads.map(
                        lambda p: 0 if p is None else len(p)
                    ).astype("int64"),
                    "checksum": payloads.map(
                        lambda p: hashlib.md5(p or b"").hexdigest()
                    ),
                    "features": payloads.map(
                        lambda p: decode_payload(
                            p or b"", "", fake_codec=fake_codec
                        )
                    ),
                }
            )

    return assets.mapInPandas(op, schema=_FEATURES_SCHEMA)


_RESIZE_SCHEMA = (
    "asset_id bigint, width int, height int, out_width int, out_height int"
)


def resize_plan(assets: DataFrame, max_side: int = 256) -> DataFrame:
    """Resize planning (aspect-preserving clamp) — pure metadata math kept
    JVM-side; the pixel work would live in the stubbed codec."""
    w, h = F.col("meta.width"), F.col("meta.height")
    scale = F.least(
        F.lit(1.0),
        F.lit(float(max_side)) / F.greatest(w, h).cast("double"),
    )
    return assets.filter(F.col("modality") == "image").select(
        "asset_id",
        w.alias("width"),
        h.alias("height"),
        F.greatest(F.round(w * scale).cast("int"), F.lit(1)).alias("out_width"),
        F.greatest(F.round(h * scale).cast("int"), F.lit(1)).alias("out_height"),
    )


def frame_sample_plan(assets: DataFrame, every_n: int = 5) -> DataFrame:
    """Video frame-sampling plan: one output row per selected frame index
    (posexplode over a sequence — the decode of each frame is the stub)."""
    vids = assets.filter(F.col("modality") == "video")
    frames = F.sequence(
        F.lit(0), F.col("meta.n_frames") - 1, F.lit(every_n)
    )
    return vids.select(
        "asset_id", F.posexplode(frames).alias("pos", "frame_idx")
    ).select("asset_id", "pos", "frame_idx")
