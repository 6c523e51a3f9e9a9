"""Multimodal column plumbing: image/audio/video as opaque ``binary``
payloads with typed metadata, processed by Arrow-batched ``mapInPandas``
operators.

The Spark-side machinery here is real and tested — schema, partitioning,
UDF signatures, batch shapes. The *codec* step is real for the formats a
dependency-free parser can cover — binary-PPM (P6), BI_RGB BMP, and
8-bit PNG images (stdlib zlib inflate + scanline unfilter; PIL when
installed widens this to JPEG/WebP/…), RIFF/WAVE PCM audio, and
YUV4MPEG2 (Y4M) video frames — with real resize (``resize_images``) and
frame sampling (``frame_sample``) over them, and an honest capability
gate for everything else (JPEG without PIL, compressed audio/video):
``decode_payload`` raises ``NotImplementedError``
unless ``fake_codec=True``, in which case a deterministic md5-derived
fake "decode" stands in (same output schema as a real decoder would
have); the batch operators use per-row ``ok``/NULL gates instead.

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
    if payload[:2] == b"BM":
        return _decode_bmp_rgb(payload)
    if payload[:8] == b"\x89PNG\r\n\x1a\n":
        return _decode_png_rgb(payload)
    return None


def _decode_png_rgb(payload: bytes):
    """Decode an 8-bit non-interlaced PNG to HxWx3 uint8 RGB using only
    the stdlib (``zlib``) — the first *compressed* format the
    dependency-free codec set covers. Handles color types 0 (gray),
    2 (RGB), 3 (palette), 4 (gray+alpha), 6 (RGBA) and all five scanline
    filters (None/Sub/Up/Average/Paeth). 16-bit, interlaced, or
    malformed payloads return None so the caller's capability gate (or
    PIL, when installed) takes over. The Sub/Average/Paeth unfilter is a
    per-byte Python loop — correct everywhere, fast enough for
    fixture-scale tests; PIL's C path is preferred automatically when
    present (it is tried first in ``_decode_image_rgb``)."""
    import struct
    import zlib

    import numpy as np

    try:
        if payload[:8] != b"\x89PNG\r\n\x1a\n":
            return None
        pos = 8
        ihdr = None
        palette = None
        idat = bytearray()
        while pos + 8 <= len(payload):
            (length,) = struct.unpack_from(">I", payload, pos)
            ctype = payload[pos + 4 : pos + 8]
            body = payload[pos + 8 : pos + 8 + length]
            if len(body) < length:
                return None
            if ctype == b"IHDR":
                w, h, depth, color, comp, filt, interlace = struct.unpack(
                    ">IIBBBBB", body
                )
                if depth != 8 or comp != 0 or filt != 0 or interlace != 0:
                    return None
                if color not in (0, 2, 3, 4, 6):
                    return None
                ihdr = (w, h, color)
            elif ctype == b"PLTE":
                pal = np.frombuffer(body, dtype=np.uint8)
                if pal.size % 3:
                    return None
                palette = pal.reshape(-1, 3)
            elif ctype == b"IDAT":
                idat += body
            elif ctype == b"IEND":
                break
            pos += 12 + length  # length + type + data + crc
        if ihdr is None or not idat:
            return None
        w, h, color = ihdr
        if w <= 0 or h <= 0:
            return None
        channels = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}[color]
        raw = zlib.decompress(bytes(idat))
        stride = w * channels
        if len(raw) < h * (stride + 1):
            return None
        recon = np.empty((h, stride), dtype=np.uint8)
        prev = np.zeros(stride, dtype=np.uint8)
        rpos = 0
        for y in range(h):
            f = raw[rpos]
            rpos += 1
            line = np.frombuffer(
                raw, dtype=np.uint8, count=stride, offset=rpos
            ).copy()
            rpos += stride
            if f == 0:
                pass
            elif f == 2:  # Up — reconstruction is mod 256, uint8 wraps
                line += prev
            elif f in (1, 3, 4):  # Sub/Average/Paeth: true scan dependency
                ln = line.astype(np.int32)
                pr = prev.astype(np.int32)
                out = np.empty(stride, dtype=np.int32)
                for i in range(stride):
                    a = out[i - channels] if i >= channels else 0
                    b = pr[i]
                    if f == 1:
                        pred = a
                    elif f == 3:
                        pred = (a + b) >> 1
                    else:
                        c = pr[i - channels] if i >= channels else 0
                        p = a + b - c
                        pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                        pred = a if pa <= pb and pa <= pc else (
                            b if pb <= pc else c
                        )
                    out[i] = (ln[i] + pred) & 0xFF
                line = out.astype(np.uint8)
            else:
                return None
            recon[y] = line
            prev = recon[y]
        px = recon.reshape(h, w, channels)
        if color == 2:
            rgb = px
        elif color == 6:
            rgb = px[:, :, :3]
        elif color in (0, 4):
            rgb = np.repeat(px[:, :, :1], 3, axis=2)
        else:  # palette
            if palette is None or int(px.max()) >= palette.shape[0]:
                return None
            rgb = palette[px[:, :, 0]]
        return np.ascontiguousarray(rgb)
    except (ValueError, IndexError, struct.error, zlib.error):
        return None


def _decode_bmp_rgb(payload: bytes):
    """Decode an uncompressed (BI_RGB) 24- or 32-bit BMP to HxWx3 uint8
    RGB — the third dependency-free codec branch (after binary-PPM and
    RIFF/WAVE PCM). Pixel rows are BGR(A), padded to 4-byte boundaries,
    bottom-up unless height is negative. Compressed (RLE/bitfield),
    paletted, or truncated payloads return None so the caller's
    capability gate fires."""
    import struct

    import numpy as np

    try:
        if payload[:2] != b"BM" or len(payload) < 54:
            return None
        (data_offset,) = struct.unpack_from("<I", payload, 10)
        (hdr_size,) = struct.unpack_from("<I", payload, 14)
        if hdr_size < 40:  # BITMAPCOREHEADER etc. — not handled
            return None
        if data_offset < 14 + hdr_size:  # pixel data can't overlap headers
            return None
        width, height = struct.unpack_from("<ii", payload, 18)
        _planes, bpp = struct.unpack_from("<HH", payload, 26)
        (compression,) = struct.unpack_from("<I", payload, 30)
        if compression != 0 or bpp not in (24, 32) or width <= 0:
            return None
        flip = height > 0  # positive height = bottom-up row order
        height = abs(height)
        if height == 0:
            return None
        bytes_pp = bpp // 8
        row_stride = (width * bytes_pp + 3) & ~3
        need = data_offset + row_stride * height
        if len(payload) < need:
            return None
        rows = np.frombuffer(
            payload, dtype=np.uint8, count=row_stride * height,
            offset=data_offset,
        ).reshape(height, row_stride)
        pix = rows[:, : width * bytes_pp].reshape(height, width, bytes_pp)
        rgb = pix[:, :, 2::-1]  # BGR(A) -> RGB, alpha dropped
        if flip:
            rgb = rgb[::-1]
        return np.ascontiguousarray(rgb)
    except (ValueError, IndexError, struct.error):
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


def _decode_audio_wav(payload: bytes):
    """Decode a RIFF/WAVE PCM payload to ``(samples, sample_rate)`` —
    ``samples`` a float64 numpy array in [-1, 1] (channels averaged).

    Dependency-free parse of the uncompressed case (PCM format 1, 8- or
    16-bit), the audio analogue of the binary-PPM image branch. Any
    other format or a truncated/malformed payload returns None so the
    caller's capability gate fires instead of a parse exception.
    """
    import struct

    import numpy as np

    try:
        if payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
            return None
        pos = 12
        fmt = None
        while pos + 8 <= len(payload):
            cid = payload[pos : pos + 4]
            (size,) = struct.unpack_from("<I", payload, pos + 4)
            body = payload[pos + 8 : pos + 8 + size]
            if cid == b"fmt ":
                (
                    audio_format,
                    n_channels,
                    sample_rate,
                    _byte_rate,
                    _block_align,
                    bits,
                ) = struct.unpack_from("<HHIIHH", body, 0)
                if audio_format != 1 or n_channels < 1:
                    return None
                fmt = (n_channels, sample_rate, bits)
            elif cid == b"data":
                if fmt is None:
                    return None
                n_channels, sample_rate, bits = fmt
                if bits == 16:
                    raw = np.frombuffer(
                        body, dtype="<i2", count=len(body) // 2
                    ).astype(np.float64) / 32768.0
                elif bits == 8:
                    raw = (
                        np.frombuffer(body, dtype=np.uint8).astype(np.float64)
                        - 128.0
                    ) / 128.0
                else:
                    return None
                if raw.size == 0:
                    return None
                n_frames = raw.size // n_channels
                samples = raw[: n_frames * n_channels].reshape(
                    n_frames, n_channels
                ).mean(axis=1)
                return samples, sample_rate
            # chunks are word-aligned (odd sizes padded with one byte)
            pos += 8 + size + (size % 2)
        return None
    except (ValueError, IndexError, struct.error):
        return None


def _audio_features(samples, sample_rate: int) -> list[float]:
    """FEATURE_DIM deterministic stats from normalized mono samples:
    (log10(n)/10, rate/192k, mean mapped to [0,1], std, min→[0,1],
    max→[0,1], rms, zero-crossing rate) — rounded to 6 dp."""
    import math

    import numpy as np

    n = samples.size
    feats = [
        math.log10(n) / 10.0 if n else 0.0,
        sample_rate / 192_000.0,
        (float(samples.mean()) + 1.0) / 2.0,
        float(samples.std()),
        (float(samples.min()) + 1.0) / 2.0,
        (float(samples.max()) + 1.0) / 2.0,
        float(np.sqrt((samples * samples).mean())),
        float((np.signbit(samples[1:]) != np.signbit(samples[:-1])).mean())
        if n > 1
        else 0.0,
    ]
    return [round(v, 6) for v in feats[:FEATURE_DIM]]


def decode_payload(payload: bytes, modality: str, fake_codec: bool) -> list[float]:
    """Decode one payload to FEATURE_DIM features.

    Real branches: images decode via PIL when installed, else via the
    built-in binary-PPM, uncompressed-BMP, and 8-bit PNG parsers; audio
    decodes via the built-in RIFF/WAVE PCM parser (video frames have
    their own operator, ``frame_sample``, over Y4M). Everything else
    (JPEG/compressed formats without PIL/libav) stays an honest
    capability gate: raises unless ``fake_codec=True``, which
    substitutes the deterministic md5-derived stand-in.
    """
    if fake_codec:
        return _fake_decode(payload)
    rgb = _decode_image_rgb(payload)
    if rgb is not None:
        return _image_features(rgb)
    wav = _decode_audio_wav(payload)
    if wav is not None:
        return _audio_features(*wav)
    raise NotImplementedError(
        "real decode for this payload requires codec libraries "
        "(PIL/libav) not present in this environment; supported without "
        "them: binary PPM (P6), uncompressed BI_RGB BMP, and 8-bit "
        "non-interlaced PNG images, RIFF/WAVE PCM audio, and (via "
        "frame_sample) YUV4MPEG2 video. Pass fake_codec=True for the "
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

    # `op` closes over module-level decode_payload (pickled by
    # reference) — ship the package so workers can import it even when
    # the driver found it via sys.path only
    from mapreducekmean_spark.shipping import ship_package

    ship_package(assets.sparkSession)
    return assets.mapInPandas(op, schema=_FEATURES_SCHEMA)


_RESIZE_SCHEMA = (
    "asset_id bigint, width int, height int, out_width int, out_height int"
)


def resize_plan(assets: DataFrame, max_side: int = 256) -> DataFrame:
    """Resize planning (aspect-preserving clamp) — pure metadata math kept
    JVM-side; ``resize_images`` is the real pixel path for decodable
    formats."""
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


_RESIZED_SCHEMA = (
    "asset_id bigint, in_width int, in_height int, "
    "out_width int, out_height int, ok boolean, out_payload binary"
)


def _resize_rgb(rgb, max_side: int):
    """Aspect-preserving clamp to ``max_side`` via nearest-neighbor
    index sampling — deterministic, dependency-free, and exact for the
    integer grid (the decode-side twin of ``resize_plan``'s metadata
    math)."""
    import math

    import numpy as np

    h, w = rgb.shape[:2]
    scale = min(1.0, float(max_side) / max(h, w))
    # HALF_UP rounding (floor(x + 0.5)) to agree exactly with
    # resize_plan's F.round — Python round() is half-to-even and would
    # disagree on every dimension landing exactly on .5
    oh = max(1, int(math.floor(h * scale + 0.5)))
    ow = max(1, int(math.floor(w * scale + 0.5)))
    ys = np.minimum((np.arange(oh) * (h / oh)).astype(np.int64), h - 1)
    xs = np.minimum((np.arange(ow) * (w / ow)).astype(np.int64), w - 1)
    return rgb[ys][:, xs]


def _encode_ppm(rgb) -> bytes:
    """Serialize HxWx3 uint8 RGB as binary PPM (P6) — the same format
    the decode branch reads, so resize output round-trips through the
    pipeline's own codec."""
    h, w = rgb.shape[:2]
    return f"P6\n{w} {h}\n255\n".encode() + rgb.tobytes()


def resize_images(
    assets: DataFrame, max_side: int = 256, fake_codec: bool = False
) -> DataFrame:
    """REAL image resizing over binary payloads (Arrow-batched
    ``mapInPandas``): decode (PIL / PPM / BMP branches), nearest-neighbor
    clamp to ``max_side``, re-encode as P6 bytes. Payloads that no real
    codec branch can decode yield ``ok = false`` with NULL output (the
    honest per-row form of the capability gate) unless ``fake_codec``,
    which passes the original bytes through unresized, reporting the
    *planned* dimensions from the row's metadata (``resize_plan``'s
    clamp math over ``meta.width``/``meta.height``; NULL when metadata
    is absent). Payload bytes never pass the driver; peak memory is one
    Arrow batch per task."""
    import math

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {
                "asset_id": [], "in_width": [], "in_height": [],
                "out_width": [], "out_height": [], "ok": [],
                "out_payload": [],
            }
            metas = (
                pdf["meta"] if "meta" in pdf.columns else [None] * len(pdf)
            )
            for aid, payload, meta in zip(
                pdf["asset_id"], pdf["payload"], metas
            ):
                rgb = _decode_image_rgb(bytes(payload or b""))
                if rgb is None:
                    ok, iw, ih, ow, oh, pay = False, None, None, None, None, None
                    if fake_codec:
                        ok, pay = True, bytes(payload or b"")
                        if meta and meta.get("width") and meta.get("height"):
                            iw, ih = int(meta["width"]), int(meta["height"])
                            # same HALF_UP clamp as resize_plan/_resize_rgb
                            scale = min(1.0, float(max_side) / max(iw, ih))
                            ow = max(1, int(math.floor(iw * scale + 0.5)))
                            oh = max(1, int(math.floor(ih * scale + 0.5)))
                else:
                    small = _resize_rgb(rgb, max_side)
                    ih, iw = rgb.shape[:2]
                    oh, ow = small.shape[:2]
                    ok, pay = True, _encode_ppm(small)
                out["asset_id"].append(aid)
                out["in_width"].append(iw)
                out["in_height"].append(ih)
                out["out_width"].append(ow)
                out["out_height"].append(oh)
                out["ok"].append(ok)
                out["out_payload"].append(pay)
            yield pd.DataFrame(out)

    from mapreducekmean_spark.shipping import ship_package

    ship_package(assets.sparkSession)
    return assets.filter(F.col("modality") == "image").mapInPandas(
        op, schema=_RESIZED_SCHEMA
    )


def frame_sample_plan(assets: DataFrame, every_n: int = 5) -> DataFrame:
    """Video frame-sampling plan: one output row per selected frame index
    (posexplode over a sequence — metadata only; ``frame_sample`` is the
    real pixel path for Y4M payloads)."""
    vids = assets.filter(F.col("modality") == "video")
    frames = F.sequence(
        F.lit(0), F.col("meta.n_frames") - 1, F.lit(every_n)
    )
    return vids.select(
        "asset_id", F.posexplode(frames).alias("pos", "frame_idx")
    ).select("asset_id", "pos", "frame_idx")


def _decode_y4m_frames(payload: bytes):
    """Decode an uncompressed YUV4MPEG2 (Y4M) stream to a list of HxWx3
    uint8 RGB frames — the video analogue of the PPM/BMP/WAV branches.

    Stdlib-only parse of the C420 (default) and C444 chroma layouts:
    ``YUV4MPEG2 W<w> H<h> ...`` header line, then per frame a ``FRAME``
    marker line followed by raw planes (Y full-res; U,V half-res each
    dimension for 420, full-res for 444). YUV→RGB is BT.601 full-range
    in float64 with final clip+round — deterministic in numpy. Any
    other layout, a malformed header, or truncated planes returns None
    so the caller's capability gate fires.
    """
    import numpy as np

    try:
        if not payload.startswith(b"YUV4MPEG2"):
            return None
        nl = payload.index(b"\n")
        params = payload[:nl].split()[1:]
        w = h = None
        fmt = "420"
        for p in params:
            if p[:1] == b"W":
                w = int(p[1:])
            elif p[:1] == b"H":
                h = int(p[1:])
            elif p[:1] == b"C":
                fmt = p[1:].decode("ascii", "replace")
        if not w or not h or w <= 0 or h <= 0:
            return None
        if fmt.startswith("420"):
            if w % 2 or h % 2:
                return None
            cw, ch = w // 2, h // 2
        elif fmt.startswith("444"):
            cw, ch = w, h
        else:
            return None
        y_sz, c_sz = w * h, cw * ch
        frames = []
        pos = nl + 1
        while pos < len(payload):
            fnl = payload.index(b"\n", pos)
            if payload[pos : pos + 5] != b"FRAME":
                return None
            pos = fnl + 1
            need = y_sz + 2 * c_sz
            if pos + need > len(payload):
                return None
            y = np.frombuffer(payload, np.uint8, y_sz, pos).reshape(h, w)
            u = np.frombuffer(
                payload, np.uint8, c_sz, pos + y_sz
            ).reshape(ch, cw)
            v = np.frombuffer(
                payload, np.uint8, c_sz, pos + y_sz + c_sz
            ).reshape(ch, cw)
            pos += need
            if (ch, cw) != (h, w):  # upsample 420 chroma by replication
                u = u.repeat(2, 0).repeat(2, 1)
                v = v.repeat(2, 0).repeat(2, 1)
            yf = y.astype(np.float64)
            uf = u.astype(np.float64) - 128.0
            vf = v.astype(np.float64) - 128.0
            rgb = np.stack(
                [
                    yf + 1.402 * vf,
                    yf - 0.344136 * uf - 0.714136 * vf,
                    yf + 1.772 * uf,
                ],
                axis=-1,
            )
            frames.append(
                np.clip(np.rint(rgb), 0, 255).astype(np.uint8)
            )
        return frames or None
    except (ValueError, IndexError):
        return None


_FRAMES_SCHEMA = (
    "asset_id bigint, frame_idx int, width int, height int, "
    "ok boolean, frame_payload binary"
)


def frame_sample(
    assets: DataFrame, every_n: int = 5, fake_codec: bool = False
) -> DataFrame:
    """REAL video frame sampling (Arrow-batched ``mapInPandas``): decode
    Y4M payloads, keep every ``every_n``-th frame, emit each as P6 bytes
    ready for the image pipeline (decode → features / resize composes).
    Undecodable payloads yield one ``ok = false`` row (per-row gate);
    ``fake_codec`` emits the planned frame indices with NULL payloads."""

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {
                "asset_id": [], "frame_idx": [], "width": [],
                "height": [], "ok": [], "frame_payload": [],
            }

            def emit(aid, idx, w, h, ok, pay):
                out["asset_id"].append(aid)
                out["frame_idx"].append(idx)
                out["width"].append(w)
                out["height"].append(h)
                out["ok"].append(ok)
                out["frame_payload"].append(pay)

            for aid, payload, nf in zip(
                pdf["asset_id"], pdf["payload"],
                pdf["meta"].map(lambda m: m["n_frames"] if m else None),
            ):
                frames = _decode_y4m_frames(bytes(payload or b""))
                if frames is None:
                    planned = int(nf) if nf is not None else 0
                    if fake_codec and planned > 0:
                        for idx in range(0, planned, every_n):
                            emit(aid, idx, None, None, True, None)
                    else:
                        # always at least one row per asset: silent
                        # disappearance would break per-asset accounting
                        emit(aid, None, None, None, False, None)
                    continue
                for idx in range(0, len(frames), every_n):
                    f = frames[idx]
                    emit(
                        aid, idx, f.shape[1], f.shape[0], True,
                        _encode_ppm(f),
                    )
            yield pd.DataFrame(out)

    from mapreducekmean_spark.shipping import ship_package

    ship_package(assets.sparkSession)
    return assets.filter(F.col("modality") == "video").mapInPandas(
        op, schema=_FRAMES_SCHEMA
    )
