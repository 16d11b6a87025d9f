"""Multimodal column support (EXT surface, BASELINE.json north star).

Images/audio/video are opaque ``binary`` columns + a typed metadata
struct. The Spark-side plumbing — schema, partition-preserving batch
iteration, Arrow transfer shape — is real and tested. Byte decoding:
**PNG and baseline JPEG payloads decode/resize FOR REAL** via the
pure-stdlib codecs in ``functions/png_codec.py`` and
``functions/jpeg_codec.py`` (zlib/chunk/scanline parsing; Huffman +
IDCT + chroma upsampling — zero new dependencies); other formats
(progressive JPEG, audio, video) keep their honest seam, raising
``NotImplementedError`` in strict mode or producing a clearly-marked
deterministic fake in test mode, because those codec libraries
(PIL/soundfile/ffmpeg) are not in this container.

Design for 100 TB: media bytes travel in the ``content`` column of
Parquet row groups; decode/feature-extraction runs as ``mapInPandas``
over partition-sized Arrow batches (no driver involvement, no shuffle);
per-file metadata stays in typed columns so filters on (modality, width,
duration, …) prune BEFORE any byte is decoded.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_META_SCHEMA = T.StructType(
    [
        T.StructField("modality", T.StringType(), False),  # image|audio|video
        T.StructField("format", T.StringType(), True),  # png|wav|mp4|...
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("duration_ms", T.LongType(), True),
        T.StructField("sample_rate", T.IntegerType(), True),
    ]
)

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("content", T.BinaryType(), True),
        T.StructField("meta", MEDIA_META_SCHEMA, True),
    ]
)


def with_content_stats(df: DataFrame, content_col: str = "content") -> DataFrame:
    """Byte-level stats that need no decoding: size + content hash.
    Native exprs — run at full scan speed for corpus accounting/dedup."""
    return df.withColumn(
        "content_bytes", F.octet_length(F.col(content_col)).cast("long")
    ).withColumn("content_sha256", F.sha2(F.col(content_col), 256))


_DECODE_OUT_SCHEMA = (
    "media_id long, modality string, feat array<float>, decode_ok boolean"
)


def decode_and_featurize(
    df: DataFrame,
    deterministic_fake: bool = False,
    feat_dim: int = 8,
) -> DataFrame:
    """Decode media bytes and emit a feature vector per item, as
    ``mapInPandas`` over Arrow batches (the shape a real CLIP/whisper
    featurizer would use: batch in, batch out, executor-local).

    PNG and baseline JPEG payloads decode FOR REAL (``png_codec`` /
    ``jpeg_codec``): the feature is [width, height, channels,
    per-channel pixel means…] zero-padded to ``feat_dim`` — genuine
    pixel statistics, not a hash. A malformed payload yields
    ``decode_ok=False`` (never a crashed batch). Other formats keep the
    codec seam: ``deterministic_fake=True`` emits a reproducible
    content-hash fake (plumbing tests); otherwise they raise
    ``NotImplementedError`` exactly where PIL/soundfile/ffmpeg would
    plug in."""

    def batch_fn(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib

        from . import jpeg_codec, png_codec

        for pdf in it:
            feats, oks = [], []
            for content in pdf["content"]:
                if content is None:
                    feats.append(None)
                    oks.append(False)
                    continue
                b = bytes(content)
                if png_codec.is_png(b) or jpeg_codec.is_jpeg(b):
                    try:
                        s = (
                            png_codec.png_stats(b)
                            if png_codec.is_png(b)
                            else jpeg_codec.jpeg_stats(b)
                        )
                    except (png_codec.PngFormatError, jpeg_codec.JpegFormatError):
                        feats.append(None)
                        oks.append(False)
                        continue
                    f = [
                        float(s["width"]),
                        float(s["height"]),
                        float(s["channels"]),
                        *s["channel_means"],
                    ]
                    feats.append((f + [0.0] * feat_dim)[:feat_dim])
                    oks.append(True)
                elif deterministic_fake:
                    digest = hashlib.sha256(b).digest()
                    feats.append([x / 255.0 for x in digest[:feat_dim]])
                    oks.append(True)
                else:
                    raise NotImplementedError(
                        "media decode beyond PNG/baseline-JPEG requires "
                        "codec libraries (PIL/soundfile/ffmpeg) not present "
                        "in this environment; PNG and baseline JPEG decode "
                        "natively — pass deterministic_fake=True to "
                        "exercise the plumbing for other formats"
                    )
            out = pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "modality": [m["modality"] if m is not None else None for m in pdf["meta"]],
                    "feat": feats,
                    "decode_ok": oks,
                }
            )
            yield out

    return df.mapInPandas(batch_fn, schema=_DECODE_OUT_SCHEMA)


_RESIZE_OUT_SCHEMA = (
    "media_id long, content binary, width int, height int, resized_ok boolean"
)


def resize_media(
    df: DataFrame,
    width: int,
    height: int,
    deterministic_fake: bool = False,
) -> DataFrame:
    """Resize image payloads to (width, height) — ``mapInPandas`` over
    Arrow batches, executor-local, partition-preserving (the shape a real
    PIL/opencv resize would use; at 100 TB this is the pre-processing
    stage before feature extraction, pipelined with the scan).

    PNG and baseline JPEG payloads resize FOR REAL: decode
    (``png_codec`` / ``jpeg_codec``) → nearest-neighbor resample →
    re-encode in the SAME format at the target dimensions (round-trip
    decodable; pixel-exact nearest sampling, then JPEG's usual lossy
    re-encode for JPEG payloads). A malformed payload yields
    ``resized_ok=False``. Other formats keep the codec seam:
    ``deterministic_fake=True`` truncates/right-pads the raw bytes to
    exactly width*height — a reproducible stand-in with the correct
    output SHAPE; strict mode raises where PIL/opencv plugs in."""
    target = width * height

    def batch_fn(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from . import jpeg_codec, png_codec

        for pdf in it:
            outs = []
            for content in pdf["content"]:
                if content is None:
                    outs.append(None)
                    continue
                b = bytes(content)
                if png_codec.is_png(b):
                    try:
                        w0, h0, ch, pixels = png_codec.decode_png(b)
                        outs.append(
                            png_codec.encode_png(
                                width,
                                height,
                                ch,
                                png_codec.resize_nearest(
                                    pixels, w0, h0, ch, width, height
                                ),
                            )
                        )
                    except png_codec.PngFormatError:
                        outs.append(None)
                elif jpeg_codec.is_jpeg(b):
                    try:
                        w0, h0, ch, pixels = jpeg_codec.decode_jpeg(b)
                        outs.append(
                            jpeg_codec.encode_jpeg(
                                width,
                                height,
                                ch,
                                png_codec.resize_nearest(
                                    pixels, w0, h0, ch, width, height
                                ),
                                quality=90,
                            )
                        )
                    except jpeg_codec.JpegFormatError:
                        outs.append(None)
                elif deterministic_fake:
                    outs.append(b[:target].ljust(target, b"\x00"))
                else:
                    raise NotImplementedError(
                        "image resize beyond PNG/baseline-JPEG requires "
                        "codec libraries (PIL/opencv) not present in this "
                        "environment; PNG and baseline JPEG resize "
                        "natively — pass deterministic_fake=True"
                    )
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "content": outs,
                    "width": width,
                    "height": height,
                    "resized_ok": [o is not None for o in outs],
                }
            )

    return df.mapInPandas(batch_fn, schema=_RESIZE_OUT_SCHEMA)


_FRAMES_OUT_SCHEMA = (
    "media_id long, frame_idx long, frame_ts_ms long, frame binary"
)


def sample_frames(
    df: DataFrame,
    every_ms: int = 1000,
    deterministic_fake: bool = False,
) -> DataFrame:
    """Sample video frames every ``every_ms`` — a FAN-OUT mapInPandas
    (one input row → duration/every_ms output rows), the decode-side
    explode a real ffmpeg sampler performs. Frame count comes from the
    TYPED metadata (meta.duration_ms), so pruning by duration happens
    before any byte is touched.

    STUB: fake frames are deterministic byte slices of the content;
    strict mode raises where ffmpeg would plug in."""

    def batch_fn(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            if not deterministic_fake:
                raise NotImplementedError(
                    "frame sampling requires ffmpeg, not present in this "
                    "environment; pass deterministic_fake=True"
                )
            ids, idxs, tss, frames = [], [], [], []
            for mid, content, meta in zip(
                pdf["media_id"], pdf["content"], pdf["meta"]
            ):
                dur = (meta or {}).get("duration_ms")
                if content is None or dur is None:
                    continue
                b = bytes(content)
                n_frames = max(int(dur) // every_ms, 1)
                for i in range(n_frames):
                    ids.append(mid)
                    idxs.append(i)
                    tss.append(i * every_ms)
                    start = (i * 16) % max(len(b), 1)
                    frames.append(b[start : start + 16])
            yield pd.DataFrame(
                {
                    "media_id": ids,
                    "frame_idx": idxs,
                    "frame_ts_ms": tss,
                    "frame": frames,
                }
            )

    return df.mapInPandas(batch_fn, schema=_FRAMES_OUT_SCHEMA)


def documents_as_png_media(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    width: int = 16,
    height: int = 16,
) -> DataFrame:
    """Adapter used by tests/queries: render each document's UTF-8 bytes
    as a REAL grayscale PNG payload (truncated/zero-padded to
    width×height pixels, encoded by ``png_codec``) so the genuine decode
    path runs against the driver-provided tables — deterministic,
    derived entirely from driver data, and a spec-valid PNG any decoder
    opens. Runs as ``mapInPandas`` (encode is Python; this is the
    test-fixture path, not a hot operator)."""
    from . import png_codec

    n_px = width * height

    def batch_fn(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            payloads = []
            for text in pdf[text_col]:
                if text is None:
                    payloads.append(None)
                    continue
                raw = text.encode("utf-8")[:n_px].ljust(n_px, b"\x00")
                payloads.append(png_codec.encode_png(width, height, 1, raw))
            yield pd.DataFrame(
                {
                    "media_id": pdf[id_col],
                    "content": payloads,
                    "fmt": "png",
                    "width": width,
                    "height": height,
                }
            )

    enc = df.select(id_col, text_col).mapInPandas(
        batch_fn,
        schema="media_id long, content binary, fmt string, width int, height int",
    )
    return enc.select(
        "media_id",
        "content",
        F.struct(
            F.lit("image").alias("modality"),
            F.col("fmt").alias("format"),
            F.col("width"),
            F.col("height"),
            F.lit(None).cast("long").alias("duration_ms"),
            F.lit(None).cast("int").alias("sample_rate"),
        ).alias("meta"),
    )


def documents_as_jpeg_media(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    width: int = 16,
    height: int = 16,
    quality: int = 90,
) -> DataFrame:
    """Adapter used by tests/queries: render each document's UTF-8 bytes
    as a REAL baseline-JPEG payload (grayscale, truncated/zero-padded to
    width×height pixels, encoded by ``jpeg_codec``) — deterministic,
    derived entirely from driver data, and a spec-valid JFIF file any
    decoder opens. Mirrors ``documents_as_png_media`` for the dominant
    web format."""
    from . import jpeg_codec

    n_px = width * height

    def batch_fn(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            payloads = []
            for text in pdf[text_col]:
                if text is None:
                    payloads.append(None)
                    continue
                raw = text.encode("utf-8")[:n_px].ljust(n_px, b"\x00")
                payloads.append(
                    jpeg_codec.encode_jpeg(width, height, 1, raw, quality)
                )
            yield pd.DataFrame(
                {
                    "media_id": pdf[id_col],
                    "content": payloads,
                    "fmt": "jpeg",
                    "width": width,
                    "height": height,
                }
            )

    enc = df.select(id_col, text_col).mapInPandas(
        batch_fn,
        schema="media_id long, content binary, fmt string, width int, height int",
    )
    return enc.select(
        "media_id",
        "content",
        F.struct(
            F.lit("image").alias("modality"),
            F.col("fmt").alias("format"),
            F.col("width"),
            F.col("height"),
            F.lit(None).cast("long").alias("duration_ms"),
            F.lit(None).cast("int").alias("sample_rate"),
        ).alias("meta"),
    )


def documents_as_mixed_media(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    width: int = 16,
    height: int = 16,
) -> DataFrame:
    """PNG payloads for even ids, baseline JPEG for odd — one corpus
    exercising BOTH real decoders in a single mapInPandas pass (the
    mixed-format reality of a scraped 100 TB image corpus)."""
    from . import jpeg_codec, png_codec

    n_px = width * height

    def batch_fn(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            payloads, fmts = [], []
            for mid, text in zip(pdf[id_col], pdf[text_col]):
                if text is None:
                    payloads.append(None)
                    fmts.append(None)
                    continue
                raw = text.encode("utf-8")[:n_px].ljust(n_px, b"\x00")
                if int(mid) % 2 == 0:
                    payloads.append(png_codec.encode_png(width, height, 1, raw))
                    fmts.append("png")
                else:
                    payloads.append(
                        jpeg_codec.encode_jpeg(width, height, 1, raw, 90)
                    )
                    fmts.append("jpeg")
            yield pd.DataFrame(
                {
                    "media_id": pdf[id_col],
                    "content": payloads,
                    "fmt": fmts,
                    "width": width,
                    "height": height,
                }
            )

    enc = df.select(id_col, text_col).mapInPandas(
        batch_fn,
        schema="media_id long, content binary, fmt string, width int, height int",
    )
    return enc.select(
        "media_id",
        "content",
        F.struct(
            F.lit("image").alias("modality"),
            F.col("fmt").alias("format"),
            F.col("width"),
            F.col("height"),
            F.lit(None).cast("long").alias("duration_ms"),
            F.lit(None).cast("int").alias("sample_rate"),
        ).alias("meta"),
    )


def documents_as_media(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Adapter used by tests/queries: treat document text bytes as an
    opaque media payload so the multimodal plumbing is exercised against
    the driver-provided tables (no synthetic data generated)."""
    return df.select(
        F.col(id_col).alias("media_id"),
        F.encode(F.col(text_col), "UTF-8").alias("content"),
        F.struct(
            F.lit("image").alias("modality"),
            F.lit("raw").alias("format"),
            F.lit(None).cast("int").alias("width"),
            F.lit(None).cast("int").alias("height"),
            # pseudo-duration (1 "ms" per byte) so frame-sampling plumbing
            # has a deterministic, metadata-driven fan-out to exercise
            F.octet_length(F.encode(F.col(text_col), "UTF-8"))
            .cast("long")
            .alias("duration_ms"),
            F.lit(None).cast("int").alias("sample_rate"),
        ).alias("meta"),
    )
