"""Multimodal column support (EXT surface, BASELINE.json north star).

Images/audio/video are opaque ``binary`` columns + a typed metadata
struct. The Spark-side plumbing — schema, partition-preserving batch
iteration, Arrow transfer shape — is real and tested; the actual
byte-decoding (PIL/ffmpeg et al.) is STUBBED because the codec libraries
are not in this container. Each stub either raises ``NotImplementedError``
(strict mode) or produces a deterministic fake (test mode), clearly
marked.

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

    STUB: the container has no image/audio codecs. With
    ``deterministic_fake=True`` the "feature" is a reproducible function
    of the content hash (for plumbing tests); otherwise rows raise
    ``NotImplementedError`` exactly where a real decoder would plug in.
    """

    def batch_fn(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib

        for pdf in it:
            if not deterministic_fake:
                raise NotImplementedError(
                    "media decode requires codec libraries (PIL/soundfile/"
                    "ffmpeg) not present in this environment; pass "
                    "deterministic_fake=True to exercise the plumbing"
                )
            feats = []
            for content in pdf["content"]:
                if content is None:
                    feats.append(None)
                    continue
                digest = hashlib.sha256(bytes(content)).digest()
                feats.append(
                    [b / 255.0 for b in digest[:feat_dim]]
                )
            out = pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "modality": [m["modality"] if m is not None else None for m in pdf["meta"]],
                    "feat": feats,
                    "decode_ok": [f is not None for f in feats],
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

    STUB: no codecs in this container. ``deterministic_fake=True``
    truncates/right-pads the raw bytes to exactly width*height — a
    reproducible stand-in with the correct output SHAPE; strict mode
    raises where the real decoder plugs in."""
    target = width * height

    def batch_fn(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            if not deterministic_fake:
                raise NotImplementedError(
                    "image resize requires codec libraries (PIL/opencv) not "
                    "present in this environment; pass deterministic_fake=True"
                )
            outs = []
            for content in pdf["content"]:
                if content is None:
                    outs.append(None)
                    continue
                b = bytes(content)
                outs.append(b[:target].ljust(target, b"\x00"))
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
