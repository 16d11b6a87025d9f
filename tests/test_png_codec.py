"""Pure-stdlib PNG codec (functions/png_codec.py): decode correctness
against hand-built spec images (every scanline filter, palette,
multi-IDAT), encode round-trips, nearest-neighbor resize, and the real
decode/resize paths through the Spark multimodal seam."""

from __future__ import annotations

import struct
import zlib

import pytest

from dbt_snowflake_feature_store_spark.functions import multimodal as MM
from dbt_snowflake_feature_store_spark.functions import png_codec as P


def _chunk(ctype: bytes, body: bytes) -> bytes:
    return (
        struct.pack(">I", len(body))
        + ctype
        + body
        + struct.pack(">I", zlib.crc32(ctype + body) & 0xFFFFFFFF)
    )


def _ihdr(w, h, depth=8, ctype=0, interlace=0):
    return _chunk(
        b"IHDR", struct.pack(">IIBBBBB", w, h, depth, ctype, 0, 0, interlace)
    )


def _paeth(a, b, c):
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    if pb <= pc:
        return b
    return c


def _apply_filter(ftype, line, prev, bpp):
    """Forward-filter one scanline (the encoder side of spec §6) — an
    INDEPENDENT implementation the decoder must invert exactly."""
    out = bytearray(line)
    for i in range(len(line)):
        left = line[i - bpp] if i >= bpp else 0
        up = prev[i] if prev is not None else 0
        ul = prev[i - bpp] if (prev is not None and i >= bpp) else 0
        if ftype == 0:
            pred = 0
        elif ftype == 1:
            pred = left
        elif ftype == 2:
            pred = up
        elif ftype == 3:
            pred = (left + up) >> 1
        elif ftype == 4:
            pred = _paeth(left, up, ul)
        out[i] = (line[i] - pred) & 0xFF
    return bytes(out)


def _build_png(w, h, channels, pixels, filters, idat_split=1):
    """Hand-assemble a PNG using the given per-row filter types,
    optionally splitting the compressed stream across several IDATs."""
    ctype = {1: 0, 2: 4, 3: 2, 4: 6}[channels]
    stride = w * channels
    raw = bytearray()
    prev = None
    for y in range(h):
        line = pixels[y * stride : (y + 1) * stride]
        f = filters[y % len(filters)]
        raw.append(f)
        raw.extend(_apply_filter(f, line, prev, channels))
        prev = line
    comp = zlib.compress(bytes(raw))
    step = max(len(comp) // idat_split, 1)
    idats = b"".join(
        _chunk(b"IDAT", comp[i : i + step]) for i in range(0, len(comp), step)
    )
    return P.PNG_SIGNATURE + _ihdr(w, h, 8, ctype) + idats + _chunk(b"IEND", b"")


def _gradient(w, h, channels):
    return bytes(
        (x * 7 + y * 13 + c * 29) % 256
        for y in range(h)
        for x in range(w)
        for c in range(channels)
    )


@pytest.mark.parametrize("channels", [1, 2, 3, 4])
@pytest.mark.parametrize("ftype", [0, 1, 2, 3, 4])
def test_decode_each_filter_each_colortype(channels, ftype):
    """The decoder inverts every scanline filter for every color type —
    pixel-exact against an independently forward-filtered image."""
    w, h = 7, 5
    pixels = _gradient(w, h, channels)
    data = _build_png(w, h, channels, pixels, [ftype])
    got = P.decode_png(data)
    assert got == (w, h, channels, pixels)


def test_decode_mixed_filters_multi_idat():
    w, h = 9, 8
    pixels = _gradient(w, h, 3)
    data = _build_png(w, h, 3, pixels, [0, 1, 2, 3, 4], idat_split=4)
    assert P.decode_png(data) == (w, h, 3, pixels)


def test_decode_palette_expands_to_rgb():
    w, h = 4, 2
    palette = bytes([255, 0, 0, 0, 255, 0, 0, 0, 255])  # R, G, B
    idx = bytes([0, 1, 2, 0, 2, 2, 1, 0])
    raw = bytearray()
    for y in range(h):
        raw.append(0)
        raw.extend(idx[y * w : (y + 1) * w])
    data = (
        P.PNG_SIGNATURE
        + _ihdr(w, h, 8, 3)
        + _chunk(b"PLTE", palette)
        + _chunk(b"IDAT", zlib.compress(bytes(raw)))
        + _chunk(b"IEND", b"")
    )
    width, height, ch, pixels = P.decode_png(data)
    assert (width, height, ch) == (w, h, 3)
    expect = b"".join(palette[i * 3 : i * 3 + 3] for i in idx)
    assert pixels == expect


@pytest.mark.parametrize("channels", [1, 2, 3, 4])
def test_encode_decode_round_trip(channels):
    w, h = 13, 6
    pixels = _gradient(w, h, channels)
    assert P.decode_png(P.encode_png(w, h, channels, pixels)) == (
        w,
        h,
        channels,
        pixels,
    )


def test_malformed_inputs_raise():
    good = P.encode_png(2, 2, 1, bytes(4))
    with pytest.raises(P.PngFormatError, match="signature"):
        P.decode_png(b"JFIF" + good)
    # flip a bit inside the IDAT body → CRC must catch it
    bad = bytearray(good)
    bad[len(P.PNG_SIGNATURE) + 25 + 8 + 2] ^= 0x01
    with pytest.raises(P.PngFormatError, match="CRC"):
        P.decode_png(bytes(bad))
    with pytest.raises(P.PngFormatError, match="bit depth"):
        P.decode_png(
            P.PNG_SIGNATURE
            + _ihdr(1, 1, 16, 0)
            + _chunk(b"IDAT", zlib.compress(b"\x00\x00\x00"))
            + _chunk(b"IEND", b"")
        )
    with pytest.raises(P.PngFormatError, match="interlacing"):
        P.decode_png(
            P.PNG_SIGNATURE
            + _ihdr(1, 1, 8, 0, interlace=1)
            + _chunk(b"IDAT", zlib.compress(b"\x00\x00"))
            + _chunk(b"IEND", b"")
        )
    with pytest.raises(P.PngFormatError, match="IEND"):
        P.decode_png(good[:-12])


def test_zlib_and_struct_errors_become_png_format_error():
    """Corruption that passes CRC (garbage IDAT with a freshly stamped
    CRC) or truncates inside a CRC word must surface as PngFormatError —
    never zlib.error / struct.error escaping into a Spark batch."""
    bad_idat = (
        P.PNG_SIGNATURE
        + _ihdr(2, 2, 8, 0)
        + _chunk(b"IDAT", b"this is not deflate data")
        + _chunk(b"IEND", b"")
    )
    with pytest.raises(P.PngFormatError, match="malformed PNG stream"):
        P.decode_png(bad_idat)
    good = P.encode_png(2, 2, 1, bytes(4))
    with pytest.raises(P.PngFormatError):
        P.decode_png(good[:-14])  # cut inside the IEND length/CRC words


def test_resize_nearest_checkerboard():
    # 2×2 checkerboard upsampled 2× → each source pixel becomes 2×2
    px = bytes([0, 255, 255, 0])
    out = P.resize_nearest(px, 2, 2, 1, 4, 4)
    assert out == bytes(
        [0, 0, 255, 255, 0, 0, 255, 255, 255, 255, 0, 0, 255, 255, 0, 0]
    )
    # downsample back picks the top-left of each block
    assert P.resize_nearest(out, 4, 4, 1, 2, 2) == px


def test_png_stats_real_means():
    pixels = bytes([10, 20, 30, 40])
    s = P.png_stats(P.encode_png(2, 2, 1, pixels))
    assert (s["width"], s["height"], s["channels"]) == (2, 2, 1)
    assert s["channel_means"] == [25.0]


class TestSparkPngPath:
    """The multimodal seam runs the REAL codec for PNG payloads."""

    def test_decode_and_featurize_real(self, spark, tables):
        media = MM.documents_as_png_media(tables["documents"].limit(8))
        rows = MM.decode_and_featurize(media, feat_dim=4).collect()
        assert len(rows) == 8
        assert all(r["decode_ok"] for r in rows)
        for r in rows:
            w, h, ch, mean = r["feat"]
            assert (w, h, ch) == (16.0, 16.0, 1.0)
            assert 0.0 < mean < 255.0  # real pixel statistic, text bytes
        # strict mode: PNG needs no fake — same result
        again = MM.decode_and_featurize(
            media, deterministic_fake=False, feat_dim=4
        ).collect()
        assert sorted(map(tuple, rows)) == sorted(map(tuple, again))

    def test_decode_mean_matches_text_bytes(self, spark, tables):
        """The decoded mean IS the document's byte mean (padded to 256):
        proves pixels survive encode→decode through Spark untouched."""
        doc = tables["documents"].limit(1).collect()[0]
        raw = doc["text"].encode("utf-8")[:256].ljust(256, b"\x00")
        media = MM.documents_as_png_media(tables["documents"].limit(1))
        row = MM.decode_and_featurize(media, feat_dim=4).collect()[0]
        assert row["feat"][3] == pytest.approx(sum(raw) / 256.0)

    def test_resize_real_round_trip(self, spark, tables):
        """Spark-side resize outputs VALID PNGs of the target size whose
        pixels equal an independent local nearest-neighbor resample."""
        media = MM.documents_as_png_media(tables["documents"].limit(4))
        src = {r["media_id"]: bytes(r["content"]) for r in media.collect()}
        out = MM.resize_media(media, 8, 8).collect()
        assert len(out) == 4 and all(r["resized_ok"] for r in out)
        for r in out:
            w, h, ch, px = P.decode_png(bytes(r["content"]))
            assert (w, h, ch) == (8, 8, 1)
            w0, h0, ch0, px0 = P.decode_png(src[r["media_id"]])
            assert px == P.resize_nearest(px0, w0, h0, ch0, 8, 8)

    def test_malformed_png_flags_not_crashes(self, spark):
        bad = P.PNG_SIGNATURE + b"\x00" * 16
        df = spark.createDataFrame(
            [(1, bytearray(bad), ("image", "png", None, None, None, None))],
            MM.MEDIA_SCHEMA,
        )
        rows = MM.decode_and_featurize(df).collect()
        assert rows[0]["decode_ok"] is False and rows[0]["feat"] is None
        rrows = MM.resize_media(df, 4, 4).collect()
        assert rrows[0]["resized_ok"] is False
