"""Pure-stdlib PNG codec (zlib + struct, zero new dependencies).

The multimodal decode seam (``functions/multimodal.py``) was a documented
stub because this container ships no PIL/opencv/ffmpeg — but PNG needs
nothing beyond ``zlib``: chunk parsing, IDAT inflate, and the five
scanline filters are all spec-level stdlib work (RFC 2083 / W3C
PNG spec). This module makes the image path REAL for PNG payloads while
the other formats keep their honest ``NotImplementedError`` seam.

Supported: 8-bit depth, color types 0 (gray), 2 (RGB), 3 (palette →
expanded to RGB), 4 (gray+alpha), 6 (RGBA), all five scanline filters,
multi-IDAT streams. Not supported (raises ``PngFormatError`` with the
reason): 1/2/4/16-bit depths, Adam7 interlacing — the formats a real
training-data pipeline transcodes away at ingest anyway.

Scale note: the codec is called ONLY inside Arrow-batched ``mapInPandas``
stages (executor-local, partition-preserving); nothing here touches the
driver. Python-side decode is the slow path by design — the point of the
typed metadata columns is that filters prune rows BEFORE bytes reach it.
"""

from __future__ import annotations

import struct
import zlib

PNG_SIGNATURE = b"\x89PNG\r\n\x1a\n"

_CHANNELS_BY_COLOR_TYPE = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}
_COLOR_TYPE_BY_CHANNELS = {1: 0, 2: 4, 3: 2, 4: 6}


class PngFormatError(ValueError):
    """Malformed or unsupported PNG payload (raises rather than silently
    wrong, matching the repo-wide contract)."""


def is_png(data: bytes | None) -> bool:
    return data is not None and bytes(data[:8]) == PNG_SIGNATURE


def _paeth(a: int, b: int, c: int) -> int:
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    if pb <= pc:
        return b
    return c


def decode_png(data: bytes) -> tuple[int, int, int, bytes]:
    """Decode a PNG byte string → (width, height, channels, pixels).

    ``pixels`` is row-major interleaved bytes, ``len == width * height *
    channels``. Palette images are expanded to RGB (channels == 3).

    Every malformation raises ``PngFormatError`` — including corrupt
    DEFLATE streams (``zlib.error``) and truncations inside a chunk
    length/CRC word (``struct.error``) — so callers need exactly one
    except clause and a bad payload can never crash a mapInPandas batch."""
    try:
        return _decode_png(data)
    except PngFormatError:
        raise
    except (zlib.error, struct.error) as e:
        raise PngFormatError(f"malformed PNG stream: {e}") from e


def _decode_png(data: bytes) -> tuple[int, int, int, bytes]:
    data = bytes(data)
    if not is_png(data):
        raise PngFormatError("missing PNG signature")
    pos = 8
    width = height = bit_depth = color_type = interlace = None
    idat = bytearray()
    palette: bytes | None = None
    seen_iend = False
    while pos + 8 <= len(data):
        (length,) = struct.unpack(">I", data[pos : pos + 4])
        ctype = data[pos + 4 : pos + 8]
        body = data[pos + 8 : pos + 8 + length]
        if len(body) != length:
            raise PngFormatError("truncated chunk body")
        (crc,) = struct.unpack(
            ">I", data[pos + 8 + length : pos + 12 + length]
        )
        if zlib.crc32(ctype + body) & 0xFFFFFFFF != crc:
            raise PngFormatError(f"bad CRC in {ctype!r} chunk")
        if ctype == b"IHDR":
            if length != 13:
                raise PngFormatError("IHDR length != 13")
            width, height, bit_depth, color_type, comp, filt, interlace = (
                struct.unpack(">IIBBBBB", body)
            )
            if comp != 0 or filt != 0:
                raise PngFormatError("unknown compression/filter method")
        elif ctype == b"PLTE":
            if length % 3 != 0:
                raise PngFormatError("PLTE length not a multiple of 3")
            palette = body
        elif ctype == b"IDAT":
            idat.extend(body)
        elif ctype == b"IEND":
            seen_iend = True
            break
        pos += 12 + length
    if width is None:
        raise PngFormatError("no IHDR chunk")
    if not seen_iend:
        raise PngFormatError("no IEND chunk")
    if interlace != 0:
        raise PngFormatError("Adam7 interlacing not supported")
    if bit_depth != 8:
        raise PngFormatError(f"bit depth {bit_depth} not supported (only 8)")
    if color_type not in _CHANNELS_BY_COLOR_TYPE:
        raise PngFormatError(f"color type {color_type} not supported")
    if color_type == 3 and palette is None:
        raise PngFormatError("palette image without PLTE chunk")
    channels = _CHANNELS_BY_COLOR_TYPE[color_type]
    raw = zlib.decompress(bytes(idat))
    stride = width * channels
    if len(raw) != (stride + 1) * height:
        raise PngFormatError(
            f"IDAT stream has {len(raw)} bytes, expected "
            f"{(stride + 1) * height}"
        )
    # de-filter scanlines (spec §6: None/Sub/Up/Average/Paeth); bpp for
    # the left-neighbor offset is whole pixels at 8-bit depth
    bpp = channels
    out = bytearray(stride * height)
    prev_start = -1
    for y in range(height):
        fpos = y * (stride + 1)
        ftype = raw[fpos]
        line = bytearray(raw[fpos + 1 : fpos + 1 + stride])
        ostart = y * stride
        if ftype == 0:
            pass
        elif ftype == 1:  # Sub
            for i in range(bpp, stride):
                line[i] = (line[i] + line[i - bpp]) & 0xFF
        elif ftype == 2:  # Up
            if prev_start >= 0:
                for i in range(stride):
                    line[i] = (line[i] + out[prev_start + i]) & 0xFF
        elif ftype == 3:  # Average
            for i in range(stride):
                left = line[i - bpp] if i >= bpp else 0
                up = out[prev_start + i] if prev_start >= 0 else 0
                line[i] = (line[i] + ((left + up) >> 1)) & 0xFF
        elif ftype == 4:  # Paeth
            for i in range(stride):
                left = line[i - bpp] if i >= bpp else 0
                up = out[prev_start + i] if prev_start >= 0 else 0
                ul = (
                    out[prev_start + i - bpp]
                    if (prev_start >= 0 and i >= bpp)
                    else 0
                )
                line[i] = (line[i] + _paeth(left, up, ul)) & 0xFF
        else:
            raise PngFormatError(f"unknown scanline filter {ftype}")
        out[ostart : ostart + stride] = line
        prev_start = ostart
    if color_type == 3:
        rgb = bytearray(width * height * 3)
        n_entries = len(palette) // 3
        for i, idx in enumerate(out):
            if idx >= n_entries:
                raise PngFormatError(
                    f"palette index {idx} out of range ({n_entries} entries)"
                )
            rgb[i * 3 : i * 3 + 3] = palette[idx * 3 : idx * 3 + 3]
        return width, height, 3, bytes(rgb)
    return width, height, channels, bytes(out)


def _chunk(ctype: bytes, body: bytes) -> bytes:
    return (
        struct.pack(">I", len(body))
        + ctype
        + body
        + struct.pack(">I", zlib.crc32(ctype + body) & 0xFFFFFFFF)
    )


def encode_png(width: int, height: int, channels: int, pixels: bytes) -> bytes:
    """Encode row-major interleaved 8-bit pixels → PNG bytes (filter 0
    scanlines — simple and spec-valid; any decoder reads it)."""
    if channels not in _COLOR_TYPE_BY_CHANNELS:
        raise PngFormatError(f"cannot encode {channels}-channel pixels")
    stride = width * channels
    if len(pixels) != stride * height:
        raise PngFormatError(
            f"pixel buffer has {len(pixels)} bytes, expected {stride * height}"
        )
    ihdr = struct.pack(
        ">IIBBBBB", width, height, 8, _COLOR_TYPE_BY_CHANNELS[channels], 0, 0, 0
    )
    raw = bytearray()
    for y in range(height):
        raw.append(0)
        raw.extend(pixels[y * stride : (y + 1) * stride])
    return (
        PNG_SIGNATURE
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", zlib.compress(bytes(raw), 6))
        + _chunk(b"IEND", b"")
    )


def resize_nearest(
    pixels: bytes,
    width: int,
    height: int,
    channels: int,
    new_width: int,
    new_height: int,
) -> bytes:
    """Nearest-neighbor resample (the deterministic resize every image
    pipeline's fast path offers; no floating point, bit-stable)."""
    out = bytearray(new_width * new_height * channels)
    for y in range(new_height):
        sy = y * height // new_height
        src_row = sy * width * channels
        dst_row = y * new_width * channels
        for x in range(new_width):
            sx = x * width // new_width
            s = src_row + sx * channels
            d = dst_row + x * channels
            out[d : d + channels] = pixels[s : s + channels]
    return bytes(out)


def png_stats(data: bytes) -> dict:
    """Decode + summarize: real dimensions and per-channel pixel means —
    the 'prove the decode is real' numbers q_multimodal_decode reports."""
    width, height, channels, pixels = decode_png(data)
    n = width * height
    sums = [0] * channels
    for i in range(0, len(pixels), channels):
        for c in range(channels):
            sums[c] += pixels[i + c]
    return {
        "width": width,
        "height": height,
        "channels": channels,
        "channel_means": [s / n for s in sums],
    }
