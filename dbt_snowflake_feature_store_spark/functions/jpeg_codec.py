"""Pure-stdlib baseline JPEG (JFIF) codec — zero new dependencies.

Round 7 proved the pattern with PNG (``png_codec.py``); this module
extends the REAL decode path to the dominant web image format. Baseline
sequential DCT JPEG needs nothing beyond ``struct`` + ``math``: marker
parse, DQT/DHT table load, canonical Huffman decode with byte
unstuffing and restart markers, dequantize + zigzag + 8×8 IDCT, chroma
upsampling (4:4:4 / 4:2:2 / 4:2:0 by pixel replication), YCbCr→RGB.

Supported: SOF0 (baseline) and SOF1 (extended sequential, 8-bit),
grayscale and 3-component YCbCr, sampling factors 1–2, DRI/RSTn restart
intervals, multi-segment DQT/DHT. Not supported (raises
``JpegFormatError`` with the reason): progressive (SOF2), arithmetic
coding (SOF9+), 12-bit precision, 4-component CMYK — the formats a real
training pipeline transcodes at ingest.

The ENCODER (grayscale / RGB 4:4:4 / RGB 4:2:0, Annex-K tables scaled
by libjpeg's quality curve, optional restart intervals) exists for test
fixtures and the ``documents_as_jpeg_media`` adapter; the decoder takes
ALL of its tables from the file's own DQT/DHT segments, so it decodes
third-party baseline JPEGs, not just this encoder's output.

Scale note: like the PNG codec, this runs ONLY inside Arrow-batched
``mapInPandas`` stages (executor-local, partition-preserving). Typed
metadata columns let filters prune rows before any byte is decoded.
"""

from __future__ import annotations

import math
import struct

SOI = b"\xff\xd8"


class JpegFormatError(ValueError):
    """Malformed or unsupported JPEG payload (raises rather than
    silently wrong, matching the repo-wide codec contract)."""


def is_jpeg(data: bytes | None) -> bool:
    return data is not None and bytes(data[:2]) == SOI


# zigzag index -> natural (row-major) index, ITU T.81 Figure A.6
ZIGZAG = (
    0, 1, 8, 16, 9, 2, 3, 10,
    17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34,
    27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36,
    29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46,
    53, 60, 61, 54, 47, 55, 62, 63,
)

# separable DCT basis: _COS[u][x] = C(u)/2 * cos((2x+1)·u·π/16)
_COS = [
    [
        (math.sqrt(0.5) if u == 0 else 1.0)
        / 2.0
        * math.cos((2 * x + 1) * u * math.pi / 16.0)
        for x in range(8)
    ]
    for u in range(8)
]


def _idct_2d(coef: list[float]) -> list[float]:
    """8×8 inverse DCT (row-major 64 floats in, 64 floats out) — two
    separable 1-D passes over the precomputed basis."""
    tmp = [0.0] * 64
    for y in range(8):  # rows: over u
        base = y * 8
        for x in range(8):
            s = 0.0
            for u in range(8):
                c = coef[base + u]
                if c:
                    s += c * _COS[u][x]
            tmp[base + x] = s
    out = [0.0] * 64
    for x in range(8):  # cols: over v
        for y in range(8):
            s = 0.0
            for v in range(8):
                c = tmp[v * 8 + x]
                if c:
                    s += c * _COS[v][y]
            out[y * 8 + x] = s
    return out


def _fdct_2d(pix: list[float]) -> list[float]:
    """8×8 forward DCT (level-shifted samples in, coefficients out)."""
    tmp = [0.0] * 64
    for y in range(8):
        base = y * 8
        for u in range(8):
            s = 0.0
            for x in range(8):
                s += pix[base + x] * _COS[u][x]
            tmp[base + u] = s
    out = [0.0] * 64
    for u in range(8):
        for v in range(8):
            s = 0.0
            for y in range(8):
                s += tmp[y * 8 + u] * _COS[v][y]
            out[v * 8 + u] = s
    return out


def _build_huffman_decode(bits: list[int], vals: bytes) -> dict[tuple[int, int], int]:
    """Canonical Huffman per T.81 Annex C: {(length, code): symbol}."""
    table: dict[tuple[int, int], int] = {}
    code, k = 0, 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            table[(length, code)] = vals[k]
            code += 1
            k += 1
        code <<= 1
    return table


class _BitReader:
    """MSB-first bit reader over entropy-coded data with 0xFF00
    unstuffing; stops at any non-stuffed marker (caller handles RSTn)."""

    def __init__(self, data: bytes, pos: int):
        self.data = data
        self.pos = pos
        self.acc = 0
        self.nbits = 0
        self.marker: int | None = None

    def _fill(self) -> None:
        d = self.data
        if self.marker is not None:
            # past a marker: T.81 F.2.2.5 — feed 1-bits (drives EOB)
            self.acc = (self.acc << 8) | 0xFF
            self.nbits += 8
            return
        if self.pos >= len(d):
            raise JpegFormatError("truncated entropy-coded segment")
        b = d[self.pos]
        self.pos += 1
        if b == 0xFF:
            if self.pos >= len(d):
                raise JpegFormatError("truncated after 0xFF in entropy data")
            m = d[self.pos]
            if m == 0x00:
                self.pos += 1  # stuffed 0xFF data byte
            else:
                self.marker = m  # leave marker for the caller
                self.pos += 1
                self.acc = (self.acc << 8) | 0xFF
                self.nbits += 8
                return
        self.acc = (self.acc << 8) | b
        self.nbits += 8

    def read_bit(self) -> int:
        if self.nbits == 0:
            self._fill()
        self.nbits -= 1
        return (self.acc >> self.nbits) & 1

    def receive(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.read_bit()
        return v

    def decode_symbol(self, table: dict[tuple[int, int], int]) -> int:
        code = 0
        for length in range(1, 17):
            code = (code << 1) | self.read_bit()
            sym = table.get((length, code))
            if sym is not None:
                return sym
        raise JpegFormatError("invalid Huffman code in entropy data")

    def reset_at_restart(self, expected_rst: int) -> None:
        """Consume the pending RSTn marker and realign to byte."""
        if self.marker is None:
            # the marker may not have been reached yet (bit alignment) —
            # scan forward: remaining bits must be padding
            while self.marker is None:
                self._fill()
                self.acc &= (1 << self.nbits) - 1
                self.nbits = 0
        m = self.marker
        if m != 0xD0 + expected_rst:
            raise JpegFormatError(
                f"expected RST{expected_rst} marker, found 0x{m:02x}"
            )
        self.marker = None
        self.acc = 0
        self.nbits = 0


def _extend(v: int, size: int) -> int:
    """T.81 F.12: map ``size`` received bits to a signed value."""
    if size == 0:
        return 0
    return v if v >= (1 << (size - 1)) else v - (1 << size) + 1


def decode_jpeg(data: bytes) -> tuple[int, int, int, bytes]:
    """Decode a baseline JPEG byte string → (width, height, channels,
    pixels). ``pixels`` is row-major interleaved, ``len == width *
    height * channels``; 3-component YCbCr converts to RGB, single
    component stays grayscale. Every malformation raises
    ``JpegFormatError``."""
    try:
        return _decode(data)
    except (struct.error, IndexError) as e:
        raise JpegFormatError(f"truncated JPEG stream: {e}") from e


def _decode(data: bytes) -> tuple[int, int, int, bytes]:
    if not is_jpeg(data):
        raise JpegFormatError("missing SOI marker")
    pos = 2
    qt: dict[int, list[int]] = {}
    huff_dc: dict[int, dict] = {}
    huff_ac: dict[int, dict] = {}
    restart_interval = 0
    frame = None  # (w, h, [(comp_id, h_i, v_i, tq)])

    while True:
        if pos + 4 > len(data):
            raise JpegFormatError("ran off the end before SOS")
        if data[pos] != 0xFF:
            raise JpegFormatError(f"expected marker at byte {pos}")
        # T.81 B.1.1.2: any number of 0xFF fill bytes may precede a
        # marker — skip them (third-party files use them for padding)
        while pos + 1 < len(data) and data[pos + 1] == 0xFF:
            pos += 1
        marker = data[pos + 1]
        pos += 2
        if marker == 0xD8:
            continue  # stray SOI
        if marker == 0xD9:
            raise JpegFormatError("EOI before any scan")
        (seglen,) = struct.unpack(">H", data[pos : pos + 2])
        seg = data[pos + 2 : pos + seglen]
        if len(seg) != seglen - 2:
            raise JpegFormatError("truncated segment")
        nxt = pos + seglen

        if marker == 0xDB:  # DQT
            p = 0
            while p < len(seg):
                pq, tq = seg[p] >> 4, seg[p] & 0x0F
                p += 1
                if pq != 0:
                    raise JpegFormatError("16-bit quant tables unsupported")
                tbl = [0] * 64
                for i in range(64):
                    tbl[ZIGZAG[i]] = seg[p + i]
                qt[tq] = tbl
                p += 64
        elif marker == 0xC4:  # DHT
            p = 0
            while p < len(seg):
                tc, th = seg[p] >> 4, seg[p] & 0x0F
                bits = list(seg[p + 1 : p + 17])
                n = sum(bits)
                vals = seg[p + 17 : p + 17 + n]
                tbl = _build_huffman_decode(bits, vals)
                (huff_dc if tc == 0 else huff_ac)[th] = tbl
                p += 17 + n
        elif marker in (0xC0, 0xC1):  # SOF0 / SOF1
            prec, h, w, nc = struct.unpack(">BHHB", seg[:6])
            if prec != 8:
                raise JpegFormatError(f"{prec}-bit precision unsupported")
            if w == 0 or h == 0:
                raise JpegFormatError(f"zero frame dimensions ({w}x{h})")
            if nc not in (1, 3):
                raise JpegFormatError(f"{nc}-component images unsupported")
            comps = []
            for i in range(nc):
                cid, hv, tq = seg[6 + 3 * i : 9 + 3 * i]
                h_i, v_i = hv >> 4, hv & 0x0F
                if not (1 <= h_i <= 2 and 1 <= v_i <= 2):
                    raise JpegFormatError(
                        f"sampling factor {h_i}x{v_i} unsupported"
                    )
                comps.append((cid, h_i, v_i, tq))
            frame = (w, h, comps)
        elif marker == 0xC2:
            raise JpegFormatError("progressive JPEG (SOF2) unsupported")
        elif marker in (0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            raise JpegFormatError(
                f"non-baseline frame type SOF{marker - 0xC0} unsupported"
            )
        elif marker == 0xDD:  # DRI
            (restart_interval,) = struct.unpack(">H", seg[:2])
        elif marker == 0xDA:  # SOS — entropy data follows
            if frame is None:
                raise JpegFormatError("SOS before SOF")
            ns = seg[0]
            if ns != len(frame[2]):
                raise JpegFormatError(
                    "partial-scan (progressive-style) SOS unsupported"
                )
            scan_tables = {}
            for i in range(ns):
                cs, td_ta = seg[1 + 2 * i], seg[2 + 2 * i]
                scan_tables[cs] = (td_ta >> 4, td_ta & 0x0F)
            return _decode_scan(
                data, nxt, frame, qt, huff_dc, huff_ac,
                scan_tables, restart_interval,
            )
        # APPn / COM / others: skip
        pos = nxt


def _decode_scan(
    data, pos, frame, qt, huff_dc, huff_ac, scan_tables, restart_interval
):
    w, h, comps = frame
    # T.81 A.2: a SINGLE-component scan is NON-interleaved — one data
    # unit per MCU in raster order over the component's own block grid,
    # regardless of its declared sampling factors (some encoders emit
    # H=V=2 on the sole component of a grayscale frame; treating that
    # as interleaved 4-block MCUs desynchronizes the entropy stream).
    if len(comps) == 1:
        cid, _h1, _v1, tq = comps[0]
        comps = [(cid, 1, 1, tq)]
    hmax = max(c[1] for c in comps)
    vmax = max(c[2] for c in comps)
    mcus_x = (w + 8 * hmax - 1) // (8 * hmax)
    mcus_y = (h + 8 * vmax - 1) // (8 * vmax)

    planes = []  # per component: (plane_w, plane_h, bytearray)
    for cid, h_i, v_i, tq in comps:
        pw, ph = mcus_x * h_i * 8, mcus_y * v_i * 8
        planes.append((pw, ph, bytearray(pw * ph)))
        if tq not in qt:
            raise JpegFormatError(f"missing quant table {tq}")
        if cid not in scan_tables:
            raise JpegFormatError(f"component {cid} not in scan")
        td, ta = scan_tables[cid]
        if td not in huff_dc or ta not in huff_ac:
            raise JpegFormatError("missing Huffman table for scan")

    reader = _BitReader(data, pos)
    pred = [0] * len(comps)
    rst_n = 0
    mcu_count = 0

    for my in range(mcus_y):
        for mx in range(mcus_x):
            if restart_interval and mcu_count and mcu_count % restart_interval == 0:
                reader.reset_at_restart(rst_n)
                rst_n = (rst_n + 1) % 8
                pred = [0] * len(comps)
            for ci, (cid, h_i, v_i, tq) in enumerate(comps):
                dc_tbl = huff_dc[scan_tables[cid][0]]
                ac_tbl = huff_ac[scan_tables[cid][1]]
                q = qt[tq]
                pw, ph, plane = planes[ci]
                for by in range(v_i):
                    for bx in range(h_i):
                        coef = _decode_block(reader, dc_tbl, ac_tbl, q, pred, ci)
                        pix = _idct_2d(coef)
                        ox = (mx * h_i + bx) * 8
                        oy = (my * v_i + by) * 8
                        for yy in range(8):
                            row = (oy + yy) * pw + ox
                            base = yy * 8
                            for xx in range(8):
                                v = int(pix[base + xx] + 128.5)
                                plane[row + xx] = 0 if v < 0 else (255 if v > 255 else v)
            mcu_count += 1

    # assemble interleaved output with replication upsampling
    nc = len(comps)
    out = bytearray(w * h * nc)
    for ci, (cid, h_i, v_i, _tq) in enumerate(comps):
        pw, ph, plane = planes[ci]
        for y in range(h):
            sy = y * v_i // vmax
            src = sy * pw
            dst = y * w * nc + ci
            for x in range(w):
                out[dst + x * nc] = plane[src + (x * h_i // hmax)]
    if nc == 3:
        _ycbcr_to_rgb_inplace(out)
    return w, h, nc, bytes(out)


def _decode_block(reader, dc_tbl, ac_tbl, q, pred, ci) -> list[float]:
    coef = [0.0] * 64
    t = reader.decode_symbol(dc_tbl)
    diff = _extend(reader.receive(t), t)
    pred[ci] += diff
    coef[0] = pred[ci] * q[0]
    k = 1
    while k < 64:
        rs = reader.decode_symbol(ac_tbl)
        r, s = rs >> 4, rs & 0x0F
        if s == 0:
            if r == 15:  # ZRL: 16 zeros
                k += 16
                continue
            break  # EOB
        k += r
        if k > 63:
            raise JpegFormatError("AC run past end of block")
        nat = ZIGZAG[k]
        coef[nat] = _extend(reader.receive(s), s) * q[nat]
        k += 1
    return coef


def _ycbcr_to_rgb_inplace(buf: bytearray) -> None:
    for i in range(0, len(buf), 3):
        y, cb, cr = buf[i], buf[i + 1] - 128, buf[i + 2] - 128
        r = y + 1.402 * cr
        g = y - 0.344136 * cb - 0.714136 * cr
        b = y + 1.772 * cb
        buf[i] = 0 if r < 0 else (255 if r > 255 else int(r + 0.5))
        buf[i + 1] = 0 if g < 0 else (255 if g > 255 else int(g + 0.5))
        buf[i + 2] = 0 if b < 0 else (255 if b > 255 else int(b + 0.5))


def jpeg_stats(data: bytes) -> dict:
    """Decode + summarize: width/height/channels + per-channel means —
    the same contract as ``png_codec.png_stats`` (real pixel statistics
    for the multimodal featurizer)."""
    w, h, ch, pix = decode_jpeg(data)
    sums = [0] * ch
    n = w * h
    for i, v in enumerate(pix):
        sums[i % ch] += v
    return {
        "width": w,
        "height": h,
        "channels": ch,
        "channel_means": [s / n for s in sums],
    }


# ---------------------------------------------------------------------------
# Encoder (fixtures + documents_as_jpeg_media adapter)
# ---------------------------------------------------------------------------

# ITU T.81 Annex K quantization tables (natural order by row)
_K1_LUM = [
    16, 11, 10, 16, 24, 40, 51, 61,
    12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56,
    14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77,
    24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101,
    72, 92, 95, 98, 112, 100, 103, 99,
]
_K2_CHROM = [
    17, 18, 24, 47, 99, 99, 99, 99,
    18, 21, 26, 66, 99, 99, 99, 99,
    24, 26, 56, 99, 99, 99, 99, 99,
    47, 66, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
]

# Annex K Huffman table specs: (BITS[1..16], HUFFVAL)
_DC_LUM_SPEC = (
    [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0],
    bytes(range(12)),
)
_DC_CHROM_SPEC = (
    [0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0],
    bytes(range(12)),
)
_AC_LUM_SPEC = (
    [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D],
    bytes(
        [
            0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12,
            0x21, 0x31, 0x41, 0x06, 0x13, 0x51, 0x61, 0x07,
            0x22, 0x71, 0x14, 0x32, 0x81, 0x91, 0xA1, 0x08,
            0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0,
            0x24, 0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16,
            0x17, 0x18, 0x19, 0x1A, 0x25, 0x26, 0x27, 0x28,
            0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38, 0x39,
            0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49,
            0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59,
            0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69,
            0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
            0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89,
            0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98,
            0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5, 0xA6, 0xA7,
            0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6,
            0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5,
            0xC6, 0xC7, 0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4,
            0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1, 0xE2,
            0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA,
            0xF1, 0xF2, 0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8,
            0xF9, 0xFA,
        ]
    ),
)
_AC_CHROM_SPEC = (
    [0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77],
    bytes(
        [
            0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21,
            0x31, 0x06, 0x12, 0x41, 0x51, 0x07, 0x61, 0x71,
            0x13, 0x22, 0x32, 0x81, 0x08, 0x14, 0x42, 0x91,
            0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0,
            0x15, 0x62, 0x72, 0xD1, 0x0A, 0x16, 0x24, 0x34,
            0xE1, 0x25, 0xF1, 0x17, 0x18, 0x19, 0x1A, 0x26,
            0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37, 0x38,
            0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48,
            0x49, 0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58,
            0x59, 0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68,
            0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78,
            0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87,
            0x88, 0x89, 0x8A, 0x92, 0x93, 0x94, 0x95, 0x96,
            0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5,
            0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4,
            0xB5, 0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3,
            0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9, 0xCA, 0xD2,
            0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA,
            0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9,
            0xEA, 0xF2, 0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8,
            0xF9, 0xFA,
        ]
    ),
)


def _build_huffman_encode(spec) -> dict[int, tuple[int, int]]:
    """{symbol: (code, length)} from an Annex-C (BITS, HUFFVAL) spec."""
    bits, vals = spec
    enc: dict[int, tuple[int, int]] = {}
    code, k = 0, 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            enc[vals[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return enc


def _scaled_quant(tbl: list[int], quality: int) -> list[int]:
    """libjpeg's quality curve: 1..100 → per-entry scale, clamped 1..255."""
    if not 1 <= quality <= 100:
        raise ValueError("quality must be in 1..100")
    scale = 5000 // quality if quality < 50 else 200 - 2 * quality
    return [max(1, min(255, (t * scale + 50) // 100)) for t in tbl]


class _BitWriter:
    def __init__(self) -> None:
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, code: int, length: int) -> None:
        self.acc = (self.acc << length) | (code & ((1 << length) - 1))
        self.nbits += length
        while self.nbits >= 8:
            self.nbits -= 8
            b = (self.acc >> self.nbits) & 0xFF
            self.out.append(b)
            if b == 0xFF:
                self.out.append(0x00)  # byte stuffing
        self.acc &= (1 << self.nbits) - 1

    def flush(self) -> None:
        if self.nbits:
            pad = 8 - self.nbits
            self.write((1 << pad) - 1, pad)  # 1-padding per spec


def _mag_bits(v: int) -> tuple[int, int]:
    """(size, value-bits) for a signed coefficient, T.81 F.1.2.1."""
    if v == 0:
        return 0, 0
    size = abs(v).bit_length()
    return size, (v if v >= 0 else v + (1 << size) - 1)


def _encode_block(
    writer, samples: list[float], q: list[int], dc_enc, ac_enc, pred: list[int], ci: int
) -> None:
    coef = _fdct_2d(samples)
    zz = [0] * 64
    for i in range(64):
        c = coef[ZIGZAG[i]]
        qv = q[ZIGZAG[i]]
        zz[i] = int(round(c / qv))
    diff = zz[0] - pred[ci]
    pred[ci] = zz[0]
    size, bitsv = _mag_bits(diff)
    code, length = dc_enc[size]
    writer.write(code, length)
    if size:
        writer.write(bitsv, size)
    run = 0
    last_nz = 0
    for k in range(63, 0, -1):
        if zz[k]:
            last_nz = k
            break
    for k in range(1, last_nz + 1):
        if zz[k] == 0:
            run += 1
            continue
        while run > 15:
            code, length = ac_enc[0xF0]  # ZRL
            writer.write(code, length)
            run -= 16
        size, bitsv = _mag_bits(zz[k])
        code, length = ac_enc[(run << 4) | size]
        writer.write(code, length)
        writer.write(bitsv, size)
        run = 0
    if last_nz < 63:
        code, length = ac_enc[0x00]  # EOB
        writer.write(code, length)


def _seg(marker: int, payload: bytes) -> bytes:
    return bytes([0xFF, marker]) + struct.pack(">H", len(payload) + 2) + payload


def _dqt_seg(tid: int, tbl: list[int]) -> bytes:
    zz = bytes(tbl[ZIGZAG[i]] for i in range(64))
    return _seg(0xDB, bytes([tid]) + zz)


def _dht_seg(tc: int, th: int, spec) -> bytes:
    bits, vals = spec
    return _seg(0xC4, bytes([(tc << 4) | th]) + bytes(bits) + vals)


def _rgb_to_ycbcr(r: int, g: int, b: int) -> tuple[float, float, float]:
    y = 0.299 * r + 0.587 * g + 0.114 * b
    cb = -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0
    cr = 0.5 * r - 0.418688 * g - 0.081312 * b + 128.0
    return y, cb, cr


def _block_from_plane(
    plane: list[float], pw: int, ph: int, ox: int, oy: int
) -> list[float]:
    """8×8 level-shifted block with edge replication past the plane."""
    out = [0.0] * 64
    for yy in range(8):
        sy = min(oy + yy, ph - 1)
        row = sy * pw
        for xx in range(8):
            sx = min(ox + xx, pw - 1)
            out[yy * 8 + xx] = plane[row + sx] - 128.0
    return out


def encode_jpeg(
    width: int,
    height: int,
    channels: int,
    pixels: bytes,
    quality: int = 90,
    subsample: bool = False,
    restart_interval: int = 0,
) -> bytes:
    """Encode row-major interleaved 8-bit pixels as a baseline JFIF
    JPEG. ``channels`` 1 (grayscale) or 3 (RGB; ``subsample=True`` →
    4:2:0 chroma by 2×2 box averaging, else 4:4:4).
    ``restart_interval`` > 0 writes DRI + RSTn markers every N MCUs."""
    if channels not in (1, 3):
        raise ValueError("channels must be 1 or 3")
    if len(pixels) != width * height * channels:
        raise ValueError("pixel buffer size mismatch")

    q_lum = _scaled_quant(_K1_LUM, quality)
    q_chrom = _scaled_quant(_K2_CHROM, quality)
    dc_lum = _build_huffman_encode(_DC_LUM_SPEC)
    ac_lum = _build_huffman_encode(_AC_LUM_SPEC)
    dc_chrom = _build_huffman_encode(_DC_CHROM_SPEC)
    ac_chrom = _build_huffman_encode(_AC_CHROM_SPEC)

    # split planes (YCbCr for color)
    n = width * height
    if channels == 1:
        y_plane = [float(p) for p in pixels]
        planes = [(y_plane, width, height, 1, 1, q_lum, dc_lum, ac_lum)]
        hmax = vmax = 1
    else:
        yp = [0.0] * n
        cbp = [0.0] * n
        crp = [0.0] * n
        for i in range(n):
            r, g, b = pixels[3 * i], pixels[3 * i + 1], pixels[3 * i + 2]
            yp[i], cbp[i], crp[i] = _rgb_to_ycbcr(r, g, b)
        if subsample:
            cw, ch_ = (width + 1) // 2, (height + 1) // 2
            cb2 = [0.0] * (cw * ch_)
            cr2 = [0.0] * (cw * ch_)
            for cy in range(ch_):
                for cx in range(cw):
                    acc_b = acc_r = 0.0
                    cnt = 0
                    for dy in range(2):
                        for dx in range(2):
                            sx, sy = 2 * cx + dx, 2 * cy + dy
                            if sx < width and sy < height:
                                acc_b += cbp[sy * width + sx]
                                acc_r += crp[sy * width + sx]
                                cnt += 1
                    cb2[cy * cw + cx] = acc_b / cnt
                    cr2[cy * cw + cx] = acc_r / cnt
            planes = [
                (yp, width, height, 2, 2, q_lum, dc_lum, ac_lum),
                (cb2, cw, ch_, 1, 1, q_chrom, dc_chrom, ac_chrom),
                (cr2, cw, ch_, 1, 1, q_chrom, dc_chrom, ac_chrom),
            ]
            hmax = vmax = 2
        else:
            planes = [
                (yp, width, height, 1, 1, q_lum, dc_lum, ac_lum),
                (cbp, width, height, 1, 1, q_chrom, dc_chrom, ac_chrom),
                (crp, width, height, 1, 1, q_chrom, dc_chrom, ac_chrom),
            ]
            hmax = vmax = 1

    out = bytearray(SOI)
    out += _seg(0xE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00")
    out += _dqt_seg(0, q_lum)
    if channels == 3:
        out += _dqt_seg(1, q_chrom)
    sof = struct.pack(">BHHB", 8, height, width, channels)
    for ci in range(channels):
        h_i, v_i = (planes[ci][3], planes[ci][4])
        sof += bytes([ci + 1, (h_i << 4) | v_i, 0 if ci == 0 else 1])
    out += _seg(0xC0, sof)
    out += _dht_seg(0, 0, _DC_LUM_SPEC)
    out += _dht_seg(1, 0, _AC_LUM_SPEC)
    if channels == 3:
        out += _dht_seg(0, 1, _DC_CHROM_SPEC)
        out += _dht_seg(1, 1, _AC_CHROM_SPEC)
    if restart_interval:
        out += _seg(0xDD, struct.pack(">H", restart_interval))
    sos = bytes([channels])
    for ci in range(channels):
        sos += bytes([ci + 1, 0x00 if ci == 0 else 0x11])
    sos += b"\x00\x3f\x00"
    out += _seg(0xDA, sos)

    mcus_x = (width + 8 * hmax - 1) // (8 * hmax)
    mcus_y = (height + 8 * vmax - 1) // (8 * vmax)
    writer = _BitWriter()
    pred = [0] * channels
    rst_n = 0
    mcu_count = 0
    for my in range(mcus_y):
        for mx in range(mcus_x):
            if restart_interval and mcu_count and mcu_count % restart_interval == 0:
                writer.flush()
                out += writer.out
                writer = _BitWriter()
                out += bytes([0xFF, 0xD0 + rst_n])
                rst_n = (rst_n + 1) % 8
                pred = [0] * channels
            for ci, (plane, pw, ph, h_i, v_i, q, dce, ace) in enumerate(planes):
                for by in range(v_i):
                    for bx in range(h_i):
                        block = _block_from_plane(
                            plane, pw, ph,
                            (mx * h_i + bx) * 8, (my * v_i + by) * 8,
                        )
                        _encode_block(writer, block, q, dce, ace, pred, ci)
            mcu_count += 1
    writer.flush()
    out += writer.out
    out += b"\xff\xd9"
    return bytes(out)
