"""Baseline JPEG codec (functions/jpeg_codec.py): transform correctness
against an independent numpy DCT reference, analytic quantization
round-trips, subsampling/restart/stuffing paths, error contracts, and —
where the host provides them — third-party baseline JPEGs the encoder
never produced (proves the decoder reads the wild format, not just its
own output)."""

from __future__ import annotations

import math
import os
import struct

import numpy as np
import pytest

from dbt_snowflake_feature_store_spark.functions import jpeg_codec as J


def _gradient_gray(w: int, h: int) -> bytes:
    return bytes([(x * 16 + y * 3) % 256 for y in range(h) for x in range(w)])


def _smooth_rgb(w: int, h: int) -> bytes:
    out = bytearray()
    for y in range(h):
        for x in range(w):
            out += bytes([min(100 + x * 2, 255), min(80 + y * 2, 255), 120])
    return bytes(out)


def _lcg_bytes(n: int, seed: int = 12345) -> bytes:
    out = bytearray()
    s = seed
    for _ in range(n):
        s = (s * 1103515245 + 12345) % (1 << 31)
        out.append((s >> 16) & 0xFF)
    return bytes(out)


# ---------------------------------------------------------------------------
# transforms vs an independent numpy reference
# ---------------------------------------------------------------------------


def _np_basis() -> np.ndarray:
    m = np.zeros((8, 8))
    for u in range(8):
        cu = math.sqrt(0.5) if u == 0 else 1.0
        for x in range(8):
            m[u, x] = cu / 2.0 * math.cos((2 * x + 1) * u * math.pi / 16.0)
    return m


def test_idct_matches_numpy_reference():
    m = _np_basis()
    rng = np.random.RandomState(7)
    for _ in range(20):
        coef = rng.randint(-512, 512, size=(8, 8)).astype(float)
        # spec IDCT: f(y,x) = sum_uv C(u)C(v)/4 F(v,u-index form)
        want = m.T @ coef @ m
        got = np.array(J._idct_2d(list(coef.flatten()))).reshape(8, 8)
        assert np.max(np.abs(got - want)) < 1e-9


def test_fdct_matches_numpy_reference_and_inverts():
    m = _np_basis()
    rng = np.random.RandomState(8)
    for _ in range(20):
        pix = rng.randint(-128, 128, size=(8, 8)).astype(float)
        want = m @ pix @ m.T
        got = np.array(J._fdct_2d(list(pix.flatten()))).reshape(8, 8)
        assert np.max(np.abs(got - want)) < 1e-9
        # perfect-reconstruction identity of the unquantized transforms
        back = np.array(J._idct_2d(list(got.flatten()))).reshape(8, 8)
        assert np.max(np.abs(back - pix)) < 1e-9


def test_constant_block_analytic_quantization():
    """End-to-end DC math verified against the spec formula computed
    INDEPENDENTLY here: constant c → DC = 8·(c−128), quantized with the
    Annex-K/libjpeg-scaled q00, dequantized, /8, +128."""
    for quality, c in [(90, 200), (50, 37), (75, 128), (25, 255)]:
        scale = 5000 // quality if quality < 50 else 200 - 2 * quality
        q00 = max(1, min(255, (16 * scale + 50) // 100))
        expected = int(round(8 * (c - 128) / q00)) * q00 / 8.0 + 128.0
        expected = max(0, min(255, int(expected + 0.5)))
        data = J.encode_jpeg(8, 8, 1, bytes([c] * 64), quality=quality)
        w, h, ch, out = J.decode_jpeg(data)
        assert (w, h, ch) == (8, 8, 1)
        assert set(out) == {expected}, (quality, c)


# ---------------------------------------------------------------------------
# round trips
# ---------------------------------------------------------------------------


def test_gray_gradient_round_trip():
    g = _gradient_gray(16, 16)
    w, h, ch, out = J.decode_jpeg(J.encode_jpeg(16, 16, 1, g, quality=95))
    assert (w, h, ch) == (16, 16, 1)
    assert max(abs(a - b) for a, b in zip(g, out)) <= 8


def test_rgb_444_round_trip():
    rgb = _smooth_rgb(16, 16)
    w, h, ch, out = J.decode_jpeg(J.encode_jpeg(16, 16, 3, rgb, quality=95))
    assert (w, h, ch) == (16, 16, 3)
    assert max(abs(a - b) for a, b in zip(rgb, out)) <= 8


def test_rgb_420_subsampled_round_trip():
    rgb = _smooth_rgb(20, 12)  # non-multiple of 16: edge MCU padding
    data = J.encode_jpeg(20, 12, 3, rgb, quality=95, subsample=True)
    w, h, ch, out = J.decode_jpeg(data)
    assert (w, h, ch) == (20, 12, 3)
    assert max(abs(a - b) for a, b in zip(rgb, out)) <= 12
    # 4:2:0 is actually smaller than 4:4:4 on chroma-smooth content
    assert len(data) < len(J.encode_jpeg(20, 12, 3, rgb, quality=95))


def test_odd_dimensions_round_trip():
    g = _gradient_gray(13, 9)
    w, h, ch, out = J.decode_jpeg(J.encode_jpeg(13, 9, 1, g, quality=95))
    assert (w, h) == (13, 9)
    assert len(out) == 13 * 9
    assert max(abs(a - b) for a, b in zip(g, out)) <= 10


def test_restart_interval_markers_and_equality():
    g = _gradient_gray(32, 16)
    plain = J.encode_jpeg(32, 16, 1, g, quality=90)
    rst = J.encode_jpeg(32, 16, 1, g, quality=90, restart_interval=2)
    assert b"\xff\xdd" in rst  # DRI segment
    assert b"\xff\xd0" in rst  # first restart marker
    _, _, _, a = J.decode_jpeg(plain)
    _, _, _, b = J.decode_jpeg(rst)
    assert a == b  # restarts change framing, not pixels


def test_byte_stuffing_survives_noise():
    noise = _lcg_bytes(32 * 32)
    data = J.encode_jpeg(32, 32, 1, noise, quality=30)
    assert b"\xff\x00" in data  # stuffed bytes present in entropy data
    w, h, ch, out = J.decode_jpeg(data)
    assert (w, h, ch) == (32, 32, 1)
    # lossy at q30, but structurally sane
    assert len(out) == 32 * 32


def test_stats_match_source_means():
    g = _gradient_gray(16, 16)
    s = J.jpeg_stats(J.encode_jpeg(16, 16, 1, g, quality=95))
    assert s["width"] == 16 and s["height"] == 16 and s["channels"] == 1
    assert abs(s["channel_means"][0] - sum(g) / len(g)) < 4.0


# ---------------------------------------------------------------------------
# error contracts
# ---------------------------------------------------------------------------


def test_is_jpeg_and_missing_soi():
    assert J.is_jpeg(b"\xff\xd8\xff\xe0rest")
    assert not J.is_jpeg(b"\x89PNG\r\n\x1a\n")
    assert not J.is_jpeg(None)
    with pytest.raises(J.JpegFormatError, match="SOI"):
        J.decode_jpeg(b"not a jpeg at all")


def test_truncation_raises():
    data = J.encode_jpeg(8, 8, 1, bytes(64), quality=90)
    with pytest.raises(J.JpegFormatError):
        J.decode_jpeg(data[: len(data) // 2])
    with pytest.raises(J.JpegFormatError):
        J.decode_jpeg(data[:3])


def test_progressive_rejected():
    data = bytearray(J.encode_jpeg(8, 8, 1, bytes(64), quality=90))
    i = data.find(b"\xff\xc0")
    data[i + 1] = 0xC2  # flip SOF0 -> SOF2
    with pytest.raises(J.JpegFormatError, match="progressive"):
        J.decode_jpeg(bytes(data))


def test_arithmetic_coding_rejected():
    data = bytearray(J.encode_jpeg(8, 8, 1, bytes(64), quality=90))
    i = data.find(b"\xff\xc0")
    data[i + 1] = 0xC9  # SOF9: arithmetic sequential
    with pytest.raises(J.JpegFormatError, match="SOF9"):
        J.decode_jpeg(bytes(data))


def test_12bit_precision_rejected():
    data = bytearray(J.encode_jpeg(8, 8, 1, bytes(64), quality=90))
    i = data.find(b"\xff\xc0")
    data[i + 4] = 12  # precision byte inside SOF payload
    with pytest.raises(J.JpegFormatError, match="12-bit"):
        J.decode_jpeg(bytes(data))


def test_corrupt_huffman_data_raises_not_crashes():
    data = bytearray(J.encode_jpeg(16, 16, 1, _gradient_gray(16, 16)))
    # zero out a chunk of entropy data after SOS
    i = data.find(b"\xff\xda")
    for k in range(i + 20, min(i + 40, len(data) - 2)):
        data[k] = 0x55
    try:
        J.decode_jpeg(bytes(data))  # may still decode to garbage pixels…
    except J.JpegFormatError:
        pass  # …or raise the typed error — never a bare crash


# ---------------------------------------------------------------------------
# third-party fixtures (decoder never saw these bytes from our encoder)
# ---------------------------------------------------------------------------

_THIRD_PARTY = [
    p
    for p in [
        "/usr/share/doc/shared-mime-info/shared-mime-info-spec.jpeg",
        "/root/.rustup/toolchains/stable-x86_64-unknown-linux-gnu/share/doc/"
        "rust/html/embedded-book/assets/verify.jpeg",
    ]
    if os.path.exists(p)
]


@pytest.mark.skipif(not _THIRD_PARTY, reason="no third-party JPEGs on host")
def test_decodes_third_party_baseline_jpegs():
    for p in _THIRD_PARTY:
        data = open(p, "rb").read()
        s = J.jpeg_stats(data)
        assert s["width"] > 0 and s["height"] > 0
        assert s["channels"] in (1, 3)
        assert all(0.0 <= m <= 255.0 for m in s["channel_means"])


class TestSparkJpegPath:
    """The multimodal seam runs the REAL codec for JPEG payloads, and
    the mixed-media adapter exercises BOTH formats in one pass."""

    def test_decode_and_featurize_jpeg_real(self, spark, tables):
        from dbt_snowflake_feature_store_spark.functions import (
            multimodal as MM,
        )

        docs = tables["documents"].limit(8)
        media = MM.documents_as_jpeg_media(docs)
        rows = MM.decode_and_featurize(
            media, deterministic_fake=False, feat_dim=4
        ).collect()
        assert len(rows) == 8
        assert all(r["decode_ok"] for r in rows)
        raws = {
            r["doc_id"]: r["text"].encode("utf-8")[:256].ljust(256, b"\x00")
            for r in docs.collect()
        }
        for r in rows:
            w, h, ch, mean = r["feat"]
            assert (w, h, ch) == (16.0, 16.0, 1.0)
            # lossy but close: decoded mean tracks the source byte mean
            want = sum(raws[r["media_id"]]) / 256.0
            assert abs(mean - want) < 6.0

    def test_mixed_media_both_formats_decode(self, spark, tables):
        from dbt_snowflake_feature_store_spark.functions import (
            multimodal as MM,
        )

        docs = tables["documents"].limit(10)
        media = MM.documents_as_mixed_media(docs)
        fmt = {
            r["media_id"]: r["meta"]["format"] for r in media.collect()
        }
        assert set(fmt.values()) == {"png", "jpeg"}
        for mid, f in fmt.items():
            assert f == ("png" if mid % 2 == 0 else "jpeg")
        rows = MM.decode_and_featurize(
            media, deterministic_fake=False, feat_dim=4
        ).collect()
        assert len(rows) == 10 and all(r["decode_ok"] for r in rows)

    def test_resize_jpeg_real(self, spark, tables):
        from dbt_snowflake_feature_store_spark.functions import (
            multimodal as MM,
        )

        media = MM.documents_as_jpeg_media(tables["documents"].limit(4))
        out = MM.resize_media(media, 8, 8).collect()
        assert len(out) == 4 and all(r["resized_ok"] for r in out)
        for r in out:
            w, h, ch, _px = J.decode_jpeg(bytes(r["content"]))
            assert (w, h, ch) == (8, 8, 1)  # valid JPEG at target dims

    def test_malformed_jpeg_flags_not_crashes(self, spark):
        from dbt_snowflake_feature_store_spark.functions import (
            multimodal as MM,
        )

        bad = J.SOI + b"\xff\xc0\x00\x05\x08\x00\x08"  # truncated SOF
        df = spark.createDataFrame(
            [(1, bytearray(bad), ("image", "jpeg", None, None, None, None))],
            MM.MEDIA_SCHEMA,
        )
        rows = MM.decode_and_featurize(df).collect()
        assert rows[0]["decode_ok"] is False and rows[0]["feat"] is None
        rrows = MM.resize_media(df, 4, 4).collect()
        assert rrows[0]["resized_ok"] is False


def test_fill_bytes_before_markers_are_skipped():
    """T.81 B.1.1.2: any number of 0xFF fill bytes may precede a
    marker; third-party files use them as padding (code-review r8)."""
    data = J.encode_jpeg(8, 8, 1, bytes([77] * 64), quality=90)
    i = data.find(b"\xff\xdb")
    padded = data[:i] + b"\xff\xff\xff" + data[i:]  # fill before DQT
    w, h, ch, out = J.decode_jpeg(padded)
    assert (w, h, ch) == (8, 8, 1)
    assert out == J.decode_jpeg(data)[3]


def test_zero_dimensions_rejected():
    """A SOF declaring 0x0 must raise the typed error, not divide by
    zero downstream (code-review r8)."""
    data = bytearray(J.encode_jpeg(8, 8, 1, bytes(64), quality=90))
    i = data.find(b"\xff\xc0")
    # SOF payload: len(2) prec(1) h(2) w(2) — zero both dims
    for off in (5, 6, 7, 8):
        data[i + off] = 0
    with pytest.raises(J.JpegFormatError, match="zero frame"):
        J.decode_jpeg(bytes(data))


def test_single_component_scan_ignores_sampling_factors():
    """T.81 A.2: a single-component scan is NON-interleaved — one data
    unit per MCU regardless of declared sampling factors. Some wild
    grayscale encoders declare H=V=2 on the sole component; the block
    layout must not change (code-review r8)."""
    g = _gradient_gray(16, 16)
    data = bytearray(J.encode_jpeg(16, 16, 1, g, quality=95))
    i = data.find(b"\xff\xc0")
    # component spec starts at SOF payload byte 6: id, HV, Tq
    hv_off = i + 4 + 6 + 1  # marker(2)+len(2) then 6 bytes, then id
    assert data[hv_off] == 0x11
    data[hv_off] = 0x22  # declare 2x2 sampling on the sole component
    w, h, ch, out = J.decode_jpeg(bytes(data))
    assert (w, h, ch) == (16, 16, 1)
    assert out == J.decode_jpeg(J.encode_jpeg(16, 16, 1, g, quality=95))[3]


def test_decoder_reads_tables_from_file_not_constants():
    """Re-quantize the DQT segment in-place: the decoder must follow the
    FILE's table (pixels shift), proving it doesn't assume the Annex-K
    constants the encoder used."""
    c = 200
    data = bytearray(J.encode_jpeg(8, 8, 1, bytes([c] * 64), quality=90))
    i = data.find(b"\xff\xdb")
    q00_off = i + 5  # marker(2) + len(2) + id(1) → first zigzag entry
    q00 = data[q00_off]
    _, _, _, base = J.decode_jpeg(bytes(data))
    data[q00_off] = q00 * 2  # doubling q00 doubles the dequantized DC
    _, _, _, shifted = J.decode_jpeg(bytes(data))
    want = int(round(8 * (c - 128) / q00)) * (q00 * 2) / 8.0 + 128.0
    want = max(0, min(255, int(want + 0.5)))
    assert set(shifted) == {want}
    assert set(base) != set(shifted)
