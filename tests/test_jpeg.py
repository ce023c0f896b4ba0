"""Baseline JPEG codec tests: golden bytes, exactness contract, lossy
tolerance, damage, and the MJPG-in-AVI extension.

The golden-bytes payload is hand-assembled from the T.81 wire layout —
markers, DQT in zigzag order, canonical DHT code construction, and a
hand-worked entropy stream — independently of the repo's own encoder,
so it anchors jpeg_decode to the spec, not to jpeg_encode."""

from __future__ import annotations

import numpy as np
import pytest

from iceberg_hybrid_spark.sources.jpeg import jpeg_decode, jpeg_encode

# spec constants re-stated literally (not imported) so the golden file
# is independent of sources/jpeg.py
LUMA_Q = [
    16, 11, 10, 16, 24, 40, 51, 61,
    12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56,
    14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77,
    24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101,
    72, 92, 95, 98, 112, 100, 103, 99,
]
ZZ = [
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
]


def _seg(marker, payload):
    return bytes([0xFF, marker]) + (len(payload) + 2).to_bytes(2, "big") + payload


def _golden_jpeg():
    """8x8 grayscale, every pixel 130.  Worked by hand:
    level shift 130-128=2; T.81 FDCT DC of a constant block = 8*2 = 16;
    q_dc = 16 -> quantized DC 1, diff 1 (category 1, amplitude bit '1').
    DC table (T.81 Annex K luminance): canonical codes give category 0
    -> '00' (len 2), categories 1..5 -> '010'..'110' (len 3); so DC =
    '010' + '1'.  AC table (this repo's documented alphabet: EOB, ZRL
    at len 4, the (run,size) grid at len 9): canonical len-4 codes are
    '0000' (EOB) and '0001' (ZRL); all AC are zero -> EOB '0000'.
    Entropy stream = 010 1 0000 = 0x50, exactly one byte, no padding."""
    dqt = bytes([0]) + bytes(LUMA_Q[i] for i in ZZ)
    sof = bytes([8]) + (8).to_bytes(2, "big") + (8).to_bytes(2, "big") \
        + bytes([1]) + bytes([1, 0x11, 0])
    dc_bits = [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0]
    dc_vals = list(range(12))
    ac_bits = [0, 0, 0, 2, 0, 0, 0, 0, 160, 0, 0, 0, 0, 0, 0, 0]
    ac_vals = [0x00, 0xF0] + [
        (r << 4) | s for r in range(16) for s in range(1, 11)
    ]
    dht_dc = bytes([0x00]) + bytes(dc_bits) + bytes(dc_vals)
    dht_ac = bytes([0x10]) + bytes(ac_bits) + bytes(ac_vals)
    sos = bytes([1, 1, 0x00, 0, 63, 0])
    return (
        b"\xff\xd8"
        + _seg(0xDB, dqt)
        + _seg(0xC0, sof)
        + _seg(0xC4, dht_dc)
        + _seg(0xC4, dht_ac)
        + _seg(0xDA, sos)
        + bytes([0x50])
        + b"\xff\xd9"
    )


def test_jpeg_golden_bytes_hand_assembled():
    img = jpeg_decode(_golden_jpeg())
    assert img.shape == (8, 8)
    assert (img == 130).all()


def test_jpeg_exact_fixed_point_roundtrip():
    """Constant 8x8 tiles with EVEN values sit in the codec's exact
    fixed-point set (DC = 8*(v-128) divisible by q_dc=16, zero AC) —
    the property the jpeg_pixel_stats closed-form oracle rests on."""
    rng = np.random.default_rng(7)
    for _ in range(8):
        th, tw = rng.integers(1, 6, 2)
        tiles = 2 * rng.integers(10, 118, (th, tw))
        img = np.kron(tiles, np.ones((8, 8), dtype=np.int64)).astype(np.uint8)
        assert (jpeg_decode(jpeg_encode(img)) == img).all()
    # ODD values are NOT exact in general — the contract is specific
    odd = np.full((8, 8), 131, dtype=np.uint8)
    dec = jpeg_decode(jpeg_encode(odd))
    assert np.abs(dec.astype(int) - 131).max() <= 1  # still close, not pinned


def test_jpeg_lossy_tolerance_smooth_and_color():
    x, y = np.arange(32), np.arange(24)
    gray = (40 + x[None, :] * 3 + y[:, None] * 2).astype(np.uint8)
    dec = jpeg_decode(jpeg_encode(gray))
    assert dec.shape == gray.shape
    assert np.abs(dec.astype(int) - gray.astype(int)).max() <= 4
    color = np.zeros((24, 32, 3), np.uint8)
    color[..., 0] = 40 + 2 * x[None, :]
    color[..., 1] = 30 + 3 * y[:, None]
    color[..., 2] = 90
    dec = jpeg_decode(jpeg_encode(color))
    assert dec.shape == color.shape
    assert np.abs(dec.astype(int) - color.astype(int)).max() <= 8


def test_jpeg_damage_and_unsupported():
    img = (np.arange(64, dtype=np.uint8).reshape(8, 8) * 2 + 60)
    p = jpeg_encode(img)
    with pytest.raises(ValueError):
        jpeg_decode(b"\x00" + p[1:])  # bad SOI
    with pytest.raises(ValueError):
        jpeg_decode(p[:18])  # truncated mid-DQT
    with pytest.raises(ValueError):
        jpeg_decode(p[:-3])  # truncated scan (no EOI)
    # progressive: flip SOF0 -> SOF2
    bad = bytearray(p)
    i = bad.find(b"\xff\xc0")
    bad[i + 1] = 0xC2
    with pytest.raises(NotImplementedError, match="baseline"):
        jpeg_decode(bytes(bad))
    # DRI marker: inject a restart-interval segment before SOS
    i = p.find(b"\xff\xda")
    dri = b"\xff\xdd\x00\x04\x00\x08"
    with pytest.raises(NotImplementedError, match="restart"):
        jpeg_decode(p[:i] + dri + p[i:])


def test_jpeg_420_exact_and_tolerance():
    """4:2:0 — the dominant real-corpus profile: gray-valued even
    tiles are exact (constant chroma makes the 2x2 average and the
    replication upsample lossless); smooth color stays within the
    lossy band; non-16-multiple dims and exotic sampling raise."""
    rng = np.random.default_rng(9)
    for _ in range(5):
        th, tw = 2 * rng.integers(1, 4, 2)  # even tile counts
        tiles = 2 * rng.integers(10, 118, (int(th), int(tw)))
        gray_img = np.kron(tiles, np.ones((8, 8), dtype=np.int64))
        color = np.repeat(gray_img[:, :, None], 3, axis=2).astype(np.uint8)
        dec = jpeg_decode(jpeg_encode(color, subsampling="420"))
        assert (dec == color).all()
    x, y = np.arange(32), np.arange(16)
    c = np.zeros((16, 32, 3), np.uint8)
    c[..., 0] = 40 + 2 * x[None, :]
    c[..., 1] = 30 + 3 * y[:, None]
    c[..., 2] = 90
    dec = jpeg_decode(jpeg_encode(c, subsampling="420"))
    assert np.abs(dec.astype(int) - c.astype(int)).max() <= 10
    with pytest.raises(ValueError, match="16"):
        jpeg_encode(np.zeros((8, 8, 3), np.uint8), subsampling="420")
    # 2x1 sampling (4:2:2) is not implemented: patch the SOF samp byte
    p = jpeg_encode(c, subsampling="420")
    i = p.find(b"\xff\xc0")
    bad = bytearray(p)
    assert bad[i + 11] == 0x22  # Y sampling byte
    bad[i + 11] = 0x21
    with pytest.raises(NotImplementedError, match="sampling"):
        jpeg_decode(bytes(bad))


def test_mjpg_avi_roundtrip_exact_and_ordered():
    """MJPG extension of the AVI walker: gray-valued even tiles are
    exact through BOTH the color transform and the quantizer; the
    frame-varying tile values pin '00dc' chunk order."""
    from iceberg_hybrid_spark.sources.multimodal import avi_decode, avi_encode

    rng = np.random.default_rng(3)
    tiles = 2 * rng.integers(30, 98, (4, 2, 3))
    frames = np.kron(tiles, np.ones((1, 8, 8), dtype=np.int64))
    a = np.repeat(frames[:, :, :, None], 3, axis=3).astype(np.uint8)
    got, fps = avi_decode(avi_encode(a, fps=9, codec="MJPG"))
    assert fps == 9 and (got == a).all()
    # frame order: reversed input decodes reversed, not equal
    got, _ = avi_decode(avi_encode(a[::-1].copy(), codec="MJPG"))
    assert (got == a[::-1]).all() and not (got == a).all()
    # truncation inside a frame's entropy stream raises
    p = avi_encode(a, codec="MJPG")
    with pytest.raises(ValueError):
        avi_decode(p[:-12])


def test_decode_media_routes_jpeg_and_mjpg(spark):
    from iceberg_hybrid_spark.sources.multimodal import (
        decode_media,
        media_jpeg_from_documents,
        media_mjpg_from_documents,
    )
    from iceberg_hybrid_spark.sources.tables import load_table

    docs = load_table(spark, "/root/testdata/sf0.001", "documents").limit(4)
    rows = decode_media(media_jpeg_from_documents(docs)).collect()
    assert len(rows) == 4
    for r in rows:
        assert r.width == 8 * (2 + r.media_id % 3)
        assert r.height == 8 * (2 + r.media_id % 4)
    rows = decode_media(media_mjpg_from_documents(docs)).collect()
    for r in rows:
        assert r.width == 8 * (2 + 2 * (r.media_id % 2))
        assert r.height == 8 * (2 + 2 * ((r.media_id % 4) // 2))
        assert r.media_type == "video"
