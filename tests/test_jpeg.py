"""Baseline JPEG codec conformance + roundtrip tests.

The load-bearing tests are the HAND-ASSEMBLED byte streams: a JPEG built
bit-by-bit in this file per T.81 (not by our encoder) must decode to
values computed from the spec's own formulas (DCT basis written out with
math.cos here, independently of the module's matrix). Roundtrips then
bound the lossy error; the quarantine tests pin the unsupported-profile
behavior."""

import math
import struct

import numpy as np
import pytest

from ai_textbook_processor_spark.functions.jpeg import (
    STD_DC_LUMA,
    ZIGZAG,
    JpegUnsupported,
    _build_huff_encode,
    decode_jpeg,
    encode_jpeg,
)


class _Bits:
    """Test-local bit assembler (independent of the module's writer)."""

    def __init__(self):
        self.s = ""

    def put(self, value, length):
        self.s += format(value, f"0{length}b") if length else ""

    def bytes(self):
        s = self.s + "1" * (-len(self.s) % 8)
        raw = bytearray(int(s[i : i + 8], 2) for i in range(0, len(s), 8))
        out = bytearray()
        for b in raw:
            out.append(b)
            if b == 0xFF:
                out.append(0x00)
        return bytes(out)


def _seg(marker, payload):
    return bytes([0xFF, marker]) + struct.pack(">H", len(payload) + 2) + payload


def _gray_headers(w, h, qval):
    """Headers for a 1-component baseline image with a uniform q table."""
    dqt = _seg(0xDB, bytes([0]) + bytes([qval] * 64))
    sof = _seg(0xC0, bytes([8]) + struct.pack(">HH", h, w) + bytes([1, 1, 0x11, 0]))
    counts, symbols = STD_DC_LUMA
    dht_dc = _seg(0xC4, bytes([0x00]) + bytes(counts) + bytes(symbols))
    # minimal AC table: just EOB (symbol 0x00) with a 2-bit code
    dht_ac = _seg(0xC4, bytes([0x10, 0, 1] + [0] * 14 + [0x00]))
    sos = _seg(0xDA, bytes([1, 1, 0x00, 0, 63, 0]))
    return b"\xff\xd8" + dqt + sof + dht_dc + dht_ac + sos


def test_hand_assembled_dc_only_block():
    """One 8x8 gray block, q=16, DC diff = +2, no AC: per T.81 the
    reconstructed block is flat at round(2 * 16 / 8) + 128 = 132."""
    dc_enc = _build_huff_encode(*STD_DC_LUMA)
    bits = _Bits()
    length, code = dc_enc[2]  # size-2 DC symbol
    bits.put(code, length)
    bits.put(0b10, 2)  # magnitude bits for +2
    length, code = (2, 0b00)  # our minimal AC table: EOB = 2-bit code 00
    bits.put(code, length)
    stream = _gray_headers(8, 8, 16) + bits.bytes() + b"\xff\xd9"
    w, h, ch, px = decode_jpeg(stream)
    assert (w, h, ch) == (8, 8, 1)
    assert set(px) == {132}, set(px)


def test_hand_assembled_single_ac_coefficient():
    """DC=0 with one AC coefficient at zigzag k=1 (natural u=0,v=1):
    pixel(y,x) = 128 + coef * (1/sqrt(2)) * (1/2) * cos((2x+1)pi/16)
    — expected values computed here with math.cos, independently of the
    module's DCT matrix."""
    dc_enc = _build_huff_encode(*STD_DC_LUMA)
    bits = _Bits()
    length, code = dc_enc[0]  # DC size 0 (diff 0)
    bits.put(code, length)
    # minimal AC table below has ONE symbol: (run=0,size=5) coded as '0'
    bits.put(0, 1)
    bits.put(0b10100, 5)  # +20
    # second AC symbol would be EOB but k reaches 63 via... no: after one
    # AC at k=1 we still need EOB -> use code '10' for EOB
    bits.put(0b10, 2)
    dqt = _seg(0xDB, bytes([0]) + bytes([1] * 64))  # q all 1
    sof = _seg(0xC0, bytes([8]) + struct.pack(">HH", 8, 8) + bytes([1, 1, 0x11, 0]))
    counts, symbols = STD_DC_LUMA
    dht_dc = _seg(0xC4, bytes([0x00]) + bytes(counts) + bytes(symbols))
    # AC table: code '0' -> 0x05 (run 0, size 5); code '10' -> 0x00 (EOB)
    dht_ac = _seg(0xC4, bytes([0x10, 1, 1] + [0] * 14 + [0x05, 0x00]))
    sos = _seg(0xDA, bytes([1, 1, 0x00, 0, 63, 0]))
    stream = b"\xff\xd8" + dqt + sof + dht_dc + dht_ac + sos + bits.bytes() + b"\xff\xd9"

    w, h, ch, px = decode_jpeg(stream)
    assert (w, h, ch) == (8, 8, 1)
    got = np.frombuffer(px, dtype=np.uint8).reshape(8, 8)
    # T.81 A.3.3 IDCT with the single coefficient F(u=0, v=1) = 20:
    # f(y, x) = 1/4 * C(0) * C(1) * 20 * cos((2x+1) * 1 * pi / 16),
    # C(0)=1/sqrt(2), C(1)=1 — computed here straight from the spec.
    for x in range(8):
        expected = 128.0 + 0.25 * (1.0 / math.sqrt(2)) * 20.0 * math.cos(
            (2 * x + 1) * math.pi / 16.0
        )
        expected = int(min(max(np.floor(expected + 0.5), 0), 255))
        assert all(got[y, x] == expected for y in range(8)), (x, got[:, x], expected)


def test_hand_assembled_restart_marker():
    """16x8 gray (two MCUs) with DRI=1: the entropy stream pads to a byte
    boundary, emits RST0, and the DC predictor resets — block 2's diff is
    measured from 0, not from block 1's DC."""
    dc_enc = _build_huff_encode(*STD_DC_LUMA)

    def mcu(diff):
        bits = _Bits()
        size = diff.bit_length()
        length, code = dc_enc[size]
        bits.put(code, length)
        bits.put(diff, size)  # positive diffs: pattern == value
        bits.put(0b00, 2)  # EOB
        return bits.bytes()

    dri = _seg(0xDD, struct.pack(">H", 1))
    dqt = _seg(0xDB, bytes([0]) + bytes([16] * 64))
    sof = _seg(0xC0, bytes([8]) + struct.pack(">HH", 8, 16) + bytes([1, 1, 0x11, 0]))
    counts, symbols = STD_DC_LUMA
    dht_dc = _seg(0xC4, bytes([0x00]) + bytes(counts) + bytes(symbols))
    dht_ac = _seg(0xC4, bytes([0x10, 0, 1] + [0] * 14 + [0x00]))
    sos = _seg(0xDA, bytes([1, 1, 0x00, 0, 63, 0]))
    stream = (
        b"\xff\xd8" + dqt + sof + dht_dc + dht_ac + dri + sos
        + mcu(2) + b"\xff\xd0" + mcu(1) + b"\xff\xd9"
    )
    w, h, ch, px = decode_jpeg(stream)
    got = np.frombuffer(px, dtype=np.uint8).reshape(8, 16)
    # block 1: DC 2*16/8 -> 132; block 2: predictor RESET, DC 1*16/8=2 -> 130
    assert set(got[:, :8].ravel()) == {132}
    assert set(got[:, 8:].ravel()) == {130}, set(got[:, 8:].ravel())


def test_roundtrip_error_bounds():
    import random

    rng = random.Random(3)
    for channels in (1, 3):
        for w, h in ((8, 8), (20, 24), (17, 9)):  # incl. non-multiple-of-8
            smooth = bytes(
                int(128 + 90 * math.sin(x / 5.0) * math.cos(y / 7.0))
                for y in range(h)
                for x in range(w)
                for _ in range(channels)
            )
            enc = encode_jpeg(smooth, w, h, channels)
            dw, dh, dch, dec = decode_jpeg(enc)
            assert (dw, dh, dch) == (w, h, channels)
            a = np.frombuffer(smooth, dtype=np.uint8).astype(int)
            b = np.frombuffer(dec, dtype=np.uint8).astype(int)
            assert np.abs(a - b).max() <= 12, (channels, w, h, np.abs(a - b).max())


def test_subsampled_roundtrip():
    grad = bytes(
        min(255, 60 + x * 3 + y * 2)
        for y in range(24)
        for x in range(20)
        for _ in range(3)
    )
    enc = encode_jpeg(grad, 20, 24, 3, subsample=True)
    w, h, ch, dec = decode_jpeg(enc)
    assert (w, h, ch) == (20, 24, 3)
    a = np.frombuffer(grad, dtype=np.uint8).astype(int)
    b = np.frombuffer(dec, dtype=np.uint8).astype(int)
    assert np.abs(a - b).max() <= 12


@pytest.mark.parametrize(
    "mutate",
    [
        lambda b: b"\x89PNG" + b[4:],  # wrong magic
        lambda b: b.replace(b"\xff\xc0", b"\xff\xc2", 1),  # progressive SOF2
        lambda b: b[: len(b) // 3],  # truncated before SOS
    ],
)
def test_unsupported_profiles_raise(mutate):
    good = encode_jpeg(bytes(range(64)), 8, 8, 1)
    with pytest.raises(NotImplementedError):
        decode_jpeg(mutate(good))


def test_multimodal_dispatch_jpeg(spark):
    """Real JPEG bytes now decode through the Spark stage; genuinely
    foreign bytes still quarantine."""
    import pandas as pd

    from ai_textbook_processor_spark.operators.multimodal import (
        extract_asset_features,
        image_features_payload,
        pack_jpeg_asset,
    )

    jpg = pack_jpeg_asset("j1", 500)
    d = image_features_payload(jpg)
    assert d["width"] > 0 and len(d["feature"]) == 16

    rows = [
        ("jpg", jpg, "image/jpeg", None, None),
        ("bogus", b"\xff\xd8\xff\xc2 progressive-ish", "image/jpeg", None, None),
    ]
    assets = spark.createDataFrame(
        pd.DataFrame(
            rows,
            columns=["asset_id", "content", "media_type", "width", "height"],
        )
    )
    out = {r["asset_id"]: r for r in extract_asset_features(assets).collect()}
    assert out["jpg"]["error"] is None and out["jpg"]["width"] > 0
    assert out["bogus"]["error"] is not None


def test_decode_wall_batched_idct():
    """r4 VERDICT #4: the per-block IDCT (~9k tiny matmuls on a 900x650
    image) is now ONE broadcast matmul per component over the whole block
    stack. Record the decode wall. The first-touch pass is excluded: on
    this (snapshot-restored microVM) host, first-touch page faults cost
    seconds and would measure the hypervisor, not the codec — same
    discipline as the interleaved bench (BENCH/BASELINE.md r4 notes)."""
    import time

    from ai_textbook_processor_spark.functions.jpeg import (
        decode_jpeg,
        encode_jpeg,
    )

    h, w = 650, 900
    yy, xx = np.mgrid[0:h, 0:w]
    img = np.stack(
        [(xx * 255 // w), (yy * 255 // h), ((xx + yy) * 255 // (w + h))],
        axis=-1,
    ).astype(np.uint8)
    enc = encode_jpeg(img.tobytes(), w, h, 3, subsample=True)
    decode_jpeg(enc)  # fault-absorbing warmup
    t0 = time.perf_counter()
    w2, h2, ch, _px = decode_jpeg(enc)
    wall = time.perf_counter() - t0
    assert (w2, h2, ch) == (w, h, 3)
    # r4 shipped ~4.2 s for this shape; batched IDCT runs it in ~0.1-0.4 s.
    # 2.0 s bound = >10x headroom for host drift while still failing loudly
    # if the per-block loop ever comes back.
    assert wall < 2.0, f"decode wall regressed: {wall:.2f}s"
    print(f"900x650 4:2:0 decode wall (warm): {wall:.3f}s")
