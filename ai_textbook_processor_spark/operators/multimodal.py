"""Multimodal asset operators: opaque binary columns + typed metadata.

Reference analog (§2.8): the service resizes images aspect-preserving to
fit 800x800 LANCZOS (``utils/utility.py:35-48``), flattens alpha on white
(``:50-58``), JPEG-q85 base64-encodes (``:60-64``), and rasterizes PDF
pages at dpi=150/q70 (``routes/route.py:118-125``). Here media are rows of
an asset table ``(asset_id, content binary, media_type, width, height)``
processed with ``mapInPandas`` over Arrow batches.

No codec library ships in this container, so every decoder here is
from-scratch pure Python (r3-r4):

* REAL formats, decoded end to end: PNG (functions/png.py, stdlib zlib),
  baseline AND progressive JPEG (functions/jpeg.py, T.81 with
  hand-assembled conformance goldens; progressive added r5), RIFF/WAV
  16-bit PCM audio, and Motion-JPEG AVI video — plus the reference's
  full image chain (decode -> flatten -> aspect-fit -> downscale ->
  JPEG re-encode -> base64, image_reencode_payload).
* SYNTHETIC formats (magic ATPS/ATPA/ATPV): deterministic xorshift
  payloads that exercise every batch path with cheap fixtures; their
  oracles predate the real codecs and stay byte-identical.
* QUARANTINED: genuinely out-of-profile inputs (arithmetic-coded or
  12-bit JPEG, compressed audio, inter-frame video codecs) raise
  NotImplementedError per-asset into the error column — never a
  crashed batch.
"""

from __future__ import annotations

import base64
import hashlib
import struct
import zlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T

IMAGE_TARGET_SIZE = 800  # reference config/settings.py:22-25

ASSET_SCHEMA = T.StructType(
    [
        T.StructField("asset_id", T.StringType(), False),
        T.StructField("content", T.BinaryType(), True),
        T.StructField("media_type", T.StringType(), True),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
    ]
)

_MAGIC = b"ATPS"


def pack_asset(asset_id: str, width: int, height: int, channels: int = 3) -> bytes:
    """Deterministic synthetic asset payload: 12-byte header + xorshift
    pseudo-pixel stream seeded by the asset id (no randomness, no codecs)."""
    seed = int.from_bytes(hashlib.md5(asset_id.encode()).digest()[:4], "big") or 1
    n = min(width * height * channels, 4096)  # capped sample, not full frame
    out = bytearray(_MAGIC + struct.pack(">HHB", width, height, channels))
    x = seed
    for _ in range(n):
        x ^= (x << 13) & 0xFFFFFFFF
        x ^= x >> 17
        x ^= (x << 5) & 0xFFFFFFFF
        out.append(x & 0xFF)
    return bytes(out)


def parse_header(content: bytes) -> tuple[int, int, int]:
    """REAL decode of the synthetic header; raises on foreign formats the
    way the production path would hand off to a codec library. PNG and
    baseline JPEG are NOT foreign anymore — they route to the pure-Python
    decoders via :func:`image_features_payload`."""
    if content is None or len(content) < 9 or content[:4] != _MAGIC:
        raise NotImplementedError(
            "pixel codec not available for this payload; decodable formats "
            "are PNG, baseline JPEG, and the in-repo synthetic ATPS"
        )
    w, h, c = struct.unpack(">HHB", content[4:9])
    return w, h, c


def fit_within(width: int, height: int, target: int = IMAGE_TARGET_SIZE) -> tuple[int, int]:
    """The reference's aspect-preserving resize arithmetic
    (utils/utility.py:37-47): scale so max side == target, never upscale."""
    if width <= target and height <= target:
        return width, height
    if width >= height:
        return target, max(1, round(height * target / width))
    return max(1, round(width * target / height)), target


FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("asset_id", T.StringType(), False),
        T.StructField("media_type", T.StringType(), True),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("out_width", T.IntegerType(), True),
        T.StructField("out_height", T.IntegerType(), True),
        T.StructField("byte_len", T.IntegerType(), True),
        T.StructField("sample_b64", T.StringType(), True),
        T.StructField("feature", T.ArrayType(T.FloatType()), True),
        T.StructField("error", T.StringType(), True),
    ]
)

_FRAME_SAMPLES = 8
_FEATURE_DIM = 16


def png_features_payload(content: bytes) -> dict:
    """REAL pixel path (r3 VERDICT #3): stdlib-zlib PNG decode ->
    alpha-flatten on white (the reference's composite,
    utils/utility.py:50-58) -> aspect-fit geometry (exact max-side
    formula, :37-47) -> area-average downscale -> 4x4 luminance-grid
    features on the ACTUAL pixels. Same FEATURE_SCHEMA row shape as the
    ATPS path; unsupported PNG profiles (16-bit, Adam7, ...) raise
    PngUnsupported (a NotImplementedError) into the quarantine channel."""
    from ..functions.png import (
        decode_png,
        flatten_to_rgb,
        luminance_grid_features,
        resize_box,
    )

    w, h, ch, px = decode_png(content)
    rgb = flatten_to_rgb(px, ch)
    ow, oh = fit_within(w, h)
    resized = resize_box(rgb, w, h, ow, oh)
    return {
        "width": w, "height": h,
        "out_width": ow, "out_height": oh,
        "sample_b64": base64.b64encode(content[:24]).decode(),
        "feature": luminance_grid_features(resized, ow, oh),
    }


def jpeg_features_payload(content: bytes) -> dict:
    """REAL pixel path for JPEG (r4 baseline, r5 progressive:
    functions/jpeg.py — pure Python T.81 decoder, conformance-pinned by
    hand-assembled bitstream goldens): decode -> RGB normalize ->
    aspect-fit -> area-average downscale -> 4x4 luminance-grid features,
    identical post-pipeline to PNG. Out-of-profile JPEGs (arithmetic,
    12-bit) raise JpegUnsupported (a NotImplementedError) into the
    quarantine channel."""
    from ..functions.jpeg import decode_jpeg
    from ..functions.png import (
        flatten_to_rgb,
        luminance_grid_features,
        resize_box,
    )

    w, h, ch, px = decode_jpeg(content)
    rgb = flatten_to_rgb(px, ch)
    ow, oh = fit_within(w, h)
    resized = resize_box(rgb, w, h, ow, oh)
    return {
        "width": w, "height": h,
        "out_width": ow, "out_height": oh,
        "sample_b64": base64.b64encode(content[:24]).decode(),
        "feature": luminance_grid_features(resized, ow, oh),
    }


def image_reencode_payload(content: bytes) -> dict:
    """The reference's COMPLETE image preprocessing chain
    (utils/utility.py:35-64), now real end to end: decode (PNG or
    baseline JPEG) -> alpha-flatten on white -> aspect-fit <=800x800 ->
    area-average downscale -> re-encode as baseline 4:4:4 JPEG ->
    base64. Returns the re-encoded artifact's dimensions, byte length,
    and md5 (the oracle-friendly fingerprint of the exact output
    bytes); the b64 payload itself is what a vision-LLM request would
    carry."""
    import base64 as _b64
    import hashlib as _hl

    from ..functions.jpeg import encode_jpeg
    from ..functions.png import PNG_MAGIC, flatten_to_rgb, resize_box

    if content is not None and content[:8] == PNG_MAGIC:
        from ..functions.png import decode_png as _dec
    elif content is not None and content[:2] == b"\xff\xd8":
        from ..functions.jpeg import decode_jpeg as _dec
    else:
        raise NotImplementedError(
            "re-encode supports PNG and baseline JPEG inputs"
        )
    w, h, ch, px = _dec(content)
    rgb = flatten_to_rgb(px, ch)
    ow, oh = fit_within(w, h)
    resized = resize_box(rgb, w, h, ow, oh)
    jpg = encode_jpeg(resized, ow, oh, 3)
    return {
        "out_width": ow,
        "out_height": oh,
        "jpeg_bytes": len(jpg),
        "jpeg_md5": _hl.md5(jpg).hexdigest(),
        "b64_len": len(_b64.b64encode(jpg)),
    }


def pack_jpeg_asset(asset_id: str, n_chars: int) -> bytes:
    """Deterministic REAL JPEG fixture: smooth gradient pixels seeded by
    the asset id, rotating gray / 4:4:4 / 4:2:0 layouts, every 7th
    oversized for the downscale path. Pure function shared by the
    harness query and the literal oracle."""
    import numpy as np

    from ..functions.jpeg import encode_jpeg

    seed = int.from_bytes(hashlib.md5(asset_id.encode()).digest()[4:8], "big")
    mode = seed % 3  # 0 gray, 1 color 4:4:4, 2 color 4:2:0
    if seed % 7 == 0:
        w, h = 820 + seed % 120, 600 + seed % 100
    else:
        w, h = 24 + n_chars % 40, 18 + (n_chars * 3) % 30
    ys = np.arange(h, dtype=np.float64)[:, None]
    xs = np.arange(w, dtype=np.float64)[None, :]
    base = (ys * 2.0 + xs * 3.0 + seed % 97) % 200 + 28
    if mode == 0:
        px = base.astype(np.uint8).tobytes()
        return encode_jpeg(px, w, h, 1)
    planes = [base, (base + 40) % 200 + 28, (base + 90) % 200 + 28]
    px = np.stack(planes, axis=-1).astype(np.uint8).tobytes()
    return encode_jpeg(px, w, h, 3, subsample=(mode == 2))


def _prog_fixture_pixels(asset_id: str, n_chars: int):
    """Shared deterministic pixel generator for the progressive fixture
    and its baseline decode-equality twin: (pixels, w, h, channels,
    subsample, progressive_kwargs)."""
    import numpy as np

    seed = int.from_bytes(hashlib.md5(asset_id.encode()).digest()[8:12], "big")
    mode = seed % 3  # 0 gray, 1 color 4:4:4, 2 color 4:2:0
    if seed % 7 == 0:
        w, h = 760 + seed % 140, 560 + seed % 90
    else:
        w, h = 24 + n_chars % 40, 18 + (n_chars * 3) % 30
    ys = np.arange(h, dtype=np.float64)[:, None]
    xs = np.arange(w, dtype=np.float64)[None, :]
    base = (ys * 2.0 + xs * 3.0 + seed % 89) % 200 + 28
    bands = (((1, 5), (6, 63)), ((1, 2), (3, 20), (21, 63)))[seed % 2]
    kw = {"dc_split": 1 + seed % 2, "ac_split": seed % 3, "ac_bands": bands}
    if mode == 0:
        return base.astype(np.uint8).tobytes(), w, h, 1, False, kw
    planes = [base, (base + 40) % 200 + 28, (base + 90) % 200 + 28]
    px = np.stack(planes, axis=-1).astype(np.uint8).tobytes()
    return px, w, h, 3, mode == 2, kw


def pack_progressive_jpeg_asset(asset_id: str, n_chars: int) -> bytes:
    """Deterministic REAL progressive (SOF2) JPEG fixture: the same
    gradient-pixel family as :func:`pack_jpeg_asset` but encoded with
    rotating successive-approximation splits and spectral-selection band
    layouts, so every decoder path (DC refinement, EOB runs, G.1.2.3 AC
    correction bits) runs on harness data. Pure function shared by the
    harness query and the literal oracle."""
    from ..functions.jpeg import encode_progressive

    px, w, h, ch, sub, kw = _prog_fixture_pixels(asset_id, n_chars)
    return encode_progressive(px, w, h, ch, subsample=sub, **kw)


def baseline_twin_of_progressive(asset_id: str, n_chars: int) -> bytes:
    """Baseline (SOF0) encoding of the exact pixels inside
    :func:`pack_progressive_jpeg_asset`. Both encoders share one forward
    DCT/quantize path, so decoding either stream must yield byte-identical
    pixels — the harness query asserts that per asset."""
    from ..functions.jpeg import encode_jpeg

    px, w, h, ch, sub, _ = _prog_fixture_pixels(asset_id, n_chars)
    return encode_jpeg(px, w, h, ch, subsample=sub)


def pack_png_asset(asset_id: str, n_chars: int) -> bytes:
    """Deterministic REAL PNG fixture: gradient pixels seeded by the asset
    id, rotating through RGB / RGBA (exercises the white-composite) / gray
    layouts, with every 7th asset oversized so the aspect-fit downscale
    path runs on real data. Pure function — shared by the harness query
    and the literal oracle."""
    import numpy as np

    from ..functions.png import encode_png

    seed = int.from_bytes(hashlib.md5(asset_id.encode()).digest()[:4], "big")
    channels = (3, 4, 1)[seed % 3]
    if seed % 7 == 0:
        w, h = 900 + seed % 200, 640 + seed % 160
    else:
        w, h = 24 + n_chars % 40, 18 + (n_chars * 3) % 30
    ys = np.arange(h, dtype=np.uint32)[:, None]
    xs = np.arange(w, dtype=np.uint32)[None, :]
    base = (ys * 13 + xs * 7 + seed) % 251
    planes = [(base + c * 37) % 256 for c in range(channels)]
    px = np.stack(planes, axis=-1).astype(np.uint8).tobytes()
    return encode_png(px, w, h, channels)


def image_features_payload(content: bytes) -> dict:
    """Pure per-asset kernel: header decode -> resize math -> frame-sampled
    byte features -> base64 sample. Shared by the Spark batch kernel and
    the pure-Python golden producer (s6_image_features literal oracle),
    the same single-source discipline as transcribe_payload / the text
    kernels. PNG payloads route to the real pixel decoder
    (:func:`png_features_payload`); other foreign codecs (JPEG) raise
    NotImplementedError into the quarantine channel."""
    from ..functions.png import PNG_MAGIC

    if content is not None and content[:8] == PNG_MAGIC:
        return png_features_payload(content)
    if content is not None and content[:2] == b"\xff\xd8":
        return jpeg_features_payload(content)
    w, h, c = parse_header(content)
    ow, oh = fit_within(w, h)
    payload = content[9:]
    # frame sampling: _FRAME_SAMPLES evenly spaced byte windows
    step = max(1, len(payload) // _FRAME_SAMPLES)
    frames = [payload[i : i + 16] for i in range(0, len(payload), step)][
        :_FRAME_SAMPLES
    ]
    feat = []
    for i in range(_FEATURE_DIM):
        frame = frames[i % len(frames)] if frames else b""
        feat.append((sum(frame) / (255.0 * max(len(frame), 1))) if frame else 0.0)
    return {
        "width": w, "height": h,
        "out_width": ow, "out_height": oh,
        "sample_b64": base64.b64encode(content[:24]).decode(),
        "feature": feat,
    }


def decode_features_batches(
    batches: Iterator[pd.DataFrame],
) -> Iterator[pd.DataFrame]:
    """mapInPandas kernel over :func:`image_features_payload`. Failures
    land in the ``error`` column (quarantine channel), never raise out of
    the batch."""
    for pdf in batches:
        rows = []
        for rec in pdf.itertuples(index=False):
            content = rec.content
            base = {
                "asset_id": rec.asset_id,
                "media_type": rec.media_type,
                "width": None, "height": None,
                "out_width": None, "out_height": None,
                "byte_len": len(content) if content is not None else 0,
                "sample_b64": None, "feature": None, "error": None,
            }
            try:
                base.update(image_features_payload(content))
            except (NotImplementedError, struct.error, IndexError,
                    zlib.error) as e:
                # NotImplementedError is the designed quarantine seam; the
                # extra types are defense in depth (r4 ADVICE; zlib.error
                # r5 ADVICE — corrupt deflate inside a well-formed
                # container) so a parse bug degrades to a per-asset error
                # row, never a batch crash
                base["error"] = str(e)
            rows.append(base)
        yield pd.DataFrame(rows, columns=[f.name for f in FEATURE_SCHEMA.fields])


def extract_asset_features(assets: DataFrame) -> DataFrame:
    """The multimodal pipeline stage: narrow mapInPandas, no shuffle; at
    scale the asset table is bucket-partitioned by asset_id like documents."""
    return assets.mapInPandas(decode_features_batches, schema=FEATURE_SCHEMA)


# ---------------------------------------------------------------------------
# S4 — audio modality (reference: pytube download + whisper 'base' fallback,
# agents/helper.py:44-54). No speech model ships in this container, so the
# decode is split exactly like images: REAL segmentation/windowing/feature
# math over a deterministic in-repo payload (magic b'ATPA'), NotImplemented
# quarantine for foreign codecs (mp3/wav/...). Output mirrors Whisper's
# segment model: ordered (start_ms, end_ms, token) rows per asset.
# ---------------------------------------------------------------------------

_AUDIO_MAGIC = b"ATPA"
_SEGMENT_MS = 1000  # one pseudo-token per second of audio
_TOKENS = (
    "the plant uses light and water to grow strong in every season "
    "students watch energy move through living systems each day"
).split()


def pack_audio(asset_id: str, sample_rate: int = 16000, n_samples: int = 48000) -> bytes:
    """Deterministic synthetic audio payload: 12-byte header + xorshift
    byte stream standing in for PCM (capped sample, like pack_asset)."""
    seed = int.from_bytes(hashlib.md5(asset_id.encode()).digest()[4:8], "big") or 1
    n = min(n_samples, 8192)
    out = bytearray(_AUDIO_MAGIC + struct.pack(">II", sample_rate, n_samples))
    x = seed
    for _ in range(n):
        x ^= (x << 13) & 0xFFFFFFFF
        x ^= x >> 17
        x ^= (x << 5) & 0xFFFFFFFF
        out.append(x & 0xFF)
    return bytes(out)


def parse_audio_header(content: bytes) -> tuple[int, int]:
    if content is None or len(content) < 12 or content[:4] != _AUDIO_MAGIC:
        raise NotImplementedError(
            "audio decode supports RIFF/WAV PCM and the in-repo synthetic "
            "ATPA format; speech models and compressed codecs (mp3/aac) "
            "stay behind this seam"
        )
    rate, n_samples = struct.unpack(">II", content[4:12])
    return rate, n_samples


def decode_wav(content: bytes) -> tuple[int, int, list[int]]:
    """REAL RIFF/WAVE parser (r4, stdlib struct only): 16-bit PCM, mono
    or stereo (stereo downmixed by integer mean). Returns (sample_rate,
    n_samples, samples) with samples as signed 16-bit ints. Compressed
    formats (ADPCM, float, mp3-in-wav) raise NotImplementedError into
    the quarantine channel; so do malformed/truncated containers (r4
    ADVICE: mirror decode_jpeg — parse errors must never escape as
    struct.error and crash the batch)."""
    if content is None or len(content) < 12 or content[:4] != b"RIFF" \
            or content[8:12] != b"WAVE":
        raise NotImplementedError("not a RIFF/WAVE byte stream")
    try:
        return _parse_wav(content)
    except (struct.error, IndexError, ValueError) as e:
        raise NotImplementedError(
            f"malformed/truncated WAV stream: {e}"
        ) from None


def _parse_wav(content: bytes) -> tuple[int, int, list[int]]:
    pos = 12
    fmt = None
    data = None
    while pos + 8 <= len(content):
        cid = content[pos : pos + 4]
        (clen,) = struct.unpack("<I", content[pos + 4 : pos + 8])
        body = content[pos + 8 : pos + 8 + clen]
        if cid == b"fmt ":
            if len(body) < 16:
                raise NotImplementedError("truncated fmt chunk")
            audio_fmt, n_ch, rate, _br, _ba, bits = struct.unpack(
                "<HHIIHH", body[:16]
            )
            if audio_fmt != 1:
                raise NotImplementedError(
                    f"WAV format {audio_fmt}: only PCM (1)"
                )
            if bits != 16:
                raise NotImplementedError(f"{bits}-bit WAV: only 16-bit PCM")
            if n_ch not in (1, 2):
                raise NotImplementedError(f"{n_ch}-channel WAV")
            fmt = (n_ch, rate)
        elif cid == b"data":
            data = body
        pos += 8 + clen + (clen & 1)  # chunks are word-aligned
    if fmt is None or data is None:
        raise NotImplementedError("missing fmt/data chunk")
    n_ch, rate = fmt
    raw = struct.unpack(f"<{len(data) // 2}h", data[: len(data) // 2 * 2])
    if n_ch == 2:
        raw = [ (raw[i] + raw[i + 1]) // 2 for i in range(0, len(raw) - 1, 2) ]
    return rate, len(raw), list(raw)


def encode_wav(samples: list[int], rate: int = 16000,
               channels: int = 1) -> bytes:
    """Minimal RIFF/WAVE writer (16-bit PCM) for building real-WAV
    fixtures."""
    data = struct.pack(f"<{len(samples)}h", *samples)
    fmt = struct.pack("<HHIIHH", 1, channels, rate, rate * 2 * channels,
                      2 * channels, 16)
    body = b"WAVE" + b"fmt " + struct.pack("<I", len(fmt)) + fmt \
        + b"data" + struct.pack("<I", len(data)) + data
    return b"RIFF" + struct.pack("<I", len(body)) + body


def pack_wav_asset(asset_id: str, n_chars: int) -> bytes:
    """Deterministic REAL WAV fixture: a seeded sum-of-sines 16-bit PCM
    signal, 1-5 s at 8 kHz, mono or stereo rotating by seed. Pure
    function shared by the harness query and the literal oracle."""
    import math

    seed = int.from_bytes(hashlib.md5(asset_id.encode()).digest()[8:12], "big")
    rate = 8000
    secs = 1 + n_chars % 5
    stereo = seed % 2 == 1
    f1, f2 = 110 + seed % 500, 700 + seed % 900
    amp = 4000 + seed % 8000
    samples = []
    for i in range(rate * secs):
        v = int(
            amp * math.sin(2 * math.pi * f1 * i / rate)
            + 0.5 * amp * math.sin(2 * math.pi * f2 * i / rate)
        )
        v = max(-32768, min(32767, v))
        if stereo:
            samples += [v, v // 2]
        else:
            samples.append(v)
    return encode_wav(samples, rate, 2 if stereo else 1)


AUDIO_SEGMENT_TYPE = T.StructType(
    [
        T.StructField("start_ms", T.IntegerType()),
        T.StructField("end_ms", T.IntegerType()),
        T.StructField("token", T.StringType()),
    ]
)
TRANSCRIPT_SCHEMA = T.StructType(
    [
        T.StructField("asset_id", T.StringType(), False),
        T.StructField("sample_rate", T.IntegerType(), True),
        T.StructField("duration_ms", T.IntegerType(), True),
        T.StructField("segments", T.ArrayType(AUDIO_SEGMENT_TYPE), True),
        T.StructField("transcript", T.StringType(), True),
        T.StructField("error", T.StringType(), True),
    ]
)


def transcribe_payload(content: bytes) -> tuple[int, int, list[dict]]:
    """Deterministic 'transcription': fixed 1 s segmentation; each segment's
    token is chosen by the energy of its window (pure function of the
    payload — the Whisper-shaped seam a real model would fill). RIFF/WAV
    PCM input (r4) decodes REAL samples and segments on mean |amplitude|;
    the synthetic ATPA payload keeps its byte-window path byte-identical."""
    if content is not None and content[:4] == b"RIFF":
        rate, n_samples, samples = decode_wav(content)
        duration_ms = int(n_samples * 1000 / max(rate, 1))
        n_segs = max(1, duration_ms // _SEGMENT_MS)
        segs = []
        for i in range(n_segs):
            lo = i * n_samples // n_segs
            hi = max(lo + 1, (i + 1) * n_samples // n_segs)
            window = samples[lo:hi]
            energy = sum(abs(v) for v in window) // max(len(window), 1)
            segs.append(
                {
                    "start_ms": i * _SEGMENT_MS,
                    "end_ms": min((i + 1) * _SEGMENT_MS, duration_ms),
                    "token": _TOKENS[(energy >> 6) % len(_TOKENS)],
                }
            )
        return rate, duration_ms, segs
    rate, n_samples = parse_audio_header(content)
    duration_ms = int(n_samples * 1000 / max(rate, 1))
    payload = content[12:]
    n_segs = max(1, duration_ms // _SEGMENT_MS)
    segs = []
    for i in range(n_segs):
        lo = i * len(payload) // n_segs
        hi = max(lo + 1, (i + 1) * len(payload) // n_segs)
        window = payload[lo:hi]
        energy = sum(window) // max(len(window), 1)
        segs.append(
            {
                "start_ms": i * _SEGMENT_MS,
                "end_ms": min((i + 1) * _SEGMENT_MS, duration_ms),
                "token": _TOKENS[energy % len(_TOKENS)],
            }
        )
    return rate, duration_ms, segs


def transcribe_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """mapInPandas kernel: segment + pseudo-transcribe; failures land in
    the error column (quarantine channel), never raise out of the batch."""
    cols = [f.name for f in TRANSCRIPT_SCHEMA.fields]
    for pdf in batches:
        rows = []
        for rec in pdf.itertuples(index=False):
            base = {
                "asset_id": rec.asset_id, "sample_rate": None,
                "duration_ms": None, "segments": None, "transcript": None,
                "error": None,
            }
            try:
                rate, dur, segs = transcribe_payload(rec.content)
                base.update(
                    {
                        "sample_rate": rate,
                        "duration_ms": dur,
                        "segments": segs,
                        "transcript": " ".join(s["token"] for s in segs),
                    }
                )
            except (NotImplementedError, struct.error, IndexError,
                    zlib.error) as e:
                # NotImplementedError is the designed quarantine seam; the
                # extra types are defense in depth (r4 ADVICE; zlib.error
                # r5 ADVICE — corrupt deflate inside a well-formed
                # container) so a parse bug degrades to a per-asset error
                # row, never a batch crash
                base["error"] = str(e)
            rows.append(base)
        yield pd.DataFrame(rows, columns=cols)


def transcribe_assets(assets: DataFrame) -> DataFrame:
    """S4 as a table stage: (asset_id, content) -> Whisper-shaped segment
    rows + joined transcript; narrow, no shuffle. Downstream the transcript
    feeds the same extract/validate pipeline as any text document (the
    reference pipes whisper output into its text flow the same way)."""
    return assets.mapInPandas(transcribe_batches, schema=TRANSCRIPT_SCHEMA)


# ---------------------------------------------------------------------------
# Video modality: opaque binary + typed metadata, frame-sampling plumbing
# (task brief: image/audio/video as opaque binary columns). Same split as
# images/audio: REAL header parse / frame-index selection / per-frame
# feature math over the deterministic in-repo ATPV payload; real video
# codecs (h264 etc.) behind the NotImplementedError seam. Frame sampling
# mirrors what a training pipeline does before a vision encoder: pick k
# evenly spaced frames, one feature vector per sampled frame.
# ---------------------------------------------------------------------------

_VIDEO_MAGIC = b"ATPV"
_VIDEO_SAMPLE_FRAMES = 4


def encode_avi_mjpeg(frames: list[bytes], width: int, height: int,
                     fps: int = 24) -> bytes:
    """Minimal RIFF/AVI writer for Motion-JPEG streams (each frame an
    independent baseline JPEG — functions/jpeg.py encodes them), for
    building real-video fixtures without a codec library."""
    def chunk(cid: bytes, body: bytes) -> bytes:
        pad = b"\x00" if len(body) & 1 else b""
        return cid + struct.pack("<I", len(body)) + body + pad

    def lst(kind: bytes, body: bytes) -> bytes:
        return chunk(b"LIST", kind + body)

    avih = struct.pack(
        "<14I",
        1_000_000 // max(fps, 1),  # us per frame
        0, 0, 0x10,                # rate, padding, flags (AVIF_HASINDEX off)
        len(frames), 0, 1, 0,      # total frames, initial, streams, bufsize
        width, height, 0, 0, 0, 0,
    )
    strh = struct.pack(
        "<4s4sIHHIIIIIIII4H",
        b"vids", b"MJPG", 0, 0, 0, 0,
        1, max(fps, 1),            # scale, rate -> fps
        0, len(frames), 0, 0xFFFFFFFF, 0,
        0, 0, width, height,
    )
    strf = struct.pack(
        "<IiiHH4sIiiII",
        40, width, height, 1, 24, b"MJPG",
        width * height * 3, 0, 0, 0, 0,
    )
    hdrl = lst(
        b"hdrl",
        chunk(b"avih", avih)
        + lst(b"strl", chunk(b"strh", strh) + chunk(b"strf", strf)),
    )
    movi = lst(b"movi", b"".join(chunk(b"00dc", f) for f in frames))
    riff_body = b"AVI " + hdrl + movi
    return b"RIFF" + struct.pack("<I", len(riff_body)) + riff_body


def decode_avi_mjpeg(content: bytes) -> tuple[int, int, int, list[bytes]]:
    """REAL RIFF/AVI parser (r4, stdlib struct only): walks the header
    list for the 'vids' stream (fourcc must be MJPG — every frame an
    independent JPEG our baseline decoder handles) and collects the movi
    frame chunks. Returns (width, height, fps, frames). Inter-frame
    codecs (h264 etc.) raise NotImplementedError into the quarantine
    channel; so do malformed/truncated containers (r4 ADVICE: mirror
    decode_jpeg so struct.error never escapes the seam)."""
    if content is None or len(content) < 12 or content[:4] != b"RIFF" \
            or content[8:12] != b"AVI ":
        raise NotImplementedError("not a RIFF/AVI byte stream")
    try:
        return _parse_avi_mjpeg(content)
    except (struct.error, IndexError, ValueError) as e:
        raise NotImplementedError(
            f"malformed/truncated AVI stream: {e}"
        ) from None


def _parse_avi_mjpeg(content: bytes) -> tuple[int, int, int, list[bytes]]:
    width = height = fps = None
    frames: list[bytes] = []

    def walk(buf: bytes) -> None:
        nonlocal width, height, fps, frames
        pos = 0
        while pos + 8 <= len(buf):
            cid = buf[pos : pos + 4]
            (clen,) = struct.unpack("<I", buf[pos + 4 : pos + 8])
            body = buf[pos + 8 : pos + 8 + clen]
            if cid == b"LIST":
                walk(body[4:])
            elif cid == b"strh":
                typ, fourcc = body[:4], body[4:8]
                if typ == b"vids":
                    if fourcc not in (b"MJPG", b"mjpg"):
                        raise NotImplementedError(
                            f"video codec {fourcc!r}: only Motion-JPEG"
                        )
                    scale, rate = struct.unpack("<II", body[20:28])
                    fps = rate // max(scale, 1)
            elif cid == b"strf" and len(body) >= 16 and width is None:
                width, height = struct.unpack("<ii", body[4:12])
            elif cid[2:4] in (b"dc", b"db"):
                frames.append(bytes(body))
            pos += 8 + clen + (clen & 1)

    walk(content[12:])
    if width is None or fps is None:
        raise NotImplementedError("missing AVI stream headers")
    return int(width), int(abs(height)), int(fps), frames


def pack_mjpeg_asset(asset_id: str, n_chars: int) -> bytes:
    """Deterministic REAL Motion-JPEG AVI fixture: a handful of gradient
    frames (each a real baseline JPEG) whose brightness pans with the
    frame index. Pure function shared by the harness query and the
    literal oracle."""
    import numpy as np

    from ..functions.jpeg import encode_jpeg

    seed = int.from_bytes(hashlib.md5(asset_id.encode()).digest()[:4], "big")
    w, h = 32 + seed % 48, 24 + seed % 40
    fps = 12 + seed % 12
    n_frames = 6 + n_chars % 10
    ys = np.arange(h, dtype=np.float64)[:, None]
    xs = np.arange(w, dtype=np.float64)[None, :]
    frames = []
    for fi in range(n_frames):
        base = ((ys * 2 + xs * 3 + seed % 89 + fi * 11) % 180 + 38).astype(
            np.uint8
        )
        frames.append(encode_jpeg(base.tobytes(), w, h, 1))
    return encode_avi_mjpeg(frames, w, h, fps)


def video_frames_payload_real(content: bytes) -> dict:
    """REAL video path: AVI/MJPEG container parse -> k evenly spaced
    frames -> per-frame baseline-JPEG decode -> mean-luminance feature
    over the ACTUAL pixels. Same VIDEO_SCHEMA row shape as the synthetic
    ATPV path."""
    from ..functions.jpeg import decode_jpeg
    from ..functions.png import flatten_to_rgb

    w, h, fps, jpegs = decode_avi_mjpeg(content)
    if not jpegs:
        # spec-legal container with an empty movi list: nothing to sample
        # from — quarantine instead of indexing jpegs[0] (r4 ADVICE probe)
        raise NotImplementedError("AVI with no frames")
    n_frames = len(jpegs)
    duration_ms = int(n_frames * 1000 / max(fps, 1))
    k = min(_VIDEO_SAMPLE_FRAMES, max(n_frames, 1))
    idxs = [i * n_frames // k for i in range(k)]
    frames = []
    for fi in idxs:
        fw, fh, ch, px = decode_jpeg(jpegs[fi])
        rgb = flatten_to_rgb(px, ch)
        lum = 0.0
        total = fw * fh
        # mean luminance (BT.601) of the real frame, normalized
        for p in range(0, len(rgb), 3):
            lum += rgb[p] * 0.299 + rgb[p + 1] * 0.587 + rgb[p + 2] * 0.114
        frames.append(
            {
                "frame_idx": fi,
                "t_ms": int(fi * 1000 / max(fps, 1)),
                "feat_mean": (lum / (255.0 * max(total, 1))),
            }
        )
    return {
        "width": w, "height": h, "fps": fps, "n_frames": n_frames,
        "duration_ms": duration_ms, "frames": frames,
    }


def pack_video(
    asset_id: str, width: int, height: int, fps: int = 24, n_frames: int = 240
) -> bytes:
    """Deterministic synthetic video payload: 16-byte header + xorshift
    byte stream standing in for encoded frames (capped sample)."""
    seed = int.from_bytes(hashlib.md5(asset_id.encode()).digest()[8:12], "big") or 1
    n = min(n_frames * 64, 8192)
    out = bytearray(_VIDEO_MAGIC + struct.pack(">HHHH", width, height, fps, n_frames))
    x = seed
    for _ in range(n):
        x ^= (x << 13) & 0xFFFFFFFF
        x ^= x >> 17
        x ^= (x << 5) & 0xFFFFFFFF
        out.append(x & 0xFF)
    return bytes(out)


def parse_video_header(content: bytes) -> tuple[int, int, int, int]:
    if content is None or len(content) < 12 or content[:4] != _VIDEO_MAGIC:
        raise NotImplementedError(
            "video codecs not available in this environment; only the "
            "in-repo synthetic ATPV format is decodable"
        )
    w, h, fps, n_frames = struct.unpack(">HHHH", content[4:12])
    return w, h, fps, n_frames


def video_frames_payload(content: bytes) -> dict:
    """Pure per-asset kernel (shared with the golden producer): header
    decode -> duration math -> k evenly spaced frame indices -> per-frame
    byte-window mean feature. RIFF/AVI Motion-JPEG input (r4) routes to
    the REAL frame decoder (:func:`video_frames_payload_real`); other
    real codecs (h264 etc.) stay behind the quarantine seam."""
    if (
        content is not None
        and content[:4] == b"RIFF"
        and content[8:12] == b"AVI "
    ):
        return video_frames_payload_real(content)
    w, h, fps, n_frames = parse_video_header(content)
    duration_ms = int(n_frames * 1000 / max(fps, 1))
    payload = content[12:]
    k = min(_VIDEO_SAMPLE_FRAMES, max(n_frames, 1))
    idxs = [i * n_frames // k for i in range(k)]
    frames = []
    for fi in idxs:
        lo = fi * len(payload) // max(n_frames, 1)
        window = payload[lo : lo + 32]
        mean = (sum(window) / (255.0 * max(len(window), 1))) if window else 0.0
        frames.append({"frame_idx": fi, "t_ms": int(fi * 1000 / max(fps, 1)),
                       "feat_mean": mean})
    return {
        "width": w, "height": h, "fps": fps, "n_frames": n_frames,
        "duration_ms": duration_ms, "frames": frames,
    }


VIDEO_FRAME_TYPE = T.StructType(
    [
        T.StructField("frame_idx", T.IntegerType()),
        T.StructField("t_ms", T.IntegerType()),
        T.StructField("feat_mean", T.DoubleType()),
    ]
)
VIDEO_SCHEMA = T.StructType(
    [
        T.StructField("asset_id", T.StringType(), False),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("fps", T.IntegerType(), True),
        T.StructField("n_frames", T.IntegerType(), True),
        T.StructField("duration_ms", T.IntegerType(), True),
        T.StructField("frames", T.ArrayType(VIDEO_FRAME_TYPE), True),
        T.StructField("error", T.StringType(), True),
    ]
)


def sample_video_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """mapInPandas kernel over :func:`video_frames_payload`; failures land
    in the error column, never raise out of the batch."""
    cols = [f.name for f in VIDEO_SCHEMA.fields]
    for pdf in batches:
        rows = []
        for rec in pdf.itertuples(index=False):
            base = {
                "asset_id": rec.asset_id, "width": None, "height": None,
                "fps": None, "n_frames": None, "duration_ms": None,
                "frames": None, "error": None,
            }
            try:
                base.update(video_frames_payload(rec.content))
            except (NotImplementedError, struct.error, IndexError,
                    zlib.error) as e:
                # NotImplementedError is the designed quarantine seam; the
                # extra types are defense in depth (r4 ADVICE; zlib.error
                # r5 ADVICE — corrupt deflate inside a well-formed
                # container) so a parse bug degrades to a per-asset error
                # row, never a batch crash
                base["error"] = str(e)
            rows.append(base)
        yield pd.DataFrame(rows, columns=cols)


def sample_video_assets(assets: DataFrame) -> DataFrame:
    """Video frame sampling as a table stage: (asset_id, content) ->
    typed metadata + k sampled frame features; narrow, no shuffle."""
    return assets.mapInPandas(sample_video_batches, schema=VIDEO_SCHEMA)
