"""S4 audio modality: deterministic ATPA payload -> Whisper-shaped segment
rows; Spark plumbing == pure kernel; foreign codecs quarantine via the
error channel (never raise out of the batch)."""

from ai_textbook_processor_spark.operators.multimodal import (
    pack_audio,
    transcribe_assets,
    transcribe_payload,
)


def test_pure_kernel_deterministic():
    a = transcribe_payload(pack_audio("aud-1", 16000, 48000))
    b = transcribe_payload(pack_audio("aud-1", 16000, 48000))
    assert a == b
    rate, dur, segs = a
    assert rate == 16000 and dur == 3000 and len(segs) == 3
    assert segs[0]["start_ms"] == 0 and segs[-1]["end_ms"] == 3000
    # contiguous, ordered segmentation
    for s1, s2 in zip(segs, segs[1:]):
        assert s1["end_ms"] == s2["start_ms"]


def test_spark_equals_pure_and_error_channel(spark):
    rows = [
        ("aud-0", pack_audio("aud-0", 16000, 32000)),
        ("aud-1", pack_audio("aud-1", 8000, 20000)),
        ("bad-0", b"RIFF....WAVEfmt "),  # foreign codec -> quarantine
        ("bad-1", None),
    ]
    df = spark.createDataFrame(rows, "asset_id string, content binary")
    got = {r["asset_id"]: r for r in transcribe_assets(df).collect()}

    for aid, content in rows[:2]:
        rate, dur, segs = transcribe_payload(content)
        r = got[aid]
        assert r["error"] is None
        assert r["sample_rate"] == rate and r["duration_ms"] == dur
        assert [s.asDict() for s in r["segments"]] == segs
        assert r["transcript"] == " ".join(s["token"] for s in segs)

    for aid in ("bad-0", "bad-1"):
        assert got[aid]["error"] is not None and got[aid]["segments"] is None


def test_wav_roundtrip_and_downmix():
    """RIFF/WAV PCM parser: mono roundtrip is sample-exact; stereo
    downmixes by integer mean; odd-length chunks honor word alignment;
    compressed formats quarantine."""
    import math
    import struct

    import pytest

    from ai_textbook_processor_spark.operators.multimodal import (
        decode_wav,
        encode_wav,
    )

    samples = [int(12000 * math.sin(i / 9.0)) for i in range(4000)]
    rate, n, dec = decode_wav(encode_wav(samples, 8000, 1))
    assert (rate, n) == (8000, 4000) and dec == samples

    rate, n, dec = decode_wav(encode_wav([100, 50, -100, -49], 8000, 2))
    assert (rate, n, dec) == (8000, 2, [75, -75])

    # foreign/compressed formats -> quarantine seam
    good = encode_wav([0] * 8, 8000, 1)
    ieee_float = good.replace(
        struct.pack("<HH", 1, 1), struct.pack("<HH", 3, 1), 1
    )
    with pytest.raises(NotImplementedError):
        decode_wav(ieee_float)
    with pytest.raises(NotImplementedError):
        decode_wav(b"ID3\x03mp3-ish bytes")


def test_wav_transcription_end_to_end(spark):
    """Real WAV assets flow through the Spark transcription stage; the
    token sequence is a pure function of the decoded samples (louder
    signal -> different energy bucket)."""
    import pandas as pd

    from ai_textbook_processor_spark.operators.multimodal import (
        encode_wav,
        pack_wav_asset,
        transcribe_assets,
        transcribe_payload,
    )

    w = pack_wav_asset("demo", 123)
    rate, dur, segs = transcribe_payload(w)
    assert rate == 8000 and dur % 1000 == 0 and len(segs) == dur // 1000

    rows = [
        ("wav", w),
        ("quiet", encode_wav([0] * 8000, 8000, 1)),
        ("mp3", b"ID3\x03 not decodable"),
    ]
    assets = spark.createDataFrame(
        pd.DataFrame(rows, columns=["asset_id", "content"])
    )
    out = {r["asset_id"]: r for r in transcribe_assets(assets).collect()}
    assert out["wav"]["error"] is None
    assert out["wav"]["transcript"] == " ".join(s["token"] for s in segs)
    # all-zero signal: energy 0 -> deterministic first-bucket token
    assert out["quiet"]["segments"][0]["token"] is not None
    assert out["mp3"]["error"] is not None
