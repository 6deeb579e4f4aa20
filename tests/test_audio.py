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
