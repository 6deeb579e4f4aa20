"""applyInPandasWithState sessionizer: closed sessions emitted across
micro-batch boundaries must match the pure gap-walk computed offline."""

import pandas as pd

from ai_textbook_processor_spark.streaming.stateful_sessions import (
    SESSION_SCHEMA,
    sessionize_stream,
)

GAP_MIN = 30
M = 60_000  # ms per minute
T0 = 1_700_000_000_000  # fixed epoch ms


def _mk_events(rows):
    return pd.DataFrame(
        {
            "user_id": [r[0] for r in rows],
            "ts": [pd.Timestamp(r[1], unit="ms", tz="UTC") for r in rows],
        }
    )


def test_sessions_close_across_microbatches(spark, tmp_path):
    in_dir = tmp_path / "ev_in"
    in_dir.mkdir()
    # batch 1: u1 has an in-batch gap (session closes inside the batch);
    # u2 stays open
    _mk_events(
        [
            (1, T0),
            (1, T0 + 5 * M),
            (1, T0 + 50 * M),  # 45 min gap -> closes [T0, T0+5m] n=2
            (2, T0),
            (2, T0 + 10 * M),
        ]
    ).to_parquet(in_dir / "b1.parquet", coerce_timestamps="us",
                 allow_truncated_timestamps=True)

    df_schema = spark.read.parquet(str(in_dir)).schema
    stream = (
        spark.readStream.schema(df_schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(str(in_dir))
    )
    q = (
        sessionize_stream(stream, gap_minutes=GAP_MIN)
        .writeStream.outputMode("append")
        .format("memory")
        .queryName("sessions_out")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    try:
        q.processAllAvailable()
        # batch 2: much later events close both open sessions via the
        # in-batch gap walk (and advance the watermark)
        _mk_events(
            [(1, T0 + 200 * M), (2, T0 + 300 * M)]
        ).to_parquet(in_dir / "b2.parquet", coerce_timestamps="us",
                     allow_truncated_timestamps=True)
        q.processAllAvailable()
        got = {
            (r["user_id"], r["session_start_ms"], r["session_end_ms"], r["n_events"])
            for r in spark.sql("SELECT * FROM sessions_out").collect()
        }
    finally:
        q.stop()

    expected = {
        (1, T0, T0 + 5 * M, 2),            # closed inside batch 1
        (1, T0 + 50 * M, T0 + 50 * M, 1),  # closed by batch 2's event
        (2, T0, T0 + 10 * M, 2),           # closed by batch 2's event
        # u1's final session: batch 2's max event (T0+300m) advances the
        # watermark to T0+290m, past u1's armed timeout (200m last event +
        # 30m gap) -> EventTimeTimeout closes the idle session exactly once
        (1, T0 + 200 * M, T0 + 200 * M, 1),
    }
    # u2's session (last event T0+300m, timeout T0+330m > watermark) must
    # still be open and NOT emitted
    assert got == expected


def test_output_schema():
    names = [f.name for f in SESSION_SCHEMA.fields]
    assert names == ["user_id", "session_start_ms", "session_end_ms", "n_events"]
