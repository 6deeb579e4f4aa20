"""Streaming extraction smoke: file source -> fused extract -> catalog
commits, micro-batches driven synchronously (pyspark guide pattern)."""

from ai_textbook_processor_spark.corpus import corpus_df, gen_doc
from ai_textbook_processor_spark.functions.kernels import extract_document
from ai_textbook_processor_spark.sources.io_catalog import Catalog
from ai_textbook_processor_spark.streaming.stream_extract import (
    start_stream_extraction,
)


def test_stream_extract_matches_golden(spark, tmp_path):
    n = 24
    in_dir = str(tmp_path / "in")
    corpus_df(spark, n, seed=42).write.mode("overwrite").parquet(in_dir)

    q = start_stream_extraction(
        spark,
        in_dir,
        str(tmp_path / "out"),
        str(tmp_path / "ckpt"),
        max_files_per_trigger=2,
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()

    tbl = Catalog(str(tmp_path / "out")).table("extracted")
    rows = {r["doc_id"]: r for r in tbl.read(spark).collect()}
    assert len(rows) == n
    assert len(tbl.manifests()) >= 1
    for idx in range(n):
        doc = gen_doc(idx, 42)
        golden = extract_document(doc["spans"])
        got = rows[doc["doc_id"]]["spans"]
        assert [(s.kind, s.text, s.media_ref) for s in got] == [
            (s["kind"], s["text"], s["media_ref"]) for s in golden
        ]


def test_watermarked_windowed_agg_matches_batch(spark, tmp_path):
    """Event-time tumbling window with watermark over the harness events
    table; complete-on-drain streaming counts must equal the batch plan."""
    import shutil

    from pyspark.sql import functions as F

    src = str(tmp_path / "events_dir")  # file source needs a directory
    (tmp_path / "events_dir").mkdir()
    shutil.copy("/root/testdata/sf0.001/events.parquet", src + "/part-0.parquet")
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    batch_df = spark.read.parquet(src)
    schema = batch_df.schema
    batch_df = batch_df.withColumn("ts", F.col("ts").cast("timestamp"))

    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(src)
        .withColumn("ts", F.col("ts").cast("timestamp"))
        .withWatermark("ts", "10 minutes")
        .groupBy(F.window("ts", "1 hour"), "event_type")
        .agg(F.count("*").alias("n"))
    )
    q = (
        stream.writeStream.outputMode("complete")
        .format("memory")
        .queryName("ev_windowed")
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()

    got = {
        (r["window"]["start"], r["event_type"]): r["n"]
        for r in spark.sql("SELECT * FROM ev_windowed").collect()
    }
    exp = {
        (r["w"]["start"], r["event_type"]): r["n"]
        for r in batch_df.groupBy(
            F.window("ts", "1 hour").alias("w"), "event_type"
        )
        .agg(F.count("*").alias("n"))
        .collect()
    }
    assert got == exp and len(got) > 0


def test_late_rows_below_watermark_are_dropped(spark):
    """r3 VERDICT #6: the ev_stream_late replay plants copies of events
    shifted 2 days BEFORE the corpus start that arrive after the watermark
    has advanced past them — the append-mode aggregate must drop exactly
    those rows (no window at the shifted hour) while keeping the
    acceptable-late copies planted at max(ts)."""
    from pyspark.sql import functions as F

    from ai_textbook_processor_spark.harness import QUERIES

    sf = "/root/testdata/sf0.001"
    out = QUERIES["ev_stream_late"](spark, sf).collect()
    assert len(out) > 0
    hours = {r["h"] for r in out}
    ev = spark.read.parquet(f"{sf}/events.parquet")
    mn, mx = ev.agg(F.min("ts"), F.max("ts")).first()
    dropped_hour = (mn - __import__("datetime").timedelta(days=2)).strftime(
        "%Y-%m-%d %H:00:00"
    )
    assert dropped_hour not in hours, "too-late planted rows must be dropped"
    # the acceptable-late copies land in max(ts)'s window and ARE counted:
    # that window's totals exceed the batch-only counts
    mx_hour = mx.strftime("%Y-%m-%d %H:00:00")
    n_stream = sum(r["n"] for r in out if r["h"] == mx_hour)
    n_batch = ev.where(
        F.date_format(F.date_trunc("hour", "ts"), "yyyy-MM-dd HH:mm:ss")
        == mx_hour
    ).count()
    n_oklate = ev.where(F.col("event_id") % 10 == 1).count()
    assert n_stream == n_batch + n_oklate


def test_stream_dedup_absorbs_redelivery(spark):
    """Negative control for ev_stream_dedup: WITHOUT the dedup stage the
    re-delivered rows inflate the counts; with it the totals equal batch
    DISTINCT — proving the oracle match is the dedup working, not the
    duplicates never arriving."""
    from pyspark.sql import functions as F

    from ai_textbook_processor_spark.harness import QUERIES

    sf = "/root/testdata/sf0.001"
    ev = spark.read.parquet(f"{sf}/events.parquet")
    n_distinct = ev.count()
    n_redelivered = ev.where(F.col("event_id") % 5 == 0).count()
    assert n_redelivered > 0

    out = QUERIES["ev_stream_dedup"](spark, sf)
    total = out.agg(F.sum("n")).first()[0]
    assert total == n_distinct, (
        f"dedup output {total} != distinct {n_distinct} "
        f"(inflated would be {n_distinct + n_redelivered})"
    )


def test_clean_ingest_kill_resume(spark, tmp_path):
    """r4 VERDICT #6: the streaming clean-corpus ingest must survive a
    kill: dedup state and source progress restore from the checkpoint
    dir, so re-deliveries arriving AFTER the restart are still absorbed,
    new docs still land, replayed epochs no-op (idempotent catalog
    commits), and the final table equals batch extraction of the unique
    corpus."""
    import os

    from pyspark.sql import functions as F

    from ai_textbook_processor_spark.plans.pipeline import extract_documents
    from ai_textbook_processor_spark.streaming.clean_ingest import (
        start_clean_ingest,
    )

    n = 20
    docs = corpus_df(spark, n, seed=3)
    first = docs.limit(12).localCheckpoint()
    in_dir = str(tmp_path / "in")
    os.makedirs(in_dir)
    out_root = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")

    def arrive(i, part):
        stage = str(tmp_path / f"stage{i}")
        part.coalesce(1).write.mode("overwrite").parquet(stage)
        pf = [f for f in os.listdir(stage) if f.endswith(".parquet")][0]
        os.rename(os.path.join(stage, pf), os.path.join(in_dir, f"f{i}.parquet"))

    # session 1: first 12 docs, then KILL
    q = start_clean_ingest(spark, in_dir, out_root, ckpt)
    try:
        arrive(1, first)
        q.processAllAvailable()
    finally:
        q.stop()

    # session 2 (restart on the same checkpoint): re-deliver 5 of the
    # first batch (identical bytes) + the 8 unseen docs
    q2 = start_clean_ingest(spark, in_dir, out_root, ckpt)
    try:
        arrive(2, first.limit(5))
        q2.processAllAvailable()
        arrive(3, docs.subtract(first))
        q2.processAllAvailable()
    finally:
        q2.stop()

    tbl = Catalog(out_root).table("extracted")
    final = tbl.read(spark)
    assert final.count() == n  # 5 re-deliveries absorbed across restart
    assert final.select("doc_id").distinct().count() == n

    exp = extract_documents(docs).select(
        "doc_id", "n_spans", "n_chars", F.col("is_valid").cast("string")
    )
    got = final.select(
        "doc_id", "n_spans", "n_chars", F.col("is_valid").cast("string")
    )
    assert got.subtract(exp).count() == 0 and exp.subtract(got).count() == 0

    # replaying the last committed epoch id must no-op (exactly-once)
    ids_before = sorted(tbl.committed_ids())
    tbl.append(final.limit(1), commit_id=ids_before[-1])
    assert sorted(tbl.committed_ids()) == ids_before
