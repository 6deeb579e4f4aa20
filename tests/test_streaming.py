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
