"""In-pass partition metrics must not change extraction values, and the
lineage rollup must account for every document exactly once."""

from pyspark.sql import functions as F

from ai_textbook_processor_spark.corpus import corpus_df
from ai_textbook_processor_spark.operators.metrics import (
    extract_documents_with_metrics,
    lineage_rollup,
)
from ai_textbook_processor_spark.plans.pipeline import extract_documents


def test_metrics_path_matches_udf_path(spark):
    docs = corpus_df(spark, 36, seed=42, num_partitions=4)
    a = {
        r["doc_id"]: (
            [(s.kind, s.text, s.media_ref, s.offset) for s in r["spans"]],
            r["is_valid"],
            r["validation"].fk_grade,
        )
        for r in extract_documents(docs).select(
            "doc_id", "spans", "is_valid", "validation"
        ).collect()
    }
    out = extract_documents_with_metrics(docs).persist()
    b = {
        r["doc_id"]: (
            [(s.kind, s.text, s.media_ref, s.offset) for s in r["spans"]],
            r["is_valid"],
            r["validation"].fk_grade,
        )
        for r in out.select("doc_id", "spans", "is_valid", "validation").collect()
    }
    assert a == b

    lin = lineage_rollup(out, "run-m").collect()
    assert sum(r["doc_count"] for r in lin) == 36
    assert all(r["wall_ms"] >= 0 and r["status"] == "committed" for r in lin)
    pids = {r["partition_id"] for r in lin}
    assert len(pids) == len(lin)  # one row per partition
    total_chars = out.agg(F.sum("n_chars")).collect()[0][0]
    assert sum(r["byte_count"] for r in lin) == total_chars
    out.unpersist()
