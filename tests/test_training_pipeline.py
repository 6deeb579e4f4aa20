"""The composed training-data pipeline: funnel monotonicity, dedup
actually removes planted duplicates, gates behave."""

from pyspark.sql import functions as F

from ai_textbook_processor_spark.corpus import corpus_df, gen_doc
from ai_textbook_processor_spark.functions.readability import CriteriaConfig
from ai_textbook_processor_spark.plans.training_pipeline import clean_corpus
from ai_textbook_processor_spark.schemas import DOCUMENTS_SCHEMA


def test_clean_corpus_funnel_and_dedup(spark):
    base = corpus_df(spark, 36, seed=42)
    # plant exact duplicates: same spans under new doc_ids
    dup_rows = []
    for idx in (0, 5):  # html_article and mixed_media families
        d = gen_doc(idx, 42)
        for k in range(2):
            dup_rows.append(
                (
                    f"dup-{idx}-{k}", d["spans"], d["standard"], d["subject"],
                    d["chapter"], d["content_type"],
                )
            )
    dups = spark.createDataFrame(dup_rows, DOCUMENTS_SCHEMA)
    docs = base.unionByName(dups)

    cfg = CriteriaConfig(grade_lo=-100.0, grade_hi=100.0)  # wide band: gate on quality only
    cleaned, funnel = clean_corpus(docs, cfg, min_quality=0.2)
    f = {r["stage"]: r["n"] for r in funnel.collect()}
    assert f["input"] == 40
    assert f["input"] >= f["extracted_valid"] >= f["after_exact_dedup"] >= f["after_near_dedup"]

    kept = {r["doc_id"] for r in cleaned.select("doc_id").collect()}
    # exact dedup: of the 3 copies of doc 0 (original + dup-0-0 + dup-0-1),
    # exactly one survives the fingerprint stage
    copies0 = {d for d in kept if d.endswith("html_article") and d.startswith("doc-0000000000")} | {
        d for d in kept if d.startswith("dup-0-")
    }
    assert len(copies0) <= 1

    # cleaned rows still carry spans + quality + validation
    row = cleaned.limit(1).collect()[0]
    assert row["quality"] >= 0.2 and row["spans"] is not None


def test_extraction_runs_once_for_funnel(spark):
    """The fused extract UDF must run exactly once per clean_corpus
    invocation (r1 ran it up to 4x — one eager count per funnel stage).
    A pass-through mapInPandas wrapper upstream of extraction counts input
    scans via an accumulator; the persisted slim projection means the
    window / LSH / funnel branches never re-derive the lineage."""
    n = 24
    docs = corpus_df(spark, n, seed=7)
    acc = spark.sparkContext.accumulator(0)

    def passthru(batches):
        for pdf in batches:
            acc.add(len(pdf))
            yield pdf

    wrapped = docs.mapInPandas(passthru, schema=docs.schema)
    cfg = CriteriaConfig(grade_lo=-100.0, grade_hi=100.0)
    _cleaned, funnel = clean_corpus(wrapped, cfg, min_quality=0.0)
    funnel.collect()
    assert acc.value == n, f"extraction input scanned {acc.value} rows for {n} docs"


def test_lang_filter(spark):
    docs = corpus_df(spark, 24, seed=42)
    cfg = CriteriaConfig(grade_lo=-100.0, grade_hi=100.0)
    cleaned, _ = clean_corpus(docs, cfg, min_quality=0.0, langs=("en",))
    got = cleaned.select(F.collect_set("lang_guess")).collect()[0][0]
    assert set(got) <= {"en"}
