"""Salted mega-doc extraction must equal the unsalted run exactly
(FIXTURES.md mega_doc; SURVEY §4.3)."""

from ai_textbook_processor_spark.corpus import gen_doc
from ai_textbook_processor_spark.functions.kernels import (
    chunk_document,
    extract_document,
    extract_text_spans,
    split_media,
)


def test_chunk_concat_equals_whole_all_families():
    from ai_textbook_processor_spark.corpus import ALL_FAMILIES

    for fam in ALL_FAMILIES:
        for idx in (1, 14, 27):
            doc = gen_doc(idx, 42, family=fam)
            non_media, media = split_media(doc["spans"])
            offsets = [m[3] for m in media]
            whole = extract_text_spans(non_media, offsets)
            for max_units in (1, 3, 64):
                chunks, media2 = chunk_document(doc["spans"], max_units)
                concat = []
                for c in chunks:
                    concat.extend(extract_text_spans(c, offsets))
                assert concat == whole, (fam, idx, max_units)
                assert media2 == media


def test_salted_spark_equals_unsalted(spark):
    import pandas as pd

    from ai_textbook_processor_spark.corpus import corpus_df
    from ai_textbook_processor_spark.operators.skew import extract_documents_salted
    from ai_textbook_processor_spark.plans.pipeline import extract_documents

    docs = corpus_df(spark, 36, seed=42, mega_every=12)  # 3 mega docs

    def inv(df):
        return {
            r["doc_id"]: (
                [(s.kind, s.text, s.media_ref, s.offset) for s in r["spans"]],
                r["n_chars"],
                r["is_valid"],
                r["validation"].fk_grade,
            )
            for r in df.select(
                "doc_id", "spans", "n_chars", "is_valid", "validation"
            ).collect()
        }

    unsalted = inv(extract_documents(docs))
    salted = inv(extract_documents_salted(docs, span_threshold=64, max_units_per_chunk=16))
    assert salted == unsalted

    # and both equal the pure-python golden
    for idx in (11, 23, 35):
        doc = gen_doc(idx, 42, family="mega_doc")
        golden = extract_document(doc["spans"])
        got = salted[doc["doc_id"]][0]
        assert got == [
            (s["kind"], s["text"], s["media_ref"], s["offset"]) for s in golden
        ]
