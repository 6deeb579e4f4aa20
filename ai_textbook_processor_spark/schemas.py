"""Spark schemas for the extraction engine (SURVEY.md §1.2, FIXTURES.md).

Input  table ``documents_interleaved``: (doc_id string, spans array<span>)
Output table ``extracted``            : (doc_id string, spans array<span>, ...)
where span = struct<kind string, text string, media_ref string, offset int>.

The input span ``kind`` values are {text, html, pdf_block, figure,
table_image}; output kinds are {heading, body, caption, figure, table}.
Array position is stream/extraction order (the reference's load-bearing
ordering semantic: per-page markdown concatenated in page order,
``utils/text_extract_MistralAI.py:32-37``).
"""

from __future__ import annotations

from pyspark.sql import types as T

SPAN_TYPE = T.StructType(
    [
        T.StructField("kind", T.StringType(), True),
        T.StructField("text", T.StringType(), True),
        T.StructField("media_ref", T.StringType(), True),
        T.StructField("offset", T.IntegerType(), True),
    ]
)

SPANS_TYPE = T.ArrayType(SPAN_TYPE)

DOCUMENTS_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.StringType(), False),
        T.StructField("spans", SPANS_TYPE, True),
        # Metadata columns (reference stores these alongside the transcript,
        # utils/chroma_utility.py:14-26).
        T.StructField("standard", T.StringType(), True),
        T.StructField("subject", T.StringType(), True),
        T.StructField("chapter", T.StringType(), True),
        T.StructField("content_type", T.StringType(), True),
    ]
)

EXTRACTED_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.StringType(), False),
        T.StructField("spans", SPANS_TYPE, True),
        T.StructField("standard", T.StringType(), True),
        T.StructField("subject", T.StringType(), True),
        T.StructField("chapter", T.StringType(), True),
        T.StructField("content_type", T.StringType(), True),
    ]
)

# Validation struct — mirrors the reference's ValidationResult pydantic model
# (agents/nodes.py:26-31) plus the deterministic features that replace the LLM.
VALIDATION_TYPE = T.StructType(
    [
        T.StructField("fk_grade", T.DoubleType(), True),
        T.StructField("ttr", T.DoubleType(), True),
        T.StructField("n_words", T.IntegerType(), True),
        T.StructField("n_sentences", T.IntegerType(), True),
        T.StructField("grade_check", T.StringType(), True),
        T.StructField("safety_check", T.StringType(), True),
        T.StructField("relevance_check", T.StringType(), True),
        T.StructField("reason", T.StringType(), True),
    ]
)

# Lineage/metrics table — the Spark analog of the reference's SSE progress
# frames (routes/route.py:205-268), FIXTURES.md §4.
LINEAGE_SCHEMA = T.StructType(
    [
        T.StructField("run_id", T.StringType(), False),
        T.StructField("partition_id", T.IntegerType(), False),
        T.StructField("doc_count", T.LongType(), True),
        T.StructField("byte_count", T.LongType(), True),
        T.StructField("wall_ms", T.LongType(), True),
        T.StructField("status", T.StringType(), True),
    ]
)
