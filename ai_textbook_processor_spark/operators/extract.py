"""Spark-side extraction operator (SURVEY.md §2.12 ``extract_spans``).

One vectorized pandas UDF is the whole hot path: Series[span array] ->
Series[span array] over Arrow batches. Each document's spans arrive as a
single cell, so the per-document kernels (functions/kernels.py) run inside
the batch with no per-row Python UDF and no shuffle — extraction is
embarrassingly parallel across partitions (the reference processes one
document per HTTP request, serially: ``routes/route.py:79-102``).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F

import functools

from pyspark.sql import types as T

from ..functions.kernels import extract_document
from ..functions.readability import CriteriaConfig, score_texts
from ..schemas import SPANS_TYPE, VALIDATION_TYPE

TEXT_KINDS = ("heading", "body", "caption")


@F.pandas_udf(SPANS_TYPE)
def extract_spans_udf(spans: pd.Series) -> pd.Series:
    return pd.Series(
        [extract_document(s) if s is not None else [] for s in spans],
        index=spans.index,
    )


# Fused extract+score output: ONE Python stage for the whole hot path.
# Chaining two pandas UDFs costs a second Arrow round-trip and a second
# per-worker warm-up (~2 s/worker); fusing halves both. Scoring stays
# vectorized: it runs on the batch's extracted-text Series, not per row.
EXTRACT_RESULT_TYPE = T.StructType(
    [
        T.StructField("spans", SPANS_TYPE),
        T.StructField("n_spans", T.IntegerType()),
        T.StructField("n_chars", T.IntegerType()),
        T.StructField("validation", VALIDATION_TYPE),
    ]
)

_VALIDATION_FIELDS = [f.name for f in VALIDATION_TYPE.fields]


@functools.lru_cache(maxsize=8)
def make_extract_and_score_udf(cfg: CriteriaConfig):
    @F.pandas_udf(EXTRACT_RESULT_TYPE)
    def extract_and_score(spans: pd.Series) -> pd.DataFrame:
        extracted = [extract_document(s) if s is not None else [] for s in spans]
        texts = pd.Series(
            [
                " ".join(
                    sp["text"] for sp in doc if sp["kind"] in TEXT_KINDS
                )
                for doc in extracted
            ]
        )
        scored = score_texts(texts, cfg)
        return pd.DataFrame(
            {
                "spans": extracted,
                "n_spans": [len(d) for d in extracted],
                "n_chars": texts.str.len().astype("int32"),
                "validation": scored[_VALIDATION_FIELDS].to_dict("records"),
            }
        )

    return extract_and_score


def extracted_text(spans_col: str | Column = "spans", sep: str = " ") -> Column:
    """Ordered concat of the textual spans — JVM-side (array_join over a
    filtered transform), the Spark analog of the reference's page-markdown
    concatenation (``utils/text_extract_MistralAI.py:32-37``)."""
    c = F.col(spans_col) if isinstance(spans_col, str) else spans_col
    texts = F.transform(
        F.filter(c, lambda x: x["kind"].isin(*TEXT_KINDS)), lambda x: x["text"]
    )
    return F.array_join(texts, sep)
