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

from ..functions.kernels import extract_document
from ..schemas import SPANS_TYPE

TEXT_KINDS = ("heading", "body", "caption")


@F.pandas_udf(SPANS_TYPE)
def extract_spans_udf(spans: pd.Series) -> pd.Series:
    return pd.Series(
        [extract_document(s) if s is not None else [] for s in spans],
        index=spans.index,
    )


def extracted_text(spans_col: str | Column = "spans", sep: str = " ") -> Column:
    """Ordered concat of the textual spans — JVM-side (array_join over a
    filtered transform), the Spark analog of the reference's page-markdown
    concatenation (``utils/text_extract_MistralAI.py:32-37``)."""
    c = F.col(spans_col) if isinstance(spans_col, str) else spans_col
    texts = F.transform(
        F.filter(c, lambda x: x["kind"].isin(*TEXT_KINDS)), lambda x: x["text"]
    )
    return F.array_join(texts, sep)
