"""End-to-end extraction plan (SURVEY.md §3.1 Spark re-expression).

read documents -> repartition by hash(doc_id) (explicit bucket column so
resume/lineage can address partitions) -> extract_spans pandas UDF ->
validation struct -> valid/quarantine split -> write + lineage.

The only shuffle in the whole plan is the optional bucket repartition; the
extraction UDF itself is narrow. At cluster scale the input is an Iceberg
table bucket-partitioned by doc_id, so even that shuffle disappears
(scan-aligned buckets); locally we emulate with repartition(expr).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.readability import CriteriaConfig
from ..operators.extract import extract_spans_udf, extracted_text
from ..operators.validate import with_validation

DEFAULT_BUCKETS = 32


def with_bucket(df: DataFrame, n_buckets: int = DEFAULT_BUCKETS) -> DataFrame:
    """Deterministic partition address: pmod(xxhash64(doc_id), n) — the unit
    of lineage accounting and checkpoint-resume (FIXTURES.md §4)."""
    return df.withColumn(
        "bucket", F.pmod(F.xxhash64("doc_id"), F.lit(n_buckets)).cast("int")
    )


def extract_documents(
    df: DataFrame,
    cfg: CriteriaConfig | None = None,
    n_buckets: int = DEFAULT_BUCKETS,
    repartition: bool = True,
) -> DataFrame:
    """The flagship plan: documents_interleaved -> extracted + validation."""
    out = with_bucket(df, n_buckets)
    if repartition:
        out = out.repartition(n_buckets, "bucket")
    out = out.withColumn("spans", extract_spans_udf("spans"))
    out = out.withColumn("n_spans", F.size("spans")).withColumn(
        "n_chars", F.length(extracted_text("spans"))
    )
    out = with_validation(out, extracted_text("spans"), cfg)
    return out
