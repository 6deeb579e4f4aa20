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
from ..operators.extract import make_extract_and_score_udf
from ..operators.validate import is_valid_expr

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
    repartition: bool = False,
) -> DataFrame:
    """The flagship plan: documents_interleaved -> extracted + validation.

    One fused pandas-UDF stage (extract E1-E3 + score E4), zero shuffles by
    default. ``repartition=True`` adds the hash(doc_id) bucket shuffle —
    needed only when the input isn't already bucket-partitioned (an Iceberg
    table bucketed by doc_id arrives pre-partitioned, so the production
    plan is shuffle-free end to end; resume/lineage address the same
    buckets either way)."""
    cfg = cfg or CriteriaConfig()
    # respect a caller-assigned bucket column (the resume runner buckets
    # with its own modulus before filtering groups)
    out = df if "bucket" in df.columns else with_bucket(df, n_buckets)
    if repartition:
        out = out.repartition(n_buckets, "bucket")
    udf = make_extract_and_score_udf(cfg)
    out = out.withColumn("_r", udf("spans"))
    out = (
        out.withColumn("spans", F.col("_r.spans"))
        .withColumn("n_spans", F.col("_r.n_spans"))
        .withColumn("n_chars", F.col("_r.n_chars"))
        .withColumn("validation", F.col("_r.validation"))
        .drop("_r")
    )
    return out.withColumn(
        "is_valid", is_valid_expr("validation", relaxed=cfg.relaxed_relevance)
    )
