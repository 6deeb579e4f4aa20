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

import os

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..functions.readability import CriteriaConfig
from ..operators.extract import (
    EXTRACT_RESULT_TYPE,
    make_extract_and_score_arrow_fn,
    make_extract_and_score_udf,
)
from ..operators.validate import is_valid_expr

DEFAULT_BUCKETS = 32

# Hot-path implementation: "pandas" (pandas UDF, default) or "arrow"
# (mapInArrow twin). tests/test_arrow_impl.py pins row-for-row equality.
# r3 measurement (BENCH/BASELINE.md): the mapInArrow path is PARITY within
# noise, not the hoped ~10-15% — Spark 4's pandas serializer is already
# Arrow-backed (list<struct> input conversion is identical), the output-
# side saving is ~4-5% of worker time, and mapInArrow ships every
# passthrough column through the worker socket both ways (the pandas UDF
# ships only the spans column), which eats that saving. Kept as an
# equality-pinned option; the golden pandas twin stays the default.
DEFAULT_UDF_IMPL = "pandas"


def _resolve_impl(impl: str | None) -> str:
    got = impl or os.environ.get("SPARK_GRAFT_UDF_IMPL", DEFAULT_UDF_IMPL)
    if got not in ("arrow", "pandas"):
        raise ValueError(f"unknown extract impl {got!r}")
    return got


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
    impl: str | None = None,
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
    if _resolve_impl(impl) == "arrow":
        from pyspark.sql.pandas.types import to_arrow_type

        result_fields = {f.name: f.dataType for f in EXTRACT_RESULT_TYPE.fields}
        out_spark_fields = [
            T.StructField(
                f.name,
                result_fields["spans"] if f.name == "spans" else f.dataType,
                f.nullable,
            )
            for f in out.schema.fields
        ] + [
            T.StructField(n, result_fields[n])
            for n in ("n_spans", "n_chars", "validation")
        ]
        out_fields = [
            (f.name, to_arrow_type(f.dataType)) for f in out_spark_fields
        ]
        fn = make_extract_and_score_arrow_fn(cfg, out_fields)
        out = out.mapInArrow(fn, T.StructType(out_spark_fields))
    else:
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
