"""Per-partition lineage accounting inside the extraction pass (S10).

The reference streams progress frames per processing step
(``routes/route.py:205-268``); at cluster scale the analog is per-PARTITION
metrics captured in the same pass as the data (SURVEY §2.12 "mapInPandas
wrapper"): each Arrow batch is timed inside the worker, and every output
row carries (partition_id, batch_idx, batch_wall_ms). The lineage rollup
then aggregates exactly once per batch:

    groupBy(partition_id, batch_idx) -> first(batch_wall_ms), count, bytes
    groupBy(partition_id)            -> doc_count, byte_count, wall_ms

No second pass over the data, no accumulators (which are at-least-once
under task retries — rows are exactly-once after the write).
"""

from __future__ import annotations

import time
from collections.abc import Iterator

import pandas as pd
from pyspark import TaskContext
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..functions.kernels import extract_document
from ..functions.readability import CriteriaConfig, score_texts
from ..operators.extract import TEXT_KINDS
from ..operators.validate import is_valid_expr
from ..schemas import SPAN_TYPE, VALIDATION_TYPE

_VALIDATION_FIELDS = [f.name for f in VALIDATION_TYPE.fields]


def _out_schema(input_schema: T.StructType) -> T.StructType:
    fields = [
        f for f in input_schema.fields if f.name not in ("spans",)
    ]
    return T.StructType(
        fields
        + [
            T.StructField("spans", T.ArrayType(SPAN_TYPE)),
            T.StructField("n_spans", T.IntegerType()),
            T.StructField("n_chars", T.IntegerType()),
            T.StructField("validation", VALIDATION_TYPE),
            T.StructField("partition_id", T.IntegerType()),
            T.StructField("batch_idx", T.IntegerType()),
            T.StructField("batch_wall_ms", T.LongType()),
        ]
    )


def extract_documents_with_metrics(
    df: DataFrame, cfg: CriteriaConfig | None = None
) -> DataFrame:
    """Fused extract+score via mapInPandas with in-pass partition metrics.

    Output = extract_documents columns + (partition_id, batch_idx,
    batch_wall_ms). Values are identical to the pandas-UDF plan (same
    kernels, same scorer) — tested in test_metrics.py.
    """
    cfg = cfg or CriteriaConfig()
    passthrough = [f.name for f in df.schema.fields if f.name != "spans"]
    schema = _out_schema(df.schema)
    colnames = [f.name for f in schema.fields]

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        ctx = TaskContext.get()
        pid = ctx.partitionId() if ctx is not None else -1
        for batch_idx, pdf in enumerate(batches):
            t0 = time.monotonic()
            extracted = [
                extract_document(s) if s is not None else [] for s in pdf["spans"]
            ]
            texts = pd.Series(
                [
                    " ".join(sp["text"] for sp in d if sp["kind"] in TEXT_KINDS)
                    for d in extracted
                ]
            )
            scored = score_texts(texts, cfg)
            out = pdf[passthrough].copy()
            out["spans"] = extracted
            out["n_spans"] = [len(d) for d in extracted]
            out["n_chars"] = texts.str.len().astype("int32").values
            out["validation"] = scored[_VALIDATION_FIELDS].to_dict("records")
            out["partition_id"] = pid
            out["batch_idx"] = batch_idx
            out["batch_wall_ms"] = int((time.monotonic() - t0) * 1000)
            yield out[colnames]

    out = df.mapInPandas(run, schema=schema)
    return out.withColumn(
        "is_valid", is_valid_expr("validation", relaxed=cfg.relaxed_relevance)
    )


def lineage_rollup(out: DataFrame, run_id: str) -> DataFrame:
    """Per-partition lineage rows (FIXTURES.md §4) from the in-pass metric
    columns: wall_ms summed once per (partition, batch)."""
    per_batch = out.groupBy("partition_id", "batch_idx").agg(
        F.count("*").alias("doc_count"),
        F.sum("n_chars").alias("byte_count"),
        F.first("batch_wall_ms").alias("wall_ms"),
    )
    return per_batch.groupBy("partition_id").agg(
        F.sum("doc_count").cast("long").alias("doc_count"),
        F.sum("byte_count").cast("long").alias("byte_count"),
        F.sum("wall_ms").cast("long").alias("wall_ms"),
    ).select(
        F.lit(run_id).alias("run_id"),
        F.col("partition_id").cast("int"),
        "doc_count",
        "byte_count",
        "wall_ms",
        F.lit("committed").alias("status"),
    )
