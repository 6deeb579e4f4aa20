"""Benchmark decontamination: flag training docs that overlap an eval set.

Standard practice for LLM training corpora (GPT-3 App. C, Gopher §A1.2,
both public): any training document sharing enough word n-gram shingles
with a benchmark/eval document is removed (or flagged) before training, so
reported eval numbers aren't memorization. The reference has no analog —
this is one of the beyond-reference training-data ops the engine carries
first-class.

Scale shape: the benchmark side is tiny compared to a 100 TB corpus
(thousands of eval docs vs billions of training docs), so its exploded
distinct-shingle set is broadcast — the training side never shuffles; each
scan task probes the broadcast hash table and only the (rare) matching
pairs leave the stage, then one map-side-combined groupBy counts shared
shingles per (train, bench) pair. No all-pairs comparison exists anywhere:
a training doc with zero shingle hits costs one hash probe per shingle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.text import rolling_fingerprints


def _distinct_shingles(df: DataFrame, id_col: str, text_col: str, n: int, out_id: str):
    return df.select(
        F.col(id_col).alias(out_id),
        F.explode(F.array_distinct(rolling_fingerprints(F.col(text_col), n))).alias(
            "g"
        ),
    )


def benchmark_overlap(
    train_df: DataFrame,
    bench_df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    min_shared: int = 2,
) -> DataFrame:
    """(train_id, bench_id, n_shared) for every contaminated pair — train
    docs sharing >= ``min_shared`` DISTINCT word n-gram shingles with a
    benchmark doc. ``array_distinct`` before the explode keeps a repeated
    shingle inside one doc from inflating the overlap count."""
    t = _distinct_shingles(train_df, id_col, text_col, n, "train_id")
    b = _distinct_shingles(bench_df, id_col, text_col, n, "bench_id")
    shared = (
        t.join(F.broadcast(b), "g")
        .groupBy("train_id", "bench_id")
        .agg(F.count("*").alias("n_shared"))
    )
    return shared.where(F.col("n_shared") >= min_shared).select(
        "train_id", "bench_id", F.col("n_shared").cast("long").alias("n_shared")
    )


def decontaminate(
    train_df: DataFrame,
    bench_df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    min_shared: int = 2,
) -> DataFrame:
    """The removal form: training docs with NO flagged benchmark overlap.
    Left-anti join against the (small) contaminated-id set — the id list is
    bounded by the number of contaminated docs, not the corpus, so it
    broadcasts."""
    bad = benchmark_overlap(
        train_df, bench_df, id_col, text_col, n, min_shared
    ).select(F.col("train_id").alias(id_col)).distinct()
    return train_df.join(F.broadcast(bad), id_col, "left_anti")
