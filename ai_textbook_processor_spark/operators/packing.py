"""Sequence packing: assign documents to fixed-token-budget training bins.

LLM pre-training consumes fixed-length sequences; packing multiple short
documents into one sequence (instead of padding) is standard practice
(e.g. T5/GPT-style "example packing", public). The exact bin-packing
problem is NP-hard and inherently sequential; the standard streaming
shortcut is CUMULATIVE packing: walk documents in a deterministic order,
cut a new bin whenever the running token total crosses the budget. A bin
then overflows the budget by at most one document, which trainers absorb
by truncating the final document of the sequence.

Scale shape: a single UNPARTITIONED cumulative sum would funnel every row
through one task — the exact WindowExec trap this repo engineered out of
its top-k paths. Instead documents are first assigned to a deterministic
hash bucket (md5-slice of the id, cross-engine-stable) and packed WITHIN
buckets: the window is partitioned by bucket, so each task packs its own
bucket's stream and bins never cross buckets. With B buckets the packing
loses at most B partially-filled tail bins — negligible at corpus scale —
and the plan is one hash shuffle + a partitioned window, both scalable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .sampling import sample_hash


def pack_bins(
    df: DataFrame,
    budget: int,
    id_col: str = "doc_id",
    token_col: str = "n_tokens",
    n_buckets: int = 8,
) -> DataFrame:
    """Add (bucket, bin_idx) to each row: deterministic cumulative packing
    of ``token_col`` into bins of ~``budget`` tokens within each hash
    bucket, ordered by id. Every row keeps its tokens; a bin's total
    exceeds ``budget`` by less than its last document."""
    bucket = (sample_hash(id_col) % n_buckets).alias("bucket")
    w = (
        Window.partitionBy("bucket")
        .orderBy(id_col)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    cum_before = F.coalesce(F.sum(token_col).over(w), F.lit(0))
    return df.withColumn("bucket", bucket).withColumn(
        "bin_idx", F.floor(cum_before / F.lit(budget)).cast("long")
    )


def bin_stats(packed: DataFrame, token_col: str = "n_tokens") -> DataFrame:
    """Per-bin occupancy: the packing-quality view a pipeline monitors
    (bins per bucket, docs per bin, token fill)."""
    return packed.groupBy("bucket", "bin_idx").agg(
        F.count("*").cast("long").alias("n_docs"),
        F.sum(token_col).cast("long").alias("sum_tokens"),
    )
