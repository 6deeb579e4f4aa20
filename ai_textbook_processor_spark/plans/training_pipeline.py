"""End-to-end training-data pipeline: the composition a 100 TB corpus
actually runs nightly.

    extract (fused UDF)             -> spans + validation
    quality gate (JVM expressions)  -> quality_score / lang filter
    exact dedup (fingerprint)       -> keep one doc per fingerprint
    near-dup dedup (MinHash+LSH)    -> drop the higher doc_id of each pair
    -> cleaned corpus + per-stage funnel counts

Shuffle budget: extraction none; exact dedup one hash shuffle on the
fingerprint; LSH the (band, sig) shuffle — all on (id, small columns),
never on raw spans. The funnel DataFrame is the pipeline's observability
(the reference's SSE progress analog at dataset granularity).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from ..functions.readability import CriteriaConfig
from ..functions.text import fingerprint, lang_guess, quality_score
from ..operators.dedup import minhash_lsh_pairs
from ..operators.extract import extracted_text
from .pipeline import extract_documents


def clean_corpus(
    docs: DataFrame,
    cfg: CriteriaConfig | None = None,
    min_quality: float = 0.3,
    langs: tuple[str, ...] = (),
    near_dup_min_matches: int = 4,
) -> tuple[DataFrame, DataFrame]:
    """Returns (cleaned DataFrame, funnel DataFrame of per-stage counts)."""
    spark = docs.sparkSession
    extracted = extract_documents(docs, cfg).withColumn(
        "text", extracted_text("spans")
    )
    extracted = extracted.withColumn("quality", quality_score("text")).withColumn(
        "lang_guess", lang_guess("text")
    )

    gated = extracted.where(F.col("is_valid") & (F.col("quality") >= min_quality))
    if langs:
        gated = gated.where(F.col("lang_guess").isin(*langs))

    # exact dedup: keep the smallest doc_id per content fingerprint
    w = W.partitionBy(fingerprint("text", 200)).orderBy("doc_id")
    exact = gated.withColumn("_rn", F.row_number().over(w)).where(
        F.col("_rn") == 1
    ).drop("_rn")

    # near-dup dedup: LSH candidates, drop the pair's higher doc_id
    pairs = minhash_lsh_pairs(
        exact.select("doc_id", "text"), "doc_id", "text",
        min_matches=near_dup_min_matches,
    )
    losers = pairs.select(F.col("doc_b").alias("doc_id")).distinct()
    cleaned = exact.join(F.broadcast(losers), "doc_id", "left_anti")

    counts = {
        "input": docs.count(),
        "extracted_valid": gated.count(),
        "after_exact_dedup": exact.count(),
        "after_near_dedup": cleaned.count(),
    }
    funnel = spark.createDataFrame(
        [(k, v) for k, v in counts.items()], "stage string, n long"
    )
    return cleaned, funnel
