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

Single-extraction guarantee: the expensive fused extract UDF runs exactly
once per pipeline invocation. A slim (doc_id, text, gate_ok) projection is
persisted right after extraction; the dedup window, the LSH candidate
join, and all four funnel counts read that cache instead of re-deriving
the lineage (r1 ran the UDF up to 4x — one eager .count() per stage).
Verified by an accumulator test in test_training_pipeline.py.
"""

from __future__ import annotations

from pyspark import StorageLevel
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
    """Returns (cleaned DataFrame, funnel DataFrame of per-stage counts).

    The funnel is computed in two driver actions total (a count that
    materializes the slim cache, then one aggregate over per-doc flags) —
    never one action per stage. ``slim`` stays persisted so that
    materializing ``cleaned`` afterwards also reuses the single extraction
    pass; callers running many pipelines can ``spark.catalog.clearCache()``.

    The near-dup loser set is anti-joined WITHOUT a broadcast hint: on a
    crawl-scale corpus losers are O(duplicate docs) — easily 20-50% of all
    doc_ids, far beyond broadcast limits. A shuffle anti-join on a slim key
    column is cheap, and AQE still broadcasts when the set actually fits.

    Near-dup selection note: at the default ``near_dup_min_matches == K``
    (full-signature equality) pair relations are transitive, so the
    one-pass drop-doc_b heuristic equals cluster-canonical dedup. For
    looser thresholds (min_matches < K) use
    ``operators.dedup.duplicate_clusters`` (connected components) and keep
    ``cluster_id == doc_id`` — chains would otherwise over-delete.
    """
    spark = docs.sparkSession
    extracted = extract_documents(docs, cfg).withColumn(
        "text", extracted_text("spans")
    )

    gate = F.col("is_valid") & (quality_score("text") >= min_quality)
    if langs:
        gate = gate & lang_guess("text").isin(*langs)

    # slim doc-level projection — the ONLY persisted thing (id + extracted
    # text + gate flag; never the span arrays / validation structs)
    slim = extracted.select(
        "doc_id", "text", gate.alias("gate_ok")
    ).persist(StorageLevel.MEMORY_AND_DISK)
    n_input = slim.count()  # action 1: populates the cache => extraction runs here, once

    gated = slim.where("gate_ok")

    # exact dedup: keep the smallest doc_id per content fingerprint
    w = W.partitionBy(fingerprint("text", 200)).orderBy("doc_id")
    winners = (
        gated.withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") == 1)
        .select("doc_id", "text")
    )

    # near-dup dedup: LSH candidates, drop the pair's higher doc_id
    pairs = minhash_lsh_pairs(
        winners, "doc_id", "text", min_matches=near_dup_min_matches
    )
    losers = pairs.select(F.col("doc_b").alias("doc_id")).distinct()

    # action 2: remaining funnel stages in ONE aggregate over per-doc flags
    flags = (
        slim.join(
            winners.select("doc_id", F.lit(True).alias("is_winner")),
            "doc_id",
            "left",
        ).join(
            losers.select("doc_id", F.lit(True).alias("is_loser")), "doc_id", "left"
        )
    )
    is_winner = F.coalesce("is_winner", F.lit(False))
    is_loser = F.coalesce("is_loser", F.lit(False))
    agg = flags.agg(
        F.sum(F.col("gate_ok").cast("long")).alias("extracted_valid"),
        F.sum(is_winner.cast("long")).alias("after_exact_dedup"),
        F.sum((is_winner & ~is_loser).cast("long")).alias("after_near_dedup"),
    ).collect()[0]
    counts = {
        "input": n_input,
        "extracted_valid": agg["extracted_valid"],
        "after_exact_dedup": agg["after_exact_dedup"],
        "after_near_dedup": agg["after_near_dedup"],
    }
    funnel = spark.createDataFrame(
        [(k, v) for k, v in counts.items()], "stage string, n long"
    )

    keep = winners.join(losers, "doc_id", "left_anti").select("doc_id")
    cleaned = (
        extracted.withColumn("quality", quality_score("text"))
        .withColumn("lang_guess", lang_guess("text"))
        .join(keep, "doc_id", "left_semi")
    )
    return cleaned, funnel
