"""DSIR — Data Selection via Importance Resampling (Xie et al., NeurIPS
2023, arXiv:2302.03169).

The standard recipe for carving a pretraining corpus toward a small
curated target domain: featurize every document as a bag of HASHED
n-grams (unigrams + bigrams hashed into B buckets), fit two smoothed
bucket-frequency models — one on the target sample, one on the raw pool —
and rank raw documents by the log importance ratio

    logw(d) = (1/|d|) * sum_b c_d[b] * ( ln p_target[b] - ln p_raw[b] )

(the 1/|d| normalization removes the paper's length bias; selection takes
the top-k).  The reference service has no corpus-relative selection at
all (`/root/reference/routes/route.py` processes whatever it is handed);
this is part of the training-data operator family the engine adds.

Cross-engine determinism: the bucket hash is the repo's md5-slice idiom
(`sampling.sample_hash` pattern — DuckDB computes the identical value
from ``CAST('0x' || substr(md5(g),1,12) AS BIGINT) % B``), smoothing is
Laplace add-one with integer counts, and the final score is rounded to 5
decimals before it becomes a sort key, so the DuckDB oracle re-derives
the full ranking independently.

Scale shape (the 100 TB read):
- grams are a pure array expression (``_shingle_expr`` — lambda-safe, no
  per-element re-evaluation) exploded once; the only wide exchange
  carries (doc_id, bucket) pairs, combined map-side.
- both bucket-frequency models aggregate to at most B rows each (B=256
  here, 10k in the paper — still model-sized), broadcast back into the
  per-doc scoring join: raw text never rides a join.
- final selection is orderBy+limit — Spark plans it as
  TakeOrderedAndProject (per-partition top-k, k-row exchange), never a
  global sort.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .dedup import _shingle_expr

#: hashed-feature bucket count (paper uses 10k; 256 keeps the oracle's
#: model table human-checkable while exercising identical plumbing)
DSIR_BUCKETS = 256


def gram_bucket(gram: Column, buckets: int = DSIR_BUCKETS) -> Column:
    """Hash bucket of an n-gram string — 48-bit md5 slice mod ``buckets``,
    bit-identical to the DuckDB twin."""
    h = F.conv(F.substring(F.md5(gram), 1, 12), 16, 10).cast("bigint")
    return F.pmod(h, F.lit(buckets))


def hashed_gram_buckets(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text",
    buckets: int = DSIR_BUCKETS,
) -> DataFrame:
    """(id, bucket, dc) hashed unigram+bigram counts per document — the
    DSIR featurization.  One explode, one map-side-combined groupBy."""
    toks = F.regexp_extract_all(F.lower(F.col(text_col)), F.lit("[a-z]+"), 0)
    grams = F.concat(toks, _shingle_expr(toks, 2))
    return (
        df.select(id_col, F.explode(grams).alias("g"))
        .select(id_col, gram_bucket(F.col("g"), buckets).alias("b"))
        .groupBy(id_col, "b")
        .agg(F.count("*").alias("dc"))
    )


def dsir_logweights(
    df: DataFrame,
    target_pred: Column,
    id_col: str = "doc_id",
    text_col: str = "text",
    buckets: int = DSIR_BUCKETS,
) -> DataFrame:
    """Length-normalized DSIR log importance weight for every RAW document
    (rows where ``target_pred`` is false), scored against the target rows.

    Returns (id, n_grams, logw) with ``logw`` rounded to 5 decimals —
    round BEFORE ranking so the ordering is engine-independent.
    """
    flagged = df.withColumn("_t", target_pred)
    counts = hashed_gram_buckets(flagged, id_col, text_col, buckets)
    counts = counts.join(flagged.select(id_col, "_t"), id_col)
    # r6 third pass, measured: ``counts`` is consumed three times (the
    # bucket model, its totals subquery, and the per-doc scoring join),
    # and each consumer re-ran the full tokenize+shingle+hash lineage
    # (no cross-plan reuse, r3 lesson).  Lazy localCheckpoint: one
    # computation, identical rows AND identical single-lineage layout —
    # the per-doc float sum in the scoring aggregate keeps exactly the
    # row order it had (this operator is deliberately NOT spread: a
    # multi-map-block layout would make that float merge order
    # fetch-dependent, the §9b parity rule).
    counts = counts.localCheckpoint(eager=False)

    # bucket-frequency models: <= 2*buckets rows total, Laplace add-one
    model = counts.groupBy("b").agg(
        F.sum(F.when(F.col("_t"), F.col("dc")).otherwise(0)).alias("ct"),
        F.sum(F.when(~F.col("_t"), F.col("dc")).otherwise(0)).alias("cr"),
    )
    totals = model.agg(
        F.sum("ct").alias("tt"), F.sum("cr").alias("tr")
    )
    model = model.crossJoin(F.broadcast(totals)).select(
        "b",
        (
            F.log((F.col("ct") + 1) / (F.col("tt") + buckets))
            - F.log((F.col("cr") + 1) / (F.col("tr") + buckets))
        ).alias("lr"),
    )

    return (
        counts.filter(~F.col("_t"))
        .join(F.broadcast(model), "b")
        .groupBy(id_col)
        .agg(
            F.sum("dc").cast("long").alias("n_grams"),
            F.round(
                F.sum(F.col("dc") * F.col("lr")) / F.sum("dc"), 5
            ).alias("logw"),
        )
    )


def dsir_select(
    df: DataFrame,
    target_pred: Column,
    k: int,
    id_col: str = "doc_id",
    text_col: str = "text",
    buckets: int = DSIR_BUCKETS,
) -> DataFrame:
    """Top-``k`` raw documents by DSIR weight (ties broken by id, on the
    ROUNDED score, so both engines agree).  orderBy+limit ->
    TakeOrderedAndProject: the exchange carries k rows per partition."""
    w = dsir_logweights(df, target_pred, id_col, text_col, buckets)
    return w.orderBy(F.col("logw").desc(), F.col(id_col)).limit(k)
