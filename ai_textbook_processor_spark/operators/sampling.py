"""Deterministic stratified sampling — corpus mixing without a shuffle.

Training-data pipelines mix sources at controlled rates ("20% web, 100%
books, 5% boilerplate domain X"). ``DataFrame.sampleBy`` is seed-dependent
per-partition-ordering and not reproducible across engines or retried
tasks; this operator instead derives the keep/drop decision from a hash of
the row's own id, so the same row makes the same decision everywhere —
across runs, across task retries (a respawned task re-samples identically,
so exactly-once sinks stay consistent), and across engines (the md5-slice
idiom matches DuckDB bit-for-bit, which is what the oracle checks).

Scale shape: a pure scan-side Column predicate — no shuffle, no state, no
driver coordination; composes under whatever partitioning the plan already
has. Rates are plan literals (a CASE over the stratum column), so adding a
stratum never adds a pass.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_BUCKETS = 10_000


def sample_hash(id_col: str | Column) -> Column:
    """Uniform bucket in [0, 10000) from a 48-bit md5 slice of the id —
    cross-engine-stable (DuckDB: CAST('0x' || substr(md5(id),1,12) AS
    BIGINT) % 10000)."""
    c = F.col(id_col) if isinstance(id_col, str) else id_col
    return (
        F.conv(F.substring(F.md5(c.cast("string")), 1, 12), 16, 10).cast("bigint")
        % _BUCKETS
    )


def sample_keep_expr(
    strata_col: str | Column,
    rates: dict[str, float],
    id_col: str | Column = "doc_id",
    default_rate: float = 0.0,
) -> Column:
    """Boolean keep/drop decision as a composable Column — usable as a
    filter (``stratified_sample``) or as a flag inside a wider aggregate
    (the training pipeline's funnel counts it without a second pass)."""
    s = F.col(strata_col) if isinstance(strata_col, str) else strata_col
    threshold = F.lit(int(round(default_rate * _BUCKETS)))
    for value, rate in sorted(rates.items()):
        threshold = F.when(s == value, int(round(rate * _BUCKETS))).otherwise(
            threshold
        )
    return sample_hash(id_col) < threshold


def stratified_sample(
    df: DataFrame,
    strata_col: str,
    rates: dict[str, float],
    id_col: str = "doc_id",
    default_rate: float = 0.0,
) -> DataFrame:
    """Keep each row of stratum s with probability ``rates[s]`` (else
    ``default_rate``), decided by the row's own id hash."""
    return df.where(sample_keep_expr(strata_col, rates, id_col, default_rate))


def temperature_mix(
    df: DataFrame,
    source_col: str = "source",
    id_col: str = "doc_id",
    alpha: float = 0.3,
    n_keep: int = 200,
) -> DataFrame:
    """Temperature-based source mixing (the multinomial-with-temperature
    upsampling rule of mBERT/XLM-R/mT5 — Xue et al. 2021 §3.1, there over
    languages): mixing weight of source s is

        w_s = n_s^alpha / sum_t n_t^alpha

    so alpha<1 flattens the head and boosts tail sources.  Each source's
    quota is floor(n_keep * w_s); membership is the repo's deterministic
    hash rule — keep a row iff

        sample_hash(id) < 10000 * quota_s / n_s

    a pure scan-side predicate (the exact-quota variant needs a
    rank-within-source window; the hash-threshold form keeps E[kept] =
    quota with zero shuffle and survives any corpus size — same trade
    documented on ``stratified_sample``).  The kept SET is deterministic
    and engine-independent even though its size only approximates the
    quota, so the oracle pins the membership itself.

    Returns one row per source: n_docs, weight (rounded display copy),
    quota, n_kept, id_sum of the kept rows (membership pin).  The whole
    job is two model-sized aggregates over (source) plus one broadcast
    join — raw text never moves.
    """
    n = df.groupBy(source_col).agg(F.count("*").alias("n_docs"))
    denom = n.agg(F.sum(F.pow("n_docs", F.lit(alpha))).alias("z"))
    # floor() with a 1e-6 guard: a symmetric corpus (k equal sources) puts
    # n_keep*w_s EXACTLY on an integer in real arithmetic, where the raw
    # floor flips with each engine's (and each run's partition-order!)
    # last-ulp summation noise in z — the epsilon absorbs the ~1e-13 noise
    # while no small-denominator rational lands within 1e-6 below an
    # integer
    quotas = n.crossJoin(F.broadcast(denom)).select(
        source_col,
        "n_docs",
        (F.pow("n_docs", F.lit(alpha)) / F.col("z")).alias("w"),
        F.floor(
            F.lit(float(n_keep)) * F.pow("n_docs", F.lit(alpha)) / F.col("z")
            + F.lit(1e-6)
        ).cast("long").alias("quota"),
    )
    kept = (
        df.select(source_col, id_col)
        .join(F.broadcast(quotas), source_col)
        .where(
            sample_hash(id_col)
            < F.lit(float(_BUCKETS)) * F.col("quota") / F.col("n_docs")
        )
    )
    kept_agg = kept.groupBy(source_col).agg(
        F.count("*").cast("long").alias("n_kept"),
        F.sum(id_col).cast("long").alias("kept_id_sum"),
    )
    return (
        quotas.join(kept_agg, source_col, "left")
        .select(
            source_col,
            F.col("n_docs").cast("long").alias("n_docs"),
            F.round("w", 5).alias("weight"),
            "quota",
            F.coalesce("n_kept", F.lit(0)).cast("long").alias("n_kept"),
            F.coalesce("kept_id_sum", F.lit(0)).cast("long").alias("kept_id_sum"),
        )
    )


def hash_split(
    id_col: str | Column,
    fractions: tuple[tuple[str, float], ...] = (
        ("train", 0.9), ("val", 0.05), ("test", 0.05),
    ),
) -> Column:
    """Deterministic train/val/test assignment: a CASE over cumulative
    id-hash thresholds — every row gets exactly one split, the same one
    on every run/retry/engine, with no shuffle and no seed plumbing
    (``randomSplit`` guarantees none of this: its assignment depends on
    partition layout and can even drop/duplicate rows between actions).
    Fractions are (name, fraction) in priority order; they must sum to 1.
    """
    total = sum(f for _, f in fractions)
    if abs(total - 1.0) > 1e-9:
        raise ValueError(f"fractions must sum to 1, got {total}")
    h = sample_hash(id_col)
    expr = None
    acc = 0.0
    for name, frac in fractions[:-1]:
        acc += frac
        cond = h < int(round(acc * _BUCKETS))
        expr = F.when(cond, name) if expr is None else expr.when(cond, name)
    last = fractions[-1][0]
    return (F.lit(last) if expr is None else expr.otherwise(last)).alias(
        "split"
    )


def leakage_safe_split(
    df: DataFrame,
    clusters: DataFrame,
    id_col: str = "doc_id",
    fractions: tuple[tuple[str, float], ...] = (
        ("train", 0.9), ("val", 0.05), ("test", 0.05),
    ),
) -> DataFrame:
    """Split that cannot leak near-duplicates across the train/test
    boundary: hash the duplicate-CLUSTER representative, not the doc id,
    so every member of a near-dup cluster lands in the same split (the
    contamination mode a plain per-doc split invites — a test doc's
    near-copy sitting in train).  ``clusters`` is (id, cluster_id) from
    ``dedup.duplicate_clusters``; singletons (absent there) represent
    themselves.  One broadcast-or-shuffle join with the (small) cluster
    table, then a scan-side CASE — the splitter adds no window and no
    extra pass over text."""
    rep = (
        df.select(id_col)
        .join(clusters, id_col, "left")
        .select(
            id_col,
            F.coalesce("cluster_id", F.col(id_col)).alias("rep"),
        )
    )
    return rep.select(id_col, "rep", hash_split("rep", fractions))
