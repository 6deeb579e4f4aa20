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
