"""Grouped top-k without sorting or shuffling whole groups.

"Keep at most k documents per domain" (crawl per-domain caps, best-k-by-
quality mixing) is usually written as ``row_number() OVER (PARTITION BY
domain ORDER BY score)`` — but WindowExec shuffles EVERY row of every
group and then sorts each group in full, and a crawl corpus has
mega-domains: one hot domain becomes one giant sorted partition, the same
skew class the salted mega-doc path exists for. For small k none of that
is needed.

``grouped_topk`` is a two-stage selection:

1. **partial (no shuffle)**: a ``mapInPandas`` pass over whatever
   partitioning the slim projection already has keeps only each task's
   best k rows per group (vectorized ``sort_values`` + ``groupby.head``)
   — the exchange that follows carries at most ``tasks_touching_group *
   k`` rows per group instead of the whole group;
2. **final**: one ordinary ``groupBy(group)`` over the survivors merges
   the per-task lists (``slice(sort_array(collect_list(struct)), 1, k)``)
   — buffers are O(tasks * k) structs, bounded regardless of group skew.

Determinism: the sort key must end in a unique tiebreak column, so
retried tasks and different partitionings return identical rows
(regression-tested against the window formulation and across
repartitionings in tests/test_topk.py).

Why not one ``collect_list`` + ``slice``? The slice applies AFTER the
aggregation completes — the partial buffers and the exchange still carry
every row of the group. The map-side truncation has to happen before
Spark's aggregation machinery sees the data, which is what stage 1 does.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def grouped_topk(
    df: DataFrame,
    group_col: str,
    order_cols: list[str],
    k: int,
    ascending: bool = True,
    payload_cols: list[str] | None = None,
) -> DataFrame:
    """Top-``k`` rows per ``group_col`` ordered by ``order_cols`` (the
    last order column must be unique — the deterministic tiebreak).
    Returns (group, *order_cols, *payload_cols, rk) with ``rk`` the
    1-based rank inside the group."""
    payload_cols = payload_cols or []
    cols = [group_col, *order_cols, *payload_cols]
    slim = df.select(*cols)
    schema = slim.schema

    # Descending merges via sort_array(asc=False), NOT column negation (r4
    # ADVICE): negation fails analysis for strings/dates, can overflow
    # LONG_MIN under ANSI, and flips null placement. Null order keys are
    # kept consistent between the two stages instead of being forbidden:
    # Spark sorts nulls first ascending / last descending, so the pandas
    # partial uses the matching na_position.
    na_position = "first" if ascending else "last"

    def partial_topk(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if len(pdf):
                yield (
                    pdf.sort_values(order_cols, ascending=ascending,
                                    kind="mergesort", na_position=na_position)
                    .groupby(group_col, sort=False)
                    .head(k)
                )

    survivors = slim.mapInPandas(partial_topk, schema=schema)

    packed = F.struct(
        *[F.col(n) for n in order_cols], *[F.col(c) for c in payload_cols]
    ).alias("_r")
    merged = (
        survivors.select(group_col, packed)
        .groupBy(group_col)
        .agg(
            F.slice(
                F.sort_array(F.collect_list("_r"), asc=ascending), 1, k
            ).alias("_top")
        )
        .select(group_col, F.posexplode("_top").alias("_rk0", "_r"))
    )
    restored = [F.col(f"_r.{n}").alias(n) for n in order_cols] + [
        F.col(f"_r.{c}").alias(c) for c in payload_cols
    ]
    return merged.select(
        group_col, *restored, (F.col("_rk0") + 1).cast("long").alias("rk")
    )
