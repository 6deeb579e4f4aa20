"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash -> CORRECTNESS_r{N}.json).

Implementations live in ``ai_textbook_processor_spark.harness``; each
registry entry maps to an operator in SURVEY.md §2 (see the docstring on
every query function).
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from ai_textbook_processor_spark import harness  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return harness.entry_query(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2 (plus the
    training-data ops: dedup, similarity search, text analysis)."""
    return dict(harness.QUERIES)


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL for every query. SQL-expressible ops use
    hand-written ANSI oracles; the extraction/generation/pipeline/modality
    entries (x1, x2, g1, tp1, tp2, s4, s6) use literal-table oracles whose
    values are computed independently by the pure-Python golden producer
    (shared kernels + pandas scorer, zero Spark) over the same parquet
    tables — see ai_textbook_processor_spark/golden_oracle.py."""
    from ai_textbook_processor_spark.golden_oracle import literal_oracles

    sf_dir = os.environ.get("SF_DIR", "/root/testdata/sf0.01")
    out = dict(harness.ORACLES)
    out.update(literal_oracles(sf_dir))
    return out
