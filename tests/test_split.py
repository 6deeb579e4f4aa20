"""hash_split / leakage_safe_split — partition and no-leakage pins."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from ai_textbook_processor_spark.operators.sampling import (
    hash_split,
    leakage_safe_split,
)


@pytest.fixture(scope="module")
def ids(spark):
    return spark.range(2000).select(F.col("id").alias("doc_id"))


def test_split_is_total_and_disjoint(ids):
    out = ids.select("doc_id", hash_split("doc_id"))
    counts = {r["split"]: r["n"] for r in out.groupBy("split").agg(F.count("*").alias("n")).collect()}
    assert set(counts) == {"train", "val", "test"}
    assert sum(counts.values()) == 2000  # every row exactly one split
    # fractions roughly honored (hash is uniform; 90/5/5 over 2000 rows)
    assert counts["train"] > 1600 and counts["val"] < 250 and counts["test"] < 250


def test_split_deterministic_and_layout_independent(ids):
    a = sorted(map(tuple, ids.select("doc_id", hash_split("doc_id")).collect()))
    b = sorted(map(tuple, ids.repartition(7).select("doc_id", hash_split("doc_id")).collect()))
    assert a == b


def test_split_fractions_validated(ids):
    with pytest.raises(ValueError):
        ids.select(hash_split("doc_id", (("a", 0.5), ("b", 0.4))))


def test_leakage_safe_split_keeps_clusters_together(spark, ids):
    # planted clusters: docs 0-99 in pairs (0,1)(2,3)... plus singletons
    clusters = spark.createDataFrame(
        [(i, (i // 2) * 2) for i in range(100)], "doc_id long, cluster_id long"
    )
    out = leakage_safe_split(ids, clusters)
    rows = out.collect()
    assert len(rows) == 2000
    by_rep = {}
    for r in rows:
        by_rep.setdefault(r["rep"], set()).add(r["split"])
    assert all(len(s) == 1 for s in by_rep.values())  # no cluster spans splits
    # paired docs really share a split
    split_of = {r["doc_id"]: r["split"] for r in rows}
    for i in range(0, 100, 2):
        assert split_of[i] == split_of[i + 1]
    # singletons use their own id as rep
    reps = {r["doc_id"]: r["rep"] for r in rows}
    assert reps[1999] == 1999
