"""DSIR importance resampling + temperature mixing — planted-signal and
determinism pins (the cross-engine value parity is the harness oracle's
job; these tests pin the SEMANTICS)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from ai_textbook_processor_spark.operators.dsir import (
    dsir_logweights,
    dsir_select,
)
from ai_textbook_processor_spark.operators.sampling import temperature_mix

TARGET_VOCAB = "protein enzyme molecule catalyst substrate reaction"
OFFTOPIC_VOCAB = "celebrity gossip fashion scandal paparazzi tabloid"


@pytest.fixture(scope="module")
def corpus(spark):
    rows = []
    # target sample: docs 0-9, distinctive vocabulary
    for i in range(10):
        rows.append((i, "target", f"{TARGET_VOCAB} study {i} result"))
    # raw pool, on-topic: docs 100-109 share the target vocabulary
    for i in range(100, 110):
        rows.append((i, "raw", f"{TARGET_VOCAB} experiment {i} notes"))
    # raw pool, off-topic: docs 200-209
    for i in range(200, 210):
        rows.append((i, "raw", f"{OFFTOPIC_VOCAB} story {i} update"))
    return spark.createDataFrame(rows, "doc_id long, pool string, text string")


def test_dsir_ranks_target_like_docs_first(corpus):
    top = dsir_select(corpus, F.col("pool") == "target", k=10)
    ids = [r["doc_id"] for r in top.collect()]
    assert set(ids) == set(range(100, 110)), ids


def test_dsir_weights_separate_pools(corpus):
    w = dsir_logweights(corpus, F.col("pool") == "target")
    rows = {r["doc_id"]: r["logw"] for r in w.collect()}
    # target rows are not scored; every raw row is
    assert set(rows) == set(range(100, 110)) | set(range(200, 210))
    on = min(rows[i] for i in range(100, 110))
    off = max(rows[i] for i in range(200, 210))
    assert on > off, (on, off)


def test_dsir_deterministic(corpus):
    a = sorted(map(tuple, dsir_select(corpus, F.col("pool") == "target", k=5).collect()))
    b = sorted(map(tuple, dsir_select(corpus, F.col("pool") == "target", k=5).collect()))
    assert a == b


def test_dsir_plan_topk_not_global_sort(corpus):
    plan = dsir_select(corpus, F.col("pool") == "target", k=5)._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan, plan[:2000]


@pytest.fixture(scope="module")
def mixed(spark):
    rows = []
    doc = 0
    for src, n in (("big", 600), ("mid", 120), ("tiny", 30)):
        for _ in range(n):
            rows.append((doc, src))
            doc += 1
    return spark.createDataFrame(rows, "doc_id long, source string")


def test_temperature_flattens_head(mixed):
    out = {r["source"]: r for r in temperature_mix(mixed, alpha=0.3, n_keep=300).collect()}
    assert set(out) == {"big", "mid", "tiny"}
    # weights normalized, quotas bounded by the budget
    assert abs(sum(r["weight"] for r in out.values()) - 1.0) < 1e-3
    assert sum(r["quota"] for r in out.values()) <= 300
    # alpha<1: the big source's share of the sample is far below its
    # share of the corpus; the tiny source's is far above
    big_share = out["big"]["quota"] / 300
    assert big_share < 600 / 750
    assert out["tiny"]["quota"] / 300 > 30 / 750
    # alpha=1 recovers proportional sampling (within flooring)
    prop = {r["source"]: r for r in temperature_mix(mixed, alpha=1.0, n_keep=300).collect()}
    assert prop["big"]["quota"] == int(300 * 600 / 750)


def test_temperature_membership_deterministic(mixed):
    a = sorted(map(tuple, temperature_mix(mixed, alpha=0.3, n_keep=100).collect()))
    b = sorted(map(tuple, temperature_mix(mixed, alpha=0.3, n_keep=100).collect()))
    assert a == b
    # kept counts track quotas loosely (hash-threshold approximation)
    for row in a:
        src, n_docs, w, quota, n_kept, id_sum = row
        assert 0 <= n_kept <= n_docs
        if quota == 0:
            assert n_kept == 0 and id_sum == 0
