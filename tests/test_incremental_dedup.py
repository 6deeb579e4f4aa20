"""Incremental minhash dedup: a new batch is matched against a committed
signature index without re-tokenizing the committed corpus. Plants three
cases — new doc duplicating an index doc, a brand-new duplicate pair, and
a unique new doc — and checks keep-first semantics (dup_of = minimum
matching id) plus the broadcast-new plan shape."""

from pyspark.sql import functions as F

from ai_textbook_processor_spark.operators.dedup import (
    incremental_minhash_dedup,
    minhash_signatures,
)

TXT_A = " ".join(f"alpha{j} beta{j} gamma{j}" for j in range(10))
TXT_B = " ".join(f"bravo{j} delta{j} kappa{j}" for j in range(10))
TXT_C = " ".join(f"unique{j} words{j} only{j}" for j in range(10))


def _frames(spark):
    # committed corpus: ids 0/1; new batch: ids 10 (dup of 0), 11/12
    # (brand-new duplicate pair), 13 (unique)
    old = spark.createDataFrame(
        [(0, TXT_A), (1, "old filler " + TXT_C.replace("unique", "uq"))],
        "doc_id long, text string",
    )
    new = spark.createDataFrame(
        [(10, TXT_A), (11, TXT_B), (12, TXT_B), (13, TXT_C)],
        "doc_id long, text string",
    )
    return old, new


def test_incremental_matches_and_keep_first(spark):
    old, new = _frames(spark)
    index_sigs = minhash_signatures(old, "doc_id", "text", shingle_n=3)
    out = {
        r["doc_id"]: r
        for r in incremental_minhash_dedup(
            new, index_sigs, min_matches=3, shingle_n=3
        ).collect()
    }
    assert len(out) == 4
    # exact dup of an index doc -> points at the index id
    assert out[10]["is_dup"] and out[10]["dup_of"] == 0
    assert out[10]["est_jaccard"] == 1.0
    # brand-new pair: larger id points at smaller, smaller is kept
    assert out[12]["is_dup"] and out[12]["dup_of"] == 11
    assert not out[11]["is_dup"] and out[11]["dup_of"] is None
    # unique doc untouched
    assert not out[13]["is_dup"]


def test_broadcast_new_plan_shape(spark):
    old, new = _frames(spark)
    index_sigs = minhash_signatures(old, "doc_id", "text", shingle_n=3)
    plan = (
        incremental_minhash_dedup(
            new, index_sigs, min_matches=3, shingle_n=3, broadcast_new=True
        )
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BroadcastHashJoin" in plan


def test_index_side_is_signatures_only(spark):
    """The committed side participates as (id, s0..sK-1) rows alone — the
    operator must not require a text column on the index frame."""
    old, new = _frames(spark)
    index_sigs = minhash_signatures(
        old, "doc_id", "text", shingle_n=3
    ).select("doc_id", "s0", "s1", "s2", "s3")
    out = incremental_minhash_dedup(
        new, index_sigs, min_matches=3, shingle_n=3
    )
    assert out.where(F.col("is_dup")).count() == 2
