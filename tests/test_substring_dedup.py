"""Planted-run test for exact-substring duplication coverage (Lee et al.
arXiv:2107.06499, k-gram formulation): a duplicated run of L >= k tokens
shared by two documents must mark exactly L tokens as duplicated in each,
overlapping shared grams must not double-count positions, runs shorter
than k must contribute nothing, and the plan must stay window-free."""

from ai_textbook_processor_spark.operators.dedup import (
    substring_dup_coverage,
)

K = 5
RUN = " ".join(f"dup{j}" for j in range(12))  # 12-token shared run
SHORT = " ".join(f"sh{j}" for j in range(K - 1))  # k-1 tokens: invisible


def _rows():
    return [
        # docs 0/1 share the 12-token run at different offsets
        (0, f"alpha beta {RUN} gamma"),
        (1, f"{RUN} delta epsilon zeta eta theta"),
        # docs 2/3 share only a (k-1)-token run: below threshold
        (2, f"two three {SHORT} four five six"),
        (3, f"{SHORT} seven eight nine ten eleven"),
        # unique doc
        (4, "lone wolf text with nothing repeated anywhere at all"),
    ]


def test_planted_run_coverage(spark):
    df = spark.createDataFrame(_rows(), "doc_id long, text string")
    out = {
        r["doc_id"]: r
        for r in substring_dup_coverage(df, k=K, min_docs=2).collect()
    }
    assert len(out) == 5
    # the shared 12-token run is covered exactly (L-k+1 grams, union = L)
    assert out[0]["dup_tokens"] == 12 and out[0]["n_tokens"] == 15
    assert out[1]["dup_tokens"] == 12 and out[1]["n_tokens"] == 17
    assert abs(out[0]["dup_frac"] - round(12 / 15, 5)) < 1e-9
    # sub-k shared run and the unique doc contribute nothing
    for i in (2, 3, 4):
        assert out[i]["dup_tokens"] == 0
        assert out[i]["dup_frac"] == 0.0


def test_full_duplicate_is_fully_covered(spark):
    text = " ".join(f"w{j}" for j in range(30))
    df = spark.createDataFrame(
        [(0, text), (1, text), (2, "different entirely")],
        "doc_id long, text string",
    )
    out = {
        r["doc_id"]: r
        for r in substring_dup_coverage(df, k=K, min_docs=2).collect()
    }
    for i in (0, 1):
        assert out[i]["dup_tokens"] == 30
        assert out[i]["dup_frac"] == 1.0
    assert out[2]["dup_tokens"] == 0


def test_plan_is_window_free(spark):
    df = spark.createDataFrame(_rows(), "doc_id long, text string")
    plan = (
        substring_dup_coverage(df, k=K)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "WindowExec" not in plan and "Window\n" not in plan
