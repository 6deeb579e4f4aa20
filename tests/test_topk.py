"""grouped_topk: differential equality vs the window formulation,
partitioning independence, skewed-group behavior, and the plan guard
(no WindowExec — the whole point of the operator)."""

import random

from pyspark.sql import Window as W
from pyspark.sql import functions as F

from ai_textbook_processor_spark.operators.topk import grouped_topk


def _window_topk(df, group, order_cols, k):
    w = W.partitionBy(group).orderBy(*[F.col(c) for c in order_cols])
    return (
        df.withColumn("rk", F.row_number().over(w).cast("long"))
        .where(F.col("rk") <= k)
    )


def _mk(spark, n=500, groups=7, seed=3, parts=8):
    rng = random.Random(seed)
    rows = [
        (f"g{rng.randrange(groups)}", i, rng.randrange(1000))
        for i in range(n)
    ]
    return spark.createDataFrame(
        rows, "grp string, id long, score long"
    ).repartition(parts)


def test_matches_window_formulation(spark):
    df = _mk(spark)
    got = {
        tuple(r)
        for r in grouped_topk(df, "grp", ["score", "id"], 5).collect()
    }
    exp = {
        (r["grp"], r["score"], r["id"], r["rk"])
        for r in _window_topk(df, "grp", ["score", "id"], 5)
        .select("grp", "score", "id", "rk")
        .collect()
    }
    assert got == exp and len(got) > 0


def test_partitioning_independent(spark):
    base = _mk(spark, parts=1)
    results = []
    for parts in (1, 7, 32):
        out = grouped_topk(
            base.repartition(parts), "grp", ["score", "id"], 4
        ).collect()
        results.append(sorted(tuple(r) for r in out))
    assert results[0] == results[1] == results[2]


def test_ties_broken_deterministically(spark):
    # every score identical -> selection must be the k smallest ids
    df = spark.createDataFrame(
        [("g", i, 42) for i in range(50)], "grp string, id long, score long"
    ).repartition(6)
    out = grouped_topk(df, "grp", ["score", "id"], 3).collect()
    assert sorted(r["id"] for r in out) == [0, 1, 2]
    assert [r["id"] for r in sorted(out, key=lambda r: r["rk"])] == [0, 1, 2]


def test_skewed_group_and_descending(spark):
    # one mega group + tiny groups; descending via negated numeric col
    rows = [("hot", i, i % 97) for i in range(5000)] + [
        ("cold", 10_000 + i, i) for i in range(3)
    ]
    df = (
        spark.createDataFrame(rows, "grp string, id long, score long")
        .withColumn("neg", -F.col("score"))
        .repartition(16)
    )
    out = grouped_topk(df, "grp", ["neg", "id"], 2)
    got = {
        (r["grp"], -r["neg"], r["id"], r["rk"]) for r in out.collect()
    }
    # hot: max score 96, smallest two ids holding it are 96 and 193
    assert ("hot", 96, 96, 1) in got and ("hot", 96, 193, 2) in got
    assert ("cold", 2, 10_002, 1) in got and ("cold", 1, 10_001, 2) in got


def test_no_window_exec_in_plan(spark):
    df = _mk(spark)
    p = (
        grouped_topk(df, "grp", ["score", "id"], 5)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Window" not in p, p
    # exactly one aggregation exchange (plus AQE reads); no sort of the
    # full input — Sort may appear only inside the final small merge
    assert "WindowExec" not in p


def test_descending_native_strings_and_nulls(spark):
    # r4 ADVICE: ascending=False used to negate order columns, which fails
    # analysis on strings and diverges on nulls. Now it's a native
    # sort_array(asc=False) merge: string keys work, nulls sort LAST on
    # both stages (Spark descending null order == pandas na_position).
    rows = [
        ("g1", "zebra", 1), ("g1", "apple", 2), ("g1", None, 3),
        ("g1", "mango", 4), ("g2", "kiwi", 5), ("g2", None, 6),
    ]
    df = spark.createDataFrame(
        rows, "grp string, word string, id long"
    ).repartition(4)
    out = grouped_topk(df, "grp", ["word", "id"], 2, ascending=False)
    got = {(r["grp"], r["word"], r["rk"]) for r in out.collect()}
    assert got == {
        ("g1", "zebra", 1), ("g1", "mango", 2),
        ("g2", "kiwi", 1), ("g2", None, 2),
    }


def test_descending_matches_window_desc(spark):
    df = _mk(spark, n=400, groups=5, seed=11)
    w = W.partitionBy("grp").orderBy(F.desc("score"), F.desc("id"))
    exp = {
        (r["grp"], r["score"], r["id"], r["rk"])
        for r in df.withColumn("rk", F.row_number().over(w).cast("long"))
        .where(F.col("rk") <= 3)
        .collect()
    }
    got = {
        tuple(r)
        for r in grouped_topk(
            df, "grp", ["score", "id"], 3, ascending=False
        ).collect()
    }
    assert got == exp and len(got) > 0
