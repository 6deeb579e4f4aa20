"""SemDeDup operator (operators/dedup.semantic_dedup) on planted fixtures."""

from pyspark.sql import functions as F

from ai_textbook_processor_spark.operators.dedup import semantic_dedup


def _vec(*xs):
    return [float(x) for x in xs]


def test_semantic_dedup_planted(spark):
    # two well-separated clusters along axes 0 and 1
    rows = [
        # cluster A: ids 10,11,12 are colinear (cos=1.0) -> keep 10 only
        (10, _vec(1.0, 0.0, 0.0, 0.0)),
        (11, _vec(2.0, 0.0, 0.0, 0.0)),
        (12, _vec(0.5, 0.0, 0.0, 0.0)),
        # id 13: same cluster but nearly orthogonal within it -> kept
        (13, _vec(0.8, 0.0, 0.6, 0.0)),
        # cluster B: singleton -> kept
        (20, _vec(0.0, 1.0, 0.0, 0.0)),
        # cluster B: near-dup of 20 (cos ~0.9999) -> dropped
        (21, _vec(0.01, 1.0, 0.0, 0.0)),
    ]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    cents = spark.createDataFrame(
        [(0, _vec(1, 0, 0, 0)), (1, _vec(0, 1, 0, 0))],
        "cid long, cemb array<double>",
    )
    out = {
        r["id"]: (r["cid"], r["is_dup"])
        for r in semantic_dedup(emb, cents, tau=0.95).collect()
    }
    assert out == {
        10: (0, False),
        11: (0, True),
        12: (0, True),
        13: (0, False),
        20: (1, False),
        21: (1, True),
    }


def test_semantic_dedup_cross_cluster_blind(spark):
    # identical vectors in DIFFERENT clusters are not compared — the
    # documented recall/cost trade of the clustered design
    rows = [
        (1, _vec(1.0, 1.0)),
        (2, _vec(1.0, 1.0)),
    ]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    cents = spark.createDataFrame(
        [(0, _vec(1.0, 0.9)), (1, _vec(0.9, 1.0))],
        "cid long, cemb array<double>",
    )
    # force them apart by pre-assigning: vector 1 ties to cid 0 (cos equal,
    # lower cid wins for both) -> both land in cid 0 and 2 IS flagged...
    out = semantic_dedup(emb, cents, tau=0.95)
    both = {r["id"]: r["cid"] for r in out.collect()}
    assert both[1] == both[2]  # deterministic tiebreak puts them together

    # now separate clusters genuinely: orthogonal centroids, one vector each
    rows2 = [(1, _vec(1.0, 0.05)), (2, _vec(0.05, 1.0))]
    emb2 = spark.createDataFrame(rows2, "vec_id long, embedding array<double>")
    cents2 = spark.createDataFrame(
        [(0, _vec(1.0, 0.0)), (1, _vec(0.0, 1.0))],
        "cid long, cemb array<double>",
    )
    out2 = semantic_dedup(emb2, cents2, tau=0.0)
    assert all(not r["is_dup"] for r in out2.collect())


def test_semantic_dedup_plan_has_no_window(spark):
    emb = spark.createDataFrame(
        [(i, [float(i), 1.0]) for i in range(8)],
        "vec_id long, embedding array<double>",
    )
    cents = spark.createDataFrame(
        [(0, [1.0, 0.0]), (1, [0.0, 1.0])], "cid long, cemb array<double>"
    )
    plan = semantic_dedup(emb, cents)._jdf.queryExecution().executedPlan().toString()
    assert "Window" not in plan
    assert "LeftSemi" in plan
