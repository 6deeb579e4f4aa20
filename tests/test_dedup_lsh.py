"""Planted near-dup recall/precision for the production MinHash config
(16 permutations, 4 bands of 4 rows — VERDICT r1 #4): pairs at word-set
Jaccard ~0.9 must be discovered, pairs at ~0.2 must be rejected. All
inputs are fixed, so the outcome is deterministic."""

from ai_textbook_processor_spark.operators.dedup import (
    MH_COEFS_16,
    minhash_lsh_pairs,
)


def _wordify(i: int) -> str:
    s, i = "", i + 1
    while i:
        s += chr(ord("a") + i % 26)
        i //= 26
    return "w" + s


def _doc(word_ids) -> str:
    return " ".join(_wordify(i) for i in word_ids)


def test_planted_near_dups_found_far_pairs_rejected(spark):
    rows = []
    # 3 planted near-dup pairs: 95 shared / 105 union -> jaccard ~0.905
    for p in range(3):
        base = list(range(p * 1000, p * 1000 + 100))
        variant = base[:95] + [p * 1000 + 500 + t for t in range(5)]
        rows.append((f"near-{p}-a", _doc(base)))
        rows.append((f"near-{p}-b", _doc(variant)))
    # 3 far pairs: 33 shared / 167 union -> jaccard ~0.198
    for p in range(3):
        shared = list(range(10000 + p * 1000, 10000 + p * 1000 + 33))
        a = shared + [20000 + p * 1000 + t for t in range(67)]
        b = shared + [30000 + p * 1000 + t for t in range(67)]
        rows.append((f"far-{p}-a", _doc(a)))
        rows.append((f"far-{p}-b", _doc(b)))

    df = spark.createDataFrame(rows, "doc_id string, text string")
    pairs = minhash_lsh_pairs(
        df, "doc_id", "text", min_matches=8, coefs=tuple(MH_COEFS_16), band_rows=4
    )
    got = {(r.doc_a, r.doc_b): r.est_jaccard for r in pairs.collect()}

    for p in range(3):  # recall: every planted near-dup pair is found
        key = (f"near-{p}-a", f"near-{p}-b")
        assert key in got, f"missed planted near-dup {key}"
        assert got[key] >= 0.5
    # precision: no far pair (and no cross-group pair) survives
    assert not any("far" in a or "far" in b for a, b in got), got


def test_duplicate_clusters_chain_transitivity(spark):
    """a~b and b~c must land in ONE cluster labeled min(a,b,c), even with
    no direct a~c pair (the r1 drop-doc_b heuristic mishandled chains);
    disjoint pairs stay in separate clusters."""
    from ai_textbook_processor_spark.operators.dedup import duplicate_clusters

    pairs = spark.createDataFrame(
        [(1, 5), (5, 9), (9, 12), (20, 21), (30, 31), (31, 30)],
        "doc_a long, doc_b long",
    )
    got = {r["doc_id"]: r["cluster_id"] for r in duplicate_clusters(pairs).collect()}
    assert got == {1: 1, 5: 1, 9: 1, 12: 1, 20: 20, 21: 20, 30: 30, 31: 30}


def test_band_rows_must_divide_k(spark):
    df = spark.createDataFrame([("a", "x y z")], "doc_id string, text string")
    try:
        minhash_lsh_pairs(df, coefs=tuple(MH_COEFS_16), band_rows=5)
        raise AssertionError("expected ValueError")
    except ValueError:
        pass


def test_hot_bucket_cap_routes_star_not_clique(spark):
    """r2 VERDICT #3: a bucket of near-identical boilerplate docs must not
    explode into k^2/2 pairwise candidates. With hot_bucket_cap, the 1000
    identical docs emit a 999-row STAR to the bucket minimum; connected
    components still collapse them into one cluster."""
    from ai_textbook_processor_spark.operators.dedup import duplicate_clusters

    base = _doc(range(60))
    rows = [(f"boiler-{i:04d}", base) for i in range(1000)]
    # plus one unrelated pair that must still be discovered pairwise
    rows.append(("solo-a", _doc(range(5000, 5100))))
    rows.append(("solo-b", _doc(list(range(5000, 5095)) + list(range(6000, 6005)))))
    df = spark.createDataFrame(rows, "doc_id string, text string").repartition(8)

    pairs = minhash_lsh_pairs(
        df, "doc_id", "text", min_matches=12, coefs=tuple(MH_COEFS_16),
        band_rows=4, hot_bucket_cap=64,
    ).persist()
    n = pairs.count()
    # star: 999 boiler pairs (all to boiler-0000) + 1 solo pair — NOT ~500k
    boiler = pairs.where("doc_a like 'boiler%'")
    assert boiler.count() == 999
    assert boiler.where("doc_a = 'boiler-0000'").count() == 999
    assert n == 1000, n

    clusters = duplicate_clusters(pairs)
    agg = {
        r["cluster_id"]: r["cnt"]
        for r in clusters.groupBy("cluster_id").count().withColumnRenamed(
            "count", "cnt"
        ).collect()
    }
    assert agg["boiler-0000"] == 1000
    assert agg["solo-a"] == 2
    pairs.unpersist()


def test_duplicate_clusters_deep_chain_truncates_lineage(spark):
    """r2 VERDICT #5: a depth-20 chain converges, and the checkpoint-based
    rounds keep the returned plan a flat scan (no join towers), so plan
    depth is bounded no matter how many rounds ran."""
    from ai_textbook_processor_spark.operators.dedup import duplicate_clusters

    pairs = spark.createDataFrame(
        [(i, i + 1) for i in range(20)], "doc_a long, doc_b long"
    )
    clusters = duplicate_clusters(pairs, check_every=3)
    got = {r["doc_id"]: r["cluster_id"] for r in clusters.collect()}
    assert got == {i: 0 for i in range(21)}
    # checkpoint truncation: the final frame reads a materialized RDD scan —
    # its optimized plan must contain no Join and no Aggregate
    plan = clusters._jdf.queryExecution().optimizedPlan().toString()
    assert "Join" not in plan and "Aggregate" not in plan, plan


def test_mega_doc_shingling_is_linear(spark):
    """Regression guard for the r3 quadratic-shingling bug (HOF lambda
    re-evaluating the outer tokenizer once per element): a 200k-token doc
    must shingle in seconds, not hours. 30 s is ~100x the measured fixed
    cost and ~1/500th of the quadratic one."""
    import time

    from pyspark.sql import functions as F

    from ai_textbook_processor_spark.functions.text import rolling_fingerprints
    from ai_textbook_processor_spark.operators.dedup import (
        MH_COEFS_16,
        minhash_signatures,
    )

    mega = " ".join(f"tok{k % 1499}q{k % 53}" for k in range(100_000))
    df = spark.createDataFrame([("m1", mega)], "doc_id string, text string")

    t0 = time.monotonic()
    n = df.select(F.size(rolling_fingerprints("text", 3)).alias("n")).collect()[0]["n"]
    sig = minhash_signatures(df, "doc_id", "text", tuple(MH_COEFS_16), 3).collect()
    wall = time.monotonic() - t0
    assert n > 150_000 and len(sig) == 1
    assert wall < 30, f"mega-doc shingling took {wall:.1f}s"


def test_ngram_jaccard_default_max_df_bounds_hot_shingles(spark):
    """r5 VERDICT nit: the operator's default must not produce the
    k^2-explosion self-join. Plant one boilerplate shingle shared by
    every doc: with max_df capped the shared-shingle candidates collapse
    to only the genuinely-similar pair; with max_df=None every doc pair
    is a candidate. The default must behave like the capped plan."""
    from ai_textbook_processor_spark.operators.dedup import (
        ngram_jaccard_pairs,
    )

    hot = "copyright example corp reserved"
    rows = [(i, f"{hot} unique{i} filler{i} tail{i}") for i in range(30)]
    rows += [(100, f"{hot} same same same body"), (101, f"{hot} same same same body")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    # candidate pairs BEFORE the jaccard threshold = rows of the self-join
    exhaustive = ngram_jaccard_pairs(df, n=2, top_k=None, max_df=None)
    capped = ngram_jaccard_pairs(df, n=2, top_k=None, max_df=5)
    n_exh = exhaustive.count()
    n_cap = capped.count()
    assert n_exh >= (32 * 31) // 2  # hot shingle makes every pair a candidate
    assert n_cap < 40  # cap drops the boilerplate shingle's candidates
    # the default is a finite cap (not the exhaustive plan)
    import inspect

    from ai_textbook_processor_spark.operators.dedup import (
        DEFAULT_SHINGLE_MAX_DF,
    )

    sig = inspect.signature(ngram_jaccard_pairs)
    assert sig.parameters["max_df"].default == DEFAULT_SHINGLE_MAX_DF
    assert DEFAULT_SHINGLE_MAX_DF is not None
    default = ngram_jaccard_pairs(df, n=2, top_k=None)
    assert default.count() == n_exh  # cap >> 32 docs: nothing dropped here
