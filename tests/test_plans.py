"""Physical-plan regression guards: the scale properties PLANS.md documents
must survive refactors — zero shuffles and a single fused Python stage on
the hot path, broadcasts on dim joins, pushdown reaching the parquet scan."""

from ai_textbook_processor_spark import harness
from ai_textbook_processor_spark.corpus import corpus_df
from ai_textbook_processor_spark.plans.pipeline import extract_documents

SF = "/root/testdata/sf0.001"


def plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def n_python_stages(p: str) -> int:
    """Fused hot path = exactly ONE Arrow-batched Python stage, whichever
    implementation carries it (MapInPandas for the r6 fully fused
    generate+extract+score stage, ArrowEvalPython / MapInArrow twins)."""
    return (
        p.count("ArrowEvalPython") + p.count("MapInArrow")
        + p.count("MapInPandas")
    )


def test_flagship_plan_is_fused_and_shuffle_free(spark):
    p = plan(extract_documents(corpus_df(spark, 8, seed=1)))
    assert p.count("Exchange") == 0
    assert n_python_stages(p) == 1  # generate+extract+score fully fused
    assert "SortMergeJoin" not in p


def test_parquet_input_extraction_shuffle_free(spark, tmp_path):
    """The production shape (north rule: read a pre-existing table ->
    extract): parquet scan feeds the fused UDF with zero Exchange and a
    spans-pruned read schema."""
    p = str(tmp_path / "docs")
    corpus_df(spark, 8, seed=1).write.parquet(p)
    plan_str = plan(extract_documents(spark.read.parquet(p)))
    assert plan_str.count("Exchange") == 0
    assert n_python_stages(plan_str) == 1
    assert "FileScan parquet" in plan_str


def test_point_lookup_pushdown(spark):
    p = plan(harness.QUERIES["s9_point_lookup"](spark, SF))
    assert "FileScan parquet" in p
    assert "doc_id" in p.split("DataFilters:")[1].split("]")[0]


def test_dim_joins_broadcast(spark):
    p = plan(harness.QUERIES["j4_metadata_enrichment"](spark, SF))
    assert "BroadcastHashJoin" in p and "SortMergeJoin" not in p
    p2 = plan(harness.QUERIES["j2_semi_join_lookup"](spark, SF))
    assert "BroadcastHashJoin" in p2 and "LeftSemi" in p2


def test_global_topk_is_take_ordered_not_window(spark):
    """Global top-k must compile to TakeOrderedAndProject (per-partition
    heaps + driver merge), never a no-partition WindowExec that moves every
    row to a single task (VERDICT r1 #1)."""
    for name in ("sim_cosine_topk", "q3_shipping_priority",
                 "sim_ivf_topk", "dd_ngram_jaccard"):
        p = plan(harness.QUERIES[name](spark, SF))
        assert "TakeOrderedAndProject" in p, name
        # the only windows left must be partitioned ones (lead over doc_id
        # in the shingle builder) — the global row_number rank is gone
        assert "row_number" not in p, name


def test_simhash_single_exchange(spark):
    """SimHash = one groupBy(doc_id) shuffle; the old bit_range crossJoin
    (word rows × bits before the shuffle) must not come back."""
    from ai_textbook_processor_spark.operators.dedup import simhash_signatures

    d = spark.read.parquet(f"{SF}/documents.parquet").limit(50)
    p = plan(simhash_signatures(d, "doc_id", "text", bits=16))
    # one partial+final agg pair around a single exchange; AQE may show the
    # exchange once — assert no CartesianProduct / NestedLoop fan-out and
    # at most one Exchange.
    assert p.count("Exchange") <= 1, p
    assert "CartesianProduct" not in p and "BroadcastNestedLoopJoin" not in p


def test_ivf_assign_is_partial_agg_not_window(spark):
    """Per-vector argmax centroid is groupBy+max_by (map-side combine), not
    a per-id window sort."""
    from ai_textbook_processor_spark.operators.similarity import ivf_assign

    e = spark.read.parquet(f"{SF}/embeddings.parquet")
    import pyspark.sql.functions as F
    cents = e.where(F.col("vec_id").isin(1, 2)).select(
        F.col("vec_id").alias("cid"), F.col("embedding").alias("cemb")
    )
    p = plan(ivf_assign(e, cents))
    assert "Window" not in p
    assert "partial_max_by" in p or "HashAggregate" in p


def test_q1_column_pruning(spark):
    p = plan(harness.QUERIES["q1_pricing_summary"](spark, SF))
    scan = p.split("FileScan parquet ")[1].split("]")[0]
    # exactly the six needed columns reach the scan
    for col in ("l_quantity", "l_extendedprice", "l_discount",
                "l_returnflag", "l_linestatus", "l_shipdate"):
        assert col in scan
    assert "l_orderkey" not in scan and "l_tax" not in scan


def test_decontam_broadcasts_benchmark_side(spark):
    """The 100 TB training side must never shuffle for decontamination:
    the benchmark shingle set rides a broadcast, the overlap count is a
    hash aggregate — no SortMergeJoin, no cartesian fan-out."""
    p = plan(harness.QUERIES["dc_benchmark_overlap"](spark, SF))
    assert "BroadcastHashJoin" in p
    assert "SortMergeJoin" not in p
    assert "CartesianProduct" not in p and "BroadcastNestedLoopJoin" not in p


def test_stratified_sample_is_scan_side_filter(spark):
    """The sampling decision is a pure filter on the scan — the only
    Exchange in samp_stratified belongs to the final per-lang aggregate,
    and the keep predicate sits in a Filter above the FileScan."""
    p = plan(harness.QUERIES["samp_stratified"](spark, SF))
    assert p.count("Exchange") <= 1, p
    assert "Filter" in p and "FileScan parquet" in p
    assert "Window" not in p and "SortMergeJoin" not in p


def test_hof_lambda_lint_catches_broken_fixture(spark):
    """r3 VERDICT #9: the quadratic-blowup bug class (outer expression
    inside a transform/filter/zip_with lambda, re-evaluated once per
    element) must be caught MECHANICALLY by the plan lint — proven on a
    deliberately-broken fixture reproducing the r3 shingle bug shape."""
    import pyspark.sql.functions as F

    from ai_textbook_processor_spark.plans.lint import (
        assert_no_lambda_offenses,
        find_lambda_offenses,
    )

    d = spark.createDataFrame([(1, "a b c d e")], "doc_id long, text string")
    # the r3 bug shape: tokenizer re-run per sequence element
    broken = d.select(
        F.expr(
            "transform(sequence(1, 3), i ->"
            " slice(regexp_extract_all(lower(text), '[a-z]+', 0), i, 2))"
        ).alias("sh")
    )
    off = find_lambda_offenses(broken)
    assert off and "text" in "".join(off), off
    try:
        assert_no_lambda_offenses(broken, "fixture")
    except AssertionError as e:
        assert "per array element" in str(e)
    else:
        raise AssertionError("lint did not raise on the broken fixture")


def test_hof_lambda_rule_holds_on_lambda_heavy_queries(spark):
    """Every HOF-lambda-bearing query plan stays clean: lambdas reference
    only lambda variables (full 74-query sweep runs in tools/gen_plans.py;
    this pins the lambda-heavy subset in the fast gate)."""
    from ai_textbook_processor_spark.plans.lint import assert_no_lambda_offenses

    for name in (
        "scalar_arrays", "txt_repetition", "txt_unigram_entropy",
        "txt_fingerprint", "dd_minhash_lsh", "dd_ngram_jaccard",
        "dd_simhash", "sim_cosine_topk", "pk_sequence_packing",
        "x1_extract_pipeline",
    ):
        assert_no_lambda_offenses(harness.QUERIES[name](spark, SF), name)


def test_r5_selection_ops_plan_shapes(spark):
    """r5 family guards: DSIR models broadcast + top-k without a global
    sort; blocklist gate broadcasts the blocklist; temperature mix and
    hash split add no window; shard manifest is one hash-agg exchange."""
    p = plan(harness.QUERIES["samp_dsir_select"](spark, SF))
    assert "TakeOrderedAndProject" in p and "WindowExec" not in p
    assert "BroadcastHashJoin" in p  # the <=256-row model joins

    p = plan(harness.QUERIES["url_blocklist_gate"](spark, SF))
    assert "BroadcastHashJoin" in p and "SortMergeJoin" not in p

    p = plan(harness.QUERIES["samp_temperature_mix"](spark, SF))
    assert "WindowExec" not in p  # scan-side membership, no rank

    p = plan(harness.QUERIES["samp_split_assign"](spark, SF))
    assert "WindowExec" not in p and "SortMergeJoin" not in p

    p = plan(harness.QUERIES["tp4_shard_manifest"](spark, SF))
    assert "WindowExec" not in p
    assert p.count("Exchange") <= 2  # hash partial agg + final
