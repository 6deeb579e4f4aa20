"""Equality gate for the fused generate+extract+score stage (r6).

The two-stage plan (corpus mapInPandas -> extract pandas UDF) is the
golden twin; the fused single-stage plan must be row-for-row, field-for-
field identical on every corpus family, including mega docs, start
offsets and non-default configs — the same pin discipline as
test_arrow_impl.py for the mapInArrow twin.
"""

from ai_textbook_processor_spark.corpus import corpus_df
from ai_textbook_processor_spark.functions.readability import CriteriaConfig
from ai_textbook_processor_spark.plans.pipeline import extract_documents


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_fused_equals_pandas_on_every_family(spark):
    # 65 docs = 5 full passes over the 13 corpus families; mega_every=13
    # plants 5 mega docs; start offset + non-default cfg exercise the
    # GenSpec plumbing and the relaxed is_valid gate
    cfg = CriteriaConfig(grade_lo=0.0, grade_hi=9.0, relaxed_relevance=True)
    docs = corpus_df(spark, 65, seed=21, mega_every=13, start=7,
                     num_partitions=5)
    f = extract_documents(docs, cfg, impl="fused").orderBy("doc_id").collect()
    p = extract_documents(docs, cfg, impl="pandas").orderBy("doc_id").collect()
    assert len(f) == len(p) == 65
    for rf, rp in zip(f, p):
        assert rf == rp, (rf["doc_id"],)


def test_fused_schema_matches_pandas(spark):
    docs = corpus_df(spark, 2, seed=1)
    sf = extract_documents(docs, impl="fused").schema
    sp = extract_documents(docs, impl="pandas").schema
    assert [(f.name, f.dataType) for f in sf.fields] == [
        (f.name, f.dataType) for f in sp.fields
    ]


def test_fused_plan_is_single_python_stage(spark):
    plan = _plan(extract_documents(corpus_df(spark, 8, seed=3)))
    # one MapInArrow (the fused stage), no second Python boundary
    assert plan.count("MapInArrow") == 1
    assert "ArrowEvalPython" not in plan and "MapInPandas" not in plan
    assert "Exchange" not in plan


def test_fused_falls_back_without_gen_spec(spark):
    # a frame NOT produced by corpus_df (here: any derived frame — the tag
    # does not survive transformations) must take the pandas-UDF path
    docs = corpus_df(spark, 4, seed=3).where("doc_id is not null")
    plan = _plan(extract_documents(docs))
    assert "ArrowEvalPython" in plan and plan.count("MapInPandas") == 1


def test_fused_falls_back_on_repartition_or_bucket(spark):
    from ai_textbook_processor_spark.plans.pipeline import with_bucket

    docs = corpus_df(spark, 4, seed=3)
    plan = _plan(extract_documents(docs, repartition=True))
    assert "ArrowEvalPython" in plan
    pre_bucketed = with_bucket(corpus_df(spark, 4, seed=3), 8)
    plan = _plan(extract_documents(pre_bucketed))
    assert "ArrowEvalPython" in plan


def test_fused_lookahead_equals_no_lookahead_multibatch(spark):
    """The 1-batch lookahead (helpers start batch k+1 before batch k is
    yielded) must be invisible in the output. Shrink the Arrow batch size
    so each partition really carries several input batches — the only
    regime where the lookahead path differs from the serial loop."""
    import os

    key = "spark.sql.execution.arrow.maxRecordsPerBatch"
    old = spark.conf.get(key)
    docs = corpus_df(spark, 520, seed=9, mega_every=130, num_partitions=2)
    spark.conf.set(key, "64")  # 260 ids/partition -> ~5 input batches
    try:
        os.environ["SPARK_GRAFT_FUSED_PROCS"] = "2"
        try:
            os.environ["SPARK_GRAFT_FUSED_LOOKAHEAD"] = "1"
            on = extract_documents(docs, impl="fused").collect()
            os.environ["SPARK_GRAFT_FUSED_LOOKAHEAD"] = "0"
            off = extract_documents(docs, impl="fused").collect()
        finally:
            del os.environ["SPARK_GRAFT_FUSED_PROCS"]
            del os.environ["SPARK_GRAFT_FUSED_LOOKAHEAD"]
    finally:
        spark.conf.set(key, old)
    serial = extract_documents(docs, impl="fused").collect()
    assert len(on) == len(off) == len(serial) == 520
    assert on == off == serial


def test_fused_parallel_helper_equals_serial(spark):
    """procs=2 (fork helper) must yield identical rows in identical order;
    batch splitting and reassembly are invisible in the output."""
    import os

    from ai_textbook_processor_spark.corpus import corpus_df

    docs = corpus_df(spark, 520, seed=5, mega_every=130, num_partitions=2)
    os.environ["SPARK_GRAFT_FUSED_PROCS"] = "2"
    try:
        par = extract_documents(docs, impl="fused").collect()
    finally:
        del os.environ["SPARK_GRAFT_FUSED_PROCS"]
    ser = extract_documents(docs, impl="fused").collect()
    assert len(par) == len(ser) == 520
    assert par == ser
