"""Physical-plan regression guards: the scale properties PLANS.md documents
must survive refactors — zero shuffles and a single fused Python stage on
the hot path, broadcasts on dim joins, pushdown reaching the parquet scan."""

from ai_textbook_processor_spark import harness
from ai_textbook_processor_spark.corpus import corpus_df
from ai_textbook_processor_spark.plans.pipeline import extract_documents

SF = "/root/testdata/sf0.001"


def plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_flagship_plan_is_fused_and_shuffle_free(spark):
    p = plan(extract_documents(corpus_df(spark, 8, seed=1)))
    assert p.count("Exchange") == 0
    assert p.count("ArrowEvalPython") == 1  # extract+score fused
    assert "SortMergeJoin" not in p


def test_point_lookup_pushdown(spark):
    p = plan(harness.QUERIES["s9_point_lookup"](spark, SF))
    assert "FileScan parquet" in p
    assert "doc_id" in p.split("DataFilters:")[1].split("]")[0]


def test_dim_joins_broadcast(spark):
    p = plan(harness.QUERIES["j4_metadata_enrichment"](spark, SF))
    assert "BroadcastHashJoin" in p and "SortMergeJoin" not in p
    p2 = plan(harness.QUERIES["j2_semi_join_lookup"](spark, SF))
    assert "BroadcastHashJoin" in p2 and "LeftSemi" in p2


def test_q1_column_pruning(spark):
    p = plan(harness.QUERIES["q1_pricing_summary"](spark, SF))
    scan = p.split("FileScan parquet ")[1].split("]")[0]
    # exactly the six needed columns reach the scan
    for col in ("l_quantity", "l_extendedprice", "l_discount",
                "l_returnflag", "l_linestatus", "l_shipdate"):
        assert col in scan
    assert "l_orderkey" not in scan and "l_tax" not in scan
