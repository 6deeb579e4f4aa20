"""Bucketed-table co-located join: the scale story's 'no shuffle on
pre-bucketed input' claim, proven on a local warehouse — two tables
bucketed on the join key join without any Exchange."""

import pytest
from pyspark.sql import functions as F


@pytest.fixture(scope="module")
def warehouse(spark, tmp_path_factory):
    docs = spark.range(2000).select(
        F.col("id").alias("doc_id"), (F.col("id") % 7).alias("x")
    )
    meta = spark.range(2000).select(
        F.col("id").alias("doc_id"), (F.col("id") % 3).alias("y")
    )
    spark.sql("DROP TABLE IF EXISTS bdocs")
    spark.sql("DROP TABLE IF EXISTS bmeta")
    docs.write.bucketBy(8, "doc_id").sortBy("doc_id").mode("overwrite").saveAsTable("bdocs")
    meta.write.bucketBy(8, "doc_id").sortBy("doc_id").mode("overwrite").saveAsTable("bmeta")
    yield
    spark.sql("DROP TABLE IF EXISTS bdocs")
    spark.sql("DROP TABLE IF EXISTS bmeta")


def test_bucketed_join_has_no_exchange(spark, warehouse):
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")  # force non-broadcast
    try:
        j = spark.table("bdocs").join(spark.table("bmeta"), "doc_id")
        plan = j._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan, plan
        assert j.count() == 2000
    finally:
        spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
