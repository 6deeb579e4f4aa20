"""SparkSession factory tuned for the extraction workload.

Local-mode defaults mirror what we would set cluster-side: AQE on, shuffle
partitions sized to cores (not 200), Arrow enabled with a bounded batch size
(documents are fat rows — target ~tens of MB per Arrow batch, SURVEY.md §4.3).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

# Docs are fat rows (a mega-doc can be MBs); cap Arrow batches well below the
# default 10k records so a batch stays comfortably inside executor memory.
ARROW_MAX_RECORDS_PER_BATCH = 512


def get_spark(
    app_name: str = "ai_textbook_processor_spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    master = master or os.environ.get("SPARK_GRAFT_MASTER", "local[*]")
    if shuffle_partitions is None:
        cpus = os.environ.get("SPARK_GRAFT_CPUS")
        shuffle_partitions = int(cpus) if cpus else (os.cpu_count() or 8)
    b = (
        SparkSession.builder.master(master)
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config(
            "spark.sql.execution.arrow.maxRecordsPerBatch",
            str(ARROW_MAX_RECORDS_PER_BATCH),
        )
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "32g"))
    )
    for k, v in (extra_conf or {}).items():
        b = b.config(k, v)
    spark = b.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
