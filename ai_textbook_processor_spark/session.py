"""SparkSession factory tuned for the extraction workload.

Local-mode defaults mirror what we would set cluster-side: AQE on, shuffle
partitions sized to cores (not 200), Arrow enabled with a bounded batch size
(documents are fat rows — target ~tens of MB per Arrow batch, SURVEY.md §4.3).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

# Docs are fat rows (a mega-doc can be MBs); cap Arrow batches below the
# default 10k records so a batch stays comfortably inside executor memory.
# 2048 measured best at <=16 lanes (512 pays too many round-trips, 10k
# bloats per-task buffers and GC). Above 16 lanes, batch handoffs become
# the JVM's hottest lock path (allocation + PythonRunner signalling per
# batch x lanes): 8192 measured local[32] at 13-15.7k docs/s stable vs
# 5.9-13.4k wildly variable at 2048 (r2 sweep, BENCH/BASELINE.md).
ARROW_MAX_RECORDS_PER_BATCH = 2048
ARROW_MAX_RECORDS_PER_BATCH_MANY_LANES = 8192

# Above this many local threads, declare spark.task.cpus=2: every task in
# this engine is a JVM thread PLUS a paired Python worker (Arrow UDF), i.e.
# two execution lanes. Measured on this box: local[32] with task.cpus=1
# collapses to ~5k docs/s (scheduler/GC contention in the single local-mode
# JVM); task.cpus=2 recovers ~14k docs/s. On a real cluster the same
# setting is the standard sizing for Python-heavy stages.
TASK_CPUS_THRESHOLD = 16


def get_spark(
    app_name: str = "ai_textbook_processor_spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    submit_args = os.environ.get("PYSPARK_SUBMIT_ARGS", "")
    submitted_master = None
    if master is None:
        master = os.environ.get("SPARK_GRAFT_MASTER")
    if master is None:
        # Respect spark-submit's --master — it reaches the script as the
        # MASTER env var (gateway mode) or via PYSPARK_SUBMIT_ARGS; setting
        # builder.master here would silently turn
        # `spark-submit --master local[8]` into local[*].
        if "--master" in submit_args:
            toks = submit_args.split()
            submitted_master = toks[toks.index("--master") + 1]
        elif os.environ.get("MASTER"):
            submitted_master = os.environ["MASTER"]
    if shuffle_partitions is None:
        cpus = os.environ.get("SPARK_GRAFT_CPUS")
        shuffle_partitions = int(cpus) if cpus else (os.cpu_count() or 8)
    import re as _re

    effective = master or submitted_master or "local[*]"
    m = _re.match(r"local\[(\d+|\*)\]", effective)
    n_threads = (
        (os.cpu_count() or 8) if (m and m.group(1) == "*") else int(m.group(1)) if m else 0
    )
    b = SparkSession.builder.appName(app_name)
    if master is not None or submitted_master is None:
        b = b.master(master or "local[*]")
    b = (
        b
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config(
            "spark.sql.execution.arrow.maxRecordsPerBatch",
            os.environ.get(
                "SPARK_GRAFT_ARROW_BATCH",
                str(
                    ARROW_MAX_RECORDS_PER_BATCH_MANY_LANES
                    if n_threads > TASK_CPUS_THRESHOLD
                    else ARROW_MAX_RECORDS_PER_BATCH
                ),
            ),
        )
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "48g"))
    )
    task_cpus = os.environ.get("SPARK_GRAFT_TASK_CPUS")
    if task_cpus:
        b = b.config("spark.task.cpus", task_cpus)
    elif n_threads > TASK_CPUS_THRESHOLD:
        b = b.config("spark.task.cpus", "2")
    # SPARK_GRAFT_EXTRA: semicolon-separated key=value conf overrides, so a
    # bench harness or the driver can inject conf without code changes,
    # e.g. SPARK_GRAFT_EXTRA='spark.sql.shuffle.partitions=64;spark.task.cpus=1'
    for kv in filter(None, os.environ.get("SPARK_GRAFT_EXTRA", "").split(";")):
        k, _, v = kv.partition("=")
        if k and v:
            b = b.config(k.strip(), v.strip())
    for k, v in (extra_conf or {}).items():
        b = b.config(k, v)
    spark = b.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
