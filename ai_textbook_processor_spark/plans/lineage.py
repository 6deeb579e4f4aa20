"""Checkpoint-resumable extraction runner with per-partition lineage.

The Spark re-expression of the reference's SSE progress protocol
(``routes/route.py:205-268``): instead of theatrical progress frames, each
committed bucket group appends lineage rows ``(run_id, partition_id,
doc_count, byte_count, wall_ms, status)`` (FIXTURES.md §4), and a restart
anti-joins the bucket list against the committed set (SURVEY §2.3 J3), so
exactly the uncommitted buckets are reprocessed.

Exactly-once: data commits are idempotent by deterministic commit id
(``{run_id}-g{group}``, see io_catalog.LocalTable.append), and lineage is
appended strictly AFTER the data commit (write-then-log). A crash between
the two re-runs the group: the data commit no-ops, the lineage row lands.

At 10^12-document scale each group filter prunes on the bucket column
(Iceberg bucket-partition transform -> partition pruning; locally the
filter is evaluated post-scan, same semantics).
"""

from __future__ import annotations

import hashlib
import time

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.readability import CriteriaConfig
from ..sources.io_catalog import Catalog
from .pipeline import extract_documents, with_bucket


class SimulatedFailure(RuntimeError):
    """Raised by the fail_after_commits test hook (kill-mid-run fixture)."""


def committed_buckets(spark: SparkSession, catalog: Catalog, run_id: str) -> set[int]:
    lineage = catalog.table("lineage").read(spark)
    if lineage is None:
        return set()
    rows = (
        lineage.where(
            (F.col("run_id") == run_id) & (F.col("status") == "committed")
        )
        .select("partition_id")
        .distinct()
        .collect()
    )
    return {r["partition_id"] for r in rows}


def run_extraction(
    spark: SparkSession,
    docs: DataFrame,
    out_root: str,
    run_id: str,
    n_buckets: int = 32,
    buckets_per_commit: int = 8,
    cfg: CriteriaConfig | None = None,
    fail_after_commits: int | None = None,
) -> dict:
    """Run (or resume) the extraction job; returns a summary dict."""
    catalog = Catalog(out_root)
    extracted_tbl = catalog.table("extracted")
    lineage_tbl = catalog.table("lineage")

    # Guard against resuming the same run_id with different bucketing: a
    # crash between data commit and lineage append leaves committed-but-
    # unrecorded buckets, and a resume with a different grouping would
    # re-append subsets of them under fresh commit ids (duplicate rows).
    # The run's (n_buckets, buckets_per_commit) are pinned on first launch.
    runs_tbl = catalog.table("runs")
    runs = runs_tbl.read(spark)
    if runs is not None:
        prev = (
            runs.where(F.col("run_id") == run_id)
            .select("n_buckets", "buckets_per_commit")
            .distinct()
            .collect()
        )
        if prev and (
            prev[0]["n_buckets"] != n_buckets
            or prev[0]["buckets_per_commit"] != buckets_per_commit
        ):
            raise ValueError(
                f"run {run_id!r} was started with n_buckets="
                f"{prev[0]['n_buckets']}, buckets_per_commit="
                f"{prev[0]['buckets_per_commit']}; resume must use the same"
            )
    runs_tbl.append(
        spark.createDataFrame(
            [(run_id, n_buckets, buckets_per_commit)],
            "run_id string, n_buckets int, buckets_per_commit int",
        ).coalesce(1),
        commit_id=f"run-{run_id}",  # idempotent: resume no-ops
    )

    done = committed_buckets(spark, catalog, run_id)
    todo = [b for b in range(n_buckets) if b not in done]
    groups = [
        todo[i : i + buckets_per_commit]
        for i in range(0, len(todo), buckets_per_commit)
    ]

    bucketed = with_bucket(docs, n_buckets)
    n_commits = 0
    for group in groups:
        t0 = time.monotonic()
        sub = bucketed.where(F.col("bucket").isin(group))
        out = extract_documents(sub, cfg)
        # commit id derives from the FULL sorted bucket set, not min(group):
        # two groups covering different buckets can never collide, so the
        # idempotent no-op only fires for a byte-identical re-run.
        bucket_key = hashlib.sha256(
            ",".join(str(b) for b in sorted(group)).encode()
        ).hexdigest()[:12]
        commit_id = f"{run_id}-b{bucket_key}"
        extracted_tbl.append(out, commit_id=commit_id, meta={"buckets": group})
        wall_ms = int((time.monotonic() - t0) * 1000)

        # Read-back stats from the committed files (doubles as the
        # reference's post-write verification, chroma_utility.py:28-32).
        committed_df = spark.read.parquet(
            *[
                f"{extracted_tbl.data_dir}/{fn}"
                for m in extracted_tbl.manifests()
                if m["commit_id"] == commit_id
                for fn in m["files"]
            ]
        )
        stats = {
            r["bucket"]: r
            for r in committed_df.groupBy("bucket")
            .agg(
                F.count("*").alias("doc_count"),
                F.sum("n_chars").alias("byte_count"),
            )
            .collect()
        }
        rows = [
            (
                run_id,
                int(b),
                int(stats[b]["doc_count"]) if b in stats else 0,
                int(stats[b]["byte_count"] or 0) if b in stats else 0,
                wall_ms,
                "committed",
            )
            for b in group
        ]
        lineage_df = spark.createDataFrame(
            rows,
            "run_id string, partition_id int, doc_count long, byte_count long,"
            " wall_ms long, status string",
        ).coalesce(1)
        lineage_tbl.append(lineage_df, commit_id=f"lineage-{commit_id}")

        n_commits += 1
        if fail_after_commits is not None and n_commits >= fail_after_commits:
            raise SimulatedFailure(f"injected failure after {n_commits} commits")

    result = extracted_tbl.read(spark)
    return {
        "run_id": run_id,
        "buckets_total": n_buckets,
        "buckets_resumed": len(done),
        "buckets_processed": len(todo),
        "commits": n_commits,
        "docs_total": result.count() if result is not None else 0,
    }
