"""spark-submit entry point for the extraction pipeline.

Usage (the north rule's launch shape):

    spark-submit --py-files atps.zip -m ai_textbook_processor_spark.job ...
    # or locally:
    python -m ai_textbook_processor_spark.job --n-docs 1000 --out /tmp/out

Reads either a generated deterministic corpus (--n-docs) or an existing
interleaved-documents table (--input parquet path), runs the extraction
plan, writes the extracted table + quarantine + lineage, prints a one-line
JSON summary to stdout.
"""

from __future__ import annotations

import argparse
import json
import sys
import time

from pyspark.sql import functions as F

from ai_textbook_processor_spark.corpus import corpus_df
from ai_textbook_processor_spark.functions.readability import CriteriaConfig
from ai_textbook_processor_spark.plans.pipeline import extract_documents
from ai_textbook_processor_spark.session import get_spark


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser(description="PySpark main-content extraction job")
    src = ap.add_mutually_exclusive_group(required=True)
    src.add_argument("--n-docs", type=int, help="generate a deterministic corpus")
    src.add_argument("--input", help="parquet path of documents_interleaved")
    ap.add_argument("--out", required=True, help="output directory")
    ap.add_argument("--seed", type=int, default=42)
    ap.add_argument("--mega-every", type=int, default=0)
    ap.add_argument("--buckets", type=int, default=32)
    ap.add_argument("--master", default=None)
    ap.add_argument("--relaxed", action="store_true", help="P7 relaxed relevance gate")
    ap.add_argument("--grade-lo", type=float, default=1.0)
    ap.add_argument("--grade-hi", type=float, default=12.0)
    args = ap.parse_args(argv)

    spark = get_spark(app_name="extract_job", master=args.master)
    t0 = time.monotonic()
    if args.input:
        docs = spark.read.parquet(args.input)
    else:
        docs = corpus_df(spark, args.n_docs, seed=args.seed, mega_every=args.mega_every)

    cfg = CriteriaConfig(
        grade_lo=args.grade_lo, grade_hi=args.grade_hi, relaxed_relevance=args.relaxed
    )
    out = extract_documents(docs, cfg, n_buckets=args.buckets)

    # ONE pass over the data: the valid/quarantine split (P8) becomes a
    # partition column, so the expensive extraction UDF runs exactly once
    # and readers get partition pruning on is_valid for free.
    out.write.mode("overwrite").partitionBy("is_valid").parquet(
        f"{args.out}/extracted"
    )

    ext = spark.read.parquet(f"{args.out}/extracted")
    # partition columns read back as strings; normalize
    ext = ext.withColumn("is_valid", F.col("is_valid").cast("boolean"))
    n_valid = ext.where(F.col("is_valid")).count()
    n_quar = ext.where(~F.col("is_valid")).count()
    n_spans = (
        ext.where(F.col("is_valid")).agg(F.sum("n_spans")).collect()[0][0] or 0
    )
    wall = time.monotonic() - t0
    summary = {
        "docs_valid": n_valid,
        "docs_quarantined": n_quar,
        "docs_total": n_valid + n_quar,
        "output_spans": int(n_spans),
        "wall_sec": round(wall, 3),
        "docs_per_sec": round((n_valid + n_quar) / wall, 3) if wall > 0 else None,
    }
    print(json.dumps(summary))
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
