"""Benchmark harness (driver contract).

Runs the headline queries at $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE JSON line:
{"metric": ..., "value": N, "unit": "sec", "queries": {...}, "sf": ...}.

Also times the flagship extraction pipeline on a deterministic generated
corpus sized to the SF (the BASELINE.json metric is documents/sec) and, if
tools/bench_scaling.py has produced BENCH/scaling.json, folds the two-
parallelism scaling numbers into the output.
"""

from __future__ import annotations

import json
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from ai_textbook_processor_spark import harness  # noqa: E402
from ai_textbook_processor_spark.corpus import corpus_df  # noqa: E402
from ai_textbook_processor_spark.functions.readability import CriteriaConfig  # noqa: E402
from ai_textbook_processor_spark.plans.pipeline import extract_documents  # noqa: E402
from ai_textbook_processor_spark.session import get_spark  # noqa: E402

HEADLINE = [
    "q1_pricing_summary",
    "a1_ordered_concat",
    "j4_metadata_enrichment",
    "w2_running_offset",
    "ev_sessionize",
    "dd_minhash_lsh",
    "dd_simhash",
    "sim_cosine_topk",
    "sim_lsh_buckets",
    "txt_quality",
]

DOCS_PER_SF = 960_000  # sf0.1 -> 96k docs (mega docs every 4k)


def _noop(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def main() -> int:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    m = re.search(r"sf([0-9.]+)", sf_dir)
    sf = float(m.group(1)) if m else 0.1

    spark = get_spark(
        app_name="bench", master=f"local[{cpus}]", shuffle_partitions=cpus
    )

    # Warm-up: exercise every UDF stage once so Python-worker import cost
    # (~2 s/worker/stage) doesn't pollute per-query timings.
    for _ in range(2):  # two passes so every task slot's worker warms
        _noop(
            extract_documents(
                corpus_df(spark, 32 * cpus, seed=1, num_partitions=cpus),
                CriteriaConfig(),
            )
        )
    _noop(harness.QUERIES["q1_pricing_summary"](spark, sf_dir))

    times: dict[str, float] = {}

    # Flagship extraction throughput FIRST (BASELINE.json metric:
    # documents/sec) — measured right after warm-up, before the query
    # battery litters the JVM with shuffle state and GC debris.
    n_docs = max(int(DOCS_PER_SF * sf), 1000)
    docs = corpus_df(spark, n_docs, seed=42, mega_every=4000,
                     num_partitions=cpus * 2)
    extract_sec = None
    for _ in range(2):  # best-of-2: the host has intermittent CPU steal
        t0 = time.monotonic()
        _noop(extract_documents(docs, CriteriaConfig()))
        dt = round(time.monotonic() - t0, 3)
        extract_sec = dt if extract_sec is None else min(extract_sec, dt)
    times["extract_pipeline"] = extract_sec

    # settle the JVM before the query battery (the big extraction leaves
    # GC debris that would otherwise bill its collection to whichever
    # query runs next)
    spark.sparkContext._jvm.System.gc()
    time.sleep(2)

    for name in HEADLINE:
        best = None
        for _ in range(2):  # best-of-2 vs host noise
            t0 = time.monotonic()
            _noop(harness.QUERIES[name](spark, sf_dir))
            dt = round(time.monotonic() - t0, 3)
            best = dt if best is None else min(best, dt)
        times[name] = best

    out = {
        "metric": "headline queries + interleaved-corpus extraction, total wall",
        "value": round(sum(times.values()), 3),
        "unit": "sec",
        "queries": times,
        "sf": sf,
        "extract_docs": n_docs,
        "extract_docs_per_sec": round(n_docs / extract_sec, 1),
        "cpus": cpus,
    }
    scaling_path = os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "BENCH", "scaling.json"
    )
    if os.path.exists(scaling_path):
        with open(scaling_path) as f:
            out["scaling"] = json.load(f)
    spark.stop()
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    sys.exit(main())
