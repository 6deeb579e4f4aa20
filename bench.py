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

    # INTERLEAVED best-of-N (r3 VERDICT #4): this host drifts 25-40%
    # intra-day, so two back-to-back reps of one query can both land in a
    # slow phase and bill the hypervisor to the engine. Running the WHOLE
    # battery in ROUNDS full passes and taking each query's minimum across
    # rounds decorrelates host phase from query identity — a slow phase
    # now hits one round of everything, not every rep of something.
    rounds = int(os.environ.get("SPARK_GRAFT_BENCH_REPS", "3"))
    n_docs = max(int(DOCS_PER_SF * sf), 1000)
    docs = corpus_df(spark, n_docs, seed=42, mega_every=4000,
                     num_partitions=cpus * 2)
    battery: list[tuple[str, object]] = [
        ("extract_pipeline", lambda: extract_documents(docs, CriteriaConfig()))
    ] + [
        (name, (lambda n=name: harness.QUERIES[n](spark, sf_dir)))
        for name in HEADLINE
    ]

    runs: dict[str, list[float]] = {name: [] for name, _ in battery}
    for _ in range(rounds):
        for name, build in battery:
            if name == "extract_pipeline":
                # settle GC debris before/after the big extraction so its
                # collection isn't billed to a neighbouring query
                spark.sparkContext._jvm.System.gc()
                time.sleep(1)
            t0 = time.monotonic()
            _noop(build())
            runs[name].append(round(time.monotonic() - t0, 3))

    times = {name: min(rs) for name, rs in runs.items()}
    extract_sec = times["extract_pipeline"]

    # Driver line budget (r4 VERDICT #2): the driver captures only the LAST
    # 2000 chars of stdout, and r4's line (per-rep all_runs + the full
    # scaling sub-document) outgrew it -> "parsed": null. Keep the printed
    # line to per-query bests + throughput + scaling-efficiency SUMMARY
    # (<= ~1,200 chars) and write the per-rep detail to BENCH/ side files.
    out = {
        "metric": "headline queries + interleaved-corpus extraction, total wall",
        "value": round(sum(times.values()), 3),
        "unit": "sec",
        "queries": times,
        "reps": rounds,
        "sf": sf,
        "extract_docs": n_docs,
        "extract_docs_per_sec": round(n_docs / extract_sec, 1),
        "cpus": cpus,
    }
    bench_dir = os.path.join(os.path.dirname(os.path.abspath(__file__)), "BENCH")
    scaling_path = os.path.join(bench_dir, "scaling.json")
    if os.path.exists(scaling_path):
        with open(scaling_path) as f:
            sc = json.load(f)
        eff = {}
        for fam, body in sc.items():
            if not isinstance(body, dict):
                continue
            for k, v in body.items():
                if "eff" in k:
                    eff[f"{fam}.{k}".replace("scaling_efficiency_", "eff_")] = v
        out["scaling_eff"] = eff
        out["scaling_target"] = sc.get("target", 0.8)
    detail = {"all_runs": runs, "queries_best": times, "sf": sf, "cpus": cpus,
              "reps": rounds, "extract_docs": n_docs}
    try:
        os.makedirs(bench_dir, exist_ok=True)
        with open(os.path.join(bench_dir, "bench_detail.json"), "w") as f:
            json.dump(detail, f, indent=1)
    except OSError:
        pass  # detail file is best-effort; the driver line is the contract
    spark.stop()
    line = json.dumps(out)
    if len(line) > 1700:  # hard guard: never outgrow the driver tail again
        out.pop("scaling_eff", None)
        line = json.dumps(out)
    print(line)
    return 0


if __name__ == "__main__":
    sys.exit(main())
