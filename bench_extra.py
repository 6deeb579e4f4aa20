"""Whole-registry isolation bench (r6, optimization-round evidence).

NOT the driver contract — bench.py is frozen for measurement. This file
times EVERY registry query with the guide §1.4 noop-sink method
(df.write.format("noop")) so per-operator costs can be ranked and cited
in OPTIMIZATION_r06.md. Interleaved rounds (r4 methodology: host phases
drift 25-40% intra-day, so each round sweeps the whole registry and each
query keeps its minimum across rounds).

Usage: python bench_extra.py [SF_DIR] [ROUNDS]
Writes BENCH/r06_queries_<sf>.json and prints the slowest 20.
"""

from __future__ import annotations

import json
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from ai_textbook_processor_spark import harness  # noqa: E402
from ai_textbook_processor_spark.session import get_spark  # noqa: E402


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    rounds = int(sys.argv[2]) if len(sys.argv) > 2 else 2
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    m = re.search(r"sf([0-9.]+)", sf_dir)
    sf = float(m.group(1)) if m else 0.1
    spark = get_spark(
        app_name="bench_extra", master=f"local[{cpus}]",
        shuffle_partitions=cpus,
    )

    def noop(df):
        df.write.format("noop").mode("overwrite").save()

    names = list(harness.QUERIES)
    times: dict[str, float] = {}
    errs: dict[str, str] = {}
    # warm the Python-worker import cost once
    noop(harness.QUERIES["q1_pricing_summary"](spark, sf_dir))
    for rnd in range(rounds):
        for name in names:
            if name in errs:
                continue
            spark.sparkContext.setJobDescription(f"bench_extra:{name}")
            try:
                t0 = time.monotonic()
                noop(harness.QUERIES[name](spark, sf_dir))
                dt = round(time.monotonic() - t0, 3)
            except Exception as e:  # keep sweeping; record the failure
                errs[name] = repr(e)[:200]
                continue
            if name not in times or dt < times[name]:
                times[name] = dt
    out = {
        "sf": sf, "cpus": cpus, "rounds": rounds,
        "total_best_sum": round(sum(times.values()), 2),
        "queries": dict(sorted(times.items(), key=lambda kv: -kv[1])),
        "errors": errs,
    }
    dst = os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "BENCH",
        f"r06_queries_sf{sf}.json",
    )
    with open(dst, "w") as f:
        json.dump(out, f, indent=1)
    for name, t in list(out["queries"].items())[:20]:
        print(f"{t:8.3f}  {name}")
    print(f"sum(best) = {out['total_best_sum']} s over {len(times)} queries"
          f" ({len(errs)} errors) -> {dst}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
