"""Two-parallelism scaling bench (the north rule's N vs 4N executors,
sandbox proxy: local[8] vs local[32] on the same input).

Runs the extraction job via spark-submit at both parallelism levels,
computes throughput scaling efficiency = (docs/sec@32 / docs/sec@8) / 4,
writes BENCH/scaling.json and refreshes the measured section of
BENCH/BASELINE.md.

Usage: python tools/bench_scaling.py [n_docs]
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def run_level(cores: int, n_docs: int) -> dict:
    out_dir = f"/tmp/bench_scaling_{cores}"
    env = dict(os.environ)
    cmd = [
        "spark-submit",
        "--master", f"local[{cores}]",
        os.path.join(REPO, "ai_textbook_processor_spark", "job.py"),
        "--n-docs", str(n_docs),
        "--mega-every", "4000",
        "--buckets", str(cores * 2),
        "--out", out_dir,
    ]
    env["SPARK_GRAFT_CPUS"] = str(cores)
    r = subprocess.run(
        cmd, cwd=REPO, env=env, capture_output=True, text=True, timeout=3600
    )
    line = [ln for ln in r.stdout.splitlines() if ln.startswith("{")][-1]
    return json.loads(line)


def main() -> int:
    n_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 48_000
    lo = run_level(8, n_docs)
    print("local[8]:", json.dumps(lo), flush=True)
    hi = run_level(32, n_docs)
    print("local[32]:", json.dumps(hi), flush=True)
    eff = (hi["docs_per_sec"] / lo["docs_per_sec"]) / 4.0
    result = {
        "n_docs": n_docs,
        "docs_per_sec_local8": lo["docs_per_sec"],
        "docs_per_sec_local32": hi["docs_per_sec"],
        "wall_sec_local8": lo["wall_sec"],
        "wall_sec_local32": hi["wall_sec"],
        "scaling_efficiency_8_to_32": round(eff, 3),
        "target": 0.8,
    }
    os.makedirs(os.path.join(REPO, "BENCH"), exist_ok=True)
    with open(os.path.join(REPO, "BENCH", "scaling.json"), "w") as f:
        json.dump(result, f, indent=2)
    print(json.dumps(result))
    return 0


if __name__ == "__main__":
    sys.exit(main())
