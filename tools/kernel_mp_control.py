"""Spark-free scaling control: the REAL extraction kernel under plain
multiprocessing at N vs 4N processes, clock-controlled like
bench_scaling.py (taskset pinning + spinners on idle CPUs).

Separates three candidate ceilings for the 8->32 gap:
  * single-JVM Spark overhead  -> mp control scales, Spark doesn't
  * host memory bandwidth      -> mp control degrades the same way
  * CPU frequency scaling      -> excluded by the spinner-load protocol

Usage: python tools/kernel_mp_control.py [docs_per_proc]
"""

from __future__ import annotations

import json
import multiprocessing as mp
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

N_HOST_CPUS = os.cpu_count() or 32
_SPIN = "while True:\n    x = 0\n    for i in range(10**6): x += i\n"


def worker(args):
    cpu, start, n = args
    os.sched_setaffinity(0, {cpu})
    from ai_textbook_processor_spark.corpus import gen_doc
    from ai_textbook_processor_spark.functions.kernels import extract_document

    docs = [gen_doc(i, 42)["spans"] for i in range(start, start + n)]
    t0 = time.monotonic()
    total_spans = 0
    for spans in docs:
        total_spans += len(extract_document(spans))
    return n, time.monotonic() - t0, total_spans


def run_level(procs: int, docs_per_proc: int) -> dict:
    spinners = [
        subprocess.Popen(
            ["taskset", "-c", str(cpu), sys.executable, "-c", _SPIN],
            stdout=subprocess.DEVNULL, stderr=subprocess.DEVNULL,
        )
        for cpu in range(procs, N_HOST_CPUS)
    ]
    try:
        with mp.Pool(procs) as pool:
            jobs = [(p, p * docs_per_proc, docs_per_proc) for p in range(procs)]
            t0 = time.monotonic()
            res = pool.map(worker, jobs)
            wall = time.monotonic() - t0
    finally:
        for p in spinners:
            p.kill()
        for p in spinners:
            p.wait()
    docs = sum(r[0] for r in res)
    return {"procs": procs, "docs": docs, "wall_sec": round(wall, 3),
            "docs_per_sec": round(docs / wall, 1)}


def main() -> int:
    docs_per_proc = int(sys.argv[1]) if len(sys.argv) > 1 else 3000
    out = {}
    for procs in (8, 32):
        out[procs] = run_level(procs, docs_per_proc)
        print(json.dumps(out[procs]), flush=True)
    eff = (out[32]["docs_per_sec"] / out[8]["docs_per_sec"]) / 4.0
    print(json.dumps({"kernel_mp_eff_8_to_32": round(eff, 3)}))
    return 0


if __name__ == "__main__":
    sys.exit(main())
