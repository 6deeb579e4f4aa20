"""Run ONE extraction level (taskset-pinned, spinner-clock-controlled) and
print its summary JSON — the building block bench_scaling.py composes.

Usage: python tools/bench_onelevel.py CORES [--input PATH | --n-docs N]
           [--env KEY=VAL ...] [--jvms J] [--sink noop]

With --jvms J > 1, launches J concurrent spark-submit processes each
pinned to a disjoint CORES/J-cpu slice working a disjoint doc slice —
the faithful emulation of J separate executor JVMs (a real cluster never
runs one 32-thread local JVM; it runs many small executors).
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time
import zipfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
N_HOST_CPUS = os.cpu_count() or 32
_PYFILES_ZIP = "/tmp/atps_bench.zip"


def _build_pyfiles() -> str:
    """Package the engine for --py-files (the north rule's launch shape)."""
    pkg = os.path.join(REPO, "ai_textbook_processor_spark")
    with zipfile.ZipFile(_PYFILES_ZIP, "w") as z:
        for root, _dirs, files in os.walk(pkg):
            if "__pycache__" in root:
                continue
            for f in files:
                if f.endswith(".py"):
                    p = os.path.join(root, f)
                    z.write(p, os.path.relpath(p, REPO))
    return _PYFILES_ZIP

_SPIN = "while True:\n    x = 0\n    for i in range(10**6): x += i\n"


def _launch(cpu_lo: int, cpu_hi: int, jobargs: list[str], env: dict) -> subprocess.Popen:
    cmd = ["taskset", "-c", f"{cpu_lo}-{cpu_hi}", "spark-submit",
           "--master", f"local[{cpu_hi - cpu_lo + 1}]",
           "--py-files", _PYFILES_ZIP]
    # driver JVM memory/options must be on the submit line (client mode:
    # the JVM is already up before any SparkSession.builder config applies)
    drv_mem = env.get("SPARK_GRAFT_DRIVER_MEM")
    if drv_mem:
        cmd += ["--driver-memory", drv_mem]
    java_opts = env.get("SPARK_GRAFT_DRIVER_JAVA_OPTS")
    if java_opts:
        cmd += ["--driver-java-options", java_opts]
    cmd += [os.path.join(REPO, "ai_textbook_processor_spark", "job.py")] + jobargs
    return subprocess.Popen(
        cmd, cwd=REPO, env=env, stdout=subprocess.PIPE,
        stderr=subprocess.DEVNULL, text=True,
    )


def run_level(
    cores: int,
    jvms: int = 1,
    input_path: str | None = None,
    n_docs: int = 96_000,
    env_overrides: dict | None = None,
    mega_every: int = 4000,
    sink: str = "parquet",
) -> dict:
    """Pin the Spark tree(s) to `cores` CPUs, spin the rest (same all-core
    clock at every level), run jvms concurrent executor JVMs, return the
    combined summary. Multi-JVM inputs read `{input}/slice={j}`."""
    _build_pyfiles()
    env = dict(os.environ)
    per_jvm_cores = cores // jvms
    env["SPARK_GRAFT_CPUS"] = str(per_jvm_cores)
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    if jvms > 1:
        env.setdefault("SPARK_GRAFT_DRIVER_MEM", "6g")
    env.update(env_overrides or {})

    spinners = [
        subprocess.Popen(
            ["taskset", "-c", str(cpu), sys.executable, "-c", _SPIN],
            stdout=subprocess.DEVNULL, stderr=subprocess.DEVNULL,
        )
        for cpu in range(cores, N_HOST_CPUS)
    ]
    try:
        procs = []
        t0 = time.monotonic()
        for j in range(jvms):
            jobargs = ["--out", f"/tmp/bench_one_{cores}_{j}",
                       "--buckets", str(per_jvm_cores * 2), "--warmup",
                       "--sink", sink]
            if input_path:
                sub = f"{input_path}/slice={j}" if jvms > 1 else input_path
                jobargs += ["--input", sub]
            else:
                n = n_docs // jvms
                jobargs += ["--n-docs", str(n), "--doc-offset", str(j * n),
                            "--mega-every", str(mega_every)]
            procs.append(
                _launch(j * per_jvm_cores, (j + 1) * per_jvm_cores - 1, jobargs, env)
            )
        summaries = []
        for p in procs:
            out, _ = p.communicate(timeout=3600)
            lines = [ln for ln in out.splitlines() if ln.startswith("{")]
            summaries.append(json.loads(lines[-1]))
        wall_outer = time.monotonic() - t0
    finally:
        for p in spinners:
            p.kill()
        for p in spinners:
            p.wait()

    total_docs = sum(s["docs_total"] for s in summaries)
    # per-JVM walls exclude each JVM's startup/warmup; for multi-JVM the
    # honest combined figure is total docs / max(inner wall) — all JVMs
    # run concurrently and a cluster is paced by its slowest executor
    wall = max(s["wall_sec"] for s in summaries)
    return {
        "cores": cores,
        "jvms": jvms,
        "docs_total": total_docs,
        "wall_sec": wall,
        "wall_outer_sec": round(wall_outer, 3),
        "docs_per_sec": round(total_docs / wall, 3),
        "per_jvm": summaries,
    }


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("cores", type=int)
    ap.add_argument("--input")
    ap.add_argument("--n-docs", type=int, default=96_000)
    ap.add_argument("--jvms", type=int, default=1)
    ap.add_argument("--env", action="append", default=[])
    ap.add_argument("--mega-every", type=int, default=4000)
    ap.add_argument("--sink", default="parquet")
    args = ap.parse_args()
    overrides = dict(kv.split("=", 1) for kv in args.env)
    print(json.dumps(run_level(
        args.cores, jvms=args.jvms, input_path=args.input, n_docs=args.n_docs,
        env_overrides=overrides, mega_every=args.mega_every, sink=args.sink,
    )))
    return 0


if __name__ == "__main__":
    sys.exit(main())
