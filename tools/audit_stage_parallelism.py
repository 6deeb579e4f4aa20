"""Per-stage task-parallelism audit (r6 third pass).

Runs every registry query twice (cold warm-up, then a measured warm run)
and flags warm stages whose executorRunTime is large but which ran with
<=2 tasks — serialized per-row work behind an AQE-coalesced exchange or a
single-row-group scan (the txt_quality / qc / semdedup class of problem,
guide §2: parallelism that silently collapses to one task).

Stage attribution is snapshot-based (stages completed between the two
runs), so run it alone, not concurrently with other Spark work.

Usage: python tools/audit_stage_parallelism.py [SF_DIR] [MIN_MS] [ONLY,..]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from ai_textbook_processor_spark import harness  # noqa: E402
from ai_textbook_processor_spark.session import get_spark  # noqa: E402


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    min_ms = int(sys.argv[2]) if len(sys.argv) > 2 else 400
    names = (
        sys.argv[3].split(",") if len(sys.argv) > 3 else list(harness.QUERIES)
    )
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = get_spark(app_name="audit_stage_parallelism",
                      master=f"local[{cpus}]", shuffle_partitions=cpus)
    store = spark._jsparkSession.sparkContext().statusStore()
    jvm = spark._jvm

    def stages_snapshot():
        out = {}
        empty = jvm.java.util.ArrayList()
        quant = spark._sc._gateway.new_array(jvm.double, 0)
        it = store.stageList(empty, False, False, quant, empty).iterator()
        while it.hasNext():
            s = it.next()
            out[(int(s.stageId()), int(s.attemptId()))] = (
                int(s.numCompleteTasks()), int(s.executorRunTime()),
            )
        return out

    def noop(df):
        df.write.format("noop").mode("overwrite").save()

    flagged_total = 0
    for name in names:
        try:
            noop(harness.QUERIES[name](spark, sf_dir))  # cold warm-up
        except Exception as e:
            print(f"{name:28s} ERR {repr(e)[:70]}")
            continue
        time.sleep(1)
        before = set(stages_snapshot())
        t0 = time.monotonic()
        noop(harness.QUERIES[name](spark, sf_dir))
        dt = time.monotonic() - t0
        time.sleep(1)
        new = {
            k: v for k, v in stages_snapshot().items() if k not in before
        }
        flags = [
            (k[0], v) for k, v in new.items()
            if v[1] >= min_ms and v[0] <= 2
        ]
        line = f"{name:28s} {dt:6.2f}s warm, {len(new):3d} stages"
        if flags:
            flagged_total += len(flags)
            detail = "; ".join(
                f"stage {sid}: {nt} task(s) {rt/1000:.2f}s"
                for sid, (nt, rt) in sorted(flags, key=lambda x: -x[1][1])
            )
            line += f"  FLAG [{detail}]"
        print(line)
    print(f"flagged stages >= {min_ms} ms with <=2 tasks: {flagged_total}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
