"""Same-session interleaved A/B for the r6 third-pass winners spread in
_stages_from_extracted (SPARK_GRAFT_SPREAD_WINNERS toggles it).

Pair-0 collects both variants and asserts row equality (the funnel is
order-insensitive integer counts — sorted compare).

Usage: python tools/ab_spread_winners.py [SF_DIR] [PAIRS]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from ai_textbook_processor_spark import harness  # noqa: E402
from ai_textbook_processor_spark.session import get_spark  # noqa: E402

QUERIES = ["tp1_clean_corpus_funnel", "tp2_full_pipeline"]


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    pairs = int(sys.argv[2]) if len(sys.argv) > 2 else 4
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = get_spark(app_name="ab_spread_winners", master=f"local[{cpus}]",
                      shuffle_partitions=cpus)

    def noop(df):
        df.write.format("noop").mode("overwrite").save()

    noop(harness.QUERIES["tp1_clean_corpus_funnel"](spark, sf_dir))  # warm

    results = {q: {"off": [], "on": [], "ckpt": []} for q in QUERIES}
    first_rows: dict[str, list] = {}
    for p in range(pairs):
        for q in QUERIES:
            for variant in ("off", "on", "ckpt"):
                os.environ["SPARK_GRAFT_SPREAD_WINNERS"] = (
                    {"off": "0", "on": "1", "ckpt": "ckpt"}[variant]
                )
                spark.sparkContext.setJobDescription(
                    f"ab_spread_winners:{q}:{variant}")
                t0 = time.monotonic()
                df = harness.QUERIES[q](spark, sf_dir)
                if p == 0:
                    rows = sorted(map(tuple, df.collect()))
                    prev = first_rows.setdefault(q, rows)
                    assert rows == prev, f"variant mismatch for {q}"
                else:
                    noop(df)
                results[q][variant].append(round(time.monotonic() - t0, 3))
    os.environ["SPARK_GRAFT_SPREAD_WINNERS"] = "ckpt"

    print(f"pairs={pairs} sf_dir={sf_dir}")
    for q in QUERIES:
        o, n, c = results[q]["off"], results[q]["on"], results[q]["ckpt"]
        w_on = sum(1 for a, b in zip(o, n) if b < a)
        w_ck = sum(1 for a, b in zip(o, c) if b < a)
        print(f"{q:24s} off={o}")
        print(f"{'':24s} on ={n}  wins {w_on}/{len(o)}")
        print(f"{'':24s} ckpt={c}  wins {w_ck}/{len(o)}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
