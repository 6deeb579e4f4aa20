"""Same-session interleaved A/B for the r6 third-pass qc change
(de-literalized, build-once GD iteration plan in logreg_fit).

OLD is the round-start-shape fit loop (literal weights, per-iteration
expression building), inlined verbatim below; NEW is the shipped
operators.classifier.logreg_fit.  Runs the three real qc harness
queries; pair-0 collects both variants and asserts row equality.

Usage: python tools/ab_qcfit.py [SF_DIR] [PAIRS]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from ai_textbook_processor_spark import harness  # noqa: E402
from ai_textbook_processor_spark.session import get_spark  # noqa: E402
import ai_textbook_processor_spark.operators.classifier as clf  # noqa: E402
from ai_textbook_processor_spark.operators.classifier import (  # noqa: E402
    GRAD_SCALE, _sdot_expr, _sigmoid,
)

QUERIES = ["qc_logreg_fit", "qc_logreg_score", "qc_logreg_eval"]

_new_fit = clf.logreg_fit


def _old_fit(feats, dim=64, iters=4, lr=2.0):
    n_parts = int(feats.sparkSession.conf.get("spark.sql.shuffle.partitions"))
    feats = feats.repartition(n_parts).localCheckpoint(eager=False)
    w = [0.0] * dim
    b = 0.0
    history: list[int] = []
    for _ in range(iters):
        q = F.lit(float(GRAD_SCALE))
        rowed = feats.select("y", "n", "feats", _sdot_expr(w).alias("sdot"))
        p = _sigmoid(F.lit(float(b)) + F.col("sdot") / F.col("n"))
        err = p - F.col("y")
        aggs = [
            F.sum(
                F.round(
                    (err * (F.element_at("feats", j + 1) / F.col("n"))) * q, 0
                ).cast("long")
            ).alias(f"g{j}")
            for j in range(dim)
        ]
        aggs.append(F.sum(F.round(err * q, 0).cast("long")).alias("gb"))
        aggs.append(F.count(F.lit(1)).alias("nd"))
        aggs.append(
            F.sum(((p >= 0.5) == (F.col("y") >= 0.5)).cast("long")).alias("ok")
        )
        row = rowed.agg(*aggs).collect()[0]
        nd = int(row["nd"])
        history.append(int(row["ok"]))
        w = [
            w[j] - lr * ((int(row[f"g{j}"]) / GRAD_SCALE) / nd)
            for j in range(dim)
        ]
        b = b - lr * ((int(row["gb"]) / GRAD_SCALE) / nd)
    return w, b, history


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    pairs = int(sys.argv[2]) if len(sys.argv) > 2 else 4
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = get_spark(app_name="ab_qcfit", master=f"local[{cpus}]",
                      shuffle_partitions=cpus)

    def noop(df):
        df.write.format("noop").mode("overwrite").save()

    noop(harness.QUERIES["qc_logreg_fit"](spark, sf_dir))  # warm

    results = {q: {"old": [], "new": []} for q in QUERIES}
    first_rows: dict[str, list] = {}
    for p in range(pairs):
        for q in QUERIES:
            for variant in ("old", "new"):
                clf.logreg_fit = _old_fit if variant == "old" else _new_fit
                spark.sparkContext.setJobDescription(f"ab_qcfit:{q}:{variant}")
                t0 = time.monotonic()
                df = harness.QUERIES[q](spark, sf_dir)
                if p == 0:
                    rows = df.collect()
                    prev = first_rows.setdefault(q, rows)
                    assert rows == prev, f"variant mismatch for {q}"
                else:
                    noop(df)
                results[q][variant].append(round(time.monotonic() - t0, 3))
    clf.logreg_fit = _new_fit

    print(f"pairs={pairs} sf_dir={sf_dir}")
    for q in QUERIES:
        o, n = results[q]["old"], results[q]["new"]
        wins = sum(1 for a, b in zip(o, n) if b < a)
        print(f"{q:16s} old={o} new={n} "
              f"min {min(o):.2f}->{min(n):.2f}  new wins {wins}/{len(o)} pairs")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
