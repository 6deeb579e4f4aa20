"""Same-session interleaved A/B for the r6 third-pass PQ changes
(dim threading + lazy sv checkpoint + hoisted expression building).

OLD is the round-start implementation of pq_train / pq_encode, inlined
verbatim below (from git HEAD before this pass); NEW is the shipped
code.  Both run the real harness queries; pair-0 collects both variants
and asserts row equality.

Usage: python tools/ab_pq3.py [SF_DIR] [PAIRS]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from ai_textbook_processor_spark import harness  # noqa: E402
from ai_textbook_processor_spark.session import get_spark  # noqa: E402
import ai_textbook_processor_spark.operators.similarity as sim  # noqa: E402
from ai_textbook_processor_spark.operators.similarity import (  # noqa: E402
    _pq_subvectors, dist2,
)

QUERIES = ["sim_pq_topk", "sim_pq_recall", "sim_ivfpq_topk", "sim_ivfpq_sweep"]

_new_train, _new_encode = sim.pq_train, sim.pq_encode


def _old_train(df, m=4, k_sub=8, iters=3, id_col="vec_id",
               vec_col="embedding", dim=None):
    spark = df.sparkSession
    if dim is None:
        dim = len(df.select(vec_col).first()[0])
    if dim % m:
        raise ValueError(f"dim {dim} not divisible by m={m}")
    d = dim // m
    sv = _pq_subvectors(df, m, d, id_col, vec_col).localCheckpoint()
    seed_rows = (
        df.orderBy(id_col).limit(k_sub)
        .select(F.col(vec_col).cast("array<double>").alias("v"))
        .collect()
    )
    prev = {
        (j, i): [float(x) for x in r["v"][j * d: (j + 1) * d]]
        for j in range(m)
        for i, r in enumerate(seed_rows)
    }
    for _ in range(iters):
        cents = spark.createDataFrame(
            [(s, c, v) for (s, c), v in sorted(prev.items())],
            "sub int, cid long, cemb array<double>",
        )
        dist = dist2(F.col("v"), F.col("cemb"))
        key = F.struct(F.col("simc").alias("s"), (-F.col("cid")).alias("c"))
        assigned = (
            sv.join(F.broadcast(cents), "sub")
            .withColumn("simc", -dist)
            .groupBy(id_col, "sub")
            .agg(F.max_by(F.struct("v", "cid"), key).alias("_b"))
            .select("sub", F.col("_b.cid").alias("cid"),
                    F.col("_b.v").alias("v"))
        )
        rows = (
            assigned.select(
                "sub", "cid", F.posexplode(F.col("v")).alias("pos0", "x")
            )
            .groupBy("sub", "cid", (F.col("pos0") + 1).alias("pos"))
            .agg(F.round(F.avg("x"), 5).alias("c_mean"))
            .collect()
        )
        by_cell: dict = {}
        for r in rows:
            by_cell.setdefault((int(r["sub"]), int(r["cid"])), {})[
                r["pos"]
            ] = r["c_mean"]
        nxt = {
            cell: [float(means[p]) for p in sorted(means)]
            for cell, means in by_cell.items()
        }
        for cell, cemb in prev.items():
            nxt.setdefault(cell, cemb)
        prev = nxt
    return spark.createDataFrame(
        [(s, c, v) for (s, c), v in sorted(prev.items())],
        "sub int, cid long, cemb array<double>",
    )


def _old_encode(df, codebook, m=4, id_col="vec_id", vec_col="embedding",
                dim=None):
    if dim is None:
        dim = len(df.select(vec_col).first()[0])
    d = dim // m
    sv = _pq_subvectors(df, m, d, id_col, vec_col)
    dist = dist2(F.col("v"), F.col("cemb"))
    key = F.struct((-F.col("_d")).alias("nd"), (-F.col("cid")).alias("nc"))
    assigned = (
        sv.join(F.broadcast(codebook), "sub")
        .withColumn("_d", dist)
        .groupBy(id_col, "sub")
        .agg(F.max_by("cid", key).alias("code"))
    )
    packed = assigned.groupBy(id_col).agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct("sub", "code"))),
            lambda x: x["code"],
        ).alias("codes")
    )
    return packed


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    pairs = int(sys.argv[2]) if len(sys.argv) > 2 else 4
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = get_spark(app_name="ab_pq3", master=f"local[{cpus}]",
                      shuffle_partitions=cpus)

    def noop(df):
        df.write.format("noop").mode("overwrite").save()

    noop(harness.QUERIES["sim_pq_topk"](spark, sf_dir))  # warm

    results = {q: {"old": [], "new": []} for q in QUERIES}
    first_rows: dict[str, list] = {}
    for p in range(pairs):
        for q in QUERIES:
            for variant in ("old", "new"):
                sim.pq_train = _old_train if variant == "old" else _new_train
                sim.pq_encode = _old_encode if variant == "old" else _new_encode
                spark.sparkContext.setJobDescription(f"ab_pq3:{q}:{variant}")
                t0 = time.monotonic()
                df = harness.QUERIES[q](spark, sf_dir)
                if p == 0:
                    rows = df.collect()
                    prev = first_rows.setdefault(q, rows)
                    assert rows == prev, f"variant mismatch for {q}"
                else:
                    noop(df)
                results[q][variant].append(round(time.monotonic() - t0, 3))
    sim.pq_train, sim.pq_encode = _new_train, _new_encode

    print(f"pairs={pairs} sf_dir={sf_dir}")
    for q in QUERIES:
        o, n = results[q]["old"], results[q]["new"]
        wins = sum(1 for a, b in zip(o, n) if b < a)
        print(f"{q:18s} old={o} new={n} "
              f"min {min(o):.2f}->{min(n):.2f}  new wins {wins}/{len(o)} pairs")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
