"""Interleaved same-session A/B of the fused-stage 1-batch lookahead
(SPARK_GRAFT_FUSED_LOOKAHEAD=1 vs 0) at the driver's sf=1.0 corpus size.
Usage: python tools/ab_lookahead.py [n_docs] [reps]
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from ai_textbook_processor_spark.corpus import corpus_df  # noqa: E402
from ai_textbook_processor_spark.functions.readability import CriteriaConfig  # noqa: E402
from ai_textbook_processor_spark.plans.pipeline import extract_documents  # noqa: E402
from ai_textbook_processor_spark.session import get_spark  # noqa: E402


def noop(df):
    df.write.format("noop").mode("overwrite").save()


def main():
    n_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 960_000
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 4
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = get_spark(app_name="ab_lookahead", master=f"local[{cpus}]",
                      shuffle_partitions=cpus)
    for _ in range(2):
        noop(extract_documents(
            corpus_df(spark, 32 * cpus, seed=1, num_partitions=cpus),
            CriteriaConfig()))
    docs = corpus_df(spark, n_docs, seed=42, mega_every=4000,
                     num_partitions=cpus * 2)
    res = {"on": [], "off": []}
    for rep in range(reps):
        for mode, env in (("off", "0"), ("on", "1")):
            os.environ["SPARK_GRAFT_FUSED_LOOKAHEAD"] = env
            spark.sparkContext.setJobDescription(
                f"fused lookahead={env} rep{rep}")
            t0 = time.monotonic()
            noop(extract_documents(docs, CriteriaConfig()))
            res[mode].append(round(time.monotonic() - t0, 2))
    os.environ.pop("SPARK_GRAFT_FUSED_LOOKAHEAD", None)
    print(json.dumps(res))
    print("best on", min(res["on"]), "best off", min(res["off"]),
          "med on", sorted(res["on"])[len(res["on"]) // 2],
          "med off", sorted(res["off"])[len(res["off"]) // 2])
    spark.stop()


if __name__ == "__main__":
    main()
