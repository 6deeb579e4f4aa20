"""Task-retry determinism: on a real cluster tasks die and are retried;
every operator output must be attempt-invariant. Local mode defaults to
zero retries (failures are fatal), so this test runs a fresh interpreter
with master ``local[4, 2]`` (2 task attempts), injects a one-time task
failure inside the extraction stage, and asserts the job completes with
output identical to an unfailed run. Complements test_resume (job-level
kill/restart) and samp_stratified's hash determinism (retried sampling
decisions can't flip)."""

import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

_SCRIPT = """
import os, sys, tempfile
sys.path.insert(0, %(repo)r)
from pyspark import TaskContext
from pyspark.sql import SparkSession

spark = (
    SparkSession.builder.master("local[4, 2]").appName("retry_test")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()
)
from ai_textbook_processor_spark.corpus import corpus_df
from ai_textbook_processor_spark.plans.pipeline import extract_documents

docs = corpus_df(spark, 24, seed=11)
marker = tempfile.mktemp(prefix="atps_retry_")

def fail_once(batches):
    ctx = TaskContext.get()
    for pdf in batches:
        if ctx.partitionId() == 0 and not os.path.exists(marker):
            with open(marker, "w") as f:
                f.write("died")
            raise RuntimeError("injected one-time task failure")
        yield pdf

def inv(df):
    return {
        r["doc_id"]: (
            tuple((s.kind, s.text, s.media_ref, s.offset) for s in r["spans"]),
            r["is_valid"],
        )
        for r in df.select("doc_id", "spans", "is_valid").collect()
    }

wrapped = docs.mapInPandas(fail_once, schema=docs.schema)
got = inv(extract_documents(wrapped))
assert os.path.exists(marker), "failure was never injected"
os.unlink(marker)
want = inv(extract_documents(docs))
assert got == want, "retried output diverged from unfailed run"
print("RETRY_OK", len(got))
"""


def test_injected_task_failure_retries_to_identical_output():
    r = subprocess.run(
        [sys.executable, "-c", _SCRIPT % {"repo": REPO}],
        capture_output=True,
        text=True,
        timeout=300,
        cwd=REPO,
    )
    assert r.returncode == 0, r.stderr[-3000:]
    assert "RETRY_OK 24" in r.stdout, (r.stdout, r.stderr[-1000:])
