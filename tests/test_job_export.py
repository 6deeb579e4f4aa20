"""job --clean-corpus --split --export-shards: the full corpus->shards
surface, driven exactly as a user would (own interpreter, own session)."""

from __future__ import annotations

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _run(out_dir: str) -> dict:
    proc = subprocess.run(
        [
            sys.executable, "-m", "ai_textbook_processor_spark.job",
            "--n-docs", "600", "--out", out_dir,
            "--master", "local[4]",
            "--clean-corpus", "--min-quality", "0.0",
            "--grade-lo", "-100", "--grade-hi", "100",
            "--split", "train=0.9,val=0.05,test=0.05",
            "--export-shards", "4",
        ],
        capture_output=True, text=True, timeout=420, cwd=REPO,
    )
    assert proc.returncode == 0, (proc.stdout[-2000:], proc.stderr[-2000:])
    return json.loads(proc.stdout.strip().splitlines()[-1])


def test_clean_corpus_split_export(tmp_path):
    out = str(tmp_path / "run1")
    payload = _run(out)
    splits = payload["splits"]
    assert set(splits) == {"train", "val", "test"}
    # every kept doc lands in exactly one split
    assert sum(s["n_docs"] for s in splits.values()) == payload["docs_kept"]
    # one file per shard, 4 shards per split, on disk
    for name, s in splits.items():
        assert s["n_shards"] == 4 and s["n_files"] == 4, (name, s)
        for k in range(4):
            d = os.path.join(out, "shards", name, f"shard={k}")
            files = [f for f in os.listdir(d) if f.endswith(".parquet")]
            assert len(files) == 1, (d, files)
    # 90/5/5 roughly honored
    assert splits["train"]["n_docs"] > 3 * (
        splits["val"]["n_docs"] + splits["test"]["n_docs"]
    )

    # deterministic: a second run from scratch produces the same summary
    payload2 = _run(str(tmp_path / "run2"))
    assert payload2["splits"] == splits
    assert payload2["funnel"] == payload["funnel"]


def test_resumable_clean_corpus_export_resumes(tmp_path):
    """Durable path: first run exports shards; a rerun of the same run_id
    no-ops extraction (buckets_processed=0) AND the export (marker)."""
    out = str(tmp_path / "durable")

    def run():
        proc = subprocess.run(
            [
                sys.executable, "-m", "ai_textbook_processor_spark.job",
                "--n-docs", "400", "--out", out,
                "--master", "local[4]",
                "--clean-corpus", "--resumable", "r5x",
                "--min-quality", "0.0",
                "--grade-lo", "-100", "--grade-hi", "100",
                "--split", "train=0.9,val=0.05,test=0.05",
                "--export-shards", "2",
            ],
            capture_output=True, text=True, timeout=420, cwd=REPO,
        )
        assert proc.returncode == 0, (proc.stdout[-2000:], proc.stderr[-2000:])
        return json.loads(proc.stdout.strip().splitlines()[-1])

    first = run()
    assert set(first["splits"]) == {"train", "val", "test"}
    assert all(not s["resumed"] for s in first["splits"].values())
    assert sum(s["n_docs"] for s in first["splits"].values()) == first[
        "funnel"
    ]["after_near_dedup"]

    second = run()
    assert second["buckets_processed"] == 0
    assert all(s["resumed"] for s in second["splits"].values())
    assert {k: v["n_docs"] for k, v in second["splits"].items()} == {
        k: v["n_docs"] for k, v in first["splits"].items()
    }
    assert second["funnel"] == first["funnel"]
