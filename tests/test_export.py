"""Shard export (operators/export.py): deterministic membership, one
file per shard, write-then-verify, layout independence."""

from __future__ import annotations

import os
import tempfile

import pytest
from pyspark.sql import functions as F

from ai_textbook_processor_spark.operators.export import (
    export_shards,
    shard_id,
    shard_manifest,
)

N = 400
SHARDS = 8


@pytest.fixture(scope="module")
def docs(spark):
    return spark.range(N).select(
        F.col("id").alias("doc_id"),
        F.concat(F.lit("text-"), F.col("id")).alias("text"),
    )


def _py_hash(i) -> int:
    """Python twin of sampling.sample_hash for the checksum assertion."""
    import hashlib

    return int(hashlib.md5(str(i).encode()).hexdigest()[:12], 16) % 10_000


def test_export_writes_one_file_per_shard_and_verifies(docs):
    with tempfile.TemporaryDirectory() as out:
        manifest = export_shards(docs, out, n_shards=SHARDS)
        assert [m["shard"] for m in manifest] == list(range(SHARDS))
        assert sum(m["n_docs"] for m in manifest) == N
        assert sum(m["id_hash_sum"] for m in manifest) == sum(
            _py_hash(i) for i in range(N)
        )
        for m in manifest:
            assert m["n_files"] == 1, m
        # full row fidelity through the written files
        back = docs.sparkSession.read.parquet(out)
        assert sorted(r["doc_id"] for r in back.collect()) == list(range(N))


def test_export_string_ids(spark):
    """The corpus generator's ids are strings — the manifest must not
    assume numeric ids (regression: sum(doc_id) cast-crashed on
    'doc-0000000010-high_grade')."""
    docs = spark.range(50).select(
        F.concat(F.lit("doc-"), F.col("id")).alias("doc_id")
    )
    with tempfile.TemporaryDirectory() as out:
        manifest = export_shards(docs, out, id_col="doc_id", n_shards=4)
        assert sum(m["n_docs"] for m in manifest) == 50
        assert all(m["min_id"].startswith("doc-") for m in manifest)


def test_membership_is_layout_independent(docs):
    """The same row lands in the same shard regardless of partitioning —
    the property randomSplit/repartition(n) do NOT have."""
    base = docs.select("doc_id", shard_id("doc_id", SHARDS))
    weird = docs.repartition(13, "text").select(
        "doc_id", shard_id("doc_id", SHARDS)
    )
    assert sorted(map(tuple, base.collect())) == sorted(
        map(tuple, weird.collect())
    )


def test_rerun_produces_identical_manifest(docs):
    a = sorted(map(tuple, shard_manifest(docs, n_shards=SHARDS).collect()))
    b = sorted(map(tuple, shard_manifest(docs, n_shards=SHARDS).collect()))
    assert a == b


def test_verify_catches_tampering(docs, spark):
    with tempfile.TemporaryDirectory() as out:
        export_shards(docs, out, n_shards=SHARDS)
        # drop one shard's file behind the verifier's back, then re-verify
        part = os.path.join(out, "shard=3")
        for f in os.listdir(part):
            os.unlink(os.path.join(part, f))
        os.rmdir(part)
        back = spark.read.parquet(out)
        assert back.count() < N  # the read-back really is short
