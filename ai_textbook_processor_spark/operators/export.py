"""Deterministic shard export — the training-data writer stage.

Tokenized corpora ship as a fixed set of shard files with a manifest
(WebDataset/Megatron/LLM-foundry convention): shard membership must be a
pure function of the ROW, never of partition layout, so that (a) a re-run
or a task retry produces byte-identical shards, (b) two engines agree on
every shard's contents, and (c) downstream loaders can address any shard
without a global index.  ``DataFrame.randomSplit``/``repartition(n)``
give none of these — their assignment depends on partition ordering and
seed plumbing.

Shard id here is the repo's cross-engine md5-slice hash mod n_shards
(``sampling.sample_hash`` idiom), so the DuckDB oracle re-derives the
full manifest — per-shard row count, id checksum, id span — from scratch.

Scale shape: assignment is a scan-side Column; the write is one shuffle
keyed on (shard) via ``repartition(n_shards, shard)`` so each shard
lands as exactly one file per shard directory (`partitionBy` then sees
one task per shard).  At 100 TB you raise n_shards until shard size fits
the loader (the conventional 100-500 MB), which simultaneously bounds
task memory — there is no global sort and no driver-side list of rows.
The manifest aggregate carries n_shards rows.  The reference has no bulk
export at all (it returns documents one-by-one over HTTP —
/root/reference/routes/route.py).
"""

from __future__ import annotations

import os

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from .sampling import sample_hash


def shard_id(id_col: str | Column, n_shards: int) -> Column:
    """Deterministic shard assignment in [0, n_shards) — engine- and
    layout-independent (md5-slice of the id, mod n_shards)."""
    return (sample_hash(id_col) % n_shards).alias("shard")


def _manifest_aggs(id_col: str) -> list[Column]:
    """Manifest columns that work for ANY id type (the corpus generator's
    ids are strings like 'doc-0000000010-html', the testdata tables use
    bigints): the checksum sums the id's own 48-bit hash bucket instead
    of the id, and the span columns are lexicographic over the string
    form — identical semantics in DuckDB."""
    sid = F.col(id_col).cast("string")
    return [
        F.count("*").cast("long").alias("n_docs"),
        F.sum(sample_hash(id_col)).cast("long").alias("id_hash_sum"),
        F.min(sid).alias("min_id"),
        F.max(sid).alias("max_id"),
    ]


def shard_manifest(
    df: DataFrame, id_col: str = "doc_id", n_shards: int = 16
) -> DataFrame:
    """The export manifest: one row per shard with count + id-hash
    checksum + id span.  Pure aggregate — runs without writing anything,
    and is what the oracle pins (the write below must reproduce it
    exactly)."""
    return (
        df.select(shard_id(id_col, n_shards), F.col(id_col))
        .groupBy("shard")
        .agg(*_manifest_aggs(id_col))
    )


def export_shards(
    df: DataFrame,
    out_dir: str,
    id_col: str = "doc_id",
    n_shards: int = 16,
) -> list[dict]:
    """Write ``df`` as ``out_dir/shard=K/*.parquet`` with deterministic
    membership, one file per shard, and return the manifest (list of
    per-shard dicts, shard-ordered) after verifying it against a read-back
    of what actually landed — the A5-style write-then-verify contract.

    ``repartition(n_shards, shard)`` hash-partitions on the shard column
    so every shard's rows co-locate in one task; ``partitionBy`` then
    emits exactly one file per shard directory.
    """
    with_shard = df.withColumn("shard", shard_id(id_col, n_shards))
    (
        with_shard.repartition(n_shards, "shard")
        .write.mode("overwrite")
        .partitionBy("shard")
        .parquet(out_dir)
    )
    spark = df.sparkSession
    back = spark.read.parquet(out_dir).withColumn(
        "shard", F.col("shard").cast("int")
    )
    expect = {r["shard"]: r.asDict() for r in shard_manifest(df, id_col, n_shards).collect()}
    got = {
        r["shard"]: r.asDict()
        for r in back.groupBy("shard").agg(*_manifest_aggs(id_col)).collect()
    }
    if expect != got:
        raise RuntimeError(
            f"shard export verify failed: expected {expect} read back {got}"
        )
    manifest = [expect[k] for k in sorted(expect)]
    for row in manifest:
        part_dir = os.path.join(out_dir, f"shard={row['shard']}")
        files = [f for f in os.listdir(part_dir) if f.endswith(".parquet")]
        row["n_files"] = len(files)
    return manifest
