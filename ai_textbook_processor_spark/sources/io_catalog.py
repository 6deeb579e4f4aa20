"""Table catalog with Iceberg-style commit semantics (SURVEY.md §7).

The north rule targets Iceberg tables; this sandbox has no Iceberg runtime
jar, so the catalog exposes one table API with two backends:

* ``LocalTable`` — parquet files + a JSON manifest per commit. Commits are
  atomic (manifest written to a temp file then ``os.replace``-renamed) and
  **idempotent by commit id**: re-appending an already-committed id is a
  no-op, which is what makes write-then-log checkpoint-resume exactly-once
  (a crash between the data commit and the lineage append just re-runs the
  commit; the data dedupes on its id). Readers list manifests and read only
  manifest-referenced files — orphan part files from crashed writes are
  invisible.
* ``IcebergTable`` — thin wrapper over the native ``writeTo().append()`` /
  ``spark.read.table`` API, used when an Iceberg catalog is configured on
  the session (the production path; same call sites).

Reference analog: ChromaDB persistent collection add + read-back verify
(``utils/chroma_utility.py:9-32``); the manifest list is our snapshot log.
"""

from __future__ import annotations

import json
import os
import shutil
import uuid

from pyspark.sql import DataFrame, SparkSession


class LocalTable:
    def __init__(self, root: str, name: str):
        self.dir = os.path.join(root, name)
        self.data_dir = os.path.join(self.dir, "data")
        self.manifest_dir = os.path.join(self.dir, "_manifest")
        os.makedirs(self.data_dir, exist_ok=True)
        os.makedirs(self.manifest_dir, exist_ok=True)

    # -- commit log ---------------------------------------------------------

    def manifests(self) -> list[dict]:
        out = []
        for fn in sorted(os.listdir(self.manifest_dir)):
            if fn.endswith(".json"):
                with open(os.path.join(self.manifest_dir, fn)) as f:
                    out.append(json.load(f))
        return out

    def committed_ids(self) -> set[str]:
        return {m["commit_id"] for m in self.manifests()}

    def _manifest_path(self, commit_id: str) -> str:
        return os.path.join(self.manifest_dir, f"{commit_id}.json")

    # -- write --------------------------------------------------------------

    def _write_files(self, df: DataFrame, commit_id: str) -> list[str]:
        staging = os.path.join(self.dir, f"_staging-{uuid.uuid4().hex[:8]}")
        df.write.mode("overwrite").parquet(staging)
        files = []
        for fn in os.listdir(staging):
            if fn.endswith(".parquet"):
                dst = f"{commit_id}-{fn}"
                shutil.move(
                    os.path.join(staging, fn), os.path.join(self.data_dir, dst)
                )
                files.append(dst)
        shutil.rmtree(staging, ignore_errors=True)
        return files

    def _commit(self, commit_id: str, files: list[str],
                replaces: list[str] | None = None,
                meta: dict | None = None) -> str:
        manifest = {
            "commit_id": commit_id,
            # snapshot SEQUENCE (Iceberg's sequence-number analog): commit
            # ids are caller-chosen strings, so filename order is not
            # temporal order — the seq field is what time travel and
            # replaces-resolution sort by
            "seq": len(self.manifests()),
            "files": sorted(files),
            "replaces": sorted(replaces or []),
            "meta": meta or {},
        }
        tmp = self._manifest_path(commit_id) + ".tmp"
        with open(tmp, "w") as f:
            json.dump(manifest, f)
        os.replace(tmp, self._manifest_path(commit_id))  # the atomic commit
        return commit_id

    def append(self, df: DataFrame, commit_id: str | None = None,
               meta: dict | None = None) -> str:
        """Atomic, idempotent append. Returns the commit id."""
        commit_id = commit_id or uuid.uuid4().hex[:12]
        if os.path.exists(self._manifest_path(commit_id)):
            return commit_id  # already committed: exactly-once no-op
        files = self._write_files(df, commit_id)
        return self._commit(commit_id, files, meta=meta)

    def merge(self, source: DataFrame, key: str,
              commit_id: str | None = None, meta: dict | None = None) -> str:
        """Copy-on-write MERGE (upsert) by ``key`` — the Iceberg
        ``MERGE INTO`` shape: rows whose key appears in ``source`` are
        replaced, new keys are inserted, everything else is carried
        forward. One atomic snapshot: the merged state is written to new
        files and committed with a manifest that lists every prior commit
        in ``replaces``; readers never see a half-merged table because the
        manifest rename is the only visibility switch. Idempotent by
        commit id like :meth:`append` — a crashed-and-retried merge with
        the same id re-runs the write but commits once.

        At 100 TB the same plan runs as Iceberg copy-on-write MERGE (or
        merge-on-read with delete files); the anti-join is a shuffle on
        the slim key unless AQE broadcasts the source side. This is the
        re-crawl path: refreshed documents supersede stale rows by
        doc_id."""
        commit_id = commit_id or uuid.uuid4().hex[:12]
        if os.path.exists(self._manifest_path(commit_id)):
            return commit_id
        spark = source.sparkSession
        current = self.read(spark)
        replaces = sorted(self.committed_ids())
        merged = (
            current.join(source.select(key).distinct(), key, "left_anti")
            .unionByName(source)
            if current is not None
            else source
        )

        files = self._write_files(merged, commit_id)
        return self._commit(commit_id, files, replaces=replaces, meta=meta)

    def compact(self, spark: SparkSession, commit_id: str | None = None,
                target_partitions: int = 1, meta: dict | None = None) -> str:
        """Small-file compaction (Iceberg rewrite_data_files): rewrite the
        CURRENT snapshot's rows into ``target_partitions`` files and
        commit with every live commit in ``replaces`` — readers flip from
        many small files to the compacted set in one manifest rename,
        with byte-identical table contents (regression-tested). Streaming
        ingest and per-bucket-group checkpoint commits both produce
        file-per-commit layouts; at 100 TB compaction is the maintenance
        job that keeps scan task counts sane. Idempotent by commit id."""
        commit_id = commit_id or uuid.uuid4().hex[:12]
        if os.path.exists(self._manifest_path(commit_id)):
            return commit_id
        current = self.read(spark)
        if current is None:
            raise ValueError("cannot compact an empty table")
        replaces = sorted(self.committed_ids())
        files = self._write_files(current.coalesce(target_partitions), commit_id)
        return self._commit(commit_id, files, replaces=replaces, meta=meta)

    # -- read ---------------------------------------------------------------

    def _live_manifests(self, as_of: str | None = None) -> list[dict]:
        manifests = sorted(self.manifests(), key=lambda m: m.get("seq", 0))
        if as_of is not None:
            cut = next(
                (m.get("seq", 0) for m in manifests if m["commit_id"] == as_of),
                None,
            )
            if cut is None:
                raise ValueError(f"unknown commit id {as_of!r}")
            manifests = [m for m in manifests if m.get("seq", 0) <= cut]
        replaced = {cid for m in manifests for cid in m.get("replaces", ())}
        return [m for m in manifests if m["commit_id"] not in replaced]

    def read(self, spark: SparkSession,
             as_of: str | None = None) -> DataFrame | None:
        """Current snapshot, or TIME TRAVEL with ``as_of=commit_id``: the
        table exactly as it stood when that commit landed (manifests with
        a later sequence number — including later merges' replaces — are
        ignored). The Iceberg ``VERSION AS OF`` analog."""
        paths = [
            os.path.join(self.data_dir, fn)
            for m in self._live_manifests(as_of)
            for fn in m["files"]
        ]
        if not paths:
            return None
        return spark.read.parquet(*paths)


class IcebergTable:
    """Native path: same API over an Iceberg catalog table (requires the
    iceberg-spark-runtime jar on the session; not present in this sandbox —
    exercised only through the shared call sites)."""

    def __init__(self, spark: SparkSession, identifier: str):
        self.spark = spark
        self.identifier = identifier

    def append(self, df: DataFrame, commit_id: str | None = None,
               meta: dict | None = None) -> str:
        df.writeTo(self.identifier).append()
        snap = (
            self.spark.sql(
                f"SELECT snapshot_id FROM {self.identifier}.snapshots "
                "ORDER BY committed_at DESC LIMIT 1"
            ).collect()
        )
        return str(snap[0][0]) if snap else (commit_id or "")

    def merge(self, source: DataFrame, key: str,
              commit_id: str | None = None, meta: dict | None = None) -> str:
        """Native MERGE INTO (same semantics as LocalTable.merge: matched
        keys replaced whole-row, unmatched inserted). Requires the
        Iceberg runtime jar; exercised via the jar-gated integration
        test."""
        source.createOrReplaceTempView("_merge_src")
        self.spark.sql(
            f"MERGE INTO {self.identifier} t USING _merge_src s "
            f"ON t.{key} = s.{key} "
            "WHEN MATCHED THEN UPDATE SET * "
            "WHEN NOT MATCHED THEN INSERT *"
        )
        return commit_id or ""

    def compact(self, spark: SparkSession, commit_id: str | None = None,
                target_partitions: int = 1, meta: dict | None = None) -> str:
        """Native maintenance: Iceberg's rewrite_data_files procedure."""
        catalog, _, _ = self.identifier.partition(".")
        spark.sql(
            f"CALL {catalog}.system.rewrite_data_files(table => "
            f"'{self.identifier}')"
        )
        return commit_id or ""

    def read(self, spark: SparkSession,
             as_of: str | None = None) -> DataFrame:
        if as_of is not None:
            return spark.read.option("snapshot-id", as_of).table(
                self.identifier
            )
        return spark.read.table(self.identifier)


class Catalog:
    def __init__(self, root: str):
        self.root = root

    def table(self, name: str) -> LocalTable:
        return LocalTable(self.root, name)
