"""Manifest-snapshot lakehouse table (the Iceberg stand-in).

No Iceberg/Delta runtime jar ships in this sandbox, so the engine's sink is
this thin storage layer providing the same contract the north rule needs from
Iceberg:

- **bucketed layout**: data files are hash-bucketed on the upsert key
  (``bucket = pmod(xxhash64(repo, path), B)``) so a MERGE touches (reads and
  rewrites) only the buckets its change-set hashes into — the analog of
  Iceberg's ``bucket(B, ...)`` partition transform and of the reference's
  per-interval task decomposition (/root/reference/multiversxetl/
  tasks_dashboard.py:35-46);
- **atomic snapshot commits**: each commit writes an immutable manifest JSON
  (file list + row counts + schema + stream epoch markers) and atomically
  repoints a ``_current`` pointer via ``os.replace`` — crash-safe: a crash
  mid-commit leaves the previous snapshot current;
- **exactly-once epoch markers**: the set of applied ``(stream_id, epoch_id)``
  pairs lives *inside* the manifest, so data + marker commit in one atomic
  step (strictly stronger than the reference's worker_state.json checkpoint,
  /root/reference/multiversxetl/worker_state.py:29-37, which is committed
  separately after verification);
- **time travel / rollback**: old manifests are retained;
  ``rollback(version)`` repoints ``_current`` (the analog of the reference's
  rewind-to-checkpoint DELETE, /root/reference/multiversxetl/bq_client.py:
  48-56, but O(1) instead of a scan-and-delete);
- **schema evolution**: the manifest carries the current schema; readers apply
  it over older files (missing columns → NULL), so adding/dropping columns is
  a metadata operation (the reference pushes schema updates out-of-band via
  ``bq update``, /root/reference/maintenance/schemas.md:13-28).

On a real cluster this module is replaced by Iceberg v2 merge-on-read tables;
every public method has a direct Iceberg equivalent (noted per method).
"""

from __future__ import annotations

import json
import os
import time
import uuid
from dataclasses import dataclass, field
from typing import Any

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql.types import StructType

_MANIFEST_DIR = "_manifests"
_CURRENT = "_current"


def bucket_expr(key_columns: list[str], num_buckets: int) -> Column:
    """Hash-bucket assignment — pure function of the upsert key.

    Bucketing on the full ``(repo, path)`` key (not just ``repo``) keeps the
    physical distribution uniform even when one monorepo dominates the key
    population (FIXTURES.md Zipf skew): a monorepo's files spread across all
    buckets instead of hot-spotting one. Iceberg analog:
    ``PARTITIONED BY (bucket(B, repo, path))``.
    """
    return F.pmod(F.xxhash64(*key_columns), F.lit(num_buckets)).cast("int")


@dataclass
class Manifest:
    """One immutable snapshot of the table."""

    version: int
    schema_json: str
    num_buckets: int
    key_columns: list[str]
    files: list[dict[str, Any]] = field(default_factory=list)  # {path, bucket, rows}
    streams: dict[str, dict[str, Any]] = field(default_factory=dict)
    parent: int | None = None
    operation: str = "create"
    committed_at: float = 0.0
    properties: dict[str, Any] = field(default_factory=dict)

    @property
    def schema(self) -> StructType:
        return StructType.fromJson(json.loads(self.schema_json))

    def files_for_buckets(self, buckets: set[int] | None) -> list[dict[str, Any]]:
        if buckets is None:
            return list(self.files)
        return [f for f in self.files if f["bucket"] in buckets]

    def epoch_info(self, stream_id: str, epoch_id: int) -> dict[str, Any] | None:
        return self.streams.get(stream_id, {}).get("epochs", {}).get(str(epoch_id))

    def to_json(self) -> str:
        return json.dumps(
            {
                "version": self.version,
                "schema_json": self.schema_json,
                "num_buckets": self.num_buckets,
                "key_columns": self.key_columns,
                "files": self.files,
                "streams": self.streams,
                "parent": self.parent,
                "operation": self.operation,
                "committed_at": self.committed_at,
                "properties": self.properties,
            }
        )

    @staticmethod
    def from_json(text: str) -> "Manifest":
        return Manifest(**json.loads(text))


class LakeTable:
    """A bucketed, snapshot-versioned table rooted at a directory."""

    def __init__(self, spark: SparkSession, root: str):
        self.spark = spark
        self.root = root

    # ---------- lifecycle ----------

    @classmethod
    def create(
        cls,
        spark: SparkSession,
        root: str,
        schema: StructType,
        key_columns: list[str],
        num_buckets: int = 16,
    ) -> "LakeTable":
        """Iceberg analog: CREATE TABLE ... PARTITIONED BY (bucket(B, key))."""
        os.makedirs(os.path.join(root, _MANIFEST_DIR), exist_ok=True)
        table = cls(spark, root)
        manifest = Manifest(
            version=0,
            schema_json=json.dumps(schema.jsonValue()),
            num_buckets=num_buckets,
            key_columns=list(key_columns),
            committed_at=time.time(),
        )
        table._write_manifest(manifest)
        return table

    @classmethod
    def exists(cls, root: str) -> bool:
        return os.path.exists(os.path.join(root, _MANIFEST_DIR, _CURRENT))

    # ---------- manifest I/O ----------

    def _manifest_path(self, version: int) -> str:
        return os.path.join(self.root, _MANIFEST_DIR, f"v{version:08d}.json")

    def current_version(self) -> int:
        with open(os.path.join(self.root, _MANIFEST_DIR, _CURRENT)) as fh:
            return int(fh.read().strip())

    def snapshot(self, version: int | None = None) -> Manifest:
        if version is None:
            version = self.current_version()
        with open(self._manifest_path(version)) as fh:
            return Manifest.from_json(fh.read())

    def _write_manifest(self, manifest: Manifest) -> None:
        """Two-step atomic commit: exclusive manifest create, then atomic
        pointer swap. A crash between the steps leaves the old snapshot
        current and the orphan manifest harmless (Iceberg behaves the same
        with its metadata.json swap)."""
        path = self._manifest_path(manifest.version)
        fd = os.open(path, os.O_CREAT | os.O_EXCL | os.O_WRONLY)
        with os.fdopen(fd, "w") as fh:
            fh.write(manifest.to_json())
        tmp = os.path.join(self.root, _MANIFEST_DIR, f".current.{uuid.uuid4().hex}")
        with open(tmp, "w") as fh:
            fh.write(str(manifest.version))
        os.replace(tmp, os.path.join(self.root, _MANIFEST_DIR, _CURRENT))

    # ---------- read ----------

    def read(
        self,
        version: int | None = None,
        buckets: set[int] | None = None,
        include_tombstones: bool = False,
    ) -> DataFrame:
        """Read a snapshot (optionally bucket-pruned / time-travelled).

        The manifest schema is applied over every file, so files written
        before a column was added read as NULL (schema evolution).
        Iceberg analog: ``spark.read.option("snapshot-id", ...).table(t)``.
        """
        m = self.snapshot(version)
        files = m.files_for_buckets(buckets)
        schema = m.schema
        if not files:
            df = self.spark.createDataFrame([], schema)
        else:
            df = self.spark.read.schema(schema).parquet(*[
                os.path.join(self.root, f["path"]) for f in files
            ])
        if not include_tombstones and "deleted" in df.columns:
            df = df.where(~F.col("deleted"))
        return df

    def bucket_of(self) -> Column:
        m = self.snapshot()
        return bucket_expr(m.key_columns, m.num_buckets)

    def is_epoch_committed(self, stream_id: str, epoch_id: int) -> bool:
        m = self.snapshot()
        return m.epoch_info(stream_id, epoch_id) is not None

    def last_committed_epoch(self, stream_id: str) -> int | None:
        m = self.snapshot()
        s = m.streams.get(stream_id)
        return None if s is None else s.get("last_epoch")

    # ---------- write ----------

    def write_data_files(
        self, df: DataFrame, commit_tag: str, bucket_aligned: bool = False
    ) -> list[dict[str, Any]]:
        """Write ``df`` (which must carry a ``_bucket`` column) under
        ``data/<commit_tag>/_bucket=k/...`` and return manifest file entries.

        Unless ``bucket_aligned`` (caller already co-partitioned rows by
        ``_bucket``, e.g. the merge aggregate), ``repartition(_bucket)``
        first so each task holds whole buckets — file count stays O(touched
        buckets), not O(tasks × buckets).
        """
        out_dir = os.path.join(self.root, "data", commit_tag)
        if not bucket_aligned:
            df = df.repartition(F.col("_bucket"))
        df.write.mode("overwrite").partitionBy("_bucket").parquet(out_dir)
        entries: list[dict[str, Any]] = []
        for bucket_dir in sorted(os.listdir(out_dir)):
            if not bucket_dir.startswith("_bucket="):
                continue
            bucket = int(bucket_dir.split("=", 1)[1])
            for fname in sorted(os.listdir(os.path.join(out_dir, bucket_dir))):
                if fname.endswith(".parquet"):
                    entries.append(
                        {
                            "path": os.path.join("data", commit_tag, bucket_dir, fname),
                            "bucket": bucket,
                            "rows": None,
                        }
                    )
        return entries

    def commit(
        self,
        new_files: list[dict[str, Any]],
        replaced_buckets: set[int],
        operation: str,
        stream_id: str | None = None,
        epoch_id: int | None = None,
        epoch_info: dict[str, Any] | None = None,
        schema: StructType | None = None,
        expected_parent: int | None = None,
    ) -> Manifest:
        """Commit a copy-on-write replacement of ``replaced_buckets``.

        Data files + epoch marker + schema change land in ONE atomic snapshot
        (Iceberg analog: MERGE commit + snapshot summary properties).
        ``expected_parent`` gives optimistic concurrency: the commit fails if
        another writer advanced the table meanwhile.
        """
        parent = self.snapshot()
        if expected_parent is not None and parent.version != expected_parent:
            raise RuntimeError(
                f"concurrent commit: expected parent {expected_parent}, "
                f"found {parent.version}"
            )
        kept = [f for f in parent.files if f["bucket"] not in replaced_buckets]
        streams = json.loads(json.dumps(parent.streams))  # deep copy
        if stream_id is not None and epoch_id is not None:
            entry = streams.setdefault(stream_id, {"epochs": {}, "last_epoch": None})
            entry["epochs"][str(epoch_id)] = epoch_info or {}
            last = entry.get("last_epoch")
            entry["last_epoch"] = epoch_id if last is None else max(last, epoch_id)
        manifest = Manifest(
            version=parent.version + 1,
            schema_json=json.dumps(schema.jsonValue()) if schema else parent.schema_json,
            num_buckets=parent.num_buckets,
            key_columns=parent.key_columns,
            files=kept + new_files,
            streams=streams,
            parent=parent.version,
            operation=operation,
            committed_at=time.time(),
        )
        self._write_manifest(manifest)
        return manifest

    def rollback(self, version: int) -> None:
        """Repoint ``_current`` at an older snapshot (O(1) rewind — the
        reference's analog is a DELETE-above-checkpoint scan,
        /root/reference/multiversxetl/app_controller.py:195-220)."""
        target = self.snapshot(version)  # validates existence
        cur = self.snapshot()
        manifest = Manifest(
            version=cur.version + 1,
            schema_json=target.schema_json,
            num_buckets=target.num_buckets,
            key_columns=target.key_columns,
            files=target.files,
            streams=target.streams,
            parent=cur.version,
            operation=f"rollback_to_{version}",
            committed_at=time.time(),
        )
        self._write_manifest(manifest)
