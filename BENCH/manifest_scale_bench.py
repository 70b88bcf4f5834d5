"""Sharded-manifest scale microbench: commit cost + plan-time manifest bytes
at 10^5 live files, O(touched buckets) vs the format-1 O(table) rewrite.

Pure metadata protocol exercise — no Spark session, no parquet bytes: the
cost being measured is exactly the JSON the commit path writes and the plan
path parses. Fabricates a table with B=256 buckets and ~10^5 file entries
(zone-map stats included, matching real entries' shape), then measures:

  1. one single-pid MOR append commit (the replay's steady-state shape):
     wall time + bytes (re)written, vs the format-1 equivalent (full
     inline rewrite);
  2. snapshot() + files_for_pids({pid}) — the bucket-pruned plan path:
     wall time + bytes parsed, vs parsing the full inline list;
  3. rollback: bytes written (refs carried verbatim).

Usage: python BENCH/manifest_scale_bench.py [files_total] [buckets]
Prints one JSON line.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql.types import (  # noqa: E402
    BooleanType, LongType, StringType, StructField, StructType,
)

from multiversx_etl_spark.lake import table as T  # noqa: E402


class _NoSparkTable(T.LakeTable):
    """LakeTable with the one Spark-dependent helper stubbed: bucket->pid
    mapping is irrelevant here (we fabricate pids directly)."""

    def pids_for_buckets(self, buckets, m):  # pragma: no cover - trivial
        return buckets


def fabricate(root: str, files_total: int, buckets: int) -> _NoSparkTable:
    schema = StructType([
        StructField("repo", StringType(), False),
        StructField("path", StringType(), False),
        StructField("seq", LongType(), False),
        StructField("deleted", BooleanType(), True),
        StructField("content", StringType(), True),
    ])
    table = _NoSparkTable.create(
        None, root, schema, key_columns=["repo", "path"], num_buckets=buckets
    )
    per_pid = files_total // buckets
    entries = []
    for pid in range(buckets):
        for i in range(per_pid):
            entries.append({
                "path": f"data/seed/part-{pid:05d}-{i:05d}.parquet",
                "pid": pid,
                "rows": 10_000,
                "base": True,
                "stats": {
                    "repo": [f"org/repo-{pid:04d}-{i:04d}",
                             f"org/repo-{pid:04d}-{i + 1:04d}"],
                    "path": ["a/a.py", "z/z.py"],
                    "seq": [i * 10_000, (i + 1) * 10_000],
                },
            })
    table.commit(entries, replaced_pids=set(), operation="merge-seed")
    return table


def du(path: str) -> int:
    total = 0
    for dirpath, _dirs, names in os.walk(path):
        for n in names:
            total += os.path.getsize(os.path.join(dirpath, n))
    return total


def main() -> None:
    files_total = int(sys.argv[1]) if len(sys.argv) > 1 else 100_000
    buckets = int(sys.argv[2]) if len(sys.argv) > 2 else 256
    root = tempfile.mkdtemp(prefix="manifest-scale-")
    try:
        table = fabricate(os.path.join(root, "t"), files_total, buckets)
        mdir = os.path.join(table.root, T._MANIFEST_DIR)

        # --- steady-state commit: ONE pid gains one MOR delta file
        bytes_before = du(mdir)
        t0 = time.perf_counter()
        table.commit(
            [{"path": "data/e1/part-00007-00000.parquet", "pid": 7,
              "rows": 1234,
              "stats": {"repo": ["a", "b"], "path": ["a", "b"],
                        "seq": [0, 1234]}}],
            replaced_pids=set(),
            operation="merge-epoch",
            stream_id="main",
            epoch_id=0,
            epoch_info={"rows": 1234},
        )
        commit_sec = time.perf_counter() - t0
        commit_bytes_written = du(mdir) - bytes_before
        root_doc_bytes = os.path.getsize(
            table._manifest_path(table.current_version())
        )

        # format-1 equivalent: the WHOLE file list inline, rewritten
        m = table.snapshot()
        inline_bytes = len(json.dumps(m.files).encode())

        # --- plan path: bucket-pruned listing parses one group + root
        t0 = time.perf_counter()
        m2 = table.snapshot()
        listed = m2.files_for_pids({7})
        plan_sec = time.perf_counter() - t0
        ref = m2.ref_for(3)  # untouched pid stays a ref
        group_doc_bytes = os.path.getsize(
            os.path.join(table.root, m2.ref_for(7)["path"])
        )
        plan_bytes_parsed = root_doc_bytes + group_doc_bytes
        assert len(listed) == files_total // buckets + 1
        assert ref is not None and "files" not in m2._slots[3]

        # full-plan (no pruning) timing for reference
        t0 = time.perf_counter()
        _ = len(table.snapshot().files)
        full_plan_sec = time.perf_counter() - t0

        # --- rollback: refs carried, no group docs written
        bytes_before = du(mdir)
        t0 = time.perf_counter()
        table.rollback(1)
        rollback_sec = time.perf_counter() - t0
        rollback_bytes_written = du(mdir) - bytes_before

        print(json.dumps({
            "files_total": files_total + 1,
            "buckets": buckets,
            "steady_commit_sec": round(commit_sec, 4),
            "steady_commit_bytes_written": commit_bytes_written,
            "root_doc_bytes": root_doc_bytes,
            "format1_inline_bytes": inline_bytes,
            "commit_amplification_vs_format1":
                round(inline_bytes / max(commit_bytes_written, 1), 1),
            "pruned_plan_sec": round(plan_sec, 4),
            "pruned_plan_bytes_parsed": plan_bytes_parsed,
            "full_plan_sec": round(full_plan_sec, 4),
            "rollback_sec": round(rollback_sec, 4),
            "rollback_bytes_written": rollback_bytes_written,
        }))
    finally:
        shutil.rmtree(root, ignore_errors=True)


if __name__ == "__main__":
    main()
