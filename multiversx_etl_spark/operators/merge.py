"""Key-partitioned MERGE upsert into a LakeTable (the engine core).

Semantics match Iceberg's ``MERGE INTO target t USING changes s ON t.repo =
s.repo AND t.path = s.path WHEN MATCHED AND s.seq > t.seq AND s.op = 'delete'
THEN DELETE WHEN MATCHED AND s.seq > t.seq THEN UPDATE SET * WHEN NOT MATCHED
AND s.op != 'delete' THEN INSERT *`` — plus tombstone retention: deletes keep
a ``deleted=true`` row carrying the delete's seq, so a late lower-seq update
arriving in a later batch cannot resurrect the key (SURVEY.md §7 hard parts).

Physical plan, scale-first:

1. **bucket pruning**: the change-set's distinct buckets are computed first
   (a tiny agg — at most ``num_buckets`` values); only those buckets' files
   are read and rewritten (copy-on-write). A micro-batch touching few repos
   rewrites a small fraction of a 100 TB table. Analog of the reference's
   interval-scoped loads (tasks_runner.py:93-104) and of Iceberg's
   storage-partitioned MERGE on a bucket spec.
2. **dedup before join**: the change-set collapses to one row per key via the
   partial-agg struct max (operators/dedup.py) — the big side of the merge
   shrinks before any shuffle.
3. **union + single hash aggregate** instead of an outer join: target rows
   (tagged) and change rows (tagged) union and group by key; the max-struct
   winner implements MATCHED/NOT-MATCHED arms uniformly. One shuffle total,
   map-side combined; AQE handles residual skew. (A join would shuffle both
   sides too — but also need null-handling per arm; the union-agg form is
   both cheaper to reason about and partial-aggregatable.)
4. **merge stats in the same pass**: per-key target/change seqs ride along,
   classifying each output row as insert/update/delete/carry for the lineage
   ledger (A17/A24 analogs) without a second scan of the inputs.

Idempotence: re-applying the same batch yields seq ties, which the winner
comparison resolves in favor of identical data — a replayed MERGE is a no-op
(the epoch marker normally short-circuits it earlier; this is defense in
depth).
"""

from __future__ import annotations

import contextlib
import os
import sys
import time
from dataclasses import dataclass

import pyspark.sql.functions as F
from pyspark.sql import DataFrame
from pyspark.sql.types import StructType

from multiversx_etl_spark.lake.table import LakeTable, bucket_expr

#: log bookkeeping columns that never enter the target table.
_LOG_ONLY = ("offset", "op")


@contextlib.contextmanager
def _phase(name: str):
    """Wall-clock a merge phase to stderr when MXETL_TIMING=1 (perf triage)."""
    t0 = time.perf_counter()
    yield
    if os.environ.get("MXETL_TIMING"):
        print(f"[merge] {name}: {time.perf_counter() - t0:.2f}s", file=sys.stderr)


@dataclass
class MergeStats:
    rows_in: int = 0
    rows_deduped: int = 0
    rows_inserted: int = 0
    rows_updated: int = 0
    rows_deleted: int = 0
    touched_buckets: int = 0
    per_bucket: list[dict] | None = None


def evolve_schema(target_schema: StructType, changes: DataFrame, key_columns: list[str]) -> StructType:
    """Union of the target schema and the change-set's payload columns —
    new columns append (old files read them as NULL), dropped columns stay
    (new rows carry NULL). The reference's analog is out-of-band ``bq
    update`` schema pushes (maintenance/schemas.md:13-28); here it's part of
    the same atomic commit."""
    existing = {f.name for f in target_schema.fields}
    out = StructType(list(target_schema.fields))
    for f in changes.schema.fields:
        if f.name in existing or f.name in _LOG_ONLY or f.name.startswith("_"):
            continue  # engine-internal (_bucket etc.) and log bookkeeping stay out
        out.add(f.name, f.dataType, True)
    return out


def merge_batch(
    table: LakeTable,
    changes: DataFrame,
    stream_id: str,
    epoch_id: int,
    offset_lo: int = 0,
    offset_hi: int = 0,
    collect_per_bucket_stats: bool = True,
) -> MergeStats:
    """Apply one micro-batch of change events and commit atomically."""
    parent = table.snapshot()
    key = parent.key_columns
    stats = MergeStats()

    changes = changes.withColumn("_bucket", bucket_expr(key, parent.num_buckets))

    # -- 1. rows_in per bucket + touched-bucket set (one tiny agg job).
    with _phase("in_counts"):
        in_counts = {
            r["_bucket"]: r["n"]
            for r in changes.groupBy("_bucket").agg(F.count("*").alias("n")).collect()
        }
    touched = set(in_counts)
    stats.rows_in = sum(in_counts.values())
    stats.touched_buckets = len(touched)
    if not touched:
        # Empty batch: still record the epoch marker (exactly-once bookkeeping).
        table.commit(
            [], set(), "merge-empty", stream_id, epoch_id,
            {"offset_lo": offset_lo, "offset_hi": offset_hi, "rows_in": 0},
            expected_parent=parent.version,
        )
        return stats

    # -- 2. schema evolution + align both sides to the evolved payload.
    evolved = evolve_schema(parent.schema, changes, key)
    payload = [
        f.name for f in evolved.fields if f.name not in key and f.name not in ("seq", "deleted")
    ]

    def aligned(df: DataFrame, is_change: bool) -> DataFrame:
        cols = [F.col(c) for c in key]
        cols.append(F.col("seq").cast("long").alias("seq"))
        if is_change:
            cols.append((F.col("op") == "delete").alias("deleted"))
        else:
            cols.append(F.col("deleted"))
        for p in payload:
            typ = evolved[p].dataType
            if p in df.columns:
                cols.append(F.col(p).cast(typ).alias(p))
            else:
                cols.append(F.lit(None).cast(typ).alias(p))
        cols.append(F.lit(is_change).alias("_is_change"))
        cols.append(F.col("_bucket"))
        return df.select(*cols)

    target = table.read(buckets=touched, include_tombstones=True).withColumn(
        "_bucket", bucket_expr(key, parent.num_buckets)
    )
    both = aligned(target, False).unionByName(aligned(changes, True))

    # -- 3. ONE shuffle, ONE hash aggregate: co-partition target + raw change
    #    rows by bucket, then group by key. Because ``_bucket`` is a pure
    #    function of the key and appears in the grouping keys, the explicit
    #    HashPartitioning(_bucket) satisfies the aggregate's required
    #    distribution — Catalyst inserts no second exchange, and the
    #    downstream bucketed file write consumes the same partitioning (zero
    #    further shuffles). The max-struct winner performs per-key dedup of
    #    the change-set (A14) AND the MATCHED/NOT-MATCHED merge arms in the
    #    same aggregation — duplicates, out-of-order seqs, and the target row
    #    all collapse in one pass. Struct comparison is (seq, _is_change,
    #    ...): on a seq tie the change row wins, carrying identical data
    #    (idempotent replay).
    wstruct = F.struct("seq", "_is_change", "deleted", *payload, "_bucket")
    merged = (
        both.repartition(parent.num_buckets, F.col("_bucket"))
        .groupBy(*key, "_bucket")
        .agg(
            F.max(wstruct).alias("_w"),
            F.max(F.when(~F.col("_is_change"), F.col("seq"))).alias("_tseq"),
            F.max(F.when(~F.col("_is_change") & ~F.col("deleted"), True)).alias("_tlive"),
            F.count(F.when(F.col("_is_change"), 1)).alias("_cn"),
        )
        .drop("_bucket")
    )
    won_change = F.col("_w._is_change")
    was_live = F.coalesce(F.col("_tlive"), F.lit(False))
    action = (
        F.when(~won_change, F.lit("carry"))
        # seq tie = the same event re-applied (at-least-once replay): no-op
        .when(F.col("_tseq").isNotNull() & (F.col("_w.seq") == F.col("_tseq")), F.lit("carry"))
        .when(F.col("_w.deleted") & was_live, F.lit("delete"))
        .when(F.col("_w.deleted"), F.lit("tombstone"))  # delete of an absent/dead key
        .when(was_live, F.lit("update"))
        .otherwise(F.lit("insert"))  # new key, or resurrection of a tombstone
    )
    merged = merged.select(
        *key,
        F.col("_w.seq").alias("seq"),
        F.col("_w.deleted").alias("deleted"),
        *[F.col(f"_w.{p}").alias(p) for p in payload],
        F.col("_w._bucket").alias("_bucket"),
        action.alias("_action"),
        F.col("_cn"),
    )
    merged = merged.persist()
    try:
        # -- 5. write new bucket files (copy-on-write of touched buckets).
        out_cols = [*key, *payload, "seq", "deleted", "_bucket"]
        tag = f"{stream_id}-e{epoch_id:08d}"
        with _phase("merge_write"):
            new_files = table.write_data_files(
                merged.select(*out_cols), tag, bucket_aligned=True
            )

        # -- 6. per-bucket merge stats for the lineage ledger.
        with _phase("bucket_stats"):
            bucket_stats = (
                merged.groupBy("_bucket")
                .agg(
                    F.sum(F.when(F.col("_action") == "insert", 1).otherwise(0)).alias("ins"),
                    F.sum(F.when(F.col("_action") == "update", 1).otherwise(0)).alias("upd"),
                    F.sum(F.when(F.col("_action") == "delete", 1).otherwise(0)).alias("del"),
                    # rows remaining after per-key dedup (change-side keys seen)
                    F.sum(F.when(F.col("_cn") >= 1, 1).otherwise(0)).alias("dedup"),
                )
                .collect()
                if collect_per_bucket_stats
                else []
            )
        per_bucket = []
        now = time.time()
        for r in bucket_stats:
            per_bucket.append(
                {
                    "epoch_id": epoch_id,
                    "bucket": int(r["_bucket"]),
                    "offset_lo": offset_lo,
                    "offset_hi": offset_hi,
                    "rows_in": int(in_counts.get(r["_bucket"], 0)),
                    "rows_deduped": int(r["dedup"]),
                    "rows_inserted": int(r["ins"]),
                    "rows_updated": int(r["upd"]),
                    "rows_deleted": int(r["del"]),
                    "committed_at": now,
                }
            )
            stats.rows_inserted += int(r["ins"])
            stats.rows_updated += int(r["upd"])
            stats.rows_deleted += int(r["del"])
            stats.rows_deduped += int(r["dedup"])
        stats.per_bucket = per_bucket

        # -- 7. atomic commit: data files + epoch marker + evolved schema.
        table.commit(
            new_files,
            touched,
            "merge",
            stream_id,
            epoch_id,
            {
                "offset_lo": offset_lo,
                "offset_hi": offset_hi,
                "rows_in": stats.rows_in,
                "inserted": stats.rows_inserted,
                "updated": stats.rows_updated,
                "deleted": stats.rows_deleted,
            },
            schema=evolved,
            expected_parent=parent.version,
        )
    finally:
        merged.unpersist()
    return stats
