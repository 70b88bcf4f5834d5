"""Incremental table→table replication over the change feed.

The engine is a CDC emitter (LakeTable.changes) as well as a sink, so
pipelines CHAIN: a downstream table tails an upstream one by consuming its
row deltas — never re-reading the full table. Exactly-once falls out of the
same epoch-marker machinery the log ingest uses, with the UPSTREAM SNAPSHOT
VERSION as the epoch id: a replication round commits marker
(stream_id, src_version) atomically with the applied rows, so a crashed or
re-run round is a no-op and a round that observes no new version does
nothing.

This is the reference's dataset→dataset propagation (ES → BigQuery main →
BI datasets via scheduled transfers, /root/reference/multiversxetl/
bq_client.py:118-130) rebuilt on the feed: the transfer carries only the
delta, and the seq guard makes application order-safe.
"""

from __future__ import annotations

import pyspark.sql.functions as F

from multiversx_etl_spark.lake.table import LakeTable
from multiversx_etl_spark.operators.merge import MergeStats, merge_batch


def replicate_changes(
    src: LakeTable,
    dst: LakeTable,
    stream_id: str = "replica",
) -> MergeStats | None:
    """Apply all upstream changes since the last replicated version.

    Returns the merge stats, or None when already up to date. Raises
    ValueError (from ``changes``) if the range contains a full-state
    replacement (bootstrap/promote/rollback) — re-seed the replica from a
    snapshot then (``bootstrap_snapshot(dst, src.read(), 'seq')``)."""
    last = dst.last_committed_epoch(stream_id)
    start = int(last) if last is not None else 0
    cur = src.current_version()
    if start >= cur:
        return None
    feed = src.changes(start, cur)
    batch = feed.withColumn(
        "op", F.when(F.col("deleted"), F.lit("delete")).otherwise(F.lit("update"))
    ).drop("change_type", "deleted")
    return merge_batch(
        dst,
        batch,
        stream_id,
        epoch_id=cur,  # marker = upstream version replicated through
        offset_lo=start,
        offset_hi=cur,
        # version ids are monotone with gaps: keep only the max marker
        # (the contiguous watermark could never advance over the gaps)
        marker_mode="latest_only",
    )
