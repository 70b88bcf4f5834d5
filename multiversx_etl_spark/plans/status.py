"""Per-epoch task status (operator A25 — the reference's task state machine).

The reference tracks PENDING → STARTED → FINISHED_SUCCESS / FINISHED_FAILURE
per task in Firestore (/root/reference/multiversxetl/task.py:6-66, dashboard
at tasks_dashboard.py:88-94). This engine never persists a mutable status
row — an epoch's state is DERIVED from the two durable artifacts the ingest
already writes, so the dashboard can never disagree with reality:

- ``finished``: the epoch marker is in the manifest (data + marker committed
  atomically — the only way an epoch completes).
- ``interrupted``: lineage ledger rows exist but no marker — the writer
  crashed between the pre-commit ledger write and the commit
  (streaming/ingest.py ordering). The idempotent re-run will overwrite the
  orphan ledger and finish the epoch; this is the reference's
  STARTED-but-never-FINISHED observable.
- ``pending``: planned, no trace yet.

There is no separate ``failed`` state by design: a failed epoch leaves the
same durable trace as an interrupted one and is simply re-run (the
reference instead marks FAILED and aborts the bulk; our replay is the
retry loop).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame

from multiversx_etl_spark.lake.table import LakeTable
from multiversx_etl_spark.plans.planner import plan_offset_ranges
from multiversx_etl_spark.streaming.ingest import read_lineage


def epoch_status(
    table: LakeTable,
    total_offsets: int,
    interval_size: int,
    stream_id: str = "main",
) -> DataFrame:
    """One row per planned epoch: (epoch_id, offset_lo, offset_hi, status,
    rows_in). ``rows_in`` is summed from the lineage ledger where present
    (finished or interrupted), NULL for pending."""
    spark = table.spark
    plans = plan_offset_ranges(total_offsets, interval_size)
    # plans are already driver-side: resolve each marker through ONE held
    # Manifest via epoch_info (the single home of the watermark-or-sparse
    # marker logic) and ship the result in with the plan rows
    m = table.snapshot()
    # guard: the caller's interval_size must match the one the stream was
    # actually planned with — otherwise epoch ids line up with different
    # RANGES and the dashboard reports committed offsets as pending (and
    # vice versa). Validated against every retained marker's recorded lo.
    for eid, info in m.streams.get(stream_id, {}).get("epochs", {}).items():
        lo = (info or {}).get("offset_lo")
        if lo is not None and lo != int(eid) * interval_size:
            raise ValueError(
                f"interval_size {interval_size} does not match the stream's "
                f"planning: committed epoch {eid} starts at offset {lo} "
                f"(expected {int(eid) * interval_size})"
            )
    plan_df = spark.createDataFrame(
        [
            (
                p.epoch_id,
                p.offset_lo,
                p.offset_hi,
                m.epoch_info(stream_id, p.epoch_id) is not None,
            )
            for p in plans
        ],
        "epoch_id long, offset_lo long, offset_hi long, _marker boolean",
    )
    lineage = (
        read_lineage(table, stream_id)
        .groupBy("epoch_id")
        .agg(F.sum("rows_in").alias("rows_in"))
    )
    out = (
        plan_df.join(F.broadcast(lineage), "epoch_id", "left")
        .withColumn(
            "status",
            F.when(F.col("_marker"), F.lit("finished"))
            .when(F.col("rows_in").isNotNull(), F.lit("interrupted"))
            .otherwise(F.lit("pending")),
        )
        .select("epoch_id", "offset_lo", "offset_hi", "status", "rows_in")
    )
    return out
