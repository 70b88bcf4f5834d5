"""Streaming-native duplicate-delivery suppression (A14's streaming face).

The batch engine dedups inside the MERGE (per-key max-seq union-agg,
operators/merge.py); upstream of it, a redelivered event — same
``(repo, path, seq)``, the at-least-once transport case the reference guards
with its re-extraction checks (/root/reference/multiversxetl/checks.py:87-93)
— can also be dropped *in the stream itself* with bounded state:
``dropDuplicatesWithinWatermark`` keeps each key's fingerprint only until
the watermark passes it, so state is O(events within the lateness window),
not O(all events ever). That bound is what makes stream-side dedup viable at
10^10 events; an unbounded ``dropDuplicates`` would OOM the state store.

This is a *pre-filter*, not a replacement for the MERGE guard: a duplicate
arriving later than the watermark window still reaches the MERGE and dies
on the seq tie there (defense in depth, exactly like the epoch marker vs
idempotent-MERGE layering).
"""

from __future__ import annotations

from pyspark.sql import DataFrame

#: identity of one delivery: the event key + its commit sequence. Two rows
#: agreeing on all three are the SAME event delivered twice (the transport
#: duplicate case); an update carries a new seq and passes.
DELIVERY_KEY = ["repo", "path", "seq"]


def dedup_deliveries(
    events: DataFrame,
    watermark: str = "60 seconds",
    event_time_column: str = "event_ts",
) -> DataFrame:
    """Drop duplicate deliveries of the same ``(repo, path, seq)``.

    Streaming input: watermarked ``dropDuplicatesWithinWatermark`` — state
    per key is dropped once the watermark passes, bounding the store.
    Batch input: plain ``dropDuplicates`` (no state concern), so the same
    call site works in both modes (batch/stream parity like
    ``windowed_event_counts``)."""
    if events.isStreaming:
        return events.withWatermark(
            event_time_column, watermark
        ).dropDuplicatesWithinWatermark(DELIVERY_KEY)
    return events.dropDuplicates(DELIVERY_KEY)


def stream_dedup_to_parquet(
    spark,
    log_dir: str,
    out_dir: str,
    checkpoint_dir: str,
    watermark: str = "60 seconds",
    max_files_per_trigger: int = 4,
) -> None:
    """Tail a parquet log, suppress duplicate deliveries, append the clean
    stream to ``out_dir`` (availableNow drain)."""
    from multiversx_etl_spark.schemas import CHANGE_EVENTS

    src = (
        spark.readStream.schema(CHANGE_EVENTS)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(log_dir)
    )
    q = (
        dedup_deliveries(src, watermark=watermark)
        .writeStream.outputMode("append")
        .format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
