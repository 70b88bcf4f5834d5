"""Event-time windowed aggregation with watermark-based late-data guarding.

The reference never ingests the trailing 60 s of "now" (END_TIME_DELTA,
/root/reference/multiversxetl/constants.py:7, applied at
app_controller.py:78-83) — its interval planner simply refuses to plan past
``now - 60s`` so a slice is only read once its data is complete. The
Spark-first equivalent is a watermark: ``withWatermark(event_ts, "60
seconds")`` lets the engine admit late rows up to 60 s behind the max seen
event time, then finalize (and drop state for) closed windows.

Two surfaces:

- ``windowed_event_counts``: streaming-or-batch tumbling/sliding window
  rollup over the change log (events per window per op — the analog of the
  reference's per-interval task counts, tasks_dashboard.py:35-46).
- ``stream_windowed_counts``: the readStream wrapper with watermark +
  append-mode sink, for genuine Structured Streaming.

Both are plain ``F.window`` aggregations — Spark's streaming state store
handles incremental maintenance; at 100 TB the aggregation is partial
(map-side combined) and shuffles only (window, op) groups.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from multiversx_etl_spark.schemas import CHANGE_EVENTS


def windowed_event_counts(
    events: DataFrame,
    window_duration: str = "1 hour",
    slide_duration: str | None = None,
    watermark: str | None = "60 seconds",
) -> DataFrame:
    """Events per (time window, op): tumbling by default, sliding if
    ``slide_duration`` is given. Works unchanged on a batch or streaming
    DataFrame (the watermark is a no-op in batch)."""
    if watermark and events.isStreaming:
        events = events.withWatermark("event_ts", watermark)
    win = (
        F.window("event_ts", window_duration, slide_duration)
        if slide_duration
        else F.window("event_ts", window_duration)
    )
    # exact COUNT(DISTINCT) is not allowed on streaming aggregations —
    # the HLL sketch is the streaming-native answer (B5's cheap variant).
    # The schema is identical in both modes, but the semantics differ, so
    # the output SAYS which it computed: n_repos_exact=false marks the
    # sketch (consumers must not equality-compare approx counts).
    exact = not events.isStreaming
    n_repos = F.countDistinct("repo") if exact else F.approx_count_distinct("repo")
    return (
        events.groupBy(win.alias("win"), "op")
        .agg(
            F.count("*").alias("n_events"),
            n_repos.alias("n_repos"),
            F.min("seq").alias("min_seq"),
            F.max("seq").alias("max_seq"),
        )
        .select(
            F.col("win.start").alias("window_start"),
            F.col("win.end").alias("window_end"),
            "op",
            "n_events",
            "n_repos",
            F.lit(exact).alias("n_repos_exact"),
            "min_seq",
            "max_seq",
        )
    )


def stream_windowed_counts(
    spark: SparkSession,
    log_dir: str,
    out_dir: str,
    checkpoint_dir: str,
    window_duration: str = "1 hour",
    watermark: str = "60 seconds",
    max_files_per_trigger: int = 4,
) -> None:
    """Structured Streaming: tail the parquet log, maintain watermarked
    windowed counts, append finalized windows to ``out_dir``.

    Append output mode emits a window only once its watermark passes — the
    exactly-once-finalized semantics the reference approximates by never
    reading the last 60 s."""
    src = (
        spark.readStream.schema(CHANGE_EVENTS)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(log_dir)
    )
    agg = windowed_event_counts(src, window_duration, watermark=watermark)
    q = (
        agg.writeStream.outputMode("append")
        .format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
