"""Watermarked stream-stream join (interval join) over the change log.

The reference correlates events only in batch SQL after load; Spark can do
it IN the stream: two watermarked streams join on an equality key plus an
event-time range, and the state store holds each side's rows only until the
watermark proves no more matches can arrive — bounded state, the stream
analog of a range/as-of join.

Concrete operator: ``short_lived_paths`` pairs every delete with EVERY
lower-seq create/update of the same ``(repo, path)`` inside the ``max_age``
window — the "files deleted shortly after creation" audit, a real CDC
quality signal (churn spam, bot commits). Plural on purpose: a bounded-state
stream join cannot single out only the latest write before each delete
(that needs a per-key argmax over the join output), so the operator emits
the full pair set and a consumer wanting one-pair-per-delete reduces it with
``max_by(create_seq)`` downstream — hot keys therefore fan out
O(writes-in-window) pairs per delete. The same function body works on batch
DataFrames (parity like windows.py/dedup.py): Spark compiles the identical
plan minus the state store.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame


def short_lived_paths(
    events: DataFrame,
    max_age: str = "30 minutes",
    watermark: str = "60 seconds",
) -> DataFrame:
    """Pairs of (create-or-update, delete) on the same key with the delete
    at most ``max_age`` after the write — ALL in-window write generations
    per delete (see module docstring). Equality keys (repo, path) keep the
    join an equi-join (state partitioned by key); the time-range predicate
    bounds how long either side is retained. Output is flat integers."""
    creates = events.where(F.col("op") != "delete").select(
        F.col("repo").alias("c_repo"),
        F.col("path").alias("c_path"),
        F.col("seq").alias("create_seq"),
        F.col("event_ts").alias("c_ts"),
    )
    deletes = events.where(F.col("op") == "delete").select(
        F.col("repo").alias("d_repo"),
        F.col("path").alias("d_path"),
        F.col("seq").alias("delete_seq"),
        F.col("event_ts").alias("d_ts"),
    )
    if events.isStreaming:
        creates = creates.withWatermark("c_ts", watermark)
        deletes = deletes.withWatermark("d_ts", watermark)
    cond = (
        (F.col("c_repo") == F.col("d_repo"))
        & (F.col("c_path") == F.col("d_path"))
        & (F.col("d_ts") >= F.col("c_ts"))
        & (F.col("d_ts") <= F.col("c_ts") + F.expr(f"INTERVAL {max_age}"))
        & (F.col("delete_seq") > F.col("create_seq"))
    )
    return (
        creates.join(deletes, cond, "inner")
        .select(
            F.col("c_repo").alias("repo"),
            F.col("c_path").alias("path"),
            "create_seq",
            "delete_seq",
            (
                F.col("d_ts").cast("timestamp").cast("long")
                - F.col("c_ts").cast("timestamp").cast("long")
            ).alias("age_seconds"),
        )
    )


def stream_short_lived_to_parquet(
    spark,
    log_dir: str,
    out_dir: str,
    checkpoint_dir: str,
    max_age: str = "30 minutes",
    watermark: str = "60 seconds",
    max_files_per_trigger: int = 4,
) -> None:
    """Drain the log through the stream-stream join into parquet
    (availableNow); inner interval joins emit each match as soon as both
    sides have arrived."""
    from multiversx_etl_spark.schemas import CHANGE_EVENTS

    src = (
        spark.readStream.schema(CHANGE_EVENTS)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(log_dir)
    )
    q = (
        short_lived_paths(src, max_age=max_age, watermark=watermark)
        .writeStream.outputMode("append")
        .format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
