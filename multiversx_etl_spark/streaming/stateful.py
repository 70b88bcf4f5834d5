"""Custom stateful streaming operator via ``applyInPandasWithState``.

The engine's core state (the table itself) lives in the lake via
``foreachBatch`` — the right home for exactly-once upserts. This module
covers the OTHER stateful surface the build brief names: arbitrary per-key
running state maintained by Spark's streaming state store, expressed with
Arrow-batched pandas (never per-row Python).

``repo_progress`` tracks per-repo ingest progress across micro-batches:
running event count, max commit seq seen, delete count — the streaming
analog of the reference's per-index task bookkeeping
(/root/reference/multiversxetl/tasks_dashboard.py:88-94), but maintained
incrementally in the state store instead of recomputed per bulk.

Scale notes: state is one tiny tuple per repo (not per key), partitioned by
the shuffle on ``repo``; a monorepo's rows all reach one task per batch but
the per-batch pandas reduction is O(rows in batch), state update O(1).
"""

from __future__ import annotations

from collections.abc import Iterable, Iterator
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    LongType,
    StringType,
    StructField,
    StructType,
)

PROGRESS_STATE = StructType(
    [
        StructField("n_events", LongType()),
        StructField("max_seq", LongType()),
        StructField("n_deletes", LongType()),
    ]
)

PROGRESS_OUTPUT = StructType(
    [
        StructField("repo", StringType()),
        StructField("n_events", LongType()),
        StructField("max_seq", LongType()),
        StructField("n_deletes", LongType()),
        StructField("batch_events", LongType()),
    ]
)


def _update_progress(
    key: tuple, pdfs: Iterable[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    (repo,) = key
    n_events, max_seq, n_deletes = (
        state.get if state.exists else (0, -1, 0)
    )
    batch_events = 0
    for pdf in pdfs:
        batch_events += len(pdf)
        n_events += len(pdf)
        if len(pdf):
            max_seq = max(max_seq, int(pdf["seq"].max()))
            n_deletes += int((pdf["op"] == "delete").sum())
    state.update((int(n_events), int(max_seq), int(n_deletes)))
    yield pd.DataFrame(
        {
            "repo": [repo],
            "n_events": [n_events],
            "max_seq": [max_seq],
            "n_deletes": [n_deletes],
            "batch_events": [batch_events],
        }
    )


def repo_progress(events: DataFrame) -> DataFrame:
    """Attach the stateful per-repo progress operator to a STREAMING
    change-event DataFrame; emits one updated row per repo per batch."""
    return events.groupBy("repo").applyInPandasWithState(
        _update_progress,
        outputStructType=PROGRESS_OUTPUT,
        stateStructType=PROGRESS_STATE,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def stream_repo_progress(
    spark,
    log_dir: str,
    checkpoint_dir: str,
    max_files_per_trigger: int = 4,
) -> list[dict[str, Any]]:
    """Run the stateful operator over a parquet log with availableNow and
    return the FINAL per-repo progress rows (last update per repo wins)."""
    from multiversx_etl_spark.schemas import CHANGE_EVENTS

    src = (
        spark.readStream.schema(CHANGE_EVENTS)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(log_dir)
    )
    out = repo_progress(src)
    latest: dict[str, dict[str, Any]] = {}

    def sink(batch_df: DataFrame, epoch_id: int) -> None:
        for r in batch_df.collect():
            latest[r["repo"]] = r.asDict()

    q = (
        out.writeStream.foreachBatch(sink)
        .outputMode("update")
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return sorted(latest.values(), key=lambda d: d["repo"])
