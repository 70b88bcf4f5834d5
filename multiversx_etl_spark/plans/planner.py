"""Micro-batch interval planner (operator A15).

The reference decomposes [initial_start, initial_end) into fixed-size
intervals × indices and runs them on a shuffled thread pool
(/root/reference/multiversxetl/tasks_dashboard.py:15-55). Here a plan is a
list of half-open **arrival-offset** ranges, each becoming one exactly-once
epoch; intra-epoch parallelism is Spark's own (the reference's shuffled
thread pool maps to the Spark scheduler, SURVEY.md §2 A16).

Epoch ids are deterministic functions of the range, so a resumed run replans
identically and the epoch markers line up (the reference gets the same
property from its persisted checkpoint timestamp, worker_state.py:7-37).
"""

from __future__ import annotations

from dataclasses import dataclass


@dataclass(frozen=True)
class BatchPlan:
    epoch_id: int
    offset_lo: int
    offset_hi: int  # half-open, mirroring [start, end) at tasks_dashboard.py:35-46


def plan_offset_ranges(total_offsets: int, interval_size: int, start_offset: int = 0) -> list[BatchPlan]:
    """Slice [start_offset, total_offsets) into fixed-size epochs."""
    if interval_size <= 0:
        raise ValueError("interval_size must be positive")
    if start_offset % interval_size != 0:
        # epoch_id = lo // interval_size must be injective over RANGES: a
        # misaligned start would mint epoch ids that collide with an
        # aligned plan's differently-ranged epochs, and a resumed replay
        # would skip offsets its markers never covered — silent data loss
        raise ValueError(
            f"start_offset {start_offset} must be a multiple of "
            f"interval_size {interval_size} (epoch ids are range-derived)"
        )
    plans = []
    lo = start_offset
    while lo < total_offsets:
        hi = min(lo + interval_size, total_offsets)
        plans.append(BatchPlan(epoch_id=lo // interval_size, offset_lo=lo, offset_hi=hi))
        lo = hi
    return plans


def offsets_for_time_range(log, start_ts, end_ts, lateness_seconds: int = 60):
    """ts→offset resolver: the WALL-TIME planning veneer over the
    offset-native planner (the reference plans ``[start_ts, end_ts)``
    intervals and refuses to plan within END_TIME_DELTA of now —
    tasks_dashboard.py:35-46, constants.py:7; offsets are this engine's
    native currency, so a time request resolves to the covering offset
    range).

    With out-of-orderness bounded by ``lateness_seconds`` (every event with
    event_ts < T has arrived before any event with event_ts ≥ T + lateness
    — the END_TIME_DELTA contract), the half-open offset range that
    certainly contains every event with ``start_ts <= event_ts < end_ts``
    is::

        lo = min offset with event_ts >= start_ts            (first possible)
        hi = min offset with event_ts >= end_ts + lateness   (first past-the-end)

    Returns ``(lo, hi)`` as Python ints (one tiny two-scalar agg job); the
    caller replays ``[lo, hi)`` and filters ``event_ts`` exactly. An empty
    window returns (0, 0)."""
    import pyspark.sql.functions as F

    row = log.agg(
        F.min(F.when(F.col("event_ts") >= F.lit(start_ts), F.col("offset"))).alias("lo"),
        F.min(
            F.when(
                F.col("event_ts")
                >= F.lit(end_ts) + F.expr(f"INTERVAL {int(lateness_seconds)} SECONDS"),
                F.col("offset"),
            )
        ).alias("hi"),
        F.max("offset").alias("mx"),
    ).collect()[0]
    if row["lo"] is None:
        return (0, 0)
    hi = row["hi"] if row["hi"] is not None else row["mx"] + 1
    return (int(row["lo"]), int(hi))
