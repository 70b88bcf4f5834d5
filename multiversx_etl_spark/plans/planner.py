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
    plans = []
    lo = start_offset
    while lo < total_offsets:
        hi = min(lo + interval_size, total_offsets)
        plans.append(BatchPlan(epoch_id=lo // interval_size, offset_lo=lo, offset_hi=hi))
        lo = hi
    return plans
