"""Watermarked event-time window aggregation: batch/stream agreement, and a
skew/hot-key stress of the merge core (Zipf monorepo + single hot key)."""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from multiversx_etl_spark.sources.changelog import generate_change_log, write_log_parquet
from multiversx_etl_spark.streaming.ingest import ensure_table, replay
from multiversx_etl_spark.streaming.windows import (
    stream_windowed_counts,
    windowed_event_counts,
)


@pytest.fixture(scope="module")
def win_log(spark, tmp_path_factory):
    path = str(tmp_path_factory.mktemp("wlog") / "log")
    log = generate_change_log(spark, 3000, num_repos=20, paths_per_repo=25)
    write_log_parquet(log, path, files=6)
    return path


def test_windowed_counts_batch(spark, win_log):
    out = windowed_event_counts(spark.read.parquet(win_log), "10 minutes")
    rows = out.collect()
    assert sum(r["n_events"] for r in rows) == 3030  # incl. duplicate deliveries
    for r in rows:
        assert (r["window_end"] - r["window_start"]).total_seconds() == 600
        assert r["min_seq"] <= r["max_seq"]


def test_stream_matches_batch(spark, win_log, tmp_path):
    """availableNow streaming with watermark finalizes every window (source
    is finite) — results must equal the batch aggregation."""
    out_dir = str(tmp_path / "out")
    stream_windowed_counts(
        spark, win_log, out_dir, str(tmp_path / "ckpt"), window_duration="10 minutes"
    )
    # n_repos is HLL-approximate on the streaming side — the output self-
    # declares the divergence via n_repos_exact, and only n_events (exact in
    # both modes) is equality-compared
    stream_rows = spark.read.parquet(out_dir).collect()
    assert all(r["n_repos_exact"] is False for r in stream_rows)
    got = {(r["window_start"], r["op"]): r["n_events"] for r in stream_rows}
    batch_rows = windowed_event_counts(
        spark.read.parquet(win_log), "10 minutes"
    ).collect()
    assert all(r["n_repos_exact"] is True for r in batch_rows)
    want = {(r["window_start"], r["op"]): r["n_events"] for r in batch_rows}
    # append mode may hold back the final (unclosed) window; everything
    # emitted must match the batch result exactly
    assert got
    for k, v in got.items():
        assert want[k] == v


def test_sliding_window(spark, win_log):
    out = windowed_event_counts(
        spark.read.parquet(win_log), "10 minutes", slide_duration="5 minutes"
    )
    rows = out.collect()
    # every event lands in exactly 2 sliding windows
    assert sum(r["n_events"] for r in rows) == 2 * 3030


def test_hot_key_merge(spark, tmp_path):
    """Extreme skew: every event hits the SAME (repo, path). The union-agg
    merge reduces the hot key map-side (partial aggregation) — correctness
    and a single surviving row are what we assert here."""
    n = 5000
    log = (
        spark.range(n)
        .select(
            F.col("id").alias("offset"),
            F.col("id").alias("seq"),
            F.when(F.pmod("id", F.lit(50)) == 49, "delete").otherwise("update").alias("op"),
            F.lit("mono").alias("repo"),
            F.lit("src/hot.py").alias("path"),
            F.md5(F.col("id").cast("string")).alias("commit"),
            F.lit("python").alias("lang"),
            F.concat(F.lit("v"), F.col("id").cast("string")).alias("content"),
            F.timestamp_seconds(F.lit(1_600_000_000) + F.col("id")).alias("event_ts"),
        )
    )
    path = str(tmp_path / "hotlog")
    log.write.mode("overwrite").parquet(path)
    table = ensure_table(spark, str(tmp_path / "t"), num_buckets=8)
    replay(spark.read.parquet(path), table, interval_size=1000, total_offsets=n)
    rows = table.read().collect()
    # last event is seq 4999 -> op 'delete'? 4999 % 50 == 49 -> delete wins
    assert rows == []
    raw = table.read(include_tombstones=True).collect()
    assert len(raw) == 1 and raw[0]["seq"] == n - 1 and raw[0]["deleted"]
