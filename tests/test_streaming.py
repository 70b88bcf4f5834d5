"""Structured Streaming ingest path: availableNow tail of a parquet log,
foreachBatch MERGE with epoch-marker idempotence, checkpoint-scoped resume
(SURVEY.md §3 entry point 1's Spark equivalent)."""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from multiversx_etl_spark.sources.changelog import generate_change_log, write_log_parquet
from multiversx_etl_spark.streaming.ingest import ensure_table, stream_ingest


@pytest.fixture(scope="module")
def stream_log(spark, tmp_path_factory):
    path = str(tmp_path_factory.mktemp("slog") / "log")
    log = generate_change_log(spark, 1500, num_repos=15, paths_per_repo=20)
    write_log_parquet(log, path, files=6)
    return path


def _final_state(table):
    return {
        (r["repo"], r["path"], r["s"])
        for r in table.read()
        .select("repo", "path", F.sha2(F.coalesce("content", F.lit("")), 256).alias("s"))
        .collect()
    }


def _batch_oracle(spark, stream_log):
    """LWW fold computed with a plain batch query over the same log."""
    log = spark.read.parquet(stream_log)
    w = F.max(F.struct("seq", "op", "content")).alias("w")
    rows = (
        log.groupBy("repo", "path")
        .agg(w)
        .where(F.col("w.op") != "delete")
        .select(
            "repo", "path",
            F.sha2(F.coalesce("w.content", F.lit("")), 256).alias("s"),
        )
        .collect()
    )
    return {(r["repo"], r["path"], r["s"]) for r in rows}


def test_stream_ingest_matches_batch_oracle(spark, stream_log, tmp_path):
    table = ensure_table(spark, str(tmp_path / "t"), num_buckets=4)
    stream_ingest(spark, stream_log, table, str(tmp_path / "ckpt"), max_files_per_trigger=2)
    assert _final_state(table) == _batch_oracle(spark, stream_log)


def test_stream_rerun_same_checkpoint_is_noop(spark, stream_log, tmp_path):
    table = ensure_table(spark, str(tmp_path / "t"), num_buckets=4)
    ckpt = str(tmp_path / "ckpt")
    stream_ingest(spark, stream_log, table, ckpt, max_files_per_trigger=2)
    v = table.current_version()
    stream_ingest(spark, stream_log, table, ckpt, max_files_per_trigger=2)
    assert table.current_version() == v  # no new files => no epochs => no commits


def test_stream_fresh_checkpoint_replays_idempotently(spark, stream_log, tmp_path):
    """Losing the checkpoint dir (worst case) re-delivers every batch under
    NEW epoch ids; the seq-conditional MERGE keeps the final state identical
    (defense in depth below the marker — SURVEY.md §7 hard parts)."""
    table = ensure_table(spark, str(tmp_path / "t"), num_buckets=4)
    stream_ingest(spark, stream_log, table, str(tmp_path / "ckpt1"), max_files_per_trigger=2)
    before = _final_state(table)
    stream_ingest(spark, stream_log, table, str(tmp_path / "ckpt2"), max_files_per_trigger=3)
    assert _final_state(table) == before


def test_stream_with_periodic_compaction(spark, stream_log, tmp_path):
    table = ensure_table(spark, str(tmp_path / "t"), num_buckets=4)
    stream_ingest(
        spark, stream_log, table, str(tmp_path / "ckpt"),
        max_files_per_trigger=2, compact_every=2,
    )
    assert _final_state(table) == _batch_oracle(spark, stream_log)


def test_bootstrap_then_tail(spark, stream_log, tmp_path):
    """Snapshot bootstrap (the reference's truncate-and-reload mutable flow)
    followed by an incremental tail: final state == pure replay of the log
    when the snapshot is the log's own prefix fold."""
    import pyspark.sql.functions as FF
    from multiversx_etl_spark.streaming.ingest import bootstrap_snapshot, replay

    log = spark.read.parquet(stream_log)
    prefix = log.where(FF.col("offset") < 800)
    # snapshot = LWW fold of the prefix (live rows only)
    w = FF.max(FF.struct("seq", "op", "commit", "lang", "content")).alias("w")
    snap = (
        prefix.groupBy("repo", "path").agg(w)
        .where(FF.col("w.op") != "delete")
        .select("repo", "path", FF.col("w.seq").alias("seq"),
                FF.col("w.commit").alias("commit"), FF.col("w.lang").alias("lang"),
                FF.col("w.content").alias("content"))
    )
    t_boot = ensure_table(spark, str(tmp_path / "boot"), num_buckets=4)
    n = bootstrap_snapshot(t_boot, snap)
    assert n == snap.count()
    # tail the remainder of the log on top of the snapshot
    replay(log.where(FF.col("offset") >= 800), t_boot, interval_size=500,
           total_offsets=log.agg(FF.max("offset")).collect()[0][0] + 1)

    t_full = ensure_table(spark, str(tmp_path / "full"), num_buckets=4)
    replay(log, t_full, interval_size=500)
    assert _final_state(t_boot) == _final_state(t_full)


def test_continuous_trigger_tails_new_files_then_stops(spark, tmp_path):
    """processingTime trigger (the reference's forever-loop cadence,
    app.py:74-106): the query returns immediately, processes the initial
    backlog, picks up files that arrive LATER, and stops gracefully."""
    import time

    log_dir = str(tmp_path / "log")
    first = generate_change_log(spark, 400, num_repos=8, paths_per_repo=10)
    write_log_parquet(first.where(F.col("offset") < 200), log_dir, files=1)

    table = ensure_table(spark, str(tmp_path / "t"), num_buckets=4)
    q = stream_ingest(
        spark, log_dir, table, str(tmp_path / "ckpt"),
        max_files_per_trigger=8, trigger_interval="1 seconds",
    )
    assert q is not None and q.isActive
    try:
        deadline = time.time() + 60
        while table.read().count() == 0 and time.time() < deadline:
            time.sleep(0.5)
        rows_after_first = table.read().count()
        assert rows_after_first > 0

        # a second batch of files arrives while the query keeps running
        import uuid

        extra_dir = str(tmp_path / f"extra-{uuid.uuid4().hex}")
        first.where(F.col("offset") >= 200).write.parquet(extra_dir)
        import glob, shutil

        for i, f in enumerate(sorted(glob.glob(f"{extra_dir}/part-*.parquet"))):
            shutil.move(f, f"{log_dir}/late-{i}.parquet")

        want = _batch_oracle_df(spark, log_dir)
        while time.time() < deadline and _final_state(table) != want:
            time.sleep(0.5)
        assert _final_state(table) == want
    finally:
        q.stop()
    deadline = time.time() + 30
    while q.isActive and time.time() < deadline:
        time.sleep(0.2)
    assert not q.isActive  # graceful stop


def _batch_oracle_df(spark, log_dir):
    return _batch_oracle(spark, log_dir)


def test_stream_dedup_deliveries_matches_batch(spark, tmp_path):
    """dropDuplicatesWithinWatermark suppresses at-least-once transport
    duplicates (same repo/path/seq) with bounded state; the drained stream
    must equal the batch dropDuplicates over the same log."""
    from multiversx_etl_spark.sources.changelog import (
        generate_change_log,
        write_log_parquet,
    )
    from multiversx_etl_spark.streaming.dedup import (
        dedup_deliveries,
        stream_dedup_to_parquet,
    )

    log_dir = str(tmp_path / "log")
    log = generate_change_log(spark, 1000, num_repos=10, paths_per_repo=15)
    write_log_parquet(log, log_dir, files=4)
    raw = spark.read.parquet(log_dir)
    n_raw = raw.count()
    n_distinct = raw.dropDuplicates(["repo", "path", "seq"]).count()
    assert n_raw > n_distinct  # the generator injects ~1% duplicate deliveries

    out_dir = str(tmp_path / "out")
    stream_dedup_to_parquet(spark, log_dir, out_dir, str(tmp_path / "ckpt"))
    got = spark.read.parquet(out_dir)
    assert got.count() == n_distinct
    assert got.dropDuplicates(["repo", "path", "seq"]).count() == n_distinct
    # batch-mode call site parity
    assert dedup_deliveries(raw).count() == n_distinct


def test_stream_stream_interval_join_matches_batch(spark, tmp_path):
    """Watermarked stream-stream interval join (delete paired with the
    create/update it extinguished within 30 min): the drained stream must
    equal the identical batch join."""
    from multiversx_etl_spark.sources.changelog import (
        generate_change_log,
        write_log_parquet,
    )
    from multiversx_etl_spark.streaming.joins import (
        short_lived_paths,
        stream_short_lived_to_parquet,
    )

    log_dir = str(tmp_path / "log")
    log = generate_change_log(spark, 2000, num_repos=10, paths_per_repo=10)
    write_log_parquet(log, log_dir, files=4)
    raw = spark.read.parquet(log_dir)

    want = {
        (r["repo"], r["path"], r["create_seq"], r["delete_seq"], r["age_seconds"])
        for r in short_lived_paths(raw).collect()
    }
    assert want, "fixture should contain short-lived (create, delete) pairs"

    out_dir = str(tmp_path / "out")
    stream_short_lived_to_parquet(spark, log_dir, out_dir, str(tmp_path / "ckpt"))
    got = {
        (r["repo"], r["path"], r["create_seq"], r["delete_seq"], r["age_seconds"])
        for r in spark.read.parquet(out_dir).collect()
    }
    assert got == want
