"""applyInPandasWithState per-repo progress operator + NDJSON log interop."""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from multiversx_etl_spark.sources.changelog import (
    generate_change_log,
    read_log_ndjson,
    write_log_ndjson,
    write_log_parquet,
)
from multiversx_etl_spark.streaming.stateful import (
    create_progress_table,
    stream_repo_progress,
    stream_repo_progress_to_table,
)


@pytest.fixture(scope="module")
def state_log(spark, tmp_path_factory):
    path = str(tmp_path_factory.mktemp("slog") / "log")
    log = generate_change_log(spark, 2000, num_repos=12, paths_per_repo=20)
    write_log_parquet(log, path, files=6)
    return path


def test_repo_progress_matches_batch(spark, state_log, tmp_path):
    """Final state-store values after streaming == one batch aggregation."""
    got = stream_repo_progress(spark, state_log, str(tmp_path / "ckpt"))
    want = {
        r["repo"]: (r["n"], r["mx"], r["d"])
        for r in spark.read.parquet(state_log)
        .groupBy("repo")
        .agg(
            F.count("*").alias("n"),
            F.max("seq").alias("mx"),
            F.sum(F.when(F.col("op") == "delete", 1).otherwise(0)).alias("d"),
        )
        .collect()
    }
    assert {g["repo"]: (g["n_events"], g["max_seq"], g["n_deletes"]) for g in got} == want
    # multiple micro-batches actually ran (state carried across batches)
    assert any(g["batch_events"] < g["n_events"] for g in got)


def test_repo_progress_table_sink(spark, state_log, tmp_path):
    """The durable sink (update rows MERGEd into a LakeTable, no driver
    collect) lands the same final per-repo state as the test harness, and a
    rerun over the same checkpoint is a no-op (epoch markers)."""
    table = create_progress_table(spark, str(tmp_path / "pt"), num_buckets=4)
    stream_repo_progress_to_table(spark, state_log, table, str(tmp_path / "c1"))
    want = {
        g["repo"]: (g["n_events"], g["max_seq"], g["n_deletes"])
        for g in stream_repo_progress(spark, state_log, str(tmp_path / "c2"))
    }
    got = {
        r["repo"]: (r["n_events"], r["max_seq"], r["n_deletes"])
        for r in table.read().collect()
    }
    assert got == want
    v = table.current_version()
    stream_repo_progress_to_table(spark, state_log, table, str(tmp_path / "c1"))
    assert table.current_version() == v  # drained checkpoint: nothing re-runs


def test_ndjson_roundtrip(spark, state_log, tmp_path):
    """NDJSON (the reference's wire format) round-trips the log exactly."""
    nd = str(tmp_path / "nd")
    pq = spark.read.parquet(state_log)
    write_log_ndjson(pq, nd, files=4)
    back = read_log_ndjson(spark, nd)
    assert back.count() == pq.count()
    a = {tuple(r) for r in pq.select("offset", "seq", "op", "repo", "path", "commit").collect()}
    b = {tuple(r) for r in back.select("offset", "seq", "op", "repo", "path", "commit").collect()}
    assert a == b
    # timestamps survive (second granularity)
    ta = {(r["offset"], r["event_ts"]) for r in pq.select("offset", "event_ts").collect()}
    tb = {(r["offset"], r["event_ts"]) for r in back.select("offset", "event_ts").collect()}
    assert ta == tb
