"""End-to-end CDC correctness: replay vs an independent DuckDB oracle.

Mirrors the reference's continuous counts-reconciliation-as-test strategy
(/root/reference/multiversxetl/checks.py:21-93) with the stronger per-row
sha256(content) invariant from BASELINE.json:input_hint.
"""

from __future__ import annotations

import duckdb
import pyspark.sql.functions as F
import pytest

from multiversx_etl_spark.lake.table import LakeTable
from multiversx_etl_spark.operators.checks import reconcile
from multiversx_etl_spark.operators.merge import merge_batch
from multiversx_etl_spark.oracle import expected_state
from multiversx_etl_spark.sources.changelog import generate_change_log, write_log_parquet
from multiversx_etl_spark.streaming.ingest import ensure_table, read_lineage, replay

N_EVENTS = 2000


@pytest.fixture(scope="module")
def log_path(spark, tmp_path_factory):
    path = str(tmp_path_factory.mktemp("log") / "change_events")
    log = generate_change_log(spark, N_EVENTS, num_repos=20, paths_per_repo=25)
    write_log_parquet(log, path, files=8)
    return path


def oracle_final_state(log_path: str):
    """Independent last-writer-wins fold in DuckDB: (repo, path, sha256)."""
    con = duckdb.connect()
    rows = con.execute(
        f"""
        WITH ranked AS (
          SELECT *, row_number() OVER (PARTITION BY repo, path ORDER BY seq DESC) AS rn
          FROM read_parquet('{log_path}/*.parquet')
        )
        SELECT repo, path, sha256(coalesce(content, '')) AS content_sha
        FROM ranked WHERE rn = 1 AND op <> 'delete'
        ORDER BY repo, path
        """
    ).fetchall()
    con.close()
    return set(rows)


def spark_final_state(spark, table: LakeTable):
    rows = (
        table.read()
        .select("repo", "path", F.sha2(F.coalesce("content", F.lit("")), 256).alias("s"))
        .collect()
    )
    return {(r["repo"], r["path"], r["s"]) for r in rows}


def test_replay_matches_oracle(spark, log_path, tmp_path):
    table = ensure_table(spark, str(tmp_path / "repos"), num_buckets=8)
    log = spark.read.parquet(log_path)
    summary = replay(log, table, interval_size=500)
    assert summary.epochs_run > 0
    assert spark_final_state(spark, table) == oracle_final_state(log_path)
    # runtime reconciliation (A17 analog) also passes
    report = reconcile(table, expected_state(log))
    assert report.ok, report


def test_resume_after_partial_replay(spark, log_path, tmp_path):
    """Kill between epochs, restart: no loss, no duplication
    (the reference's rewind/checkpoint semantics, app_controller.py:195-220)."""
    table = ensure_table(spark, str(tmp_path / "repos"), num_buckets=8)
    log = spark.read.parquet(log_path)
    partial = replay(log, table, interval_size=500, max_epochs=2)
    assert partial.epochs_run == 2
    resumed = replay(log, table, interval_size=500)
    assert resumed.epochs_skipped == 2
    assert spark_final_state(spark, table) == oracle_final_state(log_path)


def test_duplicate_epoch_replay_is_noop(spark, log_path, tmp_path):
    """At-least-once redelivery: replaying a full epoch leaves the table
    unchanged (seq-conditional merge — defense in depth below the marker)."""
    table = ensure_table(spark, str(tmp_path / "repos"), num_buckets=8)
    log = spark.read.parquet(log_path)
    replay(log, table, interval_size=500)
    before = spark_final_state(spark, table)
    batch = log.where((F.col("offset") >= 0) & (F.col("offset") < 500))
    stats = merge_batch(table, batch, "main", epoch_id=999, offset_lo=0, offset_hi=500)
    assert stats.rows_inserted == 0 and stats.rows_updated == 0 and stats.rows_deleted == 0
    assert spark_final_state(spark, table) == before


def test_epoch_markers_skip_committed(spark, log_path, tmp_path):
    table = ensure_table(spark, str(tmp_path / "repos"), num_buckets=8)
    log = spark.read.parquet(log_path)
    replay(log, table, interval_size=500)
    again = replay(log, table, interval_size=500)
    assert again.epochs_run == 0 and again.epochs_skipped > 0


def test_lineage_ledger(spark, log_path, tmp_path):
    table = ensure_table(spark, str(tmp_path / "repos"), num_buckets=8)
    log = spark.read.parquet(log_path)
    summary = replay(log, table, interval_size=500)
    lineage = read_lineage(table)
    agg = lineage.agg(
        F.sum("rows_in").alias("rin"), F.sum("rows_inserted").alias("ins")
    ).collect()[0]
    assert agg["rin"] == summary.rows_in
    assert agg["ins"] == summary.rows_inserted
    # every epoch present, offsets half-open and non-overlapping
    epochs = {r["epoch_id"] for r in lineage.select("epoch_id").distinct().collect()}
    assert epochs == set(range(summary.epochs_run))


def test_rollback_time_travel(spark, log_path, tmp_path):
    table = ensure_table(spark, str(tmp_path / "repos"), num_buckets=8)
    log = spark.read.parquet(log_path)
    replay(log, table, interval_size=500, max_epochs=2)
    v2 = table.current_version()
    count_v2 = table.read().count()
    replay(log, table, interval_size=500)
    assert table.read().count() != count_v2 or table.current_version() != v2
    table.rollback(v2)
    assert table.read().count() == count_v2


def test_timestamp_time_travel(spark, log_path, tmp_path):
    """TIMESTAMP AS OF: version_at resolves wall time against committed_at;
    read_as_of returns the snapshot state current at that instant."""
    import time as _time

    import pytest as _pytest

    table = ensure_table(spark, str(tmp_path / "repos"), num_buckets=8)
    log = spark.read.parquet(log_path)
    replay(log, table, interval_size=500, max_epochs=2)
    v_mid = table.current_version()
    ts_mid = table.snapshot(v_mid).committed_at
    count_mid = table.read().count()
    _time.sleep(0.05)
    replay(log, table, interval_size=500)
    assert table.version_at(ts_mid) == v_mid
    assert table.read_as_of(ts_mid).count() == count_mid
    assert table.version_at(_time.time()) == table.current_version()
    with _pytest.raises(ValueError, match="predates"):
        table.version_at(ts_mid - 10_000)


def test_epoch_status_dashboard(spark, tmp_path):
    """A25: per-epoch states derive from durable artifacts only — committed
    epochs read 'finished', an orphan lineage write without its marker (the
    crash-between-ledger-and-commit observable) reads 'interrupted', and
    unstarted epochs read 'pending'."""
    from multiversx_etl_spark.plans.status import epoch_status
    from multiversx_etl_spark.sources.changelog import (
        generate_change_log,
        write_log_parquet,
    )
    from multiversx_etl_spark.streaming.ingest import (
        _write_lineage,
        ensure_table,
        replay,
    )

    table = ensure_table(spark, str(tmp_path / "t"), num_buckets=4)
    log = generate_change_log(spark, 600, num_repos=5, paths_per_repo=10)
    path = str(tmp_path / "log")
    write_log_parquet(log, path, files=2)
    df = spark.read.parquet(path)
    # run only the first 2 of 7 planned epochs (100-offset intervals, 606 total)
    replay(df, table, interval_size=100, max_epochs=2)
    # fabricate the crash artifact: epoch 3's ledger written, no marker
    _write_lineage(
        table, 3,
        [{"epoch_id": 3, "bucket": 0, "offset_lo": 300, "offset_hi": 400,
          "rows_in": 5, "rows_deduped": 0, "rows_inserted": 0,
          "rows_updated": 0, "rows_deleted": 0, "committed_at": 1.0}],
        "main",
    )
    rows = {
        r["epoch_id"]: r
        for r in epoch_status(table, 606, 100).collect()
    }
    assert len(rows) == 7
    assert rows[0]["status"] == rows[1]["status"] == "finished"
    assert rows[0]["rows_in"] > 0
    assert rows[3]["status"] == "interrupted" and rows[3]["rows_in"] == 5
    assert rows[2]["status"] == rows[5]["status"] == rows[6]["status"] == "pending"
    assert rows[2]["rows_in"] is None
    # the idempotent re-run finishes everything, including the orphan
    replay(df, table, interval_size=100)
    statuses = {r["status"] for r in epoch_status(table, 606, 100).collect()}
    assert statuses == {"finished"}


def test_change_feed_between_versions(spark, tmp_path):
    """The table emits a downstream CDC feed: changes(v0, v1) returns each
    merge commit's logical row deltas with change_type, skips compactions,
    and refuses ranges containing full-state replacements."""
    import pytest as _pytest

    from multiversx_etl_spark.lake.table import LakeTable
    from multiversx_etl_spark.operators.merge import merge_batch
    from multiversx_etl_spark.schemas import REPOS

    def batch(rows):
        cols = "offset long, seq long, op string, repo string, path string, commit string, lang string, content string"
        return spark.createDataFrame(rows, cols)

    table = LakeTable.create(
        spark, str(tmp_path / "t"), REPOS, key_columns=["repo", "path"], num_buckets=4
    )
    v0 = table.current_version()
    merge_batch(table, batch([
        (0, 1, "insert", "r", "a.py", "c", "py", "v1"),
        (1, 1, "insert", "r", "b.py", "c", "py", "v1"),
    ]), "m", 0, 0, 2)
    v1 = table.current_version()
    merge_batch(table, batch([
        (2, 2, "update", "r", "a.py", "c", "py", "v2"),
        (3, 2, "delete", "r", "b.py", "c", "py", None),
        (4, 2, "insert", "r", "c.py", "c", "py", "v1"),
    ]), "m", 1, 2, 5)
    v2 = table.current_version()
    table.compact()
    v3 = table.current_version()

    feed01 = {(r["path"], r["change_type"]) for r in table.changes(v0, v1).collect()}
    assert feed01 == {("a.py", "insert"), ("b.py", "insert")}
    feed12 = {(r["path"], r["change_type"]) for r in table.changes(v1, v2).collect()}
    assert feed12 == {("a.py", "update"), ("b.py", "delete"), ("c.py", "insert")}
    # whole range incl. the compaction: compaction contributes nothing
    feed_all = table.changes(v0, v3)
    assert feed_all.count() == 5
    # re-delivering the same batch adds only carries -> empty feed
    merge_batch(table, batch([(2, 2, "update", "r", "a.py", "c", "py", "v2")]), "m", 9, 2, 3)
    assert table.changes(v3).count() == 0
    # a rollback in the range is a full-state replacement: no delta form
    table.rollback(v1)
    with _pytest.raises(ValueError, match="full state|rollback"):
        table.changes(v0)


def test_point_lookup_prunes_to_one_bucket(spark, tmp_path):
    """lookup() reads only the key's bucket file group and returns exactly
    the live row; a deleted or absent key returns nothing."""
    from multiversx_etl_spark.lake.table import LakeTable
    from multiversx_etl_spark.operators.merge import merge_batch
    from multiversx_etl_spark.schemas import REPOS

    def batch(rows):
        cols = "offset long, seq long, op string, repo string, path string, commit string, lang string, content string"
        return spark.createDataFrame(rows, cols)

    table = LakeTable.create(
        spark, str(tmp_path / "t"), REPOS, key_columns=["repo", "path"], num_buckets=8
    )
    rows = [(i, i, "insert", f"r{i % 5}", f"f{i}.py", "c", "py", f"v{i}") for i in range(40)]
    merge_batch(table, batch(rows), "m", 0, 0, 40)
    table.compact()
    merge_batch(table, batch([(100, 100, "delete", "r1", "f1.py", "c", "py", None)]), "m", 1, 100, 101)

    got = table.lookup(repo="r2", path="f2.py").collect()
    assert len(got) == 1 and got[0]["content"] == "v2"
    assert table.lookup(repo="r1", path="f1.py").count() == 0  # deleted
    assert table.lookup(repo="zz", path="nope").count() == 0   # absent
    import pytest as _pytest

    with _pytest.raises(ValueError, match="full key"):
        table.lookup(repo="r2")
    # plan evidence: the scan reads a strict subset of the table's files
    import io as _io
    import contextlib as _ctx

    buf = _io.StringIO()
    with _ctx.redirect_stdout(buf):
        table.lookup(repo="r2", path="f2.py").explain("formatted")
    n_total = len(table.snapshot().files)
    pid_files = len(table.snapshot().files_for_pids(
        table.pids_for_buckets({0}, table.snapshot())  # any single bucket
    ))
    assert pid_files < n_total  # bucket pruning is real, not a full scan


def test_offsets_for_time_range(spark):
    """ts→offset resolver (the reference's wall-time interval planning over
    the offset-native planner): the resolved range covers exactly the
    events whose event_ts falls in the window, given bounded lateness."""
    import datetime as dt

    import pyspark.sql.functions as F

    from multiversx_etl_spark.plans.planner import offsets_for_time_range

    base = dt.datetime(2020, 7, 30, 14, 0, 0)

    def ts(s):
        return base + dt.timedelta(seconds=s)

    # arrival order with out-of-orderness bounded by 60s: (offset, ts_off)
    rows = [(0, 0), (1, 70), (2, 40), (3, 130), (4, 100), (5, 200), (6, 170)]
    log = spark.createDataFrame(
        [(o, ts(s)) for o, s in rows], "offset long, event_ts timestamp"
    )
    lo, hi = offsets_for_time_range(log, ts(40), ts(130), lateness_seconds=60)
    got = {
        r["offset"]
        for r in log.where(
            (F.col("offset") >= lo) & (F.col("offset") < hi)
            & (F.col("event_ts") >= F.lit(ts(40))) & (F.col("event_ts") < F.lit(ts(130)))
        ).collect()
    }
    want = {o for o, s in rows if 40 <= s < 130}
    assert got == want
    # window past the log's end: hi falls back to max offset + 1
    lo2, hi2 = offsets_for_time_range(log, ts(150), ts(1000), lateness_seconds=60)
    assert hi2 == 7
    # empty window before the log
    assert offsets_for_time_range(log, ts(10_000), ts(20_000)) == (0, 0)
