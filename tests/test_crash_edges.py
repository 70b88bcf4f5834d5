"""Regression tests for crash/edge bugs found in review: orphan-manifest
recovery, empty-log replay, per-stream lineage, all-carry epochs, spurious
fold arming, and exact bucket-scoped reads."""

from __future__ import annotations

import os

import pyspark.sql.functions as F
import pytest

from multiversx_etl_spark.lake.table import LakeTable, bucket_expr
from multiversx_etl_spark.operators.merge import merge_batch
from multiversx_etl_spark.schemas import CHANGE_EVENTS, REPOS
from multiversx_etl_spark.sources.changelog import generate_change_log, write_log_parquet
from multiversx_etl_spark.streaming.ingest import ensure_table, read_lineage, replay


def _mk_table(spark, tmp_path, name="t", buckets=4):
    return LakeTable.create(
        spark, str(tmp_path / name), REPOS, key_columns=["repo", "path"], num_buckets=buckets
    )


def _batch(spark, rows):
    cols = "offset long, seq long, op string, repo string, path string, commit string, lang string, content string"
    return spark.createDataFrame(rows, cols)


def test_orphan_manifest_does_not_wedge_commits(spark, tmp_path):
    """Crash between manifest create and pointer swap leaves an orphan
    vN+1 file; the retried commit must replace it, not die on O_EXCL."""
    table = _mk_table(spark, tmp_path)
    v = table.current_version()
    # simulate the crash: next version's manifest exists, pointer unmoved
    orphan = table._manifest_path(v + 1)
    with open(orphan, "w") as fh:
        fh.write(table.snapshot().to_json())
    assert table.current_version() == v
    b = _batch(spark, [(0, 0, "insert", "r", "a.py", "c", "py", "v0")])
    merge_batch(table, b, "main", 0, 0, 1)  # must not raise
    assert table.current_version() == v + 1
    assert table.read().count() == 1


def test_concurrent_same_version_commit_still_raises(spark, tmp_path):
    table = _mk_table(spark, tmp_path)
    b = _batch(spark, [(0, 0, "insert", "r", "a.py", "c", "py", "v0")])
    merge_batch(table, b, "main", 0, 0, 1)
    live = table.current_version()
    manifest = table.snapshot()
    manifest.version = live  # attempt to re-commit the LIVE version
    with pytest.raises(RuntimeError, match="concurrent"):
        table._write_manifest(manifest)


def test_replay_empty_log(spark, tmp_path):
    table = _mk_table(spark, tmp_path)
    empty = spark.createDataFrame([], CHANGE_EVENTS)
    summary = replay(empty, table, interval_size=100)
    assert summary.epochs_run == 0 and summary.rows_in == 0


def test_lineage_is_per_stream(spark, tmp_path):
    """Two streams feeding one table keep separate ledgers (same epoch ids
    must not overwrite each other)."""
    table = _mk_table(spark, tmp_path)
    log = generate_change_log(spark, 300, num_repos=5, paths_per_repo=10)
    path = str(tmp_path / "log")
    write_log_parquet(log, path, files=2)
    df = spark.read.parquet(path)
    replay(df, table, interval_size=200, stream_id="alpha")
    replay(df, table, interval_size=200, stream_id="beta")  # dedup no-ops, same epochs
    lin = read_lineage(table)
    streams = {r["stream_id"] for r in lin.select("stream_id").distinct().collect()}
    assert streams == {"alpha", "beta"}
    a = read_lineage(table, "alpha").agg(F.sum("rows_in")).collect()[0][0]
    b = read_lineage(table, "beta").agg(F.sum("rows_in")).collect()[0][0]
    assert a == b == 303  # both streams saw every arrival


def test_all_carry_epoch_keeps_ledger_and_fold_unarmed(spark, tmp_path):
    """Re-delivering applied events under a NEW epoch id must still write
    ledger rows (rows_in > 0, zero merge actions) and must not arm the
    merge-on-read fold when no delta files were added."""
    table = _mk_table(spark, tmp_path)
    b = _batch(spark, [(0, 0, "insert", "r", "a.py", "c", "py", "v0")])
    merge_batch(table, b, "main", 0, 0, 1)
    table.compact()
    assert int(table.snapshot().properties["mor_appends"]) == 0
    stats = merge_batch(table, b, "main", 7, 0, 1)  # same rows, new epoch
    assert stats.rows_in == 1
    assert (stats.rows_inserted, stats.rows_updated, stats.rows_deleted) == (0, 0, 0)
    assert stats.per_bucket and stats.per_bucket[0]["rows_in"] == 1
    assert int(table.snapshot().properties["mor_appends"]) == 0  # not armed
    assert table.is_epoch_committed("main", 7)


def test_bucket_scoped_read_is_exact(spark, tmp_path):
    """read(buckets={k}) must return ONLY bucket k's rows even when another
    bucket collides into the same pid file group."""
    table = _mk_table(spark, tmp_path, buckets=4)
    rows = [
        (i, i, "insert", f"repo-{i}", f"f{i}.py", "c", "py", f"v{i}") for i in range(40)
    ]
    merge_batch(table, _batch(spark, rows), "main", 0, 0, 40)
    m = table.snapshot()
    for k in range(m.num_buckets):
        got = table.read(buckets={k})
        bad = got.where(bucket_expr(m.key_columns, m.num_buckets) != k).count()
        assert bad == 0, f"bucket {k}: {bad} foreign rows"
    total = sum(table.read(buckets={k}).count() for k in range(m.num_buckets))
    assert total == table.read().count() == 40


def test_inflight_commit_not_lost_to_orphan_reclaim(spark, tmp_path):
    """The ADVICE race: writer A holds the commit lock having created
    manifest vN+1 but not yet swapped _current. Writer B must BLOCK on the
    lock (not reclaim A's manifest as an orphan); once A finishes, B's
    same-version commit loses the optimistic race and raises — A's commit
    survives intact."""
    import fcntl
    import json
    import threading
    import time as _time

    table = _mk_table(spark, tmp_path)
    v = table.current_version()
    a_manifest = table.snapshot()
    a_manifest.version = v + 1
    a_manifest.operation = "writer-A"

    lock_path = os.path.join(table.root, "_manifests", "_commit.lock")
    lock_fd = os.open(lock_path, os.O_CREAT | os.O_WRONLY)
    fcntl.flock(lock_fd, fcntl.LOCK_EX)
    # writer A: inside the critical section, manifest created, pointer not yet swapped
    with open(table._manifest_path(v + 1), "w") as fh:
        fh.write(a_manifest.to_json())

    b_manifest = table.snapshot()
    b_manifest.version = v + 1
    b_manifest.operation = "writer-B"
    b_err: list[Exception] = []

    def writer_b():
        try:
            table._write_manifest(b_manifest)
        except Exception as e:  # expected: optimistic-concurrency failure
            b_err.append(e)

    t = threading.Thread(target=writer_b)
    t.start()
    _time.sleep(0.3)
    assert t.is_alive(), "writer B should be blocked on the commit lock"
    # writer A completes: swap pointer, release lock
    with open(os.path.join(table.root, "_manifests", ".cur.tmp"), "w") as fh:
        fh.write(str(v + 1))
    os.replace(
        os.path.join(table.root, "_manifests", ".cur.tmp"),
        os.path.join(table.root, "_manifests", "_current"),
    )
    fcntl.flock(lock_fd, fcntl.LOCK_UN)
    os.close(lock_fd)
    t.join(timeout=10)
    assert not t.is_alive()
    assert b_err and "concurrent" in str(b_err[0])
    with open(table._manifest_path(v + 1)) as fh:
        assert json.load(fh)["operation"] == "writer-A"  # A's commit intact


def test_bootstrap_snapshot_dedups_duplicate_keys(spark, tmp_path):
    """A snapshot export with duplicate (repo, path) rows must be pre-folded
    (max-seq winner) — duplicates in base files would otherwise persist
    until a compact, since bootstrap leaves the MOR fold unarmed."""
    from multiversx_etl_spark.streaming.ingest import bootstrap_snapshot

    table = _mk_table(spark, tmp_path)
    snap = _batch(
        spark,
        [
            (0, 1, "insert", "r", "a.py", "c1", "py", "old"),
            (1, 5, "insert", "r", "a.py", "c2", "py", "new"),
            (2, 3, "insert", "r", "b.py", "c3", "py", "only"),
        ],
    ).drop("offset", "op")
    n = bootstrap_snapshot(table, snap)
    assert n == 2
    rows = {r["path"]: r for r in table.read().collect()}
    assert set(rows) == {"a.py", "b.py"}
    assert rows["a.py"]["content"] == "new" and rows["a.py"]["seq"] == 5


def test_epoch_watermark_compacts_markers_and_resume_skips(spark, tmp_path):
    """Committed-epoch markers below the contiguous watermark are compacted
    out of the manifest (bounded commit JSON at 10^10-event epoch counts);
    a re-replay must still skip every committed epoch."""
    from multiversx_etl_spark.lake.table import _EPOCH_INFO_KEEP

    table = _mk_table(spark, tmp_path)
    log = generate_change_log(spark, 3000, num_repos=5, paths_per_repo=10)
    path = str(tmp_path / "log")
    write_log_parquet(log, path, files=2)
    df = spark.read.parquet(path)
    s1 = replay(df, table, interval_size=100)  # ~31 epochs
    assert s1.epochs_run >= 30
    st = table.snapshot().streams["main"]
    assert st["epochs_through"] == s1.epochs_run - 1
    assert len(st["epochs"]) <= _EPOCH_INFO_KEEP + 1
    assert table.is_epoch_committed("main", 0)  # below the kept window
    assert table.snapshot().epoch_info("main", 0) == {"compacted": True}
    s2 = replay(df, table, interval_size=100)
    assert s2.epochs_run == 0 and s2.epochs_skipped == s1.epochs_run


def test_crash_mid_compact_is_safe(spark, tmp_path):
    """A compact that writes its folded files but dies before the commit
    must leave the table untouched (previous snapshot current, reads
    identical); the leftover files are orphans for gc_orphan_files."""
    import time as _time

    from multiversx_etl_spark.lake.table import bucket_expr as _be

    table = _mk_table(spark, tmp_path)
    b = _batch(spark, [(i, i, "insert", f"r{i}", "a.py", "c", "py", f"v{i}") for i in range(10)])
    merge_batch(table, b, "main", 0, 0, 10)
    v = table.current_version()
    before = table.read().orderBy("repo", "path").collect()

    # simulate the crash: the fold write happens, the commit never does
    m = table.snapshot()
    folded = table.read(include_tombstones=True).withColumn(
        "_bucket", _be(m.key_columns, m.num_buckets)
    )
    table.write_data_files(folded, "compact-crashed")

    assert table.current_version() == v  # nothing committed
    assert table.read().orderBy("repo", "path").collect() == before
    # the leftovers are invisible orphans; GC reclaims them after the window
    stale = _time.time() - 7200
    crashed_dir = os.path.join(table.root, "data", "compact-crashed")
    for name in os.listdir(crashed_dir):
        os.utime(os.path.join(crashed_dir, name), (stale, stale))
    out = table.gc_orphan_files(min_age_seconds=3600)
    assert out["deleted"] > 0
    assert not os.path.exists(crashed_dir)
    assert table.read().orderBy("repo", "path").collect() == before
    # and a real compact afterwards still works
    table.compact()
    assert table.read().orderBy("repo", "path").collect() == before


def test_concurrent_stream_commit_retries_and_merges_both(spark, tmp_path):
    """Two streams into one table: if stream B commits while stream A's
    MERGE is in flight, A's commit loses the optimistic race and must be
    retried against the NEW snapshot — the final state contains both
    writers' rows and both epoch markers."""
    from unittest import mock

    from multiversx_etl_spark.operators import merge as merge_mod
    from multiversx_etl_spark.streaming.ingest import apply_epoch

    table = _mk_table(spark, tmp_path)
    a_batch = _batch(spark, [(0, 1, "insert", "rA", "a.py", "c", "py", "from-A")])
    b_batch = _batch(spark, [(0, 1, "insert", "rB", "b.py", "c", "py", "from-B")])

    real_merge = merge_mod.merge_batch
    fired = {"done": False}

    def racing_merge(t, changes, stream_id, *args, **kwargs):
        # first entry of stream A: let stream B commit mid-flight, exactly
        # between A's snapshot read and A's commit
        if stream_id == "A" and not fired["done"]:
            fired["done"] = True
            pre = kwargs.get("pre_commit")

            def pre_with_race(stats):
                real_merge(table, b_batch, "B", 0, 0, 1)  # B sneaks in
                if pre:
                    pre(stats)

            kwargs["pre_commit"] = pre_with_race
        return real_merge(t, changes, stream_id, *args, **kwargs)

    with mock.patch.object(merge_mod, "merge_batch", racing_merge), mock.patch(
        "multiversx_etl_spark.streaming.ingest.merge_batch", racing_merge
    ):
        apply_epoch(table, a_batch, "A", 0, 0, 1)

    rows = {r["repo"]: r["content"] for r in table.read().collect()}
    assert rows == {"rA": "from-A", "rB": "from-B"}
    assert table.is_epoch_committed("A", 0) and table.is_epoch_committed("B", 0)

    # without retries the same race is fail-stop
    fired["done"] = False
    a2 = _batch(spark, [(1, 2, "insert", "rA", "a2.py", "c", "py", "v")])
    with mock.patch.object(merge_mod, "merge_batch", racing_merge), mock.patch(
        "multiversx_etl_spark.streaming.ingest.merge_batch", racing_merge
    ):
        import pytest as _pytest

        with _pytest.raises(RuntimeError, match="concurrent"):
            apply_epoch(table, a2, "A", 1, 1, 2, conflict_retries=0)


def test_same_epoch_rival_commit_is_noop_and_preserves_data(spark, tmp_path):
    """Two workers racing the SAME (stream, epoch): the loser's retry must
    notice the marker and no-op — and must never overwrite the data files
    the winner's manifest references (the round-2 review finding: a retry
    writing the same tag dir would delete committed data)."""
    from unittest import mock

    from multiversx_etl_spark.operators import merge as merge_mod
    from multiversx_etl_spark.streaming.ingest import apply_epoch

    table = _mk_table(spark, tmp_path)
    batch_a = _batch(spark, [(0, 1, "insert", "r", "a.py", "c", "py", "winner")])

    real_merge = merge_mod.merge_batch
    fired = {"done": False}

    def racing_merge(t, changes, stream_id, *args, **kwargs):
        if not fired["done"]:
            fired["done"] = True
            pre = kwargs.get("pre_commit")

            def pre_with_rival(stats):
                # the rival worker commits THE SAME (stream, epoch) first
                real_merge(table, batch_a, "A", 0, 0, 1)
                if pre:
                    pre(stats)

            kwargs["pre_commit"] = pre_with_rival
        return real_merge(t, changes, stream_id, *args, **kwargs)

    with mock.patch.object(merge_mod, "merge_batch", racing_merge), mock.patch(
        "multiversx_etl_spark.streaming.ingest.merge_batch", racing_merge
    ):
        stats = apply_epoch(table, batch_a, "A", 0, 0, 1)

    assert stats.rows_in == 0  # loser no-opped on the marker
    assert table.is_epoch_committed("A", 0)
    rows = table.read().collect()  # winner's committed files intact & readable
    assert len(rows) == 1 and rows[0]["content"] == "winner"


def test_ensure_table_tolerates_lost_creation_race(spark, tmp_path, monkeypatch):
    """Two workers race the FIRST creation of a table: the loser's
    exists() probe reads False, then its create() loses the v0 commit CAS
    ('manifest v0 already live'). ensure_table must OPEN the winner's
    table instead of dying — otherwise one of two concurrently started
    ingest workers crashes at startup."""
    root = str(tmp_path / "race")
    winner = ensure_table(spark, root, num_buckets=4)
    orig = LakeTable.exists
    calls = {"n": 0}

    def toctou_exists(r):
        calls["n"] += 1
        return False if calls["n"] == 1 else orig(r)

    monkeypatch.setattr(LakeTable, "exists", toctou_exists)
    loser = ensure_table(spark, root, num_buckets=8)
    assert loser.current_version() == winner.current_version()
    # the loser adopted the WINNER's physical spec — its own knobs are
    # new-table-only and must not have landed anywhere
    assert loser.snapshot().num_buckets == 4


def test_promote_into_tolerates_lost_creation_race(spark, tmp_path, monkeypatch):
    """Same TOCTOU for the promotion path: two promoters racing the first
    creation of MAIN must both promote (second one replaces), not die on
    the v0 conflict."""
    stg = _mk_table(spark, tmp_path, "stg")
    merge_batch(stg, _batch(spark, [(0, 0, "insert", "r", "a.py", "c", "py", "v0")]),
                "main", 0, 0, 1)
    main_root = str(tmp_path / "main")
    LakeTable.promote_into(spark, main_root, stg)  # winner's promotion
    orig = LakeTable.exists
    calls = {"n": 0}

    def toctou_exists(r):
        calls["n"] += 1
        return False if calls["n"] == 1 else orig(r)

    monkeypatch.setattr(LakeTable, "exists", toctou_exists)
    m = LakeTable.promote_into(spark, main_root, stg)  # loser's promotion
    assert m.operation == "promote"
    assert LakeTable(spark, main_root).read().count() == 1
