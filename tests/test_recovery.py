"""Recovery operators: errata-tolerant counts checks (reference
worker_config.py:93-104 + checks.py:56-93) and the find-latest-good
checkpoint search (reference app.py:115-143)."""

from __future__ import annotations

import os

import pytest

from multiversx_etl_spark.lake.table import LakeTable
from multiversx_etl_spark.operators.checks import (
    CountsMismatchError,
    check_counts,
    find_latest_good_version,
    reconcile,
)
from multiversx_etl_spark.oracle import expected_state
from multiversx_etl_spark.schemas import REPOS
from multiversx_etl_spark.sources.changelog import generate_change_log, write_log_parquet
from multiversx_etl_spark.streaming.ingest import replay


def _mk_table(spark, tmp_path, buckets=4):
    return LakeTable.create(
        spark, str(tmp_path / "t"), REPOS, key_columns=["repo", "path"], num_buckets=buckets
    )


def test_check_counts_errata_accepts_known_drift():
    """The reference's mainnet config carries signed per-table errata like
    {"miniblocks": -53193, "accountshistory": 143}: delta + erratum == 0
    passes, anything else still raises."""
    expected = {"blocks": 1000, "miniblocks": 500, "events": 10}
    actual = {"blocks": 1013, "miniblocks": 500 - 143, "events": 10}
    deltas = check_counts(
        expected, actual, errata={"blocks": 13, "miniblocks": -143}
    )
    assert deltas == {"blocks": 0, "miniblocks": 0, "events": 0}


def test_check_counts_mismatched_delta_still_raises():
    with pytest.raises(CountsMismatchError, match="missing data"):
        check_counts({"blocks": 100}, {"blocks": 90}, errata={"blocks": 5})
    with pytest.raises(CountsMismatchError, match="duplicates"):
        check_counts({"blocks": 100}, {"blocks": 90}, errata={"blocks": -15})
    # no errata at all: plain mismatch raises
    with pytest.raises(CountsMismatchError):
        check_counts({"blocks": 100}, {"blocks": 99})


def test_reconcile_erratum(spark, tmp_path):
    """A table with known accepted drift (rows the sink legitimately lacks)
    reconciles clean under the matching erratum and fails otherwise."""
    table = _mk_table(spark, tmp_path)
    log = generate_change_log(spark, 400, num_repos=5, paths_per_repo=10)
    path = str(tmp_path / "log")
    write_log_parquet(log, path, files=2)
    df = spark.read.parquet(path)
    replay(df, table, interval_size=500)
    # drift: expect 3 rows the table never had
    extra = spark.createDataFrame(
        [("ghost", f"g{i}.py", 0, "c", "py", f"v{i}") for i in range(3)],
        "repo string, path string, seq long, commit string, lang string, content string",
    )
    expected = expected_state(df).unionByName(extra, allowMissingColumns=True)
    assert not reconcile(table, expected).ok
    assert reconcile(table, expected, erratum=-3).ok  # known drift accepted
    assert not reconcile(table, expected, erratum=-2).ok  # wrong erratum


def test_find_latest_good_walks_past_corruption(spark, tmp_path):
    """Truncate a delta file of the NEWEST epoch: the search must skip the
    corrupted head version(s) and land on the last snapshot whose files are
    intact and consistent with the log fold, then roll back to it."""
    table = _mk_table(spark, tmp_path)
    log = generate_change_log(spark, 1200, num_repos=6, paths_per_repo=12)
    path = str(tmp_path / "log")
    write_log_parquet(log, path, files=2)
    df = spark.read.parquet(path)
    replay(df, table, interval_size=300)  # 4+ epochs -> one version per epoch
    head = table.current_version()

    # corrupt: truncate a data file introduced by the newest file-adding
    # commit — every snapshot from that version to head carries it
    v_add, new_files = None, []
    for v in range(head, 0, -1):
        added = sorted(
            {f["path"] for f in table.snapshot(v).files}
            - {f["path"] for f in table.snapshot(v - 1).files}
        )
        if added:
            v_add, new_files = v, added
            break
    assert v_add is not None, "no commit added files"
    victim = os.path.join(table.root, new_files[0])
    with open(victim, "r+b") as fh:
        fh.truncate(10)  # parquet footer gone

    good = find_latest_good_version(table, df, rollback=True)
    assert good == v_add - 1  # newest snapshot without the corrupt file
    # rolled back: current snapshot excludes the corrupt file and reads clean
    cur = table.snapshot()
    assert new_files[0] not in {f["path"] for f in cur.files}
    assert table.read().count() > 0


def test_find_latest_good_on_healthy_table_is_head(spark, tmp_path):
    table = _mk_table(spark, tmp_path)
    log = generate_change_log(spark, 400, num_repos=5, paths_per_repo=10)
    path = str(tmp_path / "log")
    write_log_parquet(log, path, files=2)
    df = spark.read.parquet(path)
    replay(df, table, interval_size=200)
    head = table.current_version()
    assert find_latest_good_version(table, df) == head
    assert table.current_version() == head  # no rollback needed


def test_find_latest_good_normalized_table(spark, tmp_path):
    """The recovery walk must fold the log through the SAME normalizer the
    ingest ran: this log's content carries CRLF + trailing whitespace (not
    a normalization fixed point), so a raw-log fold would sha-mismatch
    every snapshot of a perfectly healthy table."""
    from multiversx_etl_spark.schemas import CHANGE_EVENTS

    table = _mk_table(spark, tmp_path)
    rows = [
        (0, 0, "insert", "r1", "p1", "c0", "py", "line one\r\nline two   \n", None),
        (1, 1, "insert", "r1", "p2", "c1", "py", "plain body", None),
        (2, 2, "update", "r1", "p1", "c2", "py", "edit\r\nagain\t\n", None),
    ]
    df = spark.createDataFrame(rows, CHANGE_EVENTS)
    replay(df, table, interval_size=10, total_offsets=3)
    head = table.current_version()
    assert find_latest_good_version(table, df) == head


def test_planner_rejects_misaligned_start(spark):
    from multiversx_etl_spark.plans.planner import plan_offset_ranges

    with pytest.raises(ValueError, match="multiple"):
        plan_offset_ranges(10_000, 1000, start_offset=5500)
    assert plan_offset_ranges(4000, 1000, start_offset=2000)[0].epoch_id == 2


def test_epoch_status_rejects_wrong_interval(spark, tmp_path):
    from multiversx_etl_spark.plans.status import epoch_status

    table = _mk_table(spark, tmp_path)
    log = generate_change_log(spark, 400, num_repos=5, paths_per_repo=10)
    path = str(tmp_path / "log")
    write_log_parquet(log, path, files=2)
    replay(spark.read.parquet(path), table, interval_size=200)
    with pytest.raises(ValueError, match="does not match"):
        epoch_status(table, 404, 100)
    assert epoch_status(table, 404, 200).count() > 0


def test_content_sha_null_vs_empty(spark, tmp_path):
    """A bug that turns NULL content into '' (or back) must fail reconcile,
    not hash identically."""
    from multiversx_etl_spark.operators.checks import content_sha

    df = spark.createDataFrame([("a", None), ("b", "")], "k string, content string")
    shas = {r["k"]: r["content_sha"] for r in content_sha(df).collect()}
    assert shas["a"] != shas["b"]
