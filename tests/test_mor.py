"""Merge-on-read mode: delta appends, read-time fold, compaction, and
cow/mor equivalence (both modes must produce identical final state)."""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from multiversx_etl_spark.sources.changelog import generate_change_log, write_log_parquet
from multiversx_etl_spark.streaming.ingest import ensure_table, replay


@pytest.fixture(scope="module")
def mor_log(spark, tmp_path_factory):
    path = str(tmp_path_factory.mktemp("morlog") / "log")
    log = generate_change_log(spark, 2000, num_repos=20, paths_per_repo=25)
    write_log_parquet(log, path, files=8)
    return path


def _state(table):
    return {
        (r["repo"], r["path"], r["s"])
        for r in table.read()
        .select("repo", "path", F.sha2(F.coalesce("content", F.lit("")), 256).alias("s"))
        .collect()
    }


def test_mor_equals_cow(spark, mor_log, tmp_path):
    log = spark.read.parquet(mor_log)
    t_mor = ensure_table(spark, str(tmp_path / "mor"), num_buckets=8)
    t_cow = ensure_table(spark, str(tmp_path / "cow"), num_buckets=8)
    s_mor = replay(log, t_mor, interval_size=400, mode="mor")
    s_cow = replay(log, t_cow, interval_size=400, mode="cow")
    assert _state(t_mor) == _state(t_cow)
    # merge stats agree too (same classification, different physical plan)
    assert (s_mor.rows_inserted, s_mor.rows_updated, s_mor.rows_deleted) == (
        s_cow.rows_inserted, s_cow.rows_updated, s_cow.rows_deleted
    )


def test_mor_appends_only(spark, mor_log, tmp_path):
    """MOR epochs never remove files (append-only); file count grows, and
    the mor_appends counter tracks outstanding deltas."""
    log = spark.read.parquet(mor_log)
    table = ensure_table(spark, str(tmp_path / "t"), num_buckets=8)
    seen = []
    replay(log, table, interval_size=400, mode="mor",
           on_epoch=lambda e, s: seen.append(len(table.snapshot().files)))
    assert seen == sorted(seen)  # monotone non-decreasing
    # the counter tracks epochs that actually ADDED delta files (an
    # all-carry epoch, e.g. the duplicate tail, does not arm the fold)
    grew = sum(1 for a, b in zip([0] + seen, seen) if b > a)
    assert int(table.snapshot().properties["mor_appends"]) == grew >= 1


def test_compaction_preserves_state_and_resets_fold(spark, mor_log, tmp_path):
    log = spark.read.parquet(mor_log)
    table = ensure_table(spark, str(tmp_path / "t"), num_buckets=8)
    replay(log, table, interval_size=400, mode="mor")
    before = _state(table)
    files_before = len(table.snapshot().files)
    table.compact()
    m = table.snapshot()
    assert int(m.properties["mor_appends"]) == 0
    assert len(m.files) <= files_before
    assert _state(table) == before
    # tombstones survive compaction (late lower-seq updates must not resurrect)
    raw = table.read(raw=True)
    assert raw.where(F.col("deleted")).count() > 0


def test_periodic_compaction_during_replay(spark, mor_log, tmp_path):
    log = spark.read.parquet(mor_log)
    t_a = ensure_table(spark, str(tmp_path / "a"), num_buckets=8)
    t_b = ensure_table(spark, str(tmp_path / "b"), num_buckets=8)
    replay(log, t_a, interval_size=400, mode="mor", compact_every=2)
    replay(log, t_b, interval_size=400, mode="mor")
    assert _state(t_a) == _state(t_b)
    assert len(t_a.snapshot().files) <= len(t_b.snapshot().files)


def test_merge_after_compaction_continues(spark, mor_log, tmp_path):
    """Compaction mid-stream must not disturb the seq guard: replay half,
    compact, replay the rest — state identical to uninterrupted replay."""
    log = spark.read.parquet(mor_log)
    t_a = ensure_table(spark, str(tmp_path / "a"), num_buckets=8)
    replay(log, t_a, interval_size=400, mode="mor", max_epochs=3)
    t_a.compact()
    replay(log, t_a, interval_size=400, mode="mor")
    t_b = ensure_table(spark, str(tmp_path / "b"), num_buckets=8)
    replay(log, t_b, interval_size=400, mode="mor")
    assert _state(t_a) == _state(t_b)


def test_map_side_combine_equivalent(spark, mor_log, tmp_path):
    log = spark.read.parquet(mor_log)
    from multiversx_etl_spark.operators.merge import merge_batch
    import pyspark.sql.functions as FF

    t_a = ensure_table(spark, str(tmp_path / "a"), num_buckets=8)
    t_b = ensure_table(spark, str(tmp_path / "b"), num_buckets=8)
    for e, lo in enumerate(range(0, 2100, 700)):
        batch = log.where((FF.col("offset") >= lo) & (FF.col("offset") < lo + 700))
        merge_batch(t_a, batch, "m", e, lo, lo + 700, map_side_combine=True)
        merge_batch(t_b, batch, "m", e, lo, lo + 700)
    assert _state(t_a) == _state(t_b)
