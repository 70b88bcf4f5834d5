"""Partial-image (op='patch') CDC events: Debezium-style updates that carry
only the changed columns (NULL payload = keep the stored value), folded with
COLUMN-level last-writer-wins. Verified against an independent DuckDB
per-column fold of the raw log, across batch replay, redelivery, compaction,
the streaming face, and replication."""

from __future__ import annotations

import duckdb
import pyspark.sql.functions as F
import pytest

from multiversx_etl_spark.sources.changelog import generate_change_log, write_log_parquet
from multiversx_etl_spark.streaming.ingest import ensure_table, replay, stream_ingest

N_EVENTS = 3000


@pytest.fixture(scope="module")
def patch_log(spark, tmp_path_factory):
    path = str(tmp_path_factory.mktemp("patchlog") / "log")
    log = generate_change_log(
        spark, N_EVENTS, num_repos=20, paths_per_repo=25, patch_fraction=0.5
    )
    write_log_parquet(log, path, files=8)
    return path


def oracle_state(log_path: str):
    """Independent DuckDB per-column LWW fold: full images set every column
    at their seq (NULLs included), patches set only their non-null columns,
    liveness comes from the full-image winner alone."""
    con = duckdb.connect()
    rows = con.execute(
        f"""
        WITH ev AS (SELECT * FROM read_parquet('{log_path}/*.parquet')),
        agg AS (
          SELECT repo, path,
            max(CASE WHEN op <> 'patch'
                THEN {{'seq': seq, 'op': op}} END) AS b,
            max(CASE WHEN op <> 'patch' OR "commit" IS NOT NULL
                THEN {{'seq': seq, 'v': "commit"}} END) AS c_commit,
            max(CASE WHEN op <> 'patch' OR lang IS NOT NULL
                THEN {{'seq': seq, 'v': lang}} END) AS c_lang,
            max(CASE WHEN op <> 'patch' OR content IS NOT NULL
                THEN {{'seq': seq, 'v': content}} END) AS c_content
          FROM ev GROUP BY 1, 2
        )
        SELECT repo, path,
               greatest(b.seq, c_commit.seq, c_lang.seq, c_content.seq) AS seq,
               c_commit.v AS commit, c_lang.v AS lang, c_content.v AS content
        FROM agg WHERE b IS NOT NULL AND b.op <> 'delete'
        ORDER BY repo, path
        """
    ).fetchall()
    con.close()
    return {(r[0], r[1]): r[2:] for r in rows}


def table_state(table):
    return {
        (r["repo"], r["path"]): (r["seq"], r["commit"], r["lang"], r["content"])
        for r in table.read().select(
            "repo", "path", "seq", "commit", "lang", "content"
        ).collect()
    }


def test_patch_replay_matches_per_column_oracle(spark, patch_log, tmp_path):
    log = spark.read.parquet(patch_log)
    table = ensure_table(spark, str(tmp_path / "t"), num_buckets=8)
    s = replay(log, table, interval_size=600, mode="mor")
    assert sum(st.rows_patched for st in s.stats) > 0
    assert int(table.snapshot().properties["patch_deltas"]) > 0
    assert table_state(table) == oracle_state(patch_log)
    # patch generations really are stored as partial rows (NULL = keep)
    raw = table.read(raw=True, with_action=True)
    patch_gens = raw.where(F.col("_action") == "patch")
    assert patch_gens.count() > 0
    assert patch_gens.where(
        F.col("content").isNull() | F.col("lang").isNull()
    ).count() > 0


def test_patch_epoching_invariance_and_idempotence(spark, patch_log, tmp_path):
    log = spark.read.parquet(patch_log)
    t_many = ensure_table(spark, str(tmp_path / "m"), num_buckets=8)
    t_one = ensure_table(spark, str(tmp_path / "o"), num_buckets=8)
    replay(log, t_many, interval_size=300, mode="mor")
    replay(log, t_one, interval_size=10**9, mode="mor")
    assert table_state(t_many) == table_state(t_one) == oracle_state(patch_log)
    # full re-replay: every epoch short-circuits on its marker, state fixed
    before = t_many.current_version()
    s = replay(log, t_many, interval_size=300, mode="mor")
    assert s.epochs_run == 0 and s.epochs_skipped > 0
    assert t_many.current_version() == before


def test_patch_compact_finalizes(spark, patch_log, tmp_path):
    log = spark.read.parquet(patch_log)
    table = ensure_table(spark, str(tmp_path / "t"), num_buckets=8)
    replay(log, table, interval_size=600, mode="mor")
    want = oracle_state(patch_log)
    table.compact()
    m = table.snapshot()
    assert int(m.properties["patch_deltas"]) == 0
    assert int(m.properties["mor_appends"]) == 0
    assert table_state(table) == want
    assert "_action" not in table.read().columns
    # periodic compaction mid-replay agrees too (pairs never straddle the
    # even epoch boundaries, so the finalization contract holds)
    t2 = ensure_table(spark, str(tmp_path / "t2"), num_buckets=8)
    replay(log, t2, interval_size=600, mode="mor", compact_every=2)
    assert table_state(t2) == want


def test_patch_preserving_compaction_exact_under_lateness(spark, tmp_path):
    """compact(preserve_patches=True) keeps contested patch generations:
    a full image arriving LATER than an already-compacted patch still
    folds per-column exactly (the finalizing default would coarsen the
    row seq to the patch's and carry the late update)."""
    from multiversx_etl_spark.schemas import CHANGE_EVENTS
    from multiversx_etl_spark.streaming.ingest import apply_epoch

    table = ensure_table(spark, str(tmp_path / "t"), num_buckets=4)
    e0 = [
        (0, 0, "insert", "r1", "p1", "c0", "python", "body0", None),
        (1, 5, "patch", "r1", "p1", None, "go", None, None),
    ]
    apply_epoch(table, spark.createDataFrame(e0, CHANGE_EVENTS), "main", 0, 0, 2)
    m = table.compact(preserve_patches=True)
    assert int(m.properties["patch_deltas"]) == 1  # contested patch kept
    # late full image BETWEEN the base and the preserved patch
    e1 = [(2, 3, "update", "r1", "p1", "c3", "rust", "body3", None)]
    apply_epoch(table, spark.createDataFrame(e1, CHANGE_EVENTS), "main", 1, 2, 3)
    r = table.read().collect()[0]
    assert (r["lang"], r["content"], r["commit"], r["seq"]) == ("go", "body3", "c3", 5)
    # finalizing compact now absorbs everything; state unchanged
    table.compact()
    r2 = table.read().collect()[0]
    assert (r2["lang"], r2["content"], r2["commit"]) == ("go", "body3", "c3")


def test_patch_preserving_compaction_roundtrip(spark, patch_log, tmp_path):
    """Preserve-mode compaction over the generated mix: state identical to
    the oracle before and after, and the preserved debt is exactly the
    contested patches (superseded ones folded away)."""
    log = spark.read.parquet(patch_log)
    table = ensure_table(spark, str(tmp_path / "t"), num_buckets=8)
    replay(log, table, interval_size=600, mode="mor")
    want = oracle_state(patch_log)
    before = int(table.snapshot().properties["patch_deltas"])
    m = table.compact(preserve_patches=True)
    kept = int(m.properties["patch_deltas"])
    assert 0 < kept <= before
    assert table_state(table) == want
    # preserved files are deltas: a later finalizing compact clears them
    table.compact()
    assert int(table.snapshot().properties["patch_deltas"]) == 0
    assert table_state(table) == want


def test_patch_requires_mor(spark, patch_log, tmp_path):
    log = spark.read.parquet(patch_log)
    table = ensure_table(spark, str(tmp_path / "t"), num_buckets=8)
    with pytest.raises(ValueError, match="mor"):
        replay(log, table, interval_size=600, mode="cow")
    # and a cow merge over OUTSTANDING patch generations is refused too
    replay(log, table, interval_size=600, mode="mor", max_epochs=2)
    full_only = log.where(F.col("op") != "patch")
    with pytest.raises(ValueError, match="compact"):
        replay(full_only, table, interval_size=600, mode="cow")
    table.compact()  # finalization clears the debt; cow is legal again
    replay(full_only, table, interval_size=600, mode="cow")


def test_patch_streaming_face(spark, patch_log, tmp_path):
    table = ensure_table(spark, str(tmp_path / "t"), num_buckets=8)
    stream_ingest(spark, patch_log, table, str(tmp_path / "ckpt"),
                  max_files_per_trigger=3)
    assert table_state(table) == oracle_state(patch_log)


def test_patch_replication_chain(spark, patch_log, tmp_path):
    from multiversx_etl_spark.streaming.replicate import replicate_changes

    log = spark.read.parquet(patch_log)
    src = ensure_table(spark, str(tmp_path / "src"), num_buckets=8)
    dst = ensure_table(spark, str(tmp_path / "dst"), num_buckets=8)
    for k in range(3):
        replay(log, src, interval_size=1000, mode="mor",
               max_epochs=1 + k)  # advance one epoch per round
        replicate_changes(src, dst)
    assert table_state(dst) == table_state(src) == oracle_state(patch_log)


def test_patch_rebucket_finalizes(spark, patch_log, tmp_path):
    """rebucket() with patch generations outstanding folds them exactly
    like compact (same finalization contract) and the new layout carries
    zero patch debt."""
    log = spark.read.parquet(patch_log)
    table = ensure_table(spark, str(tmp_path / "t"), num_buckets=4)
    replay(log, table, interval_size=600, mode="mor")
    want = oracle_state(patch_log)
    assert int(table.snapshot().properties["patch_deltas"]) > 0
    m = table.rebucket(16)
    assert int(m.properties["patch_deltas"]) == 0
    assert table_state(table) == want


def test_patch_orphan_is_noop(spark, tmp_path):
    """Patches never create rows: a patch to a key with no full image is
    dropped (and a later full image for OTHER keys doesn't resurrect it)."""
    from multiversx_etl_spark.schemas import CHANGE_EVENTS

    rows = [
        (0, 0, "insert", "r1", "p1", "c0", "python", "body0", None),
        (1, 5, "patch", "r1", "p2", None, "go", None, None),  # orphan key
        (2, 7, "patch", "r1", "p1", None, "rust", None, None),
    ]
    log = spark.createDataFrame(rows, CHANGE_EVENTS)
    table = ensure_table(spark, str(tmp_path / "t"), num_buckets=4)
    replay(log, table, interval_size=10, total_offsets=3, mode="mor")
    got = {
        (r["repo"], r["path"]): (r["lang"], r["content"], r["seq"])
        for r in table.read().collect()
    }
    assert got == {("r1", "p1"): ("rust", "body0", 7)}
    table.compact()
    got2 = {
        (r["repo"], r["path"]): (r["lang"], r["content"], r["seq"])
        for r in table.read().collect()
    }
    assert got2 == got


def test_patch_with_schema_evolution(spark, tmp_path):
    """A patch event can CARRY a brand-new column: the schema evolves in
    the same atomic commit and the new column patches in per-column — old
    full images read it as NULL, the patch sets it, a later full image
    without the column resets it to NULL (full images set every column)."""
    from multiversx_etl_spark.schemas import CHANGE_EVENTS
    from pyspark.sql.types import StringType, StructField, StructType

    base_rows = [
        (0, 0, "insert", "r1", "p1", "c0", "python", "body0", None),
        (1, 1, "insert", "r1", "p2", "c1", "go", "body1", None),
    ]
    log1 = spark.createDataFrame(base_rows, CHANGE_EVENTS)
    table = ensure_table(spark, str(tmp_path / "t"), num_buckets=4)
    replay(log1, table, interval_size=10, total_offsets=2, mode="mor")

    evolved = StructType(list(CHANGE_EVENTS.fields) + [StructField("stars", StringType(), True)])
    rows2 = [
        (2, 4, "patch", "r1", "p1", None, None, None, None, "5"),   # new col via patch
        (3, 6, "update", "r1", "p2", "c6", "rust", "body6", None, None),
    ]
    log2 = spark.createDataFrame(rows2, evolved)
    from multiversx_etl_spark.streaming.ingest import apply_epoch

    apply_epoch(table, log2, "main", 1, offset_lo=2, offset_hi=4)
    got = {
        (r["repo"], r["path"]): (r["lang"], r["content"], r["stars"], r["seq"])
        for r in table.read().collect()
    }
    assert got == {
        ("r1", "p1"): ("python", "body0", "5", 4),
        ("r1", "p2"): ("rust", "body6", None, 6),
    }
    table.compact()
    got2 = {
        (r["repo"], r["path"]): (r["lang"], r["content"], r["stars"], r["seq"])
        for r in table.read().collect()
    }
    assert got2 == got


def test_patch_delete_interplay(spark, tmp_path):
    """Patches don't resurrect deleted keys; a full re-insert after the
    delete resets columns, later patches re-apply."""
    from multiversx_etl_spark.schemas import CHANGE_EVENTS

    rows = [
        (0, 0, "insert", "r1", "p1", "c0", "python", "body0", None),
        (1, 2, "patch", "r1", "p1", None, "go", None, None),
        (2, 4, "delete", "r1", "p1", None, None, None, None),
        (3, 3, "patch", "r1", "p1", None, "c", None, None),  # late, dead: moot
        (4, 6, "insert", "r1", "p1", "c6", "rust", "body6", None),
        (5, 8, "patch", "r1", "p1", None, None, "body8", None),
    ]
    log = spark.createDataFrame(rows, CHANGE_EVENTS)
    table = ensure_table(spark, str(tmp_path / "t"), num_buckets=4)
    replay(log, table, interval_size=100, total_offsets=6, mode="mor")
    got = table.read().collect()
    assert len(got) == 1
    r = got[0]
    assert (r["lang"], r["content"], r["commit"], r["seq"]) == (
        "rust", "body8", "c6", 8
    )


def test_preserving_compaction_keeps_orphans(spark, tmp_path):
    """Arbitrary lateness, the hard case: a patch arrives BEFORE its key's
    first full image, a preserve-mode compaction runs in between, and the
    base lands only afterwards — the patch generation must survive the
    rewrite and apply."""
    from multiversx_etl_spark.schemas import CHANGE_EVENTS
    from multiversx_etl_spark.streaming.ingest import apply_epoch

    table = ensure_table(spark, str(tmp_path / "t"), num_buckets=4)
    e0 = [
        (0, 9, "patch", "r1", "p1", None, "go", None, None),   # orphan
        (1, 0, "insert", "r1", "p2", "c0", "python", "body0", None),
    ]
    apply_epoch(table, spark.createDataFrame(e0, CHANGE_EVENTS), "main", 0, 0, 2)
    m = table.compact(preserve_patches=True)
    assert int(m.properties["patch_deltas"]) == 1  # the orphan survived
    assert {r["path"] for r in table.read().collect()} == {"p2"}  # still hidden
    e1 = [(2, 5, "insert", "r1", "p1", "c5", "rust", "body5", None)]
    apply_epoch(table, spark.createDataFrame(e1, CHANGE_EVENTS), "main", 1, 2, 3)
    got = {r["path"]: (r["lang"], r["content"], r["seq"]) for r in table.read().collect()}
    assert got["p1"] == ("go", "body5", 9)  # late base + preserved patch


def test_patch_rebucket_preserve_mode(spark, tmp_path):
    """rebucket(preserve_patches=True): the layout changes, contested
    patch generations survive under the new layout, and a late full image
    still folds per-column exactly."""
    from multiversx_etl_spark.schemas import CHANGE_EVENTS
    from multiversx_etl_spark.streaming.ingest import apply_epoch

    table = ensure_table(spark, str(tmp_path / "t"), num_buckets=4)
    e0 = [
        (0, 0, "insert", "r1", "p1", "c0", "python", "body0", None),
        (1, 5, "patch", "r1", "p1", None, "go", None, None),
    ]
    apply_epoch(table, spark.createDataFrame(e0, CHANGE_EVENTS), "main", 0, 0, 2)
    m = table.rebucket(16, preserve_patches=True)
    assert m.num_buckets == 16
    assert int(m.properties["patch_deltas"]) == 1
    e1 = [(2, 3, "update", "r1", "p1", "c3", "rust", "body3", None)]
    apply_epoch(table, spark.createDataFrame(e1, CHANGE_EVENTS), "main", 1, 2, 3)
    r = table.read().collect()[0]
    assert (r["lang"], r["content"], r["commit"], r["seq"]) == ("go", "body3", "c3", 5)
    # lookup prunes with the new layout and finds the folded row
    got = table.lookup(repo="r1", path="p1").collect()
    assert len(got) == 1 and got[0]["lang"] == "go"
