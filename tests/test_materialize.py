"""Incrementally-maintained aggregate views (streaming/materialize.py):
every refresh must leave the view exactly equal to a from-scratch
recompute of the same rollup at the current upstream version."""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from multiversx_etl_spark.lake.table import LakeTable
from multiversx_etl_spark.operators.merge import merge_batch
from multiversx_etl_spark.schemas import REPOS
from multiversx_etl_spark.streaming.materialize import (
    AggViewSpec,
    create_agg_view,
    refresh_agg_view,
    reseed_agg_view,
)

SPEC = AggViewSpec(dims=("lang",), sums={"seq_total": "seq"})


def _mk_src(spark, tmp_path):
    return LakeTable.create(
        spark, str(tmp_path / "src"), REPOS, key_columns=["repo", "path"], num_buckets=4
    )


def _batch(spark, rows):
    cols = (
        "offset long, seq long, op string, repo string, path string, "
        "commit string, lang string, content string"
    )
    return spark.createDataFrame(rows, cols)


def _view_state(view):
    return {
        (r["lang"], r["n_rows"], r["seq_total"]) for r in view.read().collect()
    }


def _recompute_state(src, spec=SPEC):
    return {
        (r["lang"], r["n_rows"], r["seq_total"])
        for r in spec.aggregate(src.read()).collect()
    }


def test_refresh_matches_recompute_through_cdc_epochs(spark, tmp_path):
    src = _mk_src(spark, tmp_path)
    view = create_agg_view(src, str(tmp_path / "view"), SPEC, num_buckets=4)

    # epoch 0: inserts across groups, including a NULL group key
    merge_batch(src, _batch(spark, [
        (0, 1, "insert", "r", "a.py", "c", "py", "v1"),
        (1, 1, "insert", "r", "b.py", "c", "py", "v1"),
        (2, 1, "insert", "r", "c.rs", "c", "rs", "v1"),
        (3, 1, "insert", "r", "d.txt", "c", None, "v1"),
    ]), "m", 0, 0, 4)
    s = refresh_agg_view(src, view, SPEC)
    assert s is not None
    assert _view_state(view) == _recompute_state(src)
    assert ("py", 2, 2) in _view_state(view)

    # epoch 1: value-change update (same group), dim-move update (py -> rs),
    # delete (shrinks a group), insert into the null group
    merge_batch(src, _batch(spark, [
        (4, 2, "update", "r", "a.py", "c", "py", "v2"),
        (5, 2, "update", "r", "b.py", "c", "rs", "v1"),
        (6, 2, "delete", "r", "c.rs", "c", "rs", None),
        (7, 2, "insert", "r", "e.txt", "c", None, "v1"),
    ]), "m", 1, 4, 8)
    s = refresh_agg_view(src, view, SPEC)
    assert s is not None
    assert _view_state(view) == _recompute_state(src)

    # epoch 2: delete the LAST row of a group -> the group row must vanish
    # (tombstone), not linger as a zero-count row
    merge_batch(src, _batch(spark, [
        (8, 3, "delete", "r", "a.py", "c", "py", None),
        (9, 3, "delete", "r", "b.py", "c", "rs", None),
    ]), "m", 2, 8, 10)
    refresh_agg_view(src, view, SPEC)
    assert _view_state(view) == _recompute_state(src)
    assert "py" not in {r["lang"] for r in view.read().collect()}


def test_refresh_is_exactly_once_and_incremental(spark, tmp_path):
    src = _mk_src(spark, tmp_path)
    view = create_agg_view(src, str(tmp_path / "view"), SPEC, num_buckets=4)
    merge_batch(src, _batch(spark, [
        (0, 1, "insert", "r", "a.py", "c", "py", "v1"),
    ]), "m", 0, 0, 1)
    assert refresh_agg_view(src, view, SPEC) is not None
    # up to date: no-op, twice (marker = upstream version)
    assert refresh_agg_view(src, view, SPEC) is None
    assert refresh_agg_view(src, view, SPEC) is None

    # the second refresh moves only the delta (one changed key), not the
    # whole table
    merge_batch(src, _batch(spark, [
        (1, 2, "update", "r", "a.py", "c", "py", "v2"),
    ]), "m", 1, 1, 2)
    s = refresh_agg_view(src, view, SPEC)
    assert s is not None and _view_state(view) == _recompute_state(src)


def test_compact_only_range_commits_marker(spark, tmp_path):
    src = _mk_src(spark, tmp_path)
    view = create_agg_view(src, str(tmp_path / "view"), SPEC, num_buckets=4)
    merge_batch(src, _batch(spark, [
        (0, 1, "insert", "r", "a.py", "c", "py", "v1"),
    ]), "m", 0, 0, 1)
    refresh_agg_view(src, view, SPEC)
    before = _view_state(view)
    src.compact()  # physical-only commit: version advances, no logical change
    s = refresh_agg_view(src, view, SPEC)
    assert s is not None and _view_state(view) == before
    assert refresh_agg_view(src, view, SPEC) is None  # marker advanced


def test_retention_gap_auto_reseeds(spark, tmp_path):
    src = _mk_src(spark, tmp_path)
    view = create_agg_view(src, str(tmp_path / "view"), SPEC, num_buckets=4)
    for e in range(4):
        merge_batch(src, _batch(spark, [
            (e, e + 1, "insert", "r", f"f{e}.py", "c", "py", "v1"),
        ]), "m", e, e, e + 1)
    refresh_agg_view(src, view, SPEC)
    # more epochs, then expire history past the view's cursor
    for e in range(4, 8):
        merge_batch(src, _batch(spark, [
            (e, e + 1, "insert", "r", f"f{e}.rs", "c", "rs", "v1"),
        ]), "m", e, e, e + 1)
    src.expire_snapshots(keep_last=1)
    s = refresh_agg_view(src, view, SPEC)
    assert s is not None and s.reseeded
    assert _view_state(view) == _recompute_state(src)
    with pytest.raises(ValueError):
        # gated mode restores the raise for O(table)-copy-averse callers
        src2 = _mk_src(spark, tmp_path / "x")
        view2 = create_agg_view(src2, str(tmp_path / "x" / "view"), SPEC)
        merge_batch(src2, _batch(spark, [
            (0, 1, "insert", "r", "a.py", "c", "py", "v1"),
        ]), "m", 0, 0, 1)
        merge_batch(src2, _batch(spark, [
            (1, 2, "insert", "r", "b.py", "c", "py", "v1"),
        ]), "m", 1, 1, 2)
        src2.expire_snapshots(keep_last=1)
        refresh_agg_view(src2, view2, SPEC, auto_reseed=False)


def test_bootstrap_via_reseed_then_tail(spark, tmp_path):
    src = _mk_src(spark, tmp_path)
    view = create_agg_view(src, str(tmp_path / "view"), SPEC, num_buckets=4)
    merge_batch(src, _batch(spark, [
        (0, 1, "insert", "r", "a.py", "c", "py", "v1"),
        (1, 1, "insert", "r", "b.rs", "c", "rs", "v1"),
    ]), "m", 0, 0, 2)
    s = reseed_agg_view(src, view, SPEC)
    assert s.reseeded and _view_state(view) == _recompute_state(src)
    # tailing resumes from the seeded version — no re-application
    assert refresh_agg_view(src, view, SPEC) is None
    merge_batch(src, _batch(spark, [
        (2, 2, "delete", "r", "a.py", "c", "py", None),
    ]), "m", 1, 2, 3)
    refresh_agg_view(src, view, SPEC)
    assert _view_state(view) == _recompute_state(src)


def test_filtered_derived_view_matches_recompute(spark, tmp_path):
    """derived dims + where filter through the ±1 delta algebra: updates
    that cross the filter boundary (both directions) and move between
    derived groups must leave the view equal to a from-scratch recompute."""
    spec = AggViewSpec(
        dims=("l2",),
        derived={"l2": "upper(lang)"},
        where="content <> 'hidden'",
        sums={"seq_total": "seq"},
    )
    src = _mk_src(spark, tmp_path)
    view = create_agg_view(src, str(tmp_path / "view"), spec, num_buckets=4)

    def state(rows):
        return {(r["l2"], r["n_rows"], r["seq_total"]) for r in rows}

    merge_batch(src, _batch(spark, [
        (0, 1, "insert", "r", "a.py", "c", "py", "v1"),
        (1, 1, "insert", "r", "b.py", "c", "py", "hidden"),  # filtered out
        (2, 1, "insert", "r", "c.rs", "c", "rs", "v1"),
    ]), "m", 0, 0, 3)
    refresh_agg_view(src, view, spec)
    got = state(view.read().collect())
    assert got == state(spec.aggregate(src.read()).collect())
    assert ("PY", 1, 1) in got  # the hidden row never counted

    # b.py crosses INTO the filter, a.py crosses OUT, c.rs moves derived dim
    merge_batch(src, _batch(spark, [
        (3, 2, "update", "r", "b.py", "c", "py", "v2"),
        (4, 2, "update", "r", "a.py", "c", "py", "hidden"),
        (5, 2, "update", "r", "c.rs", "c", "go", "v1"),
    ]), "m", 1, 3, 6)
    refresh_agg_view(src, view, spec)
    assert state(view.read().collect()) == state(
        spec.aggregate(src.read()).collect()
    )
    # reseed from scratch agrees with the incrementally-maintained state
    reseed_agg_view(src, view, spec)
    assert state(view.read().collect()) == state(
        spec.aggregate(src.read()).collect()
    )


def test_refresh_agg_views_shared_scan_matches_individual(spark, tmp_path):
    """The multi-view entry point: targets sharing a start version share
    one image pair; targets at a DIFFERENT start version group separately
    — every view still lands exactly on the from-scratch recompute."""
    from multiversx_etl_spark.streaming.materialize import refresh_agg_views

    src = _mk_src(spark, tmp_path)
    spec_b = AggViewSpec(dims=("repo",), sums={"seq_total": "seq"},
                         count_alias="n")
    va = create_agg_view(src, str(tmp_path / "va"), SPEC, num_buckets=4)
    vb = create_agg_view(src, str(tmp_path / "vb"), spec_b, num_buckets=4)
    vc = create_agg_view(src, str(tmp_path / "vc"), SPEC, num_buckets=4)

    merge_batch(src, _batch(spark, [
        (0, 1, "insert", "r1", "a.py", "c", "py", "v1"),
        (1, 1, "insert", "r1", "b.py", "c", "py", "v1"),
        (2, 1, "insert", "r2", "c.rs", "c", "rs", "v1"),
    ]), "m", 0, 0, 3)
    # vc refreshes now — its marker will sit at a LATER start than va/vb
    assert refresh_agg_view(src, vc, SPEC, stream_id="ctl") is not None
    merge_batch(src, _batch(spark, [
        (3, 2, "update", "r1", "b.py", "c", "rs", "v2"),
        (4, 2, "delete", "r2", "c.rs", "c", "rs", None),
        (5, 2, "insert", "r3", "d.py", "c", "py", "v1"),
    ]), "m", 1, 3, 6)

    outs = refresh_agg_views(
        src, [(va, SPEC, "a"), (vb, spec_b, "b"), (vc, SPEC, "ctl")]
    )
    assert all(outs[k] is not None for k in ("a", "b", "ctl"))
    assert _view_state(va) == _recompute_state(src)
    assert _view_state(vc) == _recompute_state(src)
    got_b = {(r["repo"], r["n"], r["seq_total"]) for r in vb.read().collect()}
    want_b = {
        (r["repo"], r["n"], r["seq_total"])
        for r in spec_b.aggregate(src.read()).collect()
    }
    assert got_b == want_b and want_b

    outs2 = refresh_agg_views(
        src, [(va, SPEC, "a"), (vb, spec_b, "b"), (vc, SPEC, "ctl")]
    )
    assert all(v is None for v in outs2.values())


def test_spec_rejects_time_varying_expressions(spark, tmp_path):
    """current_date() in a spec would un-balance the ±1 algebra between
    refreshes (the stale row's -1 never fires) — rejected at validation,
    including via the refresh path (CLI specs are editable files)."""
    src = _mk_src(spark, tmp_path)
    with pytest.raises(ValueError, match="time-invariant"):
        AggViewSpec(
            dims=("lang",),
            where="to_date(commit) >= date_sub(current_date(), 7)",
        ).validate(src)
    with pytest.raises(ValueError, match="time-invariant"):
        AggViewSpec(
            dims=("recent",), derived={"recent": "current_timestamp()"}
        ).validate(src)
    with pytest.raises(ValueError, match="time-invariant"):
        AggViewSpec(dims=("lang",), sums={"s": "seq * rand()"}).validate(src)
    # a mere COLUMN named like the function must not false-positive
    AggViewSpec(
        dims=("current_date",), derived={"current_date": "to_date(commit)"}
    ).validate(src)
    # refresh-internal names are reserved
    with pytest.raises(ValueError, match="refresh-internal"):
        AggViewSpec(dims=("_w",), derived={"_w": "length(content)"}).validate(src)
    with pytest.raises(ValueError, match="refresh-internal"):
        AggViewSpec(dims=("lang",), sums={"_d_x": "seq"}).validate(src)


def test_spec_validation(spark, tmp_path):
    src = _mk_src(spark, tmp_path)
    with pytest.raises(ValueError, match="not in source schema"):
        AggViewSpec(dims=("nope",)).validate(src)
    with pytest.raises(ValueError, match="incrementally summable"):
        AggViewSpec(dims=("lang",), sums={"s": "content"}).validate(src)
    with pytest.raises(ValueError, match="collides"):
        AggViewSpec(dims=("lang",), sums={"lang": "seq"}).validate(src)
    with pytest.raises(ValueError, match="bad spec expression"):
        AggViewSpec(dims=("lang",), sums={"s": "nope"}).validate(src)
    with pytest.raises(ValueError, match="shadows a source column"):
        AggViewSpec(dims=("lang",), derived={"lang": "upper(lang)"}).validate(src)
    with pytest.raises(ValueError, match="bad spec expression"):
        AggViewSpec(dims=("lang",), where="no_such_col = 1").validate(src)


def test_refresh_across_rebucket(spark, tmp_path):
    """A rebucket() between two refreshes must not break the pre-image
    read: bucket ids are computed under EACH version's own layout (a
    current-layout id applied to the old-layout snapshot would prune
    garbage or index out of range)."""
    src = _mk_src(spark, tmp_path)  # 4 buckets
    view = create_agg_view(src, str(tmp_path / "view"), SPEC, num_buckets=4)
    merge_batch(src, _batch(spark, [
        (0, 1, "insert", "r", "a.py", "c", "py", "v1"),
        (1, 1, "insert", "r", "b.rs", "c", "rs", "v1"),
    ]), "m", 0, 0, 2)
    refresh_agg_view(src, view, SPEC)
    src.rebucket(16)  # pre-image reads now time-travel across layouts
    merge_batch(src, _batch(spark, [
        (2, 2, "update", "r", "a.py", "c", "py", "v2"),
        (3, 2, "insert", "r", "c.py", "c", "py", "v1"),
        (4, 2, "delete", "r", "b.rs", "c", None, None),
    ]), "m", 1, 2, 5)
    s = refresh_agg_view(src, view, SPEC)
    assert s is not None
    assert _view_state(view) == _recompute_state(src)
    # and shrinking the layout works too
    src.rebucket(2)
    merge_batch(src, _batch(spark, [
        (5, 3, "insert", "r", "d.rs", "c", "rs", "v1"),
    ]), "m", 2, 5, 6)
    refresh_agg_view(src, view, SPEC)
    assert _view_state(view) == _recompute_state(src)
