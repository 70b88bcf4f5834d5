"""Incrementally-maintained transform views (streaming/features.py): every
refresh must leave the view exactly equal to a from-scratch recompute of the
same transform at the current upstream version, and the MinHash index must
surface near-dup pairs as the CDC stream rewrites files."""

from __future__ import annotations

import pytest

from multiversx_etl_spark.lake.table import LakeTable
from multiversx_etl_spark.operators.merge import merge_batch
from multiversx_etl_spark.schemas import REPOS
from multiversx_etl_spark.streaming.features import (
    TransformViewSpec,
    create_transform_view,
    dedup_on_ingest,
    minhash_index_spec,
    near_dup_candidates,
    refresh_transform_view,
    reseed_transform_view,
)

SPEC = minhash_index_spec()

#: two near-identical "vendored" files sharing most word 3-grams, plus noise
_A = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
_B = "alpha beta gamma delta epsilon zeta eta theta iota lambda"
_C = "one two three four five six seven eight nine ten"


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
        (r["repo"], r["path"], r["minhash_1"], r["minhash_2"], r["minhash_3"])
        for r in view.read().collect()
    }


def _recompute_state(src, spec=SPEC):
    key = list(src.snapshot().key_columns)
    return {
        (r["repo"], r["path"], r["minhash_1"], r["minhash_2"], r["minhash_3"])
        for r in spec.transform(src.read(), key).collect()
    }


def test_refresh_matches_recompute_through_cdc_epochs(spark, tmp_path):
    src = _mk_src(spark, tmp_path)
    view = create_transform_view(src, str(tmp_path / "view"), SPEC, num_buckets=4)

    # epoch 0: inserts, including a short (<3 tokens -> NULL sig) and a
    # NULL-content row
    merge_batch(src, _batch(spark, [
        (0, 1, "insert", "r1", "a.py", "c", "py", _A),
        (1, 1, "insert", "r2", "b.py", "c", "py", _B),
        (2, 1, "insert", "r3", "c.py", "c", "py", _C),
        (3, 1, "insert", "r3", "short.py", "c", "py", "tiny doc"),
        (4, 1, "insert", "r3", "null.py", "c", "py", None),
    ]), "m", 0, 0, 5)
    s = refresh_transform_view(src, view, SPEC)
    assert s is not None
    assert _view_state(view) == _recompute_state(src)

    # the vendored pair is a candidate; the noise doc is not
    pairs = {
        (r["repo_a"], r["path_a"], r["repo_b"], r["path_b"])
        for r in near_dup_candidates(view).collect()
    }
    assert ("r1", "a.py", "r2", "b.py") in pairs
    assert not any("r3" in (p[0], p[2]) for p in pairs)

    # epoch 1: rewrite r2/b.py to unrelated content (pair must dissolve),
    # delete r3/c.py, insert a new vendored copy of _A
    merge_batch(src, _batch(spark, [
        (5, 2, "update", "r2", "b.py", "c", "py", "totally different words here now"),
        (6, 2, "delete", "r3", "c.py", "c", None, None),
        (7, 2, "insert", "r4", "copy.py", "c", "py", _A),
    ]), "m", 1, 5, 8)
    s = refresh_transform_view(src, view, SPEC)
    assert s is not None
    assert _view_state(view) == _recompute_state(src)
    pairs = {
        (r["repo_a"], r["path_a"], r["repo_b"], r["path_b"])
        for r in near_dup_candidates(view).collect()
    }
    assert ("r1", "a.py", "r4", "copy.py") in pairs
    assert ("r1", "a.py", "r2", "b.py") not in pairs
    assert ("r3", "c.py") not in {
        (r["repo"], r["path"]) for r in view.read().collect()
    }


def test_refresh_is_exactly_once_and_incremental(spark, tmp_path):
    src = _mk_src(spark, tmp_path)
    view = create_transform_view(src, str(tmp_path / "view"), SPEC, num_buckets=4)
    merge_batch(src, _batch(spark, [
        (0, 1, "insert", "r", "a.py", "c", "py", _A),
        (1, 1, "insert", "r", "b.py", "c", "py", _B),
    ]), "m", 0, 0, 2)
    assert refresh_transform_view(src, view, SPEC) is not None
    # up to date: no-op, twice (marker = upstream version)
    assert refresh_transform_view(src, view, SPEC) is None
    assert refresh_transform_view(src, view, SPEC) is None

    # the second refresh moves only the delta (one changed key)
    merge_batch(src, _batch(spark, [
        (2, 2, "update", "r", "a.py", "c", "py", _C),
    ]), "m", 1, 2, 3)
    s = refresh_transform_view(src, view, SPEC)
    assert s is not None and s.rows_in == 1
    assert _view_state(view) == _recompute_state(src)


def test_compact_only_range_commits_marker(spark, tmp_path):
    src = _mk_src(spark, tmp_path)
    view = create_transform_view(src, str(tmp_path / "view"), SPEC, num_buckets=4)
    merge_batch(src, _batch(spark, [
        (0, 1, "insert", "r", "a.py", "c", "py", _A),
    ]), "m", 0, 0, 1)
    refresh_transform_view(src, view, SPEC)
    before = _view_state(view)
    src.compact()  # physical-only commit: version advances, no logical change
    s = refresh_transform_view(src, view, SPEC)
    assert s is not None and _view_state(view) == before
    assert refresh_transform_view(src, view, SPEC) is None  # marker advanced


def test_retention_gap_auto_reseeds(spark, tmp_path):
    src = _mk_src(spark, tmp_path)
    view = create_transform_view(src, str(tmp_path / "view"), SPEC, num_buckets=4)
    for e in range(3):
        merge_batch(src, _batch(spark, [
            (e, e + 1, "insert", "r", f"f{e}.py", "c", "py", _A),
        ]), "m", e, e, e + 1)
    refresh_transform_view(src, view, SPEC)
    for e in range(3, 6):
        merge_batch(src, _batch(spark, [
            (e, e + 1, "insert", "r", f"f{e}.rs", "c", "rs", _B),
        ]), "m", e, e, e + 1)
    src.expire_snapshots(keep_last=1)
    s = refresh_transform_view(src, view, SPEC)
    assert s is not None and s.reseeded
    assert _view_state(view) == _recompute_state(src)
    with pytest.raises(ValueError):
        src2 = _mk_src(spark, tmp_path / "x")
        view2 = create_transform_view(src2, str(tmp_path / "x" / "view"), SPEC)
        merge_batch(src2, _batch(spark, [
            (0, 1, "insert", "r", "a.py", "c", "py", _A),
        ]), "m", 0, 0, 1)
        merge_batch(src2, _batch(spark, [
            (1, 2, "insert", "r", "b.py", "c", "py", _B),
        ]), "m", 1, 1, 2)
        src2.expire_snapshots(keep_last=1)
        refresh_transform_view(src2, view2, SPEC, auto_reseed=False)


def test_bootstrap_via_reseed_then_tail(spark, tmp_path):
    src = _mk_src(spark, tmp_path)
    view = create_transform_view(src, str(tmp_path / "view"), SPEC, num_buckets=4)
    merge_batch(src, _batch(spark, [
        (0, 1, "insert", "r", "a.py", "c", "py", _A),
        (1, 1, "insert", "r", "b.rs", "c", "rs", _B),
    ]), "m", 0, 0, 2)
    s = reseed_transform_view(src, view, SPEC)
    assert s.reseeded and _view_state(view) == _recompute_state(src)
    # tailing resumes from the seeded version — no re-application
    assert refresh_transform_view(src, view, SPEC) is None
    merge_batch(src, _batch(spark, [
        (2, 2, "delete", "r", "a.py", "c", None, None),
    ]), "m", 1, 2, 3)
    refresh_transform_view(src, view, SPEC)
    assert _view_state(view) == _recompute_state(src)


def test_spec_validation(spark, tmp_path):
    src = _mk_src(spark, tmp_path)
    with pytest.raises(ValueError, match="at least one"):
        TransformViewSpec(exprs={}).validate(src)
    with pytest.raises(ValueError, match="collides"):
        TransformViewSpec(exprs={"repo": "upper(content)"}).validate(src)
    with pytest.raises(ValueError, match="collides"):
        TransformViewSpec(exprs={"seq": "length(content)"}).validate(src)
    with pytest.raises(Exception):  # bad column reference surfaces at declare
        TransformViewSpec(exprs={"x": "length(nope)"}).validate(src)


def test_dedup_on_ingest(spark, tmp_path):
    src = _mk_src(spark, tmp_path)
    view = create_transform_view(src, str(tmp_path / "view"), SPEC, num_buckets=4)

    # batch 1: a vendored pair within the batch — only the min-key copy and
    # the unrelated doc are admitted; short docs always pass
    b1 = _batch(spark, [
        (0, 1, "insert", "r1", "a.py", "c", "py", _A),
        (1, 1, "insert", "r2", "copy.py", "c", "py", _A),
        (2, 1, "insert", "r3", "c.py", "c", "py", _C),
        (3, 1, "insert", "r3", "short.py", "c", "py", "tiny doc"),
    ])
    admitted = dedup_on_ingest(view, SPEC, b1)
    got = {(r["repo"], r["path"]) for r in admitted.collect()}
    assert got == {("r1", "a.py"), ("r3", "c.py"), ("r3", "short.py")}

    # merge the admitted rows, refresh the index, then batch 2: a near-dup
    # of the already-ingested _A is rejected by the INDEX (not the batch)
    merge_batch(src, admitted, "m", 0, 0, 4)
    refresh_transform_view(src, view, SPEC)
    b2 = _batch(spark, [
        (4, 2, "insert", "r9", "vendored.py", "c", "py", _B),  # ~_A via bands
        (5, 2, "insert", "r9", "new.py", "c", "py",
         "completely novel words appear in this file body"),
    ])
    admitted2 = dedup_on_ingest(view, SPEC, b2)
    got2 = {(r["repo"], r["path"]) for r in admitted2.collect()}
    assert got2 == {("r9", "new.py")}

    # deleting the indexed original re-admits future near-dups
    merge_batch(src, _batch(spark, [
        (6, 3, "delete", "r1", "a.py", "c", None, None),
    ]), "m", 1, 6, 7)
    refresh_transform_view(src, view, SPEC)
    got3 = {(r["repo"], r["path"]) for r in dedup_on_ingest(view, SPEC, b2).collect()}
    assert got3 == {("r9", "vendored.py"), ("r9", "new.py")}


def test_generic_feature_view(spark, tmp_path):
    """The spec is general: a quality/fingerprint feature view works the
    same way (the per-doc feature family from queries.py, materialized)."""
    spec = TransformViewSpec(
        pre={"_w": "split(trim(content), '\\\\s+')"},
        exprs={
            "n_tokens": "CASE WHEN length(trim(content)) > 0 THEN size(_w) ELSE 0 END",
            "fingerprint": "sha2(content, 256)",
        },
    )
    src = _mk_src(spark, tmp_path)
    view = create_transform_view(src, str(tmp_path / "view"), spec, num_buckets=4)
    merge_batch(src, _batch(spark, [
        (0, 1, "insert", "r", "a.py", "c", "py", _A),
        (1, 1, "insert", "r", "b.py", "c", "py", ""),
    ]), "m", 0, 0, 2)
    refresh_transform_view(src, view, spec, stream_id="feat")
    rows = {r["path"]: (r["n_tokens"], r["fingerprint"]) for r in view.read().collect()}
    assert rows["a.py"][0] == 10 and rows["a.py"][1] is not None
    assert rows["b.py"][0] == 0


def test_dedup_on_ingest_self_update_passes(spark, tmp_path):
    """A CDC UPDATE to an already-indexed document must NOT be rejected as
    a near-dup of its own index entry: the anti-join excludes same-key
    index rows. A different-key near-dup of the same content stays
    rejected."""
    src = _mk_src(spark, tmp_path)
    view = create_transform_view(src, str(tmp_path / "view"), SPEC, num_buckets=4)
    b1 = _batch(spark, [(0, 1, "insert", "r1", "a.py", "c", "py", _A)])
    merge_batch(src, dedup_on_ingest(view, SPEC, b1), "m", 0, 0, 1)
    refresh_transform_view(src, view, SPEC)
    # the update shares most shingles with its own index entry (_B ~ _A)
    b2 = _batch(spark, [
        (1, 2, "update", "r1", "a.py", "c", "py", _B),     # same key: pass
        (2, 2, "insert", "r9", "copy.py", "c", "py", _B),  # other key: reject
    ])
    got = {(r["repo"], r["path"]) for r in dedup_on_ingest(view, SPEC, b2).collect()}
    assert got == {("r1", "a.py")}


def test_spec_validation_pre_and_band_derivation(spark, tmp_path):
    src = _mk_src(spark, tmp_path)
    # a pre column shadowing a key would silently re-key the view
    with pytest.raises(ValueError, match="pre column"):
        TransformViewSpec(
            exprs={"x": "length(content)"}, pre={"repo": "upper(content)"}
        ).validate(src)
    with pytest.raises(ValueError, match="_deleted"):
        TransformViewSpec(exprs={"_deleted": "length(content)"}).validate(src)
    # band count is derived from the view schema, not guessed
    from multiversx_etl_spark.streaming.features import _view_bands, minhash_index_spec

    spec5 = minhash_index_spec(bands=5)
    view5 = create_transform_view(src, str(tmp_path / "v5"), spec5, num_buckets=4)
    assert _view_bands(view5) == 5
