"""The refresh-view CLI: a fresh consumer process creates and refreshes
materialized views over a table this process built — the ops surface for
view maintenance (cron-able, like the replicate CLI)."""

from __future__ import annotations

import json
import os
import subprocess
import sys

from multiversx_etl_spark.lake.table import LakeTable
from multiversx_etl_spark.operators.merge import merge_batch
from multiversx_etl_spark.schemas import REPOS

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _batch(spark, rows):
    cols = (
        "offset long, seq long, op string, repo string, path string, "
        "commit string, lang string, content string"
    )
    return spark.createDataFrame(rows, cols)


def _cli(*argv: str) -> dict:
    run = subprocess.run(
        [sys.executable, "-m", "multiversx_etl_spark", "--master", "local[2]", *argv],
        capture_output=True,
        text=True,
        timeout=300,
        env={**os.environ, "PYTHONPATH": REPO},
        cwd=REPO,
    )
    assert run.returncode == 0, run.stderr[-3000:]
    return json.loads(run.stdout.strip().splitlines()[-1])


def test_refresh_view_cli_minhash_and_agg(spark, tmp_path):
    src = LakeTable.create(
        spark, str(tmp_path / "src"), REPOS, key_columns=["repo", "path"], num_buckets=4
    )
    merge_batch(src, _batch(spark, [
        (0, 1, "insert", "r1", "a.py", "c", "py", "alpha beta gamma delta epsilon"),
        (1, 1, "insert", "r2", "b.py", "c", "py", "alpha beta gamma delta epsilon"),
        (2, 1, "insert", "r3", "c.py", "c", "rs", "one two three four five"),
    ]), "m", 0, 0, 3)

    mh_spec = tmp_path / "mh.json"
    mh_spec.write_text(json.dumps({"kind": "minhash_index", "bands": 3}))
    out = _cli(
        "refresh-view", str(tmp_path / "src"), str(tmp_path / "mh"),
        "--spec", str(mh_spec), "--buckets", "4",
    )
    assert out["view_rows"] == 3 and out["rows_in"] == 3

    agg_spec = tmp_path / "agg.json"
    agg_spec.write_text(json.dumps({"kind": "agg", "dims": ["lang"]}))
    out = _cli(
        "refresh-view", str(tmp_path / "src"), str(tmp_path / "agg"),
        "--spec", str(agg_spec), "--buckets", "4",
    )
    assert out["view_rows"] == 2  # py, rs

    # identical vendored files share every band: the index view agrees with
    # an in-process read
    mh = LakeTable(spark, str(tmp_path / "mh"))
    rows = {r["repo"]: r["minhash_1"] for r in mh.read().collect()}
    assert rows["r1"] == rows["r2"] != rows["r3"]

    # second round: a delete flows through; re-run is then up to date
    merge_batch(src, _batch(spark, [
        (3, 2, "delete", "r2", "b.py", "c", None, None),
    ]), "m", 1, 3, 4)
    out = _cli(
        "refresh-view", str(tmp_path / "src"), str(tmp_path / "mh"),
        "--spec", str(mh_spec),
    )
    assert out["deleted"] == 1 and out["view_rows"] == 2
    out = _cli(
        "refresh-view", str(tmp_path / "src"), str(tmp_path / "mh"),
        "--spec", str(mh_spec),
    )
    assert out["up_to_date"] is True


def test_maintain_cli(spark, tmp_path):
    """One cron-able pass: compact + expire + orphan GC, reported together."""
    src = LakeTable.create(
        spark, str(tmp_path / "m"), REPOS, key_columns=["repo", "path"], num_buckets=4
    )
    for i in range(4):
        merge_batch(src, _batch(spark, [
            (i, 10 + i, "insert", "r1", f"f{i}.py", "c", "py", f"body {i}"),
        ]), "s", i)
    assert int(src.snapshot().properties["mor_appends"]) > 0
    out = _cli("maintain", str(tmp_path / "m"), "--keep-last", "2", "--min-age", "0")
    assert out["files_after"] <= out["files_before"] + 1
    assert out["expired_manifests"] >= 1
    t = LakeTable(spark, str(tmp_path / "m"))
    m = t.snapshot()
    assert int(m.properties["mor_appends"]) == 0
    assert t.read().count() == 4
