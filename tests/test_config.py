"""Worker-config surface (the reference's JSON operator interface,
worker_config.py:51-104): validation, defaults, errata plumbing, and one
configured end-to-end iteration."""

from __future__ import annotations

import json

import pytest

from multiversx_etl_spark.config import (
    ConfigError,
    load_worker_config,
    run_from_config,
    worker_config_from_dict,
)


def test_defaults_and_required():
    cfg = worker_config_from_dict({"table_root": "/t", "log_path": "/l"})
    assert cfg.stream_id == "main" and cfg.mode == "mor"
    assert cfg.interval_size == 1_000_000 and cfg.num_buckets == 16
    assert cfg.trigger_interval is None and cfg.fail_on_counts_mismatch
    with pytest.raises(ConfigError, match="missing required"):
        worker_config_from_dict({"table_root": "/t"})


def test_rejects_unknown_keys_and_bad_values():
    with pytest.raises(ConfigError, match="unknown config keys"):
        worker_config_from_dict({"table_root": "/t", "log_path": "/l", "threds": 4})
    with pytest.raises(ConfigError, match="mode"):
        worker_config_from_dict({"table_root": "/t", "log_path": "/l", "mode": "wal"})
    with pytest.raises(ConfigError, match="interval_size"):
        worker_config_from_dict(
            {"table_root": "/t", "log_path": "/l", "interval_size": 0}
        )
    with pytest.raises(ConfigError, match="signed integers"):
        worker_config_from_dict(
            {"table_root": "/t", "log_path": "/l",
             "counts_checks_errata": {"repos": "three"}}
        )


def test_errata_default_zero(tmp_path):
    p = tmp_path / "cfg.json"
    p.write_text(json.dumps({
        "table_root": "/t", "log_path": "/l",
        "counts_checks_errata": {"repos": -3},
    }))
    cfg = load_worker_config(str(p))
    assert cfg.erratum_for("repos") == -3
    assert cfg.erratum_for("unlisted") == 0


def test_run_from_config_end_to_end(spark, tmp_path):
    """One configured iteration: replay + reconcile, exactly-once on rerun."""
    from multiversx_etl_spark.sources.changelog import (
        generate_change_log,
        write_log_parquet,
    )

    log_path = str(tmp_path / "log")
    write_log_parquet(
        generate_change_log(spark, 400, num_repos=5, paths_per_repo=10),
        log_path, files=2,
    )
    cfg = worker_config_from_dict({
        "table_root": str(tmp_path / "t"),
        "log_path": log_path,
        "interval_size": 200,
        "num_buckets": 4,
    })
    s1 = run_from_config(spark, cfg)
    assert s1["reconcile_ok"] and s1["epochs_run"] >= 2
    s2 = run_from_config(spark, cfg)  # rerun: markers skip every epoch
    assert s2["epochs_run"] == 0 and s2["epochs_skipped"] == s1["epochs_run"]
    assert s2["reconcile_ok"]
