"""The deployment catalog: all 17 reference indices as declared tables.

Mirrors the reference's full index surface (17 schema files under
/root/reference/schema/, TransformersRegistry dispatch by index name,
transformers.py:6-17): every catalog table loads by name, its target schema
derives from the SAME TransformSpec its normalizer is built from, and the
four non-trivial transformers (accounts, tokens, blocks, events) behave
exactly like the reference's — verified end to end through MERGE and an
independent DuckDB oracle.
"""

from __future__ import annotations

import pytest
from pyspark.sql.types import ArrayType, StringType, StructType

from multiversx_etl_spark.catalog import (
    DEFAULT_SPEC,
    SPECS,
    catalog_table_names,
    catalog_tables,
)

#: the reference's full index set (/root/reference/schema/*.json)
REFERENCE_INDICES = sorted(
    [
        "accounts", "accountsesdt", "accountsesdthistory", "accountshistory",
        "blocks", "delegators", "epochinfo", "events", "miniblocks",
        "operations", "rating", "receipts", "rounds", "scdeploys", "tags",
        "tokens", "validators",
    ]
)


def test_catalog_covers_every_reference_index():
    assert catalog_table_names() == REFERENCE_INDICES


def test_catalog_registered_in_tables_and_registry():
    from multiversx_etl_spark.operators.normalize import REGISTRY
    from multiversx_etl_spark.schemas import TABLES

    for name in REFERENCE_INDICES:
        assert name in TABLES, name
        assert name in REGISTRY, name
        log, tgt, key = TABLES[name]
        assert key == ["_id"]
        assert log.fieldNames()[:3] == ["offset", "seq", "op"]
        assert tgt.fieldNames()[-2:] == ["seq", "deleted"]
        # _id is the REQUIRED key on both sides
        assert not log["_id"].nullable and not tgt["_id"].nullable


@pytest.mark.parametrize("name", REFERENCE_INDICES)
def test_target_schema_matches_spec(name):
    """Target = declared payload minus the spec's drops (+ bookkeeping) —
    the drift-proof invariant: schema derivation and normalizer share the
    spec."""
    cat = catalog_tables()[name]
    spec = SPECS.get(name, DEFAULT_SPEC)
    tgt_names = cat.target_schema.fieldNames()
    for f in spec.drop_fields:
        assert f not in tgt_names, (name, f)
    for prefix in spec.drop_prefixes:
        assert not any(c.startswith(prefix) for c in tgt_names), (name, prefix)
    # volatile raw fields live ONLY on the log side
    for vname, _ in spec.volatile_fields:
        assert vname in cat.log_schema.fieldNames()
        assert vname not in tgt_names
    # identity tables: target payload == declared payload verbatim
    if spec == DEFAULT_SPEC:
        assert tgt_names[:-2] == cat.payload.fieldNames()


def test_blocks_nested_drop_in_target():
    cat = catalog_tables()["blocks"]
    esd = cat.target_schema["epochStartShardsData"].dataType
    inner = esd.elementType["pendingMiniBlockHeaders"].dataType.elementType
    assert "reserved" not in inner.fieldNames()


def _replay_catalog(spark, tmp_path, name, num_events=400, num_keys=30):
    from multiversx_etl_spark.operators.normalize import REGISTRY
    from multiversx_etl_spark.schemas import TABLES
    from multiversx_etl_spark.sources.changelog import (
        generate_catalog_log,
        write_log_parquet,
    )
    from multiversx_etl_spark.streaming.ingest import ensure_table, replay

    log_path = str(tmp_path / f"log_{name}")
    write_log_parquet(
        generate_catalog_log(spark, num_events, name, num_keys=num_keys),
        log_path,
        files=2,
    )
    _, target_schema, key = TABLES[name]
    table = ensure_table(
        spark, str(tmp_path / f"t_{name}"), num_buckets=4,
        schema=target_schema, key_columns=key,
    )
    replay(
        spark.read.parquet(log_path), table, interval_size=num_events // 2,
        normalizer=REGISTRY[name],
    )
    return table, log_path, target_schema


@pytest.mark.parametrize("name", REFERENCE_INDICES)
def test_every_catalog_table_replays_to_declared_schema(spark, tmp_path, name):
    """Generate → normalize → MERGE → read for ALL 17 indices: the final
    lake schema equals the declared target, rows equal the live keys."""
    table, log_path, target_schema = _replay_catalog(
        spark, tmp_path, name, num_events=120, num_keys=20
    )
    out = table.read()
    got = {f.name: f.dataType for f in out.schema.fields}
    want_types = {f.name: f.dataType for f in target_schema.fields}
    # every declared target column (payload + seq) comes back with its
    # declared type; the read surfaces no columns outside the target schema
    for f in target_schema.fields:
        if f.name == "deleted":
            continue  # tombstone flag: storage-internal, filtered by read
        assert got[f.name] == f.dataType, (name, f.name)
    assert set(got) <= set(want_types), (name, set(got) - set(want_types))
    import duckdb

    con = duckdb.connect()
    want = con.execute(f"""
        WITH w AS (
          SELECT _id, op, row_number() OVER (PARTITION BY _id ORDER BY seq DESC) rn
          FROM read_parquet('{log_path}/*.parquet')
        ) SELECT count(*) FROM w WHERE rn = 1 AND op <> 'delete'
    """).fetchone()[0]
    con.close()
    assert out.count() == want > 0


def test_accounts_volatile_drop_end_to_end(spark, tmp_path):
    """AccountsTransformer analog (transformers.py:31-39): api_* raw fields
    are in the LOG, never in the lake."""
    table, log_path, _ = _replay_catalog(spark, tmp_path, "accounts")
    log_cols = spark.read.parquet(log_path).columns
    assert "api_balance" in log_cols and "api_nonce" in log_cols
    out = table.read()
    assert not any(c.startswith("api_") for c in out.columns)
    assert out.count() > 0


def test_tokens_lww_matches_duckdb_oracle(spark, tmp_path):
    """TokensTransformer analog (transformers.py:55-64) + LWW fold against
    an independent DuckDB oracle, nested data/properties columns included."""
    import duckdb

    table, log_path, _ = _replay_catalog(spark, tmp_path, "tokens")
    got = {
        (r["_id"], r["identifier"], r["token"], r["frozen"],
         r["data"]["creator"], r["properties"]["canMint"], r["seq"])
        for r in table.read().collect()
    }
    con = duckdb.connect()
    oracle = con.execute(f"""
        WITH w AS (
          SELECT _id, identifier, token, frozen, data.creator AS creator,
                 properties.canMint AS canMint, seq, op,
                 row_number() OVER (PARTITION BY _id ORDER BY seq DESC) rn
          FROM read_parquet('{log_path}/*.parquet')
        )
        SELECT _id, identifier, token, frozen, creator, canMint, seq
        FROM w WHERE rn = 1 AND op <> 'delete'
    """).fetchall()
    con.close()
    assert got == set(oracle) and len(got) > 0
    assert not any(c.startswith(("nft_", "api_")) for c in table.read().columns)


def test_events_null_scrub_end_to_end(spark, tmp_path):
    """EventsTransformer analog (transformers.py:67-77): the log carries
    NULL elements in topics/additionalData; the lake never does — they are
    scrubbed to \"\" (BQ REPEATED rejects NULLs)."""
    import pyspark.sql.functions as F

    table, log_path, _ = _replay_catalog(spark, tmp_path, "events")
    raw = spark.read.parquet(log_path)
    raw_nulls = raw.where(
        F.exists("topics", lambda x: x.isNull())
        | F.exists("additionalData", lambda x: x.isNull())
    ).count()
    assert raw_nulls > 0  # the generator really produced the problem case
    out = table.read()
    lake_nulls = out.where(
        F.exists("topics", lambda x: x.isNull())
        | F.exists("additionalData", lambda x: x.isNull())
    ).count()
    assert lake_nulls == 0
    assert out.where(F.array_contains("topics", "")).count() > 0


def test_catalog_table_through_worker_config(spark, tmp_path):
    """The config surface reaches any catalog index by name — normalizer
    dispatch included (get_transformer(index_name) analog)."""
    from multiversx_etl_spark.config import run_from_config, worker_config_from_dict
    from multiversx_etl_spark.sources.changelog import (
        generate_catalog_log,
        write_log_parquet,
    )

    log_path = str(tmp_path / "log")
    write_log_parquet(
        generate_catalog_log(spark, 300, "accounts", num_keys=40), log_path, files=2
    )
    cfg = worker_config_from_dict({
        "name": "accounts",
        "table_root": str(tmp_path / "t"),
        "log_path": log_path,
        "schema": "accounts",
        "normalizer": "accounts",
        "interval_size": 150,
        "num_buckets": 4,
    })
    s = run_from_config(spark, cfg)
    assert s["reconcile_ok"] and s["epochs_run"] >= 2


def test_mainnet_style_multi_table_config(spark, tmp_path):
    """The reference's real unit of operation: a worker config listing
    MANY indices with per-index errata (worker_config_mainnet.json analog:
    8 append-only + 7 mutable). Three representative tables in one config,
    one reconciliation verdict."""
    from multiversx_etl_spark.config import run_from_config, worker_config_from_dict
    from multiversx_etl_spark.sources.changelog import (
        generate_catalog_log,
        write_log_parquet,
    )

    entries = []
    for name in ["accounts", "events", "rounds"]:
        log_path = str(tmp_path / f"log_{name}")
        write_log_parquet(
            generate_catalog_log(spark, 200, name, num_keys=25), log_path, files=2
        )
        entries.append({
            "name": name,
            "table_root": str(tmp_path / f"t_{name}"),
            "log_path": log_path,
            "schema": name,
            "normalizer": name,
        })
    cfg = worker_config_from_dict({
        "interval_size": 100,
        "num_buckets": 4,
        "counts_checks_errata": {"accounts": 0, "events": 0, "rounds": 0},
        "tables": entries,
    })
    s = run_from_config(spark, cfg)
    assert s["reconcile_ok"] and set(s["tables"]) == {"accounts", "events", "rounds"}


def test_mutable_processing_reloads_from_scratch(spark, tmp_path):
    """processing='mutable' — the reference's second index-processing mode
    (app_controller.py:55-71: truncate, then reload from scratch). Two
    invariants: (1) repeated iterations are idempotent full reloads that
    keep reconciling green; (2) the mutable reload converges to EXACTLY the
    state the incremental append_only replay of the same log produces."""
    import pyspark.sql.functions as F

    from multiversx_etl_spark.config import run_from_config, worker_config_from_dict
    from multiversx_etl_spark.lake.table import LakeTable
    from multiversx_etl_spark.sources.changelog import (
        generate_catalog_log,
        write_log_parquet,
    )

    log_path = str(tmp_path / "log")
    write_log_parquet(
        generate_catalog_log(spark, 400, "tokens", num_keys=40), log_path, files=2
    )

    def cfg(root, processing):
        return worker_config_from_dict({
            "name": "tokens", "schema": "tokens", "normalizer": "tokens",
            "table_root": root, "log_path": log_path,
            "interval_size": 200, "num_buckets": 4, "processing": processing,
        })

    mroot = str(tmp_path / "mutable")
    s1 = run_from_config(spark, cfg(mroot, "mutable"))
    assert s1["reconcile_ok"] and s1["processing"] == "mutable"
    v1 = LakeTable(spark, mroot).snapshot().version
    # second iteration: a fresh full reload on top (new snapshot), still green
    s2 = run_from_config(spark, cfg(mroot, "mutable"))
    assert s2["reconcile_ok"] and s2["rows_loaded"] == s1["rows_loaded"]
    t = LakeTable(spark, mroot)
    assert t.snapshot().version > v1

    aroot = str(tmp_path / "append")
    s3 = run_from_config(spark, cfg(aroot, "append_only"))
    assert s3["reconcile_ok"]
    a = LakeTable(spark, aroot)
    cols = t.read().columns
    assert t.read().select(*cols).exceptAll(a.read().select(*cols)).count() == 0
    assert a.read().select(*cols).exceptAll(t.read().select(*cols)).count() == 0


def test_mutable_processing_folds_patch_logs_exactly(spark, tmp_path):
    """processing='mutable' over a log with partial-image op='patch' events:
    the truncate-reload uses the COLUMN-level LWW fold and must converge to
    EXACTLY the state the incremental append_only replay produces — the
    independent check, since the incremental patch machinery is
    property-tested against a pure-Python per-column reference."""
    from multiversx_etl_spark.config import run_from_config, worker_config_from_dict
    from multiversx_etl_spark.lake.table import LakeTable
    from multiversx_etl_spark.sources.changelog import (
        generate_change_log,
        write_log_parquet,
    )

    log_path = str(tmp_path / "log")
    write_log_parquet(
        generate_change_log(spark, 300, num_repos=10, patch_fraction=0.3),
        log_path, files=2,
    )

    def cfg(root, processing):
        return worker_config_from_dict({
            "name": "repos", "table_root": root, "log_path": log_path,
            "interval_size": 150, "num_buckets": 4, "processing": processing,
        })

    s1 = run_from_config(spark, cfg(str(tmp_path / "m"), "mutable"))
    assert s1["reconcile_ok"] and s1["patch_fold"] is True
    s2 = run_from_config(spark, cfg(str(tmp_path / "a"), "append_only"))
    assert s2["reconcile_ok"]
    m = LakeTable(spark, str(tmp_path / "m")).read()
    a = LakeTable(spark, str(tmp_path / "a")).read()
    cols = sorted(m.columns)
    assert m.select(*cols).exceptAll(a.select(*cols)).count() == 0
    assert a.select(*cols).exceptAll(m.select(*cols)).count() == 0
    assert m.count() > 0


def test_catalog_table_streams_end_to_end(spark, tmp_path):
    """A catalog index through the Structured Streaming path (config
    surface, streaming=True): declared log schema on the file source,
    per-index normalizer in foreachBatch, reconcile green at drain."""
    from multiversx_etl_spark.config import run_from_config, worker_config_from_dict
    from multiversx_etl_spark.sources.changelog import (
        generate_catalog_log,
        write_log_parquet,
    )

    log_path = str(tmp_path / "log")
    write_log_parquet(
        generate_catalog_log(spark, 300, "events", num_keys=30), log_path, files=4
    )
    cfg = worker_config_from_dict({
        "name": "events", "schema": "events", "normalizer": "events",
        "table_root": str(tmp_path / "t"), "log_path": log_path,
        "num_buckets": 4, "max_files_per_trigger": 2,
    })
    s = run_from_config(
        spark, cfg, streaming=True, checkpoint_dir=str(tmp_path / "ckpt")
    )
    assert s["reconcile_ok"]


def test_schema_folder_external_table_and_evolution(spark, tmp_path):
    """The reference's ``schema_folder`` config key: a deployment-owned
    schema JSON folder resolved by table name (bq_client.py:84-87), with
    the schema FILE as the source of truth — editing it (adding a field)
    flows into the next run's declared schemas and the lake table evolves
    on MERGE, old rows reading NULL for the new column."""
    import json

    import pyspark.sql.functions as F

    from multiversx_etl_spark.catalog import load_table_from_folder
    from multiversx_etl_spark.config import run_from_config, worker_config_from_dict
    from multiversx_etl_spark.lake.table import LakeTable
    from multiversx_etl_spark.sources.changelog import (
        generate_catalog_log,
        write_log_parquet,
    )

    folder = tmp_path / "schemas"
    folder.mkdir()
    v1 = [
        {"name": "_id", "type": "STRING", "mode": "REQUIRED"},
        {"name": "name", "type": "STRING"},
        {"name": "timestamp", "type": "TIMESTAMP"},
    ]
    (folder / "widgets.json").write_text(json.dumps(v1))
    log_path = str(tmp_path / "log")

    def cfg():
        return worker_config_from_dict({
            "name": "widgets", "schema": "widgets", "normalizer": "widgets",
            "schema_folder": str(folder),
            "table_root": str(tmp_path / "t"), "log_path": log_path,
            "interval_size": 250, "num_buckets": 4,
        })

    cat1 = load_table_from_folder(str(folder), "widgets")
    write_log_parquet(
        generate_catalog_log(
            spark, 200, "widgets", num_keys=20, log_schema=cat1.log_schema
        ),
        log_path, files=2,
    )
    s1 = run_from_config(spark, cfg())
    assert s1["reconcile_ok"]
    assert "score" not in LakeTable(spark, str(tmp_path / "t")).read().columns

    # EVOLVE THE FILE: add a column; append a second log generation that
    # carries it (touching only keys 0-4 of the same _id space)
    (folder / "widgets.json").write_text(json.dumps(
        v1 + [{"name": "score", "type": "INTEGER"}]
    ))
    cat2 = load_table_from_folder(str(folder), "widgets")
    assert "score" in cat2.log_schema.fieldNames()
    generate_catalog_log(
        spark, 100, "widgets", num_keys=5, log_schema=cat2.log_schema,
        offset_base=250,
    ).write.mode("append").parquet(log_path)

    s2 = run_from_config(spark, cfg())
    assert s2["reconcile_ok"]
    out = LakeTable(spark, str(tmp_path / "t")).read()
    assert "score" in out.columns
    # v2-touched keys carry scores; keys last written in generation 1 read
    # NULL for the new column (old files evolve, values aren't invented)
    assert out.where(F.col("score").isNotNull()).count() > 0
    assert out.where(F.col("score").isNull()).count() > 0


def test_schema_folder_validates_file_and_normalizer():
    from multiversx_etl_spark.config import ConfigError, worker_config_from_dict

    with pytest.raises(ConfigError, match="schema file not found"):
        worker_config_from_dict({
            "table_root": "/x", "log_path": "/y",
            "schema": "nope", "schema_folder": "/definitely/missing",
        })


def test_shipped_catalog_config_example_loads():
    """The packaged example config (the worker_config_mainnet.json analog:
    8 append-only MOR tables + 7 mutable cow tables, per-index errata)
    validates against the catalog — every schema/normalizer key resolves."""
    import json
    from importlib import resources

    from multiversx_etl_spark.config import MultiWorkerConfig, worker_config_from_dict

    raw = json.loads(
        resources.files("multiversx_etl_spark")
        .joinpath("config_examples/worker_config_catalog.json")
        .read_text()
    )
    cfg = worker_config_from_dict(raw)
    assert isinstance(cfg, MultiWorkerConfig) and len(cfg.tables) == 15
    assert sum(1 for t in cfg.tables if t.processing == "mutable") == 7
    assert cfg.tables[0].erratum_for("miniblocks") == -53193
    assert cfg.num_threads == 8  # the reference's mainnet thread-pool knob


def test_mutable_reload_keeps_evolved_schema_columns(spark, tmp_path):
    """processing='mutable' over an EVOLVED schema file: the truncate-reload
    must carry the new column's values into the lake (bootstrap_snapshot
    evolves the table schema exactly like merge_batch does) — and keep
    reconciling green, since the expected state sees the column too."""
    import json

    import pyspark.sql.functions as F

    from multiversx_etl_spark.catalog import load_table_from_folder
    from multiversx_etl_spark.config import run_from_config, worker_config_from_dict
    from multiversx_etl_spark.lake.table import LakeTable
    from multiversx_etl_spark.sources.changelog import (
        generate_catalog_log,
        write_log_parquet,
    )

    folder = tmp_path / "schemas"
    folder.mkdir()
    v1 = [
        {"name": "_id", "type": "STRING", "mode": "REQUIRED"},
        {"name": "name", "type": "STRING"},
    ]
    (folder / "widgets.json").write_text(json.dumps(v1))
    log_path = str(tmp_path / "log")

    def cfg():
        return worker_config_from_dict({
            "name": "widgets", "schema": "widgets", "normalizer": "widgets",
            "schema_folder": str(folder),
            "table_root": str(tmp_path / "t"), "log_path": log_path,
            "interval_size": 250, "num_buckets": 4, "processing": "mutable",
        })

    cat1 = load_table_from_folder(str(folder), "widgets")
    write_log_parquet(
        generate_catalog_log(
            spark, 200, "widgets", num_keys=20, log_schema=cat1.log_schema
        ),
        log_path, files=2,
    )
    assert run_from_config(spark, cfg())["reconcile_ok"]

    # evolve the schema FILE, append a generation carrying the new column
    (folder / "widgets.json").write_text(json.dumps(
        v1 + [{"name": "score", "type": "INTEGER"}]
    ))
    cat2 = load_table_from_folder(str(folder), "widgets")
    generate_catalog_log(
        spark, 100, "widgets", num_keys=5, log_schema=cat2.log_schema,
        offset_base=250,
    ).write.mode("append").parquet(log_path)

    s2 = run_from_config(spark, cfg())
    assert s2["reconcile_ok"], s2
    out = LakeTable(spark, str(tmp_path / "t")).read()
    assert "score" in out.columns
    assert out.where(F.col("score").isNotNull()).count() > 0


def test_external_schema_in_post_transform_shape_loads(tmp_path):
    """The reference's OWN schema files declare the post-transform shape
    (no 'reserved' anywhere) — a deployment pointing schema_folder at them
    must load cleanly: every spec drop is idempotent, never a crash on an
    already-absent field (catalog.py _derive_target)."""
    import json

    from multiversx_etl_spark.catalog import load_table_from_folder

    # blocks WITHOUT pubKeyBitmap/reserved and WITHOUT the nested reserved —
    # and one variant missing the nested array entirely
    post = [
        {"name": "_id", "type": "STRING", "mode": "REQUIRED"},
        {"name": "round", "type": "NUMERIC"},
        {"name": "epochStartShardsData", "type": "RECORD", "mode": "REPEATED",
         "fields": [
             {"name": "shardID", "type": "NUMERIC"},
             {"name": "pendingMiniBlockHeaders", "type": "RECORD",
              "mode": "REPEATED",
              "fields": [{"name": "hash", "type": "STRING"}]},
         ]},
    ]
    (tmp_path / "blocks.json").write_text(json.dumps(post))
    cat = load_table_from_folder(str(tmp_path), "blocks")
    inner = (
        cat.target_schema["epochStartShardsData"].dataType
        .elementType["pendingMiniBlockHeaders"].dataType.elementType
    )
    assert "reserved" not in inner.fieldNames()

    flat = [
        {"name": "_id", "type": "STRING", "mode": "REQUIRED"},
        {"name": "round", "type": "NUMERIC"},
    ]
    (tmp_path / "blocks.json").write_text(json.dumps(flat))
    cat = load_table_from_folder(str(tmp_path), "blocks")
    assert cat.target_schema.fieldNames()[:2] == ["_id", "round"]


def test_external_raw_shape_schema_has_no_duplicate_log_columns(tmp_path):
    """An external accounts schema written in the RAW shape (api_* declared
    in the payload) must not double the volatile fields in the log schema —
    spark.read.schema() rejects duplicate column names outright."""
    import json

    from multiversx_etl_spark.catalog import load_table_from_folder

    raw = [
        {"name": "_id", "type": "STRING", "mode": "REQUIRED"},
        {"name": "balance", "type": "STRING"},
        {"name": "api_balance", "type": "STRING"},
    ]
    (tmp_path / "accounts.json").write_text(json.dumps(raw))
    cat = load_table_from_folder(str(tmp_path), "accounts")
    names = cat.log_schema.fieldNames()
    assert len(names) == len(set(names)), names
    assert names.count("api_balance") == 1
    # the normalizer still strips it from the target side
    assert "api_balance" not in cat.target_schema.fieldNames()


def test_multi_table_streaming_rejects_mutable_before_any_job(spark, tmp_path):
    """A mixed streaming iteration must fail BEFORE the first table job —
    not die halfway with 8 tables drained and an empty mutable table
    created (run_from_config validates the whole MultiWorkerConfig up
    front)."""
    import os

    from multiversx_etl_spark.config import (
        ConfigError,
        run_from_config,
        worker_config_from_dict,
    )
    from multiversx_etl_spark.sources.changelog import (
        generate_catalog_log,
        write_log_parquet,
    )

    log_path = str(tmp_path / "log")
    write_log_parquet(
        generate_catalog_log(spark, 100, "rounds", num_keys=10), log_path, files=2
    )
    cfg = worker_config_from_dict({
        "interval_size": 100, "num_buckets": 4,
        "tables": [
            {"name": "rounds", "schema": "rounds", "normalizer": "rounds",
             "table_root": str(tmp_path / "t_rounds"), "log_path": log_path},
            {"name": "accounts", "schema": "accounts", "normalizer": "accounts",
             "table_root": str(tmp_path / "t_accounts"), "log_path": log_path,
             "processing": "mutable"},
        ],
    })
    with pytest.raises(ConfigError, match="mutable"):
        run_from_config(
            spark, cfg, streaming=True, checkpoint_dir=str(tmp_path / "ckpt")
        )
    # nothing ran: neither table root exists, no checkpoint was cut
    assert not os.path.exists(str(tmp_path / "t_rounds"))
    assert not os.path.exists(str(tmp_path / "t_accounts"))


def test_gen_log_unknown_table_is_a_clean_cli_error(tmp_path):
    """gen-log --table with a typo'd index exits 2 with a one-line error
    BEFORE any Spark session is built — not a KeyError traceback."""
    import os
    import subprocess
    import sys

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    run = subprocess.run(
        [sys.executable, "-m", "multiversx_etl_spark", "gen-log",
         str(tmp_path / "log"), "--table", "acounts", "--events", "10"],
        capture_output=True, text=True, timeout=120,
        env={**os.environ, "PYTHONPATH": repo}, cwd=repo,
    )
    assert run.returncode == 2
    assert "unknown catalog index 'acounts'" in run.stderr
    assert "Traceback" not in run.stderr
