"""BQ-JSON schema loader + the data-driven ``blocks`` declared table.

Mirrors the reference's schema system end to end: schema FILE → StructType
(bq_client.py:86 schema_from_json analog) → registry entry → MERGE with the
BlocksTransformer-analog normalizer → MOR fold → independent DuckDB LWW
oracle over the same log, nested columns included.
"""

from __future__ import annotations

import pytest
from pyspark.sql.types import ArrayType, DecimalType, LongType, StructType

from multiversx_etl_spark.sources.bq_schema import (
    drop_schema_field,
    struct_type_from_bq_json,
)


def test_loader_types_modes_and_nesting():
    st = struct_type_from_bq_json(
        [
            {"name": "k", "type": "STRING", "mode": "REQUIRED"},
            {"name": "n", "type": "NUMERIC"},
            {"name": "i", "type": "INTEGER"},
            {"name": "tags", "type": "STRING", "mode": "REPEATED"},
            {
                "name": "rec",
                "type": "RECORD",
                "mode": "REPEATED",
                "fields": [{"name": "x", "type": "INT64"}],
            },
        ]
    )
    assert not st["k"].nullable and st["n"].dataType == DecimalType(38, 9)
    assert st["i"].dataType == LongType()
    assert isinstance(st["tags"].dataType, ArrayType)
    rec = st["rec"].dataType
    assert isinstance(rec, ArrayType) and isinstance(rec.elementType, StructType)
    assert rec.elementType["x"].dataType == LongType()


def test_loader_rejects_bad_input():
    with pytest.raises(ValueError, match="unsupported"):
        struct_type_from_bq_json([{"name": "x", "type": "BIGNUMERIC"}])
    with pytest.raises(ValueError, match="without a name"):
        struct_type_from_bq_json([{"type": "STRING"}])
    with pytest.raises(ValueError, match="no 'fields'"):
        struct_type_from_bq_json([{"name": "r", "type": "RECORD"}])
    with pytest.raises(ValueError, match="unknown mode"):
        struct_type_from_bq_json([{"name": "x", "type": "STRING", "mode": "MAYBE"}])
    with pytest.raises(ValueError, match="must be an array"):
        struct_type_from_bq_json({"name": "x"})  # type: ignore[arg-type]


def test_drop_schema_field_nested_and_missing():
    from multiversx_etl_spark.schemas import BLOCK_PAYLOAD

    cut = drop_schema_field(
        BLOCK_PAYLOAD, ["epochStartShardsData", "pendingMiniBlockHeaders", "reserved"]
    )
    mb = cut["epochStartShardsData"].dataType.elementType["pendingMiniBlockHeaders"]
    assert "reserved" not in mb.dataType.elementType.fieldNames()
    # untouched siblings survive
    assert "headerHash" in cut["epochStartShardsData"].dataType.elementType.fieldNames()
    with pytest.raises(ValueError, match="not found"):
        drop_schema_field(BLOCK_PAYLOAD, ["nope"])


def test_blocks_registry_schema_consistency():
    """Target schema derives from the SAME file as the log schema minus the
    normalizer's drops — no drift possible."""
    from multiversx_etl_spark.schemas import BLOCK_EVENTS, BLOCKS, TABLES

    assert TABLES["blocks"] == (BLOCK_EVENTS, BLOCKS, ["_id"])
    assert "pubKeyBitmap" in BLOCK_EVENTS.fieldNames()
    assert "pubKeyBitmap" not in BLOCKS.fieldNames()
    assert "reserved" not in BLOCKS.fieldNames()
    inner = (
        BLOCKS["epochStartShardsData"].dataType.elementType["pendingMiniBlockHeaders"]
        .dataType.elementType.fieldNames()
    )
    assert "reserved" not in inner and "hash" in inner


def test_nested_drop_preserves_null_elements(spark):
    """The HOF rebuild must not resurrect NULL array elements / NULL nested
    structs as non-null structs-of-nulls — the drop touches ONLY the doomed
    field (review finding, round 4)."""
    from multiversx_etl_spark.operators.normalize import (
        drop_nested_field_path,
        drop_nested_struct_field,
    )

    df = spark.createDataFrame(
        [
            (1, [{"a": 1, "reserved": "x", "inner": [{"h": "k", "reserved": "y"}]}]),
            (2, [None]),
            (3, [{"a": 2, "reserved": "z", "inner": [None]}]),
            (4, None),
        ],
        "id int, arr array<struct<a int, reserved string, "
        "inner array<struct<h string, reserved string>>>>",
    )
    out = drop_nested_field_path(df, "arr", ["inner", "reserved"])
    rows = {r["id"]: r["arr"] for r in out.collect()}
    assert rows[2] == [None]            # NULL element stays NULL
    assert rows[4] is None              # NULL column stays NULL
    assert rows[3][0]["inner"] == [None]  # NULL nested element stays NULL
    assert rows[1][0]["inner"][0].asDict() == {"h": "k"}
    assert "reserved" in rows[1][0].asDict()  # only the pathed field dropped

    out2 = drop_nested_struct_field(df, "arr", "reserved")
    rows2 = {r["id"]: r["arr"] for r in out2.collect()}
    assert rows2[2] == [None] and rows2[4] is None
    assert "reserved" not in rows2[1][0].asDict()


def test_blocks_merge_matches_duckdb_fold(spark, tmp_path):
    """Independent oracle for the BQ-JSON-declared table: DuckDB applies the
    same normalization + LWW fold over the block log and must agree with the
    engine's MERGE → MOR-fold read, 2-deep nested columns included."""
    import duckdb

    from multiversx_etl_spark.operators.normalize import normalize_block_events
    from multiversx_etl_spark.schemas import TABLES
    from multiversx_etl_spark.sources.changelog import (
        generate_block_log,
        write_log_parquet,
    )
    from multiversx_etl_spark.streaming.ingest import ensure_table, replay

    log_path = str(tmp_path / "log")
    write_log_parquet(generate_block_log(spark, 500, num_blocks=40), log_path, files=2)
    _, target_schema, key = TABLES["blocks"]
    table = ensure_table(
        spark, str(tmp_path / "t"), num_buckets=4,
        schema=target_schema, key_columns=key,
    )
    replay(
        spark.read.parquet(log_path), table, interval_size=200,
        normalizer=normalize_block_events,
    )

    def canon(rows):
        return {
            (
                r["_id"], r["epoch"], r["round"], r["shardId"],
                r["epochStartBlock"], r["gasConsumed"], r["proposer"],
                r["timestamp"],
                tuple(
                    (
                        s["shardId"], s["headerHash"], s["rootHash"],
                        tuple(
                            (m["hash"], m["senderShard"], m["receiverShard"], m["type"])
                            for m in s["pendingMiniBlockHeaders"]
                        ),
                    )
                    for s in r["epochStartShardsData"]
                ),
                r["seq"],
            )
            for r in rows
        }

    got = canon(table.read().collect())
    con = duckdb.connect()
    oracle = con.execute(f"""
        WITH norm AS (
          SELECT seq, op, _id, epoch, round, shardId, epochStartBlock,
                 gasConsumed, proposer, timestamp,
                 list_transform(epochStartShardsData, s -> {{
                    'shardId': s.shardId,
                    'headerHash': s.headerHash,
                    'rootHash': s.rootHash,
                    'pendingMiniBlockHeaders': list_transform(
                        s.pendingMiniBlockHeaders,
                        m -> {{'hash': m.hash, 'senderShard': m.senderShard,
                               'receiverShard': m.receiverShard,
                               'type': m."type"}})
                 }}) AS shards
          FROM read_parquet('{log_path}/*.parquet')
        ),
        w AS (
          SELECT *, row_number() OVER (PARTITION BY _id ORDER BY seq DESC) AS rn
          FROM norm
        )
        SELECT _id, epoch, round, shardId, epochStartBlock, gasConsumed,
               proposer, timestamp, shards, seq
        FROM w WHERE rn = 1 AND op <> 'delete'
    """).fetchall()
    con.close()
    want = {
        (
            _id, epoch, rnd, shard, esb, gas, proposer, ts,
            tuple(
                (
                    s["shardId"], s["headerHash"], s["rootHash"],
                    tuple(
                        (m["hash"], m["senderShard"], m["receiverShard"], m["type"])
                        for m in s["pendingMiniBlockHeaders"]
                    ),
                )
                for s in shards
            ),
            seq,
        )
        for _id, epoch, rnd, shard, esb, gas, proposer, ts, shards, seq in oracle
    }
    assert got == want and len(got) > 0


def test_blocks_through_worker_config(spark, tmp_path):
    """The config surface reaches the BQ-declared table by name."""
    from multiversx_etl_spark.config import run_from_config, worker_config_from_dict
    from multiversx_etl_spark.sources.changelog import (
        generate_block_log,
        write_log_parquet,
    )

    log_path = str(tmp_path / "log")
    write_log_parquet(generate_block_log(spark, 300, num_blocks=30), log_path, files=2)
    cfg = worker_config_from_dict({
        "name": "blocks",
        "table_root": str(tmp_path / "t"),
        "log_path": log_path,
        "schema": "blocks",
        "normalizer": "block_events",
        "interval_size": 150,
        "num_buckets": 4,
    })
    s = run_from_config(spark, cfg)
    assert s["reconcile_ok"] and s["epochs_run"] >= 2
