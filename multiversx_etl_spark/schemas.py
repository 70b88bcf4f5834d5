"""Declared schemas (the analog of the reference's schema/*.json system).

The reference declares one fixed BigQuery JSON schema per index and loads it
verbatim (/root/reference/multiversxetl/bq_client.py:86 ``schema_from_json``);
schemas are never inferred. We follow the same stance: every table the engine
touches has a StructType declared here.

Tables (see FIXTURES.md):
- ``change_events`` — the append-only CDC log (analog of the reference's
  append-only ES indices, /root/reference/multiversxetl/indexer.py:29-70).
- ``repos`` — the lakehouse target (BASELINE.json:input_hint shape) plus
  engine bookkeeping columns (``seq`` last-applied sequence, ``deleted``
  tombstone flag — tombstones prevent late lower-seq updates from
  resurrecting deleted keys).
- ``lineage`` — per-batch per-bucket ledger (analog of the reference's task
  status/lineage logging, /root/reference/multiversxetl/task.py:79-88 and
  tasks_dashboard.py:88-94).
"""

from __future__ import annotations

from pyspark.sql.types import (
    ArrayType,
    BooleanType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

#: Valid CDC operation kinds.
OPS = ("insert", "update", "delete")

#: The append-only change-event log. ``offset`` is the arrival position in
#: the log (Kafka-offset analog — what micro-batches slice on, mirroring the
#: reference's half-open [start, end) interval scans at indexer.py:61-70);
#: ``seq`` is the logical commit sequence (the dedup/ordering key). The two
#: differ because delivery is out-of-order and at-least-once.
CHANGE_EVENTS = StructType(
    [
        StructField("offset", LongType(), False),
        StructField("seq", LongType(), False),
        StructField("op", StringType(), False),
        StructField("repo", StringType(), False),
        StructField("path", StringType(), False),
        StructField("commit", StringType(), True),
        StructField("lang", StringType(), True),
        StructField("content", StringType(), True),
        StructField("event_ts", TimestampType(), True),
    ]
)

#: Payload columns carried from an event into the target (everything except
#: log bookkeeping). Order matters: it is the canonical column order.
PAYLOAD_COLUMNS = ["commit", "lang", "content", "event_ts"]

#: Upsert key (analog of the ES ``_id`` document key,
#: /root/reference/multiversxetl/tasks_runner.py:76).
KEY_COLUMNS = ["repo", "path"]

#: The lakehouse target table. ``deleted`` rows are tombstones retained in
#: storage and filtered by the public read view.
REPOS = StructType(
    [
        StructField("repo", StringType(), False),
        StructField("path", StringType(), False),
        StructField("commit", StringType(), True),
        StructField("lang", StringType(), True),
        StructField("content", StringType(), True),
        StructField("event_ts", TimestampType(), True),
        StructField("seq", LongType(), False),
        StructField("deleted", BooleanType(), False),
    ]
)

#: Nested shard metadata carried by commit events — the analog of the
#: reference's blocks.epochStartShardsData RECORD-REPEATED field whose
#: ``reserved`` subfield the BlocksTransformer strips
#: (/root/reference/multiversxetl/transformers.py:42-52,
#: /root/reference/schema/blocks.json).
_SHARD_INFO = ArrayType(
    StructType(
        [
            StructField("shard", IntegerType(), True),
            StructField("start_ts", LongType(), True),
            StructField("reserved", StringType(), True),  # dropped by normalize
        ]
    ),
    True,
)

#: Change-event log for the SECOND declared table (``commits``): key is
#: (repo, commit), payload carries a nested array<struct> (A8 drop-nested
#: operates on it) and a string array that may contain NULL elements (A9
#: scrubs them) — the reference's deeply nested per-index schemas
#: exercised end to end, not just registered.
COMMIT_EVENTS = StructType(
    [
        StructField("offset", LongType(), False),
        StructField("seq", LongType(), False),
        StructField("op", StringType(), False),
        StructField("repo", StringType(), False),
        StructField("commit", StringType(), False),
        StructField("author", StringType(), True),
        StructField("api_score", LongType(), True),  # volatile: dropped (A7)
        StructField("tags", ArrayType(StringType(), True), True),
        StructField("shards", _SHARD_INFO, True),
        StructField("event_ts", TimestampType(), True),
    ]
)

#: The ``commits`` lakehouse target (post-normalization: no volatile
#: ``api_*`` columns, ``shards[].reserved`` removed).
COMMITS = StructType(
    [
        StructField("repo", StringType(), False),
        StructField("commit", StringType(), False),
        StructField("author", StringType(), True),
        StructField("tags", ArrayType(StringType(), True), True),
        StructField(
            "shards",
            ArrayType(
                StructType(
                    [
                        StructField("shard", IntegerType(), True),
                        StructField("start_ts", LongType(), True),
                    ]
                ),
                True,
            ),
            True,
        ),
        StructField("event_ts", TimestampType(), True),
        StructField("seq", LongType(), False),
        StructField("deleted", BooleanType(), False),
    ]
)

#: The remaining declared tables come from the DEPLOYMENT CATALOG
#: (catalog.py): every ``bq_schemas/*.json`` file — the full set of the
#: reference's 17 indices — loads into (log schema, target schema, key)
#: with its TransformSpec driving the target derivation, exactly the
#: data-driven path the reference uses (schema/*.json + bq_client.py:86
#: schema_from_json, resolved by index name).
from multiversx_etl_spark.catalog import catalog_tables as _catalog_tables

_CATALOG = _catalog_tables()

#: ``blocks`` aliases (the shipped loader example — 2-deep RECORD REPEATED
#: nesting with ``reserved`` subfields the BlocksTransformer strips,
#: transformers.py:42-52; NUMERIC→decimal(38,9) leaves; REQUIRED ``_id``).
BLOCK_PAYLOAD = _CATALOG["blocks"].payload
BLOCK_EVENTS = _CATALOG["blocks"].log_schema
BLOCKS = _CATALOG["blocks"].target_schema

#: Declared-table registry (the analog of the reference's schema/*.json
#: directory loaded by name at bq_client.py:86): table name → (log schema,
#: target schema, upsert key). Every table the engine ingests resolves
#: through here — schemas are declared, never inferred. ``repos`` and
#: ``commits`` are the engine's own fixtures; the rest is the reference's
#: index catalog.
TABLES: dict[str, tuple[StructType, StructType, list[str]]] = {
    "repos": (CHANGE_EVENTS, REPOS, ["repo", "path"]),
    "commits": (COMMIT_EVENTS, COMMITS, ["repo", "commit"]),
    **{
        name: (t.log_schema, t.target_schema, list(t.key_columns))
        for name, t in _CATALOG.items()
    },
}

#: Per-batch, per-bucket lineage ledger (FIXTURES.md §3).
LINEAGE = StructType(
    [
        StructField("stream_id", StringType(), False),
        StructField("epoch_id", LongType(), False),
        StructField("bucket", IntegerType(), False),
        StructField("offset_lo", LongType(), False),
        StructField("offset_hi", LongType(), False),
        StructField("rows_in", LongType(), False),
        StructField("rows_deduped", LongType(), False),
        StructField("rows_inserted", LongType(), False),
        StructField("rows_updated", LongType(), False),
        StructField("rows_deleted", LongType(), False),
        StructField("committed_at", TimestampType(), False),
    ]
)
