"""multiversx_etl_spark — a PySpark-native CDC / incremental-ingest engine.

Rebuilt from scratch in the spirit of multiversx/multiversx-etl (reference at
/root/reference, MIT): an append-only change-event log keyed by (repo, path)
is tailed in micro-batches and applied as key-partitioned MERGE upserts into a
bucketed lakehouse table of source-code repositories, with exactly-once
resumable replay, per-key max-commit-sequence dedup, schema evolution, skew
handling and per-partition lineage.

The reference (see SURVEY.md) is a Python orchestrator around Elasticsearch →
NDJSON → BigQuery; this engine re-expresses every capability Spark-first:
DataFrame transformations end-to-end, Arrow-vectorized UDFs only where
built-ins cannot express the semantics, and a manifest-snapshot storage layer
standing in for Apache Iceberg (no Iceberg runtime jar ships in this sandbox;
the layer exposes the same MERGE / rollback / time-travel / atomic-commit
semantics so the engine maps 1:1 onto Iceberg on a real cluster).
"""

__version__ = "0.1.0"
