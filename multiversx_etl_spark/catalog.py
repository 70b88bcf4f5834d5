"""The deployment catalog: every reference index as a declared table.

The reference operates on a fixed catalog of indices — 17 BigQuery JSON
schema files under /root/reference/schema/ loaded verbatim by name
(bq_client.py:86 ``schema_from_json``), four of which carry a non-trivial
per-index transformer (transformers.py:6-17 ``TransformersRegistry``:
``accounts`` drops volatile ``api_*`` fields, ``tokens`` drops ``nft_*`` +
``api_*``, ``blocks`` drops ``pubKeyBitmap``/``reserved`` plus the 2-deep
nested ``epochStartShardsData[].pendingMiniBlockHeaders[].reserved``, and
``events`` scrubs NULL elements out of REPEATED string arrays) and the rest
load as-is.

This module is that catalog, Spark-first and drift-proof: ONE declarative
``TransformSpec`` per table drives BOTH
- the TARGET SCHEMA derivation (payload minus the spec's drops, computed by
  ``sources.bq_schema.drop_schema_field`` over the loaded StructType), and
- the runtime NORMALIZER (``operators.normalize.normalizer_from_spec`` —
  pure JVM column expressions),
so the declared lake schema and the transformer can never disagree: both
are functions of the same spec and the same schema file.

The schema files under ``multiversx_etl_spark/bq_schemas/`` are compact
authored subsets of the reference's per-index data model (field names and
types from /root/reference/schema/*.json, trimmed to the representative
structure). A deployment drops in its full JSON files — same format — and
the catalog picks them up by filename.

Log-vs-target split: the reference's volatile fields (``api_*``, ``nft_*``)
exist only in RAW indexer documents — its schema files declare the
post-transform shape. The catalog mirrors that: ``volatile_fields`` extend
the LOG schema only (raw change events carry them; the normalizer strips
them before MERGE), while the target derives from the declared payload.
"""

from __future__ import annotations

import json
from dataclasses import dataclass
from importlib import resources as _resources
from typing import NamedTuple

from pyspark.sql.types import (
    BooleanType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from multiversx_etl_spark.sources.bq_schema import (
    drop_schema_field,
    schema_has_path,
    struct_type_from_bq_json,
)


@dataclass(frozen=True)
class TransformSpec:
    """Declarative per-table transform (the TransformersRegistry analog,
    transformers.py:6-17) — consumed twice: by the target-schema derivation
    here and by ``normalize.normalizer_from_spec``."""

    #: drop every column whose name starts with one of these (volatile raw
    #: fields — AccountsTransformer/TokensTransformer, transformers.py:31-64)
    drop_prefixes: tuple[str, ...] = ()
    #: drop these exact top-level columns (BlocksTransformer pops
    #: pubKeyBitmap/reserved, transformers.py:44-45)
    drop_fields: tuple[str, ...] = ()
    #: drop the field at each nested path, descending struct/array levels
    #: (BlocksTransformer's epochStartShardsData[].pendingMiniBlockHeaders
    #: [].reserved, transformers.py:47-50)
    nested_drops: tuple[tuple[str, ...], ...] = ()
    #: replace NULL elements of top-level string arrays with "" (BQ REPEATED
    #: rejects NULLs — EventsTransformer, transformers.py:67-77)
    scrub_null_arrays: bool = False
    #: raw-only (name, BQ type) fields present in change events but not in
    #: the declared payload; they extend the LOG schema and are dropped by
    #: ``drop_prefixes``/``drop_fields`` before the MERGE
    volatile_fields: tuple[tuple[str, str], ...] = ()


#: Per-index specs — exactly the reference's four non-trivial transformers;
#: every other index gets the identity spec (trivial_transformer,
#: transformers.py:8,17).
SPECS: dict[str, TransformSpec] = {
    "accounts": TransformSpec(
        drop_prefixes=("api_",),
        volatile_fields=(("api_balance", "STRING"), ("api_nonce", "INTEGER")),
    ),
    "tokens": TransformSpec(
        drop_prefixes=("nft_", "api_"),
        volatile_fields=(
            ("nft_hash", "STRING"),
            ("nft_traits", "STRING"),
            ("api_holderCount", "INTEGER"),
        ),
    ),
    "blocks": TransformSpec(
        drop_fields=("pubKeyBitmap", "reserved"),
        nested_drops=(
            ("epochStartShardsData", "pendingMiniBlockHeaders", "reserved"),
        ),
    ),
    "events": TransformSpec(scrub_null_arrays=True),
}

DEFAULT_SPEC = TransformSpec()

#: CDC bookkeeping prepended to every log schema (same columns as
#: schemas.CHANGE_EVENTS: arrival offset, commit seq, operation).
_BOOKKEEPING = [
    StructField("offset", LongType(), False),
    StructField("seq", LongType(), False),
    StructField("op", StringType(), False),
]


class CatalogTable(NamedTuple):
    payload: StructType        # the declared (post-transform-shape) payload
    log_schema: StructType     # bookkeeping + payload + volatile raw fields
    target_schema: StructType  # payload minus spec drops, + seq/deleted
    key_columns: tuple[str, ...]
    spec: TransformSpec


def _derive_target(payload: StructType, spec: TransformSpec) -> StructType:
    """Target payload = declared payload minus the spec's drops (the
    schema-side twin of the normalizer; both read the same spec). Every
    drop is IDEMPOTENT — absent fields/paths are skipped, mirroring the
    normalizer's tolerance — because external schema files (the reference's
    own ``schema/*.json`` included) may already declare the post-transform
    shape."""
    out = payload
    for name in spec.drop_fields:
        if name in out.fieldNames():
            out = drop_schema_field(out, [name])
    if spec.drop_prefixes:
        out = StructType(
            [f for f in out.fields if not f.name.startswith(spec.drop_prefixes)]
        )
    for path in spec.nested_drops:
        if schema_has_path(out, list(path)):
            out = drop_schema_field(out, list(path))
    return out


def _load_one(name: str, payload: StructType) -> CatalogTable:
    spec = SPECS.get(name, DEFAULT_SPEC)
    # volatile raw fields extend the log schema ONLY when the payload does
    # not already declare them: an external schema file written in the RAW
    # shape (api_*/nft_* present) must not produce duplicate column names —
    # spark.read.schema() would reject the whole table as ambiguous
    declared = set(payload.fieldNames())
    volatile = (
        [
            f
            for f in struct_type_from_bq_json(
                [{"name": n, "type": t} for n, t in spec.volatile_fields]
            ).fields
            if f.name not in declared
        ]
        if spec.volatile_fields
        else []
    )
    log_schema = StructType(_BOOKKEEPING + list(payload.fields) + volatile)
    tgt = _derive_target(payload, spec)
    target_schema = StructType(
        list(tgt.fields)
        + [
            StructField("seq", LongType(), False),
            StructField("deleted", BooleanType(), False),
        ]
    )
    return CatalogTable(
        payload=payload,
        log_schema=log_schema,
        target_schema=target_schema,
        key_columns=("_id",),
        spec=spec,
    )


def catalog_tables() -> dict[str, CatalogTable]:
    """Load every ``bq_schemas/*.json`` into a declared table — the analog
    of the reference resolving ``{schema_folder}/{index}.json`` by name
    (bq_client.py:84-87). importlib.resources, not ``__file__``: on a
    cluster the package imports from the ``--py-files`` zip."""
    out: dict[str, CatalogTable] = {}
    root = _resources.files("multiversx_etl_spark").joinpath("bq_schemas")
    for entry in sorted(root.iterdir(), key=lambda e: e.name):
        if not entry.name.endswith(".json"):
            continue
        name = entry.name[: -len(".json")]
        payload = struct_type_from_bq_json(json.loads(entry.read_text()))
        out[name] = _load_one(name, payload)
    return out


def load_table_from_folder(folder: str, name: str) -> CatalogTable:
    """Resolve a declared table from an EXTERNAL schema folder — the
    reference's ``schema_folder`` worker-config key (its configs carry
    ``"schema_folder": "./schema"`` and bq_client.py:84-87 loads
    ``{folder}/{index}.json`` by name). Deployments ship their own schema
    files without touching the packaged catalog; the TransformSpec still
    resolves by table name (transformers are code, schemas are data —
    exactly the reference's split). Because the SCHEMA FILE is the source
    of truth, editing it (adding a field) flows straight into the next
    run's declared log/target schemas — the lake table evolves on the next
    MERGE."""
    import os

    return load_table_from_file(os.path.join(folder, f"{name}.json"), name)


def load_table_from_file(path: str, name: str | None = None) -> CatalogTable:
    """Resolve a declared table from ONE schema file — the shape of the
    reference's maintenance pushes, which name a file directly (``bq update
    <table> schema/<index>.json``, maintenance/schemas.md:13-28). ``name``
    picks the TransformSpec (default: the filename stem, exactly how the
    folder/catalog paths resolve it)."""
    import os

    if name is None:
        name = os.path.basename(path)
        if name.endswith(".json"):
            name = name[: -len(".json")]
    with open(path) as fh:
        payload = struct_type_from_bq_json(json.load(fh))
    return _load_one(name, payload)


def catalog_table_names() -> list[str]:
    root = _resources.files("multiversx_etl_spark").joinpath("bq_schemas")
    return sorted(
        e.name[: -len(".json")] for e in root.iterdir() if e.name.endswith(".json")
    )
