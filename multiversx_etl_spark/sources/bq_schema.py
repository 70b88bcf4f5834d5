"""BigQuery-JSON schema files → Spark StructTypes (declared, data-driven).

The reference declares one BigQuery JSON schema per index and loads it
verbatim at runtime (/root/reference/multiversxetl/bq_client.py:86
``schema_from_json``; 17 files under /root/reference/schema/). This module
is that loader's Spark analog: the SAME file format (a JSON array of
``{name, type, mode?, fields?}`` field objects, arbitrarily nested via
RECORD/REPEATED) parses into a ``StructType``, so a deployment's schemas
live as data files next to its worker config instead of hand-written
StructTypes in code. ``multiversx_etl_spark/bq_schemas/blocks.json`` is the
shipped example (a trimmed blocks-style schema with the reference's
structural hard parts: 2-deep RECORD REPEATED nesting carrying ``reserved``
subfields, NUMERIC/TIMESTAMP/FLOAT/INTEGER/BOOLEAN leaves, a REQUIRED key).
"""

from __future__ import annotations

import json
from typing import Any

from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    BooleanType,
    DataType,
    DateType,
    DecimalType,
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampNTZType,
    TimestampType,
)

#: BigQuery leaf type → Spark type. NUMERIC is BQ's decimal(38, 9); INTEGER
#: is int64. TIME/GEOGRAPHY/JSON have no Spark scalar — they land as
#: strings, the same lossless-by-representation stance BQ's JSON export
#: takes. BIGNUMERIC (precision 76) exceeds Spark's decimal(38) and is
#: rejected rather than silently truncated.
_TYPE_MAP: dict[str, DataType] = {
    "STRING": StringType(),
    "BYTES": BinaryType(),
    "INTEGER": LongType(),
    "INT64": LongType(),
    "FLOAT": DoubleType(),
    "FLOAT64": DoubleType(),
    "NUMERIC": DecimalType(38, 9),
    "BOOLEAN": BooleanType(),
    "BOOL": BooleanType(),
    "TIMESTAMP": TimestampType(),
    "DATETIME": TimestampNTZType(),
    "DATE": DateType(),
    "TIME": StringType(),
    "GEOGRAPHY": StringType(),
    "JSON": StringType(),
}


def _field_from_bq(d: dict[str, Any]) -> StructField:
    name = d.get("name")
    if not name:
        raise ValueError(f"BQ schema field without a name: {d!r}")
    mode = str(d.get("mode", "NULLABLE")).upper()
    if mode not in ("NULLABLE", "REQUIRED", "REPEATED"):
        raise ValueError(f"field {name!r}: unknown mode {mode!r}")
    t = str(d.get("type", "RECORD")).upper()
    if t in ("RECORD", "STRUCT"):
        fields = d.get("fields")
        if not fields:
            raise ValueError(f"RECORD field {name!r} has no 'fields'")
        dt: DataType = StructType([_field_from_bq(f) for f in fields])
    elif t in _TYPE_MAP:
        dt = _TYPE_MAP[t]
    else:
        raise ValueError(f"field {name!r}: unsupported BigQuery type {t!r}")
    if mode == "REPEATED":
        # BQ REPEATED rejects NULL elements (the reference's EventsTransformer
        # scrubs them, transformers.py:67-77); Spark-side we keep elements
        # nullable and let the normalizer scrub — lake columns stay nullable.
        return StructField(name, ArrayType(dt, True), True)
    return StructField(name, dt, mode != "REQUIRED")


def struct_type_from_bq_json(source: str | list[dict[str, Any]]) -> StructType:
    """Parse a BigQuery JSON schema (path or already-loaded list) into a
    StructType — the ``bq_client.schema_from_json`` analog."""
    if isinstance(source, str):
        with open(source) as fh:
            source = json.load(fh)
    if not isinstance(source, list):
        raise ValueError("BQ schema JSON must be an array of field objects")
    return StructType([_field_from_bq(f) for f in source])


def drop_schema_field(schema: StructType, path: list[str]) -> StructType:
    """The declared-schema counterpart of the normalizer's nested drops: the
    StructType with the field at ``path`` removed, descending through
    structs AND array<struct> levels (e.g. ``["epochStartShardsData",
    "pendingMiniBlockHeaders", "reserved"]``). Raises if the path does not
    resolve — a target schema silently keeping a field the normalizer
    strips would make every MERGE write NULLs into it."""

    def descend(dt: DataType, path: list[str]) -> DataType:
        if isinstance(dt, ArrayType):
            return ArrayType(descend(dt.elementType, path), dt.containsNull)
        if not isinstance(dt, StructType):
            raise ValueError(f"cannot descend into {dt.simpleString()} at {path}")
        head, *rest = path
        out, hit = [], False
        for f in dt.fields:
            if f.name != head:
                out.append(f)
                continue
            hit = True
            if rest:
                out.append(StructField(f.name, descend(f.dataType, rest), f.nullable))
        if not hit:
            raise ValueError(f"field {head!r} not found while dropping {path}")
        return StructType(out)

    return descend(schema, path)  # type: ignore[return-value]


def schema_has_path(schema: StructType, path: list[str]) -> bool:
    """True when ``path`` resolves in ``schema`` under the same descent
    rules as :func:`drop_schema_field` (structs and array<struct> levels).
    Lets a caller make drops idempotent: the reference's own schema files
    declare the POST-transform shape (no ``reserved`` anywhere), so a
    deployment pointing ``schema_folder`` at them must not crash on a drop
    that already happened."""

    def descend(dt: DataType, path: list[str]) -> bool:
        if isinstance(dt, ArrayType):
            return descend(dt.elementType, path)
        if not isinstance(dt, StructType):
            return False
        head, *rest = path
        for f in dt.fields:
            if f.name == head:
                return descend(f.dataType, rest) if rest else True
        return False

    return descend(schema, path)
