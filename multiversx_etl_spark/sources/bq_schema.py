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


def _deep_nullable(dt: DataType) -> DataType:
    """Deep-nullable copy: columns added out-of-band have no values in any
    existing file, so they (and everything inside them) must read as NULL."""
    from pyspark.sql.types import MapType

    if isinstance(dt, StructType):
        return StructType(
            [StructField(f.name, _deep_nullable(f.dataType), True) for f in dt.fields]
        )
    if isinstance(dt, ArrayType):
        return ArrayType(_deep_nullable(dt.elementType), True)
    if isinstance(dt, MapType):
        return MapType(dt.keyType, _deep_nullable(dt.valueType), True)
    return dt


def is_type_promotion(frm: DataType, to: DataType) -> bool:
    """Iceberg-legal widening type promotions, restricted to the set the
    Spark 4 parquet reader provably upcasts IN PLACE (probed empirically:
    existing files read under the widened schema with no rewrite, nested
    levels included): byte -> short -> int -> long, float -> double, and
    decimal(p, s) -> decimal(p', s) with p' > p (same scale — rescaling
    would change stored values, so it is not a metadata-only change).
    Anything else (string <-> numeric, long -> int, scale changes,
    date -> timestamp) is NOT a promotion."""
    from pyspark.sql.types import (
        ByteType,
        DecimalType,
        DoubleType,
        FloatType,
        IntegerType,
        LongType,
        ShortType,
    )

    order = {ByteType: 0, ShortType: 1, IntegerType: 2, LongType: 3}
    fi, ti = order.get(type(frm)), order.get(type(to))
    if fi is not None and ti is not None:
        return fi < ti
    if isinstance(frm, FloatType) and isinstance(to, DoubleType):
        return True
    if isinstance(frm, DecimalType) and isinstance(to, DecimalType):
        return to.scale == frm.scale and to.precision > frm.precision
    return False


def merge_widening(
    old: StructType, new: StructType, allow_missing_in_new: bool = False
) -> StructType:
    """Widened union of two schemas — the validation half of the reference's
    out-of-band ``bq update <table> schema/<index>.json`` maintenance flow
    (maintenance/schemas.md:13-28), which BigQuery accepts only when the
    pushed schema is ADDITIVE (new nullable fields, anywhere in the nesting)
    or RELAXING (REQUIRED → NULLABLE). Anything else raises with the
    offending dotted path:

    - a field the table has but ``new`` lacks (removals are not expressible
      against immutable data files — drop it from NEW data with a normalizer
      instead),
    - a changed leaf type or a changed kind (struct vs array vs scalar) —
      EXCEPT Iceberg-legal widening promotions (``is_type_promotion``:
      byte/short/int -> long, float -> double, decimal precision growth at
      the same scale), which commit as metadata only: the parquet reader
      upcasts existing files in place.

    Field order: ``old``'s fields first (existing readers see a stable
    column order), new fields appended at each nesting level, deep-nullable
    (existing files read them as NULL). Nullability widens monotonically —
    once nullable, always nullable — so a ``new`` that tightens NULLABLE →
    REQUIRED is silently kept nullable rather than rejected: lake files
    already hold rows predating the tightening.

    ``allow_missing_in_new=True`` switches the drop rule off: a field
    ``old`` has but ``new`` lacks is KEPT (pure union). That is the REBASE
    mode ``update_schema`` retries use after losing an optimistic race —
    the field missing from the pushed file is a RIVAL commit's concurrent
    addition, not an operator-requested removal, and must never be
    clobbered. First attempts stay strict."""
    from pyspark.sql.types import MapType

    def merge_type(old_dt: DataType, new_dt: DataType, path: str) -> DataType:
        if isinstance(old_dt, StructType) and isinstance(new_dt, StructType):
            return merge_struct(old_dt, new_dt, path)
        if isinstance(old_dt, ArrayType) and isinstance(new_dt, ArrayType):
            return ArrayType(
                merge_type(old_dt.elementType, new_dt.elementType, path + "[]"),
                old_dt.containsNull or new_dt.containsNull,
            )
        if isinstance(old_dt, MapType) and isinstance(new_dt, MapType):
            if old_dt.keyType != new_dt.keyType:
                raise ValueError(
                    f"schema update changes map key type at {path!r}: "
                    f"{old_dt.keyType.simpleString()} -> "
                    f"{new_dt.keyType.simpleString()}"
                )
            return MapType(
                old_dt.keyType,
                merge_type(old_dt.valueType, new_dt.valueType, path + "{}"),
                old_dt.valueContainsNull or new_dt.valueContainsNull,
            )
        if old_dt != new_dt:
            # Iceberg-legal type PROMOTIONS are metadata-only: the parquet
            # reader upcasts existing files in place (is_type_promotion
            # lists exactly the probed-safe set)
            if is_type_promotion(old_dt, new_dt):
                return new_dt
            if allow_missing_in_new and is_type_promotion(new_dt, old_dt):
                # rebase: a rival commit already promoted PAST the pushed
                # file's type — keep the wider live type, never narrow
                return old_dt
            raise ValueError(
                f"schema update changes the type at {path!r}: "
                f"{old_dt.simpleString()} -> {new_dt.simpleString()} "
                "(only widening promotions — byte/short/int -> long, "
                "float -> double, decimal precision growth at the same "
                "scale — can be applied over immutable data files)"
            )
        return old_dt

    def merge_struct(o: StructType, n: StructType, path: str) -> StructType:
        prefix = path + "." if path else ""
        new_by_name = {f.name: f for f in n.fields}
        out: list[StructField] = []
        for f in o.fields:
            nf = new_by_name.get(f.name)
            if nf is None:
                if allow_missing_in_new:
                    out.append(f)  # rebase: keep the rival's addition
                    continue
                raise ValueError(
                    f"schema update drops {prefix + f.name!r} — removals are "
                    "not supported (existing files keep the column; strip it "
                    "from new data with a normalizer drop instead)"
                )
            out.append(
                StructField(
                    f.name,
                    merge_type(f.dataType, nf.dataType, prefix + f.name),
                    f.nullable or nf.nullable,
                )
            )
        old_names = {f.name for f in o.fields}
        for f in n.fields:
            if f.name not in old_names:
                out.append(StructField(f.name, _deep_nullable(f.dataType), True))
        return StructType(out)

    return merge_struct(old, new, "")


def schema_added_paths(old: StructType, new: StructType) -> list[str]:
    """Dotted paths of fields present in ``new`` but not ``old``, descending
    struct / array<struct> / map-value levels — the delta an out-of-band
    schema push reports (and tests assert on)."""
    from pyspark.sql.types import MapType

    out: list[str] = []

    def walk(o: DataType, n: DataType, path: str) -> None:
        if isinstance(o, ArrayType) and isinstance(n, ArrayType):
            walk(o.elementType, n.elementType, path)
            return
        if isinstance(o, MapType) and isinstance(n, MapType):
            walk(o.valueType, n.valueType, path)
            return
        if not (isinstance(o, StructType) and isinstance(n, StructType)):
            return
        old_by_name = {f.name: f for f in o.fields}
        prefix = path + "." if path else ""
        for f in n.fields:
            if f.name not in old_by_name:
                out.append(prefix + f.name)
            else:
                walk(old_by_name[f.name].dataType, f.dataType, prefix + f.name)

    walk(old, new, "")
    return out


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
