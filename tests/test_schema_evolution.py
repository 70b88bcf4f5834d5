"""Schema evolution mid-stream: added and dropped columns across batches
(the reference's analog is volatile api_*/nft_* column churn handled by
transformers + out-of-band `bq update` schema pushes,
/root/reference/multiversxetl/transformers.py:31-64,
/root/reference/maintenance/schemas.md:13-28). Here evolution is part of the
same atomic MERGE commit: new columns append to the manifest schema, old
files read them as NULL, and batches missing a column write NULL."""

from __future__ import annotations

import pyspark.sql.functions as F

from multiversx_etl_spark.operators.merge import merge_batch
from multiversx_etl_spark.streaming.ingest import ensure_table


def _batch(spark, rows, columns):
    return spark.createDataFrame(rows, columns)


BASE_COLS = ["offset", "seq", "op", "repo", "path", "commit", "lang", "content"]


def test_added_column_appears_and_backfills_null(spark, tmp_path):
    table = ensure_table(spark, str(tmp_path / "t"), num_buckets=4)
    b1 = _batch(
        spark,
        [(0, 0, "insert", "r1", "a.py", "c0", "python", "v0")],
        BASE_COLS,
    )
    merge_batch(table, b1, "main", 0, 0, 1)

    # batch 2 arrives with a NEW column `license`
    b2 = _batch(
        spark,
        [(1, 1, "insert", "r1", "b.py", "c1", "go", "v1", "mit")],
        BASE_COLS + ["license"],
    )
    merge_batch(table, b2, "main", 1, 1, 2)

    out = {r["path"]: r for r in table.read().collect()}
    assert "license" in table.snapshot().schema.fieldNames()
    assert out["a.py"]["license"] is None  # old file read under evolved schema
    assert out["b.py"]["license"] == "mit"


def test_dropped_column_writes_null_for_new_rows(spark, tmp_path):
    table = ensure_table(spark, str(tmp_path / "t"), num_buckets=4)
    b1 = _batch(
        spark,
        [(0, 0, "insert", "r1", "a.py", "c0", "python", "v0")],
        BASE_COLS,
    )
    merge_batch(table, b1, "main", 0, 0, 1)

    # batch 2 no longer carries `lang` (dropped upstream)
    cols = [c for c in BASE_COLS if c != "lang"]
    b2 = _batch(spark, [(1, 1, "insert", "r1", "b.py", "c1", "v1")], cols)
    merge_batch(table, b2, "main", 1, 1, 2)

    out = {r["path"]: r for r in table.read().collect()}
    assert out["a.py"]["lang"] == "python"  # retained for old rows
    assert out["b.py"]["lang"] is None      # new rows carry NULL
    assert "lang" in table.snapshot().schema.fieldNames()  # column stays


def test_update_with_added_column_overwrites_key(spark, tmp_path):
    table = ensure_table(spark, str(tmp_path / "t"), num_buckets=4)
    b1 = _batch(
        spark,
        [(0, 0, "insert", "r1", "a.py", "c0", "python", "v0")],
        BASE_COLS,
    )
    merge_batch(table, b1, "main", 0, 0, 1)
    b2 = _batch(
        spark,
        [(1, 5, "update", "r1", "a.py", "c1", "python", "v1", "apache-2.0")],
        BASE_COLS + ["license"],
    )
    stats = merge_batch(table, b2, "main", 1, 1, 2)
    assert stats.rows_updated == 1
    row = table.read().collect()[0]
    assert (row["content"], row["license"], row["seq"]) == ("v1", "apache-2.0", 5)


def test_engine_internal_columns_never_evolve_schema(spark, tmp_path):
    table = ensure_table(spark, str(tmp_path / "t"), num_buckets=4)
    b1 = _batch(
        spark,
        [(0, 0, "insert", "r1", "a.py", "c0", "python", "v0", "x")],
        BASE_COLS + ["_internal"],
    )
    merge_batch(table, b1, "main", 0, 0, 1)
    fields = table.snapshot().schema.fieldNames()
    assert "_internal" not in fields
    assert "offset" not in fields and "op" not in fields  # log bookkeeping stays out


def test_nested_record_repeated_end_to_end(spark, tmp_path):
    """A deeply nested array<struct> column (the reference's RECORD-REPEATED
    shape, schema/blocks.json:75-164) flows through the normalize paths
    (drop nested subfield + null scrub) -> schema-evolving MERGE -> MOR read,
    and a later epoch's update replaces the nested value under the seq guard."""
    from pyspark.sql.types import (
        ArrayType, LongType, StringType, StructField, StructType,
    )

    from multiversx_etl_spark.operators.normalize import (
        drop_nested_struct_field,
        scrub_null_array_elements,
    )

    ann_type = ArrayType(
        StructType(
            [
                StructField("kind", StringType()),
                StructField("spans", ArrayType(LongType())),
                StructField("reserved", StringType()),  # to be dropped (A8)
            ]
        )
    )
    schema = StructType(
        [
            StructField("offset", LongType()),
            StructField("seq", LongType()),
            StructField("op", StringType()),
            StructField("repo", StringType()),
            StructField("path", StringType()),
            StructField("commit", StringType()),
            StructField("lang", StringType()),
            StructField("content", StringType()),
            StructField("annotations", ann_type),
            StructField("tags", ArrayType(StringType())),
        ]
    )
    table = ensure_table(spark, str(tmp_path / "t"), num_buckets=4)
    b1 = spark.createDataFrame(
        [
            (0, 1, "insert", "r1", "a.py", "c0", "py", "v0",
             [("todo", [1, 5], "x"), ("lint", [9], "y")], ["alpha", None]),
        ],
        schema,
    )
    b1 = drop_nested_struct_field(b1, "annotations", "reserved")  # A8
    b1 = scrub_null_array_elements(b1, ["tags"])  # A9
    merge_batch(table, b1, "main", 0, 0, 1)

    got = table.read().collect()[0]
    assert [a["kind"] for a in got["annotations"]] == ["todo", "lint"]
    assert list(got["annotations"][0]["spans"]) == [1, 5]
    assert "reserved" not in got["annotations"][0].asDict()
    assert list(got["tags"]) == ["alpha", ""]  # NULL element scrubbed

    # epoch 2: higher-seq update rewrites the nested value (MOR fold wins)
    b2 = spark.createDataFrame(
        [(1, 7, "update", "r1", "a.py", "c1", "py", "v1",
          [("fixed", [2], "z")], ["beta"])],
        schema,
    )
    b2 = drop_nested_struct_field(b2, "annotations", "reserved")
    merge_batch(table, b2, "main", 1, 1, 2)
    got = table.read().collect()[0]
    assert [a["kind"] for a in got["annotations"]] == ["fixed"]
    assert got["seq"] == 7 and got["content"] == "v1"

    # epoch 3: stale lower-seq update must NOT resurrect the old nested value
    b3 = spark.createDataFrame(
        [(2, 3, "update", "r1", "a.py", "c0", "py", "stale",
          [("old", [0], "w")], ["stale"])],
        schema,
    )
    b3 = drop_nested_struct_field(b3, "annotations", "reserved")
    merge_batch(table, b3, "main", 2, 2, 3)
    got = table.read().collect()[0]
    assert [a["kind"] for a in got["annotations"]] == ["fixed"] and got["seq"] == 7
