"""Maintained IVF index: frozen quantizer + incrementally exact cell stats.

The invariant everything hangs on: assignment under FROZEN centroids is a
pure function of the vector, so after any churn the index's per-cell
(n, sums) must equal a from-scratch recompute over the current live corpus
under the same centroids. Tests drive create → churn (updates that MOVE
cells, deletes, inserts) → refresh and assert exactly that, plus marker
idempotence and the retention-gap reseed.
"""

from __future__ import annotations

import os

import pyspark.sql.functions as F
import pytest

from multiversx_etl_spark.lake.table import LakeTable
from multiversx_etl_spark.operators.ann import ivf_assign, q6_expr
from multiversx_etl_spark.operators.merge import merge_batch
from multiversx_etl_spark.streaming.ann_index import (
    assign_with_index,
    create_ivf_index,
    refresh_ivf_index,
)
from multiversx_etl_spark.streaming.ingest import bootstrap_snapshot

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")


def _src_table(spark, root) -> LakeTable:
    from pyspark.sql.types import (
        ArrayType, BooleanType, FloatType, IntegerType, LongType,
        StructField, StructType,
    )

    schema = StructType([
        StructField("vec_id", LongType(), False),
        StructField("embedding", ArrayType(FloatType(), True), True),
        StructField("label", IntegerType(), True),
        StructField("seq", LongType(), False),
        StructField("deleted", BooleanType(), False),
    ])
    t = LakeTable.create(spark, str(root), schema, key_columns=["vec_id"], num_buckets=4)
    snap = spark.read.parquet(f"{SF_DIR}/embeddings.parquet").withColumn("seq", F.lit(0))
    bootstrap_snapshot(t, snap)
    return t


def _stats_by_cell(spark, src: LakeTable, index: LakeTable) -> dict[int, tuple]:
    """Independent full recompute of (n, sums) under the index's centroids."""
    vecs = src.read().select("vec_id", q6_expr("embedding").alias("q"))
    cent = [
        (int(r["cell"]), list(r["centroid"]))
        for r in index.read().select("cell", "centroid").collect()
    ]
    dims = len(cent[0][1])
    rows = (
        ivf_assign(spark, vecs, cent)
        .groupBy("cell")
        .agg(
            F.count("*").alias("n"),
            *[F.sum(F.element_at("q", i + 1)).alias(f"s{i}") for i in range(dims)],
        )
        .collect()
    )
    return {int(r["cell"]): (r["n"], tuple(r[f"s{i}"] for i in range(dims))) for r in rows}


def _index_state(index: LakeTable) -> dict[int, tuple]:
    return {
        int(r["cell"]): (r["n"], tuple(r["sums"]))
        for r in index.read().collect()
        if r["n"] != 0
    }


@pytest.fixture(scope="module")
def built(spark, tmp_path_factory):
    root = tmp_path_factory.mktemp("ivf")
    src = _src_table(spark, root / "src")
    index = create_ivf_index(src, str(root / "idx"), num_buckets=2)
    return src, index


def test_create_matches_full_recompute(spark, built):
    src, index = built
    assert _index_state(index) == _stats_by_cell(spark, src, index)
    total = sum(n for n, _ in _index_state(index).values())
    assert total == src.read().count() == 500


def test_refresh_tracks_churn_exactly(spark, built):
    src, index = built
    # churn: 20 vectors take ANOTHER vector's embedding (cell moves), 10
    # keys delete, 5 brand-new keys insert — one merge batch, seq=1
    cur = src.read().select("vec_id", "embedding", "label")
    donors = cur.select(
        (F.col("vec_id") - 37).alias("vec_id"), F.col("embedding").alias("newe")
    )
    upd = (
        cur.where(F.col("vec_id") < 20)
        .join(donors.where(F.col("vec_id") >= 0), on="vec_id")
        .select(
            "vec_id", F.col("newe").alias("embedding"), "label",
            F.lit(1).alias("seq"), F.lit("update").alias("op"),
        )
    )
    dels = cur.where((F.col("vec_id") >= 20) & (F.col("vec_id") < 30)).select(
        "vec_id", "embedding", "label", F.lit(1).alias("seq"), F.lit("delete").alias("op")
    )
    ins = cur.where(F.col("vec_id") < 5).select(
        (F.col("vec_id") + 10_000).alias("vec_id"), "embedding", "label",
        F.lit(1).alias("seq"), F.lit("insert").alias("op"),
    )
    merge_batch(src, upd.unionByName(dels).unionByName(ins), "churn", 0)

    cent_before = {r["cell"]: tuple(r["centroid"]) for r in index.read().collect()}
    stats = refresh_ivf_index(src, index)
    assert stats is not None and not stats.reseeded
    # frozen quantizer: centroids byte-identical across the refresh
    cent_after = {r["cell"]: tuple(r["centroid"]) for r in index.read().collect()}
    assert cent_after == cent_before
    # incrementally-maintained stats == full recompute over live corpus
    assert _index_state(index) == _stats_by_cell(spark, src, index)
    assert sum(n for n, _ in _index_state(index).values()) == src.read().count() == 495
    # up to date: second refresh is a no-op
    assert refresh_ivf_index(src, index) is None


def test_assign_with_index_is_one_pass(spark, built):
    src, index = built
    # a plain scan feeding the kernel (src.read() may carry the MOR fold's
    # aggregate, which is the TABLE's cost, not the index's): the
    # assignment itself must add nothing but the Arrow kernel — no shuffle,
    # no training jobs
    vecs = spark.read.parquet(f"{SF_DIR}/embeddings.parquet").select(
        "vec_id", q6_expr("embedding").alias("q")
    )
    out = assign_with_index(index, vecs)
    assert out.count() == 500
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan, plan


def test_retention_gap_reseeds(spark, tmp_path):
    src = _src_table(spark, tmp_path / "src")
    index = create_ivf_index(src, str(tmp_path / "idx"), num_buckets=2)
    # advance upstream twice, then drop the covering manifests
    for s in (1, 2):
        batch = src.read().where(F.col("vec_id") < 3).select(
            "vec_id", "embedding", "label",
            F.lit(s).alias("seq"), F.lit("update").alias("op"),
        )
        merge_batch(src, batch, "churn", s)
    src.expire_snapshots(keep_last=1)
    stats = refresh_ivf_index(src, index)
    assert stats is not None and stats.reseeded
    assert _index_state(index) == _stats_by_cell(spark, src, index)


def test_query_quantizer_memoized(spark):
    from multiversx_etl_spark import queries as Q

    Q._IVF_QUANTIZER_CACHE.clear()
    a = {tuple(r) for r in Q.QUERIES["q_ivf_ann"](spark, SF_DIR).collect()}
    assert len(Q._IVF_QUANTIZER_CACHE) == 1  # artifact trained once...
    b = {tuple(r) for r in Q.QUERIES["q_ivf_ann"](spark, SF_DIR).collect()}
    assert len(Q._IVF_QUANTIZER_CACHE) == 1  # ...and reused, bit-identically
    assert a == b
