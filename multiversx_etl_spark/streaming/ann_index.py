"""Maintained IVF ANN index: the quantizer as a durable, refreshable artifact.

q_ivf_ann (queries.py) trains its coarse quantizer eagerly per process —
right for a self-contained query, wrong as the steady state: an ANN index
is built ONCE and queried many times while the corpus churns under it
(VERDICT r03 #4). This module stores the quantizer as its own tiny
LakeTable — one row per cell: the FROZEN centroid plus incrementally
maintained membership stats — refreshed from the embedding table's change
feed with the same exactly-once contract as every other downstream consumer
(replicate.py / materialize.py / features.py):

- **The quantizer is frozen at training time** (classic IVF practice —
  FAISS trains the coarse quantizer once; lists are maintained, retraining
  is an explicit rebuild). That is what makes incremental maintenance
  EXACT: assignment is a pure function of (vector, frozen centroids), so a
  changed key's pre-image (−1) and post-image (+1) rows land in
  deterministic cells and the per-cell (n, sums) stats stay equal to a full
  recompute of the current live corpus — the invariant the tests assert.
- **A refresh moves O(changed keys)**: changes() lists delta files only;
  pre/post images are bucket-pruned time-travel reads semi-joined to the
  changed keys; the ±1 rows run through the broadcast-centroid assignment
  kernel (operators/ann.py — no shuffle, no n×K blowup) and one tiny
  aggregate produces per-cell deltas merged into the index.
- **Drift is visible, retrain is explicit**: (n, sums) give each cell's
  live mean; ``reseed_ivf_index`` retrains from the current snapshot when
  drift warrants (or automatically when the change-feed range fell out of
  retention — same contract as the other maintained views).

At 10^10 vectors the index is K≈√n rows (~10^5) — broadcastable by
construction, refreshed in O(changed keys), never O(corpus).
"""

from __future__ import annotations

import math

import pyspark.sql.functions as F
from pyspark.sql import DataFrame

from multiversx_etl_spark.lake.table import LakeTable
from multiversx_etl_spark.operators.ann import ivf_assign, q6_expr
from multiversx_etl_spark.operators.merge import MergeStats, merge_batch, null_safe_on

_STREAM = "ivf_index"


def _vecs(df: DataFrame, key: str, vec_col: str) -> DataFrame:
    return df.select(F.col(key).alias("vec_id"), q6_expr(vec_col).alias("q"))


def _cell_stats(assigned: DataFrame, dims: int, weight_col: str | None = None) -> DataFrame:
    w = F.col(weight_col) if weight_col else F.lit(1)
    return assigned.groupBy("cell").agg(
        F.sum(w).alias("n"),
        *[F.sum(w * F.element_at("q", i + 1)).alias(f"s{i}") for i in range(dims)],
    )


def _centroids_of(index: LakeTable) -> list[tuple[int, list[int]]]:
    rows = index.read().select("cell", "centroid").collect()
    return [(int(r["cell"]), list(r["centroid"])) for r in rows]


def train_quantizer(
    src: LakeTable, k: int | None = None, key: str = "vec_id", vec_col: str = "embedding"
) -> list[tuple[int, list[int]]]:
    """Seed (deterministic md5-ordered sample) + one Lloyd round — the same
    recipe as q_ivf_ann, over the TABLE's current snapshot. K defaults to
    ⌈√n⌉ so cell lists track the corpus size."""
    vecs = _vecs(src.read(), key, vec_col)
    n = vecs.count()
    if n == 0:
        raise ValueError("cannot train a quantizer on an empty table")
    k = k or max(1, math.ceil(math.sqrt(n)))
    h = F.md5(F.col("vec_id").cast("string"))
    seed_rows = vecs.withColumn("_h", h).orderBy("_h", "vec_id").limit(k).collect()
    cent0 = [(i + 1, list(r["q"])) for i, r in enumerate(seed_rows)]
    dims = len(cent0[0][1])
    sums = _cell_stats(ivf_assign(src.spark, vecs, cent0), dims)
    return [
        (
            int(r["cell"]),
            [math.floor(float(r[f"s{i}"]) / float(r["n"])) for i in range(dims)],
        )
        for r in sums.collect()
    ]


def create_ivf_index(
    src: LakeTable,
    root: str,
    k: int | None = None,
    num_buckets: int = 4,
    key: str = "vec_id",
    vec_col: str = "embedding",
) -> LakeTable:
    """Train the quantizer at the source's current version and materialize
    the index table (one row per cell: frozen centroid + live (n, sums)),
    with the upstream version as the exactly-once stream marker."""
    from pyspark.sql.types import (
        ArrayType,
        BooleanType,
        IntegerType,
        LongType,
        StructField,
        StructType,
    )

    schema = StructType(
        [
            StructField("cell", IntegerType(), False),
            StructField("centroid", ArrayType(LongType(), True), False),
            StructField("n", LongType(), False),
            StructField("sums", ArrayType(LongType(), True), False),
            StructField("seq", LongType(), False),
            StructField("deleted", BooleanType(), False),
        ]
    )
    index = LakeTable.create(src.spark, root, schema, key_columns=["cell"], num_buckets=num_buckets)
    reseed_ivf_index(src, index, k=k, key=key, vec_col=vec_col)
    return index


def reseed_ivf_index(
    src: LakeTable,
    index: LakeTable,
    k: int | None = None,
    key: str = "vec_id",
    vec_col: str = "embedding",
) -> MergeStats:
    """(Re)train from the current snapshot — the bootstrap path, the
    explicit drift-retrain, and the retention-gap fallback."""
    from multiversx_etl_spark.streaming.ingest import bootstrap_snapshot

    cur = src.current_version()
    cent = train_quantizer(src, k=k, key=key, vec_col=vec_col)
    dims = len(cent[0][1])
    assigned = ivf_assign(src.spark, _vecs(src.read(version=cur), key, vec_col), cent)
    stats = _cell_stats(assigned, dims)
    cent_df = src.spark.createDataFrame(
        [(c, v) for c, v in cent], "cell int, centroid array<bigint>"
    )
    rows = (
        cent_df.join(stats, on="cell", how="left")
        .select(
            "cell",
            "centroid",
            F.coalesce(F.col("n"), F.lit(0)).alias("n"),
            # an empty cell (every member churned away) keeps zeroed stats
            F.array(
                *[F.coalesce(F.col(f"s{i}"), F.lit(0)).cast("long") for i in range(dims)]
            ).alias("sums"),
        )
        .withColumn("seq", F.lit(cur))
    )
    n = bootstrap_snapshot(
        index, rows, seq_column="seq",
        stream_id=_STREAM, epoch_id=cur, marker_mode="latest_only",
    )
    return MergeStats(rows_in=n, rows_inserted=n, reseeded=True)


def refresh_ivf_index(
    src: LakeTable,
    index: LakeTable,
    key: str = "vec_id",
    vec_col: str = "embedding",
    auto_reseed: bool = True,
) -> MergeStats | None:
    """Apply all upstream changes since the last refreshed version to the
    cell stats (frozen centroids untouched). Returns None when up to date."""
    last = index.last_committed_epoch(_STREAM)
    start = int(last) if last is not None else 0
    cur = src.current_version()
    if start >= cur:
        return None
    try:
        feed = src.changes(start, cur)
    except ValueError:
        if not auto_reseed:
            raise
        return reseed_ivf_index(src, index, key=key, vec_col=vec_col)

    cent = _centroids_of(index)
    dims = len(cent[0][1])
    changed = feed.select(key).distinct()

    def _image(version: int, weight: int) -> DataFrame:
        buckets = {
            r["b"]
            for r in changed.select(src.bucket_of(version=version).alias("b"))
            .distinct()
            .collect()
        }
        img = src.read(version=version, buckets=buckets)
        img = img.join(changed, on=null_safe_on(img, changed, [key]), how="left_semi")
        # weight applied AFTER assignment, per image: pre- and post-rows of
        # an updated vector carry DIFFERENT q's (they may land in different
        # cells — that is exactly a list move), so weights must never be
        # netted per vec_id before the assignment kernel runs
        return ivf_assign(src.spark, _vecs(img, key, vec_col), cent).withColumn(
            "_w", F.lit(weight)
        )

    assigned = _image(start, -1).unionByName(_image(cur, +1))
    delta = _cell_stats(assigned, dims, weight_col="_w")
    # cells whose every stat nets to zero (value-preserving churn) change
    # nothing — drop them before touching the index
    nz = F.col("n") != 0
    for i in range(dims):
        nz = nz | (F.col(f"s{i}") != 0)
    # materialize once (≤ K rows): the emptiness probe and the merge would
    # otherwise each run the whole feed-scan → time-travel → assignment
    # pipeline — doubling the O(changed keys) refresh cost. persist (NOT
    # localCheckpoint): checkpointed blocks truncate lineage, so an
    # executor loss mid-refresh on a real cluster would fail the job
    # instead of recomputing; persist keeps lineage AND materializes once.
    from pyspark import StorageLevel

    delta = delta.where(nz).persist(StorageLevel.MEMORY_AND_DISK)
    try:
        if not delta.limit(1).count():
            empty = index.read().limit(0).drop("deleted").withColumn(
                "op", F.lit("update")
            )
            return merge_batch(
                index, empty.withColumn("seq", F.lit(cur)), _STREAM, epoch_id=cur,
                offset_lo=start, offset_hi=cur, marker_mode="latest_only",
            )

        cur_rows = index.read().alias("v")
        d = delta.alias("d")
        batch = (
            cur_rows.join(d, on="cell", how="left")
            .select(
                "cell",
                "centroid",
                (F.col("v.n") + F.coalesce(F.col("d.n"), F.lit(0))).alias("n"),
                F.array(
                    *[
                        (
                            F.element_at("v.sums", i + 1)
                            + F.coalesce(F.col(f"d.s{i}"), F.lit(0))
                        ).cast("long")
                        for i in range(dims)
                    ]
                ).alias("sums"),
            )
            .withColumn("op", F.lit("update"))
            .withColumn("seq", F.lit(cur))
        )
        return merge_batch(
            index, batch, _STREAM, epoch_id=cur,
            offset_lo=start, offset_hi=cur, marker_mode="latest_only",
        )
    finally:
        delta.unpersist()


def assign_with_index(index: LakeTable, vecs: DataFrame) -> DataFrame:
    """Assign (vec_id, q) rows to cells under the index's FROZEN centroids —
    the query-time entry point: ONE pass over the vectors, zero training
    work (the artifact was paid for once)."""
    return ivf_assign(index.spark, vecs, _centroids_of(index))
