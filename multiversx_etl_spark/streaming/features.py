"""Incrementally-maintained row-level TRANSFORM views over the change feed.

The third downstream CDC consumer (beside table→table replication,
``replicate.py``, and aggregate IVM, ``materialize.py``): a per-row derived
table — feature columns computed from each source row — stored as its own
LakeTable keyed by the SOURCE key, and refreshed from the upstream change
feed instead of recomputed. The flagship instance is a **MinHash near-dup
index over the source-code table's content** (``minhash_index_spec``): at
100 TB you do not re-shingle the corpus per dedup run — you maintain the
signature index from the change feed and the dedup candidate join reads the
index, never the content.

Reference analog: the reference re-derives its downstream datasets by
re-running whole-dataset transfers on a schedule
(/root/reference/multiversxetl/bq_client.py:118-130); here derivation is a
delta consumer with the same exactly-once contract as every other stream
into a LakeTable.

Why this is simpler than aggregate IVM (materialize.py): a row transform is
keyed by the source key, so no pre-image is needed — the post-image of the
*changed keys only* fully determines the new view rows, and deletes map to
deletes. A refresh therefore moves O(changed keys), never O(table):

1. ``src.changes(start, cur)`` lists the delta files in the version range
   (no table scan) and yields the changed row keys.
2. The post-image (state at ``cur``) of those keys is a time-travel read
   bucket-pruned to the buckets the keys hash into, semi-joined down to the
   changed keys, WITH tombstones — a key whose latest state is a tombstone
   becomes a view delete, a live key becomes a recomputed view row.
3. One ``merge_batch`` commits the batch with the upstream version as both
   ``seq`` and the exactly-once marker (``latest_only``): a crashed or
   re-run refresh recomputes the identical rows from immutable versioned
   inputs and the marker makes the re-commit a no-op.

Retention interacts exactly as replication does: if ``expire_snapshots``
dropped the range (or it contains a bootstrap/promote/rollback full-state
replacement), the refresh auto-reseeds — full recompute at the current
version, committed atomically with the marker.

The transform is declared as SQL expression strings (worker-config
serializable, parsed JVM-side — never a Python UDF), with optional ``pre``
intermediate columns so shared subexpressions (e.g. the token array feeding
every MinHash band) are computed once per row.
"""

from __future__ import annotations

from dataclasses import dataclass, field

import pyspark.sql.functions as F
from pyspark.sql import DataFrame

from multiversx_etl_spark.lake.table import LakeTable
from multiversx_etl_spark.operators.merge import MergeStats, merge_batch

#: column names the engine owns on every LakeTable row
_RESERVED = ("seq", "deleted", "op")


@dataclass(frozen=True)
class TransformViewSpec:
    """A per-row derived view: ``SELECT key..., exprs... FROM src``.

    ``exprs`` maps output column name -> SQL expression over a source row.
    ``pre`` maps intermediate name -> SQL expression; pre columns are
    computed first (in insertion order, later entries may reference earlier
    ones), are visible to ``exprs``, and are NOT stored — the Spark-side
    common-subexpression hoist for transforms like MinHash where every
    output shares the same shingle array.
    """

    exprs: dict[str, str]
    pre: dict[str, str] = field(default_factory=dict)

    def transform(self, df: DataFrame, key: list[str]) -> DataFrame:
        """The full (non-incremental) form — the reseed path, the refresh
        batch, and the correctness oracle all use exactly this."""
        for name, e in self.pre.items():
            df = df.withColumn(name, F.expr(e))
        return df.select(
            *key, *[F.expr(e).alias(name) for name, e in self.exprs.items()]
        )

    def validate(self, src: LakeTable) -> None:
        if not self.exprs:
            raise ValueError("a transform view needs at least one expression")
        snap = src.snapshot()
        for name in self.exprs:
            if name in snap.key_columns or name in _RESERVED or name in self.pre:
                raise ValueError(f"output column {name!r} collides")
            if name == "_deleted":
                raise ValueError("output column '_deleted' is refresh-internal")
        for name in self.pre:
            # a pre column shadowing a KEY would silently re-key every view
            # row with the pre expression's value (withColumn replaces)
            if name in snap.key_columns or name in _RESERVED or name == "_deleted":
                raise ValueError(f"pre column {name!r} collides")
        # surface bad references/syntax at declaration time, not first refresh
        self.transform(src.read().limit(0), list(snap.key_columns))


def create_transform_view(
    src: LakeTable, root: str, spec: TransformViewSpec, num_buckets: int = 16
) -> LakeTable:
    """CREATE MATERIALIZED VIEW: derive the output schema from Catalyst's
    own expression result types and create the backing LakeTable keyed by
    the source key (same bucketing scheme, so view reads prune like source
    reads)."""
    from pyspark.sql.types import BooleanType, LongType, StructField, StructType

    spec.validate(src)
    key = list(src.snapshot().key_columns)
    out_schema = spec.transform(src.read().limit(0), key).schema
    schema = StructType(
        list(out_schema.fields)
        + [
            StructField("seq", LongType(), False),
            StructField("deleted", BooleanType(), False),
        ]
    )
    return LakeTable.create(
        src.spark, root, schema, key_columns=key, num_buckets=num_buckets
    )


def reseed_transform_view(
    src: LakeTable,
    view: LakeTable,
    spec: TransformViewSpec,
    stream_id: str = "xformview",
) -> MergeStats:
    """Full recompute at the current upstream version, committed atomically
    with the (stream, upstream-version) marker — the bootstrap path and the
    retention-gap fallback."""
    from multiversx_etl_spark.streaming.ingest import bootstrap_snapshot

    key = list(src.snapshot().key_columns)
    cur = src.current_version()
    rows = spec.transform(src.read(version=cur), key).withColumn("seq", F.lit(cur))
    n = bootstrap_snapshot(
        view,
        rows,
        seq_column="seq",
        stream_id=stream_id,
        epoch_id=cur,
        marker_mode="latest_only",
    )
    return MergeStats(rows_in=n, rows_inserted=n, reseeded=True)


from multiversx_etl_spark.operators.merge import null_safe_on as _null_safe_on  # noqa: E402


def refresh_transform_view(
    src: LakeTable,
    view: LakeTable,
    spec: TransformViewSpec,
    stream_id: str = "xformview",
    auto_reseed: bool = True,
) -> MergeStats | None:
    """Apply all upstream changes since the last refreshed version to the
    view. Returns merge stats, or None when already up to date."""
    last = view.last_committed_epoch(stream_id)
    start = int(last) if last is not None else 0
    cur = src.current_version()
    if start >= cur:
        return None
    try:
        feed = src.changes(start, cur)
    except ValueError:
        if not auto_reseed:
            raise
        return reseed_transform_view(src, view, spec, stream_id)

    key = list(src.snapshot().key_columns)
    changed = feed.select(*key).distinct()

    # bucket-prune the post-image read to the buckets the changed keys hash
    # into: bounded driver collect (<= num_buckets rows post-distinct)
    buckets = {
        r["b"]
        # under the layout of the PINNED read version: a concurrent
        # rebucket() between current_version() and here must not make the
        # ids prune garbage (bucket_of contract; materialize does the same)
        for r in changed.select(src.bucket_of(version=cur).alias("b")).distinct().collect()
    }
    if not buckets:  # feed had no logical rows (e.g. compact-only range)
        empty = view.read().limit(0).drop("deleted", "seq").withColumn(
            "op", F.lit("update")
        )
        return merge_batch(
            view, empty.withColumn("seq", F.lit(cur)), stream_id, epoch_id=cur,
            offset_lo=start, offset_hi=cur, marker_mode="latest_only",
        )

    # post-image WITH tombstones: the latest state of every changed key is
    # either a live row (recompute its view row) or a tombstone (delete the
    # view row) — no pre-image, no per-change-type case analysis
    img = src.read(version=cur, buckets=buckets, include_tombstones=True)
    img = img.join(changed, on=_null_safe_on(img, changed, key), how="left_semi")
    batch = (
        spec.transform(img.withColumn("_deleted", F.col("deleted")), key + ["_deleted"])
        .withColumn(
            "op", F.when(F.col("_deleted"), F.lit("delete")).otherwise(F.lit("update"))
        )
        .drop("_deleted")
        .withColumn("seq", F.lit(cur))
    )

    return merge_batch(
        view,
        batch,
        stream_id,
        epoch_id=cur,  # marker = upstream version refreshed through
        offset_lo=start,
        offset_hi=cur,
        marker_mode="latest_only",
    )


# ---------------------------------------------------------------------------
# Flagship instance: the MinHash near-dup index over a text/content column.
# Same signature scheme as the batch dedup family (queries.py
# q_minhash_signatures / q_minhash_lsh_pairs): word 3-gram shingles, one
# salted-md5 minimum per band. Docs with < 3 tokens carry NULL signatures
# (NULL never equi-joins, so they are never near-dup candidates).
# ---------------------------------------------------------------------------


def minhash_index_spec(text_col: str = "content", bands: int = 3) -> TransformViewSpec:
    """Spec for an incrementally-maintained MinHash band index over
    ``text_col`` — vendored/forked file detection over a code table, kept
    current by ``refresh_transform_view`` as the CDC stream rewrites files."""
    w = "_mh_w"
    sh = "_mh_sh"
    pre = {
        w: f"split(trim({text_col}), '\\\\s+')",
        sh: (
            f"CASE WHEN size({w}) >= 3 THEN "
            f"transform(sequence(1, size({w}) - 2), i -> "
            f"concat_ws(' ', element_at({w}, i), element_at({w}, i + 1), "
            f"element_at({w}, i + 2))) END"
        ),
    }
    exprs = {
        f"minhash_{b}": f"array_min(transform({sh}, s -> md5(concat('s{b}|', s))))"
        for b in range(1, bands + 1)
    }
    return TransformViewSpec(exprs=exprs, pre=pre)


def _view_bands(view: LakeTable) -> int:
    """Band count encoded in the index view's own schema (minhash_1..N) —
    derived, not passed, so a caller can never check fewer bands than the
    index actually maintains (silently admitting near-dups) or more
    (AnalysisException)."""
    n = sum(
        1 for f in view.snapshot().schema.fields
        if f.name.startswith("minhash_") and f.name[8:].isdigit()
    )
    if not n:
        raise ValueError("view schema has no minhash_<i> band columns")
    return n


def dedup_on_ingest(
    view: LakeTable,
    spec: TransformViewSpec,
    batch: DataFrame,
    bands: int | None = None,
) -> DataFrame:
    """Near-dup suppression AT INGEST: filter a batch of candidate rows
    against the maintained MinHash index (and against each other) before
    they are merged into the corpus — the training-pipeline shape where
    duplicates are cheaper to reject at the door than to clean up later.
    The caller's ``foreachBatch`` runs ``merge_batch(table,
    dedup_on_ingest(view, spec, batch))`` then ``refresh_transform_view``
    so the index stays current for the next micro-batch.

    A row is admitted iff (a) none of its band signatures matches an
    already-indexed row UNDER A DIFFERENT KEY (its own index entry never
    rejects it — a CDC update to an indexed document must pass through,
    not be suppressed as a near-dup of itself), and (b) it is the
    canonical (min-key) member
    among its OWN batch's peers in every band it shares. (b) is a
    deterministic one-pass batch semantics — order-free, so replays admit
    the identical set — that can over-reject a chain A~B~C (B loses to A,
    C loses to the already-rejected B) relative to sequential admission;
    near-dup chains are precisely the content dedup exists to suppress,
    so the conservative answer is the right one. Rows with NULL
    signatures (< 3 tokens) are always admitted.

    Plan shape: one anti equi-join per band against the index (the batch
    side is micro-batch-small — Spark broadcasts it against the big
    index) plus one min-struct window per band within the batch; never an
    all-pairs product."""
    key = list(view.snapshot().key_columns)
    bands = bands if bands is not None else _view_bands(view)
    sigs = spec.transform(batch, key)
    idx = view.read()
    for i in range(1, bands + 1):
        col = f"minhash_{i}"
        idx_i = idx.select(
            *[F.col(k).alias(f"_ik_{k}") for k in key], F.col(col).alias("_m")
        ).where(F.col("_m").isNotNull())
        same_key = None
        for k in key:
            eq = sigs[k].eqNullSafe(idx_i[f"_ik_{k}"])
            same_key = eq if same_key is None else same_key & eq
        sigs = sigs.join(
            idx_i, on=(sigs[col] == idx_i["_m"]) & ~same_key, how="left_anti"
        )
    from pyspark.sql import Window

    kstruct = F.struct(*key)
    keep = F.lit(True)
    for i in range(1, bands + 1):
        col = f"minhash_{i}"
        w = Window.partitionBy(col)
        keep = keep & (
            F.col(col).isNull() | (kstruct == F.min(kstruct).over(w))
        )
    admitted = sigs.withColumn("_keep", keep).where("_keep").select(*key)
    # null-safe: NULL key parts are first-class everywhere else in the
    # engine; a plain on=key semi-join would drop their admitted rows
    return batch.join(
        admitted, on=_null_safe_on(batch, admitted, key), how="left_semi"
    )


def near_dup_candidates(view: LakeTable, bands: int | None = None) -> DataFrame:
    """Candidate near-dup key pairs from a MinHash index view: keys agreeing
    on ANY band signature. Physical plan: one equi-join per band on the band
    value (shuffle on the signature hash — never an all-pairs product),
    unioned and deduped; candidates ~ O(dup pairs), not O(n²). Columns:
    ``<key>_a..., <key>_b...`` with pair order canonicalized by the key
    struct ordering."""
    df = view.read()
    key = list(view.snapshot().key_columns)
    bands = bands if bands is not None else _view_bands(view)
    a, b = df.alias("a"), df.alias("b")
    ka = F.struct(*[F.col(f"a.{k}") for k in key])
    kb = F.struct(*[F.col(f"b.{k}") for k in key])
    out_cols = [F.col(f"a.{k}").alias(f"{k}_a") for k in key] + [
        F.col(f"b.{k}").alias(f"{k}_b") for k in key
    ]
    parts = [
        a.join(b, F.col(f"a.minhash_{i}") == F.col(f"b.minhash_{i}"))
        .where(ka < kb)
        .select(*out_cols)
        for i in range(1, bands + 1)
    ]
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out.distinct()
