"""Incrementally-maintained aggregate views over the change feed.

The second downstream CDC consumer (beside table→table replication,
``replicate.py``): a grouped COUNT/SUM rollup stored as its own LakeTable,
refreshed from the upstream table's row deltas instead of recomputed — the
classic incremental view maintenance (IVM) delta-propagation scheme for
self-maintainable aggregates.

This is the reference's "main dataset → BI rollup dataset" flow
(/root/reference/multiversxetl/bq_client.py:118-130 schedules whole-dataset
transfers and the BI queries re-aggregate from scratch every time) rebuilt
as a delta consumer: one refresh moves O(changed keys + affected groups),
never O(table).

How a refresh computes the group deltas, 100 TB-shaped:

1. ``src.changes(start, cur)`` lists only the delta FILES committed in the
   version range (no table scan) and yields the changed row keys.
2. The pre-image (state at ``start``) and post-image (state at ``cur``) of
   the *changed keys only* are time-travel reads **bucket-pruned to the
   buckets those keys hash into** — at 100 TB with B buckets, a refresh
   that touched k buckets scans k/B of the table, and the key semi-join
   discards everything but the changed keys before the aggregate.
3. Pre-image rows weigh −1, post-image rows +1; one partial-aggregated
   ``groupBy(dims)`` turns them into per-group count/sum deltas. Deletes,
   multi-version update chains and dim-moves all fall out of the ±1
   algebra — no per-change-type case analysis.
4. The deltas full-outer-join (null-safe on dims) the view's CURRENT rows
   for the affected groups (again bucket-pruned), producing the new group
   rows; groups whose count reaches 0 become tombstones.
5. One ``merge_batch`` commits the new rows with the upstream version as
   both ``seq`` and the exactly-once epoch marker (``latest_only``, same
   contract as replication): a crashed or re-run refresh recomputes the
   identical delta from immutable versioned inputs and the marker makes
   the re-commit a no-op.

Only COUNT and SUM (and anything derivable from them — AVG = sum/count)
are maintainable this way: they are *self-maintainable* (invertible) under
inserts+deletes. MIN/MAX are not — deleting the current extremum of a
group requires rescanning the group — so the spec rejects them; compute
those with a normal query or a full ``reseed_agg_view``.

Retention interacts exactly as replication does: if ``expire_snapshots``
dropped the range (or it contains a bootstrap/promote/rollback full-state
replacement), the refresh auto-reseeds — full recompute at the current
version, committed atomically with the marker.
"""

from __future__ import annotations

from dataclasses import dataclass, field

import pyspark.sql.functions as F
from pyspark.sql import DataFrame

from multiversx_etl_spark.lake.table import LakeTable
from multiversx_etl_spark.operators.merge import MergeStats, merge_batch

_NUMERIC = {"byte", "short", "integer", "long", "float", "double"}


@dataclass(frozen=True)
class AggViewSpec:
    """A grouped rollup: ``SELECT dims..., count(*) AS count_alias,
    sum(expr) AS alias... FROM (SELECT *, derived... FROM src WHERE where)
    GROUP BY dims``.

    ``dims`` become the view table's upsert key; each dim names a source
    column or a ``derived`` alias. ``sums`` maps output alias -> numeric
    SQL expression (a bare column name is the simple case; decimal casts
    widen per SQL rules). ``derived`` maps alias -> row-wise SQL
    expression computed before grouping (insertion order; later entries
    may reference earlier ones) — expression GROUP BY keys like
    ``to_date(timestamp)``. ``where`` is a row predicate applied before
    grouping (it may reference derived names).

    The ±1 delta algebra is unchanged by ``derived``/``where`` because
    both are row-wise and deterministic: ``prepare`` runs identically on
    the full recompute and on both delta images, so an update that moves
    a row across the filter boundary nets to a plain group decrement on
    one side and increment on the other.
    """

    dims: tuple[str, ...]
    sums: dict[str, str] = field(default_factory=dict)
    count_alias: str = "n_rows"
    derived: dict[str, str] = field(default_factory=dict)
    where: str | None = None

    def prepare(self, df: DataFrame) -> DataFrame:
        """The row-wise pre-aggregation stage (derived columns, then the
        filter) — shared verbatim by the full recompute and the refresh's
        pre/post delta images."""
        for name, e in self.derived.items():
            df = df.withColumn(name, F.expr(e))
        if self.where is not None:
            df = df.where(F.expr(self.where))
        return df

    def agg_exprs(self) -> list:
        # sums are null-coalesced: SQL's "sum of no non-null values is
        # NULL" is not incrementally distinguishable from 0 without extra
        # per-group state, so the view defines sum(col) ≡ coalesce(sum, 0)
        # — in the full form here AND the delta form in refresh_agg_view
        exprs = [F.count(F.lit(1)).alias(self.count_alias)]
        exprs += [
            F.coalesce(F.sum(F.expr(src)), F.lit(0)).alias(alias)
            for alias, src in self.sums.items()
        ]
        return exprs

    def aggregate(self, df: DataFrame) -> DataFrame:
        """The full (non-incremental) form — the reseed path and the
        correctness oracle both use exactly this."""
        return self.prepare(df).groupBy(*self.dims).agg(*self.agg_exprs())

    def validate(self, src: LakeTable) -> None:
        schema = src.snapshot().schema
        names = {f.name for f in schema.fields}
        for name in self.derived:
            # withColumn REPLACES an existing column: a derived alias
            # shadowing a source column would silently rewrite the
            # pre-image rows the delta algebra diffs against
            if name in names:
                raise ValueError(f"derived column {name!r} shadows a source column")
            if name == "op":
                raise ValueError("derived column 'op' collides with an engine column")
        for name in (*self.derived, *self.dims, *self.sums, self.count_alias):
            # refresh-internal columns: _image overwrites _w AFTER prepare,
            # and the delta agg emits _d_<alias> — a spec using either name
            # would diverge from the full recompute with no error
            if name == "_w" or name.startswith("_d_"):
                raise ValueError(
                    f"{name!r} collides with a refresh-internal column"
                )
        for d in self.dims:
            # the backing table appends its own (seq, deleted) fields; a
            # dim with either name would duplicate a schema field, and 'op'
            # collides with the merge-input column the refresh synthesizes
            if d in ("seq", "deleted", "op"):
                raise ValueError(f"dim {d!r} collides with an engine column")
        reserved = {*self.dims, "seq", "deleted", "op"}
        for alias in (*self.sums, self.count_alias):
            if alias in reserved:
                raise ValueError(f"aggregate alias {alias!r} collides")
        # surface missing columns, bad SQL, and non-numeric sums at
        # declaration time by planning the full form on an empty frame
        from pyspark.errors import AnalysisException

        try:
            probe = self.prepare(src.read().limit(0))
            probe_names = set(probe.columns)
            for d in self.dims:
                if d not in probe_names:
                    raise ValueError(f"dim {d!r} not in source schema or derived")
            all_exprs = probe.select(
                *[F.expr(e) for e in (*self.derived.values(), *self.sums.values())],
                *( [F.expr(self.where)] if self.where is not None else [] ),
            )
            for alias, srcexpr in self.sums.items():
                t = probe.select(F.expr(srcexpr)).schema[0].dataType.typeName()
                if t not in _NUMERIC and not t.startswith("decimal"):
                    raise ValueError(
                        f"sum({srcexpr!r}) is {t}: only numeric expressions "
                        "are incrementally summable"
                    )
        except AnalysisException as e:
            raise ValueError(f"bad spec expression: {e}") from None
        # refresh_agg_view re-runs prepare() on the HISTORICAL pre-image:
        # an expression whose value drifts between refreshes (current_date
        # in a where-window, rand, uuid) silently un-balances the ±1
        # algebra — the stale row's -1 never fires — and the view diverges
        # from the recompute forever. Spark marks current_date/timestamp
        # deterministic (they are, within one query), so check by name too.
        # markers keep their "(" so a mere COLUMN named current_date
        # (printed current_date#N, no paren) never false-positives
        plan = all_exprs._jdf.queryExecution().analyzed().toString().lower()
        for marker in ("current_date(", "current_timestamp(", "currentdate(",
                       "currenttimestamp(", "current_timezone(",
                       "localtimestamp(", "rand(", "randn(", "uuid(",
                       "shuffle(", "monotonically_increasing_id("):
            if marker in plan:
                raise ValueError(
                    f"spec expression uses {marker.rstrip('(')}: derived/"
                    "where/sums must be deterministic AND time-invariant — "
                    "the refresh re-evaluates them on historical pre-images "
                    "(put time windows in the READER, like the 7-day HAVING "
                    "in contract_interactions)"
                )


def create_agg_view(
    src: LakeTable, root: str, spec: AggViewSpec, num_buckets: int = 16
) -> LakeTable:
    """CREATE MATERIALIZED VIEW: derive the rollup schema from the source
    (Catalyst's own sum/count result types, so long sums stay long and
    decimal sums widen per SQL rules) and create the backing LakeTable
    keyed by the dims."""
    from pyspark.sql.types import BooleanType, LongType, StructField, StructType

    spec.validate(src)
    agg_schema = spec.aggregate(src.read().limit(0)).schema
    schema = StructType(
        list(agg_schema.fields)
        + [
            StructField("seq", LongType(), False),
            StructField("deleted", BooleanType(), False),
        ]
    )
    return LakeTable.create(
        src.spark, root, schema, key_columns=list(spec.dims), num_buckets=num_buckets
    )


def reseed_agg_view(
    src: LakeTable,
    view: LakeTable,
    spec: AggViewSpec,
    stream_id: str = "matview",
) -> MergeStats:
    """Full recompute at the current upstream version, committed atomically
    with the (stream, upstream-version) marker — the bootstrap path and the
    retention-gap fallback."""
    from multiversx_etl_spark.streaming.ingest import bootstrap_snapshot

    spec.validate(src)  # a spec edited since create must fail HERE, loudly
    cur = src.current_version()
    rollup = spec.aggregate(src.read(version=cur)).withColumn("seq", F.lit(cur))
    n = bootstrap_snapshot(
        view,
        rollup,
        seq_column="seq",
        stream_id=stream_id,
        epoch_id=cur,
        marker_mode="latest_only",
    )
    return MergeStats(rows_in=n, rows_inserted=n, reseeded=True)


from multiversx_etl_spark.operators.merge import null_safe_on as _null_safe_on  # noqa: E402


def _change_images(
    src: LakeTable, start: int, cur: int
) -> tuple[DataFrame, DataFrame] | None:
    """The SPEC-INDEPENDENT part of a refresh: the changed-key set and the
    raw (un-prepared, un-weighted) pre/post images of those keys. Returns
    None when the feed had no logical rows (e.g. a compact-only range).
    Raises ValueError when the range is unreadable (expired/rewritten) —
    the caller decides whether to reseed."""
    feed = src.changes(start, cur)
    key = src.snapshot().key_columns
    changed = feed.select(*key).distinct()

    # bucket-prune both time-travel reads to the buckets the changed keys
    # hash into: bounded driver collect (<= num_buckets rows post-distinct).
    # Bucket sets are computed PER VERSION: a rebucket() between `start`
    # and `cur` changes the layout, and ids derived under one layout prune
    # garbage (or index out of range) under the other.
    def _buckets_at(version: int) -> set[int]:
        return {
            r["b"]
            for r in changed.select(
                src.bucket_of(version=version).alias("b")
            ).distinct().collect()
        }

    post_buckets = _buckets_at(cur)
    if not post_buckets:
        return None

    def _raw_image(version: int, buckets: set[int]) -> DataFrame:
        img = src.read(version=version, buckets=buckets)
        return img.join(
            changed, on=_null_safe_on(img, changed, key), how="left_semi"
        )

    return (
        _raw_image(start, _buckets_at(start)),
        _raw_image(cur, post_buckets),
    )


def _commit_empty(
    view: LakeTable, stream_id: str, start: int, cur: int
) -> MergeStats:
    """Advance the marker past a no-logical-rows range without touching
    any view row."""
    empty = view.read().limit(0).drop("deleted", "seq").withColumn(
        "op", F.lit("update")
    )
    return merge_batch(
        view, empty.withColumn("seq", F.lit(cur)), stream_id, epoch_id=cur,
        offset_lo=start, offset_hi=cur, marker_mode="latest_only",
    )


def _commit_delta(
    view: LakeTable,
    spec: AggViewSpec,
    stream_id: str,
    start: int,
    cur: int,
    pre: DataFrame,
    post: DataFrame,
) -> MergeStats:
    """The SPEC-SPECIFIC part of a refresh: prepare + weigh the shared
    images, aggregate the group deltas, join the affected view rows, and
    commit — exactly the algebra documented in the module docstring."""
    # the spec's row-wise stage runs on each image exactly as it runs in
    # the full recompute: rows the filter drops contribute no weight
    pm = (
        spec.prepare(pre).withColumn("_w", F.lit(-1))
        .unionByName(spec.prepare(post).withColumn("_w", F.lit(+1)))
    )
    d_exprs = [F.sum("_w").alias(f"_d_{spec.count_alias}")] + [
        F.sum(F.col("_w") * F.expr(srccol)).alias(f"_d_{alias}")
        for alias, srccol in spec.sums.items()
    ]
    delta = pm.groupBy(*spec.dims).agg(*d_exprs)
    # groups whose every delta nets to zero (value-preserving updates)
    # change nothing — drop them before touching the view
    nz = F.col(f"_d_{spec.count_alias}") != 0
    for alias in spec.sums:
        nz = nz | F.col(f"_d_{alias}").isNotNull() & (F.col(f"_d_{alias}") != 0)
    delta = delta.where(nz)

    # current view rows for the affected groups only, bucket-pruned the
    # same way (dims are the view's key)
    aff = delta.select(*spec.dims)
    view_buckets = {
        r["b"]
        for r in aff.withColumn("b", view.bucket_of())
        .select("b")
        .distinct()
        .collect()
    }
    cur_rows = view.read(buckets=view_buckets)
    cur_rows = cur_rows.join(
        aff, on=_null_safe_on(cur_rows, aff, spec.dims), how="left_semi"
    )

    v, d = cur_rows.alias("v"), delta.alias("d")
    joined = v.join(d, on=_null_safe_on(v, d, spec.dims), how="full_outer")
    out_cols = [
        F.coalesce(F.col(f"d.{c}"), F.col(f"v.{c}")).alias(c) for c in spec.dims
    ]
    new_n = F.coalesce(F.col(f"v.{spec.count_alias}"), F.lit(0)) + F.coalesce(
        F.col(f"d._d_{spec.count_alias}"), F.lit(0)
    )
    out_cols.append(new_n.alias(spec.count_alias))
    for alias in spec.sums:
        out_cols.append(
            (
                F.coalesce(F.col(f"v.{alias}"), F.lit(0))
                + F.coalesce(F.col(f"d._d_{alias}"), F.lit(0))
            ).alias(alias)
        )
    batch = joined.select(*out_cols).withColumn(
        "op", F.when(F.col(spec.count_alias) == 0, "delete").otherwise("update")
    ).withColumn("seq", F.lit(cur))

    return merge_batch(
        view,
        batch,
        stream_id,
        epoch_id=cur,  # marker = upstream version refreshed through
        offset_lo=start,
        offset_hi=cur,
        marker_mode="latest_only",
    )


def refresh_agg_view(
    src: LakeTable,
    view: LakeTable,
    spec: AggViewSpec,
    stream_id: str = "matview",
    auto_reseed: bool = True,
) -> MergeStats | None:
    """Apply all upstream changes since the last refreshed version to the
    rollup. Returns merge stats, or None when already up to date."""
    spec.validate(src)  # re-validate per refresh: CLI specs are files that
    # can be edited to something time-varying between rounds
    last = view.last_committed_epoch(stream_id)
    start = int(last) if last is not None else 0
    cur = src.current_version()
    if start >= cur:
        return None
    try:
        images = _change_images(src, start, cur)
    except ValueError:
        if not auto_reseed:
            raise
        return reseed_agg_view(src, view, spec, stream_id)
    if images is None:
        return _commit_empty(view, stream_id, start, cur)
    pre, post = images
    return _commit_delta(view, spec, stream_id, start, cur, pre, post)


def refresh_agg_views(
    src: LakeTable,
    targets: list[tuple[LakeTable, AggViewSpec, str]],
    auto_reseed: bool = True,
) -> dict[str, MergeStats | None]:
    """Refresh MANY views over ONE source, sharing the spec-independent
    work: targets whose markers start from the same version share one
    change-feed read, one changed-key set and one PERSISTED pair of
    pre/post images, so the source's MOR-fold shuffle runs twice per
    round instead of twice per view (the 100 TB cost of a multi-dashboard
    round — see the dashboards CLI). Views at different start versions
    (e.g. one created later) group separately and still refresh correctly.
    Returns {stream_id: MergeStats | None (up to date)}."""
    out: dict[str, MergeStats | None] = {}
    cur = src.current_version()
    groups: dict[int, list[tuple[LakeTable, AggViewSpec, str]]] = {}
    for view, spec, stream_id in targets:
        spec.validate(src)
        last = view.last_committed_epoch(stream_id)
        start = int(last) if last is not None else 0
        if start >= cur:
            out[stream_id] = None
            continue
        groups.setdefault(start, []).append((view, spec, stream_id))
    for start, members in groups.items():
        try:
            images = _change_images(src, start, cur)
        except ValueError:
            if not auto_reseed:
                raise
            for view, spec, stream_id in members:
                out[stream_id] = reseed_agg_view(src, view, spec, stream_id)
            continue
        if images is None:
            for view, spec, stream_id in members:
                out[stream_id] = _commit_empty(view, stream_id, start, cur)
            continue
        pre, post = images
        share = len(members) > 1
        if share:
            pre, post = pre.persist(), post.persist()
        try:
            for view, spec, stream_id in members:
                out[stream_id] = _commit_delta(
                    view, spec, stream_id, start, cur, pre, post
                )
        finally:
            if share:
                pre.unpersist()
                post.unpersist()
    return out
