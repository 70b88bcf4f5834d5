"""Post-load reconciliation checks (operator A17) and the sha256 invariant.

The reference compares source-interval counts against sink counts after every
bulk and aborts on mismatch (/root/reference/multiversxetl/checks.py:21-93,
delta>0 ⇒ missing data, delta<0 ⇒ duplicates). Our stronger per-row invariant
(BASELINE.json:input_hint) is content-sha256 equality versus the expected
state, verified with one anti-join in each direction.
"""

from __future__ import annotations

from dataclasses import dataclass

import pyspark.sql.functions as F
from pyspark.sql import DataFrame

from multiversx_etl_spark.lake.table import LakeTable
from multiversx_etl_spark.schemas import KEY_COLUMNS


class CountsMismatchError(Exception):
    """Analog of the reference's CountsMismatchError (checks.py:87-93)."""


def _candidate_failure_types() -> tuple[type[BaseException], ...]:
    """Failure types that mean 'this snapshot candidate is bad' during the
    checkpoint walk: reconciliation mismatches, missing/expired files, and
    Spark job failures from unreadable (truncated/corrupt) data files.
    Everything else is an infrastructure error and must propagate."""
    types: list[type[BaseException]] = [CountsMismatchError, FileNotFoundError, OSError]
    try:
        from pyspark.errors import PySparkException

        types.append(PySparkException)
    except ImportError:  # pragma: no cover
        pass
    try:
        from py4j.protocol import Py4JJavaError

        types.append(Py4JJavaError)
    except ImportError:  # pragma: no cover
        pass
    return tuple(types)


_CANDIDATE_FAILURES = _candidate_failure_types()


def check_counts(
    expected_counts: dict[str, int],
    actual_counts: dict[str, int],
    errata: dict[str, int] | None = None,
    raise_on_mismatch: bool = True,
) -> dict[str, int]:
    """Per-table signed-delta counts check with accepted-drift errata.

    Mirrors the reference exactly (checks.py:56-93, worker_config.py:93-104;
    values like ``{"miniblocks": -53193}`` in worker_config_mainnet.json):
    ``delta = expected - actual + erratum`` per table; positive means data
    missing in the sink, negative means probable duplicates. Real
    deployments always accumulate known historical drift; errata let
    operations encode it without disabling the check.

    Returns the adjusted deltas per table. With the default
    ``raise_on_mismatch=True`` any non-zero adjusted delta raises (so the
    returned dict is all-zeros); pass ``raise_on_mismatch=False`` to
    inspect the drift instead — mirroring ``reconcile``'s flag."""
    errata = errata or {}
    deltas = {}
    problems = []
    for t in sorted(set(expected_counts) | set(actual_counts)):
        delta = expected_counts.get(t, 0) - actual_counts.get(t, 0) + errata.get(t, 0)
        deltas[t] = delta
        if delta > 0:
            problems.append(f"missing data in sink for '{t}': adjusted delta {delta}")
        elif delta < 0:
            problems.append(f"probable duplicates in sink for '{t}': adjusted delta {delta}")
    if problems and raise_on_mismatch:
        raise CountsMismatchError("; ".join(problems))
    return deltas


@dataclass
class ReconcileReport:
    expected_rows: int
    actual_rows: int
    missing: int     # in expected, not in table (delta>0: "missing data")
    unexpected: int  # in table, not in expected (delta<0: "duplicates")
    sha_mismatches: int
    erratum: int = 0  # accepted signed drift (reference checks.py:82-85)

    @property
    def ok(self) -> bool:
        if self.erratum:
            # reference semantics at the count level: known drift cancels
            # the signed delta exactly; content equality stays strict.
            adjusted = self.missing - self.unexpected + self.erratum
            return adjusted == 0 and self.sha_mismatches == 0
        return self.missing == 0 and self.unexpected == 0 and self.sha_mismatches == 0


def content_sha(
    df: DataFrame, column: str = "content", key_columns: list[str] | None = None
) -> DataFrame:
    """Attach the per-row invariant column ``content_sha = sha2(content, 256)``.

    This is the BASELINE.json invariant verbatim: content-column equality —
    deliberately NOT a whole-row hash for tables that have a ``content``
    column (drift in other payload columns is the counts checks' job, as in
    the reference). NULL content hashes distinctly from empty content (a
    NULL marker, not coalesce-to-''). Tables WITHOUT a ``content`` column
    (e.g. the nested ``commits`` table) fall back to hashing the canonical
    JSON of ALL payload columns — a strictly wider invariant, the only
    schema-agnostic choice; both reconcile sides compute it identically."""
    if column in df.columns:
        return df.withColumn(
            "content_sha",
            F.sha2(
                F.coalesce(F.concat(F.lit("v:"), F.col(column)), F.lit("null")), 256
            ),
        )
    skip = set(key_columns or []) | {"seq", "deleted", "op", "offset"}
    payload = sorted(c for c in df.columns if c not in skip)
    return df.withColumn(
        "content_sha", F.sha2(F.to_json(F.struct(*payload)), 256)
    )


def reconcile(
    table: LakeTable,
    expected: DataFrame,
    key_columns: list[str] | None = None,
    raise_on_mismatch: bool = False,
    erratum: int = 0,
    version: int | None = None,
) -> ReconcileReport:
    """Compare the table's live rows against an expected-state DataFrame on
    (key, sha256(content)). Both sides reduce to (key, sha) projections before
    the anti-joins, so at scale only narrow columns shuffle.

    ``erratum`` accepts a known signed count drift (reference
    checks.py:82-85); ``version`` reconciles a time-travelled snapshot
    (the checkpoint-search building block)."""
    from multiversx_etl_spark.operators.merge import null_safe_on

    key = key_columns or KEY_COLUMNS
    actual = content_sha(table.read(version=version), key_columns=key).select(
        *key, "content_sha"
    )
    exp = content_sha(expected, key_columns=key).select(*key, "content_sha")

    # ONE full-outer join + ONE aggregate computes all five numbers in a
    # single job: the anti-join/inner-join/count formulation re-executed
    # the full-log fold 3x and the table read 4x — and the checkpoint walk
    # (find_latest_good_version) pays this per candidate version.
    e, a = exp.alias("e"), actual.alias("a")
    es, as_ = F.col("e.content_sha"), F.col("a.content_sha")
    row = (
        e.join(a, on=null_safe_on(e, a, key), how="full_outer")
        .agg(
            F.count(es).alias("n_exp"),
            F.count(as_).alias("n_act"),
            F.count(F.when(es.isNotNull() & as_.isNull(), 1)).alias("missing"),
            F.count(F.when(es.isNull() & as_.isNotNull(), 1)).alias("unexpected"),
            F.count(F.when(es.isNotNull() & as_.isNotNull() & (es != as_), 1)).alias("bad"),
        )
        .collect()[0]
    )
    report = ReconcileReport(
        expected_rows=row["n_exp"],
        actual_rows=row["n_act"],
        missing=row["missing"],
        unexpected=row["unexpected"],
        sha_mismatches=row["bad"],
        erratum=erratum,
    )
    if raise_on_mismatch and not report.ok:
        raise CountsMismatchError(repr(report))
    return report


def _reconcile_candidate(table: LakeTable, log: DataFrame, hi: int, m, v: int) -> None:
    """One candidate reconcile with a single retry on Spark-side failures:
    a truncated/corrupt data file fails DETERMINISTICALLY on the retry
    (still a bad candidate), while a transient executor/shuffle/IO error
    succeeds the second time — without the retry, Py4J surfaces both as
    the same exception class, and a transient blip on the genuinely-good
    newest snapshot would silently walk the search back."""
    from multiversx_etl_spark.oracle import expected_state

    attempts = 2
    for attempt in range(attempts):
        try:
            reconcile(
                table,
                expected_state(log, offset_hi=hi, key_columns=m.key_columns),
                key_columns=m.key_columns,
                raise_on_mismatch=True,
                version=v,
            )
            return
        except CountsMismatchError:
            raise  # deterministic drift: no point retrying
        except FileNotFoundError:
            raise  # expired/missing file: deterministic
        except _CANDIDATE_FAILURES:
            if attempt == attempts - 1:
                raise


def find_latest_good_version(
    table: LakeTable,
    log: DataFrame,
    stream_id: str = "main",
    rollback: bool = False,
    max_candidates: int | None = None,
    normalizer=None,
) -> int | None:
    """A20 checkpoint search: walk snapshots newest → oldest, reconciling
    each time-travelled version against the change-log-derived expected
    state, and return (optionally roll back to) the newest consistent one.

    The reference walks candidate end-timestamps backwards re-running the
    counts check until one passes (app.py:115-143); here the candidates are
    manifest versions, the truth is the log fold (oracle.expected_state),
    and the criterion is the strict key+sha reconcile. A candidate that
    fails for ANY reason — counts mismatch, sha drift, an unreadable
    (corrupted/truncated) data file — is skipped; version 0 (empty table vs
    empty-prefix fold) is the always-good floor. Returns None only when
    every candidate was tried and failed (or ``max_candidates`` ran out).

    The walk STOPS (returns None, no rollback) on reaching a
    bootstrap/promote commit: from there down, table state includes rows
    that never came from the log, so the log fold stops being the truth —
    "reconcile everything against the log" would otherwise fail every real
    version and happily roll a healthy bootstrapped table back to empty.
    Recover such tables by re-seeding (``bootstrap_snapshot``) + re-tail
    instead.

    ``normalizer`` must match the one the INGEST ran (apply_epoch's
    default is the ``change_events`` transformer, so that is the default
    here too): the table stores normalized rows, so reconciling them
    against a raw-log fold would fail every snapshot of any table whose
    transformer is not an identity on its log."""
    from multiversx_etl_spark.operators.normalize import normalize_change_events
    from multiversx_etl_spark.oracle import expected_state

    log = (normalizer or normalize_change_events)(log)
    tried = 0
    for v in range(table.current_version(), -1, -1):
        if max_candidates is not None and tried >= max_candidates:
            return None
        try:
            m = table.snapshot(v)
        except FileNotFoundError:
            continue  # expired/retention-pruned manifest
        if m.operation in ("bootstrap", "promote"):
            return None  # log-fold truth ends here (see docstring)
        s = m.streams.get(stream_id, {})
        last = s.get("last_epoch")
        if last is not None:
            info = m.epoch_info(stream_id, last) or {}
            hi = info.get("offset_hi")
            if hi is None:
                continue  # marker compacted away: offset bound unknown
        else:
            hi = 0  # pre-stream snapshot: expected state is empty
        tried += 1
        try:
            _reconcile_candidate(table, log, hi, m, v)
        except _CANDIDATE_FAILURES:
            # EXPECTED candidate failures only — counts/sha drift or an
            # unreadable (truncated/corrupt/expired) data file. Anything
            # else (driver OOM, session died, a bug here) propagates: a
            # transient infrastructure error on the genuinely-good newest
            # snapshot must not silently walk back — with rollback=True it
            # would roll a HEALTHY table back to an older version.
            continue
        if rollback and v != table.current_version():
            table.rollback(v)
        return v
    return None


def count_in_range(log: DataFrame, lo: int, hi: int) -> int:
    """A2/A18 analog: COUNT(*) over a half-open offset range; Catalyst pushes
    the predicate into the scan."""
    return log.where((F.col("offset") >= lo) & (F.col("offset") < hi)).count()
