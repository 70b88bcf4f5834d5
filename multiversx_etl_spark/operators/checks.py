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

    Tables without a ``content`` column (e.g. the nested ``commits`` table)
    hash the canonical JSON of ALL payload columns instead — same invariant
    strength, schema-agnostic; both reconcile sides compute it identically."""
    if column in df.columns:
        return df.withColumn(
            "content_sha", F.sha2(F.coalesce(F.col(column), F.lit("")), 256)
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
    key = key_columns or KEY_COLUMNS
    actual = content_sha(table.read(version=version), key_columns=key).select(
        *key, "content_sha"
    )
    exp = content_sha(expected, key_columns=key).select(*key, "content_sha")

    missing = exp.join(actual, on=key, how="left_anti").count()
    unexpected = actual.join(exp, on=key, how="left_anti").count()
    joined = exp.alias("e").join(actual.alias("a"), on=key, how="inner")
    sha_mismatch = joined.where(F.col("e.content_sha") != F.col("a.content_sha")).count()
    report = ReconcileReport(
        expected_rows=exp.count(),
        actual_rows=actual.count(),
        missing=missing,
        unexpected=unexpected,
        sha_mismatches=sha_mismatch,
        erratum=erratum,
    )
    if raise_on_mismatch and not report.ok:
        raise CountsMismatchError(repr(report))
    return report


def find_latest_good_version(
    table: LakeTable,
    log: DataFrame,
    stream_id: str = "main",
    rollback: bool = False,
    max_candidates: int | None = None,
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
    instead."""
    from multiversx_etl_spark.oracle import expected_state

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
            reconcile(
                table,
                expected_state(log, offset_hi=hi, key_columns=m.key_columns),
                key_columns=m.key_columns,
                raise_on_mismatch=True,
                version=v,
            )
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
