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


@dataclass
class ReconcileReport:
    expected_rows: int
    actual_rows: int
    missing: int     # in expected, not in table (delta>0: "missing data")
    unexpected: int  # in table, not in expected (delta<0: "duplicates")
    sha_mismatches: int

    @property
    def ok(self) -> bool:
        return self.missing == 0 and self.unexpected == 0 and self.sha_mismatches == 0


def content_sha(df: DataFrame, column: str = "content") -> DataFrame:
    """Attach the per-row invariant column ``content_sha = sha2(content, 256)``."""
    return df.withColumn("content_sha", F.sha2(F.coalesce(F.col(column), F.lit("")), 256))


def reconcile(
    table: LakeTable,
    expected: DataFrame,
    key_columns: list[str] | None = None,
    raise_on_mismatch: bool = False,
) -> ReconcileReport:
    """Compare the table's live rows against an expected-state DataFrame on
    (key, sha256(content)). Both sides reduce to (key, sha) projections before
    the anti-joins, so at scale only narrow columns shuffle."""
    key = key_columns or KEY_COLUMNS
    actual = content_sha(table.read()).select(*key, "content_sha")
    exp = content_sha(expected).select(*key, "content_sha")

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
    )
    if raise_on_mismatch and not report.ok:
        raise CountsMismatchError(repr(report))
    return report


def count_in_range(log: DataFrame, lo: int, hi: int) -> int:
    """A2/A18 analog: COUNT(*) over a half-open offset range; Catalyst pushes
    the predicate into the scan."""
    return log.where((F.col("offset") >= lo) & (F.col("offset") < hi)).count()
