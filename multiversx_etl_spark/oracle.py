"""Expected-state oracle: last-writer-wins fold over the change log.

Used by the runtime reconciliation checks (operators/checks.py). Tests use an
*independent* oracle (DuckDB SQL over the same parquet) so the engine is not
verified against itself — mirroring the reference verifying BigQuery against
Elasticsearch counts (/root/reference/multiversxetl/checks.py:21-93).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame

from multiversx_etl_spark.schemas import KEY_COLUMNS


def expected_state(
    log: DataFrame,
    offset_hi: int | None = None,
    key_columns: list[str] | None = None,
) -> DataFrame:
    """Fold the log (optionally only offsets < offset_hi) to final live rows:
    per key, the max-seq event wins; delete winners drop the key."""
    key = key_columns or KEY_COLUMNS
    if offset_hi is not None:
        log = log.where(F.col("offset") < offset_hi)
    value_cols = [c for c in log.columns if c not in key]
    ordered = ["seq"] + [c for c in value_cols if c != "seq"]
    folded = (
        log.groupBy(*key)
        .agg(F.max(F.struct(*ordered)).alias("_w"))
        .select(*key, *[F.col(f"_w.{c}").alias(c) for c in ordered])
    )
    return folded.where(F.col("op") != "delete").drop("op", "offset")
