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
    """Fold the log (optionally only offsets < offset_hi) to final live rows.

    Full-image events (insert/update/delete): per key, the max-seq event
    wins; delete winners drop the key. Partial-image events (op='patch',
    NULL payload = keep): per COLUMN, the winner is the max-seq event among
    full images (which set every column, NULLs included) and the patches
    that set that column — column-level last-writer-wins. Patches never
    create rows (a key with no full image at all is absent) and never
    resurrect deleted keys (liveness comes from the full-image winner
    alone). The row's seq is the newest event reflected in it:
    greatest(full winner, applied column patches) — which is what the
    engine's generation fold stamps too. With no patch rows present this
    reduces exactly to the classic whole-row fold."""
    key = key_columns or KEY_COLUMNS
    if offset_hi is not None:
        log = log.where(F.col("offset") < offset_hi)
    value_cols = [c for c in log.columns if c not in key]
    payload = [c for c in value_cols if c not in ("seq", "op", "offset")]
    is_full = F.col("op") != "patch"
    folded = log.groupBy(*key).agg(
        F.max(F.when(is_full, F.struct("seq", "op"))).alias("_b"),
        *[
            F.max(
                F.when(is_full | F.col(c).isNotNull(), F.struct("seq", F.col(c)))
            ).alias(f"_c_{c}")
            for c in payload
        ],
    )
    live = folded.where(F.col("_b").isNotNull() & (F.col("_b.op") != "delete"))
    seq_final = F.greatest(
        F.col("_b.seq"), *[F.col(f"_c_{c}.seq") for c in payload]
    ) if payload else F.col("_b.seq")
    return live.select(
        *key,
        seq_final.alias("seq"),
        *[F.col(f"_c_{c}.{c}").alias(c) for c in payload],
    )
