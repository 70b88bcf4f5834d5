"""Shared ANN kernels: broadcast-centroid assignment + exact int64 dot.

Used by the IVF query (queries.q_ivf_ann) and the MAINTAINED IVF index
(streaming/ann_index.py) — one implementation so the eager query path and
the index refresh path cannot drift.
"""

from __future__ import annotations

import pandas as pd
import pyspark.sql.functions as F
from pyspark.sql.types import LongType


def ivf_assign(spark, vecs, cent_rows: list[tuple[int, list[int]]]):
    """Nearest-centroid assignment (integer L2, tie-break smallest cell id)
    as an Arrow-vectorized kernel: the trained centroids — K≈√n narrow rows,
    driver-side already because training collects them to build the next
    round's quantizer — ship to executors as a Spark BROADCAST variable
    (50 MB at n=10^10, K=10^5) and each Arrow batch computes the full
    argmin with one exact-int64 numpy matmul:

        ||q-c||² = ||q||² − 2·q·c + ||c||²   (int64 throughout — exact)

    Shuffle-free and partition-preserving (mapInPandas): the vector side
    never exchanges for assignment, and there is no n×K intermediate row
    blowup at all — the n×K distance matrix lives only inside a batch
    kernel. np.argmin returns the FIRST minimum and the centroid axis is
    sorted by cell id, so ties break to the smallest cell — exactly the
    oracle's row_number(ORDER BY dist, cell). Returns (vec_id, q, cell,
    dist). This is the vectorized-pandas boundary BASELINE.json:input_hint
    calls for; per-element Catalyst HOF evaluation measures ~100× slower on
    this math and a literal-inlined fold re-materializes the centroid array
    per row."""
    import numpy as np

    rows = sorted(cent_rows)
    bc = spark.sparkContext.broadcast(
        (
            np.array([c for c, _ in rows], dtype=np.int64),
            np.array([v for _, v in rows], dtype=np.int64),
        )
    )

    def kernel(batches):
        import numpy as np

        cells, C = bc.value
        cn = (C * C).sum(axis=1)
        for pdf in batches:
            if not len(pdf):
                continue
            Qm = np.stack(pdf["q"].to_numpy())
            qn = (Qm * Qm).sum(axis=1)
            d = qn[:, None] - 2 * (Qm @ C.T) + cn[None, :]
            idx = d.argmin(axis=1)
            yield pd.DataFrame(
                {
                    "vec_id": pdf["vec_id"],
                    "q": pdf["q"],
                    "cell": cells[idx].astype("int32"),
                    "dist": d[np.arange(len(idx)), idx],
                }
            )

    return vecs.mapInPandas(kernel, "vec_id long, q array<bigint>, cell int, dist long")


def _dot_i64_fn(qa: pd.Series, qb: pd.Series) -> pd.Series:
    """Exact int64 dot product of two array<bigint> columns — Arrow-batched
    numpy (the in-cell scoring hot loop; element-wise HOFs are interpreted)."""
    import numpy as np

    if not len(qa):
        return pd.Series([], dtype="int64")
    A = np.stack(qa.to_numpy())
    B = np.stack(qb.to_numpy())
    return pd.Series((A * B).sum(axis=1))


# DataType object (not a DDL string): a string return type would need an
# active SparkContext at import time to parse.
dot_i64 = F.pandas_udf(_dot_i64_fn, LongType())


def q6_expr(vec_col: str = "embedding") -> "F.Column":
    """float vector → exact fixed-point int64 (1e-6 steps): both engines
    (Spark and the DuckDB oracles) compute identical integers, so every
    distance/dot comparison downstream is exact, not float-fuzzy."""
    return F.transform(
        vec_col, lambda x: F.floor(x.cast("double") * 1_000_000).cast("long")
    )
