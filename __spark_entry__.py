"""Driver contract for the spark-graft builder (PySpark target).

``entry`` runs the flagship CDC latest-state query at sf0.001;
``queries``/``oracle_sql`` expose the full implemented surface
(multiversx_etl_spark/queries.py) for the DuckDB correctness gate.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from multiversx_etl_spark import queries as Q


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: the CDC per-key latest-state fold (the engine's core shape,
    SURVEY.md §2.A A14) over the sf0.001 events table."""
    return Q.QUERIES["q_cdc_latest_state"](spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return dict(Q.QUERIES)


def oracle_sql() -> dict[str, str]:
    return dict(Q.ORACLE_SQL)
