from multiversx_etl_spark.lake.table import (
    LakeTable,
    Manifest,
    bucket_expr,
    repartition_for_write,
)

__all__ = ["LakeTable", "Manifest", "bucket_expr", "repartition_for_write"]
