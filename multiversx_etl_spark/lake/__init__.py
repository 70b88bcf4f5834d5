from multiversx_etl_spark.lake.table import LakeTable, Manifest, bucket_expr

__all__ = ["LakeTable", "Manifest", "bucket_expr"]
