from etl_mudah_spark.functions.core import (
    bucket_case,
    capitalize,
    dsum,
    davg,
    fixed_width_bin,
    share_pct,
    synonym_remap,
)

__all__ = [
    "bucket_case",
    "capitalize",
    "dsum",
    "davg",
    "fixed_width_bin",
    "share_pct",
    "synonym_remap",
]
