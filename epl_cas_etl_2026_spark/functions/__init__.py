from epl_cas_etl_2026_spark.functions.scalars import (
    bucket_counts,
    color_class,
    normalize_title,
    pct_of,
    territorio,
)

__all__ = [
    "bucket_counts",
    "color_class",
    "normalize_title",
    "pct_of",
    "territorio",
]
