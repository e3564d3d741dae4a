from pipeline_mf_etl_spark.functions.core import (
    all_horizontal,
    any_horizontal,
    clip,
    ensure_columns,
    finite,
    hit_rate,
    safe_div,
    sum_horizontal,
)

__all__ = [
    "safe_div",
    "ensure_columns",
    "finite",
    "clip",
    "sum_horizontal",
    "any_horizontal",
    "all_horizontal",
    "hit_rate",
]
