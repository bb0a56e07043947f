from geist_spark.functions.json_path import (
    json_col,
    json_str,
    typed_col,
    spark_type_for,
)
from geist_spark.functions.timeconv import (
    go_layout_to_spark,
    parse_go_time,
    format_go_time,
    convert_time,
    RFC3339_PATTERN,
)

__all__ = [
    "json_col",
    "json_str",
    "typed_col",
    "spark_type_for",
    "go_layout_to_spark",
    "parse_go_time",
    "format_go_time",
    "convert_time",
    "RFC3339_PATTERN",
]
