from geist_spark.compiler.transform import (
    CompiledTransform,
    compile_transform,
    exclude_condition,
    multi_exclude_condition,
    applicable_condition,
    REGEXP_PAYLOAD_KEY,
)

__all__ = [
    "CompiledTransform",
    "compile_transform",
    "exclude_condition",
    "multi_exclude_condition",
    "applicable_condition",
    "REGEXP_PAYLOAD_KEY",
]
