from geist_spark.spec.model import (
    Spec,
    SpecError,
    Ops,
    SourceSpec,
    SinkSpec,
    TransformSpec,
    ExcludeEventsWith,
    MultiCondExclude,
    ExtractFields,
    ExtractItemsFromArray,
    ForEventsWith,
    FieldSpec,
    RegexpSpec,
    TimeConv,
    parse_spec,
    resolve_ops_per_env,
    GEIST_INGESTION_TIME,
)

__all__ = [
    "Spec", "SpecError", "Ops", "SourceSpec", "SinkSpec", "TransformSpec",
    "ExcludeEventsWith", "MultiCondExclude", "ExtractFields",
    "ExtractItemsFromArray", "ForEventsWith", "FieldSpec", "RegexpSpec",
    "TimeConv", "parse_spec", "resolve_ops_per_env", "GEIST_INGESTION_TIME",
]
