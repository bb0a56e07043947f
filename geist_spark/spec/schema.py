"""Structural JSON-Schema validation for stream specs.

Same draft-07 contract as the reference's embedded schema
(entity/spec.go:409-547, applied at spec.go:390-406): required
top-level fields, typed ops block with the HOUE enum, unknown
top-level keys rejected. Semantic validation (regexp compile, join
shape, aggregate fns, ...) happens after parsing in model.py — this
layer catches malformed documents with a typed SpecError before any
of that runs, exactly like the reference's two-phase Validate().

The engine's dialect extensions (source/sink `config`, transform
analytics sections) live INSIDE sections the reference schema leaves
open (`transform` is just "type: object"; source/sink don't forbid
extra keys), so one schema serves both the reference surface and the
extended dialect.
"""

from __future__ import annotations

from typing import Any

_OPS = {
    "type": "object",
    "properties": {
        "streamsPerPod": {"type": "integer"},
        "disabled": {"type": "boolean"},
        "microBatch": {"type": "boolean"},
        "microBatchSize": {"type": "integer"},
        "microBatchBytes": {"type": "integer"},
        "microBatchTimeoutMs": {"type": "integer"},
        "maxEventProcessingRetries": {"type": "integer"},
        "maxStreamRetryBackoffIntervalSec": {"type": "integer"},
        "handlingOfUnretryableEvents": {
            "type": "string",
            "enum": ["default", "discard", "dlq", "fail"],
        },
        "logEventData": {"type": "boolean"},
        "customProperties": {
            "anyOf": [
                {"type": "object", "additionalProperties": {"type": "string"}},
                {"type": "null"},
            ]
        },
    },
    "additionalProperties": False,
}

SPEC_SCHEMA: dict[str, Any] = {
    "$schema": "http://json-schema.org/draft-07/schema",
    "type": "object",
    "required": [
        "namespace",
        "streamIdSuffix",
        "version",
        "description",
        "source",
        "transform",
        "sink",
    ],
    "properties": {
        "namespace": {"type": "string", "minLength": 1},
        "streamIdSuffix": {"type": "string", "minLength": 1},
        "version": {"type": "integer"},
        "description": {"type": "string", "minLength": 1},
        "disabled": {"type": "boolean"},
        "ops": _OPS,
        "opsPerEnv": {
            "anyOf": [
                {"type": "object", "additionalProperties": _OPS},
                {"type": "null"},
            ]
        },
        "source": {
            "type": "object",
            "required": ["type"],
            "properties": {"type": {"type": "string", "minLength": 1}},
        },
        "transform": {"type": "object"},
        "sink": {
            "type": "object",
            "required": ["type"],
            "properties": {"type": {"type": "string", "minLength": 1}},
        },
    },
    "additionalProperties": False,
}


def validate_schema(doc: Any) -> None:
    """Raise SpecError on structural schema violations."""
    import jsonschema

    from geist_spark.spec.model import SpecError

    try:
        jsonschema.validate(doc, SPEC_SCHEMA)
    except jsonschema.ValidationError as e:
        path = "/".join(str(p) for p in e.absolute_path) or "(root)"
        raise SpecError(f"spec schema violation at {path}: {e.message}") from None
