"""Spec model tests, semantics from reference entity/spec_test.go."""

import pytest

from geist_spark.spec.model import (
    DEFAULT_MAX_EVENT_PROCESSING_RETRIES,
    DEFAULT_MICRO_BATCH_SIZE,
    DEFAULT_STREAMS_PER_POD,
    SpecError,
    parse_spec,
    resolve_ops_per_env,
)

MINIMAL = {
    "namespace": "geisttest",
    "streamIdSuffix": "minspec",
    "description": "Minimal spec",
    "version": 1,
    "source": {"type": "geistapi"},
    "transform": {
        "extractFields": [{"fields": [{"id": "rawEvent", "type": "string"}]}]
    },
    "sink": {"type": "void"},
}


def test_minimal_spec_defaults():
    spec = parse_spec(MINIMAL)
    assert spec.id == "geisttest-minspec"
    assert spec.ops.streams_per_pod == DEFAULT_STREAMS_PER_POD
    assert spec.ops.max_event_processing_retries == DEFAULT_MAX_EVENT_PROCESSING_RETRIES
    assert spec.ops.handling_of_unretryable_events == "default"
    assert not spec.ops.micro_batch


def test_microbatch_defaults():
    d = dict(MINIMAL, ops={"microBatch": True})
    spec = parse_spec(d)
    assert spec.ops.micro_batch_size == DEFAULT_MICRO_BATCH_SIZE
    assert spec.ops.micro_batch_bytes == 5_000_000
    assert spec.ops.micro_batch_timeout_ms == 15_000


@pytest.mark.parametrize("missing", ["namespace", "streamIdSuffix", "version", "description"])
def test_missing_required(missing):
    d = {k: v for k, v in MINIMAL.items() if k != missing}
    with pytest.raises(SpecError):
        parse_spec(d)


def test_missing_sink_rejected():
    d = {k: v for k, v in MINIMAL.items() if k != "sink"}
    with pytest.raises(SpecError):
        parse_spec(d)


def test_empty_spec_rejected():
    with pytest.raises(SpecError):
        parse_spec("")
    with pytest.raises(SpecError):
        parse_spec("not json{")


def test_invalid_houe_rejected():
    d = dict(MINIMAL, ops={"handlingOfUnretryableEvents": "explode"})
    with pytest.raises(SpecError):
        parse_spec(d)


def test_regexp_validation():
    # no groups -> error (entity/regexp.go:52-55)
    d = dict(MINIMAL, transform={"regexp": {"expression": "abc"}})
    with pytest.raises(SpecError, match="no groupings"):
        parse_spec(d)
    # bad regex -> compile error
    d = dict(MINIMAL, transform={"regexp": {"expression": "(?P<a>["}})
    with pytest.raises(SpecError, match="compile"):
        parse_spec(d)
    # timeConversion requires field+inputFormat (entity/regexp.go:58-65)
    d = dict(
        MINIMAL,
        transform={
            "regexp": {"expression": "(?P<a>.*)", "timeConversion": {"field": "a"}}
        },
    )
    with pytest.raises(SpecError, match="inputFormat"):
        parse_spec(d)


def test_collect_groups_order():
    d = dict(
        MINIMAL,
        transform={"regexp": {"expression": "(?P<zebra>.)-(?P<alpha>.)x(?P<mid>.)"}},
    )
    spec = parse_spec(d)
    assert spec.transform.regexp.collect_groups() == ["zebra", "alpha", "mid"]


def test_ops_per_env():
    d = dict(
        MINIMAL,
        ops={"streamsPerPod": 2},
        opsPerEnv={"prod": {"streamsPerPod": 16}, "staging": {"streamsPerPod": 4}},
    )
    spec = parse_spec(d)
    assert spec.ops.streams_per_pod == 2
    spec = resolve_ops_per_env(spec, "prod")
    assert spec.ops.streams_per_pod == 16


def test_version_int_required():
    d = dict(MINIMAL, version="one")
    with pytest.raises(SpecError):
        parse_spec(d)


def test_json_schema_layer():
    """Structural JSON-Schema validation (reference spec.go:390-406):
    unknown top-level keys, mistyped ops, bad opsPerEnv all rejected
    with typed SpecError before semantic parsing."""
    import pytest

    from geist_spark.spec.model import SpecError, parse_spec

    base = {
        "namespace": "s", "streamIdSuffix": "x", "version": 1,
        "description": "d", "source": {"type": "geistapi"},
        "transform": {"extractFields": [{"fields": [{"id": "a", "jsonPath": "a"}]}]},
        "sink": {"type": "void"},
    }
    parse_spec(base)  # sanity: valid spec passes
    with pytest.raises(SpecError, match="schema violation"):
        parse_spec(base | {"unknownTopLevelKey": 1})
    with pytest.raises(SpecError, match="schema violation"):
        parse_spec(base | {"ops": {"microBatchSize": "five-hundred"}})
    with pytest.raises(SpecError, match="schema violation"):
        parse_spec(base | {"ops": {"notAnOpsKey": True}})
    with pytest.raises(SpecError, match="schema violation"):
        parse_spec(base | {"opsPerEnv": {"prod": {"streamsPerPod": "two"}}})
    with pytest.raises(SpecError, match="schema violation"):
        parse_spec(base | {"transform": []})
