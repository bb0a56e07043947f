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


def _win_spec(window):
    d = dict(MINIMAL)
    d["transform"] = dict(MINIMAL["transform"], window=window)
    return d


def test_window_section_parses_and_validates():
    spec = parse_spec(
        _win_spec(
            {
                "partitionBy": ["uid"],
                "orderBy": [{"field": "ts"}, {"field": "eid", "desc": True}],
                "functions": [
                    {"fn": "row_number", "alias": "rn"},
                    {"fn": "lag", "field": "etype", "offset": 2, "alias": "p"},
                    {"fn": "ntile", "n": 4, "alias": "q"},
                ],
                "keepTopN": 3,
            }
        )
    )
    w = spec.transform.window
    assert w.partition_by == ["uid"]
    assert w.order_by == [("ts", False), ("eid", True)]
    assert [f.fn for f in w.functions] == ["row_number", "lag", "ntile"]
    assert w.functions[1].offset == 2 and w.keep_top_n == 3


def test_window_section_rejects_bad_shapes():
    base = {
        "partitionBy": ["uid"],
        "orderBy": [{"field": "ts"}],
        "functions": [{"fn": "row_number", "alias": "rn"}],
    }
    with pytest.raises(SpecError, match="partitionBy"):
        parse_spec(_win_spec(dict(base, partitionBy=[])))
    with pytest.raises(SpecError, match="orderBy"):
        parse_spec(_win_spec(dict(base, orderBy=[])))
    with pytest.raises(SpecError, match="unknown fn"):
        parse_spec(
            _win_spec(dict(base, functions=[{"fn": "median", "alias": "m"}]))
        )
    with pytest.raises(SpecError, match="requires a field"):
        parse_spec(
            _win_spec(dict(base, functions=[{"fn": "lag", "alias": "p"}]))
        )
    with pytest.raises(SpecError, match="duplicate alias"):
        parse_spec(
            _win_spec(
                dict(
                    base,
                    functions=[
                        {"fn": "row_number", "alias": "x"},
                        {"fn": "rank", "alias": "x"},
                    ],
                )
            )
        )
    with pytest.raises(SpecError, match="ntile"):
        parse_spec(
            _win_spec(dict(base, functions=[{"fn": "ntile", "alias": "q"}]))
        )


def test_window_rejects_negative_keep_top_n():
    with pytest.raises(SpecError, match="keepTopN"):
        parse_spec(
            _win_spec(
                {
                    "partitionBy": ["uid"],
                    "orderBy": [{"field": "ts"}],
                    "functions": [{"fn": "row_number", "alias": "rn"}],
                    "keepTopN": -1,
                }
            )
        )
