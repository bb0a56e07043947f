"""eventsim generator tests, semantics from
internal/pkg/entity/eventsim/eventsim_test.go (lengths, charsets,
formats, UUID, weights, overrides, nested paths)."""

import json
import re

import pytest
from pyspark.sql import functions as F

from geist_spark.sources.eventsim import (
    EventSim,
    SimConfig,
    parse_sim_config,
    _peak_time_epoch,
)

BERRY_CONFIG = {
    "simResolutionMilliseconds": 3000,
    "eventGeneration": {
        "type": "sinusoid",
        "minCount": 1,
        "maxCount": 50,
        "periodSeconds": 86400,
        "peakTime": "2023-03-25T11:00:00Z",
    },
    "eventSpec": {
        "fields": [
            {"field": "eventId", "randomizedValue": {"type": "uuid"}},
            {
                "field": "dateReported",
                "randomizedValue": {
                    "type": "isoTimestampMilliseconds",
                    "jitterMilliseconds": 6000,
                },
            },
            {
                "field": "berriesPicked.type",
                "predefinedValues": [
                    {"value": "blueberry", "frequencyFactor": 60},
                    {"value": "blackberry", "frequencyFactor": 30},
                    {"value": "cloudberry", "frequencyFactor": 10},
                ],
            },
            {
                "field": "berriesPicked.amount",
                "randomizedValue": {"type": "int", "min": 0, "max": 75},
            },
        ]
    },
}


def events(spark, config, n=200, seed=42):
    sim = EventSim(parse_sim_config(config), seed=seed)
    return [json.loads(r["value"]) for r in sim.batch(spark, count=n).collect()]


def test_berry_events_shape(spark):
    evs = events(spark, BERRY_CONFIG, n=100)
    assert len(evs) == 100
    for ev in evs[:10]:
        assert re.fullmatch(
            r"[0-9a-f]{8}-[0-9a-f]{4}-[0-9a-f]{4}-[0-9a-f]{4}-[0-9a-f]{12}",
            ev["eventId"],
        )
        assert re.fullmatch(
            r"\d{4}-\d{2}-\d{2}T\d{2}:\d{2}:\d{2}\.\d{3}Z", ev["dateReported"]
        )
        assert ev["berriesPicked"]["type"] in ("blueberry", "blackberry", "cloudberry")
        assert 0 <= ev["berriesPicked"]["amount"] <= 75


def test_weighted_distribution(spark):
    evs = events(spark, BERRY_CONFIG, n=2000)
    counts = {}
    for ev in evs:
        t = ev["berriesPicked"]["type"]
        counts[t] = counts.get(t, 0) + 1
    # 60/30/10 weights with generous tolerance
    assert counts["blueberry"] > counts["blackberry"] > counts["cloudberry"]
    assert 0.5 < counts["blueberry"] / 2000 < 0.7


def test_random_string_charset_and_length(spark):
    cfg = {
        "eventSpec": {
            "fields": [
                {
                    "field": "s",
                    "randomizedValue": {"type": "string", "min": 4, "max": 9},
                }
            ]
        }
    }
    for ev in events(spark, cfg, n=100):
        assert 4 <= len(ev["s"]) <= 9
        assert re.fullmatch(r"[A-Za-z]+", ev["s"])


def test_float_fraction_digits(spark):
    cfg = {
        "eventSpec": {
            "fields": [
                {
                    "field": "f",
                    "randomizedValue": {
                        "type": "float", "min": 1.0, "max": 100.0,
                        "maxFractionDigits": 3,
                    },
                }
            ]
        }
    }
    for ev in events(spark, cfg, n=100):
        assert 1.0 <= ev["f"] <= 100.0
        frac = str(ev["f"]).split(".")[-1]
        assert len(frac) <= 3


def test_predefined_null_emitted(spark):
    cfg = {
        "eventSpec": {
            "fields": [{"field": "missing", "predefinedValues": [{"value": None}]}]
        }
    }
    evs = events(spark, cfg, n=5)
    assert all("missing" in ev and ev["missing"] is None for ev in evs)


def test_set_of_strings(spark):
    cfg = {
        "eventSpec": {
            "fields": [
                {
                    "field": "loc",
                    "setOfStrings": {
                        "prefix": "location",
                        "amount": 4,
                        "excludeValues": ["location2"],
                        "frequencyMin": 5,
                        "frequencyMax": 10,
                    },
                }
            ]
        }
    }
    seen = {ev["loc"] for ev in events(spark, cfg, n=300)}
    assert seen <= {"location1", "location3", "location4"}
    assert len(seen) == 3


def test_overrides(spark):
    # eventsim_test.go:219-226: blueberry gets popularity=1
    cfg = dict(BERRY_CONFIG)
    cfg = json.loads(json.dumps(BERRY_CONFIG))
    cfg["overrides"] = [
        {
            "condition": {"field": "berriesPicked.type", "value": "blueberry"},
            "fields": [
                {"field": "foo.popularity", "predefinedValues": [{"value": 1}]}
            ],
        }
    ]
    evs = events(spark, cfg, n=300)
    for ev in evs:
        if ev["berriesPicked"]["type"] == "blueberry":
            assert ev["foo"]["popularity"] == 1
        else:
            assert ev.get("foo", {}).get("popularity") is None


def test_sinusoid_count():
    sim = EventSim(parse_sim_config(BERRY_CONFIG), seed=1)
    peak = _peak_time_epoch("2023-03-25T11:00:00Z")
    assert sim._sinusoid_count(peak) == 50  # at peak -> max
    assert sim._sinusoid_count(peak + 86400 / 2) == 1  # half period -> min


def test_streaming_eventsim_to_void(spark):
    from geist_spark.engine.api import Engine

    eng = Engine(spark)
    sid = eng.register_stream(
        {
            "namespace": "sim",
            "streamIdSuffix": "stream",
            "description": "eventsim streaming test",
            "version": 1,
            "source": {
                "type": "eventsim",
                "config": {
                    "customConfig": {
                        "simResolutionMilliseconds": 100,
                        "seed": 7,
                        "eventGeneration": {"type": "random", "minCount": 3, "maxCount": 8},
                        "eventSpec": {
                            "fields": [
                                {"field": "id", "randomizedValue": {"type": "uuid"}},
                                {
                                    "field": "berry",
                                    "predefinedValues": [
                                        {"value": "blueberry", "frequencyFactor": 1}
                                    ],
                                },
                            ]
                        },
                    }
                },
            },
            "transform": {
                "extractFields": [
                    {
                        "fields": [
                            {"id": "eventId", "jsonPath": "id"},
                            {"id": "berry", "jsonPath": "berry"},
                        ]
                    }
                ]
            },
            "sink": {"type": "void"},
        }
    )
    ss = eng.start_streaming(sid)
    try:
        # rate-micro-batch always has a next batch, so
        # processAllAvailable() would never return; poll instead.
        ss.await_batches(n=2, timeout_s=120)
        assert ss.metrics.microbatches >= 2
        assert ss.metrics.sink_operations >= 2
    finally:
        eng.shutdown()


def test_topics_for_env():
    from geist_spark.streaming.runner import _topics_for_env

    cc = {"topics": [
        {"env": "all", "names": ["t-common"]},
        {"env": "prod", "names": ["t-prod-1", "t-prod-2"]},
    ]}
    # first matching entry wins (spec shape
    # test/specs/kafkasrc-bigquerysink-fooevents.json:9-41)
    assert _topics_for_env(cc, "dev") == ["t-common"]
    assert _topics_for_env(cc, "") == ["t-common"]
    assert _topics_for_env({"topics": [{"env": "prod", "names": ["p"]}]}, "prod") == ["p"]
    assert _topics_for_env({"topics": [{"env": "prod", "names": ["p"]}]}, "dev") == []
    assert _topics_for_env({}, "prod") == []


def test_streaming_metrics_from_progress(spark):
    """events_processed is fed by the StreamingQueryListener from
    Spark's progress events (entity/common.go:36-62 shape)."""
    import time as _time
    from geist_spark.engine.api import Engine

    eng = Engine(spark)
    sid = eng.register_stream({
        "namespace": "sim", "streamIdSuffix": "metrics", "version": 1,
        "description": "metrics listener test",
        "source": {"type": "eventsim", "config": {"customConfig": {
            "simResolutionMilliseconds": 100, "seed": 13,
            "eventGeneration": {"type": "random", "minCount": 2, "maxCount": 5},
            "eventSpec": {"fields": [{"field": "id", "randomizedValue": {"type": "uuid"}}]},
        }}},
        "transform": {"extractFields": [{"fields": [{"id": "eventId", "jsonPath": "id"}]}]},
        "sink": {"type": "void"},
    })
    ss = eng.start_streaming(sid)
    try:
        ss.await_batches(n=3, timeout_s=120)
        deadline = _time.monotonic() + 30
        while ss.metrics.events_processed == 0 and _time.monotonic() < deadline:
            _time.sleep(0.2)  # listener events arrive async
        assert ss.metrics.events_processed >= 2
    finally:
        eng.shutdown()


def test_custom_charset_batch(spark):
    """Custom charsets (reference config.go:101-110) reach the string
    generator."""
    cfg = {"eventSpec": {"fields": [{
        "field": "s",
        "randomizedValue": {"type": "string", "min": 5, "max": 8,
                            "charset": "hex"},
    }]}}
    sim = EventSim(parse_sim_config(cfg), seed=3, charsets={"hex": "0123456789abcdef"})
    vals = [json.loads(r["value"])["s"] for r in sim.batch(spark, count=50).collect()]
    assert all(re.fullmatch(r"[0-9a-f]{5,8}", v) for v in vals)


def test_custom_charset_streaming_via_engine(spark):
    from geist_spark.engine.api import Engine

    eng = Engine(spark)
    eng.register_eventsim_charset("digits", "0123456789")
    sid = eng.register_stream({
        "namespace": "sim", "streamIdSuffix": "charset", "version": 1,
        "description": "charset test",
        "source": {"type": "eventsim", "config": {"customConfig": {
            "simResolutionMilliseconds": 100, "seed": 4,
            "eventGeneration": {"type": "random", "minCount": 2, "maxCount": 4},
            "eventSpec": {"fields": [{
                "field": "code",
                "randomizedValue": {"type": "string", "min": 4, "max": 4,
                                    "charset": "digits"},
            }]},
        }}},
        "transform": {"extractFields": [{"fields": [{"id": "code", "jsonPath": "code"}]}]},
        "sink": {"type": "void"},
    })
    ss = eng.start_streaming(sid)
    try:
        ss.await_batches(n=1, timeout_s=120)
    finally:
        eng.shutdown()
