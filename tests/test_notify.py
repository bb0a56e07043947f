"""Notification-channel parity (reference pkg/notify +
geist.NotificationChannel, asserted as golden values in
geist_test.go:140-384): every lifecycle action emits a typed
operational event on the engine's channel."""

from __future__ import annotations

import json

import pytest

from geist_spark.engine.api import Engine
from geist_spark.engine.registry import RegistryError


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
