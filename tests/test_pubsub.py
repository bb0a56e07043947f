"""Pub/Sub emulator source + cross-pod admin sync.

Covers the reference's pubsub contract
(test/specs/pubsubsrc-regexp-reqs-voidsink.json:10-28, README pubsub
semantics) against the file-backed emulator:
- broker publish/pull/cursor mechanics
- reference pubsub spec runs VERBATIM through the engine (no factory)
- shared subscription: ack-after-sink, a second pod resumes past the
  cursor (queue semantics)
- unique subscription: a second pod re-reads everything (fan-out)
- cross-pod admin sync over the admin topic (adminspec.go:9-17), both
  the lightweight pull-thread mode and the admin-stream-as-a-real-
  geist-stream mode (adminspec.go:19-63 + admin sink)
"""

from __future__ import annotations

import json
import time

import pytest

from geist_spark.engine.api import Engine
from geist_spark.sources.pubsub import PubSubEmulator


def _pubsub_spec(root, topic, sub_type, sub_name, out_path, suffix="ps-e2e"):
    return {
        "namespace": "test",
        "streamIdSuffix": suffix,
        "description": "pubsub emulator e2e",
        "version": 1,
        "source": {"type": "pubsub", "config": {"customConfig": {
            "emulatorPath": root,
            "topics": [{"env": "all", "names": [topic]}],
            "subscription": {"type": sub_type, "name": sub_name},
        }}},
        "transform": {"extractFields": [{"fields": [
            {"id": "name", "jsonPath": "name"},
            {"id": "n", "jsonPath": "n", "type": "integer"},
        ]}]},
        "sink": {"type": "keyedTable", "config": {"customConfig": {
            "path": out_path, "rowKeyFields": ["name"],
        }}},
    }


def test_broker_mechanics(tmp_path):
    emu = PubSubEmulator(str(tmp_path / "emu"))
    assert emu.latest_seq("t") == 0
    s1 = emu.publish("t", "a", {"k": "1"})
    s2 = emu.publish("t", "b")
    assert (s1, s2) == (1, 2)
    msgs = emu.read_after("t", 0)
    assert [m["data"] for m in msgs] == ["a", "b"]
    assert msgs[0]["attributes"] == {"k": "1"}
    # limited read + cursor-advancing pull
    assert [m["data"] for m in emu.read_after("t", 1)] == ["b"]
    assert [m["data"] for m in emu.pull("t", "s1")] == ["a", "b"]
    assert emu.pull("t", "s1") == []
    emu.publish("t", "c")
    assert [m["data"] for m in emu.pull("t", "s1")] == ["c"]
    # independent subscription sees everything
    assert [m["data"] for m in emu.pull("t", "s2")] == ["a", "b", "c"]
    # commit is monotonic
    emu.commit("s1", 1)
    assert emu.cursor("s1") == 3


def test_reference_pubsub_spec_verbatim(spark, tmp_path):
    """A reference pubsub spec (topics + subscription shape verbatim)
    runs end-to-end against the emulator with NO custom factory — the
    NotImplementedError gap from round 1 is closed."""
    root = str(tmp_path / "emu")
    out = str(tmp_path / "out")
    emu = PubSubEmulator(root)
    for i in range(3):
        emu.publish("foo-logs-bar-usage", json.dumps({"name": f"e{i}", "n": i}))

    eng = Engine(spark)
    sid = eng.register_stream(_pubsub_spec(
        root, "foo-logs-bar-usage", "shared", "geist-foo", out))
    ss = eng.start_streaming(sid)
    try:
        ss.query.processAllAvailable()
        got = spark.read.parquet(out)
        assert got.count() == 3
        assert {r["n"] for r in got.collect()} == {0, 1, 2}
        # incremental: late-published events flow through
        emu.publish("foo-logs-bar-usage", json.dumps({"name": "e9", "n": 9}))
        ss.query.processAllAvailable()
        assert spark.read.parquet(out).count() == 4
    finally:
        eng.shutdown()


def test_shared_subscription_queue_semantics(spark, tmp_path):
    """shared = queue: the broker cursor advances on Spark's offset
    commit (AFTER the sink write — ack-after-sink), so a second pod
    with a fresh checkpoint but the SAME subscription resumes past
    already-consumed messages instead of reprocessing them."""
    root = str(tmp_path / "emu")
    emu = PubSubEmulator(root)
    topic, sub = "shared-t", "shared-sub"
    for i in range(3):
        emu.publish(topic, json.dumps({"name": f"e{i}", "n": i}))

    out1 = str(tmp_path / "out1")
    eng1 = Engine(spark)
    sid1 = eng1.register_stream(_pubsub_spec(root, topic, "shared", sub, out1))
    ss1 = eng1.start_streaming(sid1)
    try:
        ss1.query.processAllAvailable()  # batch 1: seq 1-3
        # Spark acks batch N's offsets while constructing batch N+1, so
        # a tail message forces the commit of seq 1-3
        emu.publish(topic, json.dumps({"name": "tail", "n": 42}))
        ss1.query.processAllAvailable()  # batch 2: seq 4 (uncommitted)
        assert spark.read.parquet(out1).count() == 4
    finally:
        eng1.shutdown()
    assert emu.cursor(sub) == 3

    # pod 2, same shared subscription, fresh engine + checkpoint:
    # resumes at the broker cursor. The committed prefix (seq 1-3) is
    # NEVER redelivered; the in-flight tail (seq 4) IS — at-least-once
    # with ack-after-sink, the reference's stated guarantee.
    out2 = str(tmp_path / "out2")
    eng2 = Engine(spark)
    sid2 = eng2.register_stream(
        _pubsub_spec(root, topic, "shared", sub, out2, suffix="ps-e2e-b"))
    ss2 = eng2.start_streaming(sid2)
    try:
        ss2.query.processAllAvailable()
        got = spark.read.parquet(out2).collect()
        assert [r["n"] for r in got] == [42]
    finally:
        eng2.shutdown()


def test_unique_subscription_fanout(spark, tmp_path):
    """unique = fan-out: each pod's checkpoint is its own cursor; a
    second pod re-reads the full topic (GCP unique-subscription-per-pod
    behavior, used by the admin stream so every pod hears every
    notification)."""
    root = str(tmp_path / "emu")
    emu = PubSubEmulator(root)
    topic = "fan-t"
    for i in range(2):
        emu.publish(topic, json.dumps({"name": f"e{i}", "n": i}))

    counts = []
    for pod in ("a", "b"):
        out = str(tmp_path / f"out-{pod}")
        eng = Engine(spark)
        sid = eng.register_stream(_pubsub_spec(
            root, topic, "unique", f"u-{pod}", out, suffix=f"ps-fan-{pod}"))
        ss = eng.start_streaming(sid)
        try:
            ss.query.processAllAvailable()
            counts.append(spark.read.parquet(out).count())
        finally:
            eng.shutdown()
    assert counts == [2, 2]
    # unique mode never writes broker cursors
    assert emu.cursor("u-a") == 0


def _wait_for(pred, timeout_s=20.0, poll_s=0.1):
    t0 = time.monotonic()
    while time.monotonic() - t0 < timeout_s:
        if pred():
            return True
        time.sleep(poll_s)
    return False


VOID_SPEC = {
    "namespace": "sync",
    "streamIdSuffix": "hello",
    "description": "cross-pod sync payload",
    "version": 1,
    "source": {"type": "geistapi"},
    "transform": {"extractFields": [{"fields": [{"id": "m", "jsonPath": "m"}]}]},
    "sink": {"type": "void"},
}


def test_admin_sync_thread_mode(spark, tmp_path):
    """Two engines share registry storage + the admin topic. A spec
    registered on pod A is adopted by pod B on the admin NOTIFICATION
    (no blind polling): B can then publish to the stream."""
    reg = str(tmp_path / "reg")
    emu_root = str(tmp_path / "emu")
    eng_a = Engine(spark, registry_path=reg, registry_mode="file")
    eng_b = Engine(spark, registry_path=reg, registry_mode="file")
    eng_a.enable_admin_sync(emu_root)
    eng_b.enable_admin_sync(emu_root)
    try:
        sid = eng_a.register_stream(VOID_SPEC)
        assert _wait_for(lambda: eng_b.get_stream_spec(sid) is not None)
        assert _wait_for(lambda: sid in eng_b._streams)
        rid = eng_b.publish(sid, json.dumps({"m": "hi"}))
        assert rid is not None
    finally:
        eng_a.shutdown()
        eng_b.shutdown()


def test_admin_sync_stream_mode(spark, tmp_path):
    """The admin stream runs as a REAL geist stream on pod B: the
    ported native AdminEventSpec (adminspec.go:19-63) — pubsub source
    (unique subscription on the admin topic) -> extractFields
    eventName/rawEvent -> admin sink -> registry sync + redeploy."""
    reg = str(tmp_path / "reg")
    emu_root = str(tmp_path / "emu")
    eng_a = Engine(spark, registry_path=reg, registry_mode="file")
    eng_b = Engine(spark, registry_path=reg, registry_mode="file")
    eng_a.enable_admin_sync(emu_root)  # publisher side only needs the client
    eng_b.enable_admin_sync(emu_root, mode="stream")
    try:
        sid = eng_a.register_stream(VOID_SPEC)
        eng_b._admin_stream.query.processAllAvailable()
        assert eng_b.get_stream_spec(sid) is not None
        assert sid in eng_b._streams
        loader = eng_b._admin_stream.loader
        assert loader.events_seen >= 1
    finally:
        eng_a.shutdown()
        eng_b.shutdown()


def test_admin_sync_rejects_bad_mode(spark, tmp_path):
    eng = Engine(spark)
    with pytest.raises(ValueError, match="mode"):
        eng.enable_admin_sync(str(tmp_path / "emu"), mode="nope")
    eng.shutdown()
