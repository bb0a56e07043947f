"""Registry native-storage round trip: specs persist across engine
restarts and redeploy on boot (reference registry Fetch semantics,
internal/pkg/registry/registry.go:110-145; version gating
registry.go:167-186)."""

import pytest

from geist_spark.engine.registry import RegistryError, SpecRegistry


def make_spec(version=1, suffix="persisted", env_ops=None):
    spec = {
        "namespace": "reg",
        "streamIdSuffix": suffix,
        "description": "registry persistence test",
        "version": version,
        "source": {"type": "geistapi"},
        "transform": {"extractFields": [{"fields": [{"id": "a", "jsonPath": "a"}]}]},
        "sink": {"type": "void"},
    }
    if env_ops:
        spec["opsPerEnv"] = env_ops
    return spec


def test_round_trip_and_version_gate(tmp_path):
    store = str(tmp_path / "registry")
    r1 = SpecRegistry(storage_path=store)
    sid = r1.put(make_spec(version=1))
    r1.put(make_spec(version=2))

    # a fresh registry (engine restart) fetches the persisted spec
    r2 = SpecRegistry(storage_path=store)
    spec = r2.get(sid)
    assert spec is not None and spec.version == 2

    # version gating applies to fetched state too
    with pytest.raises(RegistryError, match="version must exceed"):
        r2.put(make_spec(version=2))
    r2.put(make_spec(version=3))
    assert SpecRegistry(storage_path=store).get(sid).version == 3


def test_env_ops_resolution_applies_on_fetch(tmp_path):
    store = str(tmp_path / "reg2")
    SpecRegistry(storage_path=store).put(
        make_spec(env_ops={"prod": {"streamsPerPod": 8}})
    )
    prod = SpecRegistry(env="prod", storage_path=store)
    assert prod.get("reg-persisted").ops.streams_per_pod == 8
    dev = SpecRegistry(env="dev", storage_path=store)
    assert dev.get("reg-persisted").ops.streams_per_pod != 8


def test_engine_redeploys_from_persisted_registry(spark, tmp_path):
    from geist_spark.engine.api import Engine

    store = str(tmp_path / "reg3")
    eng1 = Engine(spark, registry_path=store)
    sid = eng1.register_stream(make_spec())
    eng1.shutdown()

    eng2 = Engine(spark, registry_path=store)
    # stream is live again without re-registration
    assert eng2.publish(sid, '{"a": "1"}') == ""
    assert eng2.metrics(sid).events_processed == 1
    eng2.shutdown()


def test_registry_is_itself_a_stream(spark, tmp_path):
    """Reference bootstrap parity (regspec.go:15-100,
    registry_test.go:27,76): register_stream PUBLISHES the spec through
    the registry's own geist stream; a fresh engine fetches specs via
    sink READBACK, and a version upgrade replaces the stored row
    (maxVersions=1 keyed-table semantics)."""
    from geist_spark.engine.api import Engine

    store = str(tmp_path / "regstream")
    eng1 = Engine(spark, registry_path=store)  # stream mode is default
    assert eng1._registry_stream is not None
    sid = eng1.register_stream(make_spec(version=1))
    eng1.register_stream(make_spec(version=2))

    # the spec rows live in the registry stream's SINK table, keyed by
    # namespace-streamIdSuffix, latest version only
    reg_rows = eng1._registry_stream.sink_extractor.extract_all().collect()
    assert [r["__row_key"] for r in reg_rows] == ["reg-persisted"]
    assert '"version": 2' in reg_rows[0]["specData"].replace('":2', '": 2')
    eng1.shutdown()

    # restart: fetch via sink readback, stream live again, gate intact
    eng2 = Engine(spark, registry_path=store)
    assert eng2.get_stream_spec(sid).version == 2
    assert eng2.publish(sid, '{"a": "1"}') == ""
    with pytest.raises(RegistryError, match="version must exceed"):
        eng2.register_stream(make_spec(version=2))
    eng2.shutdown()


def test_two_engines_converge_via_registry_sync(spark, tmp_path):
    """Cross-pod admin sync parity (supervisor.go:288-317): two engines
    share one registry; a spec registered (and later upgraded, and
    later disabled) on engine A reaches engine B via sync — B deploys,
    redeploys, then stops the stream, without B ever registering it."""
    from geist_spark.engine.api import Engine

    store = str(tmp_path / "shared_reg")
    a = Engine(spark, registry_path=store)
    b = Engine(spark, registry_path=store)

    sid = a.register_stream(make_spec(version=1))
    assert b.get_stream_spec(sid) is None  # not yet synced
    assert b.sync_from_registry() == [sid]
    assert b.publish(sid, '{"a": "1"}') == ""  # B deployed it
    assert b.sync_from_registry() == []  # idempotent

    # upgrade on A -> B adopts the higher version only after sync
    a.register_stream(make_spec(version=2))
    assert b.get_stream_spec(sid).version == 1
    assert b.sync_from_registry() == [sid]
    assert b.get_stream_spec(sid).version == 2

    # disable on A -> B stops the stream on sync
    dis = make_spec(version=3)
    dis["disabled"] = True
    a.register_stream(dis)
    b.sync_from_registry()
    with pytest.raises(RegistryError, match="disabled"):
        b.publish(sid, '{"a": "2"}')
    a.shutdown()
    b.shutdown()


def test_registry_file_mode_still_supported(spark, tmp_path):
    import os

    from geist_spark.engine.api import Engine

    store = str(tmp_path / "regfile")
    eng = Engine(spark, registry_path=store, registry_mode="file")
    sid = eng.register_stream(make_spec())
    assert os.path.exists(os.path.join(store, f"{sid}.json"))
    eng.shutdown()
    eng2 = Engine(spark, registry_path=store, registry_mode="file")
    assert eng2.get_stream_spec(sid) is not None
    eng2.shutdown()
