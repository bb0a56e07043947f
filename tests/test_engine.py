"""Engine e2e: register -> publish -> sink, semantics from
geist_test.go:140-563 (in-mem registry + void sink + keyed table +
hooks + resilience)."""

import json

import pytest
from pyspark.sql import functions as F

from geist_spark.engine.api import Engine
from geist_spark.engine.hooks import HookAction
from geist_spark.engine.registry import RegistryError
from geist_spark.sinks.keyed_table import new_temp_path
from geist_spark.spec.model import SpecError


def make_spec(suffix="s1", version=1, sink_type="void", sink_cfg=None, ops=None, transform=None):
    d = {
        "namespace": "enginetest",
        "streamIdSuffix": suffix,
        "description": "engine test stream",
        "version": version,
        "source": {"type": "geistapi"},
        "transform": transform
        or {
            "extractFields": [
                {
                    "fields": [
                        {"id": "name", "jsonPath": "name"},
                        {"id": "amount", "jsonPath": "amount", "type": "integer"},
                    ]
                }
            ]
        },
        "sink": {"type": sink_type},
    }
    if sink_cfg:
        d["sink"]["config"] = {"customConfig": sink_cfg}
    if ops:
        d["ops"] = ops
    return d


@pytest.fixture
def engine(spark):
    return Engine(spark)


def test_register_and_publish_void(engine):
    sid = engine.register_stream(make_spec())
    assert sid == "enginetest-s1"
    rid = engine.publish(sid, '{"name": "a", "amount": 5}')
    assert rid == ""
    m = engine.metrics(sid)
    assert m.events_processed == 1
    assert m.events_stored_in_sink == 1


def test_version_gating(engine):
    engine.register_stream(make_spec(version=2))
    with pytest.raises(RegistryError):
        engine.register_stream(make_spec(version=2))
    with pytest.raises(RegistryError):
        engine.register_stream(make_spec(version=1))
    engine.register_stream(make_spec(version=3))  # upgrade ok


def test_invalid_spec_rejected(engine):
    with pytest.raises(SpecError):
        engine.register_stream({"namespace": "x"})


def test_disabled_stream(engine):
    sid = engine.register_stream(make_spec(suffix="dis", version=1))
    spec2 = make_spec(suffix="dis", version=2)
    spec2["disabled"] = True
    engine.register_stream(spec2)
    # must surface as "disabled" (reference ErrCodeStreamDisabled,
    # geist.go:131-137), not as an unknown-stream KeyError
    with pytest.raises(RegistryError, match="disabled"):
        engine.publish(sid, '{"name": "a"}')
    with pytest.raises(KeyError):
        engine.publish("never-registered", '{"name": "a"}')


def test_keyed_table_sink_and_readback(engine, spark):
    path = new_temp_path()
    sid = engine.register_stream(
        make_spec(
            suffix="kt",
            sink_type="bigtable",
            sink_cfg={"path": path, "rowKeyFields": ["name", "amount"], "rowKeyDelimiter": "#"},
        )
    )
    engine.publish(sid, '{"name": "a", "amount": 5}')
    engine.publish(sid, '{"name": "b", "amount": 7}')
    ext = engine.stream(sid).sink_extractor
    rows = {r["__row_key"]: r for r in ext.extract_all().collect()}
    assert set(rows) == {"a#5", "b#7"}
    kv = ext.extract_key_value("a#5").collect()
    assert len(kv) == 1 and kv[0]["amount"] == 5


def test_max_versions_readback(engine, spark):
    path = new_temp_path()
    sid = engine.register_stream(
        make_spec(
            suffix="mv",
            sink_type="bigtable",
            sink_cfg={"path": path, "rowKeyFields": ["name"], "maxVersions": 2},
        )
    )
    for amount in (1, 2, 3):
        engine.publish(sid, json.dumps({"name": "k", "amount": amount}))
    ext = engine.stream(sid).sink_extractor
    vals = sorted(r["amount"] for r in ext.extract_all().collect())
    assert len(vals) == 2  # keep-last-2 per key (BigTable GC emulation)


def test_filtered_event_returns_empty(engine):
    sid = engine.register_stream(
        make_spec(
            suffix="flt",
            transform={
                "excludeEventsWith": [{"key": "name", "values": ["drop"]}],
                "extractFields": [{"fields": [{"id": "name", "jsonPath": "name"}]}],
            },
        )
    )
    assert engine.publish(sid, '{"name": "drop"}') == ""
    assert engine.metrics(sid).events_excluded == 1


def test_hooks_enrich_and_skip(spark):
    def pre(ctx, holder):
        doc = json.loads(holder.data)
        if doc.get("name") == "skipme":
            return HookAction.SKIP
        holder.enrich(injectedField="hi there")
        return HookAction.PROCEED

    eng = Engine(spark, pre_transform_hook=pre)
    path = new_temp_path()
    sid = eng.register_stream(
        make_spec(
            suffix="hk",
            sink_type="keyedTable",
            sink_cfg={"path": path, "rowKeyFields": ["name"]},
            transform={
                "extractFields": [
                    {
                        "fields": [
                            {"id": "name", "jsonPath": "name"},
                            {"id": "injected", "jsonPath": "injectedField"},
                        ]
                    }
                ]
            },
        )
    )
    eng.publish(sid, '{"name": "a"}')
    eng.publish(sid, '{"name": "skipme"}')
    rows = eng.stream(sid).sink_extractor.extract_all().collect()
    assert len(rows) == 1
    assert rows[0]["injected"] == "hi there"


def test_unretryable_sink_error_discard_and_fail(spark):
    eng = Engine(spark)
    spec = make_spec(suffix="err")
    spec["sink"]["config"] = {
        "properties": [{"key": "simulateError", "value": "alwaysUnretryable"}]
    }
    sid = eng.register_stream(spec)
    assert eng.publish(sid, '{"name": "a"}') == ""  # discarded (default HOUE)
    assert eng.metrics(sid).events_failed == 1

    spec_fail = make_spec(suffix="errf", ops={"handlingOfUnretryableEvents": "fail"})
    spec_fail["sink"]["config"] = {
        "properties": [{"key": "simulateError", "value": "alwaysUnretryable"}]
    }
    sid2 = eng.register_stream(spec_fail)
    from geist_spark.engine.stream import UnretryableStreamError

    with pytest.raises(UnretryableStreamError):
        eng.publish(sid2, '{"name": "a"}')


def test_retryable_error_then_success(spark):
    eng = Engine(spark)
    spec = make_spec(suffix="retry", ops={"customProperties": {"retryBackoffMs": "1"}})
    spec["sink"]["config"] = {
        "properties": [
            {"key": "simulateError", "value": "alwaysRetryable"},
            {"key": "maxErrors", "value": "2"},
        ]
    }
    sid = eng.register_stream(spec)
    assert eng.publish(sid, '{"name": "a"}') == ""
    assert eng.metrics(sid).sink_operations == 1  # succeeded on 3rd attempt


def test_dlq_routing(spark):
    eng = Engine(spark)
    spec = make_spec(suffix="dlq", ops={"handlingOfUnretryableEvents": "dlq"})
    spec["sink"]["config"] = {
        "properties": [{"key": "simulateError", "value": "alwaysUnretryable"}]
    }
    sid = eng.register_stream(spec)
    ev = '{"name": "a"}'
    eng.publish(sid, ev)
    dlq = eng.stream(sid).dlq
    assert dlq.values() == [ev]
    row = dlq.read().collect()[0]
    assert row["stream_id"] == sid and row["reason"]


def test_in_mem_registry_sink_mode(spark):
    # void sink 'inMemRegistrySink': event IS a spec; resource id = its
    # stream id (void/loader.go:133-156)
    eng = Engine(spark)
    spec = make_spec(
        suffix="reg",
        transform={"extractFields": [{"fields": [{"id": "rawEvent", "type": "string"}]}]},
    )
    spec["sink"]["config"] = {"properties": [{"key": "mode", "value": "inMemRegistrySink"}]}
    sid = eng.register_stream(spec)
    inner_spec = make_spec(suffix="inner")
    rid = eng.publish(sid, json.dumps(inner_spec))
    assert rid == "enginetest-inner"


def test_composite_key_value_readback(engine, spark):
    from geist_spark.sinks.base import SinkError

    path = new_temp_path()
    sid = engine.register_stream(
        make_spec(
            suffix="composite",
            sink_type="keyedTable",
            sink_cfg={"path": path, "rowKeyFields": ["name", "kind"]},
            transform={"extractFields": [{"fields": [
                {"id": "name", "jsonPath": "name"},
                {"id": "kind", "jsonPath": "kind"},
                {"id": "v", "jsonPath": "v", "type": "integer"},
            ]}]},
        )
    )
    for ev in ('{"name":"a","kind":"x","v":1}', '{"name":"a","kind":"y","v":2}',
               '{"name":"b","kind":"x","v":3}'):
        engine.publish(sid, ev)
    loader = engine.stream(sid).loader
    got = loader.extract_composite_key_value({"name": "a"}).collect()
    assert sorted(r["v"] for r in got) == [1, 2]
    got = loader.extract_composite_key_value({"name": "a", "kind": "y"}).collect()
    assert [r["v"] for r in got] == [2]
    import pytest as _pytest
    with _pytest.raises(SinkError, match="not a row-key field"):
        loader.extract_composite_key_value({"v": "1"})


def test_hook_action_matrix(spark):
    """Pre-hook action matrix (executor_test.go:86-163): retryable and
    unretryable errors route through HOUE; shutdown raises."""
    from geist_spark.engine.stream import StreamShutdown

    actions = {}

    def pre(ctx, holder):
        return actions["next"]

    eng = Engine(spark, pre_transform_hook=pre)
    sid = eng.register_stream(
        make_spec(suffix="matrix", ops={"handlingOfUnretryableEvents": "discard"})
    )
    actions["next"] = HookAction.UNRETRYABLE_ERROR
    assert eng.publish(sid, '{"name":"u"}') == ""
    assert eng.metrics(sid).events_failed == 1
    actions["next"] = HookAction.RETRYABLE_ERROR
    eng.publish(sid, '{"name":"r"}')
    assert eng.metrics(sid).events_failed == 2
    actions["next"] = HookAction.SHUTDOWN
    import pytest as _pytest
    with _pytest.raises(StreamShutdown):
        eng.publish(sid, '{"name":"s"}')
    actions["next"] = HookAction.PROCEED
    eng.publish(sid, '{"name":"ok"}')
    assert eng.metrics(sid).events_processed == 4


def test_whitelist_and_dynamic_columns(engine, spark):
    """BigTable per-table whitelist + BigQuery nameFromId dynamic
    columns (kafkasrc-bigtablesink-multitable-session.json:109-115,
    kafkasrc-bigquerysink-fooevents.json:106-114)."""
    path = new_temp_path()
    sid = engine.register_stream(
        make_spec(
            suffix="dyn",
            sink_type="bigquery",
            sink_cfg={
                "path": path,
                "rowKeyFields": ["name"],
                "whitelist": {"id": "name", "type": "or", "values": ["keep"]},
                "dynamicColumns": [{
                    "nameFromId": {"prefix": "evt_", "suffixFromId": "name",
                                   "preset": ["keep"]},
                    "valueFromId": "amount",
                }],
            },
        )
    )
    engine.publish(sid, '{"name": "keep", "amount": 5}')
    engine.publish(sid, '{"name": "drop", "amount": 9}')
    rows = spark.read.parquet(path).collect()
    assert len(rows) == 1  # whitelist filtered 'drop'
    assert dict(rows[0]["__dynamic"]) == {"evt_keep": "5"}


def test_epoch_idempotent_replay(engine, spark):
    """at-least-once replay of a micro-batch must not double-write when
    epochIdempotent is set: each epoch owns a partition, dynamically
    overwritten on replay (effectively-once)."""
    from geist_spark.sinks.keyed_table import KeyedTableLoader
    from geist_spark.spec.model import parse_spec

    path = new_temp_path()
    spec = parse_spec(make_spec(
        suffix="idem", sink_type="keyedTable",
        sink_cfg={"path": path, "rowKeyFields": ["name"], "epochIdempotent": True},
    ))
    loader = KeyedTableLoader(spark, spec)
    batch = spark.createDataFrame([("a", 1), ("b", 2)], "name string, amount long")
    loader.stream_load(batch, epoch_id=7)
    loader.stream_load(batch, epoch_id=7)  # replay of the same epoch
    loader.stream_load(
        spark.createDataFrame([("c", 3)], "name string, amount long"), epoch_id=8
    )
    rows = sorted(r["name"] for r in loader.extract_all().collect())
    assert rows == ["a", "b", "c"]


def test_merge_write_mode_upsert_and_replay(spark):
    """writeMode=merge: per-batch key upsert over the bucket layout —
    latest row per key wins, maxVersions retention applies at WRITE
    time, a replayed batch converges (ts ties keep the incoming copy),
    and untouched keys in other buckets are left alone."""
    from geist_spark.sinks.keyed_table import KeyedTableLoader
    from geist_spark.spec.model import parse_spec

    path = new_temp_path()
    spec = parse_spec(make_spec(
        suffix="mrg", sink_type="keyedTable",
        sink_cfg={"path": path, "rowKeyFields": ["name"],
                  "writeMode": "merge", "mergeBuckets": 8},
    ))
    loader = KeyedTableLoader(spark, spec)

    def batch(rows):
        return spark.createDataFrame(
            rows, "name string, amount long, `@GeistIngestionTime` timestamp"
        )

    import datetime as dt
    t = lambda s: dt.datetime(2024, 1, 1, 0, 0, s)
    loader.stream_load(batch([("a", 1, t(1)), ("b", 2, t(1))]), epoch_id=0)
    # upsert a, insert c; b's bucket may or may not be touched — its
    # row must survive either way
    loader.stream_load(batch([("a", 10, t(2)), ("c", 3, t(2))]), epoch_id=1)
    got = {r["name"]: r["amount"] for r in loader.extract_all().collect()}
    assert got == {"a": 10, "b": 2, "c": 3}
    # replaying the same batch converges (no duplicates, same values)
    loader.stream_load(batch([("a", 10, t(2)), ("c", 3, t(2))]), epoch_id=1)
    rows = loader.extract_all().collect()
    assert len(rows) == 3
    assert {r["name"]: r["amount"] for r in rows} == {"a": 10, "b": 2, "c": 3}
    # point lookup prunes to the key's bucket and returns the winner
    assert [r["amount"] for r in loader.extract_key_value("a").collect()] == [10]


def test_merge_write_mode_max_versions(spark):
    """writeMode=merge with maxVersions=2 keeps the two NEWEST rows
    per key physically (write-time GC, not readback-time)."""
    from geist_spark.sinks.keyed_table import KeyedTableLoader, ROW_KEY_COL
    from geist_spark.spec.model import parse_spec

    path = new_temp_path()
    spec = parse_spec(make_spec(
        suffix="mrgv", sink_type="keyedTable",
        sink_cfg={"path": path, "rowKeyFields": ["name"],
                  "writeMode": "merge", "mergeBuckets": 4,
                  "maxVersions": 2},
    ))
    loader = KeyedTableLoader(spark, spec)
    import datetime as dt
    for s, amt in [(1, 1), (2, 2), (3, 3)]:
        loader.stream_load(spark.createDataFrame(
            [("a", amt, dt.datetime(2024, 1, 1, 0, 0, s))],
            "name string, amount long, `@GeistIngestionTime` timestamp",
        ), epoch_id=s)
    # physically stored: only the 2 newest versions survive the merge
    stored = spark.read.parquet(path).collect()
    assert sorted(r["amount"] for r in stored) == [2, 3]
    assert sorted(r["amount"] for r in loader.extract_all().collect()) == [2, 3]


def test_merge_write_mode_replay_with_max_versions(spark):
    """Replay convergence must hold for maxVersions>1: the replayed
    copy REPLACES its stored (key, ts) twin instead of stacking a
    duplicate that evicts a genuine older version."""
    from geist_spark.sinks.keyed_table import KeyedTableLoader
    from geist_spark.spec.model import parse_spec
    import datetime as dt

    path = new_temp_path()
    spec = parse_spec(make_spec(
        suffix="mrgr", sink_type="keyedTable",
        sink_cfg={"path": path, "rowKeyFields": ["name"],
                  "writeMode": "merge", "mergeBuckets": 4,
                  "maxVersions": 2},
    ))
    loader = KeyedTableLoader(spark, spec)

    def b(amt, s):
        return spark.createDataFrame(
            [("a", amt, dt.datetime(2024, 1, 1, 0, 0, s))],
            "name string, amount long, `@GeistIngestionTime` timestamp",
        )

    loader.stream_load(b(1, 1), epoch_id=1)
    loader.stream_load(b(2, 2), epoch_id=2)
    loader.stream_load(b(2, 2), epoch_id=2)  # replay of epoch 2
    stored = sorted(r["amount"] for r in spark.read.parquet(path).collect())
    # both versions survive, the replayed one exactly once
    assert stored == [1, 2]


def test_merge_write_mode_bucket_count_pinned(spark):
    """mergeBuckets is a physical layout parameter: reopening the
    table with a different count raises instead of silently stranding
    rows in stale buckets (merge side AND pruned-lookup side)."""
    from geist_spark.sinks.keyed_table import KeyedTableLoader
    from geist_spark.spec.model import parse_spec
    from geist_spark.sinks.base import SinkError
    import datetime as dt

    path = new_temp_path()

    def loader(n):
        return KeyedTableLoader(spark, parse_spec(make_spec(
            suffix="mrgb", sink_type="keyedTable",
            sink_cfg={"path": path, "rowKeyFields": ["name"],
                      "writeMode": "merge", "mergeBuckets": n},
        )))

    batch = spark.createDataFrame(
        [("a", 1, dt.datetime(2024, 1, 1))],
        "name string, amount long, `@GeistIngestionTime` timestamp",
    )
    loader(8).stream_load(batch)
    with pytest.raises(SinkError, match="mergeBuckets=8"):
        loader(16).stream_load(batch)
    with pytest.raises(SinkError, match="mergeBuckets=8"):
        loader(16).extract_key_value("a").collect()
    # the original layout keeps working
    assert loader(8).extract_key_value("a").collect()[0]["amount"] == 1


def test_merge_write_mode_streaming_cdc(spark, tmp_path):
    """Streaming e2e: a CDC file stream upserts through foreachBatch
    -> the table converges to the latest row per key without a
    full-table rewrite (bucket partitions on disk prove the layout)."""
    import glob
    import os
    from geist_spark.sinks.keyed_table import KeyedTableLoader
    from geist_spark.spec.model import parse_spec

    path = new_temp_path()
    spec = parse_spec(make_spec(
        suffix="mrgs", sink_type="keyedTable",
        sink_cfg={"path": path, "rowKeyFields": ["name"],
                  "writeMode": "merge", "mergeBuckets": 8},
    ))
    loader = KeyedTableLoader(spark, spec)
    src = str(tmp_path / "cdc_src")
    import datetime as dt
    for i, rows in enumerate([
        [("a", 1), ("b", 2)],
        [("a", 10), ("c", 3)],
        [("b", 20), ("a", 100)],
    ]):
        spark.createDataFrame(
            [(n, v, dt.datetime(2024, 1, 1, 0, i)) for n, v in rows],
            "name string, amount long, `@GeistIngestionTime` timestamp",
        ).coalesce(1).write.parquet(src, mode="append" if i else "overwrite")

    stream = (
        spark.readStream.schema(
            "name string, amount long, `@GeistIngestionTime` timestamp"
        )
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    q = (
        stream.writeStream.foreachBatch(
            lambda bdf, bid: loader.stream_load(bdf, epoch_id=bid)
        )
        .trigger(availableNow=True)
        .start()
    )
    assert q.awaitTermination(180)
    got = {r["name"]: r["amount"] for r in loader.extract_all().collect()}
    assert got == {"a": 100, "b": 20, "c": 3}
    # bucket-partition layout on disk (the no-full-rewrite contract)
    assert glob.glob(os.path.join(path, "__key_bucket=*"))


def test_merge_write_mode_delete_when_tombstones(spark):
    """deleteWhen CDC tombstones: a matching row kills the key's older
    versions during the bucket merge; the marker is invisible on
    readback but persists physically, so a LATER batch replaying an
    older upsert cannot resurrect the key; an upsert NEWER than the
    marker re-creates the key; replaying the delete batch converges."""
    from geist_spark.sinks.keyed_table import DELETED_COL, KeyedTableLoader
    from geist_spark.spec.model import parse_spec
    import datetime as dt

    path = new_temp_path()
    spec = parse_spec(make_spec(
        suffix="mrgd", sink_type="keyedTable",
        sink_cfg={"path": path, "rowKeyFields": ["name"],
                  "writeMode": "merge", "mergeBuckets": 4,
                  "deleteWhen": "op = 'delete'"},
    ))
    loader = KeyedTableLoader(spark, spec)

    def batch(rows):
        return spark.createDataFrame(
            rows,
            "name string, amount long, op string, "
            "`@GeistIngestionTime` timestamp",
        )

    t = lambda s: dt.datetime(2024, 1, 1, 0, 0, s)
    loader.stream_load(batch([("a", 1, "upsert", t(1)),
                              ("b", 2, "upsert", t(1))]), epoch_id=0)
    loader.stream_load(batch([("a", 0, "delete", t(2))]), epoch_id=1)
    got = {r["name"]: r["amount"] for r in loader.extract_all().collect()}
    assert got == {"b": 2}
    # the marker is physical (resurrection guard) but never visible
    stored = spark.read.option("mergeSchema", "true").parquet(path)
    assert [r["name"] for r in
            stored.filter(F.col(DELETED_COL)).collect()] == ["a"]
    assert loader.extract_key_value("a").collect() == []
    # replaying the delete batch converges (one marker, still deleted)
    loader.stream_load(batch([("a", 0, "delete", t(2))]), epoch_id=1)
    stored = spark.read.option("mergeSchema", "true").parquet(path)
    assert stored.filter(F.col(DELETED_COL)).count() == 1
    assert {r["name"] for r in loader.extract_all().collect()} == {"b"}
    # a LATE out-of-order upsert (older ts than the marker) stays dead
    loader.stream_load(batch([("a", 99, "upsert", t(1))]), epoch_id=2)
    assert {r["name"] for r in loader.extract_all().collect()} == {"b"}
    # a genuinely newer upsert resurrects the key
    loader.stream_load(batch([("a", 7, "upsert", t(3))]), epoch_id=3)
    got = {r["name"]: r["amount"] for r in loader.extract_all().collect()}
    assert got == {"a": 7, "b": 2}


def test_merge_delete_and_upsert_same_timestamp_is_deterministic(spark):
    """A delete and an upsert for the same key at the SAME ingestion
    timestamp (one CDC batch, second-granularity commit ts): the
    tombstone wins the (key, ts) tie — deterministically, so a replay
    converges — and a later same-ts upsert replay cannot erase a
    stored marker."""
    from geist_spark.sinks.keyed_table import KeyedTableLoader
    from geist_spark.spec.model import parse_spec
    import datetime as dt

    path = new_temp_path()
    spec = parse_spec(make_spec(
        suffix="mrgt", sink_type="keyedTable",
        sink_cfg={"path": path, "rowKeyFields": ["name"],
                  "writeMode": "merge", "mergeBuckets": 4,
                  "deleteWhen": "op = 'delete'"},
    ))
    loader = KeyedTableLoader(spark, spec)

    def batch(rows):
        return spark.createDataFrame(
            rows,
            "name string, amount long, op string, "
            "`@GeistIngestionTime` timestamp",
        )

    t = lambda s: dt.datetime(2024, 1, 1, 0, 0, s)
    same = [("a", 9, "upsert", t(5)), ("a", 0, "delete", t(5))]
    for _ in range(3):  # original + two replays must all agree
        loader.stream_load(batch(same), epoch_id=0)
        assert loader.extract_all().collect() == []
    # a LATER batch replaying an upsert at exactly the marker's ts
    # must NOT erase the tombstone
    loader.stream_load(batch([("a", 9, "upsert", t(5))]), epoch_id=1)
    assert loader.extract_all().collect() == []


def test_merge_marker_table_readable_without_delete_when(spark):
    """A loader WITHOUT deleteWhen configured (readback-only consumer,
    or the predicate later removed from the spec) still hides stored
    markers and does not resurrect deleted keys on merge — the sidecar
    records marker presence, so the schema is widened even when plain
    parquet inference picks a pre-marker footer."""
    from geist_spark.sinks.keyed_table import KeyedTableLoader
    from geist_spark.spec.model import parse_spec
    import datetime as dt

    path = new_temp_path()

    def build(cfg):
        return KeyedTableLoader(spark, parse_spec(make_spec(
            suffix="mrgm", sink_type="keyedTable",
            sink_cfg={"path": path, "rowKeyFields": ["name"],
                      "writeMode": "merge", "mergeBuckets": 4, **cfg},
        )))

    writer = build({"deleteWhen": "op = 'delete'"})

    def batch(rows):
        return spark.createDataFrame(
            rows, "name string, amount long, op string, "
            "`@GeistIngestionTime` timestamp")

    t = lambda s: dt.datetime(2024, 1, 1, 0, 0, s)
    writer.stream_load(batch([("a", 1, "upsert", t(1)),
                              ("b", 2, "upsert", t(1))]), epoch_id=0)
    writer.stream_load(batch([("a", 0, "delete", t(2))]), epoch_id=1)
    plain = build({})  # no deleteWhen
    got = {r["name"] for r in plain.extract_all().collect()}
    assert got == {"b"}
    assert plain.extract_key_value("a").collect() == []
    # merging through the plain loader must keep the marker alive: an
    # out-of-order old upsert for 'a' in a later batch stays dead (the
    # plain loader treats 'op' as ordinary data, it has no predicate)
    plain.stream_load(
        batch([("a", 99, "upsert", t(1)), ("c", 3, "upsert", t(3))]),
        epoch_id=2,
    )
    got = {r["name"]: r["amount"] for r in plain.extract_all().collect()}
    assert got == {"b": 2, "c": 3}


def test_merge_write_mode_delete_when_marker_ages_out(spark):
    """A deletion marker competes for version slots and is compacted
    away once maxVersions newer upserts exist."""
    from geist_spark.sinks.keyed_table import DELETED_COL, KeyedTableLoader
    from geist_spark.spec.model import parse_spec
    import datetime as dt

    path = new_temp_path()
    spec = parse_spec(make_spec(
        suffix="mrgg", sink_type="keyedTable",
        sink_cfg={"path": path, "rowKeyFields": ["name"],
                  "writeMode": "merge", "mergeBuckets": 4,
                  "maxVersions": 2, "deleteWhen": "op = 'delete'"},
    ))
    loader = KeyedTableLoader(spark, spec)

    def one(amt, op, s, epoch):
        loader.stream_load(spark.createDataFrame(
            [("a", amt, op, dt.datetime(2024, 1, 1, 0, 0, s))],
            "name string, amount long, op string, "
            "`@GeistIngestionTime` timestamp",
        ), epoch_id=epoch)

    one(1, "upsert", 1, 0)
    one(0, "delete", 2, 1)
    one(5, "upsert", 3, 2)
    stored = spark.read.option("mergeSchema", "true").parquet(path)
    # marker still holds a version slot (1 marker + 1 newer upsert)
    assert stored.filter(F.col(DELETED_COL)).count() == 1
    one(6, "upsert", 4, 3)
    # two newer upserts -> the marker fell out of the keep-last-2 set
    stored = spark.read.option("mergeSchema", "true").parquet(path)
    assert stored.filter(F.col(DELETED_COL)).count() == 0
    assert sorted(
        r["amount"] for r in loader.extract_all().collect()
    ) == [5, 6]


def test_merge_write_mode_streaming_cdc_with_deletes(spark, tmp_path):
    """Streaming e2e with interleaved upserts and deletes: the table
    converges under availableNow replay to exactly the live keys."""
    from geist_spark.sinks.keyed_table import KeyedTableLoader
    from geist_spark.spec.model import parse_spec
    import datetime as dt

    path = new_temp_path()
    spec = parse_spec(make_spec(
        suffix="mrgsd", sink_type="keyedTable",
        sink_cfg={"path": path, "rowKeyFields": ["name"],
                  "writeMode": "merge", "mergeBuckets": 8,
                  "deleteWhen": "op = 'delete'"},
    ))
    loader = KeyedTableLoader(spark, spec)
    src = str(tmp_path / "cdc_del_src")
    feed = [
        [("a", 1, "upsert"), ("b", 2, "upsert")],
        [("a", 0, "delete"), ("c", 3, "upsert")],
        [("b", 20, "upsert"), ("c", 0, "delete"), ("d", 4, "upsert")],
    ]
    for i, rows in enumerate(feed):
        spark.createDataFrame(
            [(n, v, op, dt.datetime(2024, 1, 1, 0, i)) for n, v, op in rows],
            "name string, amount long, op string, "
            "`@GeistIngestionTime` timestamp",
        ).coalesce(1).write.parquet(src, mode="append" if i else "overwrite")
    stream = (
        spark.readStream.schema(
            "name string, amount long, op string, "
            "`@GeistIngestionTime` timestamp"
        )
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    q = (
        stream.writeStream.foreachBatch(
            lambda bdf, bid: loader.stream_load(bdf, epoch_id=bid)
        )
        .trigger(availableNow=True)
        .start()
    )
    assert q.awaitTermination(180)
    got = {r["name"]: r["amount"] for r in loader.extract_all().collect()}
    assert got == {"b": 20, "d": 4}


def test_merge_layout_pin_on_nonlocal_path_scheme(spark, tmp_path):
    """The mergeBuckets sidecar travels through the Hadoop FileSystem
    API: on a scheme-qualified table URI (file:/, standing in for
    hdfs://s3a:// — os.path cannot see it) the pin is still written
    and the split-brain guard still fires."""
    from geist_spark.sinks.keyed_table import KeyedTableLoader
    from geist_spark.spec.model import parse_spec
    from geist_spark.sinks.base import SinkError
    import datetime as dt
    import os

    local_dir = str(tmp_path / "uri_table")
    uri = "file:" + local_dir  # not a plain OS path

    def loader(n):
        return KeyedTableLoader(spark, parse_spec(make_spec(
            suffix="mrgu", sink_type="keyedTable",
            sink_cfg={"path": uri, "rowKeyFields": ["name"],
                      "writeMode": "merge", "mergeBuckets": n},
        )))

    batch = spark.createDataFrame(
        [("a", 1, dt.datetime(2024, 1, 1))],
        "name string, amount long, `@GeistIngestionTime` timestamp",
    )
    assert not os.path.exists(uri)  # the os.path view really is blind
    loader(8).stream_load(batch)
    # sidecar landed next to the data through the FS API
    assert os.path.exists(os.path.join(local_dir, "_merge_buckets"))
    with pytest.raises(SinkError, match="mergeBuckets=8"):
        loader(16).stream_load(batch)
    with pytest.raises(SinkError, match="mergeBuckets=8"):
        loader(16).extract_key_value("a").collect()
    assert loader(8).extract_key_value("a").collect()[0]["amount"] == 1


def test_merge_write_mode_spec_errors(spark):
    """merge mode misconfiguration raises typed SinkError at build
    time: missing rowKeyFields, epochIdempotent conflict, bad mode."""
    from geist_spark.sinks.keyed_table import KeyedTableLoader
    from geist_spark.spec.model import parse_spec
    from geist_spark.sinks.base import SinkError

    def build(cfg):
        cfg = {"path": new_temp_path(), **cfg}
        return KeyedTableLoader(spark, parse_spec(
            make_spec(suffix="bad", sink_type="keyedTable", sink_cfg=cfg)
        ))

    with pytest.raises(SinkError, match="rowKeyFields"):
        build({"writeMode": "merge"})
    with pytest.raises(SinkError, match="mutually exclusive"):
        build({"writeMode": "merge", "rowKeyFields": ["name"],
               "epochIdempotent": True})
    with pytest.raises(SinkError, match="writeMode"):
        build({"writeMode": "replace", "rowKeyFields": ["name"]})
    with pytest.raises(SinkError, match="deleteWhen"):
        build({"rowKeyFields": ["name"], "deleteWhen": "op = 'delete'"})


def test_insert_id_dedup_within_batch(spark):
    """bigquery insertIdFromId semantics (SURVEY §2.2): duplicate
    insert ids inside one load batch collapse to one stored row."""
    from geist_spark.sinks.keyed_table import KeyedTableLoader
    from geist_spark.spec.model import parse_spec

    path = new_temp_path()
    spec = parse_spec(make_spec(
        suffix="iid",
        sink_type="keyedTable",
        sink_cfg={"path": path, "rowKeyFields": ["name"],
                  "insertIdFromId": "eid"},
        transform={"extractFields": [{"fields": [
            {"id": "name", "jsonPath": "name"},
            {"id": "eid", "jsonPath": "eid"},
            {"id": "amount", "jsonPath": "amount", "type": "integer"}]}]},
    ))
    loader = KeyedTableLoader(spark, spec)
    batch = spark.createDataFrame(
        [("a", "e1", 1), ("a", "e1", 2), ("b", "e2", 3)],
        "name string, eid string, amount int",
    )
    loader.stream_load(batch)
    rows = {r["eid"]: r for r in loader.extract_all().collect()}
    assert set(rows) == {"e1", "e2"}
    # a second batch with an already-stored id is a NEW load op:
    # insertId dedup is per-batch (best-effort, as in BigQuery)
    loader.stream_load(spark.createDataFrame([("a", "e1", 9)], "name string, eid string, amount int"))
    assert loader.extract_all().filter("eid = 'e1'").count() >= 1


def test_entities_all_metrics_and_enrich_event(engine):
    from geist_spark.engine.hooks import enrich_event

    ents = engine.entities()
    assert ents["extractor"]["geistapi"] and ents["extractor"]["eventsim"]
    assert ents["loader"]["void"] and ents["loader"]["bigtable"]

    sid = engine.register_stream(make_spec(suffix="am"))
    engine.publish(sid, '{"name": "x", "amount": 1}')
    m = engine.all_metrics()
    assert m[sid].events_processed >= 1

    out = enrich_event('{"a": 1}', "b.c.d", 7)
    assert json.loads(out) == {"a": 1, "b": {"c": {"d": 7}}}
    assert json.loads(enrich_event(b"", "k", "v")) == {"k": "v"}
    # overwriting a scalar mid-path replaces it with an object
    assert json.loads(enrich_event('{"b": 3}', "b.c", 1)) == {"b": {"c": 1}}


def test_full_lifecycle_metrics_goldens(spark, tmp_path):
    """geist_test.go:140-384 parity: full engine lifecycle with metrics
    asserted as GOLDEN values per stream — including the registry's own
    stream (stream-backed storage) — plus excluded-event counting and
    version upgrade/disable behavior along the way."""
    store = str(tmp_path / "reg")
    eng = Engine(spark, registry_path=store)

    filt = {
        "excludeEventsWith": [{"key": "name", "values": ["drop-me"]}],
        "extractFields": [{"fields": [
            {"id": "name", "jsonPath": "name"},
            {"id": "amount", "jsonPath": "amount", "type": "integer"},
        ]}],
    }
    a = eng.register_stream(make_spec(suffix="ga", transform=filt))
    b = eng.register_stream(make_spec(suffix="gb"))

    for i in range(3):
        eng.publish(a, json.dumps({"name": f"u{i}", "amount": i}))
    eng.publish(a, json.dumps({"name": "drop-me", "amount": 9}))
    eng.publish(b, json.dumps({"name": "x", "amount": 1}))

    ma = eng.metrics(a)
    assert (ma.events_processed, ma.events_excluded, ma.sink_operations) == (4, 1, 3)
    mb = eng.metrics(b)
    assert (mb.events_processed, mb.events_excluded, mb.sink_operations) == (1, 0, 1)

    # the registry is itself a stream: one processed event per put
    mr = eng._registry_stream.metrics
    assert mr.events_processed == 2 and mr.sink_operations == 2

    # upgrade a -> v2: executor replaced, metrics reset for the new
    # stream instance (reference builds fresh executors on redeploy,
    # supervisor.go:237-250); registry stream saw a third spec event
    eng.register_stream(make_spec(suffix="ga", version=2, transform=filt))
    assert eng.metrics(a).events_processed == 0
    assert mr.events_processed == 3
    eng.publish(a, json.dumps({"name": "after-upgrade", "amount": 5}))
    assert eng.metrics(a).events_processed == 1

    # disable b -> publish surfaces the typed disabled error
    dis = make_spec(suffix="gb", version=2)
    dis["disabled"] = True
    eng.register_stream(dis)
    with pytest.raises(RegistryError, match="disabled"):
        eng.publish(b, json.dumps({"name": "y", "amount": 2}))

    # all_metrics covers every live stream
    assert a in eng.all_metrics() and b not in eng.all_metrics()
    eng.shutdown()


def test_metrics_df_one_row_per_stream(spark):
    from geist_spark import Engine

    eng = Engine(spark)
    spec = {
        "namespace": "mx",
        "streamIdSuffix": "one",
        "version": 1,
        "description": "metrics frame",
        "source": {"type": "geistapi"},
        "transform": {
            "extractFields": [{"fields": [{"id": "v", "jsonPath": "v"}]}]
        },
        "sink": {"type": "void"},
    }
    sid = eng.register_stream(spec)
    eng.publish(sid, '{"v": "a"}')
    eng.publish(sid, '{"v": "b"}')
    df = eng.metrics_df()
    rows = {r["stream_id"]: r for r in df.collect()}
    assert sid in rows
    assert rows[sid]["events_processed"] == 2
    assert rows[sid]["events_failed"] == 0
    # SQL over the metrics surface works like any table
    df.createOrReplaceTempView("geist_metrics")
    n = spark.sql(
        "SELECT sum(events_processed) AS n FROM geist_metrics"
    ).collect()[0]["n"]
    assert n >= 2
