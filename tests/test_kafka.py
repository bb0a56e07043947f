"""Compile-level kafka source/sink coverage (no broker, no connector
jar in the container). Exercises everything short of the classpath
boundary: reader option assembly from the spec, topic-per-env
resolution, payload projection, and the directed errors users hit when
the spark-sql-kafka jar is absent.

Spec shapes mirror the reference's
test/specs/kafkasrc-bigquerysink-fooevents.json:9-41 and
test/specs/pubsubsrc-kafkasink-foologs.json:37-61.
"""

import os

import pytest
from pyspark.sql import functions as F

from geist_spark.sinks.base import SinkError
from geist_spark.sinks.kafka import KafkaLoader, payload_df, topic_for_env
from geist_spark.spec.model import parse_spec
from geist_spark.streaming.runner import (
    build_source_stream,
    kafka_reader_options,
)


def kafka_spec(ops=None, sink=None):
    spec = {
        "namespace": "ktest",
        "streamIdSuffix": "src",
        "version": 1,
        "description": "kafka compile-level",
        "source": {
            "type": "kafka",
            "config": {
                "customConfig": {
                    "topics": [
                        {"env": "dev", "names": ["foo.events.dev"]},
                        {"env": "prod", "names": ["foo.events", "foo.audit"]},
                    ],
                    "bootstrapServers": "broker-1:9092,broker-2:9092",
                },
                "properties": [
                    {"key": "group.id", "value": "geist-foo"},
                    {"key": "auto.offset.reset", "value": "earliest"},
                ],
            },
        },
        "transform": {
            "extractFields": [{"fields": [{"id": "e", "jsonPath": "e"}]}]
        },
        "sink": sink or {"type": "void"},
    }
    if ops:
        spec["ops"] = ops
    return parse_spec(spec)


def test_kafka_reader_options_full_contract():
    spec = kafka_spec(ops={"microBatch": True, "microBatchSize": 2500})
    opts = kafka_reader_options(spec, env="prod")
    assert opts["subscribe"] == "foo.events,foo.audit"
    assert opts["kafka.bootstrap.servers"] == "broker-1:9092,broker-2:9092"
    # consumer props pass through under the kafka. prefix
    assert opts["kafka.group.id"] == "geist-foo"
    # EXCEPT auto.offset.reset, which Spark's kafka source rejects
    # outright — it becomes the equivalent startingOffsets
    assert "kafka.auto.offset.reset" not in opts
    assert opts["startingOffsets"] == "earliest"
    # ops.microBatchSize -> per-trigger record cap
    assert opts["maxOffsetsPerTrigger"] == "2500"


def test_kafka_auto_offset_reset_none_is_a_spec_error():
    """Kafka's legal value 'none' has no startingOffsets equivalent —
    the translation must fail with a descriptive spec error instead of
    an opaque Spark option error at stream start."""
    spec = kafka_spec()
    for p in spec.source.properties:
        if p.key == "auto.offset.reset":
            p.value = "none"
    with pytest.raises(ValueError, match="auto.offset.reset"):
        kafka_reader_options(spec, env="prod")


def test_kafka_reader_options_env_and_defaults():
    spec = kafka_spec()
    opts = kafka_reader_options(spec, env="dev")
    assert opts["subscribe"] == "foo.events.dev"
    assert "maxOffsetsPerTrigger" not in opts  # no micro-batch ops


def test_kafka_source_missing_jar_is_directed(spark):
    """Without the connector jar the user gets the exact --packages
    coordinate, not a raw ClassNotFoundException."""
    with pytest.raises(RuntimeError, match="spark-sql-kafka"):
        build_source_stream(spark, kafka_spec(), env="prod")


def kafka_sink_spec(message=None):
    return parse_spec({
        "namespace": "ktest",
        "streamIdSuffix": "sink",
        "version": 1,
        "description": "kafka sink compile-level",
        "source": {"type": "geistapi"},
        "transform": {
            "extractFields": [{"fields": [{"id": "e", "jsonPath": "e"}]}]
        },
        "sink": {
            "type": "kafka",
            "config": {
                "customConfig": {
                    "topic": [
                        {"env": "all",
                         "topicSpec": {"name": "foo.logs",
                                       "numPartitions": 6,
                                       "replicationFactor": 3}},
                    ],
                    "message": message or {},
                }
            },
        },
    })


def test_kafka_sink_topic_and_payload_projection(spark):
    loader = KafkaLoader(
        spark, kafka_sink_spec({"payloadFromId": "payload", "keyFromId": "k"})
    )
    assert loader.topic == "foo.logs"
    df = spark.createDataFrame(
        [("k1", '{"a":1}'), ("k2", '{"a":2}')], "k string, payload string"
    )
    out = payload_df(df, loader.payload_from_id, loader.key_from_id)
    assert out.columns == ["key", "value"]
    rows = sorted((r["key"], r["value"]) for r in out.collect())
    assert rows == [("k1", '{"a":1}'), ("k2", '{"a":2}')]


def test_kafka_sink_whole_record_json_when_no_payload_id(spark):
    df = spark.createDataFrame([(1, "x")], "a long, b string")
    out = payload_df(df, None)
    assert out.columns == ["value"]
    assert out.collect()[0]["value"] == '{"a":1,"b":"x"}'


def test_kafka_sink_missing_payload_field_is_typed(spark):
    df = spark.createDataFrame([(1,)], "a long")
    with pytest.raises(SinkError, match="payloadFromId"):
        payload_df(df, "nope")


def test_kafka_sink_missing_jar_is_directed(spark):
    loader = KafkaLoader(spark, kafka_sink_spec({"payloadFromId": "p"}))
    df = spark.createDataFrame([("x",)], "p string")
    with pytest.raises(SinkError, match="spark-sql-kafka"):
        loader.stream_load(df)


def test_topic_for_env_resolution():
    cc = {"topic": [
        {"env": "dev", "topicSpec": {"name": "t-dev"}},
        {"env": "prod", "topicSpec": {"name": "t-prod"}},
    ]}
    assert topic_for_env(cc, "prod") == "t-prod"
    assert topic_for_env(cc, "dev") == "t-dev"
    assert topic_for_env({}, "prod") == ""


_BOOTSTRAP = os.environ.get("SPARK_GRAFT_KAFKA_BOOTSTRAP", "")


@pytest.mark.skipif(
    not _BOOTSTRAP,
    reason="live Kafka e2e: set SPARK_GRAFT_KAFKA_BOOTSTRAP=host:port "
    "(broker with auto.create.topics) and put the spark-sql-kafka "
    "connector on the classpath (spark.jars.packages="
    "org.apache.spark:spark-sql-kafka-0-10_2.13:<spark-version>)",
)
def test_kafka_live_end_to_end(spark, tmp_path):
    """The ONE reference path compile-level tests can't reach: a real
    broker. Publishes JSON events with Spark's batch kafka sink, then
    runs the reference-shaped kafka-source spec through the full
    engine (source -> transform -> keyed-table sink) and reads the
    sink back. Gated on SPARK_GRAFT_KAFKA_BOOTSTRAP because the CI
    sandbox has no broker; run it wherever one exists."""
    import json
    import uuid

    from geist_spark.engine.api import Engine
    from geist_spark.sinks.keyed_table import new_temp_path

    topic = f"geist-e2e-{uuid.uuid4().hex[:12]}"
    events = [{"eventId": f"e{i}", "n": i} for i in range(5)]
    spark.createDataFrame(
        [(json.dumps(e),) for e in events], "value string"
    ).write.format("kafka").option(
        "kafka.bootstrap.servers", _BOOTSTRAP
    ).option("topic", topic).save()

    table_path = new_temp_path()
    eng = Engine(spark)
    sid = eng.register_stream({
        "namespace": "ktest",
        "streamIdSuffix": "live",
        "version": 1,
        "description": "live kafka e2e",
        "source": {
            "type": "kafka",
            "config": {
                "customConfig": {
                    "topics": [{"env": "all", "names": [topic]}],
                    "bootstrapServers": _BOOTSTRAP,
                },
                # reference spec shape: earliest via consumer prop
                # (translated to startingOffsets by the reader)
                "properties": [
                    {"key": "auto.offset.reset", "value": "earliest"},
                ],
            },
        },
        "transform": {
            "extractFields": [{"fields": [
                {"id": "eid", "jsonPath": "eventId"},
                {"id": "n", "jsonPath": "n", "type": "integer"},
            ]}]
        },
        "sink": {
            "type": "keyedTable",
            "config": {"customConfig": {
                "path": table_path, "rowKeyFields": ["eid"],
            }},
        },
    })
    ss = eng.start_streaming(sid)
    try:
        ss.query.processAllAvailable()
    finally:
        eng.shutdown()
    rows = sorted(
        (r["eid"], r["n"]) for r in ss.loader.extract_all().collect()
    )
    assert rows == [(f"e{i}", i) for i in range(5)]


@pytest.mark.skipif(
    not _BOOTSTRAP,
    reason="live Kafka e2e: set SPARK_GRAFT_KAFKA_BOOTSTRAP=host:port",
)
def test_kafka_live_sink_roundtrip(spark):
    """The geist kafka SINK against a real broker: KafkaLoader
    publishes with payloadFromId/keyFromId projection, and a batch
    read of the topic gets the exact (key, value) pairs back."""
    import uuid

    topic = f"geist-sink-{uuid.uuid4().hex[:12]}"
    spec = kafka_sink_spec({"payloadFromId": "payload", "keyFromId": "k"})
    loader = KafkaLoader(spark, spec)
    loader.topic = topic
    loader.servers = _BOOTSTRAP
    df = spark.createDataFrame(
        [("k1", '{"a":1}'), ("k2", '{"a":2}')], "k string, payload string"
    )
    assert loader.stream_load(df) == topic
    back = (
        spark.read.format("kafka")
        .option("kafka.bootstrap.servers", _BOOTSTRAP)
        .option("subscribe", topic)
        .option("startingOffsets", "earliest")
        .load()
        .select(
            F.col("key").cast("string"), F.col("value").cast("string")
        )
    )
    rows = sorted((r["key"], r["value"]) for r in back.collect())
    assert rows == [("k1", '{"a":1}'), ("k2", '{"a":2}')]
