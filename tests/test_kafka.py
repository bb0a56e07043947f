"""Compile-level kafka source/sink coverage (no broker, no connector
jar in the container). Exercises everything short of the classpath
boundary: reader option assembly from the spec, topic-per-env
resolution, payload projection, and the directed errors users hit when
the spark-sql-kafka jar is absent.

Spec shapes mirror the reference's
test/specs/kafkasrc-bigquerysink-fooevents.json:9-41 and
test/specs/pubsubsrc-kafkasink-foologs.json:37-61.
"""

import pytest

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
    assert opts["kafka.auto.offset.reset"] == "earliest"
    # ops.microBatchSize -> per-trigger record cap
    assert opts["maxOffsetsPerTrigger"] == "2500"


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
