"""Custom source/sink plugin API e2e (reference geist_test.go:403-563:
custom factories, customConfig passthrough, final sink payload
asserted) plus kafka-sink payload projection."""

import datetime as dt
import json

import pytest

from geist_spark.engine.api import Engine
from geist_spark.sinks.base import Loader, LoaderFactory, SinkError


class CollectingLoader(Loader):
    """Custom sink plugin: collects transformed rows (test double for
    an external system client)."""

    instances = []

    def __init__(self, spark, spec):
        self.spec = spec
        self.custom_config = spec.sink.custom_config or {}
        self.rows = []
        CollectingLoader.instances.append(self)

    def stream_load(self, df, epoch_id: int = 0) -> str:
        self.rows.extend(r.asDict() for r in df.collect())
        return self.custom_config.get("resourceId", "custom")

    def shutdown(self) -> None:
        pass


def spec_with_custom_sink():
    return {
        "namespace": "plug",
        "streamIdSuffix": "custom",
        "description": "custom plugin e2e",
        "version": 1,
        "source": {"type": "geistapi"},
        "transform": {"extractFields": [{"fields": [
            {"id": "name", "jsonPath": "name"},
            {"id": "n", "jsonPath": "n", "type": "integer"},
        ]}]},
        "sink": {"type": "mysink", "config": {"customConfig": {
            "resourceId": "my-resource", "endpoint": "https://example.test"}}},
    }


def test_custom_sink_plugin_batch(spark):
    CollectingLoader.instances.clear()
    eng = Engine(spark)
    eng.register_loader_factory(LoaderFactory("mysink", CollectingLoader))
    sid = eng.register_stream(spec_with_custom_sink())
    rid = eng.publish(sid, '{"name": "a", "n": 7}')
    assert rid == "my-resource"  # resource id from customConfig passthrough
    loader = CollectingLoader.instances[-1]
    assert loader.custom_config["endpoint"] == "https://example.test"
    assert loader.rows == [{"name": "a", "n": 7}]


def test_custom_source_plugin_streaming(spark, tmp_path):
    """A registered source factory (spark, spec) -> streaming DF wins
    over native source types."""
    src_dir = str(tmp_path / "src")
    t0 = dt.datetime(2024, 1, 1)
    spark.createDataFrame(
        [(json.dumps({"name": f"u{i}", "n": i}),) for i in range(5)],
        "value string",
    ).coalesce(1).write.parquet(src_dir)

    def my_source(sp, spec):
        assert spec.source.custom_config["marker"] == 42  # passthrough
        return sp.readStream.schema("value string").parquet(src_dir)

    CollectingLoader.instances.clear()
    eng = Engine(spark)
    eng.register_source_factory("mysource", my_source)
    eng.register_loader_factory(LoaderFactory("mysink", CollectingLoader))
    spec = spec_with_custom_sink()
    spec["streamIdSuffix"] = "customsrc"
    spec["source"] = {"type": "mysource", "config": {"customConfig": {"marker": 42}}}
    sid = eng.register_stream(spec)
    ss = eng.start_streaming(sid)
    try:
        ss.query.processAllAvailable()  # file source drains
    finally:
        eng.shutdown()
    rows = sorted(
        (r["n"] for loader in CollectingLoader.instances for r in loader.rows)
    )
    assert rows == [0, 1, 2, 3, 4]


def test_kafka_sink_payload_projection(spark):
    from geist_spark.sinks.kafka import payload_df, topic_for_env

    df = spark.createDataFrame([("a", 1, '{"x":1}')], "name string, n long, body string")
    # whole record as JSON when no payloadFromId
    whole = payload_df(df, None).collect()[0]
    assert json.loads(whole["value"]) == {"name": "a", "n": 1, "body": '{"x":1}'}
    # single-field payload + key
    one = payload_df(df, "body", key_from_id="name").collect()[0]
    assert one["value"] == '{"x":1}' and one["key"] == "a"
    with pytest.raises(SinkError, match="payloadFromId"):
        payload_df(df, "missing")
    cc = {"topic": [
        {"env": "all", "topicSpec": {"name": "t-common"}},
        {"env": "prod", "topicSpec": {"name": "t-prod"}},
    ]}
    assert topic_for_env(cc, "dev") == "t-common"
    assert topic_for_env({"topic": [{"env": "prod", "name": "p"}]}, "prod") == "p"


def test_pubsub_source_directs_to_factory_hook(spark):
    """pubsub is an external connector in the reference too — the
    engine directs users to the custom-source-factory hook."""
    import pytest

    from geist_spark.spec.model import parse_spec
    from geist_spark.streaming.runner import build_source_stream

    spec = parse_spec({
        "namespace": "p", "streamIdSuffix": "ps", "version": 1,
        "description": "d", "source": {"type": "pubsub"},
        "transform": {"extractFields": [{"fields": [{"id": "a", "jsonPath": "a"}]}]},
        "sink": {"type": "void"},
    })
    with pytest.raises(NotImplementedError, match="register_source_factory"):
        build_source_stream(spark, spec)


def test_pubsub_spec_verbatim_through_factory(spark, tmp_path):
    """A user's reference pubsub spec runs VERBATIM once a pubsub
    factory is registered: source section (topics + shared
    subscription, test/specs/pubsubsrc-regexp-reqs-voidsink.json:10-28)
    reaches the factory untouched, and the spec's regexp +
    timeConversion produce the reference's golden regexppayload
    (transformer_test.go:88). The factory here replays Pub/Sub
    envelope JSON from files; in production it would wrap the
    Pub/Sub Lite Spark connector or a Pub/Sub->Kafka bridge."""
    src_dir = str(tmp_path / "ps_src")
    out_path = str(tmp_path / "ps_out")
    envelope = {
        "insertId": "a6bf3a8d-4fe0-40d9-bfce-0ebe5bdbdb86",
        "logName": "fooservice/accesslog",
        "textPayload": (
            "cust1-loc1.somesite.com|11.222.123.123|https://<lots more stuff>"
            "|<ua info...>|-|-|-|[17/Jun/2020:09:10:25 +0200]<|GET "
            "/some/reqPath;more-stuff... HTTP/1.1|200|996|19"
        ),
        "timestamp": "2020-06-16T12:06:26.723709116Z",
    }
    spark.createDataFrame(
        [(json.dumps(envelope),)], "value string"
    ).coalesce(1).write.parquet(src_dir)

    seen_cfg = {}

    def pubsub_factory(sp, spec):
        seen_cfg.update(spec.source.custom_config)
        return sp.readStream.schema("value string").parquet(src_dir)

    eng = Engine(spark)
    eng.register_source_factory("pubsub", pubsub_factory)
    sid = eng.register_stream({
        "namespace": "foo-logs-test",
        "streamIdSuffix": "foo-logs-access",
        "description": "reference pubsub regexp spec, sink observable",
        "version": 1,
        "source": {"type": "pubsub", "config": {"customConfig": {
            "topics": [{"env": "all", "names": ["foo-logs-bar-usage"]}],
            "subscription": {"type": "shared",
                             "name": "geist-foo-logs-bar-usage"},
        }}},
        "transform": {
            "extractFields": [{"fields": [
                {"id": "logEvent", "jsonPath": "textPayload",
                 "type": "string"}]}],
            "regexp": {
                "field": "logEvent",
                "expression": r"^(?P<customer>\w[a-z0-9]*)-?(?P<reqLoc>[^\.]*).{1}[a-z]*.{1}[a-z]*\:?(?P<port>\d{0,4})\|{1}(?P<ip>.*?[^\|])\|.*\[(?P<ts>[^\]]*).*(?P<httpVerb>POST|GET|DELETE|PUT|PATCH|OPTIONS|HEAD)\s{1}(?P<reqPath>\/(?:\/[^\/]+){4}|[^\\?| ;]+).*HTTP\/\d{1}.\d{1}\|(?P<httpResponse>\d*).*",
                "timeConversion": {
                    "field": "ts",
                    "inputFormat": "02/Jan/2006:15:04:05 -0700",
                },
            },
        },
        "sink": {"type": "keyedTable",
                 "config": {"customConfig": {"path": out_path}}},
    })
    ss = eng.start_streaming(sid)
    try:
        ss.query.processAllAvailable()
    finally:
        eng.shutdown()
    # the factory saw the reference spec's source section untouched
    assert seen_cfg["subscription"] == {
        "type": "shared", "name": "geist-foo-logs-bar-usage"}
    assert seen_cfg["topics"][0]["names"] == ["foo-logs-bar-usage"]
    rows = spark.read.parquet(out_path).collect()
    assert len(rows) == 1
    assert rows[0]["regexppayload"] == (
        '{"customer":"cust1","httpResponse":"200","httpVerb":"GET",'
        '"ip":"11.222.123.123","port":"","reqLoc":"loc1",'
        '"reqPath":"/some/reqPath","ts":"2020-06-17T09:10:25+02:00"}'
    )
