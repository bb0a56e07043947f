"""File-backed Pub/Sub emulator + PySpark Python streaming DataSource.

The reference keeps the real GCP Pub/Sub extractor in an external
connector repo (README.md:122-126) and GEIST itself only depends on the
*contract*: per-env topics, shared vs unique subscriptions
(test/specs/pubsubsrc-regexp-reqs-voidsink.json:10-28), at-least-once
with ack-after-successful-sink (README "offset commit / pubsub ack
after sink write"). This module reproduces that contract locally so
reference pubsub specs run verbatim with zero cloud dependency:

- ``PubSubEmulator`` — a tiny file-backed broker: a topic is a
  directory of immutable, monotonically-numbered JSON message files;
  publishing is an atomic tmp+rename under an ``fcntl`` lock, so
  multiple local "pods" (processes) can share one broker root.
- ``PubSubEmuDataSource`` — a PySpark Python DataSource
  (pyspark.sql.datasource, Spark 4 SPARK-44076) exposing a topic as a
  Structured Streaming source named ``geist-pubsub``. Subscription
  semantics map onto Spark offsets:

  * ``unique`` (every pod sees every message): Spark's checkpoint IS
    the subscription cursor; the broker is never written. Exactly-once
    within one query, fan-out across pods — GCP "unique subscription
    per pod" behavior.
  * ``shared`` (a message is consumed by one pod): the broker keeps a
    per-subscription cursor file; ``initialOffset`` reads it and
    ``commit`` (called by Spark AFTER the micro-batch — i.e. after the
    foreachBatch sink write) advances it. Two pods racing between
    read and commit can both get a message: at-least-once, exactly the
    reference's stated guarantee for the real connector.

Scale note: a SimpleDataSourceStreamReader prefetches on the driver,
which is the right shape for control-plane / emulator streams (admin
events, spec registry, tests). High-throughput data planes should use
the kafka source; this emulator deliberately trades throughput for
having NO infra dependency.
"""

from __future__ import annotations

import datetime
import json
import os
import uuid

__all__ = [
    "PubSubEmulator",
    "PubSubEmuDataSource",
    "register_pubsub_datasource",
    "pubsub_stream_from_spec",
]

_SEQ_PAD = 12  # zero-padding => lexicographic order == numeric order


class PubSubEmulator:
    """File-backed broker client. Safe for concurrent use from multiple
    processes on one host (fcntl advisory locks)."""

    def __init__(self, root: str):
        self.root = root
        os.makedirs(os.path.join(root, "topics"), exist_ok=True)
        os.makedirs(os.path.join(root, "cursors"), exist_ok=True)

    # -- topology ----------------------------------------------------

    def topic_dir(self, topic: str) -> str:
        d = os.path.join(self.root, "topics", topic)
        os.makedirs(d, exist_ok=True)
        return d

    def _cursor_path(self, subscription: str) -> str:
        return os.path.join(self.root, "cursors", f"{subscription}.json")

    # -- publish -----------------------------------------------------

    def publish(self, topic: str, data: str, attributes: dict | None = None) -> int:
        """Append one message; returns its sequence number. Atomic:
        seq allocation under an exclusive lock, visibility via rename
        (readers never observe a partial file)."""
        import fcntl

        d = self.topic_dir(topic)
        lock_path = os.path.join(d, ".lock")
        with open(lock_path, "a+") as lock:
            fcntl.flock(lock, fcntl.LOCK_EX)
            seq_path = os.path.join(d, ".seq")
            seq = 0
            if os.path.exists(seq_path):
                with open(seq_path) as f:
                    seq = int(f.read().strip() or 0)
            seq += 1
            msg = {
                "seq": seq,
                "data": data,
                "attributes": attributes or {},
                "publishTime": datetime.datetime.now(
                    datetime.timezone.utc
                ).isoformat(),
            }
            tmp = os.path.join(d, f".tmp-{uuid.uuid4().hex}")
            with open(tmp, "w") as f:
                json.dump(msg, f)
            os.rename(tmp, os.path.join(d, f"msg-{seq:0{_SEQ_PAD}d}.json"))
            with open(seq_path, "w") as f:
                f.write(str(seq))
        return seq

    # -- consume -----------------------------------------------------

    def read_after(self, topic: str, after_seq: int, limit: int | None = None) -> list[dict]:
        """All messages with seq > after_seq, in order."""
        d = self.topic_dir(topic)
        lo = f"msg-{after_seq:0{_SEQ_PAD}d}.json"
        names = sorted(
            n for n in os.listdir(d)
            if n.startswith("msg-") and n.endswith(".json") and n > lo
        )
        if limit is not None:
            names = names[:limit]
        out = []
        for n in names:
            try:
                with open(os.path.join(d, n)) as f:
                    out.append(json.load(f))
            except (OSError, json.JSONDecodeError):
                continue  # racing publisher; picked up next poll
        return out

    def latest_seq(self, topic: str) -> int:
        seq_path = os.path.join(self.topic_dir(topic), ".seq")
        if os.path.exists(seq_path):
            with open(seq_path) as f:
                return int(f.read().strip() or 0)
        return 0

    def cursor(self, subscription: str) -> int:
        p = self._cursor_path(subscription)
        if os.path.exists(p):
            with open(p) as f:
                return int(json.load(f).get("seq", 0))
        return 0

    def commit(self, subscription: str, seq: int) -> None:
        """Monotonic cursor advance (ack-after-sink)."""
        import fcntl

        p = self._cursor_path(subscription)
        with open(p + ".lock", "a+") as lock:
            fcntl.flock(lock, fcntl.LOCK_EX)
            cur = self.cursor(subscription)
            if seq > cur:
                tmp = p + f".tmp-{uuid.uuid4().hex}"
                with open(tmp, "w") as f:
                    json.dump({"seq": seq}, f)
                os.rename(tmp, p)

    def pull(self, topic: str, subscription: str, limit: int | None = None) -> list[dict]:
        """Cursor-advancing pull for non-Spark (control plane) readers:
        read past the cursor, ack immediately. At-most-once per
        subscription per host; admin sync only needs a nudge signal."""
        msgs = self.read_after(topic, self.cursor(subscription), limit)
        if msgs:
            self.commit(subscription, msgs[-1]["seq"])
        return msgs


# -- Spark streaming DataSource --------------------------------------

def _build_datasource_class():
    """Deferred so importing this module never hard-requires the
    pyspark.sql.datasource API (present since Spark 4.0)."""
    from pyspark.sql.datasource import (
        DataSource,
        SimpleDataSourceStreamReader,
    )

    class _Reader(SimpleDataSourceStreamReader):
        def __init__(self, options):
            self.root = options["path"]
            self.topic = options["topic"]
            self.subscription_type = options.get("subscriptiontype", "unique")
            self.subscription = options.get(
                "subscription", f"geist-{self.topic}"
            )
            self.max_batch = int(options.get("maxbatch", "10000"))
            self.emu = PubSubEmulator(self.root)

        def initialOffset(self) -> dict:
            if self.subscription_type == "shared":
                # resume where the subscription (possibly another pod)
                # left off — broker cursor is the source of truth
                return {"seq": self.emu.cursor(self.subscription)}
            return {"seq": 0}

        def read(self, start: dict):
            # a LIST, not a generator: Spark's prefetch cache shallow-
            # copies the returned iterator (datasource_internal.getCache)
            after = int(start["seq"])
            msgs = self.emu.read_after(self.topic, after, self.max_batch)
            end_seq = msgs[-1]["seq"] if msgs else after
            # iter(list): Spark needs an iterator here AND shallow-copies
            # it for the prefetch cache — list_iterator supports both
            # (a bare generator fails the copy, a bare list the next())
            return iter(self._rows(msgs)), {"seq": end_seq}

        def readBetweenOffsets(self, start: dict, end: dict):
            after, upto = int(start["seq"]), int(end["seq"])
            msgs = [
                m
                for m in self.emu.read_after(self.topic, after)
                if m["seq"] <= upto
            ]
            return iter(self._rows(msgs))

        def commit(self, end: dict) -> None:
            # Spark calls commit after the micro-batch completes (the
            # foreachBatch sink write included) -> ack-after-sink
            if self.subscription_type == "shared":
                self.emu.commit(self.subscription, int(end["seq"]))

        @staticmethod
        def _rows(msgs):
            return [
                (
                    m["data"],
                    json.dumps(m.get("attributes", {}), sort_keys=True),
                    datetime.datetime.fromisoformat(m["publishTime"]),
                    m["seq"],
                )
                for m in msgs
            ]

    class PubSubEmuDataSource(DataSource):
        """`spark.readStream.format("geist-pubsub")` — options:
        path (broker root), topic, subscriptionType shared|unique,
        subscription (cursor name), maxBatch."""

        @classmethod
        def name(cls) -> str:
            return "geist-pubsub"

        def schema(self) -> str:
            return (
                "value string, attributes string, "
                "publish_time timestamp, seq long"
            )

        def simpleStreamReader(self, schema):
            return _Reader(self.options)

    return PubSubEmuDataSource


PubSubEmuDataSource = None  # populated on first registration


def register_pubsub_datasource(spark) -> None:
    """Idempotent per-session registration."""
    global PubSubEmuDataSource
    if PubSubEmuDataSource is None:
        PubSubEmuDataSource = _build_datasource_class()
    key = "geist.pubsub.registered"
    if spark.conf.get(f"spark.{key}", None) == "true":
        return
    spark.dataSource.register(PubSubEmuDataSource)
    spark.conf.set(f"spark.{key}", "true")


def pubsub_stream_from_spec(spark, spec, env: str = ""):
    """Source section -> streaming DataFrame with a `value` column.

    Spec shape is the reference's verbatim
    (test/specs/pubsubsrc-regexp-reqs-voidsink.json:10-28): per-env
    topics + subscription {type: shared|unique, name}. The broker root
    comes from customConfig.emulatorPath or $GEIST_PUBSUB_EMULATOR_DIR.
    """
    from geist_spark.streaming.runner import _topics_for_env

    cc = spec.source.custom_config or {}
    root = cc.get("emulatorPath") or os.environ.get("GEIST_PUBSUB_EMULATOR_DIR")
    if not root:
        raise NotImplementedError(
            "pubsub source: set customConfig.emulatorPath (or "
            "$GEIST_PUBSUB_EMULATOR_DIR) to run against the file-backed "
            "emulator, or register a real connector via "
            "Engine.register_source_factory('pubsub', fn) — reference "
            "pubsub specs then run verbatim (worked example: tests/"
            "test_plugins.py::test_pubsub_spec_verbatim_through_factory)"
        )
    topics = _topics_for_env(cc, env)
    if not topics:
        raise ValueError("pubsub source: no topic for env " + repr(env))
    sub = cc.get("subscription") or {}
    sub_type = (sub.get("type") or "unique").lower()
    sub_name = sub.get("name") or f"geist-{topics[0]}"
    register_pubsub_datasource(spark)
    reader = (
        spark.readStream.format("geist-pubsub")
        .option("path", root)
        .option("topic", topics[0])
        .option("subscriptionType", sub_type)
        .option("subscription", sub_name)
    )
    if spec.ops.micro_batch and spec.ops.micro_batch_size:
        reader = reader.option("maxBatch", str(spec.ops.micro_batch_size))
    return reader.load()
