"""Structured Streaming runner: spec -> readStream -> compiled
transform -> foreachBatch(loader), plus the supervisor that owns
StreamingQuery lifecycles.

Mirrors the reference's executor/supervisor semantics
(internal/pkg/engine/executor.go, supervisor.go) on Spark's engine:
- one StreamingQuery per stream (the reference's streamsPerPod
  goroutines map to source partitions — Spark's parallelism unit;
  README.md:406-415)
- at-least-once with ack-after-sink: checkpointed micro-batches +
  sink write inside foreachBatch (executor.go:168-170)
- HOUE policy inside the batch body: discard / dlq table / fail
  (entity/spec.go:21-26)
- supervisor handles create/replace-on-version-bump/disable/shutdown
  (supervisor.go:154-250)
"""

from __future__ import annotations

import logging
import os
import tempfile
from dataclasses import dataclass, field as dc_field

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.streaming import StreamingQuery

from geist_spark.compiler.transform import compile_transform
from geist_spark.engine.metrics import Metrics
from geist_spark.sinks.base import Loader
from geist_spark.spec.model import (
    HOUE_DLQ,
    HOUE_FAIL,
    Spec,
)

log = logging.getLogger(__name__)


def build_source_stream(spark: SparkSession, spec: Spec, env: str = "") -> DataFrame:
    """Source section -> streaming DataFrame with a `value` column."""
    stype = spec.source.type
    cc = spec.source.custom_config or {}
    if stype == "eventsim":
        from geist_spark.sources.eventsim import EventSim, parse_sim_config

        seed = cc.get("seed")
        sim = EventSim(parse_sim_config(cc), seed=seed)
        return sim.stream(spark)
    if stype == "kafka":
        topics = _topics_for_env(cc, env)
        reader = (
            spark.readStream.format("kafka")
            .option("subscribe", ",".join(topics))
        )
        for p in spec.source.properties:
            # consumer props pass through with kafka. prefix
            reader = reader.option(f"kafka.{p.key}", p.value)
        servers = cc.get("bootstrapServers", "localhost:9092")
        reader = reader.option("kafka.bootstrap.servers", servers)
        df = reader.load()
        return df.select(
            df.value.cast("string").alias("value"),
            df.key.cast("string").alias("key"),
            "timestamp",
        )
    if stype in ("file", "parquet"):
        path = cc.get("path") or spec.source.prop("path")
        schema_df = spark.read.parquet(path)
        return spark.readStream.schema(schema_df.schema).parquet(path)
    raise ValueError(f"source type {stype} is not streamable")


def _topics_for_env(cc: dict, env: str) -> list[str]:
    """Per-env topic names (spec shape
    test/specs/kafkasrc-bigquerysink-fooevents.json:9-41)."""
    for t in cc.get("topics") or []:
        t_env = t.get("env", "all")
        if t_env in ("all", env) or not env:
            return t.get("names") or t.get("topics") or []
    return []


@dataclass
class StreamingStream:
    """A deployed streaming pipeline: source -> transform -> sink."""

    spark: SparkSession
    spec: Spec
    loader: Loader
    env: str = ""
    checkpoint_root: str = ""
    value_col: str = "value"
    metrics: Metrics = dc_field(default_factory=Metrics)
    dlq: list[str] = dc_field(default_factory=list)
    query: StreamingQuery | None = None

    def start(self) -> StreamingQuery:
        source = build_source_stream(self.spark, self.spec, self.env)
        ct = compile_transform(self.spec)
        houe = self.spec.ops.handling_of_unretryable_events
        value_col = self.value_col

        def process(batch_df: DataFrame, epoch_id: int) -> None:
            self.metrics.microbatches += 1
            out = ct.apply(batch_df, value_col=value_col)
            self.loader.stream_load(out, epoch_id)
            self.metrics.sink_operations += 1
            bad = ct.rejected(batch_df, value_col=value_col)
            if houe == HOUE_DLQ:
                rows = bad.collect()
                self.dlq.extend(r[value_col] for r in rows)
                self.metrics.events_failed += len(rows)
            elif houe == HOUE_FAIL:
                if bad.take(1):
                    raise RuntimeError(
                        f"unretryable events in stream {self.spec.id}"
                    )

        checkpoint = os.path.join(
            self.checkpoint_root or tempfile.mkdtemp(prefix="geist_ckpt_"),
            self.spec.id,
            f"v{self.spec.version}",
        )
        self.query = (
            source.writeStream.foreachBatch(process)
            .option("checkpointLocation", checkpoint)
            .trigger(processingTime=f"{self.spec.ops.micro_batch_timeout_ms} milliseconds"
                     if self.spec.ops.micro_batch else "0 seconds")
            .queryName(self.spec.id)
            .start()
        )
        return self.query

    def stop(self) -> None:
        if self.query is not None and self.query.isActive:
            self.query.stop()

    def await_batches(self, n: int = 1, timeout_s: float = 60.0) -> None:
        """Test helper: block until >= n micro-batches have been sunk.

        processAllAvailable() never returns for continuously-producing
        sources (rate-micro-batch always has a next batch), so poll the
        engine-side counter instead.
        """
        assert self.query is not None
        import time

        deadline = time.monotonic() + timeout_s
        while self.metrics.sink_operations < n:
            if not self.query.isActive:
                raise RuntimeError(f"query died: {self.query.exception()}")
            if time.monotonic() > deadline:
                raise TimeoutError(
                    f"only {self.metrics.sink_operations}/{n} batches after {timeout_s}s"
                )
            time.sleep(0.1)


class StreamingSupervisor:
    """Owns all StreamingQuery objects (supervisor.go:61-177)."""

    def __init__(self, spark: SparkSession, checkpoint_root: str | None = None, env: str = ""):
        self.spark = spark
        self.env = env
        self.checkpoint_root = checkpoint_root or tempfile.mkdtemp(prefix="geist_ckpt_")
        self._streams: dict[str, StreamingStream] = {}

    def deploy(self, spec: Spec, loader: Loader) -> StreamingStream:
        """Create or replace (version upgrade) the stream for a spec
        (supervisor.go:220-250)."""
        old = self._streams.pop(spec.id, None)
        if old is not None:
            old.stop()
        if spec.disabled:
            return old
        ss = StreamingStream(
            spark=self.spark,
            spec=spec,
            loader=loader,
            env=self.env,
            checkpoint_root=self.checkpoint_root,
        )
        ss.start()
        self._streams[spec.id] = ss
        return ss

    def get(self, stream_id: str) -> StreamingStream | None:
        return self._streams.get(stream_id)

    def shutdown(self) -> None:
        for ss in self._streams.values():
            ss.stop()
        self._streams.clear()

    def metrics(self) -> dict[str, Metrics]:
        return {sid: ss.metrics for sid, ss in self._streams.items()}
