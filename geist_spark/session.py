"""SparkSession factory tuned for this engine.

Local test profile runs on local[N]; the same conf names are what we
would set on a 1000-executor cluster (AQE, skew-join handling, shuffle
partitions sized to data, Arrow for the Python boundary). Keep every
knob here so tests/bench/driver share one profile.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

_DEFAULTS: dict[str, str] = {
    # Runtime re-planning: coalesce small shuffle partitions, split skewed
    # ones. Essential at 100 TB where static planning is always wrong.
    "spark.sql.adaptive.enabled": "true",
    "spark.sql.adaptive.coalescePartitions.enabled": "true",
    "spark.sql.adaptive.skewJoin.enabled": "true",
    # AQE coalescing is parallelism-first (totalBytes / parallelism),
    # but its 1 MB minPartitionSize floor overrides that for CPU-dense,
    # byte-light shuffles — candidate-pair stages (LSH buckets, n-gram
    # blocks, within-cell cosines) shuffle ~1 MB of ids yet expand to
    # 10^5-10^6 pair computations, and the floor coalesces them onto
    # ONE task (measured: m_embed_near_dup cosine stage 3.9 s on one
    # core, 8-query pair-family A/B 28.7 s -> 18.5 s with the floor at
    # 64k). On healthy large shuffles totalBytes/parallelism is far
    # above 1 MB and the floor never engages, so this is scale-neutral.
    "spark.sql.adaptive.coalescePartitions.minPartitionSize": os.environ.get(
        "SPARK_GRAFT_AQE_MIN_PARTITION_SIZE", "64k"
    ),
    # Deterministic oracle comparison: DuckDB timestamps are UTC-naive.
    "spark.sql.session.timeZone": "UTC",
    # gjson/Go semantics are permissive (bad cast -> zero value, not an
    # error); ANSI mode (Spark 4 default) would throw instead.
    "spark.sql.ansi.enabled": "false",
    # Go map semantics: duplicate keys overwrite (extractItemsFromArray).
    "spark.sql.mapKeyDedupPolicy": "LAST_WIN",
    # driver test tables carry TIMESTAMP(NANOS); read as long + truncate
    # (geist_spark.sources.tables) exactly like DuckDB does.
    "spark.sql.legacy.parquet.nanosAsLong": "true",
    # Arrow for pandas_udf / toPandas — the only sane Python boundary.
    "spark.sql.execution.arrow.pyspark.enabled": "true",
    # PySpark 4's DataFrame-debugging hook wraps EVERY Column/function
    # call with call-site capture: a conf.get + a PySparkCurrentOrigin
    # py4j round trip + a Python stack walk PER EXPRESSION NODE. That
    # is 24 py4j round trips (6.8 ms) per Column op vs 4 (2.5 ms) with
    # it off — measured 24.6 s of pure query-CONSTRUCTION time across
    # this registry (queries are rebuilt every bench run). It only
    # enriches error messages with user call sites; error classes and
    # semantics are unchanged. Scale-neutral: this is driver-side
    # Python API overhead, identical on a cluster.
    "spark.python.sql.dataFrameDebugging.enabled": os.environ.get(
        "SPARK_GRAFT_DF_DEBUGGING", "false"
    ),
    # Generated-class cache (Janino compile results). The default 100
    # entries thrashes on a session that runs hundreds of distinct
    # queries (this registry alone produces ~1000 codegen units), so
    # every re-run recompiles every stage. Compilation cache only —
    # no data or results are cached; sized for a driver that hosts a
    # large query workload.
    "spark.sql.codegen.cache.maxEntries": os.environ.get(
        "SPARK_GRAFT_CODEGEN_CACHE_ENTRIES", "10000"
    ),
    # local mode: one JVM; shuffle partitions ~ cores (AQE coalesces down).
    "spark.sql.shuffle.partitions": os.environ.get("SPARK_GRAFT_CPUS", "32"),
    "spark.driver.memory": os.environ.get("SPARK_GRAFT_DRIVER_MEM", "48g"),
    "spark.ui.enabled": "false",
    # Broadcast threshold: dims (region/nation/part/supplier at test SF)
    # should broadcast; 64 MB is a sane cluster default too.
    "spark.sql.autoBroadcastJoinThreshold": str(64 * 1024 * 1024),
    # Parquet scans: split files into ~128 MB tasks (cluster default).
    "spark.sql.files.maxPartitionBytes": str(128 * 1024 * 1024),
    # Managed tables (bucketed layouts) go to /tmp, not the repo cwd.
    "spark.sql.warehouse.dir": "file:///tmp/geist_spark_warehouse",
}


def get_spark(app_name: str = "geist_spark", **overrides: str) -> SparkSession:
    """Build (or fetch) the session. overrides win over profile defaults."""
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    builder = SparkSession.builder.master(
        os.environ.get("SPARK_GRAFT_MASTER", f"local[{cpus}]")
    ).appName(app_name)
    conf = dict(_DEFAULTS)
    conf.update(overrides)
    for k, v in conf.items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark


def stop_spark() -> None:
    active = SparkSession.getActiveSession()
    if active is not None:
        active.stop()
