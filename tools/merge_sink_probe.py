"""Measure the keyed-table merge sink's no-full-rewrite claim.

A writeMode="merge" micro-batch should cost O(touched bucket
partitions), not O(table): a CDC batch whose keys land in t of n
buckets reads and rewrites ~t/n of the table. This probe grows the
TABLE 1x/4x/16x/64x while holding the BATCH fixed (10 keys, <=10 of
256 buckets touched) and times:

  - merge:   loader.stream_load(batch) on the bucket-partitioned table
  - rewrite: the naive alternative — read whole table, union batch,
             keep-last-per-key, overwrite everything

If the layout works, merge time grows with ~t/n of the table (slope
well under 1 in log-log) and the merge:rewrite ratio widens with
table size. Usage: python tools/merge_sink_probe.py
"""

from __future__ import annotations

import datetime
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import Window, functions as F

from geist_spark.session import get_spark
from geist_spark.sinks.keyed_table import (
    KEY_BUCKET_COL,
    INGESTION_TS_COL,
    ROW_KEY_COL,
    KeyedTableLoader,
    new_temp_path,
)
from geist_spark.spec.model import parse_spec

BUCKETS = 256
BATCH_KEYS = 10
BASE_ROWS = 40_000


def make_loader(spark, path):
    return KeyedTableLoader(spark, parse_spec({
        "namespace": "probe", "streamIdSuffix": "mrg",
        "description": "merge probe", "version": 1,
        "source": {"type": "geistapi"},
        "transform": {"extractFields": [{"fields": [
            {"id": "name", "jsonPath": "name"}]}]},
        "sink": {"type": "keyedTable", "config": {"customConfig": {
            "path": path, "rowKeyFields": ["name"],
            "writeMode": "merge", "mergeBuckets": BUCKETS}}},
    }))


def seed_table(spark, loader, n_rows):
    base = spark.range(n_rows).select(
        F.concat(F.lit("k"), F.col("id")).alias("name"),
        F.col("id").alias("amount"),
        F.lit(datetime.datetime(2024, 1, 1)).alias("@GeistIngestionTime"),
    )
    loader.stream_load(base, epoch_id=0)


def batch_df(spark, ts):
    return spark.createDataFrame(
        [(f"k{i}", 999, ts) for i in range(BATCH_KEYS)],
        "name string, amount long, `@GeistIngestionTime` timestamp",
    )


def naive_rewrite(spark, path, batch):
    """The alternative the merge layout avoids: full read + overwrite.

    Deliberately FAIR to the baseline: it writes to a sibling path, so
    it needs NO checkpoint (the merge path's two checkpoints exist
    only because it overwrites the path it reads) — one read, one
    window, one write, nothing double-materialized."""
    existing = spark.read.parquet(path)
    b = batch.withColumnRenamed("@GeistIngestionTime", INGESTION_TS_COL)
    b = b.withColumn(ROW_KEY_COL, F.col("name"))
    merged = existing.drop(KEY_BUCKET_COL).unionByName(
        b, allowMissingColumns=True
    )
    w = Window.partitionBy(ROW_KEY_COL).orderBy(F.col(INGESTION_TS_COL).desc())
    merged = (
        merged.withColumn("__v", F.row_number().over(w))
        .filter(F.col("__v") == 1)
        .drop("__v")
    )
    merged.write.mode("overwrite").parquet(path + "_rw")


KS = (1, 4, 16, 64)  # 64x = 2.56M rows; the documented headline point


def main():
    spark = get_spark("merge_probe")
    spark.sparkContext.setLogLevel("ERROR")
    print(f"buckets={BUCKETS} batch_keys={BATCH_KEYS} (<= {BATCH_KEYS} buckets touched)")
    ts = datetime.datetime(2024, 6, 1)
    # warm BOTH paths once on a throwaway 1x table so JVM/codegen
    # warmup is not billed to the k=1 measurements (scale_probe does
    # the same); timed points below are best-of-2 on top
    wpath = new_temp_path()
    wloader = make_loader(spark, wpath)
    seed_table(spark, wloader, BASE_ROWS)
    wloader.stream_load(batch_df(spark, ts), epoch_id=1)
    naive_rewrite(spark, wpath, batch_df(spark, ts))
    for k in KS:
        rows = BASE_ROWS * k
        path = new_temp_path()
        loader = make_loader(spark, path)
        seed_table(spark, loader, rows)
        t_merge = min(
            _timed(lambda i=i: loader.stream_load(
                batch_df(spark, ts + datetime.timedelta(seconds=i)),
                epoch_id=i + 1))
            for i in range(2)
        )
        t_rw = min(
            _timed(lambda: naive_rewrite(
                spark, path, batch_df(spark, ts)))
            for _ in range(2)
        )
        print(
            f"{k:>2}x table={rows:>7} rows  merge={t_merge:6.2f}s  "
            f"full_rewrite={t_rw:6.2f}s  ratio={t_rw / t_merge:4.1f}x"
        )


def _timed(fn):
    t0 = time.monotonic()
    fn()
    return time.monotonic() - t0


if __name__ == "__main__":
    main()
