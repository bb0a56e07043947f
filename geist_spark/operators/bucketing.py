"""Bucketed-table utilities: co-located joins without a shuffle.

At 100 TB the dominant join cost is the shuffle. Tables that are
repeatedly joined on the same key (fact-to-fact, or fact-to-large-dim
where broadcast doesn't fit) should be written bucketed on that key:
both sides then hash-partition identically at WRITE time, and Spark's
planner elides the exchange — the join runs bucket-local.

Spark's bucketing rides the session catalog (saveAsTable), not plain
parquet paths; these helpers wrap that so the engine can persist and
join keyed tables bucket-aligned.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def fan_out(df: DataFrame, min_partitions: int | None = None) -> DataFrame:
    """Ensure enough partitions BEFORE CPU-heavy per-row work.

    A small parquet file scans as ONE split, so an expensive map stage
    (per-char md5 fingerprints, shingling, per-vector signatures)
    serializes on one core no matter how many executors exist. The
    same cliff hits at 100 TB after a selective filter + coalesce, or
    on a skinny dimension feeding an explode. This widens to the
    session default parallelism when (and only when) the input has
    fewer partitions — on a healthy large scan it is a no-op, so the
    round-robin shuffle cost is only ever paid on inputs small enough
    for it to be trivial."""
    target = min_partitions or df.sparkSession.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() >= target:
        return df
    return df.repartition(target)


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_cols: list[str],
    num_buckets: int = 32,
    sort_cols: list[str] | None = None,
    path: str | None = None,
) -> None:
    """Persist df bucketed (and optionally sorted) on bucket_cols.

    num_buckets should match the join fan-in you want per task; both
    sides of a co-located join must use the SAME bucket count."""
    writer = df.write.mode("overwrite").bucketBy(num_buckets, *bucket_cols)
    if sort_cols:
        writer = writer.sortBy(*sort_cols)
    if path:
        writer = writer.option("path", path)
    writer.format("parquet").saveAsTable(table)


def bucketed_join(
    spark: SparkSession, left_table: str, right_table: str, on: list[str], how: str = "inner"
) -> DataFrame:
    """Join two same-bucketed tables on their bucket columns. With
    matching bucket specs the plan contains NO Exchange on either side
    (verified in tests) — the 100 TB pattern for recurring fact joins."""
    return spark.table(left_table).join(spark.table(right_table), on, how)
