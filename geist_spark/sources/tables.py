"""Parquet table loader for the driver's test tables.

events.parquet carries TIMESTAMP(NANOS) which Spark's parquet reader
rejects by default; `spark.sql.legacy.parquet.nanosAsLong` (runtime
settable) reads it as long nanos, and we truncate to micros exactly
like DuckDB does for its TIMESTAMP type — keeping oracle comparisons
bit-identical. Division is integer (`div`) to avoid double-precision
loss on 1.7e18 nanos."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    if name == "events":
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
        if dict(df.dtypes).get("ts") == "bigint":
            df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
        return df
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")
