"""Bucketed co-located joins: the exchange is gone from the plan."""

from pyspark.sql import functions as F

from geist_spark.operators.bucketing import bucketed_join, write_bucketed


def test_bucketed_join_has_no_exchange(spark, tmp_path):
    orders = spark.range(0, 10_000).select(
        F.col("id").alias("okey"), (F.col("id") % 100).alias("cust")
    )
    items = spark.range(0, 30_000).select(
        (F.col("id") % 10_000).alias("okey"), F.col("id").alias("item")
    )
    write_bucketed(orders, "b_orders", ["okey"], 8, path=str(tmp_path / "bo"))
    write_bucketed(items, "b_items", ["okey"], 8, path=str(tmp_path / "bi"))
    try:
        # disable broadcast so the test proves bucket co-location, not
        # broadcasting, removed the shuffle
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        joined = bucketed_join(spark, "b_orders", "b_items", ["okey"])
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan, plan
        assert joined.count() == 30_000

        # control: the same join over plain parquet DOES shuffle
        orders.write.mode("overwrite").parquet(str(tmp_path / "po"))
        items.write.mode("overwrite").parquet(str(tmp_path / "pi"))
        plain = spark.read.parquet(str(tmp_path / "po")).join(
            spark.read.parquet(str(tmp_path / "pi")), ["okey"]
        )
        assert "Exchange" in plain._jdf.queryExecution().executedPlan().toString()
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        spark.sql("DROP TABLE IF EXISTS b_orders")
        spark.sql("DROP TABLE IF EXISTS b_items")
