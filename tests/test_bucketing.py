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


def test_zorder_key_interleaves_and_localizes(spark):
    """z-key matches a Python reference interleave, and each coarse
    z-cell (key >> 8) spans at most a 16x16 tile of bin space -- the
    locality that makes multi-dim min/max pruning work."""
    from pyspark.sql import functions as F

    from geist_spark.operators.bucketing import linear_bin, zorder_key

    df = spark.range(4096).select(
        (F.col("id") % 64).cast("double").alias("x"),
        (F.col("id") / 64).cast("long").cast("double").alias("y"),
    )
    bins = [
        linear_bin(F.col("x"), 0.0, 64.0, 8),
        linear_bin(F.col("y"), 0.0, 64.0, 8),
    ]
    keyed = df.select(
        "x", "y", zorder_key(bins, 8).alias("z"),
        bins[0].alias("xb"), bins[1].alias("yb"),
    )
    rows = keyed.collect()

    def ref(xb, yb):
        k = 0
        for i in range(8):
            k |= ((xb >> i) & 1) << (2 * i)
            k |= ((yb >> i) & 1) << (2 * i + 1)
        return k

    for r in rows:
        assert r["z"] == ref(r["xb"], r["yb"])

    cells = (
        keyed.groupBy(F.shiftright("z", 8).alias("cell"))
        .agg(
            (F.max("xb") - F.min("xb")).alias("dx"),
            (F.max("yb") - F.min("yb")).alias("dy"),
        )
        .collect()
    )
    assert cells
    for c in cells:
        assert c["dx"] <= 15 and c["dy"] <= 15


def test_zorder_layout_sorts_within_partitions(spark):
    from pyspark.sql import functions as F

    from geist_spark.operators.bucketing import zorder_layout

    df = spark.range(1000).select(
        (F.col("id") % 97).cast("double").alias("a"),
        ((F.col("id") * 7) % 89).cast("double").alias("b"),
    )
    out = zorder_layout(df, [("a", 0.0, 100.0), ("b", 0.0, 100.0)], bits=6,
                        target_partitions=4)
    assert out.count() == 1000
    # every partition is internally sorted by the z key
    def check(it):
        prev = None
        for row in it:
            assert prev is None or row["__z"] >= prev
            prev = row["__z"]
        return iter([])
    out.select("__z").rdd.mapPartitions(lambda it: check(it)).count()


def test_compact_plan_bins_fill_to_target_and_isolate_oversized(spark):
    from geist_spark.operators.bucketing import compact_plan, compact_summary

    files = spark.createDataFrame(
        [
            ("d1", "a", 300),
            ("d1", "b", 300),
            ("d1", "c", 300),
            ("d1", "d", 5000),  # oversized: must isolate
            ("d1", "e", 300),
            ("d2", "a", 100),
        ],
        "dir string, path string, bytes long",
    )
    plan = {r["path"]: r["bin"] for r in
            compact_plan(files, 1000).filter("dir = 'd1'").collect()}
    # a+b+c fill bin 0 (900 <= 1000); d starts at prefix 900 -> bin 0?
    # no: floor(900/1000)=0, so d lands in bin 0 too but pushes the
    # prefix to 5900 -> e lands in bin 5: oversized files end bins.
    assert plan["a"] == plan["b"] == plan["c"] == 0
    assert plan["e"] == 5
    s = compact_summary(compact_plan(files, 1000))
    rows = {(r["dir"], r["bin"]): r for r in s.collect()}
    assert rows[("d2", 0)]["n_files"] == 1
    total = sum(r["total_bytes"] for r in rows.values())
    assert total == 300 * 4 + 5000 + 100  # every byte planned exactly once
