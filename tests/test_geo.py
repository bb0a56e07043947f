

def test_geohash_published_vectors(spark):
    from pyspark.sql import functions as F

    from geist_spark.operators.geo import geohash_col, geohash_oracle_sql

    cases = [
        (57_649_110, 10_407_440, "u4pruydq"),   # the classic docs vector
        (42_600_000, -5_600_000, "ezs42e44"),
        (-25_382_708, -49_265_506, "6gkzwgjz"),
        (90_000_000, 180_000_000, "zzzzzzzz"),  # clamped top edge
        (-90_000_000, -180_000_000, "00000000"),
        (0, 0, "s0000000"),
    ]
    df = spark.createDataFrame(
        [(lat, lon) for lat, lon, _ in cases], "lat long, lon long"
    )
    got = df.select(
        geohash_col(F.col("lat"), F.col("lon"), 8).alias("g")
    ).collect()
    assert [r["g"] for r in got] == [w for _, _, w in cases]
    # 5-char prefixes agree with the 8-char hash (precision nesting)
    got5 = df.select(
        geohash_col(F.col("lat"), F.col("lon"), 5).alias("g")
    ).collect()
    assert [r["g"] for r in got5] == [w[:5] for _, _, w in cases]

    # the oracle rendering produces the identical strings in DuckDB
    import duckdb

    con = duckdb.connect()
    for lat, lon, want in cases:
        sql = geohash_oracle_sql(str(lat), str(lon), 8)
        assert con.execute(f"SELECT {sql}").fetchone()[0] == want

    import pytest

    with pytest.raises(ValueError, match="precision"):
        geohash_col(F.col("lat"), F.col("lon"), 13)
