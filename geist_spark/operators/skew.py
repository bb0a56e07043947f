"""Skew-handling operators: salting patterns for hot keys.

AQE's skew-join splitting covers joins; aggregation skew on a hot key
is handled by two-stage salted aggregation: stage 1 aggregates on
(key, salt) — the hot key's rows spread over `salt_buckets` reducers —
stage 2 merges the partials per key. Classic MapReduce combiner
pattern, expressed declaratively so Catalyst still does map-side
partial aggregation within each stage.

Only algebraic aggregates decompose this way (sum/count/min/max and
avg via sum+count); that's the same constraint any distributed
pre-aggregation has.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window, functions as F

_MERGE = {
    "sum": F.sum,
    "count": F.sum,  # partial counts merge by summing
    "min": F.min,
    "max": F.max,
}

_PARTIAL = {
    "sum": F.sum,
    "count": lambda c: F.count(F.lit(1)),
    "min": F.min,
    "max": F.max,
}


def salted_aggregate(
    df: DataFrame,
    keys: list[str],
    aggs: list[tuple[str, str, str]],  # (fn, field, alias)
    salt_buckets: int = 16,
) -> DataFrame:
    """Two-stage aggregation immune to hot-key reducer skew.

    aggs: (fn, field, alias) with fn in {sum, count, min, max, avg}.
    avg decomposes into sum+count partials and a final division.

    Float sums/avgs run on decimal(38,6) partials: double summation is
    order-dependent, and salting makes the order explicitly random —
    decimal partials keep the result exact and identical to a plain
    groupBy (and to the DuckDB oracle) for ANY salt assignment."""
    # random salt spreads a hot key's rows over salt_buckets reducers;
    # results are exact regardless of the assignment because every
    # aggregate here is algebraic
    salt = F.floor(F.rand(seed=7) * salt_buckets).cast("int")

    fractional = {
        f.name
        for f in df.schema.fields
        if f.dataType.typeName() in ("double", "float")
    }

    def sum_col(field: str) -> Column:
        if field in fractional:
            return F.sum(F.col(field).cast("decimal(38,6)"))
        return F.sum(field)

    partials: list[Column] = []
    finals: list[Column] = []
    for fn, field, alias in aggs:
        frac = field in fractional
        if fn == "avg":
            partials.append(sum_col(field).alias(f"__s_{alias}"))
            partials.append(F.count(F.lit(1)).alias(f"__c_{alias}"))
            s = F.sum(f"__s_{alias}")
            if frac:
                s = s.cast("double")
            finals.append((s / F.sum(f"__c_{alias}")).alias(alias))
        elif fn == "sum":
            partials.append(sum_col(field).alias(f"__p_{alias}"))
            merged = F.sum(f"__p_{alias}")
            if frac:
                merged = merged.cast("double")
            finals.append(merged.alias(alias))
        elif fn in _PARTIAL:
            partials.append(_PARTIAL[fn](field).alias(f"__p_{alias}"))
            finals.append(_MERGE[fn](f"__p_{alias}").alias(alias))
        else:
            raise ValueError(f"{fn} is not algebraic; salting cannot decompose it")

    stage1 = df.withColumn("__salt", salt).groupBy(*keys, "__salt").agg(*partials)
    return stage1.groupBy(*keys).agg(*finals)


def salted_join(
    facts: DataFrame,
    dim: DataFrame,
    on: str,
    salt_buckets: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Hot-key-immune equi-join without broadcast: salt the fact side
    randomly into `salt_buckets`, REPLICATE every dim row once per
    bucket, and join on (key, salt). A hot join key's rows land on
    `salt_buckets` different reducers instead of one.

    This is the manual fallback for the case AQE skew-splitting can't
    fix (one key too large for any single split) and broadcast can't
    either (dim side too big for memory but small enough that
    `salt_buckets`x replication is acceptable). Result is exactly the
    plain join for any salt assignment — salting only changes row
    placement. `how` supports inner/left (dim replicated, facts never
    duplicated).

    At 100 TB: cost = one extra explode of the dim side (x buckets)
    traded against eliminating the straggler reducer; pick
    salt_buckets ~ (hot-key rows / healthy-partition rows).
    """
    if how not in ("inner", "left"):
        raise ValueError("salted_join supports how='inner' or 'left'")
    salt = F.floor(F.rand(seed=7) * salt_buckets).cast("int")
    f = facts.withColumn("__salt", salt)
    d = dim.withColumn(
        "__salt", F.explode(F.array(*[F.lit(i) for i in range(salt_buckets)]))
    )
    return f.join(d, [on, "__salt"], how).drop("__salt")


def key_skew_report(df: DataFrame, key: str, top_n: int = 10) -> DataFrame:
    """Shuffle-planning diagnostic: the share and cumulative share of
    the heaviest keys — the number you look at before choosing salting
    buckets or AQE skew thresholds. A key with share >> 1/shuffle
    partitions is the straggler.

    Shape: one partial-agg count per key, top-N via TakeOrdered, and
    the cumulative window runs over AT MOST top_n rows (a single tiny
    partition by construction — the global orderBy is on the already-
    reduced key counts, never the raw rows)."""
    counts = df.groupBy(F.col(key).alias("key")).agg(
        F.count(F.lit(1)).alias("n")
    )
    total = counts.agg(F.sum("n").alias("__total"))
    top = (
        counts.orderBy(F.col("n").desc(), F.col("key").asc())
        .limit(top_n)
        .crossJoin(F.broadcast(total))
    )
    w = (
        Window.orderBy(F.col("n").desc(), F.col("key").asc())
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return top.select(
        "key",
        "n",
        F.round(F.col("n") / F.col("__total"), 6).alias("share"),
        F.round(F.sum("n").over(w) / F.col("__total"), 6).alias("cum_share"),
    )
