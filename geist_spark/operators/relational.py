"""Relational / windowed operators (the surface the reference lacks).

The reference explicitly defers joins/aggregations/windows to Spark
(reference README.md:21,564; SURVEY §2.7). These helpers expose them
as engine operators, written declaratively so Catalyst handles
pushdown/pruning/join strategy. Each has a matching DuckDB oracle in
__spark_entry__.oracle_sql().

Scale notes (100 TB):
- aggregations are partial (map-side combine) by construction;
- dimension joins (region/nation/part/supplier) get broadcast hints;
- window top-N per key shuffles once on the key and never collects;
- float aggregates use exact_sum/exact_avg (decimal-exact summation):
  sum(double) is summation-order-dependent and round() implementations
  differ between engines, so rounded double sums flip at .xx5
  boundaries — the round-1 driver-hash failures. Decimal sums are
  order-independent and convert to the same double everywhere.
"""

from __future__ import annotations

from geist_spark.functions.litx import double_array
from pyspark.sql import Column, DataFrame, Window, functions as F


def exact_sum(col: Column | str, scale: int = 6) -> Column:
    """Order-independent sum for float columns: exact decimal(38,scale)
    accumulation, result as double (deterministic conversion)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.sum(c.cast(f"decimal(38,{scale})")).cast("double")


def exact_avg(col: Column | str, scale: int = 6) -> Column:
    """exact_sum / count: one IEEE division of deterministic values."""
    return exact_sum(col, scale) / F.count(F.lit(1))


def pricing_summary(lineitem: DataFrame, cutoff: str = "1998-09-02") -> DataFrame:
    """TPC-H Q1-style pricing summary over lineitem."""
    return (
        lineitem.filter(F.col("l_shipdate") <= cutoff)
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            exact_sum("l_quantity").alias("sum_qty"),
            exact_sum("l_extendedprice").alias("sum_base_price"),
            exact_sum(
                F.col("l_extendedprice") * (1 - F.col("l_discount"))
            ).alias("sum_disc_price"),
            exact_sum(
                F.col("l_extendedprice")
                * (1 - F.col("l_discount"))
                * (1 + F.col("l_tax"))
            ).alias("sum_charge"),
            exact_avg("l_quantity").alias("avg_qty"),
            exact_avg("l_extendedprice").alias("avg_price"),
            exact_avg("l_discount").alias("avg_disc"),
            F.count("*").alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


def revenue_by_nation(
    customer: DataFrame,
    orders: DataFrame,
    lineitem: DataFrame,
    nation: DataFrame,
    region: DataFrame,
) -> DataFrame:
    """Multi-join rollup: lineitem revenue per nation/region.

    nation/region are tiny dims -> broadcast (no shuffle for them);
    the orders⋈lineitem join shuffles on orderkey once."""
    return (
        lineitem.join(orders, lineitem.l_orderkey == orders.o_orderkey)
        .join(customer, orders.o_custkey == customer.c_custkey)
        .join(F.broadcast(nation), customer.c_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .groupBy("r_name", "n_name")
        .agg(
            exact_sum(
                F.col("l_extendedprice") * (1 - F.col("l_discount"))
            ).alias("revenue"),
            F.count("*").alias("n_items"),
        )
    )


def revenue_by_brand(lineitem: DataFrame, part: DataFrame, supplier: DataFrame) -> DataFrame:
    """Broadcast-join enrichment: revenue per part brand x supplier nation."""
    return (
        lineitem.join(F.broadcast(part), lineitem.l_partkey == part.p_partkey)
        .join(F.broadcast(supplier), lineitem.l_suppkey == supplier.s_suppkey)
        .groupBy("p_brand", "s_nationkey")
        .agg(
            exact_sum(
                F.col("l_extendedprice") * (1 - F.col("l_discount"))
            ).alias("revenue"),
            exact_sum("l_quantity").alias("sum_qty"),
        )
    )


def top_n_per_key(
    df: DataFrame,
    key: str,
    order_col: str,
    n: int,
    tiebreak: str,
    descending: bool = True,
) -> DataFrame:
    """Keep-last/top-N per key — the engine primitive behind the
    BigTable `maxVersions` GC emulation (SURVEY §2.2) and generic
    top-K. One shuffle on the key; deterministic via tiebreak."""
    oc = F.col(order_col).desc() if descending else F.col(order_col).asc()
    tb = F.col(tiebreak).desc() if descending else F.col(tiebreak).asc()
    w = Window.partitionBy(key).orderBy(oc, tb)
    return (
        df.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= n)
        .drop("rn")
    )


def latest_event_per_user(events: DataFrame) -> DataFrame:
    """argmax(ts) per user_id with event_id tiebreak (insert-order)."""
    w = Window.partitionBy("user_id").orderBy(
        F.col("ts").desc(), F.col("event_id").desc()
    )
    return (
        events.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("user_id", "event_id", "event_type", "ts")
    )


def hourly_rollup(events: DataFrame) -> DataFrame:
    """Tumbling-window aggregate per event_type (batch equivalent of a
    streaming windowed agg; the streaming path shares the expression
    via F.window + watermark)."""
    return (
        events.groupBy(
            F.date_trunc("hour", F.col("ts")).alias("hour"),
            F.col("event_type"),
        )
        .agg(
            F.count("*").alias("n_events"),
            exact_sum("value").alias("sum_value"),
            F.countDistinct("user_id").alias("n_users"),
        )
    )


def assign_sessions(events: DataFrame, gap_minutes: int = 30) -> DataFrame:
    """Gap-based session assignment per user: every event row gains a
    `session_seq` (1-based per user). Classic lag+cumsum — one shuffle
    on user_id; at scale the windows stay partition-local."""
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    # exact integer MICROSECOND gaps: cast("long") truncates to whole
    # seconds while the DuckDB oracle's epoch() is fractional DOUBLE, so a
    # pair 1800.3 s apart would flip the boundary between the two engines
    # (cast via TIMESTAMP first so TIMESTAMP_NTZ inputs work too)
    epoch = F.unix_micros(F.col("ts").cast("timestamp"))
    gap = epoch - F.lag(epoch).over(w)
    return events.withColumn(
        "new_session",
        F.when(
            gap.isNull() | (gap > gap_minutes * 60 * 1_000_000),
            F.lit(1),
        ).otherwise(F.lit(0)),
    ).withColumn("session_seq", F.sum("new_session").over(w))


def sessionize(events: DataFrame, gap_minutes: int = 30) -> DataFrame:
    """Per-session rollups over assign_sessions output."""
    return (
        assign_sessions(events, gap_minutes)
        .groupBy("user_id", "session_seq")
        .agg(
            F.count("*").alias("n_events"),
            F.min("ts").alias("session_start"),
            F.max("ts").alias("session_end"),
            exact_sum("value").alias("session_value"),
        )
    )


def session_sequences(events: DataFrame, gap_minutes: int = 30) -> DataFrame:
    """Training-sequence assembly: for each (user, session), the
    chronologically ordered event sequence — the op that turns raw logs
    into model-ready interaction sequences (SFT conversations, user
    journeys, next-event-prediction examples).

    The sequence is carried as `seq_text` ("type:epoch|type:epoch|…",
    ordered by ts then event_id) plus a fixed-width md5 digest; scalar
    outputs keep the result canonicalizer-friendly and make the digest
    comparable across engines. Shape: ONE shuffle (the session window
    on user_id); the ordered array is built with array_sort over
    collect_list, so ordering never depends on partition iteration
    order. Per-session arrays are bounded by session length, not table
    size."""
    with_sessions = assign_sessions(events, gap_minutes)
    # unix_micros: exact integer epoch (cast-to-long truncates while
    # DuckDB's epoch()::BIGINT rounds — micros sidestep both), and
    # sorting by it is identical to sorting by the full timestamp
    item = F.struct(
        F.unix_micros(F.col("ts").cast("timestamp")).alias("epoch"),
        F.col("event_id").alias("event_id"),
        F.col("event_type").alias("event_type"),
    )
    seq = F.array_sort(F.collect_list(item))
    seq_text = F.concat_ws(
        "|",
        F.transform(
            seq, lambda s: F.concat_ws(":", s["event_type"], s["epoch"])
        ),
    )
    return (
        with_sessions.groupBy("user_id", "session_seq")
        .agg(
            F.count("*").alias("n_events"),
            seq_text.alias("seq_text"),
        )
        .select(
            "user_id",
            "session_seq",
            "n_events",
            F.md5("seq_text").alias("seq_hash"),
            F.substring("seq_text", 1, 64).alias("seq_head"),
        )
    )


def order_priority_counts(orders: DataFrame, lineitem: DataFrame) -> DataFrame:
    """Semi-join pattern (EXISTS): orders having at least one lineitem
    shipped after the order date, counted by priority."""
    late = lineitem.filter(F.col("l_shipdate").isNotNull()).select("l_orderkey").distinct()
    return (
        orders.join(late, orders.o_orderkey == late.l_orderkey, "left_semi")
        .groupBy("o_orderpriority")
        .agg(F.count("*").alias("order_count"))
    )


def dormant_customers(
    customer: DataFrame, orders: DataFrame, since: str = "1998-01-01"
) -> DataFrame:
    """TPC-H Q22-style anti-join report: customers with above-average
    positive account balance and NO order since `since` (dormant
    high-value accounts), rolled up by market segment.

    Scale shape: the global threshold is a 1-row aggregate cross-joined
    (broadcast) onto customer — no driver collect, the whole query is
    one lazy Catalyst plan; dormancy is a `left_anti` join against the
    single projected o_custkey column (date filter + column pruning
    both pushed to the orders scan, so the anti join's build side is a
    fraction of orders); the final rollup is a partial agg over the few
    surviving rows.

    The threshold comparison is done in exact DECIMAL arithmetic
    (c_acctbal * n_pos > total_bal — multiply instead of divide, so no
    quotient rounding) making the survivors identical across engines.
    """
    pos = customer.filter(F.col("c_acctbal") > 0).agg(
        F.sum(F.col("c_acctbal").cast("decimal(18,6)")).alias("__total"),
        F.count(F.lit(1)).cast("decimal(12,0)").alias("__n"),
    )
    cand = customer.join(F.broadcast(pos)).filter(
        F.col("c_acctbal").cast("decimal(18,6)") * F.col("__n")
        > F.col("__total")
    )
    recent = orders.filter(F.col("o_orderdate") >= since).select("o_custkey")
    dormant = cand.join(
        recent, cand["c_custkey"] == F.col("o_custkey"), "left_anti"
    )
    return dormant.groupBy("c_mktsegment").agg(
        F.count(F.lit(1)).alias("n_customers"),
        exact_sum("c_acctbal").alias("total_acctbal"),
    )


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_ts: str,
    right_ts: str,
    value_cols: list[str],
) -> DataFrame:
    """As-of join: for each left row, the latest right row with the
    same key and right_ts <= left_ts (DuckDB/kdb ASOF JOIN semantics,
    inclusive).

    Spark has no native asof join; the classic scalable plan is NOT a
    range join (O(n*m) within key) but a union + running last_value:
    tag both sides, sort within key by (ts, side), and carry the most
    recent right values forward onto left rows. ONE shuffle on the key,
    partition-local sort — the same cost as a plain groupBy, regardless
    of how many right rows precede each left row.

    Right rows sharing (key, ts) are reduced to one row (max by
    value_cols tuple) first so results are deterministic.
    """
    k, lt, rt = F.col(on), F.col(left_ts), F.col(right_ts)

    r = (
        right.select(
            k.alias("__k"), rt.cast("timestamp").alias("__t"), F.struct(*value_cols).alias("__v")
        )
        .groupBy("__k", "__t")
        .agg(F.max("__v").alias("__v"))
        .withColumn("__side", F.lit(0))
    )
    l = left.select(
        F.col(on).alias("__k"),
        lt.cast("timestamp").alias("__t"),
        F.struct(*[F.col(c) for c in left.columns]).alias("__l"),
        F.lit(None).cast(r.schema["__v"].dataType).alias("__v"),
        F.lit(1).alias("__side"),
    )
    u = r.select("__k", "__t", F.lit(None).cast(l.schema["__l"].dataType).alias("__l"), "__v", "__side").unionByName(l)

    # right rows (side 0) sort before left rows at equal ts -> inclusive
    w = (
        Window.partitionBy("__k")
        .orderBy(F.col("__t").asc(), F.col("__side").asc())
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    carried = u.withColumn("__match", F.last("__v", ignorenulls=True).over(w))
    out = carried.filter(F.col("__side") == 1).select(
        *[F.col("__l")[c].alias(c) for c in left.columns],
        *[F.col("__match")[c].alias(c) for c in value_cols],
    )
    return out


def range_join(
    points: DataFrame,
    ranges: DataFrame,
    point_col: str,
    lower_col: str,
    upper_col: str,
    bucket_width: float,
    how: str = "inner",
    broadcast_ranges: bool = False,
) -> DataFrame:
    """Point-in-range join (points.x BETWEEN ranges.lo AND ranges.hi,
    inclusive) as a bucketed EQUI-join.

    Naive range joins plan as BroadcastNestedLoop/cartesian —
    every point against every range, O(|P| * |R|): unusable at scale.
    Instead both sides are mapped onto fixed-width buckets: each range
    explodes into the buckets it covers, each point hashes to exactly
    one bucket, and the join runs as a hash equi-join on bucket_id with
    the exact BETWEEN as a residual filter. Cost: one shuffle on
    bucket_id; blowup = avg-range-span / bucket_width (pick
    bucket_width ~ median range width so ranges explode to O(1)
    buckets). This is the same strategy Databricks' range-join hints
    and interval-join engines (Flink) use.

    Columns from both inputs are kept (overlapping names must be
    disambiguated by the caller).

    `how` may be 'inner' or 'left' (left = keep every point, NULL range
    columns when no range contains it). A point hashes to exactly ONE
    bucket, so moving the BETWEEN predicate into the join condition
    gives exact left-outer semantics with no duplicate unmatched rows.
    Range-preserving ('right'/'full') outer joins are rejected: the
    range side is exploded per bucket, so unmatched ranges would need a
    post-join dedup — use ranges as the point side or anti-join instead.
    """
    if how not in ("inner", "left"):
        raise ValueError(
            f"range_join supports how='inner'|'left', got {how!r}: the "
            "range side is bucket-exploded, so range-preserving outer "
            "joins would duplicate unmatched ranges"
        )
    p, lo, hi = F.col(point_col), F.col(lower_col), F.col(upper_col)
    b = F.floor(p / F.lit(bucket_width)).cast("long")
    lob = F.floor(lo / F.lit(bucket_width)).cast("long")
    hib = F.floor(hi / F.lit(bucket_width)).cast("long")
    pts = points.withColumn("__bucket_p", b)
    rng = ranges.withColumn(
        "__bucket_r", F.explode(F.sequence(lob, hib))
    )
    if broadcast_ranges:
        # dimension-sized ranges: broadcast the exploded range side so
        # the (huge) point side never moves — at scale Spark's stats
        # could otherwise pick the point side as the build side.
        rng = F.broadcast(rng)
    # equality conjunct keeps this a hash equi-join; BETWEEN rides as
    # the residual INSIDE the condition so unmatched points survive a
    # left join (a post-join filter would silently drop them)
    cond = (F.col("__bucket_p") == F.col("__bucket_r")) & p.between(lo, hi)
    joined = pts.join(rng, cond, how)
    return joined.drop("__bucket_p", "__bucket_r")


def shipping_priority(
    customer: DataFrame,
    orders: DataFrame,
    lineitem: DataFrame,
    segment: str = "BUILDING",
    cutoff: str = "1997-06-01",
    n: int = 10,
) -> DataFrame:
    """TPC-H Q3-style shipping priority: top-N not-yet-shipped orders
    by revenue within a market segment.

    Scale shape: both selective filters (segment on customer, date on
    orders/lineitem) are pushed to the parquet scans BEFORE the joins;
    the orderkey join shuffles once; the top-N is a TakeOrdered (heap
    per partition + driver merge of N rows), never a full sort of the
    joined result. Deterministic under ties via the orderkey tiebreak.
    """
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        lineitem.filter(F.col("l_shipdate") > cutoff)
        .join(
            orders.filter(F.col("o_orderdate") < cutoff),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .join(
            customer.filter(F.col("c_mktsegment") == segment),
            F.col("o_custkey") == F.col("c_custkey"),
        )
        .groupBy("l_orderkey", "o_orderdate")
        .agg(exact_sum(rev).alias("revenue"))
        .orderBy(F.col("revenue").desc(), F.col("l_orderkey").asc())
        .limit(n)
    )


def forecast_revenue(
    lineitem: DataFrame,
    date_from: str = "1997-01-01",
    date_to: str = "1998-01-01",
    disc_lo: float = 0.05,
    disc_hi: float = 0.07,
    max_qty: float = 24.0,
) -> DataFrame:
    """TPC-H Q6-style forecast revenue: a single selective scan+agg.

    The whole query is one parquet scan with every predicate pushed
    down and only 3 columns read, then a partial+final agg of one
    group — the minimal possible plan (no shuffle of data rows, only
    of 1-row partials)."""
    return (
        lineitem.filter(
            (F.col("l_shipdate") >= date_from)
            & (F.col("l_shipdate") < date_to)
            & F.col("l_discount").between(disc_lo, disc_hi)
            & (F.col("l_quantity") < max_qty)
        )
        .agg(
            exact_sum(F.col("l_extendedprice") * F.col("l_discount")).alias(
                "revenue"
            ),
            F.count("*").alias("n_items"),
        )
    )


def promo_revenue_share(
    lineitem: DataFrame,
    part: DataFrame,
    date_from: str = "1997-09-01",
    date_to: str = "1997-10-01",
) -> DataFrame:
    """TPC-H Q14-style promotion effect: the revenue share of PROMO
    parts in a ship-month — the conditional-aggregation-ratio shape
    (CASE inside two sums over one join).

    Plan: the date filter is pushed into the lineitem scan, part is a
    dimension (broadcast, only p_partkey+p_type read), and both sums
    come out of ONE partial+final aggregation — no second pass, no
    self-join. Sums are exact decimal (order-independent); the share
    is a single IEEE division of the two exact sums.
    """
    rev = F.col("l_extendedprice") * (F.lit(1) - F.col("l_discount"))
    j = (
        lineitem.filter(
            (F.col("l_shipdate") >= date_from) & (F.col("l_shipdate") < date_to)
        )
        .join(
            F.broadcast(part.select("p_partkey", "p_type")),
            F.col("l_partkey") == F.col("p_partkey"),
        )
    )
    return j.agg(
        exact_sum(F.when(F.col("p_type") == "PROMO", rev).otherwise(0.0)).alias(
            "promo_revenue"
        ),
        exact_sum(rev).alias("total_revenue"),
    ).select(
        "promo_revenue",
        "total_revenue",
        (
            F.lit(100.0) * F.col("promo_revenue") / F.col("total_revenue")
        ).alias("promo_share_pct"),
    )


def returned_item_report(
    customer: DataFrame,
    orders: DataFrame,
    lineitem: DataFrame,
    nation: DataFrame,
    date_from: str = "1997-01-01",
    date_to: str = "1997-04-01",
    n: int = 20,
) -> DataFrame:
    """TPC-H Q10-style returned-item report: revenue lost to returns
    per customer in a quarter, top-N customers.

    Scale shape: the returnflag filter prunes lineitem at the scan; the
    quarter filter prunes orders at the scan (and transitively the join
    input); nation is broadcast; top-N is TakeOrdered, not a sort."""
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        lineitem.filter(F.col("l_returnflag") == "R")
        .join(
            orders.filter(
                (F.col("o_orderdate") >= date_from)
                & (F.col("o_orderdate") < date_to)
            ),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .join(customer, F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(nation), F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy("c_custkey", "c_name", "c_acctbal", "n_name")
        .agg(exact_sum(rev).alias("revenue"))
        .orderBy(F.col("revenue").desc(), F.col("c_custkey").asc())
        .limit(n)
    )


def large_order_customers(
    customer: DataFrame,
    orders: DataFrame,
    lineitem: DataFrame,
    min_qty: float = 250.0,
    n: int = 100,
) -> DataFrame:
    """TPC-H Q18-style large-volume customers: orders whose total
    quantity exceeds min_qty, with their customers, top-N by price.

    Scale shape: the HAVING-style reduction happens FIRST on lineitem
    (one shuffle on orderkey, partial agg map-side), so the expensive
    joins only see the ~1% of orders that survive; the surviving set is
    small enough that AQE broadcasts it against orders."""
    big = (
        lineitem.groupBy("l_orderkey")
        .agg(exact_sum("l_quantity").alias("total_qty"))
        .filter(F.col("total_qty") > min_qty)
    )
    return (
        orders.join(big, F.col("o_orderkey") == F.col("l_orderkey"))
        .join(customer, F.col("o_custkey") == F.col("c_custkey"))
        .select(
            "c_custkey",
            "c_name",
            "o_orderkey",
            "o_orderdate",
            "o_totalprice",
            "total_qty",
        )
        .orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey").asc())
        .limit(n)
    )


def pivot_table(
    df: DataFrame,
    row_keys: list[str],
    pivot_col: str,
    pivot_values: list[str],
    value_col: str,
    with_counts: bool = False,
) -> DataFrame:
    """Cross-tab: one column per pivot value, exact decimal sums.

    `pivot_values` is REQUIRED (not discovered): at 100 TB the
    two-pass "scan to find distinct pivot values, scan again to
    pivot" is the trap — explicit values keep this a single hash-agg
    pass with a fixed output schema Catalyst can prune against.

    with_counts=True adds a per-cell row count with count(*) FILTER
    semantics (count(lit(1)) inside the pivot group: a matching row
    with a NULL measure still counts, while its sum contribution is
    the SQL null-skip). Columns become {value}_sum / {value}_n. An
    absent (row_key, pivot_value) cell keeps the SQL contract: NULL
    sum, 0 count — Spark's pivot leaves BOTH NULL, so the count
    columns are coalesced to 0 post-pivot (count(*) FILTER over an
    empty set is 0, never NULL)."""
    # backtick-quoted resolution so row keys and pivot values
    # containing dots (or backticks) resolve as literal top-level
    # column names, never as nested-field accessor paths — pivot
    # values especially, since they become GENERATED names ({v}_sum)
    def _qcol(name: str) -> F.Column:
        return F.col("`" + name.replace("`", "``") + "`")

    if with_counts:
        wide = (
            df.groupBy(*[_qcol(k) for k in row_keys])
            .pivot(pivot_col, pivot_values)
            .agg(
                exact_sum(value_col).alias("sum"),
                F.count(F.lit(1)).alias("n"),
            )
        )
        return wide.select(
            *[_qcol(k) for k in row_keys],
            *[
                c
                for v in pivot_values
                for c in (
                    _qcol(f"{v}_sum"),
                    F.coalesce(
                        _qcol(f"{v}_n"), F.lit(0).cast("long")
                    ).alias(f"{v}_n"),
                )
            ],
        )
    return (
        df.groupBy(*[_qcol(k) for k in row_keys])
        .pivot(pivot_col, pivot_values)
        .agg(exact_sum(value_col))
    )


def _grouping_report(grouped, value_col: str) -> DataFrame:
    """Shared aggregate body of rollup_report / cube_report: exact
    total, row count, and the grouping-set id — one output contract
    for every grouping-sets report shape."""
    return grouped.agg(
        exact_sum(value_col).alias("total"),
        F.count(F.lit(1)).alias("n_rows"),
        F.grouping_id().alias("grouping_level"),
    )


def rollup_report(
    df: DataFrame, dims: list[str], value_col: str
) -> DataFrame:
    """Hierarchical totals: ROLLUP over `dims` (subtotal per prefix +
    grand total) with a grouping level id. One shuffle — Spark expands
    grouping sets map-side, the aggregate is still a single partial
    hash agg, so the cost is ~len(dims)+1 partial rows per input
    partition, not extra passes."""
    return _grouping_report(df.rollup(*dims), value_col)


def cube_report(
    df: DataFrame, dims: list[str], value_col: str
) -> DataFrame:
    """All-subsets totals: CUBE over `dims` (every combination of
    grouping columns, 2^len(dims) grouping sets) with a grouping
    level id — the cross-dim slice a dashboard or mixture audit wants
    where ROLLUP only gives the prefix hierarchy. Same cost shape as
    rollup_report: Spark expands grouping sets map-side into ONE
    partial hash aggregate, so the price is ~2^len(dims) partial rows
    per input partition (dims stay small by construction), not extra
    passes over the fact table.

    grouping_level uses Spark's grouping_id() bit order (first dim =
    most significant bit); the oracle reconstructs it explicitly from
    GROUPING() bits so both engines agree by construction.
    """
    return _grouping_report(df.cube(*dims), value_col)


def gap_fill_hourly(
    events: DataFrame, group_col: str, fill: str = "zero"
) -> DataFrame:
    """Dense hourly series per group: every hour between the table's
    min and max gets a row, absent hours count 0 — the gap-filling a
    telemetry/feature pipeline needs before windowed models.

    Scale shape: the dense hour axis is built ONCE from a 1-row
    min/max aggregate via sequence+explode (hours x groups rows, tiny
    next to the raw table), cross-joined with the distinct group list
    (broadcast), then LEFT-joined with the per-hour partial counts.
    The raw table is scanned once; the join keys are (group, hour) so
    the fill never shuffles raw rows a second time."""
    hour = F.date_trunc("hour", F.col("ts"))
    actual = events.groupBy(
        F.col(group_col).alias("g"), hour.alias("h")
    ).agg(F.count(F.lit(1)).alias("n"))

    bounds = events.agg(
        F.date_trunc("hour", F.min("ts")).alias("lo"),
        F.date_trunc("hour", F.max("ts")).alias("hi"),
    )
    axis = bounds.select(
        F.explode(
            F.sequence("lo", "hi", F.expr("INTERVAL 1 HOUR"))
        ).alias("h")
    )
    groups = events.select(F.col(group_col).alias("g")).distinct()
    dense = axis.crossJoin(F.broadcast(groups))
    return (
        dense.join(actual, ["g", "h"], "left")
        .select(
            F.col("g").alias(group_col),
            F.col("h").alias("hour"),
            F.coalesce(F.col("n"), F.lit(0)).alias("n"),
        )
    )


def rolling_user_features(events: DataFrame, days: int = 7) -> DataFrame:
    """Per-event trailing-window features: for every event, the count
    and exact sum of the user's events in the preceding `days` —
    the feature-engineering shape behind churn/abuse/engagement
    models ("activity in the last week as of each interaction").

    RANGE frame over integer microsecond epochs (not ROWS): events at
    identical timestamps are peers and both engines include the full
    peer group, so results are deterministic under ties. One shuffle
    (user_id); the frame scan is partition-local and incremental."""
    epoch = F.unix_micros(F.col("ts").cast("timestamp"))
    span = days * 86_400_000_000
    w = (
        Window.partitionBy("user_id")
        .orderBy(epoch)
        .rangeBetween(-span, 0)
    )
    return events.select(
        "event_id",
        "user_id",
        F.count(F.lit(1)).over(w).alias("n_window"),
        F.sum(F.col("value").cast("decimal(38,6)"))
        .over(w)
        .cast("double")
        .alias("sum_window"),
    )


def anomaly_zscore(
    events: DataFrame,
    days: int = 7,
    z_threshold: float = 3.0,
    min_n: int = 5,
) -> DataFrame:
    """Per-event anomaly flag: z-score of `value` against the user's
    own trailing-`days` window (self-baselined outlier detection, the
    shape behind fraud/abuse/telemetry monitors).

    Same RANGE-frame-over-epoch-micros contract as
    rolling_user_features (ties are peers -> deterministic). Sum and
    sum-of-squares accumulate in decimal (exact, order-independent);
    mean/variance/z are then a fixed chain of IEEE ops, so the score
    is bit-reproducible. Windows with fewer than `min_n` events or
    ~zero variance yield NULL z (no flag) — the standard guards.

    One shuffle (user_id); the frame scan is partition-local and
    incremental. Output: (event_id, user_id, n_window, zscore,
    is_anomaly)."""
    epoch = F.unix_micros(F.col("ts").cast("timestamp"))
    span = days * 86_400_000_000
    w = Window.partitionBy("user_id").orderBy(epoch).rangeBetween(-span, 0)
    v = F.col("value")
    n = F.count(F.lit(1)).over(w)
    s = F.sum(v.cast("decimal(38,6)")).over(w).cast("double")
    sq = F.sum((v * v).cast("decimal(38,6)")).over(w).cast("double")
    base = events.select(
        "event_id", "user_id", v.alias("__v"),
        n.alias("n_window"), s.alias("__s"), sq.alias("__sq"),
    )
    nn = F.col("n_window").cast("double")
    mean = F.col("__s") / nn
    var = (F.col("__sq") - F.col("__s") * F.col("__s") / nn) / (nn - 1)
    z = F.when(
        (F.col("n_window") >= min_n) & (var > 0),
        (F.col("__v") - mean) / F.sqrt(var),
    )
    return base.select(
        "event_id",
        "user_id",
        F.col("n_window").cast("long").alias("n_window"),
        z.alias("zscore"),
        F.coalesce(F.abs(z) > z_threshold, F.lit(False)).alias("is_anomaly"),
    )


def event_transition_matrix(events: DataFrame) -> DataFrame:
    """First-order behavior model: counts and probabilities of
    consecutive event-type transitions within each user's timeline —
    the Markov-chain summary behind next-event features and anomaly
    baselines. One shuffle (the per-user lag window on user_id), then
    a tiny (types x types) aggregate; the probability denominator
    rides a second window over those few rows."""
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    steps = events.select(
        F.lag("event_type").over(w).alias("from_type"),
        F.col("event_type").alias("to_type"),
    ).filter(F.col("from_type").isNotNull())
    counts = steps.groupBy("from_type", "to_type").agg(
        F.count(F.lit(1)).alias("n")
    )
    wt = Window.partitionBy("from_type")
    return counts.select(
        "from_type",
        "to_type",
        "n",
        F.round(
            F.col("n").cast("double") / F.sum("n").over(wt).cast("double"), 6
        ).alias("p"),
    )


def cdc_apply(
    changes: DataFrame,
    key_cols: list[str],
    ts_col: str,
    tiebreak_col: str,
    delete_when: Column | None = None,
) -> DataFrame:
    """Apply a change feed to produce current state: the LATEST change
    per key wins (deterministic under same-timestamp races via the
    tiebreak), and a winning change matching `delete_when` is a
    tombstone — the key disappears. This is the MERGE/upsert primitive
    a keyed snapshot needs when fed from a log (CDC, event-sourced
    entities, mutable-dimension feeds).

    One shuffle (the per-key window); at scale the change feed is
    usually partitioned by ingest date, so compaction runs
    incrementally: cdc_apply(old_state ∪ new_changes) — state rows
    carry their original ts and lose to any newer change, making the
    operator idempotent and restartable."""
    order = [F.col(ts_col).desc(), F.col(tiebreak_col).desc()]
    w = Window.partitionBy(*key_cols).orderBy(*order)
    latest = (
        changes.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )
    if delete_when is not None:
        latest = latest.filter(~delete_when)
    return latest


def scd2_history(
    changes: DataFrame,
    key_cols: list[str],
    ts_col: str,
    tiebreak_col: str,
) -> DataFrame:
    """Slowly-changing-dimension type-2 history from a change feed:
    each change becomes a versioned row with `valid_from`/`valid_to`
    (open interval = NULL valid_to) and `is_current` — the as-of-able
    history table that pairs with cdc_apply's current-state view (and
    with asof_join for time-travel lookups).

    One shuffle on the key; valid_to is the next change's timestamp
    via lead(), so the whole history is one window pass — no
    self-join. Same-timestamp races order by the tiebreak, making
    intervals deterministic."""
    order = [F.col(ts_col).asc(), F.col(tiebreak_col).asc()]
    w = Window.partitionBy(*key_cols).orderBy(*order)
    nxt = F.lead(F.col(ts_col)).over(w)
    return (
        changes.withColumn("valid_from", F.col(ts_col))
        .withColumn("valid_to", nxt)
        .withColumn("is_current", nxt.isNull())
    )


def funnel_conversion(events: DataFrame, steps: list[str]) -> DataFrame:
    """Ordered funnel: for each step k, how many users reached it via
    the ordered path — step k's first qualifying event must be
    strictly after the time the user completed step k-1.

    Shape: ONE scan + one shuffle (the per-user aggregate). Each
    step's qualifying times are collected as a sorted per-user array
    (bounded by that user's matching events), and the path walk is a
    per-row array expression — never the k self-joins of the textbook
    formulation, which at 10^12 events would be k shuffles of the
    full table."""
    aggs = [
        F.array_sort(
            F.collect_list(
                F.when(
                    F.col("event_type") == s,
                    F.col("ts").cast("timestamp").cast("double"),
                )
            )
        ).alias(f"__ts{i}")
        for i, s in enumerate(steps)
    ]
    per_user = events.groupBy("user_id").agg(*aggs)
    prev = F.element_at(F.col("__ts0"), 1)
    reach = [prev.isNotNull()]
    for i in range(1, len(steps)):
        prev = F.array_min(F.filter(F.col(f"__ts{i}"), lambda x: x > prev))
        reach.append(prev.isNotNull())
    flags = per_user.select(
        *[
            F.coalesce(r, F.lit(False)).alias(f"__r{i}")
            for i, r in enumerate(reach)
        ]
    )
    return flags.agg(
        *[
            F.sum(F.col(f"__r{i}").cast("long")).alias(f"n_step{i}")
            for i in range(len(steps))
        ]
    )


def cohort_retention(events: DataFrame, period_days: int = 7) -> DataFrame:
    """Cohort retention matrix: users grouped by first-activity period
    (cohort), distinct active users counted at each periods-since
    offset. Two shuffles total (first-activity per user, then the
    cohort x offset distinct-count) — the matrix every growth
    dashboard needs, shaped so neither pass re-reads raw rows twice.

    Periods are integer epoch-day buckets (floor(epoch_days /
    period_days)) — deterministic, engine-exact arithmetic."""
    day = F.floor(
        F.col("ts").cast("timestamp").cast("long") / F.lit(86400)
    )
    period = F.floor(day / F.lit(period_days)).alias("period")
    activity = events.select("user_id", period).distinct()
    first = activity.groupBy("user_id").agg(F.min("period").alias("cohort"))
    joined = activity.join(first, "user_id")
    return (
        joined.groupBy(
            "cohort", (F.col("period") - F.col("cohort")).alias("periods_since")
        )
        .agg(F.countDistinct("user_id").alias("n_users"))
    )


def interval_join(
    left: DataFrame,
    right: DataFrame,
    left_id: str,
    right_id: str,
    l_start: str = "l_start",
    l_end: str = "l_end",
    r_start: str = "r_start",
    r_end: str = "r_end",
    bucket_seconds: int = 3600,
) -> DataFrame:
    """Interval-overlap join (both sides are intervals; overlap iff
    l_start <= r_end AND r_start <= l_end, inclusive) without a
    cartesian product: each interval explodes into the coarse time
    buckets it spans, candidates equi-join on bucket, the exact
    predicate filters, and (left_id, right_id) dedupes multi-bucket
    matches. The range_join trick generalized to interval x interval.

    Bucket size trades explosion factor against candidate precision:
    intervals explode into span/bucket_seconds rows, so pick buckets
    near the typical interval length. Degenerate month-long intervals
    in an hours-bucketed join should be routed to a broadcast path
    upstream (same economics as the hot-bucket caps in dedup)."""
    bucket_us = bucket_seconds * 1_000_000

    def bucketed(df, start, end, idc, keep):
        # exact microsecond epochs: second-truncated casts shift
        # sub-second boundaries across the overlap predicate
        s = F.unix_micros(F.col(start).cast("timestamp"))
        e = F.unix_micros(F.col(end).cast("timestamp"))
        b = F.explode(
            F.sequence(F.floor(s / bucket_us), F.floor(e / bucket_us))
        ).alias("__bucket")
        return df.select(F.col(idc), *keep, s.alias(start + "_s"),
                         e.alias(end + "_s"), b)

    lb = bucketed(left, l_start, l_end, left_id, [])
    rb = bucketed(right, r_start, r_end, right_id, [])
    cand = lb.join(rb, "__bucket").filter(
        (F.col(l_start + "_s") <= F.col(r_end + "_s"))
        & (F.col(r_start + "_s") <= F.col(l_end + "_s"))
    )
    return cand.select(left_id, right_id).distinct()


def cheapest_supplier_per_brand(
    lineitem: DataFrame, part: DataFrame, supplier: DataFrame
) -> DataFrame:
    """TPC-H Q2-shape correlated-min decorrelation: for each part
    brand, the supplier(s) achieving the minimum observed line price
    (Q2's `ps_supplycost = (SELECT min(ps_supplycost) ...)` pattern
    over the tables this dataset has).

    Scale shape: the correlated subquery decorrelates into one
    (brand, supplier) partial agg, then a per-brand min via a window
    over brand — the agg shrinks the input to #brands x #suppliers
    rows BEFORE the window, so the window shuffle is tiny. Equality
    on min(price) is exact (comparison of stored values, no float
    summation). Dimension joins broadcast."""
    priced = (
        lineitem.join(F.broadcast(part.select("p_partkey", "p_brand")),
                      lineitem.l_partkey == F.col("p_partkey"))
        .groupBy("p_brand", "l_suppkey")
        .agg(F.min("l_extendedprice").alias("min_price"))
    )
    w = Window.partitionBy("p_brand")
    best = (
        priced.withColumn("brand_min", F.min("min_price").over(w))
        .filter(F.col("min_price") == F.col("brand_min"))
    )
    return (
        best.join(F.broadcast(supplier.select("s_suppkey", "s_name")),
                  best.l_suppkey == F.col("s_suppkey"))
        .select("p_brand", "s_suppkey", "s_name", "min_price")
    )


def small_quantity_revenue(
    lineitem: DataFrame, part: DataFrame, brand: str = "Brand#1"
) -> DataFrame:
    """TPC-H Q17-shape: average yearly revenue that would be lost by
    no longer filling small-quantity orders — lineitems with quantity
    below 20% of the part's average, for one brand.

    Scale shape: the correlated AVG decorrelates into a per-part agg
    joined back to lineitem (self-join on l_partkey, shuffles once;
    the per-part table is |parts|-sized so AQE broadcasts it at
    realistic selectivity). The threshold uses the multiply form
    (5 * qty * n < total) in exact DECIMAL — no quotient rounding, so
    the qualifying set is identical across engines; the final /7.0 is
    one IEEE division of a decimal-exact sum."""
    li = lineitem.join(
        F.broadcast(part.filter(F.col("p_brand") == brand).select("p_partkey")),
        lineitem.l_partkey == F.col("p_partkey"),
    )
    per_part = li.groupBy("l_partkey").agg(
        F.sum(F.col("l_quantity").cast("decimal(38,6)")).alias("__qty_total"),
        F.count(F.lit(1)).cast("decimal(12,0)").alias("__n"),
    ).withColumnRenamed("l_partkey", "__pk")
    joined = li.join(per_part, li.l_partkey == F.col("__pk"))
    small = joined.filter(
        F.lit(5) * F.col("l_quantity").cast("decimal(38,6)") * F.col("__n")
        < F.col("__qty_total")
    )
    return small.agg(
        (exact_sum("l_extendedprice") / F.lit(7.0)).alias("avg_yearly")
    )


def late_sole_suppliers(
    lineitem: DataFrame,
    orders: DataFrame,
    supplier: DataFrame,
    late_days: int = 90,
) -> DataFrame:
    """TPC-H Q21-shape EXISTS/NOT-EXISTS decorrelation: suppliers who
    were the ONLY late shipper on multi-supplier orders (late =
    shipped more than `late_days` after the order date), counted per
    supplier.

    Scale shape: Q21's two correlated subqueries (another supplier
    EXISTS, another LATE supplier NOT EXISTS) decorrelate into a
    TWO-LEVEL aggregation: first (l_orderkey, l_suppkey) grain with
    bool_or(is_late) — partial map-side agg, no Expand — then
    l_orderkey grain where n_supp/n_late_supp are plain count/sum
    over the already-distinct supplier rows. The previous single
    groupBy with two countDistinct() compiled to an Expand node that
    DOUBLED every lineitem row entering the first exchange (distinct
    aggs expand one copy per distinct-gid); the two-level form
    shuffles each (order, supplier) pair once, at most once per
    lineitem row and typically ~4x fewer after the map-side partial.
    Then a filter (n_supp > 1 AND n_late = 1) and a count per the
    unique late supplier."""
    li = lineitem.join(
        orders.select("o_orderkey", "o_orderdate"),
        lineitem.l_orderkey == F.col("o_orderkey"),
    ).withColumn(
        "is_late",
        F.col("l_shipdate") > F.date_add(F.col("o_orderdate"), late_days),
    )
    per_supp = li.groupBy("l_orderkey", "l_suppkey").agg(
        F.max(F.col("is_late")).alias("supp_late")
    )
    per_order = per_supp.groupBy("l_orderkey").agg(
        F.count(F.lit(1)).alias("n_supp"),
        F.sum(F.col("supp_late").cast("long")).alias("n_late_supp"),
        F.max(F.when(F.col("supp_late"), F.col("l_suppkey"))).alias(
            "late_supp"
        ),
    )
    sole = per_order.filter(
        (F.col("n_supp") > 1) & (F.col("n_late_supp") == 1)
    )
    return (
        sole.groupBy("late_supp")
        .agg(F.count(F.lit(1)).alias("numwait"))
        .join(F.broadcast(supplier.select("s_suppkey", "s_name")),
              F.col("late_supp") == F.col("s_suppkey"))
        .select("s_suppkey", "s_name", "numwait")
    )


def top_revenue_suppliers(
    lineitem: DataFrame,
    supplier: DataFrame,
    start: str = "1997-01-01",
    end: str = "1997-04-01",
) -> DataFrame:
    """TPC-H Q15-shape: supplier(s) with the maximum revenue in a
    quarter — the `revenue = (SELECT max(...) FROM view)` pattern.

    Scale shape: revenue per supplier is one partial agg over the
    date-pruned scan; the global max is a 1-row aggregate cross-joined
    (broadcast) back — no driver collect, no second scan of lineitem
    (Spark reuses the agg subtree via the self-referencing plan; the
    max side is |suppliers| rows). Revenue compares exactly: the
    DECIMAL sum is order-independent, so ties are engine-identical."""
    rev = (
        lineitem.filter(
            (F.col("l_shipdate") >= start) & (F.col("l_shipdate") < end)
        )
        .groupBy("l_suppkey")
        .agg(
            F.sum(
                (F.col("l_extendedprice") * (1 - F.col("l_discount")))
                .cast("decimal(38,6)")
            ).alias("__rev")
        )
    )
    mx = rev.agg(F.max("__rev").alias("__max_rev"))
    return (
        rev.join(F.broadcast(mx))
        .filter(F.col("__rev") == F.col("__max_rev"))
        .join(F.broadcast(supplier.select("s_suppkey", "s_name")),
              rev.l_suppkey == F.col("s_suppkey"))
        .select(
            "s_suppkey",
            "s_name",
            F.col("__rev").cast("double").alias("total_revenue"),
        )
    )


def volume_shipping(
    lineitem: DataFrame,
    orders: DataFrame,
    customer: DataFrame,
    supplier: DataFrame,
    nation: DataFrame,
    nation1: str = "NATION_1",
    nation2: str = "NATION_2",
    start: str = "1996-01-01",
    end: str = "1998-01-01",
) -> DataFrame:
    """TPC-H Q7-shape volume shipping: revenue between two nations by
    (supplier nation, customer nation, year), keeping only the two
    cross pairs (n1->n2, n2->n1).

    Scale shape: the nation-pair predicate is pushed BELOW the fact
    joins — supplier and customer are each pre-filtered to the two
    nations via a broadcast nation join, so the lineitem->supplier
    broadcast join prunes ~23/25 of fact rows before the orderkey
    shuffle, and the customer join arrives pre-reduced. The final
    disjunctive pair filter runs on the already-joined (tiny) result.
    Two fact shuffles total (orderkey, custkey), every dim broadcast.
    """
    n = nation.select("n_nationkey", "n_name").filter(
        F.col("n_name").isin(nation1, nation2)
    )
    supp = supplier.join(
        F.broadcast(n), supplier.s_nationkey == n.n_nationkey
    ).select("s_suppkey", F.col("n_name").alias("supp_nation"))
    cust = customer.join(
        F.broadcast(n), customer.c_nationkey == n.n_nationkey
    ).select("c_custkey", F.col("n_name").alias("cust_nation"))
    fact = (
        lineitem.filter(
            (F.col("l_shipdate") >= start) & (F.col("l_shipdate") < end)
        )
        .join(F.broadcast(supp), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(cust, F.col("o_custkey") == F.col("c_custkey"))
        .filter(
            (
                (F.col("supp_nation") == nation1)
                & (F.col("cust_nation") == nation2)
            )
            | (
                (F.col("supp_nation") == nation2)
                & (F.col("cust_nation") == nation1)
            )
        )
    )
    return (
        fact.groupBy(
            "supp_nation",
            "cust_nation",
            F.year("l_shipdate").alias("l_year"),
        )
        .agg(
            exact_sum(
                F.col("l_extendedprice") * (1 - F.col("l_discount"))
            ).alias("revenue")
        )
        .orderBy("supp_nation", "cust_nation", "l_year")
    )


def market_share(
    lineitem: DataFrame,
    orders: DataFrame,
    customer: DataFrame,
    part: DataFrame,
    supplier: DataFrame,
    nation: DataFrame,
    region: DataFrame,
    target_region: str = "EUROPE",
    part_type: str = "PROMO",
    target_nation: str = "NATION_3",
    start: str = "1996-01-01",
    end: str = "1998-01-01",
) -> DataFrame:
    """TPC-H Q8-shape market share: target nation's share of revenue
    per order-year, within one region's customers and one part type.

    Scale shape: the most selective filter (p_type) broadcasts into
    the lineitem scan first — fact rows drop to ~1/|types| before any
    shuffle. Customer limits to the region through two broadcast dim
    hops (nation->region), supplier tags rows with its nation via a
    broadcast join, and the share is a single conditional aggregation
    (sum(case)/sum), NOT two passes. Numerator/denominator accumulate
    as exact decimals; ONE IEEE division at the end is deterministic.
    """
    p = part.filter(F.col("p_type") == part_type).select("p_partkey")
    reg_nations = nation.join(
        F.broadcast(region.filter(F.col("r_name") == target_region)),
        nation.n_regionkey == region.r_regionkey,
    ).select("n_nationkey")
    cust = customer.join(
        F.broadcast(reg_nations),
        customer.c_nationkey == F.col("n_nationkey"),
    ).select("c_custkey")
    supp = supplier.join(
        F.broadcast(nation.select("n_nationkey", "n_name")),
        supplier.s_nationkey == F.col("n_nationkey"),
    ).select("s_suppkey", F.col("n_name").alias("supp_nation"))
    vol = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    fact = (
        lineitem.join(F.broadcast(p), F.col("l_partkey") == F.col("p_partkey"))
        .join(F.broadcast(supp), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(
            orders.filter(
                (F.col("o_orderdate") >= start) & (F.col("o_orderdate") < end)
            ),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .join(cust, F.col("o_custkey") == F.col("c_custkey"))
    )
    num = F.sum(
        F.when(F.col("supp_nation") == target_nation, vol)
        .otherwise(F.lit(0.0))
        .cast("decimal(38,6)")
    )
    den = F.sum(vol.cast("decimal(38,6)"))
    return (
        fact.groupBy(F.year("o_orderdate").alias("o_year"))
        .agg(
            (num.cast("double") / den.cast("double")).alias("mkt_share"),
            den.cast("double").alias("total_volume"),
        )
        .orderBy("o_year")
    )


def product_type_profit(
    lineitem: DataFrame,
    part: DataFrame,
    supplier: DataFrame,
    nation: DataFrame,
    part_type: str = "PROMO",
) -> DataFrame:
    """TPC-H Q9-shape product-type profit by (nation, year).

    The reduced schema has no partsupp/ps_supplycost, so cost is
    p_retailprice * l_quantity, and the year comes from l_shipdate
    (saves the orders join without changing the shape: selective dim
    filter -> broadcast into the fact -> derived profit expression ->
    two-key aggregation). One fact shuffle (the groupBy); part and
    supplier->nation are broadcast. Profit terms accumulate as exact
    decimals so engine summation order is irrelevant.
    """
    p = part.filter(F.col("p_type") == part_type).select(
        "p_partkey", "p_retailprice"
    )
    supp = supplier.join(
        F.broadcast(nation.select("n_nationkey", "n_name")),
        supplier.s_nationkey == F.col("n_nationkey"),
    ).select("s_suppkey", F.col("n_name").alias("nation"))
    profit = (
        F.col("l_extendedprice") * (1 - F.col("l_discount"))
        - F.col("p_retailprice") * F.col("l_quantity")
    )
    return (
        lineitem.join(F.broadcast(p), F.col("l_partkey") == F.col("p_partkey"))
        .join(F.broadcast(supp), F.col("l_suppkey") == F.col("s_suppkey"))
        .groupBy("nation", F.year("l_shipdate").alias("o_year"))
        .agg(exact_sum(profit).alias("sum_profit"))
        .orderBy("nation", F.col("o_year").desc())
    )


def late_shipment_priority(
    lineitem: DataFrame, orders: DataFrame, late_days: int = 90
) -> DataFrame:
    """TPC-H Q12-shape: conditional priority counts over late
    shipments (no l_shipmode/l_commitdate in the reduced schema, so
    'late' = shipped more than late_days after the order date, and the
    category axis is l_linestatus).

    Scale shape: the lateness predicate needs both sides, so it rides
    the orderkey join as a residual; the priority split is a single
    conditional aggregation (no second scan, no self-join). One fact
    shuffle for the join (orders projected to 3 columns first), one
    tiny shuffle for the 2-row groupBy.
    """
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        lineitem.select("l_orderkey", "l_linestatus", "l_shipdate")
        .join(
            orders.select("o_orderkey", "o_orderdate", "o_orderpriority"),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .filter(
            F.col("l_shipdate")
            > F.col("o_orderdate") + F.expr(f"INTERVAL {int(late_days)} DAYS")
        )
        .groupBy("l_linestatus")
        .agg(
            F.sum(high.cast("long")).alias("high_line_count"),
            F.sum((~high).cast("long")).alias("low_line_count"),
        )
        .orderBy("l_linestatus")
    )


def customer_order_distribution(
    customer: DataFrame,
    orders: DataFrame,
    exclude_priority: str = "5-LOW",
) -> DataFrame:
    """TPC-H Q13-shape customer order-count distribution: how many
    customers placed exactly k (qualifying) orders, INCLUDING k=0.

    The zero bucket forces a left outer join with the order filter
    INSIDE the join condition (filtering before a WHERE would drop
    order-less customers; filtering orders pre-join is equivalent and
    lets the predicate push to the orders scan — that is what this
    does). Two shuffles: per-customer count on custkey, then the
    k->count histogram on the (tiny, <= max-orders-per-customer row)
    count table.
    """
    qual = orders.filter(F.col("o_orderpriority") != exclude_priority).select(
        "o_custkey", "o_orderkey"
    )
    per_cust = (
        customer.select("c_custkey")
        .join(qual, F.col("c_custkey") == F.col("o_custkey"), "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return (
        per_cust.groupBy("c_count")
        .agg(F.count(F.lit(1)).alias("custdist"))
        .orderBy(F.col("custdist").desc(), F.col("c_count").desc())
    )


def disjunctive_discount_revenue(
    lineitem: DataFrame, part: DataFrame
) -> DataFrame:
    """TPC-H Q19-shape: revenue under an OR-of-ANDs predicate mixing
    part attributes (brand, size) with lineitem attributes (quantity).

    Scale shape: Catalyst cannot split a cross-table disjunction, so
    the table-local weakenings are added explicitly — the brand IN
    list prunes part before broadcast, and the derived l_quantity <=
    30 conjunct pushes to the lineitem parquet scan (the OR branches'
    quantity ranges all sit within [1, 30]). The exact disjunction
    then runs as the residual on the broadcast hash join. Zero
    shuffles beyond the final 1-row aggregate.
    """
    branch = (
        (
            (F.col("p_brand") == "Brand#12")
            & F.col("p_size").between(1, 5)
            & F.col("l_quantity").between(1, 11)
        )
        | (
            (F.col("p_brand") == "Brand#23")
            & F.col("p_size").between(1, 10)
            & F.col("l_quantity").between(10, 20)
        )
        | (
            (F.col("p_brand") == "Brand#34")
            & F.col("p_size").between(1, 15)
            & F.col("l_quantity").between(20, 30)
        )
    )
    p = part.filter(
        F.col("p_brand").isin("Brand#12", "Brand#23", "Brand#34")
        & F.col("p_size").between(1, 15)
    ).select("p_partkey", "p_brand", "p_size")
    return (
        lineitem.filter(F.col("l_quantity").between(1, 30))
        .join(F.broadcast(p), F.col("l_partkey") == F.col("p_partkey"))
        .filter(branch)
        .agg(
            exact_sum(
                F.col("l_extendedprice") * (1 - F.col("l_discount"))
            ).alias("revenue"),
            F.count(F.lit(1)).alias("n_items"),
        )
    )


def mergeable_rollup(
    events: DataFrame,
    keys: list[str],
    value_col: str = "value",
    ts_col: str = "ts",
) -> DataFrame:
    """Partial-aggregate state for incremental rollup maintenance:
    per key, (cnt, decimal-exact sum, min/max ts). Every column is a
    MERGEABLE aggregate — two states over disjoint row sets combine
    with merge_rollups into exactly the state a full recompute would
    produce (the sum is decimal, so merge order is irrelevant).

    This is the incremental-view-maintenance pattern at 100 TB: keep
    the state table, roll each new partition/day into it, never rescan
    history. (HLL/CMS/histogram sketch states from operators/sketch.py
    compose the same way for distinct/frequency/quantile rollups.)
    """
    return events.groupBy(*[F.col(k) for k in keys]).agg(
        F.count(F.lit(1)).alias("cnt"),
        F.sum(F.col(value_col).cast("decimal(38,6)")).alias("sum_v"),
        F.min(ts_col).alias("min_ts"),
        F.max(ts_col).alias("max_ts"),
    )


def merge_rollups(keys: list[str], *states: DataFrame) -> DataFrame:
    """Combine mergeable_rollup states (disjoint or not — states are
    partial aggregates, so re-aggregation is the merge). One shuffle
    over state-table rows (key cardinality, not event cardinality)."""
    if not states:
        raise ValueError("need at least one state")
    u = states[0]
    for s in states[1:]:
        u = u.unionByName(s)
    return u.groupBy(*[F.col(k) for k in keys]).agg(
        F.sum("cnt").alias("cnt"),
        F.sum("sum_v").alias("sum_v"),
        F.min("min_ts").alias("min_ts"),
        F.max("max_ts").alias("max_ts"),
    )


def robust_anomaly(
    events: DataFrame,
    value_col: str = "value",
    key_col: str = "user_id",
    min_n: int = 8,
) -> DataFrame:
    """Median/MAD robust z-scores per key: z = (x - median) /
    (MAD * 1.4826). The mean/std z-score (anomaly_zscore) is poisoned
    by the very outliers it hunts — one huge value inflates sigma and
    hides itself; median and MAD have a 50% breakdown point.

    Plan: TWO window passes over the SAME partitioning (median, then
    MAD of deviations) — one shuffle on the key total, no joins. The
    exact interpolated percentile matches DuckDB quantile_cont
    (the q_percentiles parity); at 100 TB swap in approx_percentile
    for the same plan shape with sketch state. NULL where the key has
    fewer than `min_n` events or MAD is 0 (a constant series has no
    scale to score against).
    """
    w = Window.partitionBy(key_col)
    med = F.expr(f"percentile({value_col}, 0.5)").over(w)
    staged = events.withColumn("__med", med).withColumn(
        "__dev", F.abs(F.col(value_col) - F.col("__med"))
    )
    mad = F.expr("percentile(__dev, 0.5)").over(w)
    n = F.count(F.lit(1)).over(w)
    staged = staged.withColumn("__mad", mad).withColumn("__n", n)
    z = F.round(
        (F.col(value_col) - F.col("__med"))
        / (F.col("__mad") * F.lit(1.4826)),
        6,
    )
    return staged.select(
        "event_id",
        key_col,
        value_col,
        F.when((F.col("__n") < min_n) | (F.col("__mad") <= 0), F.lit(None))
        .otherwise(z)
        .alias("robust_z"),
    )


def session_cooccurrence(
    events: DataFrame, gap_minutes: int = 30, min_sessions: int = 2
) -> DataFrame:
    """Market-basket co-occurrence over sessions: for every unordered
    pair of event types appearing in the SAME session, the number of
    distinct sessions containing both — the affinity signal behind
    "users who did A also did B" and feature-cross candidates.

    Shape: sessionize (lag+cumsum, one user shuffle), reduce to the
    DISTINCT (user, session, type) table — the fan-in guard: a type
    firing 500 times in one session contributes ONE row — then a
    self-join keyed on the session with type_a < type_b. Join fan-out
    is bounded by (distinct types per session)^2, which is capped by
    the type vocabulary, not by session length. `min_sessions` prunes
    the long tail before the result materializes.
    """
    sess = assign_sessions(events, gap_minutes=gap_minutes)
    st = sess.select("user_id", "session_seq", "event_type").distinct()
    # merge hint: the distinct (user, session, type) table is
    # corpus-sized — same static-misestimate broadcast hazard as the
    # dedup index self-joins (SCALE.md)
    a, b = st.alias("a"), st.hint("merge").alias("b")
    return (
        a.join(
            b,
            (F.col("a.user_id") == F.col("b.user_id"))
            & (F.col("a.session_seq") == F.col("b.session_seq"))
            & (F.col("a.event_type") < F.col("b.event_type")),
        )
        .groupBy(
            F.col("a.event_type").alias("type_a"),
            F.col("b.event_type").alias("type_b"),
        )
        .agg(F.count(F.lit(1)).alias("n_sessions"))
        .filter(F.col("n_sessions") >= min_sessions)
    )


def association_rules(
    baskets: DataFrame,
    basket_col: str,
    item_col: str,
    min_support: int = 10,
) -> DataFrame:
    """Market-basket association rules (Agrawal-style, pair grain):
    for every DIRECTED pair of items co-occurring in >= min_support
    baskets, support / confidence / lift — the affinity mining that
    session_cooccurrence stops short of (it emits co-counts;
    rules add direction and normalization, the ranking retailers and
    recommender feature-crosses actually use).

        confidence(a -> b) = n_both / n_ant
        lift(a, b)         = n_both * n_baskets / (n_ant * n_cons)

    Exact arithmetic: all counts are BIGINTs; lift_num / lift_den are
    exact integer products emitted as columns (same discipline as
    lm.collocation_lift), confidence and lift each ONE IEEE division.
    Bound: the long products are exact while n_both * n_baskets <
    2^63 (~3e9 baskets with a co-frequency near saturation) — beyond
    that Spark's non-ANSI multiply would WRAP, so `lift` itself is
    computed from double-cast factors (no wrap ever; exact below
    2^53, correctly rounded above) and lift_num/lift_den carry the
    documented bound.

    Shape at 100 TB: ONE exchange at basket grain builds the sorted
    distinct item set per basket (collect_set dedups map-side — the
    fan-in guard: an item bought 50 times in one order contributes
    one element), and the ordered pairs are generated ARRAY-SIDE
    (posexplode + slice, all codegen) — the former formulation
    sort-merge self-joined the distinct (basket, item) table with
    itself, which computed that corpus-grain distinct five times
    across the plan (two sorted join legs, two item-count broadcasts,
    the basket total) and shuffled it four. Fan-out per basket is
    (distinct items)^2, bounded by the item vocabulary, not basket
    length. The basket-grain frame is eagerly checkpointed so the
    pair, item-count and basket-total branches all read the one
    materialized exchange. min_support prunes at pair grain BEFORE
    the (vocabulary-grain) item-count joins; item counts and the
    basket total are broadcast (item grain and 1 row).

    Returns (antecedent, consequent, n_both, n_ant, n_cons,
    n_baskets, confidence, lift_num, lift_den, lift); each unordered
    co-occurring pair yields both directed rules.
    """
    base = (
        baskets.select(
            F.col(basket_col).alias("bk"), F.col(item_col).alias("item")
        )
        .groupBy("bk")
        .agg(F.sort_array(F.collect_set("item")).alias("xs"))
        .localCheckpoint(eager=True)
    )
    # count("bk") skips the one possible NULL-basket group row —
    # exactly the old countDistinct("bk") semantics
    n_baskets = base.agg(F.count("bk").alias("n_baskets"))
    # per-item distinct-basket counts: one row per (basket, item) as
    # before (a NULL basket still contributes to its items' counts)
    item_cnt = (
        base.select(F.explode("xs").alias("item"))
        .groupBy("item")
        .agg(F.count(F.lit(1)).alias("n_item"))
    )
    # a NULL basket key never matched itself in the old self-join, so
    # it must not emit pairs here either
    pair_cnt = (
        base.where(F.col("bk").isNotNull())
        .select(F.posexplode("xs").alias("i", "item_a"), "xs")
        .select(
            "item_a",
            F.explode(
                F.slice("xs", F.col("i") + F.lit(2), F.size("xs"))
            ).alias("item_b"),
        )
        .groupBy("item_a", "item_b")
        .agg(F.count(F.lit(1)).alias("n_both"))
        .filter(F.col("n_both") >= min_support)
    )
    ca = F.broadcast(
        item_cnt.select(
            F.col("item").alias("item_a"), F.col("n_item").alias("n_a")
        )
    )
    cb = F.broadcast(
        item_cnt.select(
            F.col("item").alias("item_b"), F.col("n_item").alias("n_b")
        )
    )
    joined = (
        pair_cnt.join(ca, "item_a")
        .join(cb, "item_b")
        .join(F.broadcast(n_baskets))
    )
    # each unordered pair emits both directed rules in one explode —
    # no second self-join pass
    rules = joined.select(
        F.explode(
            F.array(
                F.struct(
                    F.col("item_a").alias("antecedent"),
                    F.col("item_b").alias("consequent"),
                    F.col("n_a").alias("n_ant"),
                    F.col("n_b").alias("n_cons"),
                ),
                F.struct(
                    F.col("item_b").alias("antecedent"),
                    F.col("item_a").alias("consequent"),
                    F.col("n_b").alias("n_ant"),
                    F.col("n_a").alias("n_cons"),
                ),
            )
        ).alias("r"),
        "n_both",
        "n_baskets",
    )
    # every factor below is a count <= n_baskets, so both integer
    # products are <= n_baskets^2; guarding n_baskets <= floor(sqrt(
    # 2^63-1)) once makes BIGINT wrap impossible instead of silent
    # (non-ANSI Spark wraps long*long). raise_error is per-row but the
    # branch is a broadcast scalar comparison — free in codegen.
    def _wrap_guard(prod: F.Column) -> F.Column:
        return F.when(
            F.col("n_baskets") <= F.lit(3_037_000_499), prod
        ).otherwise(
            F.raise_error(
                F.lit(
                    "association_rules: n_baskets exceeds 3037000499; "
                    "lift_num/lift_den would overflow BIGINT — aggregate "
                    "lift in DECIMAL or pre-bucket baskets"
                )
            ).cast("long")
        )

    return rules.select(
        F.col("r.antecedent").alias("antecedent"),
        F.col("r.consequent").alias("consequent"),
        "n_both",
        F.col("r.n_ant").alias("n_ant"),
        F.col("r.n_cons").alias("n_cons"),
        "n_baskets",
        F.round(F.col("n_both") / F.col("r.n_ant"), 6).alias("confidence"),
        _wrap_guard(F.col("n_both") * F.col("n_baskets")).alias("lift_num"),
        _wrap_guard(F.col("r.n_ant") * F.col("r.n_cons")).alias("lift_den"),
        F.round(
            (F.col("n_both").cast("double") * F.col("n_baskets"))
            / (F.col("r.n_ant").cast("double") * F.col("r.n_cons")),
            6,
        ).alias("lift"),
    )


def seasonality_profile(events: DataFrame) -> DataFrame:
    """Load profile per event type: (day-of-week, hour-of-day) counts
    and exact value sums — the seasonal baseline behind capacity
    planning and "is this drop a failure or a Sunday" triage. One
    partial-agg shuffle to at most |types| * 168 rows."""
    return (
        events.groupBy(
            "event_type",
            F.dayofweek("ts").alias("dow"),
            F.hour("ts").alias("hod"),
        )
        .agg(
            F.count(F.lit(1)).alias("n"),
            exact_sum("value").alias("total_value"),
        )
    )


def winsorize(
    events: DataFrame,
    value_col: str = "value",
    group_col: str = "event_type",
    lo_q: float = 0.01,
    hi_q: float = 0.99,
) -> DataFrame:
    """Per-group winsorization: clip values to the group's [lo_q,
    hi_q] exact percentiles — the standard outlier-taming step before
    training on heavy-tailed features (clipping preserves row count,
    unlike filtering, so downstream joins stay intact).

    One window pass per group (percentiles over the group partition,
    same single shuffle), clip as a map expression. At 100 TB swap
    percentile -> approx_percentile: same plan, sketch state."""
    w = Window.partitionBy(group_col)
    lo = F.expr(f"percentile({value_col}, {lo_q})").over(w)
    hi = F.expr(f"percentile({value_col}, {hi_q})").over(w)
    staged = events.withColumn("__lo", lo).withColumn("__hi", hi)
    clipped = F.least(F.greatest(F.col(value_col), F.col("__lo")), F.col("__hi"))
    return staged.select(
        "event_id",
        group_col,
        F.col(value_col).alias("raw_value"),
        F.round(clipped, 6).alias("clipped_value"),
        (F.col(value_col) != clipped).alias("was_clipped"),
    )


def touch_attribution(
    events: DataFrame,
    conversion_type: str = "purchase",
    touch_types: tuple = ("click", "view"),
) -> DataFrame:
    """First-/last-touch attribution: for every conversion event, the
    first and the most recent touchpoint event type that preceded it
    for the same user. One user-keyed window pass (ignore-nulls
    first/last over the preceding frame) — never a self-join per
    conversion, which is the O(conversions x history) trap.

    Output: one row per conversion (event_id, user_id, ts,
    first_touch, last_touch); NULLs when the user converted with no
    prior touchpoint (organic)."""
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    touch = F.when(
        F.col("event_type").isin(*touch_types), F.col("event_type")
    )
    staged = events.withColumn(
        "first_touch", F.first(touch, ignorenulls=True).over(w)
    ).withColumn("last_touch", F.last(touch, ignorenulls=True).over(w))
    return staged.filter(F.col("event_type") == conversion_type).select(
        "event_id", "user_id", "ts", "first_touch", "last_touch"
    )


def seasonal_naive_error(
    events: DataFrame, season_hours: int = 168
) -> DataFrame:
    """Seasonal-naive forecast baseline: predict each (type, hour)'s
    event count with the count one season earlier (default 168 h = a
    week), and report per-type absolute-error totals — the baseline
    every real forecasting model must beat, and a drift alarm on its
    own (error jumps when the seasonal pattern breaks).

    Plan: ONE hourly rollup (partial agg), then a self-join of the
    tiny rollup table on the shifted hour — the join runs over
    |types| * |hours| metadata rows, never events. Errors are exact
    integer sums; only n_hours with no prior-season observation are
    excluded (not zero-filled: absence of data is not a zero
    forecast).
    """
    hourly = events.groupBy(
        "event_type", F.date_trunc("hour", F.col("ts")).alias("h")
    ).agg(F.count(F.lit(1)).alias("n"))
    cur = hourly.alias("cur")
    prev = hourly.select(
        F.col("event_type").alias("p_type"),
        (F.col("h") + F.expr(f"INTERVAL {int(season_hours)} HOURS")).alias(
            "p_h"
        ),
        F.col("n").alias("forecast"),
    )
    j = cur.join(
        prev,
        (F.col("cur.event_type") == F.col("p_type"))
        & (F.col("cur.h") == F.col("p_h")),
    )
    err = F.abs(F.col("cur.n") - F.col("forecast"))
    return (
        j.groupBy(F.col("cur.event_type").alias("event_type"))
        .agg(
            F.count(F.lit(1)).alias("n_hours"),
            F.sum(err).alias("total_abs_err"),
            F.max(err).alias("max_abs_err"),
        )
    )


def deletion_plan(
    events: DataFrame,
    subject_ids: DataFrame,
    id_col: str = "user_id",
    part_col: str = "ts",
) -> DataFrame:
    """Right-to-erasure planning: per day-partition, how many rows
    belong to the deletion subjects vs survive — the rewrite worklist
    a GDPR/CCPA purge job executes (only partitions with hits are
    rewritten; the rest are untouched, which at 100 TB is the entire
    point of planning before deleting).

    The subject list is request-sized -> broadcast; ONE conditional
    aggregation per partition (no second scan for survivors, no
    per-subject jobs). Output: (part, n_delete, n_keep, rewrite)."""
    subj = F.broadcast(
        subject_ids.select(F.col(id_col).alias("__subj")).distinct()
    )
    j = events.join(subj, events[id_col] == F.col("__subj"), "left")
    hit = F.col("__subj").isNotNull()
    return (
        j.groupBy(F.to_date(part_col).cast("string").alias("part"))
        .agg(
            F.sum(hit.cast("long")).alias("n_delete"),
            F.sum((~hit).cast("long")).alias("n_keep"),
        )
        .withColumn("rewrite", F.col("n_delete") > 0)
    )


def ts_pattern_topk(
    events: DataFrame,
    pattern: list[float],
    k_top: int = 10,
    key_col: str = "user_id",
    ts_col: str = "ts",
    value_col: str = "value",
    id_col: str = "event_id",
) -> DataFrame:
    """Time-series similarity search: the k sliding windows (length =
    len(pattern)) of each key's time-ordered value series closest to
    the z-normalized query pattern (UCR-suite-style subsequence
    matching, the EDBT'19 distributed-streams shape).

    Determinism discipline: every float step is a FIXED sequential
    chain per window — ordered folds for sums (the cosine/_dot
    precedent: DuckDB's list arithmetic is sequential too), explicit
    centered-sum-of-squares variance (never the algebraically-equal
    but bit-different E[x^2]-mean^2), one sqrt, squared z-distance,
    round(6) before ranking with (key, window_start) tie-breaks.

    Plan: ONE groupBy(key) builds the ordered series array (per-key
    series must be bounded — a day/session of events; for unbounded
    streams compose with session/window slicing first), then windows
    explode map-side and a single top-k window ranks matches. Flat
    (zero-variance) windows cannot be z-normed and are skipped.
    """
    m = len(pattern)
    if m < 2:
        raise ValueError("pattern needs >= 2 points")
    pm = sum(pattern) / m
    pvar = sum((x - pm) ** 2 for x in pattern) / m
    if pvar == 0:
        raise ValueError("pattern is flat (zero variance)")
    psd = pvar**0.5
    pz = [(x - pm) / psd for x in pattern]

    def _fold_sum(arr: Column) -> Column:
        return F.aggregate(
            arr, F.lit(0.0), lambda acc, x: acc + x.cast("double")
        )

    series = (
        events.select(
            F.col(key_col).alias("key"),
            F.struct(
                F.col(ts_col).alias("ts"),
                F.col(id_col).alias("eid"),
                F.col(value_col).cast("double").alias("v"),
            ).alias("s"),
        )
        .groupBy("key")
        .agg(F.array_sort(F.collect_list("s")).alias("ss"))
        .select(
            "key",
            F.transform(F.col("ss"), lambda s: s["v"]).alias("vs"),
        )
    )
    n = F.size(F.col("vs"))
    wins = series.select(
        "key",
        F.explode(
            F.transform(
                F.sequence(F.lit(1), F.greatest(n - m + 1, F.lit(0))),
                lambda i: F.struct(
                    i.alias("start"),
                    F.slice(F.col("vs"), i, m).alias("w"),
                ),
            )
        ).alias("win"),
    ).select("key", F.col("win.start").alias("start"), F.col("win.w").alias("w"))

    mean = _fold_sum(F.col("w")) / m
    centered = F.transform(F.col("w"), lambda x: x.cast("double") - F.col("__mean"))
    staged = wins.withColumn("__mean", mean).withColumn("c", centered)
    s2 = _fold_sum(F.transform(F.col("c"), lambda x: x * x))
    staged = staged.withColumn("__sd", F.sqrt(s2 / m)).filter(
        F.col("__sd") > 0
    )
    pz_arr = double_array(pz)
    diff = F.zip_with(
        F.col("c"), pz_arr, lambda c, p: c / F.col("__sd") - p
    )
    dist2 = _fold_sum(F.transform(diff, lambda d: d * d))
    scored = staged.select(
        "key", "start", F.round(dist2, 6).alias("dist2")
    )
    # two-stage top-k: a global ORDER BY window is a one-task sort
    # over every window (banned here as everywhere in this repo) —
    # prune to k_top per key on the partitioned window first, then
    # rank the k_top * |keys| survivors (metadata-sized)
    w_key = Window.partitionBy("key").orderBy(
        F.col("dist2").asc(), F.col("start").asc()
    )
    pruned = (
        scored.withColumn("__kr", F.row_number().over(w_key))
        .filter(F.col("__kr") <= k_top)
        .drop("__kr")
    )
    from geist_spark.operators.bucketing import nonfoldable_zero

    # rank the metadata-sized survivors under a non-foldable constant
    # partition key (see bucketing.nonfoldable_zero)
    w_rank = Window.partitionBy(nonfoldable_zero("key")).orderBy(
        F.col("dist2").asc(), F.col("key").asc(), F.col("start").asc()
    )
    return (
        pruned.withColumn("rank", F.row_number().over(w_rank))
        .filter(F.col("rank") <= k_top)
        .select("rank", "key", "start", "dist2")
    )


def late_arrival_profile(
    events: DataFrame,
    batch_size: int = 1000,
    id_col: str = "event_id",
    ts_col: str = "ts",
) -> DataFrame:
    """Out-of-orderness profile for WATERMARK tuning: how far behind
    already-arrived data does each event's event-time fall? The
    number every streaming deployment needs before choosing
    `withWatermark` — too tight drops real events, too loose holds
    state forever; this measures the actual lateness distribution so
    the delay is chosen from data, not folklore.

    Arrival order is proxied by the monotone ingest id: events are
    cut into arrival batches (id div batch_size), lateness = the max
    event-time over all PRECEDING batches minus the event's time
    (clamped at 0; batch-granular, so it UNDERSTATES within-batch
    inversions by design — a coarser, conservative watermark signal).

    Scale shape: per-batch max is one partial-agg shuffle down to
    n/batch_size rows; the running max is an unpartitioned window
    over that BATCH-GRAIN table (metadata-sized by construction —
    10k rows for 100 TB at batch_size=10M; the same documented
    metadata-grain-global-window waiver as rake's final rank), then a
    broadcast join back and a map-side bucket classify + one
    histogram agg. The corpus itself is never sorted.

    Returns (lateness_bucket, n_events, max_lateness_us) — exact
    integers, buckets: on_time, lt_1m, lt_10m, lt_1h, lt_1d, ge_1d.
    """
    b = (F.col(id_col) / F.lit(batch_size)).cast("long").alias("__b")
    ev = events.select(
        b,
        # cast: parquet NTZ timestamps reject unix_micros directly
        F.unix_micros(F.col(ts_col).cast("timestamp")).alias("__ts_us"),
    )
    per_batch = ev.groupBy("__b").agg(F.max("__ts_us").alias("__bmax"))
    w = Window.orderBy("__b").rowsBetween(
        Window.unboundedPreceding, -1
    )
    prev = per_batch.select(
        "__b", F.max("__bmax").over(w).alias("__prev_max")
    )
    late_us = F.greatest(
        F.coalesce(F.col("__prev_max") - F.col("__ts_us"), F.lit(0)),
        F.lit(0),
    )
    m = 60_000_000
    bucket = (
        F.when(late_us <= 0, "on_time")
        .when(late_us < 1 * m, "lt_1m")
        .when(late_us < 10 * m, "lt_10m")
        .when(late_us < 60 * m, "lt_1h")
        .when(late_us < 24 * 60 * m, "lt_1d")
        .otherwise("ge_1d")
    )
    return (
        ev.join(F.broadcast(prev), "__b")
        .select(bucket.alias("lateness_bucket"), late_us.alias("__l"))
        .groupBy("lateness_bucket")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.max("__l").alias("max_lateness_us"),
        )
    )
