"""Analytics sections of the spec dialect: deduplicate + aggregate.

The reference defers aggregation/dedup to Spark ("that is better
handled in products such as Spark", reference README.md:21,564); these
compile the declarative spec sections onto Spark's native operators so
a stream spec can carry them as pipeline steps after the extract
transform:

- deduplicate -> dropDuplicates / dropDuplicatesWithinWatermark
  (streaming state-bounded dedup; withinWatermark requires an
  event-time watermark and keeps state only inside the delay)
- aggregate   -> groupBy(window(...), keys).agg(...) with optional
  event-time watermark. Works identically on batch DataFrames (window
  is an ordinary expression there) and streaming DataFrames (windowed
  stateful agg with late-data handling).

Scale notes: aggregations are hash-based with map-side partial
aggregation (Catalyst does this for all fns here), so the shuffle
carries partial states, not raw rows. count_distinct is the one
exception (exact distinct shuffles values) — approx_count_distinct is
the 100 TB path and is exposed alongside.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

from geist_spark.spec.model import (
    AggregateSpec,
    DeduplicateSpec,
    JoinSpec,
    SpecError,
    TransformSpec,
    WindowSpec,
)

def exact_sum(c: Column) -> Column:
    """Sum via decimal(38,6): exact and summation-order-independent, so
    fractional aggregates hash identically across engines and partition
    layouts (round(sum(double)) flips at .xx5 boundaries when partial
    aggregation order differs). Values truncate beyond 6 decimal
    places — sub-microunit precision, well under float noise."""
    return F.sum(c.cast("decimal(38,6)")).cast("double")


_AGG_BUILDERS = {
    "count": lambda c: F.count(F.lit(1)),
    "sum": F.sum,
    "avg": F.avg,
    "min": F.min,
    "max": F.max,
    "count_distinct": lambda c: F.count_distinct(c),
    "approx_count_distinct": lambda c: F.approx_count_distinct(c),
    "collect_set": lambda c: F.array_sort(F.collect_set(c)),
    "first": lambda c: F.first(c, ignorenulls=True),
    "last": lambda c: F.last(c, ignorenulls=True),
    # mergeable HLL sketch (binary column): persist per-cell sketches,
    # roll up later with hll_union_agg/hll_sketch_estimate (see
    # operators/sketch.py) — the pre-aggregated distinct-count cube
    "hll_sketch": lambda c: F.hll_sketch_agg(c),
    "hll_estimate": lambda c: F.hll_sketch_estimate(F.hll_sketch_agg(c)),
}


def apply_join(
    df: DataFrame, spec: JoinSpec, right_df: DataFrame | None = None
) -> DataFrame:
    """Enrichment join.

    Stream-static (`table_path`): the static side is re-read per
    micro-batch by Spark (picking up dimension updates); broadcast by
    default so the stream side never shuffles.

    Stream-stream (`stream`, right_df supplied by the runner): both
    sides watermarked, equality keys + event-time bound. State per
    side is bounded by watermark delay + bound span; the join shuffles
    both streams on the equality keys (Spark's stream-stream hash
    join) — the scalable shape as long as keys aren't pathologically
    hot."""
    if spec.stream is not None:
        if right_df is None:
            from geist_spark.spec.model import SpecError

            raise SpecError(
                "stream-stream join requires streaming mode "
                "(start_streaming); the batch publish path has no right stream"
            )
        right = right_df
        if df.isStreaming and spec.watermark_field:
            df = df.withWatermark(spec.watermark_field, spec.watermark_delay)
        wm = spec.stream.get("watermark") or {}
        if right.isStreaming and wm:
            right = right.withWatermark(wm["field"], wm["delay"])
        cond = None
        for left_f, right_f in spec.on:
            c = df[left_f] == right[right_f]
            cond = c if cond is None else cond & c
        tb = spec.time_bound
        if tb:
            lo = right[tb["rightField"]] + F.expr(f"INTERVAL {tb['lower']}")
            hi = right[tb["rightField"]] + F.expr(f"INTERVAL {tb['upper']}")
            cond = cond & (df[tb["leftField"]] >= lo) & (df[tb["leftField"]] <= hi)
        how = {"semi": "left_semi", "anti": "left_anti"}.get(spec.how, spec.how)
        joined = df.join(right, cond, how)
        if spec.how in ("semi", "anti"):
            return joined  # filter semantics: left columns pass through
        out_cols = [df[c] for c in df.columns]
        out_cols.extend(right[f].alias(a) for f, a in spec.select)
        return joined.select(*out_cols)

    spark = df.sparkSession
    dim = spark.read.parquet(spec.table_path)
    if spec.select or spec.how in ("semi", "anti"):
        right_keys = [r for _, r in spec.on]
        dim = dim.select(*right_keys, *[f for f, _ in spec.select])
    if spec.broadcast:
        dim = F.broadcast(dim)
    cond = None
    for left, right in spec.on:
        c = df[left] == dim[right]
        cond = c if cond is None else cond & c
    how = {"semi": "left_semi", "anti": "left_anti"}.get(spec.how, spec.how)
    joined = df.join(dim, cond, how)
    if spec.how in ("semi", "anti"):
        return joined  # filter semantics: left columns pass through
    out_cols = [df[c] for c in df.columns]
    out_cols.extend(dim[f].alias(a) for f, a in spec.select)
    return joined.select(*out_cols)


def apply_deduplicate(df: DataFrame, spec: DeduplicateSpec) -> DataFrame:
    if spec.within_watermark and df.isStreaming:
        df = df.withWatermark(spec.watermark_field, spec.watermark_delay)
        return df.dropDuplicatesWithinWatermark(spec.fields)
    return df.dropDuplicates(spec.fields)


def apply_aggregate(df: DataFrame, spec: AggregateSpec) -> DataFrame:
    if spec.watermark_field and df.isStreaming:
        df = df.withWatermark(spec.watermark_field, spec.watermark_delay)

    keys: list[Column] = []
    if spec.window_gap:
        # gap-based session window: native Spark operator, streaming-
        # capable (with watermark) and an ordinary grouping expression
        # in batch. State per open session only — the scalable
        # sessionization path at 100 TB (vs global sort approaches).
        keys.append(F.session_window(spec.window_field, spec.window_gap))
    elif spec.window_field:
        if spec.window_slide:
            keys.append(
                F.window(spec.window_field, spec.window_duration, spec.window_slide)
            )
        else:
            keys.append(F.window(spec.window_field, spec.window_duration))
    keys.extend(F.col(k) for k in spec.group_by)

    fractional = {
        f.name
        for f in df.schema.fields
        if f.dataType.typeName() in ("double", "float")
    }
    aggs = []
    for a in spec.aggregations:
        col = F.col(a.field) if a.field else None
        if a.fn in ("sum", "avg") and a.field in fractional:
            # float inputs: decimal-exact sum so the result is
            # independent of partial-aggregation order (integer sums
            # are exact already and keep their integer type)
            s = exact_sum(col)
            expr = s if a.fn == "sum" else s / F.count(F.lit(1))
        else:
            expr = _AGG_BUILDERS[a.fn](col)
        aggs.append(expr.alias(a.alias))
    return df.groupBy(*keys).agg(*aggs)


def apply_window(df: DataFrame, spec: WindowSpec) -> DataFrame:
    """Analytic window section: ranking / offset / running-total
    functions per partition key, plus the optional keepTopN filter
    (the declarative form of top-N-per-key).

    Scale shape: ONE shuffle on partitionBy + a partition-local sort —
    the spec validator refuses empty partitionBy precisely because a
    global analytic window serializes onto one task. running_sum over
    float inputs accumulates in decimal (prefix sums replay the same
    in any engine; float running totals would drift with frame order).
    Batch / micro-batch only: Spark has no incremental analytic-window
    operator for unbounded streams — use aggregate/session sections
    there.
    """
    from pyspark.sql import Window as W

    if df.isStreaming:
        raise SpecError(
            "transform.window requires batch execution (analytic "
            "windows are unsupported on unbounded streams); use "
            "aggregate windows or run it inside a batch sink stage"
        )
    order = [
        F.col(f).desc() if desc else F.col(f).asc()
        for f, desc in spec.order_by
    ]
    w = W.partitionBy(*[F.col(c) for c in spec.partition_by]).orderBy(*order)
    w_run = w.rowsBetween(W.unboundedPreceding, W.currentRow)
    fractional = {
        f.name
        for f in df.schema.fields
        if f.dataType.typeName() in ("double", "float")
    }
    out = df
    for fn in spec.functions:
        c = F.col(fn.field) if fn.field else None
        if fn.fn == "row_number":
            expr = F.row_number().over(w)
        elif fn.fn == "rank":
            expr = F.rank().over(w)
        elif fn.fn == "dense_rank":
            expr = F.dense_rank().over(w)
        elif fn.fn == "ntile":
            expr = F.ntile(fn.n).over(w)
        elif fn.fn == "lag":
            expr = F.lag(c, fn.offset).over(w)
        elif fn.fn == "lead":
            expr = F.lead(c, fn.offset).over(w)
        elif fn.fn == "running_count":
            expr = F.count(F.lit(1)).over(w_run)
        else:  # running_sum (validated)
            if fn.field in fractional:
                expr = (
                    F.sum(c.cast("decimal(38,6)")).over(w_run).cast("double")
                )
            else:
                expr = F.sum(c).over(w_run)
        out = out.withColumn(fn.alias, expr)
    if spec.keep_top_n:
        out = out.withColumn("__rn", F.row_number().over(w)).filter(
            F.col("__rn") <= spec.keep_top_n
        ).drop("__rn")
    return out


def apply_sql(df: DataFrame, sql: str) -> DataFrame:
    """Full-Spark-SQL escape hatch: run `sql` with __stream__ bound to
    the pipeline output. Works on batch and streaming DataFrames
    (views over streaming DFs are streaming views); Catalyst plans the
    statement like any native query."""
    import uuid

    name = f"geist_sql_{uuid.uuid4().hex}"
    df.createOrReplaceTempView(name)
    return df.sparkSession.sql(sql.replace("__stream__", name))


def apply_analytics(
    df: DataFrame, t: TransformSpec, join_right_df: DataFrame | None = None
) -> DataFrame:
    """Pipeline order: enrich (join) -> dedup -> aggregate -> window
    -> sql, so aggregates see unique, enriched events (mirroring
    insertId-dedup-then-load in the reference's sinks) and analytic
    windows run over the aggregated grain when both are present."""
    if t.join is not None:
        df = apply_join(df, t.join, right_df=join_right_df)
    if t.deduplicate is not None:
        df = apply_deduplicate(df, t.deduplicate)
    if t.aggregate is not None:
        df = apply_aggregate(df, t.aggregate)
    if t.window is not None:
        df = apply_window(df, t.window)
    if t.sql:
        df = apply_sql(df, t.sql)
    return df


def has_analytics(t: TransformSpec) -> bool:
    return (
        t.join is not None
        or t.deduplicate is not None
        or t.aggregate is not None
        or t.window is not None
        or bool(t.sql)
    )
