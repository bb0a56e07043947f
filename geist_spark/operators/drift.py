"""Distribution-drift monitoring between dataset snapshots/splits.

Training pipelines re-ingest continuously; the question "did this
week's data shift?" must be answerable without a full-table diff.
This module compares a reference and a current dataset on a numeric
column via fixed-range histograms (same deterministic binning contract
as sketch.hist_rollup / bucketing.linear_bin) and emits:

- per-bin counts + fractions for both sides (the evidence), and
- summary statistics: total-variation distance
  (TVD = sum(|p_i - q_i|)/2) and the chi-square statistic against the
  reference distribution — both pure arithmetic, no logarithms, so
  results are deterministic and replayable exactly in SQL oracles
  (PSI/KL need ln(), whose libm rounding differs across engines; TVD
  and chi2 carry the same monitoring signal without that hazard).

Scale shape: each side is ONE scan -> bin map expression -> one
aggregation down to <= 2^bits rows; everything after runs on that
tiny bin table (full-outer join on bin id, window totals). No
cartesian products, no second scan of either input.

Summation over bins is decimal-exact (cast before sum) so the
reported statistics are independent of aggregation order.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

from geist_spark.operators.bucketing import linear_bin


def _joined_bins(
    ref: DataFrame, cur: DataFrame, col: str, lo: float, hi: float, bits: int
) -> DataFrame:
    """(bin, ref_n, cur_n, __rt, __ct): aligned bin counts plus window
    totals.

    Both sides are tagged and UNIONED, then ONE conditional
    aggregation on bin produces the aligned counts — a full-outer join
    of the two bin tables would plan as a sort-merge join (full outer
    can't broadcast); the union+group form is a single shuffle on bin
    and bin alignment is free. The window totals run over the
    <=2^bits-row bin table, not the inputs."""

    def side(df: DataFrame, is_ref: int) -> DataFrame:
        return df.filter(F.col(col).isNotNull()).select(
            linear_bin(F.col(col), lo, hi, bits).alias("bin"),
            F.lit(is_ref).alias("__is_ref"),
        )

    w = Window.partitionBy()
    return (
        side(ref, 1)
        .unionByName(side(cur, 0))
        .groupBy("bin")
        .agg(
            F.sum("__is_ref").alias("ref_n"),
            F.sum(F.lit(1) - F.col("__is_ref")).alias("cur_n"),
        )
        .withColumn("__rt", F.sum("ref_n").over(w))
        .withColumn("__ct", F.sum("cur_n").over(w))
    )


def histogram_compare(
    ref: DataFrame,
    cur: DataFrame,
    col: str,
    lo: float,
    hi: float,
    bits: int = 5,
) -> DataFrame:
    """Per-bin comparison table: (bin, ref_n, cur_n, ref_frac,
    cur_frac). Bins with no mass on either side are omitted (they
    contribute nothing to TVD/chi2). Fractions are single IEEE
    divisions of exact longs."""
    return _joined_bins(ref, cur, col, lo, hi, bits).select(
        "bin",
        "ref_n",
        "cur_n",
        (F.col("ref_n").cast("double") / F.col("__rt").cast("double")).alias(
            "ref_frac"
        ),
        (F.col("cur_n").cast("double") / F.col("__ct").cast("double")).alias(
            "cur_frac"
        ),
    )


def drift_stats(
    ref: DataFrame,
    cur: DataFrame,
    col: str,
    lo: float,
    hi: float,
    bits: int = 5,
) -> DataFrame:
    """One-row drift summary: (n_ref, n_cur, n_bins, tvd, chi2).

    chi2 = sum over bins with ref mass of (cur_n - E)^2 / E where
    E = ref_frac * n_cur (bins with cur mass but zero ref mass are
    excluded from chi2 — the standard guard — but still count in TVD).
    Per-bin summands are cast to decimal(38,12) before summation:
    exact, order-independent totals."""
    j = _joined_bins(ref, cur, col, lo, hi, bits)
    ref_frac = F.col("ref_n").cast("double") / F.col("__rt").cast("double")
    cur_frac = F.col("cur_n").cast("double") / F.col("__ct").cast("double")
    tvd_term = F.abs(ref_frac - cur_frac)
    expected = ref_frac * F.col("__ct").cast("double")
    chi_term = F.when(
        F.col("ref_n") > 0,
        (F.col("cur_n").cast("double") - expected)
        * (F.col("cur_n").cast("double") - expected)
        / expected,
    ).otherwise(F.lit(0.0))
    return j.agg(
        F.max("__rt").cast("long").alias("n_ref"),
        F.max("__ct").cast("long").alias("n_cur"),
        F.count(F.lit(1)).cast("long").alias("n_bins"),
        (
            F.sum(tvd_term.cast("decimal(38,12)")).cast("double") / F.lit(2.0)
        ).alias("tvd"),
        F.sum(chi_term.cast("decimal(38,12)")).cast("double").alias("chi2"),
    )


def cusum_alarms(
    events: DataFrame,
    key_col: str = "user_id",
    value_col: str = "value",
    ts_col: str = "ts",
    slack: float = 0.5,
    threshold: float = 5.0,
) -> DataFrame:
    """Per-key CUSUM change-point detection: the classic one-sided
    recurrences

        hi_t = max(0, hi_{t-1} + (x_t - mean - slack))
        lo_t = max(0, lo_{t-1} - (x_t - mean + slack))

    with an alarm (and reset) whenever either side crosses
    `threshold`. Catches small persistent level shifts that per-point
    z-scores (anomaly_zscore / robust_anomaly) never flag.

    A max-recurrence is NOT a window sum, so it cannot be a plain
    window function; it runs as a sequential fold over each key's
    time-ordered value array INSIDE codegen (F.aggregate — the same
    pattern as the Gopher run-length pass), after one groupBy(key)
    with a deterministic (ts, event_id) sort. State per key is the
    event list: bounded by events-per-key, the same bound
    sessionization already carries; the fold order is pinned by the
    sort, so results are exact IEEE chains — engine-replayable.

    Output per key: n_events, mean (exact-sum/count), n_alarms,
    max_cusum (the peak of either side between alarms).
    """
    from geist_spark.operators.relational import exact_sum

    per_key = events.groupBy(key_col).agg(
        F.sort_array(
            F.collect_list(
                F.struct(F.col(ts_col), F.col("event_id"), F.col(value_col))
            )
        ).alias("__evs"),
        (exact_sum(value_col) / F.count(F.lit(1))).alias("mean"),
        F.count(F.lit(1)).alias("n_events"),
    )
    vals = F.transform(F.col("__evs"), lambda s: s.getField(value_col))
    state0 = F.struct(
        F.lit(0.0).alias("hi"),
        F.lit(0.0).alias("lo"),
        F.lit(0).cast("long").alias("alarms"),
        F.lit(0.0).alias("peak"),
    )
    mean = F.col("mean")

    def step(s, x):
        hi = F.greatest(F.lit(0.0), s.hi + (x - mean - F.lit(slack)))
        lo = F.greatest(F.lit(0.0), s.lo - (x - mean + F.lit(slack)))
        fired = (hi > threshold) | (lo > threshold)
        return F.struct(
            F.when(fired, F.lit(0.0)).otherwise(hi).alias("hi"),
            F.when(fired, F.lit(0.0)).otherwise(lo).alias("lo"),
            (s.alarms + fired.cast("long")).alias("alarms"),
            F.greatest(s.peak, hi, lo).alias("peak"),
        )

    res = F.aggregate(vals, state0, step)
    # floored-milli integers, not round(x, 6): the fold output is the
    # same double in every engine, but round() ALGORITHMS differ at
    # .xxx5 ties (Spark BigDecimal HALF_UP vs C-library rounding) —
    # floor(x * 1000) is one IEEE multiply + floor, algorithm-free
    milli = lambda c: F.floor(c * 1000).cast("long")  # noqa: E731
    return per_key.select(
        key_col,
        "n_events",
        milli(mean).alias("mean_milli"),
        res.getField("alarms").alias("n_alarms"),
        milli(res.getField("peak")).alias("max_cusum_milli"),
    )


def _floordiv_any(a: F.Column, b: int) -> F.Column:
    """Exact floor division for any-sign longs over a positive literal
    divisor: pmod is non-negative, so (a - pmod(a, b)) is exactly
    divisible and the double division is lossless below 2^53 (the
    graph.pagerank spelling, extended to negative numerators — a
    trend CAN be negative)."""
    bl = F.lit(b)
    return ((a - F.pmod(a, bl)) / bl).cast("long")


def holt_forecast(
    events: DataFrame,
    key_col: str = "event_type",
    ts_col: str = "ts",
    alpha: tuple[int, int] = (3, 10),
    beta: tuple[int, int] = (1, 5),
    scale: int = 1000,
    horizon: int = 7,
) -> DataFrame:
    """Per-key Holt double exponential smoothing (level + linear
    trend) over the key's daily event counts, with an h-step-ahead
    forecast — the capacity-planning / load-forecasting companion to
    seasonality_profile (which answers "what does a normal Tuesday
    look like"; this answers "where is the series HEADING").

        level_t = alpha*y_t + (1-alpha)*(level + trend)
        trend_t = beta*(level_t - level_{t-1}) + (1-beta)*trend_{t-1}

    computed entirely in scaled-long arithmetic: alpha/beta are
    rationals, every update a subtract-pmod exact floor division
    (negative trends included), so the result is bit-identical at any
    parallelism and the DuckDB oracle replays it with a recursive
    CTE. Level/trend init: first observation, zero trend. The fold
    runs over OBSERVED days (a silent day is absent, not zero —
    compose gap-filling upstream when zeros should decay the level).

    A smoothing recurrence is not a window function; like
    cusum_alarms it runs as a sequential fold over the key's
    day-ordered count array inside codegen. ONE groupBy(key, day)
    partial-agg shuffle plus ONE groupBy(key): state per key is the
    daily series (bounded by the calendar, not event volume — 100 TB
    of events still folds over ~thousands of days per key).

    Returns (key, n_days, level_fx, trend_fx, forecast_next_fx,
    forecast_h_fx) — fx values on the `scale` grid.
    """
    an, ad = alpha
    bn, bd = beta
    daily = events.groupBy(
        F.col(key_col), F.date_trunc("day", F.col(ts_col)).alias("day")
    ).agg(F.count(F.lit(1)).alias("y"))
    per_key = daily.groupBy(key_col).agg(
        F.transform(
            F.sort_array(F.collect_list(F.struct("day", "y"))),
            lambda s: s.getField("y"),
        ).alias("__ys"),
        F.count(F.lit(1)).alias("n_days"),
    )
    ys = F.col("__ys")
    state0 = F.struct(
        (F.element_at(ys, 1) * F.lit(scale)).cast("long").alias("L"),
        F.lit(0).cast("long").alias("T"),
    )

    def step(s, y):
        lp = _floordiv_any(
            F.lit(an) * y * F.lit(scale) + F.lit(ad - an) * (s.L + s.T),
            ad,
        )
        tp = _floordiv_any(
            F.lit(bn) * (lp - s.L) + F.lit(bd - bn) * s.T, bd
        )
        return F.struct(lp.alias("L"), tp.alias("T"))

    res = F.aggregate(
        F.slice(ys, 2, F.greatest(F.size(ys) - 1, F.lit(0))),
        state0,
        step,
    )
    lvl, tr = res.getField("L"), res.getField("T")
    return per_key.select(
        key_col,
        "n_days",
        lvl.alias("level_fx"),
        tr.alias("trend_fx"),
        (lvl + tr).alias("forecast_next_fx"),
        (lvl + F.lit(horizon) * tr).alias("forecast_h_fx"),
    )


def autocorrelation(
    events: DataFrame,
    lag: int = 1,
    key_col: str = "event_type",
    ts_col: str = "ts",
) -> DataFrame:
    """Exact lag-k autocorrelation of each key's daily-count series —
    the seasonality/persistence detector behind "is this load pattern
    weekly?" triage and anomaly-baseline selection (an ACF near 1 at
    lag 7 says: baseline on the same weekday, not yesterday).

    Exactness: with S = sum(x) and n = days, the mean-centered products
    are computed as (n*x_t - S)(n*x_{t+k} - S) — the n^2-scaled integer
    form of (x_t - mean)(x_{t+k} - mean) — so numerator and denominator
    are EXACT BIGINTs and the single final IEEE division is
    bit-identical across engines (the repo's decimal-exact rule). Lags
    step over the key's OBSERVED days in order (documented: absent
    days are absent, not zero — the calendar-dense variant is one
    date_sequence explode away).

    Plan: one partial-agg shuffle to (key, day) grain, then the
    per-key window and final aggregate REUSE that key partitioning —
    day grain is bounded by the calendar, so everything after the
    first aggregation is constant-size per key at any corpus scale.
    """
    if lag < 1:
        raise ValueError("lag must be >= 1")
    daily = (
        events.groupBy(
            F.col(key_col).alias("k"), F.to_date(ts_col).alias("day")
        )
        .agg(F.count(F.lit(1)).alias("x"))
    )
    wk = Window.partitionBy("k")
    wo = wk.orderBy("day")
    centered = daily.select(
        "k",
        "day",
        "x",
        F.count(F.lit(1)).over(wk).alias("n"),
        F.sum("x").over(wk).alias("s"),
        F.lag("x", lag).over(wo).alias("x_lag"),
    ).select(
        "k",
        (F.col("n") * F.col("x") - F.col("s")).alias("c"),
        (F.col("n") * F.col("x_lag") - F.col("s")).alias("c_lag"),
        "n",
    )
    # accumulate the products in DECIMAL(38,0): long*long sums would
    # silently wrap past 2^63 under non-ANSI Spark (the same defect
    # class association_rules guards); decimal headroom is ~1e38, far
    # above any calendar-bounded series, and the BIGINT output is
    # guarded on the way back down (raise, never wrap)
    cd = F.col("c").cast("decimal(38,0)")
    out = centered.groupBy(F.col("k").alias(key_col)).agg(
        F.max("n").alias("n_days"),
        F.sum(cd * F.col("c_lag")).alias("num_dec"),
        F.sum(cd * F.col("c")).alias("den_dec"),
    )
    long_max = F.lit(9223372036854775807).cast("decimal(38,0)")

    def to_long_guarded(c: F.Column, name: str) -> F.Column:
        return F.when(F.abs(c) <= long_max, c.cast("long")).otherwise(
            F.raise_error(
                F.lit(
                    f"autocorrelation: {name} exceeds BIGINT — series too "
                    "long/hot for the n^2-scaled integer form"
                )
            ).cast("long")
        )

    num = to_long_guarded(F.coalesce(F.col("num_dec"), F.lit(0)), "num")
    den = to_long_guarded(F.col("den_dec"), "den")
    return out.select(
        key_col,
        "n_days",
        num.alias("num"),
        den.alias("den"),
        F.when(
            den > 0, num.cast("double") / den
        ).alias(f"acf_lag{lag}"),
    )
