"""Mergeable sketch rollups (Apache DataSketches via Spark built-ins).

The 100 TB pattern for distinct counts over arbitrary time ranges:
sketch once per fine-grained cell (hour x dimension), persist the
binary sketches, then answer ANY coarser query (day/week/whole-table)
by unioning sketches — no second scan of the raw data. `hll_union_agg`
is associative/commutative, so rollups distribute and re-partition
freely; sketch size is constant (~2^lg_k registers) regardless of
cardinality.

Uses only public Spark SQL functions (hll_sketch_agg /
hll_union_agg / hll_sketch_estimate, Spark >= 3.5). No reference
equivalent (zpiroux/geist has no aggregation surface at all,
README.md:21); part of the driver's scale-extension mandate.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def hll_rollup(
    df: DataFrame,
    group_cols: list[str],
    value_col: str,
    lg_k: int = 12,
) -> DataFrame:
    """Per-cell HLL sketch of value_col: one hash-agg shuffle carrying
    fixed-size sketch partials (map-side combined), never raw values."""
    return df.groupBy(*group_cols).agg(
        F.hll_sketch_agg(F.col(value_col), F.lit(lg_k)).alias("hll"),
        F.count("*").alias("n_rows"),
    )


def hll_merge(
    sketches: DataFrame, group_cols: list[str] | None = None
) -> DataFrame:
    """Union fine-grained sketches up to `group_cols` (empty = global)
    and estimate. Input is a hll_rollup output — the raw table is not
    touched again."""
    agg = [
        F.hll_sketch_estimate(F.hll_union_agg("hll")).alias("distinct_est"),
        F.sum("n_rows").alias("n_rows"),
    ]
    if group_cols:
        return sketches.groupBy(*group_cols).agg(*agg)
    return sketches.agg(*agg)


def hist_rollup(
    df: DataFrame,
    group_cols: list[str],
    value_col: str,
    lo: float,
    hi: float,
    n_bins: int = 128,
) -> DataFrame:
    """Per-cell fixed-bin histogram of value_col: rows of
    (group_cols..., bin, n). The quantile analogue of hll_rollup —
    sketch once at fine grain, answer any coarser quantile query by
    merging counts, never rescanning the raw table.

    Long format (one row per non-empty bin) merges with a plain
    groupBy-sum: associative, commutative, partial-agg map-side, and
    at most n_bins rows per cell regardless of row count. Out-of-range
    values clamp into the edge bins, so totals are preserved.

    Unlike approx_percentile (whose internal sketch is not exposed as
    a mergeable value), this histogram is deterministic and
    engine-portable: the DuckDB oracle replays the identical binning
    arithmetic bit-for-bit.
    """
    if n_bins < 1:
        raise ValueError("n_bins must be >= 1")
    if not hi > lo:
        raise ValueError("need hi > lo")
    width = (hi - lo) / n_bins
    raw = F.floor((F.col(value_col) - F.lit(lo)) / F.lit(width))
    bin_ = F.least(
        F.greatest(raw, F.lit(0)), F.lit(n_bins - 1)
    ).cast("int")
    return (
        df.filter(F.col(value_col).isNotNull())
        .groupBy(*group_cols, bin_.alias("bin"))
        .agg(F.count(F.lit(1)).alias("n"))
    )


def hist_merge(
    hist: DataFrame, group_cols: list[str] | None = None
) -> DataFrame:
    """Merge fine-grained histograms up to `group_cols` (empty =
    global): groupBy-sum on (group_cols, bin). Input is a hist_rollup
    output; the raw table is not touched again."""
    keys = list(group_cols or []) + ["bin"]
    return hist.groupBy(*keys).agg(F.sum("n").alias("n"))


def hist_quantiles(
    hist: DataFrame,
    group_cols: list[str],
    qs: list[float],
    lo: float,
    hi: float,
    n_bins: int = 128,
) -> DataFrame:
    """Estimate quantiles from a merged histogram: for each q, the
    LOWER EDGE of the first bin whose cumulative count reaches
    ceil(q * total). Error is bounded by one bin width; the estimate
    is a pure function of the counts (no interpolation), so two
    engines agree exactly.

    One window over at most n_bins rows per group — the expensive
    work (the scan) already happened in hist_rollup."""
    from pyspark.sql import Window

    width = (hi - lo) / n_bins
    w = (
        Window.partitionBy(*group_cols)
        .orderBy("bin")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    wt = Window.partitionBy(*group_cols)
    cum = hist.withColumn("cum", F.sum("n").over(w)).withColumn(
        "total", F.sum("n").over(wt)
    )
    aggs = []
    for q in qs:
        target = F.ceil(F.lit(q) * F.col("total"))
        edge = F.lit(lo) + F.col("bin") * F.lit(width)
        aggs.append(
            F.min(F.when(F.col("cum") >= target, edge)).alias(
                f"p{int(q * 100):02d}"
            )
        )
    return cum.groupBy(*group_cols).agg(
        *aggs, F.max("total").alias("n_values")
    )
