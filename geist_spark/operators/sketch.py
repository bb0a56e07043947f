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

from pyspark.sql import DataFrame, Window, functions as F


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


CMS_P = 2_147_483_647  # 2^31 - 1, Mersenne prime for universal hashing


def cms_params(depth: int) -> list[tuple[int, int]]:
    """Deterministic (a, b) per sketch row. a < 2^30 keeps a*h exact in
    int64 for a 32-bit h — the DuckDB oracle replays the identical
    expressions (same guarantee as dedup.minhash_params)."""
    import random

    rng = random.Random(0xC0FFEE)
    return [
        (rng.randrange(1, 1 << 30), rng.randrange(0, CMS_P))
        for _ in range(depth)
    ]


def _cms_hash(item: F.Column) -> F.Column:
    """32-bit md5 prefix of the item's string form — paid once per row,
    then `depth` cheap universal hashes derive the row positions."""
    return (
        F.conv(F.substring(F.md5(item.cast("string")), 1, 8), 16, 10)
        .cast("long")
    )


def cms_rollup(
    df: DataFrame,
    group_cols: list[str],
    item_col: str,
    width: int = 1024,
    depth: int = 4,
) -> DataFrame:
    """Per-cell count-min sketch in long format: rows of
    (group_cols..., d, pos, n) — the frequency member of the mergeable
    sketch family (HLL = distinct, histogram = quantiles, bloom =
    membership, CMS = per-item counts / heavy hitters).

    Long format merges with a plain groupBy-sum (associative,
    commutative, map-side partial) and is at most width*depth rows per
    cell regardless of input size — the overcount bound is the usual
    CMS guarantee (eps ~ e/width with prob 1 - e^-depth). Deterministic
    md5/universal-hash positions, so the DuckDB oracle replays the
    arithmetic bit-for-bit (unlike count_min_sketch(), whose binary
    image is not portable across engines)."""
    h = _cms_hash(F.col(item_col))
    cells = [
        F.struct(
            F.lit(d).alias("d"),
            (((F.lit(a) * h + F.lit(b)) % F.lit(CMS_P)) % F.lit(width)).alias(
                "pos"
            ),
        )
        for d, (a, b) in enumerate(cms_params(depth))
    ]
    return (
        df.filter(F.col(item_col).isNotNull())
        .select(*group_cols, F.explode(F.array(*cells)).alias("c"))
        .groupBy(*group_cols, "c.d", "c.pos")
        .agg(F.count(F.lit(1)).alias("n"))
    )


def cms_merge(
    cms: DataFrame, group_cols: list[str] | None = None
) -> DataFrame:
    """Merge fine-grained CMS cells up to `group_cols` (empty =
    global): groupBy-sum on (group_cols, d, pos). The raw table is not
    touched again."""
    keys = list(group_cols or []) + ["d", "pos"]
    return cms.groupBy(*keys).agg(F.sum("n").alias("n"))


def cms_estimate(
    cms: DataFrame,
    items: DataFrame,
    item_col: str,
    width: int = 1024,
    depth: int = 4,
) -> DataFrame:
    """Point-frequency estimates for candidate items against a merged
    global sketch: min over the `depth` rows of the counter at the
    item's position (absent counter = 0, which only happens for items
    the sketch never saw).

    The sketch side is at most width*depth rows — broadcast it, so the
    candidate scan never shuffles. Returns (item_col, est_count)."""
    probes = items.select(item_col).distinct()
    h = _cms_hash(F.col(item_col))
    cells = [
        F.struct(
            F.lit(d).alias("d"),
            (((F.lit(a) * h + F.lit(b)) % F.lit(CMS_P)) % F.lit(width)).alias(
                "pos"
            ),
        )
        for d, (a, b) in enumerate(cms_params(depth))
    ]
    probed = probes.select(
        item_col, F.explode(F.array(*cells)).alias("c")
    ).select(item_col, "c.d", "c.pos")
    joined = probed.join(F.broadcast(cms), ["d", "pos"], "left")
    return joined.groupBy(item_col).agg(
        F.min(F.coalesce(F.col("n"), F.lit(0))).alias("est_count")
    )


KMV_RANGE = 1 << 32  # hash domain size for the 32-bit md5 prefix


def kmv_rollup(
    df: DataFrame,
    group_cols: list[str],
    item_col: str,
    k: int = 256,
) -> DataFrame:
    """Per-cell KMV / theta sketch of item_col: the K smallest 32-bit
    md5 hashes of the distinct items, long format (group_cols..., r, h)
    with r = 1..K ascending — the set-expression member of the
    mergeable sketch family (HLL = distinct count only; KMV also
    answers UNION / INTERSECTION / overlap between cells, the audience-
    overlap question HLL cannot).

    Plan shape: map-side partial distinct on (group, h), then the
    rank<=K filter — Spark >= 3.5 infers WindowGroupLimit partials, so
    each shuffle map task forwards at most K rows per group, never the
    full distinct set. Deterministic md5 hashing, so the DuckDB oracle
    replays the sketch bit-for-bit."""
    h = (
        F.conv(F.substring(F.md5(F.col(item_col).cast("string")), 1, 8), 16, 10)
        .cast("long")
    )
    distinct = (
        df.filter(F.col(item_col).isNotNull())
        .select(*group_cols, h.alias("h"))
        .distinct()
    )
    w = Window.partitionBy(*group_cols).orderBy("h")
    return (
        distinct.withColumn("r", F.row_number().over(w))
        .filter(F.col("r") <= k)
        .select(*group_cols, "r", "h")
    )


def kmv_merge(
    sketches: DataFrame, group_cols: list[str] | None = None, k: int = 256
) -> DataFrame:
    """Union fine-grained KMV sketches up to `group_cols` (empty =
    global): dedupe retained hashes, keep the K smallest, re-rank. The
    union of per-cell K-minima always contains the true K minima of
    the union (standard KMV merge), so the merged sketch is exactly
    what a direct rollup at the coarser grain would have built — the
    raw table is not touched again."""
    keys = list(group_cols or [])
    distinct = sketches.select(*keys, "h").distinct()
    if keys:
        w = Window.partitionBy(*keys).orderBy("h")
    else:
        w = Window.partitionBy(F.lit(1)).orderBy("h")
    return (
        distinct.withColumn("r", F.row_number().over(w))
        .filter(F.col("r") <= k)
        .select(*keys, "r", "h")
    )


def kmv_estimate(
    sketches: DataFrame, group_cols: list[str], k: int = 256
) -> DataFrame:
    """Distinct-count estimate per group from a KMV sketch: exact
    n_retained when the cell held fewer than K distinct hashes (the
    sketch IS the distinct set), else (K-1) * 2^32 / h_K — the classic
    KMV estimator. Pure integer inputs into one double division, so
    two engines agree bit-for-bit."""
    agg = sketches.groupBy(*group_cols).agg(
        F.count(F.lit(1)).alias("n_ret"),
        F.max(F.when(F.col("r") == k, F.col("h"))).alias("h_k"),
    )
    est = F.when(
        F.col("h_k").isNull(), F.col("n_ret").cast("double")
    ).otherwise(
        F.lit(float(k - 1)) * F.lit(float(KMV_RANGE)) / F.col("h_k")
    )
    return agg.select(*group_cols, F.round(est, 4).alias("distinct_est"))


def kmv_overlap(
    sketches: DataFrame,
    group_col: str,
    k: int = 256,
    include_empty: bool = False,
) -> DataFrame:
    """Pairwise set-intersection estimates between cells of one KMV
    sketch table (group_a < group_b): theta-sketch intersection.
    theta = min over both sides of (h_K or 2^32 when the side is
    exact); the intersection estimate is |{h in A ∩ B : h < theta}| *
    2^32 / theta, which degrades to the EXACT intersection count when
    both sides retained their full distinct sets.

    By default a pair with NO retained common hash below theta is
    ABSENT from the output (the inner join on h yields nothing), so
    'disjoint' and 'not computed' look the same to a consumer.
    include_empty=True completes the pair universe from the (tiny,
    one-row-per-group) theta table and emits n_common=0,
    intersect_est=0.0 rows for those pairs instead.

    Cost: a self-join of two <= |groups|*K row tables on h — nothing
    touches the raw data. This is the question that motivates theta
    over HLL: 'how many users do checkout and refund share?' from
    pre-built per-type sketches, no rescan, no exact distinct join."""
    theta_tbl = sketches.groupBy(group_col).agg(
        F.coalesce(
            F.max(F.when(F.col("r") == k, F.col("h"))),
            F.lit(KMV_RANGE).cast("long"),
        ).alias("theta")
    )
    a = sketches.select(
        F.col(group_col).alias("ga"), F.col("h").alias("h")
    ).join(
        F.broadcast(theta_tbl.select(
            F.col(group_col).alias("ga"), F.col("theta").alias("theta_a")
        )),
        "ga",
    )
    b = sketches.select(
        F.col(group_col).alias("gb"), F.col("h").alias("h")
    ).join(
        F.broadcast(theta_tbl.select(
            F.col(group_col).alias("gb"), F.col("theta").alias("theta_b")
        )),
        "gb",
    )
    # |groups|*K can reach corpus scale for fine groupings, and
    # Catalyst's static estimate of the window-derived sides is
    # unreliable (see SCALE.md merge-hint policy) — pin the self-join
    # to sort-merge.
    common = a.hint("merge").join(b, "h").filter(F.col("ga") < F.col("gb"))
    theta = F.least(F.col("theta_a"), F.col("theta_b"))
    agg = (
        common.withColumn("theta", theta)
        .filter(F.col("h") < F.col("theta"))
        .groupBy("ga", "gb", "theta")
        .agg(F.count(F.lit(1)).alias("n_common"))
    )
    est = F.when(
        F.col("theta") == KMV_RANGE, F.col("n_common").cast("double")
    ).otherwise(
        F.col("n_common") * F.lit(float(KMV_RANGE)) / F.col("theta")
    )
    out = agg.select(
        F.col("ga").alias("group_a"),
        F.col("gb").alias("group_b"),
        F.col("n_common"),
        F.round(est, 4).alias("intersect_est"),
    )
    if include_empty:
        # complete the pair universe at group grain (|groups|^2 rows,
        # metadata-sized) so disjoint pairs surface as explicit zeros
        ga = theta_tbl.select(F.col(group_col).alias("group_a"))
        gb = theta_tbl.select(F.col(group_col).alias("group_b"))
        pairs = ga.crossJoin(F.broadcast(gb)).filter(
            F.col("group_a") < F.col("group_b")
        )
        out = pairs.join(out, ["group_a", "group_b"], "left").select(
            "group_a",
            "group_b",
            F.coalesce(F.col("n_common"), F.lit(0).cast("long")).alias(
                "n_common"
            ),
            F.coalesce(F.col("intersect_est"), F.lit(0.0)).alias(
                "intersect_est"
            ),
        )
    return out


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


def percentile_normalize(
    df: DataFrame,
    value_col: str,
    group_col: str,
    lo: float,
    hi: float,
    n_bins: int = 128,
) -> DataFrame:
    """Rank-normalize a score WITHIN its group via the mergeable
    histogram: each row gains `pct` = share of the group's rows in
    bins at or below its own — the calibration step before applying
    one quality threshold across heterogeneous sources (a 0.7 from a
    clean feed and a 0.7 from a crawl are different animals).

    Resolution is one bin (n_bins controls it); the mapping is a pure
    function of the histogram, so it replays exactly in the oracle.
    Shape: one hist shuffle, cumulative window over <= n_bins rows per
    group, then a BROADCAST join of the tiny (group, bin, pct) table
    back onto the raw rows — the raw table is never shuffled."""
    from pyspark.sql import Window

    hist = hist_rollup(df, [group_col], value_col, lo, hi, n_bins)
    w = (
        Window.partitionBy(group_col)
        .orderBy("bin")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    wt = Window.partitionBy(group_col)
    cum = hist.select(
        group_col,
        "bin",
        (
            F.sum("n").over(w).cast("double")
            / F.sum("n").over(wt).cast("double")
        ).alias("__pct"),
    )
    width = (hi - lo) / n_bins
    raw = F.floor((F.col(value_col) - F.lit(lo)) / F.lit(width))
    bin_ = F.least(F.greatest(raw, F.lit(0)), F.lit(n_bins - 1)).cast("int")
    return (
        df.filter(F.col(value_col).isNotNull())
        .withColumn("bin", bin_)
        .join(F.broadcast(cum), [group_col, "bin"])
        .select(
            *df.columns,
            F.round(F.col("__pct"), 6).alias("pct"),
        )
    )


def cms_join_size_estimate(cms_a: DataFrame, cms_b: DataFrame) -> DataFrame:
    """AMS-style equi-join output-size estimate from two merged CMS
    sketches over the join key: |A ⋈ B| = Σ_k f_A(k)·f_B(k), estimated
    as min over sketch rows d of Σ_pos a[d,pos]·b[d,pos]. Every row's
    inner product only ADDS collision terms, so the estimate is a
    guaranteed upper bound that tightens with width — the number a
    shuffle planner wants BEFORE paying for the join (pick broadcast
    vs shuffle vs salting from sketch partials, never scanning either
    table again).

    Both sketches must be built with the same (width, depth, params).
    Cost: a join of two ≤ width·depth row tables — nothing touches
    the raw data."""
    a, b = cms_a.alias("a"), cms_b.alias("b")
    per_d = (
        a.join(b, ["d", "pos"])
        .groupBy("d")
        .agg(F.sum(F.col("a.n") * F.col("b.n")).alias("ip"))
    )
    return per_d.agg(F.min("ip").alias("join_size_est"))
