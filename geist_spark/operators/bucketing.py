"""Bucketed-table utilities: co-located joins without a shuffle.

At 100 TB the dominant join cost is the shuffle. Tables that are
repeatedly joined on the same key (fact-to-fact, or fact-to-large-dim
where broadcast doesn't fit) should be written bucketed on that key:
both sides then hash-partition identically at WRITE time, and Spark's
planner elides the exchange — the join runs bucket-local.

Spark's bucketing rides the session catalog (saveAsTable), not plain
parquet paths; these helpers wrap that so the engine can persist and
join keyed tables bucket-aligned.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window, functions as F


def fan_out(df: DataFrame, min_partitions: int | None = None) -> DataFrame:
    """Ensure enough partitions BEFORE CPU-heavy per-row work.

    A small parquet file scans as ONE split, so an expensive map stage
    (per-char md5 fingerprints, shingling, per-vector signatures)
    serializes on one core no matter how many executors exist. The
    same cliff hits at 100 TB after a selective filter + coalesce, or
    on a skinny dimension feeding an explode. This widens to the
    session default parallelism when (and only when) the input has
    fewer partitions — on a healthy large scan it is a no-op, so the
    round-robin shuffle cost is only ever paid on inputs small enough
    for it to be trivial."""
    target = min_partitions or df.sparkSession.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() >= target:
        return df
    return df.repartition(target)


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_cols: list[str],
    num_buckets: int = 32,
    sort_cols: list[str] | None = None,
    path: str | None = None,
) -> None:
    """Persist df bucketed (and optionally sorted) on bucket_cols.

    num_buckets should match the join fan-in you want per task; both
    sides of a co-located join must use the SAME bucket count."""
    writer = df.write.mode("overwrite").bucketBy(num_buckets, *bucket_cols)
    if sort_cols:
        writer = writer.sortBy(*sort_cols)
    if path:
        writer = writer.option("path", path)
    writer.format("parquet").saveAsTable(table)


def bucketed_join(
    spark: SparkSession, left_table: str, right_table: str, on: list[str], how: str = "inner"
) -> DataFrame:
    """Join two same-bucketed tables on their bucket columns. With
    matching bucket specs the plan contains NO Exchange on either side
    (verified in tests) — the 100 TB pattern for recurring fact joins."""
    return spark.table(left_table).join(spark.table(right_table), on, how)


# ---------------------------------------------------------------- z-order


def linear_bin(col, lo: float, hi: float, bits: int):
    """Fixed-range bucket in [0, 2^bits): floor((x-lo)/step), clamped
    into the edge cells. Same deterministic binning contract as
    sketch.hist_rollup — pure arithmetic, replayable in any engine —
    which is what makes the z-key below oracle-checkable. Fixed (not
    sampled) bounds are the honest scale design: no global rank pass,
    the key is a zero-shuffle map expression."""
    from pyspark.sql import functions as F

    n = 1 << bits
    step = (hi - lo) / n
    raw = F.floor((col - F.lit(lo)) / F.lit(step))
    return F.least(F.greatest(raw, F.lit(0)), F.lit(n - 1)).cast("long")


def zorder_key(bins: list, bits: int):
    """Interleave the bits of per-dimension bucket ids into one Morton
    (z-order) key: bit i of dim d lands at position i*D + d. Sorting or
    range-partitioning by this key co-locates rows that are close in
    EVERY dimension, so per-file min/max stats prune multi-predicate
    scans — the layout trick single-column sort can't do.

    2 dims x 8 bits = 16 OR-terms of shift/mask — all inside one
    codegen stage, no shuffle, no UDF."""
    from pyspark.sql import functions as F

    key = F.lit(0).cast("long")
    d_count = len(bins)
    for i in range(bits):
        for d, b in enumerate(bins):
            bit = F.shiftright(b, i).bitwiseAND(F.lit(1))
            key = key.bitwiseOR(F.shiftleft(bit, i * d_count + d))
    return key


def zorder_layout(
    df: DataFrame,
    dims: list[tuple[str, float, float]],
    bits: int = 8,
    target_partitions: int | None = None,
) -> DataFrame:
    """Cluster df for multi-dimensional data skipping: add a z-order
    key over `dims` ((col, lo, hi) each), range-partition by it, sort
    within partitions. Writing the result as parquet gives files whose
    per-column min/max ranges are tight in all dims simultaneously —
    at 100 TB this is the difference between scanning every file and
    pruning most of them for `WHERE a BETWEEN .. AND b BETWEEN ..`
    style predicates. One range-exchange (sampled boundaries), one
    local sort; the key itself is map-only."""
    from pyspark.sql import functions as F

    bins = [linear_bin(F.col(c), lo, hi, bits) for c, lo, hi in dims]
    keyed = df.withColumn("__z", zorder_key(bins, bits))
    n = target_partitions or df.sparkSession.sparkContext.defaultParallelism
    return keyed.repartitionByRange(n, "__z").sortWithinPartitions("__z")


def compact_plan(
    files: DataFrame,
    target_bytes: int,
    dir_col: str = "dir",
    path_col: str = "path",
    bytes_col: str = "bytes",
) -> DataFrame:
    """Small-file compaction planner (Iceberg/Delta binpack shape):
    assign every file to a rewrite bin of ~target_bytes, per
    directory/partition, with one deterministic rule:

        bin = floor(exclusive_prefix_sum(bytes) / target_bytes)

    over files ordered by path. Properties: deterministic under any
    execution order; each bin's files are contiguous in path order
    (rewrites stream sequentially); a bin's total is bounded by
    target_bytes plus its largest member (the bin closes when its
    range boundary is crossed, so only the crossing file overshoots —
    an oversized file can still share its bin with the small files
    that preceded it inside the same range, and the files AFTER it
    start fresh bins because the prefix sum jumps past whole ranges).

    This is a METADATA operator — one row per file, not per data row —
    so the per-directory window is millions of rows at worst. The
    partition key is the directory: exactly the grain real table
    compaction rewrites at (cross-partition packing would break
    partition pruning).

    Output: (dir, path, bytes, bin).
    """
    w = Window.partitionBy(dir_col).orderBy(path_col)
    eprefix = F.coalesce(
        F.sum(bytes_col).over(
            w.rowsBetween(Window.unboundedPreceding, -1)
        ),
        F.lit(0),
    )
    t = F.lit(int(target_bytes))
    # exact integer floor division (subtract-pmod form, like
    # graph._floordiv): floor(double-division) can land in the
    # adjacent bin once per-dir prefix sums push quotients within an
    # ulp of an integer — the oracle's integer // never does
    bin_ = ((eprefix - F.pmod(eprefix, t)) / t).cast("long")
    return files.select(
        F.col(dir_col).alias("dir"),
        F.col(path_col).alias("path"),
        F.col(bytes_col).alias("bytes"),
        bin_.alias("bin"),
    )


def compact_summary(plan: DataFrame) -> DataFrame:
    """Rewrite-task summary per (dir, bin): file count + bytes — what
    a compaction executor schedules one task per row of."""
    return plan.groupBy("dir", "bin").agg(
        F.count(F.lit(1)).alias("n_files"),
        F.sum("bytes").alias("total_bytes"),
    )


def reconcile_files(listing: DataFrame, manifest: DataFrame) -> DataFrame:
    """Storage-vs-manifest reconciliation: files on disk that no
    manifest references (orphans — failed-write leftovers the GC can
    reclaim) and manifest entries with no backing file (missing —
    corruption to repair from a snapshot). The third lakehouse
    maintenance primitive next to compact_plan and backfill_plan;
    like them it is METADATA-grain — a full-outer join over file
    listings, costing nothing at any data scale.

    Inputs: (path, bytes) each. Output: (path, bytes, status) with
    status in {'orphan', 'missing', 'ok'}."""
    a = listing.select(
        F.col("path").alias("l_path"), F.col("bytes").alias("l_bytes")
    )
    b = manifest.select(
        F.col("path").alias("m_path"), F.col("bytes").alias("m_bytes")
    )
    j = a.join(b, a.l_path == b.m_path, "full_outer")
    status = (
        F.when(F.col("m_path").isNull(), F.lit("orphan"))
        .when(F.col("l_path").isNull(), F.lit("missing"))
        .otherwise(F.lit("ok"))
    )
    return j.select(
        F.coalesce(F.col("l_path"), F.col("m_path")).alias("path"),
        F.coalesce(F.col("l_bytes"), F.col("m_bytes")).alias("bytes"),
        status.alias("status"),
    )


def zone_map(
    df: DataFrame,
    file_col,
    stat_cols: list[str],
) -> DataFrame:
    """Per-file zone-map statistics — the min/max/null-count metadata
    parquet footers and Delta/Iceberg manifests keep per column, the
    data-skipping substrate every 100 TB scan depends on (a filter
    that can't consult zone maps reads everything).

    `file_col` is the expression that names a row's file (a real
    file-path column, or a layout expression when simulating one).
    ONE partial-agg shuffle down to |files| rows — metadata grain;
    columns per stat col c: min_c, max_c, nulls_c.
    """
    aggs = [F.count(F.lit(1)).alias("n_rows")]
    for c in stat_cols:
        aggs += [
            F.min(c).alias(f"min_{c}"),
            F.max(c).alias(f"max_{c}"),
            F.sum(F.col(c).isNull().cast("long")).alias(f"nulls_{c}"),
        ]
    return df.groupBy(file_col.alias("file_id")).agg(*aggs)


def zone_prune(
    zones: DataFrame,
    predicates: list[tuple[str, object, object]],
) -> DataFrame:
    """Data-skipping decision over a zone-map table: for conjunctive
    range predicates [(col, lo, hi), ...] (None = unbounded), a file
    must be scanned iff EVERY predicate's range overlaps the file's
    [min, max] span. Null semantics: a range predicate never matches
    NULL, so a file whose column is entirely null (min/max NULL)
    cannot satisfy that predicate and is skipped.

    Pure map expression over the metadata-grain zones table — the
    planner-side half of partition pruning: run it against the
    layout's zone maps to quantify how many files (and rows) a
    predicate actually touches. Pair with zorder_layout to measure
    what a layout change buys BEFORE rewriting 100 TB.

    Returns zones + scan_needed (int) — 1 iff the file may contain a
    matching row.
    """
    need = F.lit(True)
    for c, lo, hi in predicates:
        ok = F.col(f"min_{c}").isNotNull()
        if lo is not None:
            ok = ok & (F.col(f"max_{c}") >= F.lit(lo))
        if hi is not None:
            ok = ok & (F.col(f"min_{c}") <= F.lit(hi))
        need = need & ok
    return zones.withColumn("scan_needed", need.cast("int"))


def nonfoldable_zero(col: str) -> F.Column:
    """A constant-0 partition key Catalyst can NOT constant-fold away:
    pmod(coalesce(length(col), 0), 1) == 0 for EVERY row — including
    NULL values of the anchor column (coalesce is load-bearing: a NULL
    key would silently split the "constant" partition in two and
    duplicate ranks) — but depends on a column, so a bounded top-k
    rank window keeps a non-empty partition spec (a foldable literal
    gets folded out and WindowExec logs the misleading "No Partition
    Defined" warning). Shared by the rank-over-bounded-rows sites
    (rake_keywords, textrank_keywords, ts_pattern_topk)."""
    return F.pmod(
        F.coalesce(F.length(F.col(col).cast("string")), F.lit(0)),
        F.lit(1),
    )
