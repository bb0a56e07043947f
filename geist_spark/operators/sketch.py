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
