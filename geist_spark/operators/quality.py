"""Declarative data-quality validation (Deequ-style constraint suite).

A 100 TB ingest isn't done when rows land — it's done when the table
passes its contract. This module compiles a declarative list of
constraints into ONE pass over the data:

- every row-local constraint (completeness, range, accepted values,
  pattern, non-negative) becomes a conditional aggregate in a shared
  scan — adding a constraint adds a column to the agg, not a pass;
- uniqueness constraints share that scan via count_distinct;
- referential-integrity constraints become broadcast LEFT joins
  against the distinct parent key set, with the orphan count taken in
  the SAME aggregation (parent keys are distinct, so the join never
  fans out) — no extra scan, no cartesian, no materialized orphans.

Output is long format — one row per constraint:
  (constraint, column, violations, total, pass_fraction, passed)
so results stream into the same keyed-table sinks as any other data
(quality history is just another table to query/rollup).

Design parallel: Amazon Deequ (Schelter et al., VLDB 2018,
"Automating Large-Scale Data Quality Verification") compiles checks
to Spark aggregations the same way; this is an independent
from-scratch implementation over pyspark.sql.functions only.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any, Sequence

from pyspark.sql import DataFrame, functions as F

_ROW_LOCAL = ("not_null", "in_range", "accepted_values", "matches", "non_negative")


@dataclass(frozen=True)
class Check:
    """One declarative constraint.

    kind:
      - 'not_null':        col must be non-null
      - 'unique':          col must have no duplicate values (nulls violate)
      - 'in_range':        col must be BETWEEN lo AND hi (nulls violate)
      - 'accepted_values': col must be one of `values` (nulls violate)
      - 'matches':         col must match regex `pattern` (nulls violate)
      - 'non_negative':    col >= 0 (nulls violate)
      - 'ref_integrity':   non-null col values must exist in
                           parent[parent_col] (total = non-null count)
    min_pass_fraction: the check passes if at least this fraction of
    rows satisfies it (1.0 = every row).
    """

    kind: str
    column: str
    lo: Any = None
    hi: Any = None
    values: Sequence[Any] = field(default=())
    pattern: str = ""
    parent: DataFrame | None = None
    parent_col: str = ""
    min_pass_fraction: float = 1.0

    def name(self) -> str:
        return f"{self.kind}({self.column})"


def _violation_expr(c: Check) -> F.Column:
    col = F.col(c.column)
    if c.kind == "not_null":
        bad = col.isNull()
    elif c.kind == "in_range":
        bad = col.isNull() | ~col.between(c.lo, c.hi)
    elif c.kind == "accepted_values":
        bad = col.isNull() | ~col.isin(*list(c.values))
    elif c.kind == "matches":
        bad = col.isNull() | ~col.rlike(c.pattern)
    elif c.kind == "non_negative":
        bad = col.isNull() | (col < 0)
    else:  # pragma: no cover - kinds are routed before dispatch
        raise ValueError(f"not a row-local check: {c.kind}")
    return F.sum(bad.cast("long"))


def validate(df: DataFrame, checks: Sequence[Check]) -> DataFrame:
    """Run a constraint suite; returns the long-format report.

    Plan shape: (broadcast left join per ref check, fan-out-free) ->
    ONE aggregation covering every check -> explode of a literal array
    into per-check rows. A single scan of `df` regardless of how many
    constraints are declared; no per-check jobs, no driver loops."""
    row_local = [c for c in checks if c.kind in _ROW_LOCAL]
    uniques = [c for c in checks if c.kind == "unique"]
    refs = [c for c in checks if c.kind == "ref_integrity"]
    bad_kinds = sorted(
        {c.kind for c in checks} - set(_ROW_LOCAL) - {"unique", "ref_integrity"}
    )
    if bad_kinds:
        raise ValueError(f"unknown check kinds: {bad_kinds}")

    j = df
    for i, c in enumerate(refs):
        if c.parent is None or not c.parent_col:
            raise ValueError(f"{c.name()}: ref_integrity needs parent+parent_col")
        pk = c.parent.select(F.col(c.parent_col).alias(f"__pk{i}")).distinct()
        j = j.join(
            F.broadcast(pk), F.col(c.column) == F.col(f"__pk{i}"), "left"
        )

    aggs = [F.count(F.lit(1)).alias("__total")]
    for i, c in enumerate(row_local):
        aggs.append(_violation_expr(c).alias(f"__v{i}"))
    for i, c in enumerate(uniques):
        aggs.append(F.count(F.col(c.column)).alias(f"__nn{i}"))
        aggs.append(F.count_distinct(F.col(c.column)).alias(f"__d{i}"))
    for i, c in enumerate(refs):
        aggs.append(
            F.sum(
                (
                    F.col(c.column).isNotNull() & F.col(f"__pk{i}").isNull()
                ).cast("long")
            ).alias(f"__r{i}")
        )
        aggs.append(F.count(F.col(c.column)).alias(f"__rt{i}"))

    one = j.agg(*aggs)

    # (check, violations expr, total expr) — refs measure against the
    # non-null FK population, everything else against all rows
    entries: list[tuple[Check, F.Column, F.Column]] = []
    for i, c in enumerate(row_local):
        entries.append((c, F.col(f"__v{i}"), F.col("__total")))
    for i, c in enumerate(uniques):
        dupes = (F.col(f"__nn{i}") - F.col(f"__d{i}")) + (
            F.col("__total") - F.col(f"__nn{i}")  # null keys violate
        )
        entries.append((c, dupes, F.col("__total")))
    for i, c in enumerate(refs):
        entries.append((c, F.col(f"__r{i}"), F.col(f"__rt{i}")))

    report = one.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(c.name()).alias("constraint"),
                        F.lit(c.column).alias("column"),
                        F.coalesce(v, F.lit(0)).cast("long").alias("violations"),
                        t.cast("long").alias("total"),
                        F.lit(float(c.min_pass_fraction)).alias("min_frac"),
                    )
                    for c, v, t in entries
                ]
            )
        ).alias("r")
    ).select("r.*")

    frac_ok = (
        (F.col("total") - F.col("violations")).cast("double")
        / F.greatest(F.col("total"), F.lit(1)).cast("double")
    )
    return report.select(
        "constraint",
        "column",
        "violations",
        "total",
        frac_ok.alias("pass_fraction"),
        (frac_ok >= F.col("min_frac")).alias("passed"),
    )


def k_anonymity_report(
    df: DataFrame,
    quasi_cols: list[str],
    sensitive_col: str | None = None,
    k: int = 5,
) -> DataFrame:
    """Re-identification risk audit: equivalence classes over the
    quasi-identifier columns, flagging classes smaller than k
    (k-anonymity) and — when a sensitive column is given — classes
    with fewer than 2 distinct sensitive values (l-diversity floor:
    everyone in the class shares the secret).

    ONE aggregation on the quasi-identifier tuple computes class size
    and distinct-sensitive count together (count_distinct is exact
    here by design: a privacy audit must not approximate the thing it
    certifies; the quasi-tuple cardinality, not the row count, bounds
    the shuffle). Output is per-class, smallest classes first (the
    rows a release gate would suppress or generalize come first; the
    sort runs over the already-reduced class table, not the input).
    """
    aggs = [F.count(F.lit(1)).alias("class_size")]
    if sensitive_col is not None:
        aggs.append(
            F.count_distinct(F.col(sensitive_col)).alias("n_sensitive")
        )
    out = df.groupBy(*[F.col(c) for c in quasi_cols]).agg(*aggs)
    anon_ok = F.col("class_size") >= k
    cols = [*quasi_cols, "class_size", anon_ok.alias("k_anonymous")]
    if sensitive_col is not None:
        cols.append((F.col("n_sensitive") >= 2).alias("l_diverse"))
    order = [F.col("class_size").asc()] + [
        F.col(c).asc() for c in quasi_cols
    ]
    return out.select(*cols).orderBy(*order)


def profile_table(df: DataFrame, cols: list[str] | None = None) -> DataFrame:
    """Column profile in long format: per column — row count, nulls,
    exact distinct count, lexicographic min/max (string form). The
    Deequ-style profiling pass that feeds constraint suggestion and
    schema documentation.

    ONE aggregation computes every column's stats together (adding a
    column adds agg expressions, not a pass); the literal-array
    explode that produces long format is the same shape as
    validate()'s report. Exact distinct is deliberate at profile time
    (profiles are audit artifacts); swap approx_count_distinct when
    profiling at full corpus scale on a schedule.
    """
    cols = cols or df.columns
    aggs = [F.count(F.lit(1)).alias("__n")]
    for i, c in enumerate(cols):
        s = F.col(c).cast("string")
        aggs += [
            F.sum(F.col(c).isNull().cast("long")).alias(f"__null{i}"),
            F.count_distinct(F.col(c)).alias(f"__d{i}"),
            F.min(s).alias(f"__min{i}"),
            F.max(s).alias(f"__max{i}"),
        ]
    one = df.agg(*aggs)
    report = one.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(c).alias("column"),
                        F.col("__n").alias("n_rows"),
                        F.col(f"__null{i}").alias("n_null"),
                        F.col(f"__d{i}").alias("n_distinct"),
                        F.col(f"__min{i}").alias("min_str"),
                        F.col(f"__max{i}").alias("max_str"),
                    )
                    for i, c in enumerate(cols)
                ]
            )
        ).alias("r")
    ).select("r.*")
    return report


def json_key_census(df: DataFrame, json_col: str = "payload") -> DataFrame:
    """Schema-drift census over a JSON event column: per key, how many
    events carry it and the fraction of all events — the payload-level
    profile that catches producers adding/dropping/renaming fields
    before a downstream spec breaks (pairs with datasheet_diff for
    version-over-version comparison).

    One `json_object_keys` explode + a key-grain groupBy; the total is
    a 1-row broadcast. Fraction is a single IEEE division of exact
    longs. Top-level keys only (nested drift shows up as a top-level
    payload key changing shape, which the extract layer's typed
    coercion already surfaces per field).
    """
    keys = df.select(
        F.explode(F.json_object_keys(F.col(json_col))).alias("key")
    )
    tot = df.agg(F.count(F.lit(1)).alias("__n_events"))
    return (
        keys.groupBy("key")
        .agg(F.count(F.lit(1)).alias("n_events"))
        .join(F.broadcast(tot))
        .select(
            "key",
            "n_events",
            (F.col("n_events") / F.col("__n_events")).alias("frac"),
        )
    )
