"""Batch literal constructors: one py4j call per ARRAY, not per element.

Building literal arrays element-wise (`F.array(*[F.lit(v) for v in
vals])`) costs one py4j round trip per element. On this class of
sandboxed/virtualized hosts a round trip measures 6-30 ms, so a
k-means centroid matrix (8x64 longs, rebuilt every Lloyd iteration)
was costing 10+ SECONDS of pure driver time per iteration — 100x the
actual cluster work at test scale, and wall-clock noise that tracks
host latency, not the plan. These helpers serialize the whole array
into ONE SQL text expression (`F.expr("array(1L,2L,...)")`): a single
round trip, parsed JVM-side (measured 0.05 s for the same matrix —
280x faster), with identical resulting literals:

- longs are emitted with the `L` suffix (BIGINT);
- doubles via CAST('<repr>' AS DOUBLE): Python's repr round-trips the
  IEEE value exactly and Spark's parser reads it back bit-identically
  (verified, including subnormal-ish and negative-zero cases);
- strings are SQL-escaped: backslashes doubled FIRST (Spark's
  default parser processes backslash escapes inside literals — a lone
  '\\b' would come back as backspace and a trailing backslash would
  eat the closing quote), then '' quote doubling.

Empty input is rejected: `array()` has no element type to infer —
callers always have at least one element (a zero-size literal table
is a bug upstream).
"""

from __future__ import annotations

from pyspark.sql import Column, functions as F


def _check(vals, kind: str) -> list:
    vals = list(vals)  # materialize: a generator is always truthy
    if not vals:
        raise ValueError(f"empty {kind} literal array")
    return vals


def _longs(vals) -> str:
    """SQL fragment 'array(<v>L,...)' — the single place the BIGINT
    literal spelling lives (long_array, long_matrix, and composed
    struct builders like classify.centroid_classify all use it)."""
    return "array(" + ",".join(f"{int(v)}L" for v in vals) + ")"


def long_array(vals) -> Column:
    """array<bigint> literal in one expression call."""
    return F.expr(_longs(_check(vals, "long")))


def long_matrix(rows) -> Column:
    """array<array<bigint>> literal in one expression call."""
    rows = _check(rows, "long-matrix")
    return F.expr("array(" + ",".join(_longs(r) for r in rows) + ")")


def double_array(vals) -> Column:
    """array<double> literal in one expression call, IEEE-exact."""
    vals = _check(vals, "double")
    return F.expr(
        "array("
        + ",".join(f"CAST('{float(v)!r}' AS DOUBLE)" for v in vals)
        + ")"
    )


def string_array(vals) -> Column:
    """array<string> literal in one expression call."""
    vals = _check(vals, "string")
    quoted = ",".join(
        "'" + str(v).replace("\\", "\\\\").replace("'", "''") + "'"
        for v in vals
    )
    return F.expr(f"array({quoted})")
