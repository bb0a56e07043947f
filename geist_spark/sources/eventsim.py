"""eventsim source: synthetic JSON event generator.

Re-expression of the reference's eventsim connector
(internal/pkg/entity/eventsim/eventsim.go) as pure column expressions:
every generator compiles to JVM-side exprs over a seed id column, so
event generation runs at codegen speed with zero Python per row.

- batch tick:  spark.range(count) -> select(event_json)
- streaming:   rate-micro-batch source emitting maxCount rows/batch,
  rows beyond the tick's target count filtered out by a per-batch
  deterministic count expression — variable-rate generation without a
  custom source.

Generator parity (citations into /root/reference):
- predefinedValues weighted pick via cumulative frequency ranges
  (eventsim.go:575-624); zero factor -> 1 (eventsim.go:585-588)
- randomizedValue int/float/string/bool/uuid/isoTimestampMillis/Micros
  (eventsim.go:457-509,520-562); float keeps the reference's quirk
  value = clamp(rand()*max, min) (eventsim.go:520-526); custom
  charsets injectable (config.go:101-110)
- setOfStrings expansion to predefined values prefix1..N minus
  excludes, optional random weight in [frequencyMin,frequencyMax]
  (setofstrings.go:8-57)
- overrides: condition field == value -> re-generate listed fields
  (eventsim.go:374-396). Conditions read the ORIGINAL generated value
  (the reference re-reads the partially-updated event; identical
  unless an override rewrites a later override's condition field)
- count per tick: random uniform / sinusoid around peakTime forced
  into the past year (eventsim.go:399-420,290-302)
- sjson dotted field paths create nested JSON (eventsim.go:423-438);
  field order = spec order, null values emitted (sjson parity)
"""

from __future__ import annotations

import math
import random
import time as _time
from dataclasses import dataclass, field
from typing import Any

from pyspark.sql import Column, DataFrame, SparkSession, functions as F

DEFAULT_SIM_RESOLUTION_MS = 5000
DEFAULT_MAX_FRACTION_DIGITS = 2
DEFAULT_CHARSET = "ABCDEFGHIJKLMNOPQRSTUVWXYZabcdefghijklmnopqrstuvwxyz"


@dataclass
class FieldGen:
    field: str
    predefined: list[tuple[Any, int]] = field(default_factory=list)
    randomized: dict[str, Any] | None = None


@dataclass
class SimConfig:
    resolution_ms: int = DEFAULT_SIM_RESOLUTION_MS
    gen_type: str = ""  # "", "random", "sinusoid"
    min_count: int = 0
    max_count: int = 0
    period_seconds: int = 0
    peak_time: str = ""
    fields: list[FieldGen] = field(default_factory=list)
    overrides: list[dict] = field(default_factory=list)


def parse_sim_config(
    custom_config: dict, charsets: dict[str, str] | None = None, rng: random.Random | None = None
) -> SimConfig:
    cc = custom_config or {}
    rng = rng or random.Random()
    gen = cc.get("eventGeneration") or {}
    cfg = SimConfig(
        resolution_ms=int(cc.get("simResolutionMilliseconds") or DEFAULT_SIM_RESOLUTION_MS),
        gen_type=gen.get("type", ""),
        min_count=int(gen.get("minCount", 0)),
        max_count=int(gen.get("maxCount", 0)),
        period_seconds=int(gen.get("periodSeconds", 0)),
        peak_time=gen.get("peakTime", ""),
        overrides=list(cc.get("overrides") or []),
    )
    for f in (cc.get("eventSpec") or {}).get("fields") or []:
        cfg.fields.append(_parse_field(f, rng))
    return cfg


def _parse_field(f: dict, rng: random.Random) -> FieldGen:
    fg = FieldGen(field=f.get("field", ""))
    if f.get("setOfStrings"):
        # expansion per setofstrings.go:8-57
        ss = f["setOfStrings"]
        amount = int(ss.get("amount", 0))
        prefix = ss.get("prefix", "")
        excludes = set(ss.get("excludeValues") or [])
        fmin, fmax = int(ss.get("frequencyMin", 0)), int(ss.get("frequencyMax", 0))
        for i in range(amount):
            value = f"{prefix}{i + 1}"
            if value in excludes:
                continue
            factor = 1
            if fmax >= 1 and fmin >= 1 and fmax > fmin:
                factor = rng.randint(fmin, fmax)
            fg.predefined.append((value, factor))
    elif f.get("predefinedValues"):
        for pv in f["predefinedValues"]:
            fg.predefined.append((pv.get("value"), int(pv.get("frequencyFactor", 0)) or 1))
    elif f.get("randomizedValue"):
        fg.randomized = f["randomizedValue"]
    return fg


class EventSim:
    """Compiles a SimConfig to a JSON-event column expression."""

    def __init__(
        self,
        cfg: SimConfig,
        seed: int | None = None,
        charsets: dict[str, str] | None = None,
    ):
        self.cfg = cfg
        self.seed = seed
        self.charsets = dict(charsets or {})
        self._salt = 0

    # -- randomness helpers -----------------------------------------

    def _rand(self, id_col: Column | None = None) -> Column:
        """Uniform [0,1) column; independent per call site.

        Seeded runs derive the uniform from md5(row id, call site, seed)
        rather than F.rand(seed): rand(seed) is partition-dependent, so
        seeded output would change with cluster parallelism. The hash
        form is partition-invariant (the same row id generates the same
        event on 1 or 1000 executors) and exactly replayable by the
        DuckDB oracle (13 hex chars = 52 bits -> exact double)."""
        self._salt += 1
        if self.seed is not None and id_col is not None:
            h = F.md5(
                F.concat(
                    id_col.cast("string"),
                    F.lit(f"|r|{self._salt}|{self.seed}"),
                )
            )
            return F.conv(F.substring(h, 1, 13), 16, 10).cast("double") / F.lit(
                float(1 << 52)
            )
        if self.seed is not None:
            return F.rand(self.seed + self._salt)
        return F.rand()

    def _hash_pick(self, id_col: Column, pos: Column, modulo: Column) -> Column:
        """Deterministic per (row, position) index in [0, modulo) —
        usable inside higher-order lambdas where rand() is not."""
        self._salt += 1
        return F.pmod(
            F.xxhash64(id_col, pos, F.lit(self.seed or 0), F.lit(self._salt)), modulo
        )

    # -- field generators (eventsim.go:440-509) ---------------------

    def _gen_value(self, fg: FieldGen, id_col: Column) -> tuple[Column, str]:
        """-> (expr, kind) where kind hints the JSON scalar type."""
        if fg.predefined:
            return self._gen_predefined(fg, id_col)
        v = fg.randomized or {}
        t = v.get("type", "")
        lo, hi = float(v.get("min", 0)), float(v.get("max", 0))
        if t in ("int", "integer"):
            return (
                F.floor(self._rand(id_col) * (hi + 1 - lo) + lo).cast("long"),
                "long",
            )
        if t == "float":
            digits = int(v.get("maxFractionDigits", 0)) or DEFAULT_MAX_FRACTION_DIGITS
            # reference quirk: rand()*max clamped up to min (eventsim.go:520-526)
            return F.round(F.greatest(self._rand(id_col) * hi, F.lit(lo)), digits), "double"
        if t == "string":
            cs = self.charsets.get(v.get("charset", ""), DEFAULT_CHARSET)
            cs_arr = F.array(*[F.lit(c) for c in cs])
            strlen = F.floor(self._rand(id_col) * (hi + 1 - lo) + lo).cast("int")
            chars = F.transform(
                F.sequence(F.lit(1), strlen),
                lambda i: F.element_at(
                    cs_arr, (self._hash_pick(id_col, i, F.lit(len(cs))) + 1).cast("int")
                ),
            )
            return F.array_join(chars, ""), "string"
        if t in ("bool", "boolean"):
            return (self._rand(id_col) < 0.5), "boolean"
        if t == "uuid":
            if self.seed is None:
                return F.expr("uuid()"), "string"
            h = F.md5(F.concat(id_col.cast("string"), F.lit(f"|uuid|{self.seed}")))
            return (
                F.concat_ws(
                    "-",
                    F.substring(h, 1, 8),
                    F.substring(h, 9, 4),
                    F.substring(h, 13, 4),
                    F.substring(h, 17, 4),
                    F.substring(h, 21, 12),
                ),
                "string",
            )
        if t in ("isoTimestampMilliseconds", "isoTimestampMicroseconds"):
            jitter_ms = int(v.get("jitterMilliseconds", 0))
            ts = F.current_timestamp()
            if jitter_ms:
                delta_us = ((self._rand(id_col) * 2 - 1) * jitter_ms * 1000).cast("long")
                ts = F.timestamp_micros(F.unix_micros(ts) + delta_us)
            fmt = (
                "yyyy-MM-dd'T'HH:mm:ss.SSS'Z'"
                if t == "isoTimestampMilliseconds"
                else "yyyy-MM-dd'T'HH:mm:ss.SSSSSS'Z'"
            )
            return F.date_format(ts, fmt), "string"
        raise ValueError(f"unsupported type for randomized values: {t}")

    def _gen_predefined(self, fg: FieldGen, id_col: Column | None = None) -> tuple[Column, str]:
        """Weighted pick via cumulative ranges (eventsim.go:575-624)."""
        total = sum(factor for _, factor in fg.predefined)
        r = F.floor(self._rand(id_col) * total)
        kind = _common_kind([v for v, _ in fg.predefined])
        expr: Column | None = None
        acc = 0
        for value, factor in fg.predefined:
            acc += factor
            lit = F.lit(value) if value is not None else F.lit(None).cast(kind)
            expr = F.when(r < acc, lit) if expr is None else expr.when(r < acc, lit)
        return expr, kind

    # -- event assembly (nested sjson paths -> struct) ---------------

    def event_expr(self, id_col: Column) -> Column:
        """One JSON event per row (a string column)."""
        gen: dict[str, Column] = {}
        kinds: dict[str, str] = {}
        for fg in self.cfg.fields:
            expr, kind = self._gen_value(fg, id_col)
            gen[fg.field] = expr
            kinds[fg.field] = kind

        # overrides (eventsim.go:374-396): conditions on generated values
        for ov in self.cfg.overrides:
            if ov.get("disabled") or not (ov.get("condition") or {}).get("field"):
                continue
            cond_field = ov["condition"]["field"]
            cond_value = ov["condition"].get("value", "")
            base = gen.get(cond_field)
            if base is None:
                continue
            cond = base.cast("string") == cond_value
            rng = random.Random(self.seed)
            for fspec in ov.get("fields") or []:
                fg = _parse_field(fspec, rng)
                expr, kind = self._gen_value(fg, id_col)
                if fg.field in gen:
                    gen[fg.field] = F.when(cond, expr).otherwise(gen[fg.field])
                else:
                    gen[fg.field] = F.when(cond, expr)
                    kinds[fg.field] = kind

        # nested dotted paths -> struct tree, field order = spec order
        tree: dict = {}
        for path, expr in gen.items():
            node = tree
            keys = path.split(".")
            for k in keys[:-1]:
                node = node.setdefault(k, {})
            node[keys[-1]] = expr

        def build(node: dict) -> Column:
            parts = []
            for k, v in node.items():
                child = build(v) if isinstance(v, dict) else v
                parts.append(child.alias(k))
            return F.struct(*parts)

        # sjson emits nulls; to_json drops them unless told otherwise
        return F.to_json(build(tree), {"ignoreNullFields": "false"})

    # -- tick count (eventsim.go:399-420) ----------------------------

    def event_count(self, at: float | None = None) -> int:
        g = self.cfg
        if g.gen_type == "random":
            rng = random.Random(self.seed)
            return rng.randint(g.min_count, g.max_count)
        if g.gen_type == "sinusoid":
            return self._sinusoid_count(at if at is not None else _time.time())
        return 1

    def _sinusoid_count(self, now: float) -> int:
        g = self.cfg
        peak = _peak_time_epoch(g.peak_time)
        angle = (now - peak) / g.period_seconds * 2 * math.pi
        value = (math.cos(angle) + 1) / 2 * (g.max_count - g.min_count) + g.min_count
        return int(round(value))

    def _count_expr(self, ts: Column) -> Column:
        """Per-batch deterministic event count from the batch timestamp
        (streaming path)."""
        g = self.cfg
        if g.gen_type == "random":
            span = g.max_count - g.min_count + 1
            return (
                F.pmod(F.xxhash64(F.date_trunc("second", ts), F.lit(self.seed or 0)), F.lit(span))
                + g.min_count
            )
        if g.gen_type == "sinusoid":
            peak = _peak_time_epoch(g.peak_time)
            angle = (ts.cast("double") - peak) / g.period_seconds * 2 * math.pi
            return F.round(
                (F.cos(angle) + 1) / 2 * (g.max_count - g.min_count) + g.min_count
            ).cast("int")
        return F.lit(1)

    # -- sources ------------------------------------------------------

    def batch(self, spark: SparkSession, count: int | None = None) -> DataFrame:
        """One tick's events as a batch DataFrame (value: string)."""
        n = count if count is not None else self.event_count()
        return spark.range(n).select(self.event_expr(F.col("id")).alias("value"))

    def stream(self, spark: SparkSession) -> DataFrame:
        """Streaming generator: rate-micro-batch emits max_count rows
        per tick; rows beyond the tick's target count are dropped by
        the count expression. All JVM-side."""
        g = self.cfg
        rows_per_batch = max(g.max_count, 1)
        # one generator partition per ~10k rows, else tiny batches fan
        # out to defaultParallelism tasks (32 tasks for 5 rows)
        num_partitions = max(1, min(rows_per_batch // 10_000, 32))
        base = (
            spark.readStream.format("rate-micro-batch")
            .option("rowsPerBatch", rows_per_batch)
            .option("numPartitions", num_partitions)
            .option("advanceMillisPerBatch", g.resolution_ms)
            .load()
        )
        keep = F.pmod(F.col("value"), F.lit(rows_per_batch)) < self._count_expr(
            F.col("timestamp")
        )
        return base.filter(keep).select(
            self.event_expr(F.col("value")).alias("value")
        )


def _common_kind(values: list[Any]) -> str:
    non_null = [v for v in values if v is not None]
    if not non_null:
        return "string"
    if all(isinstance(v, bool) for v in non_null):
        return "boolean"
    if all(isinstance(v, int) and not isinstance(v, bool) for v in non_null):
        return "long"
    if all(isinstance(v, (int, float)) and not isinstance(v, bool) for v in non_null):
        return "double"
    if all(isinstance(v, str) for v in non_null):
        return "string"
    raise ValueError(f"predefinedValues must share one JSON scalar type: {values}")


def _peak_time_epoch(peak_time: str) -> float:
    """Peak time parsed and forced into the past year (eventsim.go:290-302)."""
    import datetime

    if not peak_time:
        return 0.0
    t = datetime.datetime.strptime(peak_time, "%Y-%m-%dT%H:%M:%SZ")
    now_last_year = datetime.datetime.utcnow().replace(year=datetime.datetime.utcnow().year - 1)
    safe = t.replace(year=now_last_year.year)
    return safe.replace(tzinfo=datetime.timezone.utc).timestamp()
