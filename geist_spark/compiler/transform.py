"""Spec -> DataFrame transform compiler (the engine core).

The reference interprets the transform spec per event
(entity/transform/transformer.go:41-84). Here the spec compiles ONCE
into Catalyst column expressions applied to a whole DataFrame — batch
and Structured Streaming share the compiled plan.

Design for scale: a spec with K extract blocks is NOT compiled to a
K-way union (which would scan the source K times). Every block becomes
a nullable struct column over ONE scan; the array of structs is
exploded and null (non-applicable) entries dropped. Single pass, no
shuffle, whole-stage-codegen friendly; per-event record order (block
order) is preserved inside the array, matching the reference's append
order (transformer.go:151-175).

Semantics replicated exactly (citations into /root/reference):
- excludeEventsWith black/white/empty, OR across filters
  (entity/transform/transformer.go:86-149)
- excludeEventsWithMultipleConditions, AND within / OR across
  (transformer.go:55-63,115-122)
- forEventsWith equality dispatch with number->string matching
  (transformer.go:272-300; the reference loop keeps the last filter's
  verdict — we implement the documented AND semantics, identical for
  all well-formed specs incl. every spec in the reference test corpus)
- extractFields with gjson zero-value coercion: missing string -> "",
  missing int/float -> 0, missing bool -> false
  (transformer.go:302-334); event split: every matching block appends
  one record
- extractItemsFromArray -> map {itemId: rawItemJson}, empty ids
  dropped (transformer.go:336-359)
- regexp named groups -> alphabetically-key-ordered JSON under
  "regexppayload" (Go map marshal order, transformer.go:260-265),
  applied to the raw event or to a previously extracted field (first
  applicable block declaring it; field dropped unless keepField;
  transformer.go:201-226). Non-matching events are ERRORS
  (transformer.go:229-242) routed to `rejected()`, not silently empty
  — the engine applies the spec's HOUE policy (discard/dlq/fail).
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field as dc_field

from pyspark.sql import Column, DataFrame, functions as F, types as T

from geist_spark.functions.json_path import json_col, json_str, spark_type_for
from geist_spark.functions.timeconv import convert_time
from geist_spark.spec.model import (
    ExcludeEventsWith,
    ForEventsWith,
    Spec,
    SpecError,
    TransformSpec,
)

REGEXP_PAYLOAD_KEY = "regexppayload"


# ---------------------------------------------------------------- filters


def exclude_condition(value: Column, filters: list[ExcludeEventsWith]) -> Column:
    """True -> exclude. OR across filter objects (transformer.go:86-113).

    Per filter: valueIsEmpty first, then blacklist (values), else
    whitelist (valuesNotIn); missing field coerces to ""."""
    cond = F.lit(False)
    for flt in filters:
        v = json_str(value, flt.key)
        this = F.lit(False)
        if flt.value_is_empty:
            this = this | (v == "")
        if flt.values:
            this = this | v.isin(flt.values)
        elif flt.values_not_in:
            this = this | ~v.isin(flt.values_not_in)
        cond = cond | this
    return cond


def multi_exclude_condition(
    value: Column, multi: list[list[ExcludeEventsWith]]
) -> Column:
    """OR across items; AND within an item's filters (transformer.go:115-122)."""
    cond = F.lit(False)
    for filters in multi:
        item = F.lit(True)
        for flt in filters:
            item = item & exclude_condition(value, [flt])
        cond = cond | item
    return cond


def applicable_condition(
    value: Column,
    few: list[ForEventsWith],
    excludes: list[ExcludeEventsWith] | None = None,
) -> Column:
    """forEventsWith dispatch: AND of equality checks; missing field ->
    not applicable; numeric fields match their string form
    (transformer.go:272-300)."""
    cond = F.lit(True)
    for kf in few:
        got = json_col(value, kf.key)  # null == missing
        cond = cond & got.isNotNull() & (got == kf.value)
    if excludes:
        cond = cond & ~exclude_condition(value, excludes)
    return cond


# ---------------------------------------------------------------- helpers


def _typed_extract(value: Column, json_path: str, spec_type: str) -> Column:
    """One extractFields field -> typed column with gjson zero-value
    semantics (transformer.go:302-334)."""
    t = (spec_type or "string").lower()
    if not json_path:
        # raw-event field: the whole event. Reference yields []byte
        # unless type=="string" (transformer.go:361-368); both are
        # StringType here.
        return value
    raw = json_col(value, json_path)
    if t == "string":
        return F.coalesce(raw, F.lit(""))
    if t in ("int", "integer"):
        return F.coalesce(raw.cast(T.LongType()), F.lit(0))
    if t == "float":
        return F.coalesce(raw.cast(T.DoubleType()), F.lit(0.0))
    if t in ("bool", "boolean"):
        return F.coalesce(raw.cast(T.BooleanType()), F.lit(False))
    if t == "isotimestamp":
        return F.to_timestamp(raw)
    if t == "unixtimestamp":
        return F.timestamp_millis(F.coalesce(raw.cast(T.LongType()), F.lit(0)))
    if t == "useragent":
        from geist_spark.functions.ua import ua_udf

        return ua_udf(F.coalesce(raw, F.lit("")))
    raise SpecError(f"unknown extract field type: {spec_type}")


def _go_regex_to_java(expr: str) -> tuple[str, list[str]]:
    """RE2 named-group pattern -> Java pattern + ordered group names.

    Named groups become plain capture groups (group i+1): Java
    restricts group-name charsets, and the reference itself zips ALL
    submatches against the named-group list (transformer.go:243-247),
    i.e. specs use named groups exclusively."""
    names = re.findall(r"\(\?P?<([^>]+)>", expr)
    java = re.sub(r"\(\?P?<[^>]+>", "(", expr)
    return java, names


@dataclass
class _BranchSpec:
    kind: str  # "fields" | "array"
    builder: object  # callable(value) -> (applicable, {id: col})
    field_ids: list[str] = dc_field(default_factory=list)
    types: dict[str, T.DataType] = dc_field(default_factory=dict)


# ---------------------------------------------------------------- compiler


class CompiledTransform:
    """Call `apply(df)` for the happy path, `rejected(df)` for rows the
    reference errors on (regexp non-match / time-conversion failure)."""

    def __init__(self, spec: TransformSpec):
        self.spec = spec
        self._analyze()

    # -- analysis (once, no Spark objects kept across applies) -------

    def _analyze(self) -> None:
        t = self.spec
        self.has_excludes = bool(t.exclude_events_with or t.exclude_multi)
        rx = t.regexp
        self._rx = rx
        if rx is not None:
            self._rx_java, self._rx_names = _go_regex_to_java(rx.expression)
            if rx.field and not t.extract_fields:
                raise SpecError(f"regexp field {rx.field} requires extractFields")

        # merged output schema: (id, type) in first-seen block order
        merged: dict[str, T.DataType] = {}

        def add(fid: str, ftype: T.DataType) -> None:
            if fid in merged and merged[fid] != ftype:
                raise SpecError(
                    f"field {fid} has conflicting types across blocks: "
                    f"{merged[fid]} vs {ftype}"
                )
            merged.setdefault(fid, ftype)

        self._declaring: list[int] = []  # extract-block idxs declaring rx.field
        for i, ef in enumerate(t.extract_fields):
            for f in ef.fields:
                if rx is not None and not rx.keep_field and f.id == rx.field:
                    # consumed by regexp; dropped unless another
                    # non-declaring path emits it (per-row null when
                    # multiple declaring blocks exist)
                    if len(t.extract_fields) > 1:
                        add(f.id, spark_type_for(f.type if f.json_path else "string"))
                else:
                    add(f.id, spark_type_for(f.type if f.json_path else "string"))
            if rx is not None and rx.field and any(
                f.id == rx.field for f in ef.fields
            ):
                self._declaring.append(i)
        for ia in t.extract_items_from_array:
            add(ia.id, T.MapType(T.StringType(), T.StringType()))
        if rx is not None and (rx.field or not (t.extract_fields or t.extract_items_from_array)):
            add(REGEXP_PAYLOAD_KEY, T.StringType())

        self.output_fields: list[tuple[str, T.DataType]] = list(merged.items())
        self.output_schema = T.StructType(
            [T.StructField(n, ty, True) for n, ty in self.output_fields]
        )

    # -- expression builders (per apply, bound to the value column) --

    def _exclude_cond(self, value: Column) -> Column:
        t = self.spec
        cond = F.lit(False)
        if t.exclude_events_with:
            cond = cond | exclude_condition(value, t.exclude_events_with)
        if t.exclude_multi:
            cond = cond | multi_exclude_condition(
                value, [m.filters for m in t.exclude_multi]
            )
        return cond

    def _rx_payload(self, src: Column) -> Column:
        rx, names, java = self._rx, self._rx_names, self._rx_java
        tc = rx.time_conversion
        vals: dict[str, Column] = {}
        for i, name in enumerate(names):
            v = F.regexp_extract(src, java, i + 1)
            if tc is not None and name == tc.field:
                v = convert_time(v, tc.input_format, tc.output_format or None)
            vals[name] = v
        # Go marshals map keys alphabetically (transformer.go:260-265)
        return F.to_json(F.struct(*[vals[n].alias(n) for n in sorted(names)]))

    def _rx_fail(self, src: Column) -> Column:
        rx, names, java = self._rx, self._rx_names, self._rx_java
        fail = ~src.rlike(java)
        tc = rx.time_conversion
        if tc is not None:
            conv = convert_time(
                F.regexp_extract(src, java, names.index(tc.field) + 1),
                tc.input_format,
                None,
            )
            fail = fail | conv.isNull()
        return fail

    def _branches(self, value: Column) -> list[tuple[Column, dict[str, Column]]]:
        """-> [(applicable, {field id: expr})] in block order."""
        t = self.spec
        rx = self._rx
        out: list[tuple[Column, dict[str, Column]]] = []

        declaring_apps: list[Column] = []  # applicability of earlier declaring blocks
        for i, ef in enumerate(t.extract_fields):
            app = applicable_condition(
                value, ef.for_events_with, ef.exclude_events_with
            )
            cols = {
                f.id: _typed_extract(value, f.json_path, f.type) for f in ef.fields
            }
            if rx is not None and rx.field and i in self._declaring:
                src = cols[rx.field]
                # only the FIRST applicable declaring block carries the
                # payload for a given event (transformer.go:207-226)
                first = F.lit(True)
                for earlier in declaring_apps:
                    first = first & ~earlier
                cols[REGEXP_PAYLOAD_KEY] = F.when(first, self._rx_payload(src))
                if not rx.keep_field:
                    if len(t.extract_fields) == 1:
                        del cols[rx.field]
                    else:
                        cols[rx.field] = F.when(first, F.lit(None)).otherwise(src)
                declaring_apps.append(app)
            out.append((app, cols))

        for ia in t.extract_items_from_array:
            arr = F.from_json(
                json_col(value, ia.items.json_path_to_array),
                T.ArrayType(T.StringType()),
            )
            idf = ia.items.id_from_item_fields

            def _entry(delim: str, flds: list[str]):
                # nb: F.transform passes (elem, idx) to 2-arg lambdas,
                # so capture spec values via this factory instead
                def inner(x: Column) -> Column:
                    return F.struct(
                        F.concat_ws(
                            delim, *[json_str(x, fld) for fld in flds]
                        ).alias("key"),
                        x.alias("value"),
                    )

                return inner

            entries = F.transform(arr, _entry(idf.delimiter, idf.fields))
            item_map = F.map_from_entries(F.filter(entries, lambda e: e["key"] != ""))
            out.append(
                (
                    applicable_condition(value, ia.for_events_with),
                    {
                        ia.id: F.coalesce(
                            item_map,
                            F.from_json(
                                F.lit("{}"),
                                T.MapType(T.StringType(), T.StringType()),
                            ),
                        )
                    },
                )
            )

        if rx is not None and not rx.field and not out:
            # regexp over the raw event, no extract blocks
            out.append((F.lit(True), {REGEXP_PAYLOAD_KEY: self._rx_payload(value)}))
        return out

    def _error_cond(self, value: Column) -> Column | None:
        """Rows the reference's Transform() returns an error for."""
        rx = self._rx
        if rx is None:
            return None
        t = self.spec
        if not rx.field:
            # applyRegExp always runs on the raw event (even when its
            # payload would be discarded, transformer.go:179-198)
            return self._rx_fail(value)
        # field mode: fail on the field bytes of the first applicable
        # declaring block; if no block matched at all -> "field not
        # extracted" error; if blocks matched but none declares the
        # field -> regexp runs on the raw event (transformer.go:201-226)
        branches = []
        for i, ef in enumerate(t.extract_fields):
            app = applicable_condition(value, ef.for_events_with, ef.exclude_events_with)
            branches.append((i, app, ef))
        any_app = F.lit(False)
        for _, app, _ef in branches:
            any_app = any_app | app
        chain: Column | None = None
        for i, app, ef in branches:
            if i in self._declaring:
                src = _typed_extract(
                    value,
                    next(f.json_path for f in ef.fields if f.id == rx.field),
                    next(f.type for f in ef.fields if f.id == rx.field),
                )
                cond = self._rx_fail(src)
                chain = F.when(app, cond) if chain is None else chain.when(app, cond)
        fallback = self._rx_fail(value)  # no declaring block applicable
        body = fallback if chain is None else chain.otherwise(fallback)
        # no extract output at all -> "wanted field was not extracted"
        return F.when(~any_app, F.lit(True)).otherwise(body)

    # -- public ------------------------------------------------------

    def apply(
        self,
        df: DataFrame,
        value_col: str = "value",
        keep_cols: tuple[str, ...] = (),
        with_branch: bool = False,
    ) -> DataFrame:
        """Happy-path output: one row per emitted record (event-split
        events emit several rows, in block order)."""
        value = F.col(value_col)
        kept = df
        if self.has_excludes:
            kept = kept.filter(~self._exclude_cond(value))
        err = self._error_cond(value)
        if err is not None:
            kept = kept.filter(~err)

        branches = self._branches(value)
        structs: list[Column] = []
        for i, (app, cols) in enumerate(branches):
            fields = []
            for fid, ftype in self.output_fields:
                if fid in cols:
                    fields.append(cols[fid].cast(ftype).alias(fid))
                else:
                    fields.append(F.lit(None).cast(ftype).alias(fid))
            if with_branch:
                fields.append(F.lit(i).alias("__branch"))
            structs.append(F.when(app, F.struct(*fields)))
        if not structs:
            # excludes-only spec: reference emits no records
            return kept.select(*keep_cols).limit(0)
        recs = F.array(*structs)
        out = kept.select(
            *[F.col(c) for c in keep_cols],
            F.explode(F.filter(recs, lambda r: r.isNotNull())).alias("__rec"),
        )
        rec_cols = [f"__rec.{fid}" for fid, _ in self.output_fields]
        if with_branch:
            rec_cols.append("__rec.__branch")
        return out.select(*keep_cols, *rec_cols)

    def rejected(self, df: DataFrame, value_col: str = "value") -> DataFrame:
        """Original rows the reference would error on (HOUE routing)."""
        err = self._error_cond(F.col(value_col))
        if err is None:
            return df.limit(0)
        kept = df
        if self.has_excludes:
            kept = kept.filter(~self._exclude_cond(F.col(value_col)))
        return kept.filter(err)


def compile_transform(spec: Spec | TransformSpec) -> CompiledTransform:
    t = spec.transform if isinstance(spec, Spec) else spec
    return CompiledTransform(t)
