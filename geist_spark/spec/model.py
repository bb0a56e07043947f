"""Stream-spec model: the engine's "query language".

Mirrors the reference's spec surface (reference: entity/spec.go:36-377,
entity/regexp.go:16-66) as Python dataclasses with the same JSON field
names, defaults (entity/spec.go:10-18,88-196) and validation behavior
(structural validation replacing the embedded JSON-Schema at
entity/spec.go:409-547, plus regexp semantic validation at
entity/regexp.go:42-66).

A spec declares Source -> Transform -> Sink; the compiler
(geist_spark.compiler) turns the transform into a DataFrame->DataFrame
function and the engine binds source/sink around it.
"""

from __future__ import annotations

import json
import re
from dataclasses import dataclass, field
from typing import Any

DEFAULT_STREAMS_PER_POD = 1
DEFAULT_MICRO_BATCH_SIZE = 500
DEFAULT_MICRO_BATCH_BYTES = 5_000_000
DEFAULT_MICRO_BATCH_TIMEOUT_MS = 15_000
DEFAULT_MAX_EVENT_PROCESSING_RETRIES = 5
DEFAULT_MAX_STREAM_RETRY_BACKOFF_SEC = 300

HOUE_DEFAULT = "default"
HOUE_DISCARD = "discard"
HOUE_DLQ = "dlq"
HOUE_FAIL = "fail"

GEIST_INGESTION_TIME = "@GeistIngestionTime"

_VALID_FIELD_TYPES = {
    "", "string", "int", "integer", "number", "float", "bool", "boolean",
    "isoTimestamp", "unixTimestamp", "userAgent", "urlNormalize",
}


class SpecError(ValueError):
    """Raised on structurally or semantically invalid stream specs."""


@dataclass
class Property:
    key: str
    value: str


@dataclass
class Ops:
    streams_per_pod: int = DEFAULT_STREAMS_PER_POD
    disabled: bool | None = None
    micro_batch: bool = False
    micro_batch_size: int = DEFAULT_MICRO_BATCH_SIZE
    micro_batch_bytes: int = DEFAULT_MICRO_BATCH_BYTES
    micro_batch_timeout_ms: int = DEFAULT_MICRO_BATCH_TIMEOUT_MS
    max_event_processing_retries: int = DEFAULT_MAX_EVENT_PROCESSING_RETRIES
    max_stream_retry_backoff_interval_sec: int = DEFAULT_MAX_STREAM_RETRY_BACKOFF_SEC
    handling_of_unretryable_events: str = HOUE_DEFAULT
    log_event_data: bool = False
    custom_properties: dict[str, str] = field(default_factory=dict)

    @staticmethod
    def from_dict(d: dict[str, Any]) -> "Ops":
        o = Ops(
            streams_per_pod=int(d.get("streamsPerPod") or 0),
            disabled=d.get("disabled"),
            micro_batch=bool(d.get("microBatch", False)),
            micro_batch_size=int(d.get("microBatchSize") or 0),
            micro_batch_bytes=int(d.get("microBatchBytes") or 0),
            micro_batch_timeout_ms=int(d.get("microBatchTimeoutMs") or 0),
            max_event_processing_retries=int(d.get("maxEventProcessingRetries") or 0),
            max_stream_retry_backoff_interval_sec=int(
                d.get("maxStreamRetryBackoffIntervalSec") or 0
            ),
            handling_of_unretryable_events=d.get("handlingOfUnretryableEvents", ""),
            log_event_data=bool(d.get("logEventData", False)),
            custom_properties=dict(d.get("customProperties") or {}),
        )
        o.ensure_valid_defaults()
        return o

    def ensure_valid_defaults(self) -> None:
        # reference entity/spec.go:172-196
        if self.streams_per_pod <= 0:
            self.streams_per_pod = DEFAULT_STREAMS_PER_POD
        if self.micro_batch:
            if self.micro_batch_size <= 0:
                self.micro_batch_size = DEFAULT_MICRO_BATCH_SIZE
            if self.micro_batch_bytes <= 0:
                self.micro_batch_bytes = DEFAULT_MICRO_BATCH_BYTES
            if self.micro_batch_timeout_ms <= 0:
                self.micro_batch_timeout_ms = DEFAULT_MICRO_BATCH_TIMEOUT_MS
        if self.max_event_processing_retries <= 0:
            self.max_event_processing_retries = DEFAULT_MAX_EVENT_PROCESSING_RETRIES
        if self.max_stream_retry_backoff_interval_sec <= 0:
            self.max_stream_retry_backoff_interval_sec = (
                DEFAULT_MAX_STREAM_RETRY_BACKOFF_SEC
            )
        if not self.handling_of_unretryable_events:
            self.handling_of_unretryable_events = HOUE_DEFAULT


@dataclass
class SourceSpec:
    type: str
    properties: list[Property] = field(default_factory=list)
    custom_config: Any = None

    @staticmethod
    def from_dict(d: dict[str, Any]) -> "SourceSpec":
        cfg = d.get("config") or {}
        return SourceSpec(
            type=d.get("type", ""),
            properties=[
                Property(p.get("key", ""), p.get("value", ""))
                for p in (cfg.get("properties") or [])
            ],
            custom_config=cfg.get("customConfig"),
        )

    def prop(self, key: str, default: str = "") -> str:
        for p in self.properties:
            if p.key == key:
                return p.value
        return default


@dataclass
class SinkSpec:
    type: str
    properties: list[Property] = field(default_factory=list)
    custom_config: Any = None

    @staticmethod
    def from_dict(d: dict[str, Any]) -> "SinkSpec":
        cfg = d.get("config") or {}
        return SinkSpec(
            type=d.get("type", ""),
            properties=[
                Property(p.get("key", ""), p.get("value", ""))
                for p in (cfg.get("properties") or [])
            ],
            custom_config=cfg.get("customConfig"),
        )

    def prop(self, key: str, default: str = "") -> str:
        for p in self.properties:
            if p.key == key:
                return p.value
        return default


@dataclass
class ExcludeEventsWith:
    """Blacklist / whitelist / empty-check filter (entity/spec.go:260-277)."""

    key: str
    values: list[str] = field(default_factory=list)
    values_not_in: list[str] = field(default_factory=list)
    value_is_empty: bool | None = None

    @staticmethod
    def from_dict(d: dict[str, Any]) -> "ExcludeEventsWith":
        return ExcludeEventsWith(
            key=d.get("key", ""),
            values=list(d.get("values") or []),
            values_not_in=list(d.get("valuesNotIn") or []),
            value_is_empty=d.get("valueIsEmpty"),
        )


@dataclass
class MultiCondExclude:
    """AND-combination of filters; items OR'ed (entity/spec.go:279-285)."""

    filters: list[ExcludeEventsWith] = field(default_factory=list)


@dataclass
class ForEventsWith:
    """Equality dispatch predicate; numbers match their string form
    (entity/spec.go:326-334)."""

    key: str
    value: str


@dataclass
class FieldSpec:
    id: str
    json_path: str = ""  # empty -> bind whole raw event
    type: str = ""  # "" -> string

    @staticmethod
    def from_dict(d: dict[str, Any]) -> "FieldSpec":
        return FieldSpec(
            id=d.get("id", ""),
            json_path=d.get("jsonPath", ""),
            type=d.get("type", ""),
        )


@dataclass
class ExtractFields:
    for_events_with: list[ForEventsWith] = field(default_factory=list)
    exclude_events_with: list[ExcludeEventsWith] = field(default_factory=list)
    fields: list[FieldSpec] = field(default_factory=list)


@dataclass
class IdFromItemFields:
    delimiter: str = ""
    fields: list[str] = field(default_factory=list)


@dataclass
class ArrayItems:
    json_path_to_array: str = ""
    id_from_item_fields: IdFromItemFields = field(default_factory=IdFromItemFields)


@dataclass
class ExtractItemsFromArray:
    id: str = ""
    for_events_with: list[ForEventsWith] = field(default_factory=list)
    items: ArrayItems = field(default_factory=ArrayItems)


@dataclass
class TimeConv:
    field: str = ""
    input_format: str = ""
    output_format: str = ""


@dataclass
class RegexpSpec:
    expression: str = ""
    field: str = ""
    keep_field: bool = False
    time_conversion: TimeConv | None = None

    def collect_groups(self) -> list[str]:
        """Named capture groups in spec order (entity/regexp.go:69-88)."""
        return re.findall(r"\(\?P?<([^>]+)>", self.expression)

    def validate(self) -> None:
        # reference entity/regexp.go:42-66
        if not self.expression:
            raise SpecError("no RegExp is specified")
        try:
            re.compile(self._py_expression())
        except re.error as e:
            raise SpecError(f"error during RegExp compile: {e}") from e
        if not self.collect_groups():
            raise SpecError(
                f"no groupings where found in regular expression {self.expression}"
            )
        if self.time_conversion is not None:
            if not self.time_conversion.field:
                raise SpecError("regexp.timeConversion.field must be set")
            if not self.time_conversion.input_format:
                raise SpecError("regexp.timeConversion.inputFormat must be set")

    def _py_expression(self) -> str:
        # RE2 named groups are (?P<name>...); Python accepts that syntax.
        # RE2's (?<name>...) variant needs the P added for Python.
        return re.sub(r"\(\?<([^>]+)>", r"(?P<\1>", self.expression)


# -- analytics dialect extension (beyond the reference surface) ------
# The reference explicitly defers joins/aggregations to Spark
# (README.md:21,564). These spec sections expose Spark's windowed
# aggregation / streaming dedup as first-class declarative pipeline
# steps, applied AFTER the extract transform on its typed output.

_VALID_AGG_FNS = {
    "count",
    "sum",
    "avg",
    "min",
    "max",
    "count_distinct",
    "approx_count_distinct",
    "collect_set",
    "first",
    "last",
    "hll_sketch",
    "hll_estimate",
}


@dataclass
class AggregationSpec:
    fn: str
    field: str = ""
    alias: str = ""

    def validate(self) -> None:
        if self.fn not in _VALID_AGG_FNS:
            raise SpecError(f"invalid aggregation fn: {self.fn}")
        if self.fn != "count" and not self.field:
            raise SpecError(f"aggregation {self.fn} requires a field")
        if not self.alias:
            raise SpecError("aggregation requires an alias")


@dataclass
class AggregateSpec:
    group_by: list[str] = field(default_factory=list)
    aggregations: list[AggregationSpec] = field(default_factory=list)
    window_field: str = ""
    window_duration: str = ""
    window_slide: str = ""
    window_gap: str = ""  # session window (gap-based), exclusive with duration
    watermark_field: str = ""
    watermark_delay: str = ""
    output_mode: str = "update"  # foreachBatch mode for streaming aggs

    def validate(self) -> None:
        if not self.aggregations:
            raise SpecError("aggregate requires at least one aggregation")
        for a in self.aggregations:
            a.validate()
        if self.window_gap and self.window_duration:
            raise SpecError("aggregate.window: duration and gap are exclusive")
        if self.window_gap and not self.window_field:
            raise SpecError("aggregate.window needs a field")
        if not self.window_gap and bool(self.window_field) != bool(
            self.window_duration
        ):
            raise SpecError("aggregate.window needs both field and duration")
        if not self.group_by and not self.window_field:
            raise SpecError("aggregate requires groupBy and/or window")
        if bool(self.watermark_field) != bool(self.watermark_delay):
            raise SpecError("aggregate.watermark needs both field and delay")


_WINDOW_FNS = {
    "row_number",
    "rank",
    "dense_rank",
    "ntile",
    "lag",
    "lead",
    "running_sum",
    "running_count",
}
_WINDOW_FIELD_FNS = {"lag", "lead", "running_sum"}


@dataclass
class WindowFnSpec:
    fn: str
    alias: str
    field: str = ""
    offset: int = 1  # lag/lead
    n: int = 0  # ntile buckets

    def validate(self) -> None:
        if self.fn not in _WINDOW_FNS:
            raise SpecError(
                f"window.functions: unknown fn {self.fn!r} "
                f"(supported: {sorted(_WINDOW_FNS)})"
            )
        if not self.alias:
            raise SpecError("window.functions: alias is required")
        if self.fn in _WINDOW_FIELD_FNS and not self.field:
            raise SpecError(f"window fn {self.fn!r} requires a field")
        if self.fn == "ntile" and self.n < 1:
            raise SpecError("window fn 'ntile' requires n >= 1")
        if self.fn in ("lag", "lead") and self.offset < 1:
            raise SpecError(f"window fn {self.fn!r} requires offset >= 1")


@dataclass
class WindowSpec:
    """Analytic (per-row) window functions over the pipeline output —
    ranking, offsets, and running totals per partition key. Batch /
    micro-batch only: Spark has no incremental analytic-window
    operator for unbounded streams (enforced at apply time)."""

    partition_by: list[str] = field(default_factory=list)
    order_by: list[tuple[str, bool]] = field(default_factory=list)  # (field, desc)
    functions: list[WindowFnSpec] = field(default_factory=list)
    keep_top_n: int = 0  # optional: keep the first N rows per key

    def validate(self) -> None:
        if self.keep_top_n < 0:
            raise SpecError(
                "window.keepTopN must be >= 0 (a negative value would "
                "silently drop every row)"
            )
        if not self.functions and not self.keep_top_n:
            raise SpecError("window requires functions and/or keepTopN")
        if not self.order_by:
            raise SpecError(
                "window requires orderBy (make it a unique key per "
                "partition for deterministic output)"
            )
        if not self.partition_by:
            raise SpecError(
                "window requires partitionBy: a global window moves "
                "every row to one partition (refused by design at "
                "engine scale; aggregate or sql handle global cases)"
            )
        for f in self.functions:
            f.validate()
        seen: set[str] = set()
        for f in self.functions:
            if f.alias in seen:
                raise SpecError(f"window: duplicate alias {f.alias!r}")
            seen.add(f.alias)


@dataclass
class JoinSpec:
    """Enrichment join, two variants:

    - stream-static (`table`): the stream joins a static dimension
      table on equality keys; broadcast by default — the 100 TB shape
      for dimension enrichment (no shuffle of the stream side).
    - stream-stream (`stream`): the stream joins a SECOND stream
      (its own source + transform sub-spec) on equality keys plus an
      event-time bound. Spark's stream-stream join machinery: both
      sides watermarked, the time bound limits buffered state to the
      bound's span — without it, state grows unboundedly. The
      reference has no joins at all (README.md:21,564); this exposes
      Spark's native capability through the spec dialect."""

    table_path: str = ""
    on: list[tuple[str, str]] = field(default_factory=list)  # (left, right)
    how: str = "left"
    broadcast: bool = True
    select: list[tuple[str, str]] = field(default_factory=list)  # (field, alias)
    # stream-stream variant
    stream: dict[str, Any] | None = None  # {"source": ..., "transform": ...,
    #  "watermark": {field, delay}} — right-side sub-spec (raw dicts)
    watermark_field: str = ""  # left-side watermark
    watermark_delay: str = ""
    time_bound: dict[str, str] = field(default_factory=dict)
    # {leftField, rightField, lower, upper} — lower/upper are interval
    # strings bounding right.ts relative to left.ts (inclusive)

    def validate(self) -> None:
        if bool(self.table_path) == bool(self.stream):
            raise SpecError("join requires exactly one of table.path or stream")
        if not self.on:
            raise SpecError("join requires at least one on condition")
        if self.how not in ("inner", "left", "semi", "anti"):
            raise SpecError(
                f"join type must be inner, left, semi or anti, got: {self.how}"
            )
        if self.how in ("semi", "anti") and self.select:
            raise SpecError(
                f"{self.how} join keeps no right-side columns; remove select"
            )
        if self.stream is not None:
            if not (self.stream.get("source") and self.stream.get("transform")):
                raise SpecError("join.stream requires source and transform")
            tb = self.time_bound
            if tb and not all(
                tb.get(k) for k in ("leftField", "rightField", "lower", "upper")
            ):
                raise SpecError(
                    "join.timeBound requires leftField, rightField, lower, upper"
                )


@dataclass
class DeduplicateSpec:
    fields: list[str] = field(default_factory=list)
    within_watermark: bool = False
    watermark_field: str = ""
    watermark_delay: str = ""

    def validate(self) -> None:
        if not self.fields:
            raise SpecError("deduplicate requires fields")
        if self.within_watermark and not (
            self.watermark_field and self.watermark_delay
        ):
            raise SpecError(
                "deduplicate.withinWatermark needs watermark field and delay"
            )


@dataclass
class TransformSpec:
    exclude_events_with: list[ExcludeEventsWith] = field(default_factory=list)
    exclude_multi: list[MultiCondExclude] = field(default_factory=list)
    extract_fields: list[ExtractFields] = field(default_factory=list)
    extract_items_from_array: list[ExtractItemsFromArray] = field(default_factory=list)
    regexp: RegexpSpec | None = None
    join: JoinSpec | None = None
    deduplicate: DeduplicateSpec | None = None
    aggregate: AggregateSpec | None = None
    window: WindowSpec | None = None
    # full Spark SQL over the pipeline output (extension): the query
    # must reference the incoming rows as __stream__
    sql: str = ""
    custom_config: Any = None


@dataclass
class Spec:
    namespace: str
    stream_id_suffix: str
    description: str = ""
    version: int = 0
    disabled: bool = False
    ops: Ops = field(default_factory=Ops)
    ops_per_env: dict[str, Ops] = field(default_factory=dict)
    source: SourceSpec = field(default_factory=lambda: SourceSpec(type=""))
    transform: TransformSpec = field(default_factory=TransformSpec)
    sink: SinkSpec = field(default_factory=lambda: SinkSpec(type=""))
    raw: dict[str, Any] = field(default_factory=dict)

    @property
    def id(self) -> str:
        # reference entity/spec.go:80-82
        return f"{self.namespace}-{self.stream_id_suffix}"

    def json(self) -> str:
        return json.dumps(self.raw, separators=(",", ":"))


def _validate_structure(d: dict[str, Any]) -> None:
    """Structural validation mirroring the reference's embedded
    JSON-Schema (entity/spec.go:409-547): required fields + enum checks."""
    errs: list[str] = []
    for req in ("namespace", "streamIdSuffix", "version", "description"):
        if req not in d or d[req] in (None, ""):
            errs.append(f"{req} is required")
    for req in ("source", "sink"):
        if not isinstance(d.get(req), dict) or not d[req].get("type"):
            errs.append(f"{req}.type is required")
    if "transform" not in d or not isinstance(d.get("transform"), dict):
        errs.append("transform is required")
    if not isinstance(d.get("version", 0), int):
        errs.append("version must be an integer")
    houe = (d.get("ops") or {}).get("handlingOfUnretryableEvents")
    if houe not in (None, HOUE_DEFAULT, HOUE_DISCARD, HOUE_DLQ, HOUE_FAIL):
        errs.append(f"invalid handlingOfUnretryableEvents: {houe}")
    for ef in (d.get("transform") or {}).get("extractFields") or []:
        for f in ef.get("fields") or []:
            if f.get("type", "") not in _VALID_FIELD_TYPES:
                errs.append(f"invalid field type: {f.get('type')}")
            if not f.get("id"):
                errs.append("extractFields.fields[].id is required")
    if errs:
        raise SpecError(" - " + " - ".join(errs))


def _parse_excludes(lst: Any) -> list[ExcludeEventsWith]:
    return [ExcludeEventsWith.from_dict(x) for x in (lst or [])]


def _parse_few(lst: Any) -> list[ForEventsWith]:
    return [ForEventsWith(x.get("key", ""), x.get("value", "")) for x in (lst or [])]


def _parse_join(d: Any) -> JoinSpec | None:
    if not d:
        return None
    wm = d.get("watermark") or {}
    return JoinSpec(
        table_path=(d.get("table") or {}).get("path", ""),
        on=[(o.get("left", ""), o.get("right", "")) for o in (d.get("on") or [])],
        how=d.get("type", "left"),
        broadcast=bool(d.get("broadcast", True)),
        select=[
            (s.get("field", ""), s.get("alias") or s.get("field", ""))
            for s in (d.get("select") or [])
        ],
        stream=d.get("stream"),
        watermark_field=wm.get("field", ""),
        watermark_delay=wm.get("delay", ""),
        time_bound=dict(d.get("timeBound") or {}),
    )


def join_stream_spec(parent: "Spec") -> "Spec":
    """Materialize the right side of a stream-stream join as a full
    Spec (void sink; the join consumes its output directly)."""
    j = parent.transform.join
    if j is None or j.stream is None:
        raise SpecError("spec has no stream join")
    return parse_spec(
        {
            "namespace": parent.namespace,
            "streamIdSuffix": f"{parent.stream_id_suffix}-joinright",
            "version": parent.version,
            "description": f"right side of {parent.id} stream join",
            "source": j.stream["source"],
            "transform": j.stream["transform"],
            "sink": {"type": "void"},
        }
    )


def _parse_dedup(d: Any) -> DeduplicateSpec | None:
    if not d:
        return None
    wm = d.get("watermark") or {}
    return DeduplicateSpec(
        fields=list(d.get("fields") or []),
        within_watermark=bool(d.get("withinWatermark", False)),
        watermark_field=wm.get("field", ""),
        watermark_delay=wm.get("delay", ""),
    )


def _parse_aggregate(d: Any) -> AggregateSpec | None:
    if not d:
        return None
    win = d.get("window") or {}
    wm = d.get("watermark") or {}
    return AggregateSpec(
        group_by=list(d.get("groupBy") or []),
        aggregations=[
            AggregationSpec(
                fn=a.get("fn", ""), field=a.get("field", ""), alias=a.get("alias", "")
            )
            for a in (d.get("aggregations") or [])
        ],
        window_field=win.get("field", ""),
        window_duration=win.get("duration", ""),
        window_slide=win.get("slide", ""),
        window_gap=win.get("gap", ""),
        watermark_field=wm.get("field", ""),
        watermark_delay=wm.get("delay", ""),
        output_mode=d.get("outputMode", "update"),
    )


def _parse_window(d: Any) -> WindowSpec | None:
    if not d:
        return None
    return WindowSpec(
        partition_by=list(d.get("partitionBy") or []),
        order_by=[
            (o.get("field", ""), bool(o.get("desc", False)))
            for o in (d.get("orderBy") or [])
        ],
        functions=[
            WindowFnSpec(
                fn=f.get("fn", ""),
                alias=f.get("alias", ""),
                field=f.get("field", ""),
                offset=int(f.get("offset", 1)),
                n=int(f.get("n", 0)),
            )
            for f in (d.get("functions") or [])
        ],
        keep_top_n=int(d.get("keepTopN", 0)),
    )


def parse_spec(spec_data: str | bytes | dict[str, Any]) -> Spec:
    """Parse + validate + default-fill a stream spec (reference NewSpec,
    entity/spec.go:55-73)."""
    if isinstance(spec_data, (str, bytes)):
        if not spec_data:
            raise SpecError("no spec data provided")
        try:
            d = json.loads(spec_data)
        except json.JSONDecodeError as e:
            raise SpecError(f"invalid spec JSON: {e}") from e
    else:
        d = spec_data
    if not isinstance(d, dict):
        raise SpecError("spec must be a JSON object")

    from geist_spark.spec.schema import validate_schema

    validate_schema(d)
    _validate_structure(d)

    t = d.get("transform") or {}
    regexp = None
    if t.get("regexp"):
        r = t["regexp"]
        tc = r.get("timeConversion")
        regexp = RegexpSpec(
            expression=r.get("expression", ""),
            field=r.get("field", ""),
            keep_field=bool(r.get("keepField", False)),
            time_conversion=TimeConv(
                field=tc.get("field", ""),
                input_format=tc.get("inputFormat", ""),
                output_format=tc.get("outputFormat", ""),
            )
            if tc
            else None,
        )

    transform = TransformSpec(
        exclude_events_with=_parse_excludes(t.get("excludeEventsWith")),
        exclude_multi=[
            MultiCondExclude(filters=_parse_excludes(item.get("filters")))
            for item in (t.get("excludeEventsWithMultipleConditions") or [])
        ],
        extract_fields=[
            ExtractFields(
                for_events_with=_parse_few(ef.get("forEventsWith")),
                exclude_events_with=_parse_excludes(ef.get("excludeEventsWith")),
                fields=[FieldSpec.from_dict(f) for f in (ef.get("fields") or [])],
            )
            for ef in (t.get("extractFields") or [])
        ],
        extract_items_from_array=[
            ExtractItemsFromArray(
                id=ia.get("id", ""),
                for_events_with=_parse_few(ia.get("forEventsWith")),
                items=ArrayItems(
                    json_path_to_array=(ia.get("items") or {}).get(
                        "jsonPathToArray", ""
                    ),
                    id_from_item_fields=IdFromItemFields(
                        delimiter=((ia.get("items") or {}).get("idFromItemFields") or {}).get(
                            "delimiter", ""
                        ),
                        fields=list(
                            (
                                (ia.get("items") or {}).get("idFromItemFields") or {}
                            ).get("fields")
                            or []
                        ),
                    ),
                ),
            )
            for ia in (t.get("extractItemsFromArray") or [])
        ],
        regexp=regexp,
        join=_parse_join(t.get("join")),
        deduplicate=_parse_dedup(t.get("deduplicate")),
        aggregate=_parse_aggregate(t.get("aggregate")),
        window=_parse_window(t.get("window")),
        sql=t.get("sql", ""),
        custom_config=t.get("customConfig"),
    )
    if transform.sql and "__stream__" not in transform.sql:
        raise SpecError("transform.sql must reference __stream__")
    if transform.regexp is not None:
        transform.regexp.validate()
    if transform.join is not None:
        transform.join.validate()
    if transform.deduplicate is not None:
        transform.deduplicate.validate()
    if transform.aggregate is not None:
        transform.aggregate.validate()
    if transform.window is not None:
        transform.window.validate()

    spec = Spec(
        namespace=d.get("namespace", ""),
        stream_id_suffix=d.get("streamIdSuffix", ""),
        description=d.get("description", ""),
        version=int(d.get("version", 0)),
        disabled=bool(d.get("disabled", False)),
        ops=Ops.from_dict(d.get("ops") or {}),
        ops_per_env={
            env: Ops.from_dict(o) for env, o in (d.get("opsPerEnv") or {}).items()
        },
        source=SourceSpec.from_dict(d.get("source") or {}),
        transform=transform,
        sink=SinkSpec.from_dict(d.get("sink") or {}),
        raw=d,
    )
    return spec


def resolve_ops_per_env(spec: Spec, env: str) -> Spec:
    """Apply per-environment ops override (reference registry.go:88-106)."""
    if env in spec.ops_per_env:
        spec.ops = spec.ops_per_env[env]
        if spec.ops.disabled is not None:
            spec.disabled = spec.ops.disabled
    return spec
