"""gjson-compatible JSON path extraction as Catalyst column expressions.

The reference pulls fields from raw JSON events with gjson paths and
`.String()` coercion (reference: entity/spec.go:339-344,
entity/transform/transformer.go:302-334). Exact semantics replicated
here, all JVM-side (no Python UDFs):

- missing field        -> ""        (gjson String() on null result)
- number / bool        -> "87" / "true" (JSON literal text)
- object / array       -> raw JSON text
- `a.#(f=="v").rest`   -> first array element matching the predicate
  (gjson query; reference test entity/transform/transformer_test.go:374-409)

Typed extraction (spec `type` field, reference
entity/transform/transformer.go:315-330) maps onto Spark casts in
`typed_col`.
"""

from __future__ import annotations

import re
from dataclasses import dataclass

from pyspark.sql import Column, functions as F, types as T

# one gjson query segment:  #(field=="value")  /  #(field=="value")#
_QUERY_RE = re.compile(
    r"""^\#\(
        (?P<field>[^=!<>~]+?)
        \s*(?P<op>==|!=|<=|>=|<|>|%)\s*
        (?P<value>"[^"]*"|[^)]+)
        \)(?P<all>\#?)$""",
    re.VERBOSE,
)


@dataclass
class _Segment:
    kind: str  # "key" | "index" | "query"
    key: str = ""
    index: int = 0
    field: str = ""
    op: str = "=="
    value: str = ""
    all: bool = False


def _split_gjson(path: str) -> list[_Segment]:
    """Split a gjson dotted path into segments; `\\.` escapes a literal dot."""
    parts: list[str] = []
    buf: list[str] = []
    depth = 0
    i = 0
    while i < len(path):
        c = path[i]
        if c == "\\" and i + 1 < len(path):
            buf.append(path[i + 1])
            i += 2
            continue
        if c == "(":
            depth += 1
        elif c == ")":
            depth -= 1
        if c == "." and depth == 0:
            parts.append("".join(buf))
            buf = []
        else:
            buf.append(c)
        i += 1
    parts.append("".join(buf))

    segs: list[_Segment] = []
    for p in parts:
        m = _QUERY_RE.match(p)
        if m:
            val = m.group("value").strip()
            if val.startswith('"') and val.endswith('"'):
                val = val[1:-1]
            segs.append(
                _Segment(
                    kind="query",
                    field=m.group("field").strip(),
                    op=m.group("op"),
                    value=val,
                    all=bool(m.group("all")),
                )
            )
        elif p.isdigit():
            segs.append(_Segment(kind="index", index=int(p)))
        else:
            segs.append(_Segment(kind="key", key=p))
    return segs


def _plain_to_jsonpath(segs: list[_Segment]) -> str:
    """Build a Spark JSONPath (`$.a[0].b`) from plain key/index segments."""
    out = "$"
    for s in segs:
        if s.kind == "key":
            # get_json_object needs ['k'] syntax for keys w/ special chars
            if re.fullmatch(r"[A-Za-z0-9_\-@]+", s.key):
                out += f".{s.key}"
            else:
                out += f"['{s.key}']"
        elif s.kind == "index":
            out += f"[{s.index}]"
        else:  # pragma: no cover
            raise ValueError("query segment in plain path")
    return out


def _query_condition(elem: Column, field: str, op: str, value: str) -> Column:
    got = F.get_json_object(elem, _plain_to_jsonpath(_split_gjson(field)))
    if op == "==":
        return got == value
    if op == "!=":
        return got != value
    if op == "%":  # gjson pattern match (glob); translate * -> SQL %
        return got.like(value.replace("*", "%"))
    num = F.lit(float(value))
    cast = got.cast("double")
    return {"<": cast < num, "<=": cast <= num, ">": cast > num, ">=": cast >= num}[op]


def json_col(col: Column | str, gpath: str) -> Column:
    """Extract `gpath` (gjson dialect) from the JSON string `col`.

    Returns a StringType column: NULL when missing, JSON literal text for
    scalars, raw JSON text for objects/arrays (matches gjson `Get().Raw`
    modulo whitespace). Query segments compile to higher-order
    `filter()` over `from_json(..., array<string>)` — fully JVM-side.
    """
    c = F.col(col) if isinstance(col, str) else col
    segs = _split_gjson(gpath)
    cur = c
    plain: list[_Segment] = []

    def flush(cur: Column, plain: list[_Segment]) -> Column:
        if plain:
            return F.get_json_object(cur, _plain_to_jsonpath(plain))
        return cur

    for s in segs:
        if s.kind == "query":
            arr = F.from_json(flush(cur, plain), T.ArrayType(T.StringType()))
            plain = []
            matched = F.filter(
                arr, lambda x: _query_condition(x, s.field, s.op, s.value)
            )
            if s.all:
                # `#(...)#` returns ALL matches -> keep as JSON array text
                cur = F.to_json(matched)
            else:
                cur = F.element_at(matched, 1)
        else:
            plain.append(s)
    return flush(cur, plain)


def json_str(col: Column | str, gpath: str) -> Column:
    """gjson `.String()`: like `json_col` but missing/null -> ''."""
    return F.coalesce(json_col(col, gpath), F.lit(""))


# spec `type` -> (cast fn, Spark type)  — reference transformer.go:315-330
def typed_col(raw: Column, spec_type: str | None) -> Column:
    t = (spec_type or "string").lower()
    if t == "string":
        return F.coalesce(raw, F.lit(""))
    if t in ("int", "integer"):
        # Go json.Number -> int64; "3.7" would fail in Go, Spark yields null
        return raw.cast(T.LongType())
    if t in ("float", "number"):
        return raw.cast(T.DoubleType())
    if t in ("bool", "boolean"):
        return raw.cast(T.BooleanType())
    if t == "isotimestamp":
        return F.to_timestamp(raw)
    if t == "unixtimestamp":
        # epoch MILLIS, number or numeric string (transformer.go:370-372)
        return F.timestamp_millis(raw.cast(T.LongType()))
    raise ValueError(f"unknown extract field type: {spec_type}")


def spark_type_for(spec_type: str | None) -> T.DataType:
    t = (spec_type or "string").lower()
    return {
        "string": T.StringType(),
        "int": T.LongType(),
        "integer": T.LongType(),
        "float": T.DoubleType(),
        "bool": T.BooleanType(),
        "boolean": T.BooleanType(),
        "isotimestamp": T.TimestampType(),
        "unixtimestamp": T.TimestampType(),
        "useragent": T.StringType(),
        "urlnormalize": T.StringType(),
        # reference spec.go treats "number" as the generic numeric
        # type (gjson numbers are float64)
        "number": T.DoubleType(),
    }[t]
