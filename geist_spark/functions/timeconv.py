"""Go reference-time layout -> Spark datetime pattern translation.

The reference's regexp transform takes `timeConversion.inputFormat` as a
Go layout string like `02/Jan/2006:15:04:05 -0700` and outputs RFC3339
(reference: entity/regexp.go:30-39, entity/transform/transformer.go:383-399).
Spark parses with DateTimeFormatter-style patterns, so we translate
token-by-token. Commas in input values are replaced with '.' before
parsing, matching transformer.go:388-389.

Offset preservation: Go's time.Parse keeps the input's UTC offset in
the time.Time and Format(RFC3339) re-emits it ("12:23:03 +0200" ->
"...T12:23:03+02:00"). Spark normalizes to the session zone, so we
extract the input offset textually, shift with from_utc_timestamp, and
splice the offset back — all JVM-side expressions.
"""

from __future__ import annotations

from pyspark.sql import Column, functions as F

# Longest-first Go layout tokens -> Spark datetime pattern tokens.
_TOKENS: list[tuple[str, str]] = [
    ("2006", "yyyy"),
    ("January", "MMMM"),
    ("Jan", "MMM"),
    ("Monday", "EEEE"),
    ("Mon", "EEE"),
    (".000000000", ".SSSSSSSSS"),
    (".000000", ".SSSSSS"),
    (".000", ".SSS"),
    # Go ".999" = optional fraction, trimmed when absent; Spark supports
    # DateTimeFormatter optional sections [].
    (".999999999", "[.SSSSSSSSS]"),
    (".999999", "[.SSSSSS]"),
    (".999", "[.SSS]"),
    ("15", "HH"),
    ("01", "MM"),
    ("02", "dd"),
    ("03", "hh"),
    ("04", "mm"),
    ("05", "ss"),
    ("06", "yy"),
    ("_2", "d"),
    ("1", "M"),
    ("2", "d"),
    ("3", "h"),
    ("4", "m"),
    ("5", "s"),
    ("PM", "a"),
    ("pm", "a"),
    ("Z07:00", "XXX"),
    ("Z0700", "XX"),
    ("-07:00", "xxx"),
    ("-0700", "xx"),
    ("-07", "x"),
    ("MST", "zzz"),
]

_ZONE_GO_TOKENS = ["Z07:00", "Z0700", "-07:00", "-0700", "-07", "MST"]

# Go time.RFC3339 layout
RFC3339_GO = "2006-01-02T15:04:05Z07:00"
RFC3339_PATTERN = "yyyy-MM-dd'T'HH:mm:ssXXX"


def go_layout_to_spark(layout: str) -> str:
    """Translate a Go time layout to a Spark datetime pattern.

    Unrecognized letters are quoted to parse as literals. Go's "03"
    (12-hour) without a PM marker keeps the parsed value as-is, which
    Java can't express with 'hh' — translate to 'HH' in that case."""
    tokens = list(_TOKENS)
    if "PM" not in layout and "pm" not in layout:
        tokens = [
            (g, {"hh": "HH", "h": "H"}.get(s, s)) for g, s in tokens
        ]
    out: list[str] = []
    i = 0
    n = len(layout)
    while i < n:
        for go_tok, spark_tok in tokens:
            if layout.startswith(go_tok, i):
                out.append(spark_tok)
                i += len(go_tok)
                break
        else:
            c = layout[i]
            out.append(f"'{c}'" if c.isalpha() else c)
            i += 1
    return "".join(out).replace("''", "")


def _split_zone(layout: str) -> tuple[str, str, str | None]:
    """layout -> (pre, post, zone_token) around the first zone token."""
    for tok in _ZONE_GO_TOKENS:
        idx = layout.find(tok)
        if idx >= 0:
            return layout[:idx], layout[idx + len(tok):], tok
    return layout, "", None


def parse_go_time(col: Column, go_layout: str) -> Column:
    """Parse a string column with a Go layout; commas -> '.' first.
    Returns a (UTC-instant) timestamp."""
    pattern = go_layout_to_spark(go_layout)
    return F.to_timestamp(F.regexp_replace(col, ",", "."), pattern)


def _input_offset(src: Column, go_layout: str) -> Column:
    """Normalized input offset ('+02:00' form) or '+00:00'."""
    _, _, zone_tok = _split_zone(go_layout)
    if zone_tok is None:
        return F.lit("+00:00")
    off = F.regexp_extract(F.trim(src), r"([+-][0-9]{2}:?[0-9]{2}|Z)\s*$", 1)
    norm = F.regexp_replace(off, r"^([+-][0-9]{2}):?([0-9]{2})$", r"$1:$2")
    return (
        F.when((off == "Z") | (off == ""), F.lit("+00:00")).otherwise(norm)
    )


def convert_time(
    col: Column, input_go_layout: str, output_go_layout: str | None
) -> Column:
    """Full timeConversion (transformer.go:383-399): parse with the Go
    inputFormat, render with outputFormat (default RFC3339), preserving
    the input's UTC offset like Go does."""
    src = F.regexp_replace(col, ",", ".")
    ts = F.to_timestamp(src, go_layout_to_spark(input_go_layout))
    off = _input_offset(src, input_go_layout)
    # wall-clock time at the input offset (session TZ pinned to UTC)
    local = F.from_utc_timestamp(ts, off)

    out_layout = output_go_layout or RFC3339_GO
    pre, post, zone_tok = _split_zone(out_layout)
    if zone_tok is None:
        return F.when(ts.isNotNull(), F.date_format(local, go_layout_to_spark(out_layout)))
    if zone_tok.startswith("Z"):
        # Go renders offset zero as 'Z'
        display = F.when(off == "+00:00", F.lit("Z")).otherwise(
            off if zone_tok == "Z07:00" else F.regexp_replace(off, ":", "")
        )
    else:
        display = off if ":" in zone_tok else F.regexp_replace(off, ":", "")
    parts: list[Column] = []
    if pre:
        parts.append(F.date_format(local, go_layout_to_spark(pre)))
    parts.append(display)
    if post:
        parts.append(F.date_format(local, go_layout_to_spark(post)))
    return F.when(ts.isNotNull(), F.concat(*parts))


def format_go_time(ts: Column, go_layout: str | None) -> Column:
    """Format a UTC timestamp with a Go layout (None -> RFC3339, UTC)."""
    pattern = RFC3339_PATTERN if not go_layout else go_layout_to_spark(go_layout)
    return F.date_format(ts, pattern)
