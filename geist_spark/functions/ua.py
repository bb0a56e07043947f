"""User-agent parsing UDF (spec field type "userAgent").

Pure-Python heuristic parser producing the same JSON shape (and field
order) as the reference's mssola/user_agent-based transform
(reference: entity/transform/ua.go:31-62; golden output
entity/transform/transformer_test.go:349-367). The UA string arrives
URL-escaped and is unquoted first.

Exposed as an Arrow-batched pandas UDF — the only Python-side scalar
function in the engine's hot path, and only present when a spec asks
for it.
"""

from __future__ import annotations

import functools
import json
import re
import urllib.parse

import pandas as pd
from pyspark.sql import functions as F, types as T

_BOT_RE = re.compile(
    r"bot|crawler|spider|slurp|archiver|facebookexternalhit|mediapartners", re.I
)


def _osinfo(ua: str) -> tuple[str, str, str, str, bool]:
    """-> (platform, os_name, os_full, os_version, mobile)"""
    m = re.search(r"\(([^)]*)\)", ua)
    section = m.group(1) if m else ""
    parts = [p.strip() for p in section.split(";")]
    platform = parts[0] if parts else ""
    mobile = bool(re.search(r"Mobile|Android|iPhone|iPod|iPad|Windows Phone", ua))

    if "iPhone" in section or "iPad" in section or "iPod" in section:
        full = next((p for p in parts if "OS" in p and "like Mac" in p), section)
        vm = re.search(r"OS (\d+)[_.](\d+)(?:[_.](\d+))?", full)
        version = ".".join(g for g in (vm.groups() if vm else ()) if g) if vm else ""
        name = "iPhone OS" if ("iPhone" in section or "iPod" in section) else "iPadOS"
        return platform, name, full, version, True
    if "Android" in section:
        am = re.search(r"Android ([\d.]+)", section)
        full = next((p for p in parts if p.startswith("Android")), "Android")
        return "Linux", "Android", full, am.group(1) if am else "", True
    if "Windows NT" in section:
        wm = re.search(r"Windows NT ([\d.]+)", section)
        nt = wm.group(1) if wm else ""
        names = {"10.0": "Windows 10", "6.3": "Windows 8.1", "6.2": "Windows 8",
                 "6.1": "Windows 7", "6.0": "Windows Vista", "5.1": "Windows XP"}
        full = names.get(nt, f"Windows NT {nt}")
        return "Windows", "Windows", full, nt, mobile
    if "Mac OS X" in section:
        mm = re.search(r"Mac OS X (\d+)[_.](\d+)(?:[_.](\d+))?", section)
        version = ".".join(g for g in (mm.groups() if mm else ()) if g) if mm else ""
        full = next((p for p in parts if "Mac OS X" in p), "Intel Mac OS X")
        return "Macintosh", "Mac OS X", full, version, False
    if "Linux" in section or "X11" in section:
        return "X11", "Linux", "Linux", "", mobile
    return platform, "", section, "", mobile


def _browser(ua: str) -> tuple[str, str, str, str]:
    """-> (name, version, engine, engine_version)"""
    em = re.search(r"(AppleWebKit|Gecko|Trident|Presto)/([\d.]+)", ua)
    engine, engine_version = (em.group(1), em.group(2)) if em else ("", "")
    for pat, name in [
        (r"Edg(?:e|A|iOS)?/([\d.]+)", "Edge"),
        (r"OPR/([\d.]+)", "Opera"),
        (r"Opera[/ ]([\d.]+)", "Opera"),
        (r"CriOS/([\d.]+)", "Chrome"),
        (r"Chrome/([\d.]+)", "Chrome"),
        (r"FxiOS/([\d.]+)", "Firefox"),
        (r"Firefox/([\d.]+)", "Firefox"),
        (r"MSIE ([\d.]+)", "Internet Explorer"),
        (r"rv:([\d.]+)\) like Gecko", "Internet Explorer"),
        (r"Version/([\d.]+).*Safari", "Safari"),
    ]:
        bm = re.search(pat, ua)
        if bm:
            return name, bm.group(1), engine, engine_version
    if "Safari" in ua:
        return "Safari", "", engine, engine_version
    fm = re.match(r"([A-Za-z][\w\-]*)/([\d.]+)", ua)
    if fm:
        return fm.group(1), fm.group(2), engine, engine_version
    return "", "", engine, engine_version


def parse_user_agent(ua_escaped: str | None) -> str:
    """URL-unescape + parse; returns the reference-shaped JSON string."""
    if ua_escaped is None:
        ua_escaped = ""
    ua = urllib.parse.unquote(ua_escaped)
    platform, os_name, os_full, os_version, mobile = _osinfo(ua)
    b_name, b_version, engine, engine_version = _browser(ua)
    loc_m = re.search(r"\(.*?;\s*([a-z]{2}(?:-[A-Za-z]{2})?)\s*[;)]", ua)
    localization = ""
    if loc_m and re.fullmatch(r"[a-z]{2}(-[A-Za-z]{2})?", loc_m.group(1)):
        localization = loc_m.group(1)
    out = {
        "platform": platform,
        "operatingSystem": {
            "name": os_name,
            "fullName": os_full,
            "version": os_version,
        },
        "localization": localization,
        "browser": {
            "name": b_name,
            "version": b_version,
            "engine": engine,
            "engineVersion": engine_version,
        },
        "bot": bool(_BOT_RE.search(ua)),
        "mobile": mobile,
    }
    return json.dumps(out, separators=(",", ":"))


@functools.lru_cache(maxsize=65536)
def _cached_parse(ua_escaped: str | None) -> str:
    return parse_user_agent(ua_escaped)


@F.pandas_udf(T.StringType())
def ua_udf(s: pd.Series) -> pd.Series:
    """Memoized per executor process: real UA traffic is billions of
    rows over ~1e4 distinct strings, so the regex work runs once per
    distinct value, not once per row — the cache persists across Arrow
    batches for the lifetime of the Python worker."""
    return s.map(_cached_parse)
