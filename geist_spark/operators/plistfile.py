"""Apple property-list parsing (XML and binary plists).

plist payloads ride along in macOS/iOS app-data dumps and some
crawl corpora; Python's stdlib `plistlib` reads both the XML and the
bplist00 binary forms, so the operator is the shared-JSON-dialect
rendering: bytes as base64, datetimes as ISO-8601, dict insertion
order preserved. plistlib errors map to the malformed ValueError
tier; payloads that are neither XML-plist-shaped nor bplist00 are a
CAPABILITY limit.

One Arrow mapInPandas stage (the toml_records shape). Reference
parity: n/a (geist is JSON-only).
"""

from __future__ import annotations

import base64
import datetime
import json
import plistlib

from pyspark.sql import DataFrame

PLIST_RECORDS_SCHEMA = "file_id long, record_json string"


def _jsonable(v):
    if isinstance(v, dict):
        return {str(k): _jsonable(x) for k, x in v.items()}
    if isinstance(v, list):
        return [_jsonable(x) for x in v]
    if isinstance(v, bytes):
        return base64.b64encode(v).decode()
    if isinstance(v, datetime.datetime):
        return v.isoformat()
    return v


def plist_parse(b: bytes):
    """One plist payload -> JSON-ready value."""
    head = bytes(b[:8])
    if head != b"bplist00" and not head.lstrip()[:1] in (b"<", b""):
        raise NotImplementedError(
            "payload is neither an XML plist nor bplist00"
        )
    try:
        return _jsonable(plistlib.loads(bytes(b)))
    except Exception as exc:  # plistlib raises a mixed bag
        if isinstance(exc, NotImplementedError):
            raise
        raise ValueError(f"malformed plist: {exc}") from None


def plist_records(
    files: DataFrame,
    payload_col: str = "payload",
    id_col: str = "file_id",
    on_unsupported: str = "error",
) -> DataFrame:
    """(id, plist bytes) -> (file_id, record_json) compact JSON."""
    import pandas as pd

    if on_unsupported not in ("error", "null"):
        raise ValueError("on_unsupported must be \'error\' or \'null\'")

    def run(batches):
        for pdf in batches:
            out = {"file_id": [], "record_json": []}
            for fid, payload in zip(pdf[id_col], pdf[payload_col]):
                if payload is None:
                    continue
                try:
                    val = plist_parse(bytes(payload))
                except NotImplementedError as exc:
                    if on_unsupported == "error":
                        raise NotImplementedError(
                            f"{id_col}={fid}: {exc}"
                        ) from exc
                    continue
                out["file_id"].append(fid)
                out["record_json"].append(
                    json.dumps(
                        val, separators=(",", ":"), ensure_ascii=False
                    )
                )
            yield pd.DataFrame(out)

    return files.mapInPandas(run, PLIST_RECORDS_SCHEMA)
