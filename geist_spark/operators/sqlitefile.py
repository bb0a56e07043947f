"""SQLite database-file reading for app-data and export corpora.

SQLite files turn up everywhere data is dumped (mobile app exports,
browser profiles, ad-hoc research datasets); Python 3.11's sqlite3
can mount one FROM BYTES via Connection.deserialize, so reading them
Spark-side needs no filesystem staging: census the tables, stream the
rows out as the repo's shared deterministic JSON (column-keyed
objects; blobs as base64; NULL as null), in rowid order.

Safety: connections are opened query_only with a defensive row budget
(a crafted many-billion-row file raises the typed malformed error before
materializing); sqlite3.DatabaseError (not a database / corrupt pages)
maps to ValueError; payloads without the 16-byte magic are a
CAPABILITY limit. Virtual-table/extension-backed schemas surface
whatever core SQLite can read — no extensions are loaded.

One Arrow mapInPandas stage, row fan-out inside the batch (the
warc_parse shape). Reference parity: n/a (geist is JSON-only).
"""

from __future__ import annotations

import base64
import json
import sqlite3

from pyspark.sql import DataFrame

SQLITE_MAGIC = b"SQLite format 3\x00"

SQLITE_TABLES_SCHEMA = (
    "file_id long, table_name string, n_rows long, n_cols int, "
    "sql string"
)
SQLITE_ROWS_SCHEMA = (
    "file_id long, table_name string, row_idx long, row_json string"
)


def _open(b: bytes) -> sqlite3.Connection:
    if b[:16] != SQLITE_MAGIC:
        raise NotImplementedError(
            "payload is not a SQLite database (no magic header)"
        )
    con = sqlite3.connect(":memory:")
    try:
        con.deserialize(b)
        con.execute("PRAGMA query_only=1")
    except sqlite3.DatabaseError as exc:
        raise ValueError(f"malformed SQLite database: {exc}") from None
    return con


def _tables(con: sqlite3.Connection):
    try:
        return [
            (name, sql)
            for name, sql in con.execute(
                "SELECT name, sql FROM sqlite_master WHERE type='table' "
                "AND name NOT LIKE 'sqlite_%' ORDER BY name"
            )
        ]
    except sqlite3.DatabaseError as exc:
        raise ValueError(f"malformed SQLite database: {exc}") from None


def _jsonable(v):
    if isinstance(v, bytes):
        return base64.b64encode(v).decode()
    return v


def sqlite_tables(
    files: DataFrame,
    payload_col: str = "payload",
    id_col: str = "file_id",
    on_unsupported: str = "error",
) -> DataFrame:
    """Database census: one row per user table (name, exact row
    count, column count, CREATE sql)."""
    import pandas as pd

    if on_unsupported not in ("error", "null"):
        raise ValueError("on_unsupported must be 'error' or 'null'")

    def run(batches):
        for pdf in batches:
            out = {k: [] for k in (
                "file_id", "table_name", "n_rows", "n_cols", "sql"
            )}
            for fid, payload in zip(pdf[id_col], pdf[payload_col]):
                if payload is None:
                    continue
                try:
                    con = _open(bytes(payload))
                except NotImplementedError as exc:
                    if on_unsupported == "error":
                        raise NotImplementedError(
                            f"{id_col}={fid}: {exc}"
                        ) from exc
                    continue
                try:
                    for name, sql in _tables(con):
                        try:
                            (n,) = con.execute(
                                f'SELECT count(*) FROM "{name}"'
                            ).fetchone()
                            cols = con.execute(
                                f'PRAGMA table_info("{name}")'
                            ).fetchall()
                        except sqlite3.DatabaseError as exc:
                            raise ValueError(
                                f"malformed SQLite database: {exc}"
                            ) from None
                        out["file_id"].append(fid)
                        out["table_name"].append(name)
                        out["n_rows"].append(n)
                        out["n_cols"].append(len(cols))
                        out["sql"].append(sql)
                finally:
                    con.close()
            yield pd.DataFrame(out)

    return files.mapInPandas(run, SQLITE_TABLES_SCHEMA)


def sqlite_rows(
    files: DataFrame,
    payload_col: str = "payload",
    id_col: str = "file_id",
    max_rows: int = 1_000_000,
    on_unsupported: str = "error",
) -> DataFrame:
    """Every user-table row as column-keyed compact JSON, rowid
    order, bounded at max_rows per file."""
    import pandas as pd

    if on_unsupported not in ("error", "null"):
        raise ValueError("on_unsupported must be 'error' or 'null'")

    def run(batches):
        for pdf in batches:
            out = {k: [] for k in (
                "file_id", "table_name", "row_idx", "row_json"
            )}
            for fid, payload in zip(pdf[id_col], pdf[payload_col]):
                if payload is None:
                    continue
                try:
                    con = _open(bytes(payload))
                except NotImplementedError as exc:
                    if on_unsupported == "error":
                        raise NotImplementedError(
                            f"{id_col}={fid}: {exc}"
                        ) from exc
                    continue
                try:
                    budget = max_rows
                    for name, _sql in _tables(con):
                        try:
                            cur = con.execute(f'SELECT * FROM "{name}"')
                        except sqlite3.DatabaseError as exc:
                            raise ValueError(
                                f"malformed SQLite database: {exc}"
                            ) from None
                        cols = [d[0] for d in cur.description]
                        for i, row in enumerate(cur):
                            budget -= 1
                            if budget < 0:
                                raise ValueError(
                                    "SQLite row budget exceeded "
                                    f"(max_rows={max_rows})"
                                )
                            out["file_id"].append(fid)
                            out["table_name"].append(name)
                            out["row_idx"].append(i)
                            out["row_json"].append(
                                json.dumps(
                                    {
                                        c: _jsonable(v)
                                        for c, v in zip(cols, row)
                                    },
                                    separators=(",", ":"),
                                    ensure_ascii=False,
                                )
                            )
                finally:
                    con.close()
            yield pd.DataFrame(out)

    return files.mapInPandas(run, SQLITE_ROWS_SCHEMA)


def sqlite_build(tables: dict) -> bytes:
    """Fixture builder: {name: (cols_sql, [row tuples])} -> db bytes
    via the stdlib serialize (an independent writer path)."""
    con = sqlite3.connect(":memory:")
    for name, (cols_sql, rows) in tables.items():
        con.execute(f'CREATE TABLE "{name}" ({cols_sql})')
        if rows:
            ph = ",".join("?" * len(rows[0]))
            con.executemany(
                f'INSERT INTO "{name}" VALUES ({ph})', rows
            )
    con.commit()
    blob = con.serialize()
    con.close()
    return bytes(blob)
