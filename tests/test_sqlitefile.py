"""SQLite file reader (operators/sqlitefile.py)."""

import json

import pytest

from geist_spark.operators.sqlitefile import (
    sqlite_build,
    sqlite_rows,
    sqlite_tables,
)

DB = sqlite_build({
    "users": ("id INTEGER, name TEXT, raw BLOB, score REAL",
              [(1, "alice", b"\x00\xff", 1.5), (2, None, b"", -2.0)]),
    "tags": ("t TEXT", [("x",), ("y",)]),
})


def test_tables_census(spark):
    rows = sqlite_tables(
        spark.createDataFrame([(1, DB)], "file_id long, payload binary")
    ).collect()
    got = {r["table_name"]: r for r in rows}
    assert got["users"]["n_rows"] == 2 and got["users"]["n_cols"] == 4
    assert got["tags"]["n_rows"] == 2
    assert "CREATE TABLE" in got["users"]["sql"]


def test_rows_dialect(spark):
    rows = sorted(
        sqlite_rows(
            spark.createDataFrame(
                [(1, DB)], "file_id long, payload binary"
            )
        ).collect(),
        key=lambda r: (r["table_name"], r["row_idx"]),
    )
    u0 = json.loads(rows[2]["row_json"])  # tags < users alphabetically
    assert u0 == {"id": 1, "name": "alice", "raw": "AP8=", "score": 1.5}
    u1 = json.loads(rows[3]["row_json"])
    assert u1["name"] is None and u1["raw"] == ""


def test_tiers_and_budget(spark):
    bad = spark.createDataFrame(
        [(9, b"PK\x03\x04not-a-db")], "file_id long, payload binary"
    )
    with pytest.raises(Exception, match="not a SQLite"):
        sqlite_tables(bad).collect()
    assert sqlite_tables(bad, on_unsupported="null").count() == 0
    big = spark.createDataFrame(
        [(1, DB)], "file_id long, payload binary"
    )
    with pytest.raises(Exception, match="budget"):
        sqlite_rows(big, max_rows=2).collect()
