"""Driver-contract regression guards for __spark_entry__ and bench.py.

Round-2 post-mortem: the driver gate fetches BOTH result sets through
pandas, so DuckDB HUGEINT output columns (any un-cast integer sum)
coerce to float64 and hash-fail against Spark's BIGINT even when every
value is equal — 31 oracles carried that landmine and the 5 of them in
the recorded slots were the round's only correctness failures.  And
bench.py's single JSON line at 180 queries overflowed the driver's
~2 KB stdout tail-capture window, so the round had no parsed bench
total at all.  These tests make both failure classes impossible to
reintroduce.
"""

import json
import os
import sys

import duckdb
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entry_mod  # noqa: E402
import bench  # noqa: E402

SF_DIR = "/root/testdata/sf0.001"
TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'"
        )
    return con


def test_every_oracle_key_has_a_query():
    qs = entry_mod.queries()
    orphans = [k for k in entry_mod.oracle_sql() if k not in qs]
    assert not orphans, f"oracle_sql keys without queries(): {orphans}"


def test_no_oracle_output_column_is_hugeint(duck):
    """DuckDB returns HUGEINT for un-cast integer sum()/product(); the
    driver's pandas conversion renders it float64 and the hash fails
    against Spark's BIGINT.  DESCRIBE every oracle: zero HUGEINT (or
    UHUGEINT) output columns allowed, ever."""
    bad = {}
    for name, sql in entry_mod.oracle_sql().items():
        desc = duck.execute(f"DESCRIBE ({sql})").fetchall()
        cols = [c for c, ty, *_ in desc if "HUGEINT" in ty.upper()]
        if cols:
            bad[name] = cols
    assert not bad, f"HUGEINT oracle columns (driver hash landmine): {bad}"


def test_hugeint_cast_map_is_live(duck):
    """_HUGEINT_COLS must reference real queries and real output columns
    — a renamed query or column would silently stop being cast."""
    sqls = entry_mod.oracle_sql()
    for name, cols in entry_mod._HUGEINT_COLS.items():
        assert name in sqls, f"_HUGEINT_COLS names unknown query {name}"
        desc = duck.execute(f"DESCRIBE ({sqls[name]})").fetchall()
        out_cols = {c for c, *_ in desc}
        missing = [c for c in cols if c not in out_cols]
        assert not missing, f"{name}: cast map names absent columns {missing}"


def test_bench_line_fits_driver_tail_window():
    """The driver captures ~2 KB of stdout tail; the final JSON line
    must parse from inside that window even at 500 queries."""
    timings = {f"q_{'x' * 20}_{i:03d}": round(i * 0.123, 3) for i in range(500)}
    line = bench.compact_line(timings, total=123.456, sf=0.1)
    assert len(line) <= 1800
    payload = json.loads(line)
    assert payload["metric"] == "total_query_wall_seconds"
    assert payload["value"] == 123.456
    assert payload["n_queries"] == 500
    assert payload["queries_omitted"] == 500 - len(payload["queries"])
    assert len(payload["queries"]) > 20  # budget isn't wasted either


def test_bench_line_small_fleet_keeps_everything():
    timings = {f"q{i}": 1.0 for i in range(10)}
    payload = json.loads(bench.compact_line(timings, total=10.0, sf=0.01))
    assert payload["queries_omitted"] == 0
    assert len(payload["queries"]) == 10


def test_bench_avg_excludes_failed_queries():
    """Failures are recorded as -1.0 and excluded from the total, so
    they must be excluded from the average's denominator too."""
    payload = json.loads(
        bench.compact_line({"a": 2.0, "b": -1.0, "c": 4.0}, total=6.0, sf=0.1)
    )
    assert payload["avg_sec_per_query"] == 3.0


def test_bench_line_degrades_to_envelope_under_tiny_budget(monkeypatch):
    """A budget below the envelope size must still emit a parseable
    envelope (totals intact), never assert after the whole bench ran."""
    monkeypatch.setenv("SPARK_GRAFT_BENCH_LINE_BYTES", "50")
    timings = {f"q_{'y' * 30}_{i}": 1.5 for i in range(40)}
    payload = json.loads(bench.compact_line(timings, total=60.0, sf=0.1))
    assert payload["value"] == 60.0
    assert payload["n_queries"] == 40
    assert payload["queries_omitted"] == 40 - len(payload["queries"])


def test_duckdb_list_reduce_inplace_acc_bug_still_present():
    """The ADPCM oracle uses a recursive CTE instead of list_reduce
    because DuckDB 1.0 evaluates a reduce lambda's struct fields
    against an IN-PLACE-updated accumulator (a later field reading
    acc.v sees the NEW v). This pins the minimal repro: if a DuckDB
    upgrade fixes the semantics, this flips and the oracle can be
    simplified back to list_reduce."""
    import duckdb

    con = duckdb.connect()
    row = con.execute(
        """
        SELECT list_reduce(
          [{'v': 10, 'w': 10}, {'v': 3, 'w': 0}, {'v': 5, 'w': 0}],
          (acc, x) -> {'v': acc.v + x.v, 'w': acc.v + x.v}
        )
        """
    ).fetchone()[0]
    assert row["v"] == 18
    # correct semantics would give w == 18 too; 1.0 gives 23
    assert row["w"] == 23, (
        "DuckDB list_reduce struct-field semantics changed "
        f"(w={row['w']}) — revisit _adpcm_oracle"
    )
