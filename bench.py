"""Benchmark runner (driver contract).

Runs every __spark_entry__.queries() entry at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints
ONE JSON line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec}, "sf": ...}.

Each query is materialized with a noop write (full execution, no
driver-side collect cost). A short warmup query primes the JVM/codegen
before timing.

Per-query time is the BEST of up to $SPARK_GRAFT_BENCH_RUNS runs
(default 2): single cold numbers on a shared host swing 2-15x with
page-cache and CPU contention (round-1 g_timeconv: 17.7 s cold vs
3.2 s warm on an identical plan), so best-of-N measures the plan, not
the host. With 130+ queries a full second pass could outrun the
harness timeout, so re-runs are TIME-BUDGETED
($SPARK_GRAFT_BENCH_BUDGET_S, default 420 s for the re-run phase):
pass 1 times every query once, then pass 2 re-runs queries in
descending pass-1 time (cold-start noise shows up as a big t1, so the
noisiest candidates get re-measured first) until the budget runs out.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def materialize(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def main() -> int:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = float(os.path.basename(sf_dir.rstrip("/")).replace("sf", "") or 0.1)

    import __spark_entry__ as entry_mod
    from geist_spark.session import get_spark

    # no console progress bars: the driver tail-captures MERGED
    # stdout+stderr (BENCH_r01's recorded tail is full of "\r[Stage"
    # noise), and the final compact JSON line must own that window
    spark = get_spark(
        "geist_spark_bench",
        **{"spark.ui.showConsoleProgress": "false"},
    )
    # ERROR-only logging for the same reason: benign WARNs (e.g.
    # WindowExec on the documented metadata-sized global windows)
    # land on stderr and could crowd the final JSON line out of the
    # driver's merged-stream tail window
    spark.sparkContext.setLogLevel("ERROR")

    # warmup: JVM + codegen + parquet footer caches
    materialize(spark.read.parquet(f"{sf_dir}/lineitem.parquet").limit(1000))

    runs = max(1, int(os.environ.get("SPARK_GRAFT_BENCH_RUNS", "2")))
    budget_s = float(os.environ.get("SPARK_GRAFT_BENCH_BUDGET_S", "420"))
    qs = entry_mod.queries()
    timings: dict[str, float] = {}

    def run_once(name: str) -> float:
        try:
            t0 = time.perf_counter()
            materialize(qs[name](spark, sf_dir))
            return time.perf_counter() - t0
        except Exception as e:  # a failing query must not hide the rest
            print(f"# bench error in {name}: {e}", file=sys.stderr)
            return -1.0

    for name in qs:
        timings[name] = round(run_once(name), 3)

    # re-run phase: noisiest-first (big t1 = cold-start suspect),
    # bounded by the wall budget so the gate always completes
    rerun_t0 = time.perf_counter()
    order = sorted(
        (n for n, t in timings.items() if t >= 0),
        key=lambda n: -timings[n],
    )
    for _ in range(runs - 1):
        for name in order:
            if time.perf_counter() - rerun_t0 > budget_s:
                break
            dt = run_once(name)
            if dt >= 0:
                timings[name] = round(min(timings[name], dt), 3)

    total = round(sum(t for t in timings.values() if t >= 0), 3)

    # full per-query map goes to a FILE, not to either stream: at 180
    # queries the full JSON line is ~4.5 KB, which overflowed the driver's
    # ~2 KB tail-capture window and made BENCH_r02.json record
    # "parsed": null — and BENCH_r01's recorded tail contains Spark
    # progress bars, so the driver captures MERGED stdout+stderr and a
    # big stderr line would pollute the window just the same.  Stdout
    # carries exactly ONE compact JSON line, byte-capped so the driver
    # always parses it: the envelope plus as many per-query timings
    # (dict order == the driver's 50 recorded correctness slots first)
    # as fit in the budget.
    full_path = os.environ.get(
        "SPARK_GRAFT_BENCH_FULL_PATH", "/tmp/bench_full_timings.json"
    )
    with open(full_path, "w") as f:
        json.dump({"sf": sf, "total": total, "queries": timings}, f)

    line = compact_line(timings, total, sf)
    print(line)
    return 0


def compact_line(timings: dict[str, float], total: float, sf: float) -> str:
    """The single stdout JSON line, byte-capped to fit the driver's
    tail-capture window.  Keeps the envelope (metric/value/unit/sf/
    n_queries) unconditionally; fills "queries" in dict order (the 50
    recorded correctness slots come first) until the serialized line
    would exceed the budget; "queries_omitted" says how many were cut
    so the truncation is never silent."""
    budget = int(os.environ.get("SPARK_GRAFT_BENCH_LINE_BYTES", "1800"))
    payload = {
        "metric": "total_query_wall_seconds",
        "value": total,
        "unit": "sec",
        "sf": sf,
        "n_queries": len(timings),
        # the query count grows every round, so the headline total does
        # too — the per-query average is the comparable number across
        # rounds. Denominator counts only SUCCESSFUL queries (failures
        # are recorded as -1.0 and excluded from total, so including
        # them would flatter a failing round).
        "avg_sec_per_query": round(
            total / max(sum(1 for t in timings.values() if t >= 0), 1), 3
        ),
        "queries": {},
        "queries_omitted": len(timings),
    }
    # a budget below the bare envelope must degrade to emitting the
    # envelope (still-parseable totals), never to an assert after the
    # whole bench has run — that would be the exact zero-output failure
    # this function exists to prevent
    budget = max(budget, len(json.dumps(payload, separators=(",", ":"))))
    for name, t in timings.items():
        payload["queries"][name] = t
        if len(json.dumps(payload, separators=(",", ":"))) > budget:
            del payload["queries"][name]
            break
    payload["queries_omitted"] = len(timings) - len(payload["queries"])
    line = json.dumps(payload, separators=(",", ":"))
    assert len(line) <= budget, f"bench line {len(line)}B exceeds budget"
    return line


if __name__ == "__main__":
    raise SystemExit(main())
