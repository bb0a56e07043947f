"""Benchmark runner (driver contract).

Runs every __spark_entry__.queries() entry at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints
ONE JSON line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec}, "sf": ...}.

Each query is materialized with a noop write (full execution, no
driver-side collect cost). A short warmup query primes the JVM/codegen
before timing.

Per-query time is the BEST of $SPARK_GRAFT_BENCH_RUNS runs (default 2):
single cold numbers on a shared host swing 2-15x with page-cache and
CPU contention (round-1 g_timeconv: 17.7 s cold vs 3.2 s warm on an
identical plan), so best-of-N measures the plan, not the host.
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

    spark = get_spark("geist_spark_bench")

    # warmup: JVM + codegen + parquet footer caches
    materialize(spark.read.parquet(f"{sf_dir}/lineitem.parquet").limit(1000))

    runs = max(1, int(os.environ.get("SPARK_GRAFT_BENCH_RUNS", "2")))
    timings: dict[str, float] = {}
    for name, fn in entry_mod.queries().items():
        best = -1.0
        try:
            for _ in range(runs):
                t0 = time.perf_counter()
                materialize(fn(spark, sf_dir))
                dt = time.perf_counter() - t0
                best = dt if best < 0 else min(best, dt)
            timings[name] = round(best, 3)
        except Exception as e:  # a failing query must not hide the rest
            timings[name] = -1.0
            print(f"# bench error in {name}: {e}", file=sys.stderr)

    total = round(sum(t for t in timings.values() if t >= 0), 3)
    print(
        json.dumps(
            {
                "metric": "total_query_wall_seconds",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": sf,
            }
        )
    )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
