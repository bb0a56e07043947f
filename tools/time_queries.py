"""Time a subset of declared queries with the noop sink (guide §1.4).

Usage: python tools/time_queries.py [-n RUNS] <query> [query ...]

Same methodology as bench.py (noop materialize, warmup, best-of-N)
but restricted to the named queries so an optimization loop can
re-measure its targets in seconds instead of re-running the full
registry. Prints one line per query: best / all runs.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    args = sys.argv[1:]
    runs = 2
    if args and args[0] == "-n":
        runs = int(args[1])
        args = args[2:]
    if not args:
        print("usage: time_queries.py [-n RUNS] query [query ...]")
        return 2

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    import __spark_entry__ as entry_mod
    from geist_spark.session import get_spark

    spark = get_spark(
        "time_queries", **{"spark.ui.showConsoleProgress": "false"}
    )
    spark.sparkContext.setLogLevel("ERROR")

    def materialize(df) -> None:
        df.write.format("noop").mode("overwrite").save()

    # warmup: JVM + codegen + parquet footer caches (bench.py parity)
    materialize(spark.read.parquet(f"{sf_dir}/lineitem.parquet").limit(1000))

    qs = entry_mod.queries()
    for name in args:
        if name not in qs:
            print(f"{name}: NOT DECLARED")
            continue
        spark.sparkContext.setJobDescription(f"time:{name}")
        ts = []
        for _ in range(runs):
            t0 = time.perf_counter()
            materialize(qs[name](spark, sf_dir))
            ts.append(time.perf_counter() - t0)
        print(
            f"{name:32s} best {min(ts):6.2f}s   "
            + " ".join(f"{t:.2f}" for t in ts)
        )
        spark.sparkContext.setJobDescription(None)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
