#!/usr/bin/env python
"""Round-16 steady-state per-query timer (guide §1: measure first,
noop sink, min-of-N). Runs the bench prewarms once (untimed), then
times each named query min-of-N in bench steady-state conditions.

Usage: SPARK_GRAFT_CPUS=32 python tools/measure_r16.py q1 q2 ... [--n 3]
"""

from __future__ import annotations

import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main() -> None:
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    n = 3
    for a in sys.argv[1:]:
        if a.startswith("--n="):
            n = int(a.split("=")[1])
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    from nosql_to_sql_migration_tool_spark.queries import PREWARMS, QUERIES
    from nosql_to_sql_migration_tool_spark.session import get_spark

    spark = get_spark("measure_r16")
    spark.range(1_000_000).selectExpr("sum(id)").write.format("noop").mode(
        "overwrite"
    ).save()
    for name, fn in PREWARMS.items():
        fn(spark, sf_dir)
    names = args if args else []
    for q in names:
        fn = QUERIES[q]
        best = None
        runs = []
        for _ in range(n):
            t0 = time.perf_counter()
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            dt = time.perf_counter() - t0
            runs.append(dt)
            best = dt if best is None else min(best, dt)
        print(
            f"{best:7.3f}s  {q}  (runs: "
            + ", ".join(f"{r:.3f}" for r in runs)
            + ")",
            flush=True,
        )


if __name__ == "__main__":
    main()
