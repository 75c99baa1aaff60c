#!/usr/bin/env python
"""A/B harness for the build:* prewarm rows ONLY (guide §1: isolate the
thing being measured). Runs the same warmup as bench.py, then times each
PREWARM row once (they memoize in-process, so one run per process) and
prints one JSON line. Run it alternately with the sequential and the
overlapped queries.py to A/B the §2.6 concurrency change.

Usage: python tools/ab_builds_r15.py [label]
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main() -> None:
    label = sys.argv[1] if len(sys.argv) > 1 else "run"
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    from nosql_to_sql_migration_tool_spark.queries import PREWARMS
    from nosql_to_sql_migration_tool_spark.session import get_spark

    spark = get_spark("ab_builds_r15")
    spark.range(1_000_000).selectExpr("sum(id)").write.format("noop").mode(
        "overwrite"
    ).save()

    timings = {}
    t_all = time.perf_counter()
    for name, fn in PREWARMS.items():
        t0 = time.perf_counter()
        fn(spark, sf_dir)
        timings[name] = round(time.perf_counter() - t0, 2)
    total = round(time.perf_counter() - t_all, 2)
    print(json.dumps({"label": label, "total": total, "rows": timings}))


if __name__ == "__main__":
    main()
