#!/usr/bin/env python
"""Benchmark harness — the driver's per-round perf probe.

Runs every declared query at ``$SPARK_GRAFT_SF_DIR`` (default sf0.1) on
``local[$SPARK_GRAFT_CPUS]`` and prints exactly ONE JSON line on stdout:

    {"metric": "total_query_sec", "value": N, "unit": "sec",
     "queries": {"q1": sec, ...}, "sf": 0.1}

Each query is forced end-to-end with the ``noop`` sink (full computation
of every column, no driver collect, no disk write) so the timing measures
the distributed plan, not result serialization. A tiny warmup job runs
first so JVM/session startup is not billed to the first query.
"""

from __future__ import annotations

import json
import os
import re
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent))


def _sf_from_dir(sf_dir: str) -> float:
    m = re.search(r"sf([0-9.]+)", sf_dir)
    return float(m.group(1)) if m else -1.0


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    from nosql_to_sql_migration_tool_spark.queries import QUERIES
    from nosql_to_sql_migration_tool_spark.session import get_spark

    spark = get_spark("bench")
    # Warmup: absorb session/JVM/codegen startup outside the timings.
    spark.range(1_000_000).selectExpr("sum(id)").write.format("noop").mode(
        "overwrite"
    ).save()

    timings: dict[str, float] = {}
    errors: list[str] = []
    for name, fn in QUERIES.items():
        start = time.perf_counter()
        try:
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        except Exception as exc:  # one broken query must not zero the bench
            errors.append(name)
            print(f"bench: {name} failed: {exc}", file=sys.stderr)
            continue
        timings[name] = round(time.perf_counter() - start, 3)

    result = {
        "metric": "total_query_sec",
        "value": round(sum(timings.values()), 3),
        "unit": "sec",
        "queries": timings,
        "sf": _sf_from_dir(sf_dir),
    }
    if errors:
        result["errors"] = errors
    print(json.dumps(result), flush=True)


if __name__ == "__main__":
    main()
