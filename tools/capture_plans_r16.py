#!/usr/bin/env python
"""Capture `.explain('formatted')` for named queries into plans/r16/.

Usage:
    python tools/capture_plans_r16.py before q1 q2 ...
    python tools/capture_plans_r16.py after q1 q2 ...

Prewarm memos the queries depend on are built first (same order as
bench.py) so the captured plan is the steady-state one the bench times
(persisted memo scans show as InMemoryTableScan, exactly what executes).
"""

from __future__ import annotations

import os
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))


def main() -> None:
    suffix = sys.argv[1]
    names = sys.argv[2:]
    assert suffix in ("before", "after"), "first arg: before|after"
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    from nosql_to_sql_migration_tool_spark.queries import PREWARMS, QUERIES
    from nosql_to_sql_migration_tool_spark.session import get_spark

    spark = get_spark("capture_plans_r16")
    for pname, fn in PREWARMS.items():
        fn(spark, sf_dir)

    out_dir = REPO / "plans" / "r16"
    out_dir.mkdir(parents=True, exist_ok=True)
    for name in names:
        df = QUERIES[name](spark, sf_dir)
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        (out_dir / f"{name}_{suffix}.txt").write_text(plan)
        print(f"wrote {name}_{suffix}.txt ({len(plan)} chars)")


if __name__ == "__main__":
    main()
