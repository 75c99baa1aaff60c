#!/usr/bin/env python
"""Round-15 optimization: one plan-shape audit row PER DECLARED QUERY
(guide §7.2 applied surface-wide) — Exchange/broadcast counts, join
strategies, python stages, sort aggregates, window nodes — dumped as
JSON so the optimization checklist is measured, not guessed. Plans
only; nothing executes beyond what builders run at plan time (prewarms
are built first so memo-consuming queries show their steady-state
plans, same as capture_plans_r15.py).

Usage: SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 \
       python tools/plan_sweep_r15.py /tmp/plan_sweep.json
"""

from __future__ import annotations

import json
import re
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import os


def main() -> None:
    out_path = sys.argv[1] if len(sys.argv) > 1 else "/tmp/plan_sweep.json"
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    from nosql_to_sql_migration_tool_spark.plans.audit import (
        physical_plan,
        plan_report_from_string,
    )
    from nosql_to_sql_migration_tool_spark.queries import PREWARMS, QUERIES
    from nosql_to_sql_migration_tool_spark.session import get_spark

    spark = get_spark("plan_sweep_r15")
    for _, fn in PREWARMS.items():
        fn(spark, sf_dir)

    rows = {}
    for name, fn in QUERIES.items():
        try:
            plan = physical_plan(fn(spark, sf_dir))
        except Exception as exc:
            rows[name] = {"error": str(exc)[:200]}
            continue
        rep = plan_report_from_string(plan)
        rows[name] = {
            "shuffles": rep["shuffles"],
            "broadcasts": rep["broadcasts"],
            "python": rep["python_stages"],
            "cartesian": rep["cartesian_products"],
            "global_windows": rep["global_windows"],
            "smj": len(re.findall(r"SortMergeJoin", plan)),
            "shj": len(re.findall(r"ShuffledHashJoin", plan)),
            "bhj": len(re.findall(r"BroadcastHashJoin", plan)),
            "bnlj": len(re.findall(r"BroadcastNestedLoopJoin", plan)),
            "sort_agg": len(re.findall(r"SortAggregate", plan)),
            "windows": len(re.findall(r"\bWindow\b", plan)),
            "n_scans": len(rep["read_schemas"]),
            "pushed": sum(1 for p in rep["pushed_filters"] if p),
        }
    Path(out_path).write_text(json.dumps(rows, indent=1))
    print(f"wrote {out_path} ({len(rows)} queries)")


if __name__ == "__main__":
    main()
