#!/usr/bin/env python
"""Driver simulation — the exact verification loop the external driver
runs (see .claude/skills/verify/SKILL.md): smoke `entry(spark)` at
sf0.001, then every `queries()[name]` at sf0.01 hash-compared against
`oracle_sql()[name]` through DuckDB under sorted-column canonical
hashing. Exit code 1 on any mismatch.

Usage::

    python tools/driver_sim.py                # full registry
    python tools/driver_sim.py name1 name2    # subset
"""

from __future__ import annotations

import hashlib
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

SF_DIR = "/root/testdata/sf0.01"
TABLES = (
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
)


def canon(df) -> str:
    return hashlib.md5(
        str(
            sorted(map(tuple, df[sorted(df.columns)].astype(str).values.tolist()))
        ).encode()
    ).hexdigest()


def main() -> int:
    import duckdb

    import __spark_entry__ as e
    from nosql_to_sql_migration_tool_spark.session import get_spark

    spark = get_spark("driver-sim")
    rows = e.entry(spark).collect()
    assert len(rows) > 0, "entry() returned no rows"
    print("entry rows:", len(rows))

    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'"
        )
    subset = set(sys.argv[1:])
    bad = []
    for name, fn in e.queries().items():
        if subset and name not in subset:
            continue
        sdf = fn(spark, SF_DIR).toPandas()
        sql = e.oracle_sql().get(name)
        if sql is None:
            print(name, "rows-only:", len(sdf))
            continue
        ddf = con.sql(sql).df()
        ok = canon(sdf) == canon(ddf) and len(sdf) == len(ddf)
        print(name, "rows", len(sdf), len(ddf), "match:", ok, flush=True)
        if not ok:
            bad.append(name)
    print("MISMATCH:", bad) if bad else print("ALL GREEN")
    return 1 if bad else 0


if __name__ == "__main__":
    raise SystemExit(main())
