#!/usr/bin/env python
"""Alternating A/B: r15 exact_quantiles (full-histogram checkpoint) vs
the r16 crossing-slice form, same session, hash-compared. Usage:
SPARK_GRAFT_SF_DIR=... python tools/ab_quantiles_r16.py [reps]
"""

from __future__ import annotations

import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import functions as F


def exact_quantiles_r15(df, col, qs=(0.25, 0.5, 0.75, 0.9, 0.99)):
    """The r15 form, verbatim shape: full distinct-value histogram
    checkpointed, boundaries/totals derived from the checkpoint,
    window pruned to crossing buckets of the STAGED histogram."""
    from pyspark.sql import Window

    from nosql_to_sql_migration_tool_spark.operators.ranking import (
        range_bucket_expr,
    )

    vals = df.select(F.col(col).cast("double").alias("__v")).where(
        F.col("__v").isNotNull()
    )
    hist = (
        vals.groupBy("__v")
        .agg(F.count(F.lit(1)).alias("__c"))
        .localCheckpoint(eager=True)
    )
    bkt = range_bucket_expr(hist, "__v", 32)
    with_bkt = hist.withColumn("__bkt", bkt)
    totals = sorted(
        (r[0], r[1] if r[1] is not None else 0)
        for r in with_bkt.groupBy("__bkt").agg(F.sum("__c").alias("__t")).collect()
    )
    n = sum(t for _, t in totals)
    offsets, acc = {}, 0
    for b, t in totals:
        offsets[b] = acc
        acc += t
    needed = set()
    for q in qs:
        target = float(q) * float(n)
        run = 0
        for b, t in totals:
            run += t
            if float(run) >= target:
                needed.add(b)
                break
    if needed:
        sel = with_bkt.filter(F.col("__bkt").isin(*sorted(needed)))
        off = F.lit(0).cast("long")
        for b in sorted(needed):
            off = F.when(
                F.col("__bkt") == F.lit(b), F.lit(offsets[b]).cast("long")
            ).otherwise(off)
    else:
        sel = with_bkt.filter(F.lit(False))
        off = F.lit(0).cast("long")
    w = (
        Window.partitionBy("__bkt")
        .orderBy("__v")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = sel.withColumn("__cum", F.sum("__c").over(w) + off)
    picked = cum.agg(
        *[
            F.min(
                F.when(F.col("__cum") >= F.lit(float(q) * float(n)), F.col("__v"))
            ).alias(f"__x{i}")
            for i, q in enumerate(qs)
        ]
    )
    pairs = F.array(
        *[
            F.struct(F.lit(float(q)).alias("q"), F.col(f"__x{i}").alias("exact"))
            for i, q in enumerate(qs)
        ]
    )
    return picked.select(F.explode(pairs).alias("__p")).select(
        F.col("__p.q").alias("q"), F.col("__p.exact").alias("exact")
    )


def main():
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    from nosql_to_sql_migration_tool_spark.operators.sketches import (
        exact_quantiles,
    )
    from nosql_to_sql_migration_tool_spark.session import get_spark

    spark = get_spark("ab_quantiles_r16")
    spark.range(1_000_000).selectExpr("sum(id)").write.format("noop").mode(
        "overwrite"
    ).save()
    li = spark.read.parquet(os.path.join(sf_dir, "lineitem.parquet"))
    results = {"r15": [], "r16": []}
    hashes = {}
    for rep in range(reps):
        for name, fn in (("r15", exact_quantiles_r15), ("r16", exact_quantiles)):
            spark.sparkContext.setJobDescription(f"{name} rep{rep}")
            t0 = time.perf_counter()
            out = fn(li, "l_extendedprice")
            out.write.format("noop").mode("overwrite").save()
            results[name].append(time.perf_counter() - t0)
            hashes[name] = sorted(map(tuple, out.collect()))
    assert hashes["r15"] == hashes["r16"], "RESULTS DIVERGED"
    for name, ts in results.items():
        print(f"{name}: min {min(ts):.3f}  runs {[f'{t:.3f}' for t in ts]}")
    print("results identical:", hashes["r15"] == hashes["r16"])


if __name__ == "__main__":
    main()
