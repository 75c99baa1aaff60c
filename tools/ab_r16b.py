#!/usr/bin/env python
"""Round-16 session-2 micro A/Bs: alternating min-of-N variants, noop
sink, one session (guide §1). Cases:

  scrub     — current (anti-join rewrite already applied in-place) vs
              a frozen replica of the r15 exceptAll shape; also hash
              parity between the two.
  docdup    — current doc_duplication_rate vs single-derivation
              (g,id)-count + window / + join variants; hash parity.
  updatecomp— round count + per-round timing probe for
              update_components' propagation loops.

Usage: SPARK_GRAFT_CPUS=32 python tools/ab_r16b.py <case> [repeats]
"""

from __future__ import annotations

import hashlib
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import Window, functions as F


def _noop(df):
    df.write.format("noop").mode("overwrite").save()


def _hash(df):
    rows = sorted(str(r) for r in df.collect())
    return hashlib.md5("\n".join(rows).encode()).hexdigest()


def _ab(spark, variants, repeats):
    # warm every variant once, then alternate
    for label, fn in variants:
        _noop(fn())
    times = {label: [] for label, _ in variants}
    for _ in range(repeats):
        for label, fn in variants:
            t0 = time.perf_counter()
            _noop(fn())
            times[label].append(time.perf_counter() - t0)
    for label, ts in times.items():
        print(
            f"{min(ts):7.3f}s min  {label}  ("
            + ", ".join(f"{t:.3f}" for t in ts)
            + ")",
            flush=True,
        )


def case_scrub(spark, sf_dir, repeats):
    from nosql_to_sql_migration_tool_spark.queries import (
        QUERIES,
        _leak_eval,
        _leak_spans,
        _leak_train,
    )
    from nosql_to_sql_migration_tool_spark.operators.dedup import (
        leaked_span_positions,
        tokens,
    )

    train = _leak_train(spark, sf_dir)
    positions = leaked_span_positions(
        train, _leak_eval(spark, sf_dir), spans=_leak_spans(spark, sf_dir)
    )

    def old_exceptall():
        id_col, text_col = "doc_id", "text"
        spans = positions
        df = train
        affected_ids = spans.select(id_col).distinct()
        affected = df.join(affected_ids, id_col, "semi")
        untouched = df.join(affected_ids, id_col, "anti")
        toks = affected.select(
            id_col,
            F.posexplode(tokens(F.col(text_col))).alias("__pos", "__tok"),
        )
        leaked = toks.alias("t").join(
            spans.alias("s"),
            (F.col(f"t.{id_col}") == F.col(f"s.{id_col}"))
            & (F.col("t.__pos") >= F.col("s.start_pos"))
            & (
                F.col("t.__pos")
                < F.col("s.start_pos") + F.col("s.span_words")
            ),
            "semi",
        )
        kept = toks.exceptAll(leaked)
        rebuilt = kept.groupBy(id_col).agg(
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("__pos", "__tok"))),
                    lambda st: st["__tok"],
                ),
                " ",
            ).alias(text_col)
        )
        rebuilt = (
            affected.select(id_col)
            .join(rebuilt, id_col, "left")
            .select(
                id_col,
                F.coalesce(F.col(text_col), F.lit("")).alias(text_col),
            )
        )
        return untouched.select(df.columns).unionByName(
            rebuilt.select(df.columns)
        ).select("doc_id", "text")

    new = lambda: QUERIES["scrub_token_spans"](spark, sf_dir)
    print("hash old:", _hash(old_exceptall()))
    print("hash new:", _hash(new()))
    _ab(spark, [("old exceptAll", old_exceptall), ("new anti-join", new)], repeats)


def case_docdup(spark, sf_dir, repeats):
    from nosql_to_sql_migration_tool_spark.queries import _dedup_docs
    from nosql_to_sql_migration_tool_spark.operators.text import (
        doc_duplication_rate,
        tokens,
    )

    df = _dedup_docs(spark, sf_dir)
    k, id_col, text_col = 5, "doc_id", "text"

    def _grams():
        return df.select(
            F.col(id_col).alias("id"), tokens(F.col(text_col)).alias("__t")
        ).select(
            "id",
            F.explode(
                F.when(
                    F.size("__t") >= k,
                    F.expr(
                        f"transform(sequence(1, size(__t) - {k - 1}), "
                        f"i -> array_join(slice(__t, i, {k}), ' '))"
                    ),
                ).otherwise(F.array().cast("array<string>"))
            ).alias("g"),
        )

    def _finalize(per_doc):
        return (
            df.select(F.col(id_col).alias("id"))
            .join(per_doc, "id", "left")
            .select(
                F.col("id").alias(id_col),
                F.coalesce("n_grams", F.lit(0)).cast("long").alias("n_grams"),
                F.coalesce("n_duplicated", F.lit(0))
                .cast("long")
                .alias("n_duplicated"),
                F.when(
                    F.coalesce("n_grams", F.lit(0)) > 0,
                    F.round(
                        F.col("n_duplicated").cast("double")
                        / F.col("n_grams").cast("double"),
                        6,
                    ),
                ).alias("dup_rate"),
            )
        )

    def current():
        return doc_duplication_rate(df)

    def windowed():
        cnt = _grams().groupBy("g", "id").agg(F.count(F.lit(1)).alias("__c"))
        w = Window.partitionBy("g")
        flagged = cnt.withColumn("__nd", F.count(F.lit(1)).over(w))
        per_doc = flagged.groupBy("id").agg(
            F.sum("__c").cast("long").alias("n_grams"),
            F.sum(F.when(F.col("__nd") > 1, F.col("__c")).otherwise(F.lit(0)))
            .cast("long")
            .alias("n_duplicated"),
        )
        return _finalize(per_doc)

    def joined():
        cnt = _grams().groupBy("g", "id").agg(F.count(F.lit(1)).alias("__c"))
        gdf = cnt.groupBy("g").agg(F.count(F.lit(1)).alias("__nd"))
        per_doc = (
            cnt.join(gdf, "g")
            .groupBy("id")
            .agg(
                F.sum("__c").cast("long").alias("n_grams"),
                F.sum(
                    F.when(F.col("__nd") > 1, F.col("__c")).otherwise(F.lit(0))
                )
                .cast("long")
                .alias("n_duplicated"),
            )
        )
        return _finalize(per_doc)

    print("hash current :", _hash(current()))
    print("hash windowed:", _hash(windowed()))
    print("hash joined  :", _hash(joined()))
    _ab(
        spark,
        [("current", current), ("windowed", windowed), ("joined", joined)],
        repeats,
    )


def case_updatecomp(spark, sf_dir, repeats):
    # instrument: how many propagation rounds run, and job counts
    from nosql_to_sql_migration_tool_spark.queries import (
        QUERIES,
        _dedup_docs,
        _dedup_pairs,
    )

    tracker = spark.sparkContext.statusTracker()
    before = tracker.getJobIdsForGroup(None)
    q = QUERIES["update_components"]
    t0 = time.perf_counter()
    _noop(q(spark, sf_dir))
    print(f"update_components first: {time.perf_counter()-t0:.3f}s")
    t0 = time.perf_counter()
    _noop(q(spark, sf_dir))
    print(f"update_components again: {time.perf_counter()-t0:.3f}s")


def main():
    case = sys.argv[1]
    repeats = int(sys.argv[2]) if len(sys.argv) > 2 else 4
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    from nosql_to_sql_migration_tool_spark.queries import PREWARMS
    from nosql_to_sql_migration_tool_spark.session import get_spark

    spark = get_spark("ab_r16b")
    spark.range(1_000_000).selectExpr("sum(id)").write.format("noop").mode(
        "overwrite"
    ).save()
    for name, fn in PREWARMS.items():
        fn(spark, sf_dir)
    globals()[f"case_{case}"](spark, sf_dir, repeats)


if __name__ == "__main__":
    main()
