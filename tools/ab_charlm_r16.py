#!/usr/bin/env python
"""charlm_doc_scores restructure A/B (VERDICT r15 next #3): the r15
fold evaluates its F.aggregate lambda interpreted (outside whole-stage
codegen) — decomposed floor 1.59 s with the 256-entry map lookup adding
~0.5 s. Candidates measured here, all hash-compared against the
current form:

  cur          r15 fold: F.aggregate + try_element_at(map literal)
  fold_const   fold with a constant term (the HOF floor — calibration)
  explode_map  r14 explode + map-literal lookup + groupBy (calibration)
  explode_join explode + broadcast LEFT join vs a 118-row model frame
               (everything codegen; BHJ hash lookup instead of the
               O(|model|) linear map scan)
  arrow        mapInArrow: per-batch Python dict lookup + int64 sums
               (guide §4.2 ceiling probe — NOT adoptable without
               widening the sanctioned-Python plan gate)

Usage: SPARK_GRAFT_SF_DIR=... python tools/ab_charlm_r16.py [reps]
"""

from __future__ import annotations

import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import functions as F

from nosql_to_sql_migration_tool_spark.operators.charlm import (
    char_bigrams,
    charlm_score,
)
from nosql_to_sql_migration_tool_spark.queries import (
    CHARLM_FLOOR,
    CHARLM_PINNED,
    load_table,
)
from nosql_to_sql_migration_tool_spark.session import get_spark


def v_cur(docs):
    return charlm_score(docs, CHARLM_PINNED, CHARLM_FLOOR)


def v_fold_const(docs):
    # calibration only: WRONG results (constant per-bigram term)
    row = docs.filter(F.char_length("text") >= 2).select(
        "doc_id",
        (F.char_length("text") - 1).cast("long").alias("__n"),
        F.aggregate(
            char_bigrams(F.col("text")),
            F.lit(0).cast("long"),
            lambda acc, bg: acc + F.lit(CHARLM_FLOOR).cast("long"),
        ).alias("__su"),
    )
    return row.groupBy("doc_id").agg(
        F.sum("__n").alias("n_bigrams"),
        F.round(
            F.sum("__su").cast("double") / (F.lit(1e6) * F.sum("__n")), 6
        ).alias("bits_per_char"),
    )


def _explode_rows(docs):
    return docs.filter(F.char_length("text") >= 2).select(
        "doc_id", F.explode(char_bigrams(F.col("text"))).alias("__bg")
    )


def v_explode_map(docs):
    lm = F.create_map(*[F.lit(x) for bg, su in CHARLM_PINNED for x in (bg, su)])
    su = F.coalesce(
        F.try_element_at(lm, F.col("__bg")),
        F.lit(CHARLM_FLOOR).cast("long"),
    ).cast("long")
    return (
        _explode_rows(docs)
        .select("doc_id", su.alias("__su"))
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_bigrams"),
            F.round(
                F.sum("__su").cast("double")
                / (F.lit(1e6) * F.count(F.lit(1))),
                6,
            ).alias("bits_per_char"),
        )
    )


def v_explode_join(docs):
    spark = docs.sparkSession
    model = spark.createDataFrame(
        [(bg, su) for bg, su in CHARLM_PINNED], "__bg string, __msu long"
    )
    su = F.coalesce(F.col("__msu"), F.lit(CHARLM_FLOOR)).cast("long")
    return (
        _explode_rows(docs)
        .join(F.broadcast(model), "__bg", "left")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_bigrams"),
            F.round(
                F.sum(su).cast("double") / (F.lit(1e6) * F.count(F.lit(1))),
                6,
            ).alias("bits_per_char"),
        )
    )


def v_arrow(docs):
    import pyarrow as pa

    model = dict(CHARLM_PINNED)
    floor = CHARLM_FLOOR
    id_field = docs.schema["doc_id"]

    def score(batches):
        for b in batches:
            ids = b.column("doc_id")
            ns, sus = [], []
            for t in b.column("text"):
                t = t.as_py()
                n = len(t) - 1
                ns.append(n)
                g = model.get
                sus.append(
                    sum(g(t[i : i + 2], floor) for i in range(n))
                )
            yield pa.record_batch(
                [ids, pa.array(ns, pa.int64()), pa.array(sus, pa.int64())],
                names=["doc_id", "__n", "__su"],
            )

    row = (
        docs.filter(F.char_length("text") >= 2)
        .select("doc_id", "text")
        .mapInArrow(
            score, f"doc_id {id_field.dataType.simpleString()}, __n long, __su long"
        )
    )
    return row.groupBy("doc_id").agg(
        F.sum("__n").alias("n_bigrams"),
        F.round(
            F.sum("__su").cast("double") / (F.lit(1e6) * F.sum("__n")), 6
        ).alias("bits_per_char"),
    )


VARIANTS = {
    "cur": v_cur,
    "fold_const": v_fold_const,
    "explode_map": v_explode_map,
    "explode_join": v_explode_join,
    "arrow": v_arrow,
}
CORRECT = {"cur", "explode_map", "explode_join", "arrow"}


def main():
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    names = sys.argv[2:] or list(VARIANTS)
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("ab_charlm_r16")
    spark.range(1_000_000).selectExpr("sum(id)").write.format("noop").mode(
        "overwrite"
    ).save()
    docs = load_table(spark, sf_dir, "documents")
    times = {n: [] for n in names}
    hashes = {}
    for rep in range(reps):
        for n in names:
            spark.sparkContext.setJobDescription(f"charlm {n} rep{rep}")
            t0 = time.perf_counter()
            out = VARIANTS[n](docs)
            out.write.format("noop").mode("overwrite").save()
            times[n].append(time.perf_counter() - t0)
            if rep == 0 and n in CORRECT:
                hashes[n] = sorted(map(tuple, out.collect()))
    base = hashes.get("cur")
    for n in names:
        flag = ""
        if n in hashes and base is not None:
            flag = "  results==cur: %s" % (hashes[n] == base)
        print(f"{n:14s} min {min(times[n]):.3f}  runs {[f'{t:.3f}' for t in times[n]]}{flag}")


if __name__ == "__main__":
    main()
