#!/usr/bin/env python
"""Alternating A/B for the r16 bucket-key semi-prune in
ingest_near_dup_flags / ingest_embedding_near_dup_flags: r15 form
(width dedupe + count over the WHOLE persisted index) vs r16 form
(index pruned to the batch's bucket keys first). Hash-compared.

Usage: SPARK_GRAFT_SF_DIR=... [SPARK_GRAFT_CPUS=8] python tools/ab_ingest_prune_r16.py [reps]
"""

from __future__ import annotations

import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import Window, functions as F


def flags_r15(corpus, batch, threshold, id_col, corpus_buckets, corpus_shingles):
    """r15 ingest_near_dup_flags, verbatim shape (no semi-prune)."""
    from nosql_to_sql_migration_tool_spark.operators.dedup import (
        band_bucket_rows,
        shingle_sets,
    )

    cb = corpus_buckets.select("band_idx", "band_hash", id_col).distinct()
    w = Window.partitionBy("band_idx", "band_hash")
    kept = (
        cb.withColumn("__w", F.count(F.lit(1)).over(w))
        .filter(F.col("__w") <= 64)
        .select("band_idx", "band_hash", F.col(id_col).alias("__corpus_id"))
    )
    bb = band_bucket_rows(batch, "text", id_col).select(
        "band_idx", "band_hash", F.col(id_col).alias("__batch_id")
    )
    cand = (
        bb.join(kept, ["band_idx", "band_hash"])
        .filter(F.col("__batch_id") != F.col("__corpus_id"))
        .select("__batch_id", "__corpus_id")
        .distinct()
        .localCheckpoint(eager=True)
    )
    bsh = shingle_sets(batch, "text", id_col).select(
        F.col(id_col).alias("__batch_id"), F.col("__sh").alias("__sh_b")
    )
    cand_ids = cand.select(F.col("__corpus_id").alias(id_col)).distinct()
    csh = corpus_shingles.join(cand_ids, id_col, "left_semi").select(
        F.col(id_col).alias("__corpus_id"), F.col("__sh").alias("__sh_c")
    )
    jac = F.round(
        F.size(F.array_intersect("__sh_b", "__sh_c"))
        * F.lit(1.0)
        / F.size(F.array_union("__sh_b", "__sh_c")),
        6,
    )
    ver = (
        cand.join(bsh, "__batch_id")
        .join(csh, "__corpus_id")
        .select("__batch_id", jac.alias("__j"))
    )
    agg = ver.groupBy("__batch_id").agg(
        F.count(F.lit(1)).alias("n_cand"), F.max("__j").alias("__best")
    )
    return (
        batch.select(F.col(id_col).alias("__batch_id"))
        .join(agg, "__batch_id", "left")
        .select(
            F.col("__batch_id").alias(id_col),
            F.coalesce(F.col("n_cand"), F.lit(0)).cast("long").alias("n_cand"),
            F.coalesce(F.col("__best"), F.lit(0.0)).alias("best_jaccard"),
            (F.coalesce(F.col("__best"), F.lit(0.0)) >= F.lit(threshold)).alias(
                "is_near_dup"
            ),
        )
    )


def main():
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    import nosql_to_sql_migration_tool_spark.queries as Q
    from nosql_to_sql_migration_tool_spark.operators.dedup import (
        ingest_near_dup_flags,
    )
    from nosql_to_sql_migration_tool_spark.session import get_spark

    spark = get_spark("ab_ingest_prune_r16")
    spark.range(1_000_000).selectExpr("sum(id)").write.format("noop").mode(
        "overwrite"
    ).save()
    Q._force(Q._ingest_corpus_buckets(spark, sf_dir))
    Q._force(Q._raw_shingles(spark, sf_dir))
    docs = Q.load_table(spark, sf_dir, "documents")
    k = F.col("doc_id")
    corpus = Q._ingest_corpus(spark, sf_dir)
    batch = (
        docs.filter(k % 5 == 0)
        .select("doc_id", "text")
        .unionByName(
            docs.filter((k % 5 != 0) & (k % 7 == 1)).select(
                (k + F.lit(1_000_000)).alias("doc_id"),
                F.concat(F.col("text"), F.lit(" near dup tail")).alias("text"),
            )
        )
    )

    def v_r15():
        return flags_r15(
            corpus, batch, 0.6, "doc_id",
            Q._ingest_corpus_buckets(spark, sf_dir),
            Q._raw_shingles(spark, sf_dir),
        )

    def v_r16():
        return ingest_near_dup_flags(
            corpus, batch, threshold=0.6,
            corpus_buckets=Q._ingest_corpus_buckets(spark, sf_dir),
            corpus_shingles=Q._raw_shingles(spark, sf_dir),
        )

    times = {"r15": [], "r16": []}
    hashes = {}
    for rep in range(reps):
        for name, fn in (("r15", v_r15), ("r16", v_r16)):
            spark.sparkContext.setJobDescription(f"{name} rep{rep}")
            t0 = time.perf_counter()
            out = fn()
            out.write.format("noop").mode("overwrite").save()
            times[name].append(time.perf_counter() - t0)
            if rep == 0:
                hashes[name] = sorted(map(tuple, out.collect()))
    for name, ts in times.items():
        print(f"{name}: min {min(ts):.3f}  runs {[f'{t:.3f}' for t in ts]}")
    print("results identical:", hashes["r15"] == hashes["r16"])


if __name__ == "__main__":
    main()
