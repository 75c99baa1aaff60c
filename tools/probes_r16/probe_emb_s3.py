#!/usr/bin/env python
"""Decompose embedding_near_dup (memo_emb_pairs) stage costs and A/B
the Arrow-signature + norm-hoist variants for bit-parity and time."""

from __future__ import annotations

import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent.parent))

import nosql_to_sql_migration_tool_spark.queries as Q
from nosql_to_sql_migration_tool_spark.session import get_spark
from pyspark.sql import functions as F

from nosql_to_sql_migration_tool_spark.fixtures import duplicated_embeddings
from nosql_to_sql_migration_tool_spark.operators import similarity as S


def variant_current(df, threshold=0.9):
    return S.embedding_near_dup(df, threshold=threshold)


def variant_arrow_hoist(df, threshold=0.9, vec_col="embedding",
                        id_col="vec_id"):
    """Arrow bit-signature (proven kernel) + per-vector norm hoist in
    the verify join."""
    bands = S.embedding_band_rows(df, vec_col=vec_col, id_col=id_col)
    keys = ["band_idx", "band_val"]
    a = bands.select(F.col(id_col).alias("id_a"), *keys)
    b = bands.select(F.col(id_col).alias("id_b"), *keys)
    cands = (
        a.join(b, keys)
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
        .distinct()
    )
    base = df.select(
        F.col(id_col), S.as_double(F.col(vec_col)).alias("__v")
    ).select(
        id_col,
        "__v",
        F.sqrt(S.dot(F.col("__v"), F.col("__v"))).alias("__n"),
    )
    va = base.select(
        F.col(id_col).alias("id_a"),
        F.col("__v").alias("__va"),
        F.col("__n").alias("__na"),
    )
    vb = base.select(
        F.col(id_col).alias("id_b"),
        F.col("__v").alias("__vb"),
        F.col("__n").alias("__nb"),
    )
    cos = F.round(
        S.dot(F.col("__va"), F.col("__vb"))
        / (F.col("__na") * F.col("__nb")),
        6,
    )
    pairs = (
        cands.join(va, "id_a")
        .join(vb, "id_b")
        .select("id_a", "id_b", cos.alias("cos_sim"))
    )
    return pairs.filter(F.col("cos_sim") >= threshold)


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("probe_emb_s3")
    spark.range(1_000_000).selectExpr("sum(id)").write.format("noop").mode(
        "overwrite"
    ).save()
    emb = duplicated_embeddings(
        Q.load_table(spark, sf_dir, "embeddings")
    ).localCheckpoint(eager=True)

    def noop(df):
        df.write.format("noop").mode("overwrite").save()

    def t(label, fn, n=4):
        best = None
        for _ in range(n):
            t0 = time.perf_counter()
            fn()
            dt = time.perf_counter() - t0
            best = dt if best is None else min(best, dt)
        print(f"{best:8.2f}s  {label}", flush=True)

    # stage decomposition of the current shape
    sigs = emb.select(
        "vec_id", S.as_double(F.col("embedding")).alias("__v")
    ).select("vec_id", S.lsh_bits(F.col("__v")).alias("__bits"))
    t("stage: lsh_bits sigs (JVM fold)", lambda: noop(sigs))
    t(
        "stage: arrow band rows",
        lambda: noop(S.embedding_band_rows(emb)),
    )
    # hash parity + timing, alternating
    cur = lambda: variant_current(emb)
    new = lambda: variant_arrow_hoist(emb)
    h1 = (
        cur()
        .agg(F.bit_xor(F.xxhash64("id_a", "id_b", "cos_sim")))
        .collect()[0][0]
    )
    h2 = (
        new()
        .agg(F.bit_xor(F.xxhash64("id_a", "id_b", "cos_sim")))
        .collect()[0][0]
    )
    print("hash parity:", h1 == h2, h1, h2, flush=True)
    for rep in range(3):
        t(f"[{rep}] current embedding_near_dup", lambda: noop(cur()), n=1)
        t(f"[{rep}] arrow+hoist variant", lambda: noop(new()), n=1)
    # truth pairs hoist parity + timing
    def truth_cur():
        return S.sampled_truth_pairs(emb, threshold=0.9, sample_limit=64)

    def truth_hoist():
        base = emb.select(
            "vec_id", S.as_double(F.col("embedding")).alias("__v")
        ).select(
            "vec_id",
            "__v",
            F.sqrt(S.dot(F.col("__v"), F.col("__v"))).alias("__n"),
        )
        sample = (
            base.withColumn("__m", F.md5(F.col("vec_id").cast("string")))
            .orderBy("__m", "vec_id")
            .limit(64)
            .select(
                F.col("vec_id").alias("__sid"),
                F.col("__v").alias("__sv"),
                F.col("__n").alias("__sn"),
            )
        )
        cos = F.round(
            S.dot(F.col("__v"), F.col("__sv"))
            / (F.col("__n") * F.col("__sn")),
            6,
        )
        return (
            base.crossJoin(F.broadcast(sample))
            .filter(F.col("vec_id") != F.col("__sid"))
            .select(
                F.least("vec_id", "__sid").alias("id_a"),
                F.greatest("vec_id", "__sid").alias("id_b"),
                cos.alias("cos_sim"),
            )
            .filter(F.col("cos_sim") >= 0.9)
            .distinct()
        )

    h1 = (
        truth_cur()
        .agg(F.bit_xor(F.xxhash64("id_a", "id_b", "cos_sim")))
        .collect()[0][0]
    )
    h2 = (
        truth_hoist()
        .agg(F.bit_xor(F.xxhash64("id_a", "id_b", "cos_sim")))
        .collect()[0][0]
    )
    print("truth hash parity:", h1 == h2, h1, h2, flush=True)
    for rep in range(3):
        t(f"[{rep}] current truth_pairs", lambda: noop(truth_cur()), n=1)
        t(f"[{rep}] hoisted truth_pairs", lambda: noop(truth_hoist()), n=1)


if __name__ == "__main__":
    main()
