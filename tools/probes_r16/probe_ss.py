import os, sys, time
sys.path.insert(0, "/root/repo")
from pyspark.sql import functions as F
from nosql_to_sql_migration_tool_spark.session import get_spark
from nosql_to_sql_migration_tool_spark.queries import PREWARMS, _dedup_docs
from nosql_to_sql_migration_tool_spark.operators.dedup import (
    _gram_positions, _aligned_span_stats, _span_stats, DEFAULT_SUBSTRING_K,
    DEFAULT_SUBSTRING_MIN_LEN, DEFAULT_SUBSTRING_DF_CAP)
sf_dir = "/root/testdata/sf0.1"
spark = get_spark("probe_ss")
spark.range(1_000_000).selectExpr("sum(id)").write.format("noop").mode("overwrite").save()
for n, fn in PREWARMS.items(): fn(spark, sf_dir)
def noop(df): df.write.format("noop").mode("overwrite").save()
df = _dedup_docs(spark, sf_dir)
k, df_cap, min_len = DEFAULT_SUBSTRING_K, DEFAULT_SUBSTRING_DF_CAP, DEFAULT_SUBSTRING_MIN_LEN
for rep in range(2):
    t0=time.perf_counter()
    grams = _gram_positions(df, "text", "doc_id", k).localCheckpoint(eager=True)
    t1=time.perf_counter()
    rare = grams.groupBy("g").agg(F.count(F.lit(1)).alias("__df")).filter(F.col("__df")<=df_cap).select("g")
    rare_rows = grams.join(rare, "g").select("id","g")
    cand = (rare_rows.select(F.col("id").alias("id_a"),"g")
        .join(rare_rows.select(F.col("id").alias("id_b"),"g"),"g")
        .filter(F.col("id_a")<F.col("id_b")).select("id_a","id_b").distinct())
    noop(cand)
    t2=time.perf_counter()
    full = _span_stats(_aligned_span_stats(cand, grams, grams, k, min_len))
    noop(full)
    t3=time.perf_counter()
    print(f"rep{rep}: grams ckpt {t1-t0:.3f}s  cand {t2-t1:.3f}s  align+stats {t3-t2:.3f}s  total {t3-t0:.3f}s", flush=True)
print("grams rows:", grams.count(), " cand rows:", cand.count())
