import os, sys, time, hashlib
sys.path.insert(0, "/root/repo")
from pyspark.sql import Window, functions as F
from nosql_to_sql_migration_tool_spark.session import get_spark
from nosql_to_sql_migration_tool_spark.queries import PREWARMS, _dedup_docs
from nosql_to_sql_migration_tool_spark.operators.dedup import (
    _gram_positions, _aligned_span_stats, _span_stats, DEFAULT_SUBSTRING_K,
    DEFAULT_SUBSTRING_MIN_LEN, DEFAULT_SUBSTRING_DF_CAP)
sf_dir = "/root/testdata/sf0.1"
spark = get_spark("probe_ss2")
spark.range(1_000_000).selectExpr("sum(id)").write.format("noop").mode("overwrite").save()
for n, fn in PREWARMS.items(): fn(spark, sf_dir)
def noop(df): df.write.format("noop").mode("overwrite").save()
def h(df): return hashlib.md5("\n".join(sorted(str(r) for r in df.collect())).encode()).hexdigest()
df = _dedup_docs(spark, sf_dir)
k, df_cap, min_len = DEFAULT_SUBSTRING_K, DEFAULT_SUBSTRING_DF_CAP, DEFAULT_SUBSTRING_MIN_LEN

def current():
    grams = _gram_positions(df, "text", "doc_id", k).localCheckpoint(eager=True)
    rare = grams.groupBy("g").agg(F.count(F.lit(1)).alias("__df")).filter(F.col("__df")<=df_cap).select("g")
    rare_rows = grams.join(rare, "g").select("id","g")
    cand = (rare_rows.select(F.col("id").alias("id_a"),"g")
        .join(rare_rows.select(F.col("id").alias("id_b"),"g"),"g")
        .filter(F.col("id_a")<F.col("id_b")).select("id_a","id_b").distinct())
    return _span_stats(_aligned_span_stats(cand, grams, grams, k, min_len))

def windowed():
    grams = _gram_positions(df, "text", "doc_id", k).localCheckpoint(eager=True)
    rare_rows = (grams.withColumn("__df", F.count(F.lit(1)).over(Window.partitionBy("g")))
        .filter(F.col("__df")<=df_cap).select("id","g"))
    cand = (rare_rows.select(F.col("id").alias("id_a"),"g")
        .join(rare_rows.select(F.col("id").alias("id_b"),"g"),"g")
        .filter(F.col("id_a")<F.col("id_b")).select("id_a","id_b").distinct())
    return _span_stats(_aligned_span_stats(cand, grams, grams, k, min_len))

print("hash current :", h(current()))
print("hash windowed:", h(windowed()))
for label, fn in (("current",current),("windowed",windowed)):
    noop(fn())
ts={l:[] for l in ("current","windowed")}
for _ in range(4):
    for label, fn in (("current",current),("windowed",windowed)):
        t0=time.perf_counter(); noop(fn()); ts[label].append(time.perf_counter()-t0)
for l,v in ts.items(): print(f"{min(v):7.3f}s min  {l}  ({', '.join(f'{x:.3f}' for x in v)})", flush=True)
