import os, sys, time, hashlib
sys.path.insert(0, "/root/repo")
from pyspark.sql import Window, functions as F
from nosql_to_sql_migration_tool_spark.session import get_spark
from nosql_to_sql_migration_tool_spark.queries import PREWARMS, _leak_train, _leak_eval
from nosql_to_sql_migration_tool_spark.operators.dedup import (
    _gram_positions, _aligned_span_stats, DEFAULT_SUBSTRING_K,
    DEFAULT_SUBSTRING_MIN_LEN, DEFAULT_SUBSTRING_DF_CAP)
sf_dir = "/root/testdata/sf0.1"
spark = get_spark("probe_cl")
spark.range(1_000_000).selectExpr("sum(id)").write.format("noop").mode("overwrite").save()
for n, fn in PREWARMS.items(): fn(spark, sf_dir)
def noop(df): df.write.format("noop").mode("overwrite").save()
def h(df): return hashlib.md5("\n".join(sorted(str(r) for r in df.collect())).encode()).hexdigest()
train, ev = _leak_train(spark, sf_dir), _leak_eval(spark, sf_dir)
k, df_cap, min_len = DEFAULT_SUBSTRING_K, DEFAULT_SUBSTRING_DF_CAP, DEFAULT_SUBSTRING_MIN_LEN

def current():
    grams_a = _gram_positions(train, "text", "doc_id", k).localCheckpoint(eager=True)
    grams_b = _gram_positions(ev, "text", "doc_id", k).localCheckpoint(eager=True)
    union_rows = grams_a.select("g").unionByName(grams_b.select("g"))
    rare = (union_rows.groupBy("g").agg(F.count(F.lit(1)).alias("__df"))
        .filter(F.col("__df")<=df_cap).select("g"))
    cand = (grams_a.join(rare,"g").select(F.col("id").alias("id_a"),"g")
        .join(grams_b.join(rare,"g").select(F.col("id").alias("id_b"),"g"),"g")
        .select("id_a","id_b").distinct())
    return _aligned_span_stats(cand, grams_a, grams_b, k, min_len)

def windowed():
    grams_a = _gram_positions(train, "text", "doc_id", k).localCheckpoint(eager=True)
    grams_b = _gram_positions(ev, "text", "doc_id", k).localCheckpoint(eager=True)
    tagged = grams_a.select("id","g").withColumn("__s", F.lit("a")).unionByName(
        grams_b.select("id","g").withColumn("__s", F.lit("b")))
    rare_un = (tagged.withColumn("__df", F.count(F.lit(1)).over(Window.partitionBy("g")))
        .filter(F.col("__df")<=df_cap))
    cand = (rare_un.filter(F.col("__s")=="a").select(F.col("id").alias("id_a"),"g")
        .join(rare_un.filter(F.col("__s")=="b").select(F.col("id").alias("id_b"),"g"),"g")
        .select("id_a","id_b").distinct())
    return _aligned_span_stats(cand, grams_a, grams_b, k, min_len)

print("hash current :", h(current()))
print("hash windowed:", h(windowed()))
for label, fn in (("current",current),("windowed",windowed)): noop(fn())
ts={l:[] for l in ("current","windowed")}
for _ in range(4):
    for label, fn in (("current",current),("windowed",windowed)):
        t0=time.perf_counter(); noop(fn()); ts[label].append(time.perf_counter()-t0)
for l,v in ts.items(): print(f"{min(v):7.3f}s min  {l}  ({', '.join(f'{x:.3f}' for x in v)})", flush=True)
