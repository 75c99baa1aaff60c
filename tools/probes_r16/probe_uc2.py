import os, sys, time
sys.path.insert(0, "/root/repo")
from pyspark.sql import functions as F
from nosql_to_sql_migration_tool_spark.session import get_spark
from nosql_to_sql_migration_tool_spark.queries import PREWARMS, _dedup_docs, _dedup_pairs
sf_dir = "/root/testdata/sf0.1"
spark = get_spark("probe_uc2")
spark.range(1_000_000).selectExpr("sum(id)").write.format("noop").mode("overwrite").save()
for n, fn in PREWARMS.items(): fn(spark, sf_dir)

docs = _dedup_docs(spark, sf_dir)
pairs = _dedup_pairs(spark, sf_dir)
churn = (F.col("id_a") + F.col("id_b")) % 3 == 0

def run_loop(pairs_df, ckpt_every):
    pairs_df = pairs_df.select("id_a","id_b")
    edges = pairs_df.union(pairs_df.select(F.col("id_b"),F.col("id_a"))).toDF("src","dst").localCheckpoint(eager=True)
    labels = edges.select(F.col("src").alias("node")).distinct().withColumn("comp",F.col("node")).localCheckpoint(eager=True)
    r=0
    while True:
        neighbor_min = (edges.join(labels, edges.dst==F.col("node")).groupBy(edges.src.alias("node")).agg(F.min("comp").alias("n_comp")))
        joined = labels.join(neighbor_min,"node","left")
        r+=1
        if ckpt_every and r % ckpt_every == 0:
            joined = joined.localCheckpoint(eager=True)
        n_changed = joined.filter(F.col("n_comp")<F.col("comp")).count()
        labels = joined.select("node",F.least(F.col("comp"),F.coalesce(F.col("n_comp"),F.col("comp"))).alias("comp"))
        if n_changed==0: break
    return labels, r

def time_variant(label, ckpt_every, reps=3):
    ts=[]
    for _ in range(reps):
        t0=time.perf_counter()
        l,_r = run_loop(pairs.filter(~churn), ckpt_every)
        l.write.format("noop").mode("overwrite").save()
        ts.append(time.perf_counter()-t0)
    print(f"{label}: min {min(ts):.3f}s rounds={_r} ({', '.join(f'{t:.3f}' for t in ts)})", flush=True)

time_variant("ckpt every round (current)", 1)
time_variant("no ckpt", 0)
time_variant("ckpt every 3", 3)
# hash parity
import hashlib
def h(df): return hashlib.md5("\n".join(sorted(str(r) for r in df.collect())).encode()).hexdigest()
a,_=run_loop(pairs.filter(~churn),1); b,_=run_loop(pairs.filter(~churn),0); c,_=run_loop(pairs.filter(~churn),3)
print("hashes:", h(a), h(b), h(c))
