import os, sys, time, hashlib
sys.path.insert(0, "/root/repo")
from pyspark.sql import functions as F
from nosql_to_sql_migration_tool_spark.session import get_spark
from nosql_to_sql_migration_tool_spark.queries import PREWARMS, _dedup_pairs
sf_dir = "/root/testdata/sf0.1"
spark = get_spark("probe_pr")
spark.range(1_000_000).selectExpr("sum(id)").write.format("noop").mode("overwrite").save()
for n, fn in PREWARMS.items(): fn(spark, sf_dir)
def noop(df): df.write.format("noop").mode("overwrite").save()
def h(df): return hashlib.md5("\n".join(sorted(str(r) for r in df.collect())).encode()).hexdigest()
pairs = _dedup_pairs(spark, sf_dir)

def variant(ckpt_rounds):
    src, dst, n_iter = "id_a", "id_b", 3
    edges = (pairs.select(F.col(src).alias("u"), F.col(dst).alias("v"))
        .unionByName(pairs.select(F.col(dst).alias("u"), F.col(src).alias("v")))
        .distinct().localCheckpoint(eager=True))
    deg = edges.groupBy("u").agg(F.count(F.lit(1)).alias("__d"))
    n_nodes = deg.select(F.count(F.lit(1)).alias("__n"))
    ranks = (deg.crossJoin(F.broadcast(n_nodes))
        .select(F.col("u").alias("node"), "__d", "__n",
                F.round(F.lit(1.0)/F.col("__n"),6).alias("pr"))
        .localCheckpoint(eager=True))
    for _ in range(n_iter):
        contrib = edges.join(ranks, edges["u"]==ranks["node"]).select(
            F.col("v"), F.col("__n"),
            F.round(F.col("pr")/F.col("__d"),6).cast("decimal(18,6)").alias("__c"))
        sums = contrib.groupBy("v","__n").agg(F.sum("__c").alias("__s"))
        new_pr = F.round(F.lit(0.15)/F.col("__n") + F.lit(0.85)*F.col("__s").cast("double"),6)
        ranks = (sums.select(F.col("v").alias("node"), F.col("__n"), new_pr.alias("pr"))
            .join(deg, F.col("node")==deg["u"]).select("node","__d","__n","pr"))
        if ckpt_rounds:
            ranks = ranks.localCheckpoint(eager=True)
    return ranks.select("node", F.col("pr").alias("pagerank"))

cur = lambda: variant(True)
lazy = lambda: variant(False)
print("hash cur :", h(cur()))
print("hash lazy:", h(lazy()))
for label, fn in (("cur",cur),("lazy",lazy)): noop(fn())
ts={l:[] for l in ("cur","lazy")}
for _ in range(4):
    for label, fn in (("cur",cur),("lazy",lazy)):
        t0=time.perf_counter(); noop(fn()); ts[label].append(time.perf_counter()-t0)
for l,v in ts.items(): print(f"{min(v):7.3f}s min  {l}  ({', '.join(f'{x:.3f}' for x in v)})", flush=True)
