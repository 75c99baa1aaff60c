import os, sys, time, hashlib
sys.path.insert(0, "/root/repo")
from pyspark.sql import functions as F
from nosql_to_sql_migration_tool_spark.session import get_spark
from nosql_to_sql_migration_tool_spark.queries import PREWARMS
from nosql_to_sql_migration_tool_spark.sources.registry import load_table
from nosql_to_sql_migration_tool_spark.operators.similarity import (
    hyperplanes, as_double, dot, _plane_lit, N_PLANES, BAND_CHARS)
sf_dir = "/root/testdata/sf0.1"
spark = get_spark("probe_lsh")
spark.range(1_000_000).selectExpr("sum(id)").write.format("noop").mode("overwrite").save()
def noop(df): df.write.format("noop").mode("overwrite").save()
def h(df): return hashlib.md5("\n".join(sorted(str(r) for r in df.collect())).encode()).hexdigest()
emb = load_table(spark, sf_dir, "embeddings")
planes = hyperplanes()

def cur_bits(vec):
    bits = [F.when(dot(vec, _plane_lit(p)) >= 0, F.lit("1")).otherwise(F.lit("0")) for p in planes]
    return F.concat(*bits)

def unrolled_bits(vec):
    outs = []
    for p in planes:
        acc = F.lit(0.0)
        for i, c in enumerate(p):
            acc = acc + vec.getItem(i).cast("double") * F.lit(c)
        outs.append(F.when(acc >= 0, F.lit("1")).otherwise(F.lit("0")))
    return F.concat(*outs)

cur = lambda: emb.select("vec_id", cur_bits(as_double(F.col("embedding"))).alias("__bits"))
unr = lambda: emb.select("vec_id", unrolled_bits(F.col("embedding")).alias("__bits"))
print("hash cur:", h(cur()))
print("hash unr:", h(unr()))
for label, fn in (("cur",cur),("unr",unr)): noop(fn())
ts={l:[] for l in ("cur","unr")}
for _ in range(4):
    for label, fn in (("cur",cur),("unr",unr)):
        t0=time.perf_counter(); noop(fn()); ts[label].append(time.perf_counter()-t0)
for l,v in ts.items(): print(f"{min(v):7.3f}s min  {l}  ({', '.join(f'{x:.3f}' for x in v)})", flush=True)
