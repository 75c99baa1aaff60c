import os, sys, time, hashlib
sys.path.insert(0, "/root/repo")
from pyspark.sql import functions as F
from nosql_to_sql_migration_tool_spark.session import get_spark
from nosql_to_sql_migration_tool_spark.queries import PREWARMS, QUERIES
sf_dir = "/root/testdata/sf0.1"
spark = get_spark("check_emb")
spark.range(1_000_000).selectExpr("sum(id)").write.format("noop").mode("overwrite").save()
for n, fn in PREWARMS.items(): fn(spark, sf_dir)
def noop(df): df.write.format("noop").mode("overwrite").save()
def h(df): return hashlib.md5("\n".join(sorted(str(r) for r in df.collect())).encode()).hexdigest()
q = lambda: QUERIES["ingest_embedding_near_dup"](spark, sf_dir)
print("hash new impl:", h(q()))
noop(q())
ts=[]
for _ in range(4):
    t0=time.perf_counter(); noop(q()); ts.append(time.perf_counter()-t0)
print(f"min {min(ts):.3f}s ({', '.join(f'{t:.3f}' for t in ts)})")
