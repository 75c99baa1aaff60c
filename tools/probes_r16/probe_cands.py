import os, sys, time, hashlib
sys.path.insert(0, "/root/repo")
from pyspark.sql import functions as F
from nosql_to_sql_migration_tool_spark.session import get_spark
from nosql_to_sql_migration_tool_spark.queries import PREWARMS, _dedup_docs, _dedup_shingles
from nosql_to_sql_migration_tool_spark.operators.dedup import (
    minhash_sig_table, with_salt_cells, MAX_BUCKET_WIDTH, N_BANDS, ROWS_PER_BAND)
sf_dir = "/root/testdata/sf0.1"
spark = get_spark("probe_cands")
spark.range(1_000_000).selectExpr("sum(id)").write.format("noop").mode("overwrite").save()
for n, fn in PREWARMS.items(): fn(spark, sf_dir)
def noop(df): df.write.format("noop").mode("overwrite").save()
def h(df): return hashlib.md5("\n".join(sorted(str(r) for r in df.collect())).encode()).hexdigest()
df = _dedup_docs(spark, sf_dir); sh = _dedup_shingles(spark, sf_dir)

t0=time.perf_counter()
sig = minhash_sig_table(df, "text", "doc_id", sh).localCheckpoint(eager=True)
print(f"sig ckpt: {time.perf_counter()-t0:.3f}s rows={sig.count()}")
bands_arr = F.array(*[F.md5(F.concat_ws(",", *[F.col(f"__h{b*ROWS_PER_BAND+j}") for j in range(ROWS_PER_BAND)])) for b in range(N_BANDS)])
buckets = sig.select("doc_id", F.posexplode(bands_arr).alias("band_idx","band_hash"))
w = buckets.groupBy("band_idx","band_hash").agg(F.count(F.lit(1)).alias("w"))
print("max bucket width:", w.agg(F.max("w")).collect()[0][0], " buckets:", w.count())

keys=["band_idx","band_hash"]
def cur():
    b2 = with_salt_cells(buckets, keys, "doc_id", MAX_BUCKET_WIDTH)
    ks = keys+["__cell"]
    a=b2.select(F.col("doc_id").alias("id_a"),*ks); b=b2.select(F.col("doc_id").alias("id_b"),*ks)
    return a.join(b,ks).filter(F.col("id_a")<F.col("id_b")).select("id_a","id_b").distinct()
def nosalt():
    a=buckets.select(F.col("doc_id").alias("id_a"),*keys); b=buckets.select(F.col("doc_id").alias("id_b"),*keys)
    return a.join(b,keys).filter(F.col("id_a")<F.col("id_b")).select("id_a","id_b").distinct()
print("hash cur   :", h(cur()))
print("hash nosalt:", h(nosalt()))
for label, fn in (("cur",cur),("nosalt",nosalt)): noop(fn())
ts={l:[] for l in ("cur","nosalt")}
for _ in range(4):
    for label, fn in (("cur",cur),("nosalt",nosalt)):
        t0=time.perf_counter(); noop(fn()); ts[label].append(time.perf_counter()-t0)
for l,v in ts.items(): print(f"{min(v):7.3f}s min  {l}  ({', '.join(f'{x:.3f}' for x in v)})", flush=True)
