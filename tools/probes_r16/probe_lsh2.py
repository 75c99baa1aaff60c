import os, sys, time, hashlib
sys.path.insert(0, "/root/repo")
from pyspark.sql import functions as F
from nosql_to_sql_migration_tool_spark.session import get_spark
from nosql_to_sql_migration_tool_spark.sources.registry import load_table
from nosql_to_sql_migration_tool_spark.operators.similarity import (
    hyperplanes, as_double, dot, _plane_lit)
sf_dir = "/root/testdata/sf0.1"
spark = get_spark("probe_lsh2")
spark.range(1_000_000).selectExpr("sum(id)").write.format("noop").mode("overwrite").save()
def noop(df): df.write.format("noop").mode("overwrite").save()
def h(df): return hashlib.md5("\n".join(sorted(str(r) for r in df.collect())).encode()).hexdigest()
emb = load_table(spark, sf_dir, "embeddings")
planes = hyperplanes()

def cur_bits(vec):
    bits = [F.when(dot(vec, _plane_lit(p)) >= 0, F.lit("1")).otherwise(F.lit("0")) for p in planes]
    return F.concat(*bits)
cur = lambda: emb.select("vec_id", cur_bits(as_double(F.col("embedding"))).alias("__bits"))

import numpy as np
P = np.array(planes, dtype=np.float64)  # (16, 64)

def arrow_fn(batches):
    import pyarrow as pa
    import numpy as np
    P_ = P
    for b in batches:
        ids = b.column("vec_id")
        embs = b.column("embedding")
        # to (n, d) float64
        n = len(embs)
        if n == 0:
            yield pa.record_batch([ids, pa.array([], type=pa.string())], names=["vec_id","__bits"]); continue
        flat = np.asarray(embs.flatten(), dtype=np.float64)
        d = len(flat)//n
        M = flat.reshape(n, d)
        # exact left-fold per plane: products then sequential accumulate
        bits = np.empty((n, P_.shape[0]), dtype=bool)
        for j in range(P_.shape[0]):
            prod = M * P_[j]            # elementwise, exact
            s = np.add.accumulate(prod, axis=1)[:, -1]  # sequential left fold
            bits[:, j] = s >= 0
        strs = ["".join("1" if x else "0" for x in row) for row in bits]
        yield pa.record_batch([ids, pa.array(strs, type=pa.string())], names=["vec_id","__bits"])

arrow = lambda: emb.select("vec_id","embedding").mapInArrow(arrow_fn, "vec_id long, __bits string")
print("hash cur  :", h(cur()))
print("hash arrow:", h(arrow()))
for label, fn in (("cur",cur),("arrow",arrow)): noop(fn())
ts={l:[] for l in ("cur","arrow")}
for _ in range(4):
    for label, fn in (("cur",cur),("arrow",arrow)):
        t0=time.perf_counter(); noop(fn()); ts[label].append(time.perf_counter()-t0)
for l,v in ts.items(): print(f"{min(v):7.3f}s min  {l}  ({', '.join(f'{x:.3f}' for x in v)})", flush=True)
