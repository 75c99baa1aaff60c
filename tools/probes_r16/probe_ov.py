import os, sys, time, hashlib
sys.path.insert(0, "/root/repo")
from pyspark.sql import functions as F
from nosql_to_sql_migration_tool_spark.session import get_spark
from nosql_to_sql_migration_tool_spark.queries import PREWARMS, QUERIES, _raw_shingles
from nosql_to_sql_migration_tool_spark.sources.registry import load_table
sf_dir = "/root/testdata/sf0.1"
spark = get_spark("probe_ov")
spark.range(1_000_000).selectExpr("sum(id)").write.format("noop").mode("overwrite").save()
for n, fn in PREWARMS.items(): fn(spark, sf_dir)
def noop(df): df.write.format("noop").mode("overwrite").save()
def h(df): return hashlib.md5("\n".join(sorted(str(r) for r in df.collect())).encode()).hexdigest()

cur = lambda: QUERIES["source_overlap_matrix"](spark, sf_dir)

def staged():
    df = load_table(spark, sf_dir, "documents")
    doc_shingles = _raw_shingles(spark, sf_dir)
    group_col, id_col = "source", "doc_id"
    sh = (doc_shingles.join(df.select(id_col, group_col), id_col)
        .select(F.col(group_col).alias("grp"), F.explode("__sh").alias("__s"))
        .distinct().localCheckpoint(eager=True))
    sizes = sh.groupBy("grp").agg(F.count(F.lit(1)).alias("n"))
    inter = (sh.select(F.col("grp").alias("grp_a"),"__s")
        .join(sh.select(F.col("grp").alias("grp_b"),"__s"),"__s")
        .filter(F.col("grp_a")<F.col("grp_b"))
        .groupBy("grp_a","grp_b").agg(F.count(F.lit(1)).alias("n_common")))
    sa = sizes.select(F.col("grp").alias("grp_a"), F.col("n").alias("n_a"))
    sb = sizes.select(F.col("grp").alias("grp_b"), F.col("n").alias("n_b"))
    pairs = F.broadcast(sa).join(F.broadcast(sb), F.col("grp_a")<F.col("grp_b"))
    common = F.coalesce(F.col("n_common"), F.lit(0))
    return (pairs.join(inter, ["grp_a","grp_b"], "left")
        .select(F.col("grp_a").alias("source_a"), F.col("grp_b").alias("source_b"),
            common.alias("n_common"), "n_a", "n_b",
            F.round(common.cast("double")/(F.col("n_a")+F.col("n_b")-common),6).alias("jaccard")))

print("hash cur   :", h(cur()))
print("hash staged:", h(staged()))
for label, fn in (("cur",cur),("staged",staged)): noop(fn())
ts={l:[] for l in ("cur","staged")}
for _ in range(4):
    for label, fn in (("cur",cur),("staged",staged)):
        t0=time.perf_counter(); noop(fn()); ts[label].append(time.perf_counter()-t0)
for l,v in ts.items(): print(f"{min(v):7.3f}s min  {l}  ({', '.join(f'{x:.3f}' for x in v)})", flush=True)
