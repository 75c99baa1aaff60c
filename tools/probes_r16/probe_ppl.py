import os, sys, time, hashlib
sys.path.insert(0, "/root/repo")
from pyspark.sql import functions as F
from nosql_to_sql_migration_tool_spark.session import get_spark
from nosql_to_sql_migration_tool_spark.queries import PREWARMS
from nosql_to_sql_migration_tool_spark.sources.registry import load_table
sf_dir = "/root/testdata/sf0.1"
spark = get_spark("probe_ppl")
spark.range(1_000_000).selectExpr("sum(id)").write.format("noop").mode("overwrite").save()
for n, fn in PREWARMS.items(): fn(spark, sf_dir)
def noop(df): df.write.format("noop").mode("overwrite").save()
def h(df): return hashlib.md5("\n".join(sorted(str(r) for r in df.collect())).encode()).hexdigest()
li = load_table(spark, sf_dir, "lineitem")
basket_col, item_col, min_support = "l_orderkey", "l_partkey", 2

def finalize(items, pairs):
    item_support = items.groupBy("__i").agg(F.count(F.lit(1)).alias("__sup"))
    n_baskets = items.select(F.count_distinct(F.col("__b")).alias("__nb"))
    return (pairs.join(F.broadcast(item_support.select(F.col("__i").alias("item_a"), F.col("__sup").alias("support_a"))), "item_a")
        .join(F.broadcast(item_support.select(F.col("__i").alias("item_b"), F.col("__sup").alias("support_b"))), "item_b")
        .crossJoin(F.broadcast(n_baskets))
        .select("item_a","item_b","pair_support","support_a","support_b",
            F.round((F.col("pair_support")*F.col("__nb")).cast("double")/(F.col("support_a")*F.col("support_b")),6).alias("lift")))

def cur():
    items = li.select(F.col(basket_col).alias("__b"), F.col(item_col).alias("__i")).distinct().localCheckpoint(eager=True)
    a = items.select(F.col("__b"), F.col("__i").alias("item_a"))
    b = items.select(F.col("__b"), F.col("__i").alias("item_b"))
    pairs = (a.join(b,"__b").filter(F.col("item_a")<F.col("item_b"))
        .groupBy("item_a","item_b").agg(F.count(F.lit(1)).alias("pair_support"))
        .filter(F.col("pair_support")>=min_support))
    return finalize(items, pairs)

def arrayv():
    items = li.select(F.col(basket_col).alias("__b"), F.col(item_col).alias("__i")).distinct().localCheckpoint(eager=True)
    baskets = items.groupBy("__b").agg(F.sort_array(F.collect_list("__i")).alias("__is"))
    pairs = (baskets.select(F.explode(F.expr(
        "flatten(transform(__is, (x, i) -> transform(slice(__is, i + 2, size(__is) - i - 1), y -> struct(x as item_a, y as item_b))))"
        )).alias("p"))
        .select("p.item_a","p.item_b")
        .groupBy("item_a","item_b").agg(F.count(F.lit(1)).alias("pair_support"))
        .filter(F.col("pair_support")>=min_support))
    return finalize(items, pairs)

print("hash cur   :", h(cur()))
print("hash arrayv:", h(arrayv()))
for label, fn in (("cur",cur),("arrayv",arrayv)): noop(fn())
ts={l:[] for l in ("cur","arrayv")}
for _ in range(4):
    for label, fn in (("cur",cur),("arrayv",arrayv)):
        t0=time.perf_counter(); noop(fn()); ts[label].append(time.perf_counter()-t0)
for l,v in ts.items(): print(f"{min(v):7.3f}s min  {l}  ({', '.join(f'{x:.3f}' for x in v)})", flush=True)
