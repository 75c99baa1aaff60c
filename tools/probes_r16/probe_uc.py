import os, sys, time
sys.path.insert(0, "/root/repo")
from pyspark.sql import functions as F
from nosql_to_sql_migration_tool_spark.session import get_spark
from nosql_to_sql_migration_tool_spark.queries import PREWARMS, _dedup_docs, _dedup_pairs
sf_dir = "/root/testdata/sf0.1"
spark = get_spark("probe_uc")
spark.range(1_000_000).selectExpr("sum(id)").write.format("noop").mode("overwrite").save()
for n, fn in PREWARMS.items(): fn(spark, sf_dir)

docs = _dedup_docs(spark, sf_dir)
pairs = _dedup_pairs(spark, sf_dir)
churn = (F.col("id_a") + F.col("id_b")) % 3 == 0
old_pairs = pairs.filter(~churn); new_pairs = pairs.filter(churn)
print("pairs:", pairs.count(), "old:", old_pairs.count(), "new:", new_pairs.count())

# instrumented near_dup_components loop
def loop(pairs_df, label):
    t00=time.perf_counter()
    pairs_df = pairs_df.select("id_a","id_b")
    edges = pairs_df.union(pairs_df.select(F.col("id_b"),F.col("id_a"))).toDF("src","dst").localCheckpoint(eager=True)
    labels = edges.select(F.col("src").alias("node")).distinct().withColumn("comp",F.col("node")).localCheckpoint(eager=True)
    print(f"{label}: setup {time.perf_counter()-t00:.3f}s edges={edges.count()} nodes={labels.count()}")
    r=0
    while True:
        t0=time.perf_counter()
        neighbor_min = (edges.join(labels, edges.dst==F.col("node")).groupBy(edges.src.alias("node")).agg(F.min("comp").alias("n_comp")))
        joined = labels.join(neighbor_min,"node","left").localCheckpoint(eager=True)
        t1=time.perf_counter()
        n_changed = joined.filter(F.col("n_comp")<F.col("comp")).count()
        t2=time.perf_counter()
        labels = joined.select("node",F.least(F.col("comp"),F.coalesce(F.col("n_comp"),F.col("comp"))).alias("comp"))
        r+=1
        print(f"  round {r}: ckpt {t1-t0:.3f}s count {t2-t1:.3f}s changed={n_changed}")
        if n_changed==0: break
    print(f"{label}: total {time.perf_counter()-t00:.3f}s rounds={r}")
    return labels

t0=time.perf_counter()
l1 = loop(old_pairs, "labels(old)")
