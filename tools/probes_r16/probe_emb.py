import os, sys, time
sys.path.insert(0, "/root/repo")
from pyspark.sql import functions as F
from nosql_to_sql_migration_tool_spark.session import get_spark
from nosql_to_sql_migration_tool_spark.queries import PREWARMS, QUERIES, _ingest_emb_corpus, _ingest_emb_bands
from nosql_to_sql_migration_tool_spark.sources.registry import load_table
from nosql_to_sql_migration_tool_spark.operators.similarity import embedding_band_rows, ingest_embedding_near_dup_flags
sf_dir = "/root/testdata/sf0.1"
spark = get_spark("probe_emb")
spark.range(1_000_000).selectExpr("sum(id)").write.format("noop").mode("overwrite").save()
for n, fn in PREWARMS.items(): fn(spark, sf_dir)
def noop(df): df.write.format("noop").mode("overwrite").save()
emb = load_table(spark, sf_dir, "embeddings")
k = F.col("vec_id")
batch = (emb.filter(k % 5 == 0).select("vec_id","embedding")
    .unionByName(emb.filter((k % 5 != 0) & (k % 7 == 1)).select((k+F.lit(1_000_000)).alias("vec_id"),"embedding")))
print("batch rows:", batch.count(), "emb rows:", emb.count())
for rep in range(3):
    t0=time.perf_counter(); noop(embedding_band_rows(batch)); t1=time.perf_counter()
    noop(QUERIES["ingest_embedding_near_dup"](spark, sf_dir)); t2=time.perf_counter()
    print(f"batch band rows: {t1-t0:.3f}s   full query: {t2-t1:.3f}s", flush=True)
