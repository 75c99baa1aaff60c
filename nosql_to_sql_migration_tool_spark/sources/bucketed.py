"""Bucketed tables — shuffle-free co-located joins (SURVEY §2C scale
surface; brief: "repartition/bucketing for co-located joins").

Writing both sides of a recurring join bucketed by the join key lets
every later join run with ZERO exchanges: each task reads matching
bucket files from both tables. On a 100 TB star schema this is the
difference between re-shuffling the fact table per query and never
shuffling it at all. ``test_bucketed.py`` pins the no-Exchange plan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table_name: str,
    bucket_key: str,
    n_buckets: int = 8,
    sort: bool = True,
) -> None:
    """Persist as a bucketed (and bucket-sorted) managed table. Sorting
    within buckets additionally enables shuffle-AND-sort-free
    sort-merge joins."""
    writer = df.write.mode("overwrite").bucketBy(n_buckets, bucket_key)
    if sort:
        writer = writer.sortBy(bucket_key)
    writer.saveAsTable(table_name)


def colocated_join(
    spark: SparkSession,
    left_table: str,
    right_table: str,
    left_key: str,
    right_key: str,
) -> DataFrame:
    """Join two same-bucket-count tables on their bucket keys — planned
    without any Exchange when bucketing matches."""
    left = spark.table(left_table)
    right = spark.table(right_table)
    return left.join(right, left[left_key] == right[right_key])
