"""Training-shard export — the sink end of the training-data pipeline:
write a corpus as N deterministic shards plus a verifiable manifest,
the layout a training loader consumes (fixed shard count for the data-
parallel world size, stable doc→shard assignment across re-exports,
integrity checking without re-reading the corpus into one place).

Reference analogue: generalizes the reference's per-table migration
write (private/Data_Migration.ps1 bulk loop) into the sharded, manifest-
verified corpus sink a 100 TB pipeline needs.

Design:

* shard = md5(id) mod n_shards — content-independent, reshuffle-stable,
  and identical across engines (the repo's split_bucket discipline), so
  a re-export of the same corpus lands every doc in the same shard;
* one hash repartition on the shard key, then a partitioned parquet/json
  write — each shard is written in parallel and read back by loaders as
  an independent unit (`shard=K/` directories);
* the manifest is one combinable aggregate per shard: row count, token
  count, and an ORDER-INSENSITIVE content checksum (bit_xor of per-row
  xxhash64 — summing hashes overflows under ANSI; xor is the
  environment-pinned order-free fold). `verify_shards` recomputes the
  manifest from the written files and diffs — tamper/loss detection at
  shard granularity without any global sort or single-reader pass.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

MANIFEST_DIR = ".__manifest"


def _with_shard(df: DataFrame, id_col: str, n_shards: int) -> DataFrame:
    shard = (
        F.conv(F.substring(F.md5(F.col(id_col).cast("string")), 1, 8), 16, 10)
        .cast("long")
        % n_shards
    )
    return df.withColumn("shard", shard)


def _manifest_of(
    sharded: DataFrame, id_col: str, text_col: str | None
) -> DataFrame:
    # sorted column order: a partitioned read-back returns columns in a
    # different order than the export-time frame (partition col last,
    # json alphabetical), and xxhash64 is order-sensitive
    row_fp = F.xxhash64(
        *[F.col(c) for c in sorted(sharded.columns) if c != "shard"]
    )
    aggs = [
        F.count(F.lit(1)).cast("long").alias("n_rows"),
        F.bit_xor(row_fp).alias("content_xor"),
    ]
    if text_col is not None:
        aggs.append(
            F.sum(F.size(F.split(F.trim(text_col), r"\s+")))
            .cast("long")
            .alias("n_tokens")
        )
    return sharded.groupBy("shard").agg(*aggs)


def export_training_shards(
    df: DataFrame,
    out_path: str,
    n_shards: int,
    id_col: str = "doc_id",
    text_col: str | None = "text",
    fmt: str = "parquet",
) -> DataFrame:
    """Write ``df`` as ``n_shards`` deterministic shards under
    ``out_path`` (``shard=K/`` dirs, parquet or json-lines) and persist
    + return the per-shard manifest ``(shard, n_rows, content_xor[,
    n_tokens])``. Overwrites a prior export at the same path."""
    if fmt not in ("parquet", "json"):
        raise ValueError(f"unsupported shard format {fmt!r}")
    sharded = _with_shard(df, id_col, n_shards)
    # repartition ON the shard key: each output dir is produced by its
    # own writer set, no shard straddles a task boundary pathologically
    writer = (
        sharded.repartition(n_shards, "shard")
        .write.mode("overwrite")
        .partitionBy("shard")
    )
    (writer.parquet(out_path) if fmt == "parquet" else writer.json(out_path))
    manifest = _manifest_of(sharded, id_col, text_col)
    (
        manifest.coalesce(1)
        .write.mode("overwrite")
        .parquet(out_path.rstrip("/") + "/" + MANIFEST_DIR)
    )
    return manifest


def read_manifest(spark: SparkSession, out_path: str) -> DataFrame:
    return spark.read.parquet(out_path.rstrip("/") + "/" + MANIFEST_DIR)


def verify_shards(
    spark: SparkSession,
    out_path: str,
    id_col: str = "doc_id",
    text_col: str | None = "text",
    fmt: str = "parquet",
) -> DataFrame:
    """Recompute the manifest from the written shard files and diff it
    against the stored one: ``(shard, stored_rows, actual_rows,
    rows_match, content_match)`` — one row per shard present on EITHER
    side, so lost shards (stored but unreadable/absent) and stray
    shards (present but unmanifested) both surface. Cost: one parallel
    scan of the shard files + a shard-count-sized join."""
    reader = spark.read
    data = (
        reader.parquet(out_path) if fmt == "parquet"
        else reader.json(out_path)
    )
    actual = _manifest_of(data, id_col, text_col).select(
        "shard",
        F.col("n_rows").alias("actual_rows"),
        F.col("content_xor").alias("actual_xor"),
    )
    stored = read_manifest(spark, out_path).select(
        "shard",
        F.col("n_rows").alias("stored_rows"),
        F.col("content_xor").alias("stored_xor"),
    )
    return (
        stored.join(actual, "shard", "full_outer")
        .select(
            "shard",
            "stored_rows",
            "actual_rows",
            (
                F.coalesce("stored_rows", F.lit(-1))
                == F.coalesce("actual_rows", F.lit(-2))
            ).alias("rows_match"),
            (
                F.coalesce("stored_xor", F.lit(0))
                == F.coalesce("actual_xor", F.lit(1))
            ).alias("content_match"),
        )
    )
