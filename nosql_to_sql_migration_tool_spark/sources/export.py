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
  fingerprints — summing hashes overflows under ANSI; xor is the
  environment-pinned order-free fold). The STORED manifest is computed
  from a read-back of the written files — the exact frames
  ``verify_shards`` will later rescan — never from the input frame
  (ADVICE r9: a nondeterministic input, e.g. an unseeded sample
  upstream, would otherwise store a manifest that disagrees with the
  data on disk and flag phantom tampering). This also makes the
  checksum format-proof: stored and recomputed fingerprints always see
  the same post-round-trip column types, so a json export (which
  widens/retypes columns) verifies exactly like parquet.

Two fingerprint modes, recorded in the manifest itself:

* ``xxhash64`` (default) — cheapest, pure JVM codegen, any column type
  including arrays; engine-internal (not replayable outside Spark);
* ``md5canon`` — the repo's canonical cross-engine row hash
  (``functions/hashing.row_hash``: key-sorted scalar columns, per-type
  canonical stringification, md5) folded to a 60-bit integer. Scalar
  columns only, but bit-replayable in DuckDB (``manifest_sql``), so an
  external auditor can recompute the manifest without Spark — the mode
  the driver-verified round-trip query uses.

``verify_shards`` recomputes the manifest from the written files and
diffs — tamper/loss detection at shard granularity without any global
sort or single-reader pass.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from nosql_to_sql_migration_tool_spark.functions.hashing import (
    row_hash,
    row_hash_sql,
    scalar_columns,
)

MANIFEST_DIR = ".__manifest"

HASH_MODES = ("xxhash64", "md5canon")


def _with_shard(df: DataFrame, id_col: str, n_shards: int) -> DataFrame:
    shard = (
        F.conv(F.substring(F.md5(F.col(id_col).cast("string")), 1, 8), 16, 10)
        .cast("long")
        % n_shards
    )
    return df.withColumn("shard", shard)


def shard_of_sql(id_expr: str, n_shards: int) -> str:
    """DuckDB twin of the shard assignment (md5-hex convention)."""
    return (
        f"CAST(concat('0x', substr(md5(CAST({id_expr} AS VARCHAR)), 1, 8)) "
        f"AS BIGINT) % {n_shards}"
    )


def _row_fingerprint(df: DataFrame, hash_mode: str) -> F.Column:
    """Per-row 64-bit fingerprint over every non-shard column.

    Sorted column order: a partitioned read-back returns columns in a
    different order than the export-time frame (partition col last, json
    alphabetical), and both hashes are input-order-sensitive."""
    names = sorted(c for c in df.columns if c != "shard")
    if hash_mode == "xxhash64":
        return F.xxhash64(*[F.col(c) for c in names])
    if hash_mode == "md5canon":
        scalars = set(scalar_columns(df))
        non_scalar = [c for c in names if c not in scalars]
        if non_scalar:
            raise ValueError(
                f"hash_mode='md5canon' supports scalar columns only; "
                f"non-scalar: {non_scalar} (use xxhash64)"
            )
        # 15 hex chars = 60 bits — fits BIGINT positive on both engines
        return F.conv(
            F.substring(row_hash(df, names), 1, 15), 16, 10
        ).cast("long")
    raise ValueError(f"unknown hash_mode {hash_mode!r} (one of {HASH_MODES})")


def _manifest_of(
    sharded: DataFrame,
    id_col: str,
    text_col: str | None,
    hash_mode: str,
) -> DataFrame:
    aggs = [
        F.count(F.lit(1)).cast("long").alias("n_rows"),
        F.bit_xor(_row_fingerprint(sharded, hash_mode)).alias("content_xor"),
    ]
    if text_col is not None:
        aggs.append(
            F.sum(F.size(F.split(F.trim(text_col), r"\s+")))
            .cast("long")
            .alias("n_tokens")
        )
    return sharded.groupBy("shard").agg(*aggs)


def _read_shards(spark: SparkSession, out_path: str, fmt: str) -> DataFrame:
    reader = spark.read
    return (
        reader.parquet(out_path) if fmt == "parquet" else reader.json(out_path)
    )


def export_training_shards(
    df: DataFrame,
    out_path: str,
    n_shards: int,
    id_col: str = "doc_id",
    text_col: str | None = "text",
    fmt: str = "parquet",
    hash_mode: str = "xxhash64",
) -> DataFrame:
    """Write ``df`` as ``n_shards`` deterministic shards under
    ``out_path`` (``shard=K/`` dirs, parquet or json-lines) and persist
    + return the per-shard manifest ``(shard, n_rows, content_xor[,
    n_tokens])``. The manifest is computed from a READ-BACK of the
    written files (one extra parallel scan — the price of a manifest
    that describes the bytes on disk, not the plan that produced them).
    Overwrites a prior export at the same path."""
    if fmt not in ("parquet", "json"):
        raise ValueError(f"unsupported shard format {fmt!r}")
    if hash_mode not in HASH_MODES:
        raise ValueError(
            f"unknown hash_mode {hash_mode!r} (one of {HASH_MODES})"
        )
    sharded = _with_shard(df, id_col, n_shards)
    # repartition ON the shard key: each output dir is produced by its
    # own writer set, no shard straddles a task boundary pathologically
    writer = (
        sharded.repartition(n_shards, "shard")
        .write.mode("overwrite")
        .partitionBy("shard")
    )
    (writer.parquet(out_path) if fmt == "parquet" else writer.json(out_path))
    written = _read_shards(df.sparkSession, out_path, fmt)
    manifest = _manifest_of(written, id_col, text_col, hash_mode)
    (
        manifest.withColumn("hash_mode", F.lit(hash_mode))
        .coalesce(1)
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
    shards (present but unmanifested) both surface; a one-sided row
    fails both matches (null-safe equality — ADVICE r9: the previous
    coalesce sentinels could collide with a legitimate fingerprint).
    The fingerprint mode is read from the manifest itself, so verify
    needs no out-of-band knowledge of how the export was hashed.
    Cost: one parallel scan of the shard files + a shard-count join."""
    stored_raw = read_manifest(spark, out_path)
    hash_mode = "xxhash64"
    if "hash_mode" in stored_raw.columns:
        modes = [r[0] for r in stored_raw.select("hash_mode").limit(1).collect()]
        if modes:
            hash_mode = modes[0]
    data = _read_shards(spark, out_path, fmt)
    actual = _manifest_of(data, id_col, text_col, hash_mode).select(
        "shard",
        F.col("n_rows").alias("actual_rows"),
        F.col("content_xor").alias("actual_xor"),
    )
    stored = stored_raw.select(
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
            F.col("stored_rows").eqNullSafe(F.col("actual_rows")).alias(
                "rows_match"
            ),
            F.col("stored_xor").eqNullSafe(F.col("actual_xor")).alias(
                "content_match"
            ),
        )
    )


def manifest_sql(
    docs_sql: str,
    n_shards: int,
    schema,
    id_col: str = "doc_id",
    text_col: str | None = "text",
) -> str:
    """DuckDB replay of an ``md5canon`` manifest computed over the SAME
    source rows: per shard, ``(shard, n_rows, content_xor[, n_tokens])``
    bit-identical to the Spark export's stored manifest — the external
    auditor's recomputation path. ``schema`` is the exported frame's
    Spark schema (drives the per-type hash canon)."""
    cols = sorted(f.name for f in schema.fields)
    fp = (
        f"CAST(concat('0x', substr({row_hash_sql(schema, cols)}, 1, 15)) "
        f"AS BIGINT)"
    )
    tok = (
        f",\n       CAST(sum(len(string_split_regex(trim({text_col}), "
        f"'\\s+'))) AS BIGINT) AS n_tokens"
        if text_col is not None
        else ""
    )
    return f"""
WITH docs AS ({docs_sql})
SELECT {shard_of_sql(id_col, n_shards)} AS shard,
       CAST(count(*) AS BIGINT) AS n_rows,
       bit_xor({fp}) AS content_xor{tok}
FROM docs
GROUP BY 1
"""
