"""Training-data preparation operators: deterministic train/val/test
splits, global corpus shuffling, vocabulary coverage, and length-bucketed
batch assembly — the steps between a cleaned corpus and a training run.

Scale contract: every split/shuffle decision is a pure function of the
row's own key (md5), so assignment is one embarrassingly-parallel
projection — no global sort, no driver-side state, reproducible across
clusters and engines. The only shuffles here are the explicitly chosen
ones: vocabulary aggregation (combinable) and the batch-numbering
window (partitioned by length bucket, never a single global partition).

Reference analogue: the migration tool's deterministic validation
sampling (`private/Validation.ps1` sample selection); these generalize
that idea to the split/shuffle/batch surface an LLM data pipeline needs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

from nosql_to_sql_migration_tool_spark.operators.text import tokens

SPLIT_BUCKETS = 100


def split_bucket(key_col: str) -> F.Column:
    """Deterministic 0..99 bucket from the md5 of the row key: the first
    8 hex digits parsed as an integer, mod 100. Pure projection, stable
    across engines (both parse hex with ``conv``-equivalents) and across
    any partitioning of the data."""
    return (
        F.conv(F.substring(F.md5(F.col(key_col).cast("string")), 1, 8), 16, 10)
        .cast("long")
        % SPLIT_BUCKETS
    )


def split_bucket_sql(key_expr: str) -> str:
    """DuckDB mirror of ``split_bucket`` (from_hex has no 32-bit parse;
    a 8-hex-digit literal fits in BIGINT via hex cast)."""
    return (
        f"CAST(('0x' || substring(md5(CAST({key_expr} AS VARCHAR)), 1, 8)) "
        f"AS BIGINT) % {SPLIT_BUCKETS}"
    )


def with_split(
    df: DataFrame,
    key_col: str,
    train_pct: int = 90,
    val_pct: int = 5,
) -> DataFrame:
    """Assign every row to train/val/test by its hash bucket:
    ``[0, train_pct)`` -> train, ``[train_pct, train_pct+val_pct)`` ->
    val, rest -> test. Adding data never moves an existing row between
    splits (assignment depends only on the key), which is the property
    that keeps eval sets stable as a 100 TB corpus grows."""
    b = split_bucket(key_col)
    return df.withColumn(
        "split",
        F.when(b < train_pct, F.lit("train"))
        .when(b < train_pct + val_pct, F.lit("val"))
        .otherwise(F.lit("test")),
    )


def shuffle_positions(
    df: DataFrame, key_col: str, salt: str = "epoch0"
) -> DataFrame:
    """Deterministic global shuffle order: position = rank of
    ``md5(salt|key)``. A different ``salt`` gives an independent
    permutation per epoch without touching the data.

    The rank is computed DISTRIBUTED (operators/ranking.py): the first
    two hex chars of the md5 are a free uniform 256-way monotonic
    bucketing, each bucket ranks in parallel, bucket offsets are the
    only driver traffic — no single-partition global window anywhere,
    so the permutation materializes at any corpus size. Output is
    bit-identical to ``row_number() OVER (ORDER BY md5, key)``."""
    from nosql_to_sql_migration_tool_spark.operators.ranking import (
        bucketed_rank,
    )

    m = F.md5(F.concat(F.lit(salt + "|"), F.col(key_col).cast("string")))
    with_m = df.select(F.col(key_col), m.alias("__m"))
    ranked = bucketed_rank(
        with_m,
        F.substring(F.col("__m"), 1, 2),
        [F.col("__m"), F.col(key_col)],
        out_col="position",
    )
    return ranked.select("position", F.col(key_col))


def vocab_coverage(
    docs: DataFrame,
    vocab_size: int = 1000,
    text_col: str = "text",
) -> DataFrame:
    """One-row coverage report for a top-N frequency vocabulary:
    total token occurrences, occurrences covered by the vocabulary, and
    the OOV rate (exact integer counts; the rate is one deterministic
    division rounded to 6 dp).

    Plan: one combinable token histogram, a top-N (count desc, token)
    TakeOrdered for the vocabulary, then a broadcast semi-join marks
    covered occurrences inside the SAME aggregation pass over the
    histogram — the corpus is scanned once."""
    tok = docs.select(F.explode(tokens(F.col(text_col))).alias("__tok"))
    hist = tok.groupBy("__tok").agg(F.count(F.lit(1)).alias("__cnt"))
    vocab = (
        hist.orderBy(F.col("__cnt").desc(), "__tok")
        .limit(vocab_size)
        .select(F.col("__tok").alias("__v"))
        .withColumn("__in", F.lit(1))
    )
    return (
        hist.join(F.broadcast(vocab), hist.__tok == vocab.__v, "left")
        .agg(
            F.sum("__cnt").alias("total_tokens"),
            F.sum(F.when(F.col("__in") == 1, F.col("__cnt")).otherwise(0)).alias(
                "covered_tokens"
            ),
        )
        .select(
            "total_tokens",
            "covered_tokens",
            F.round(
                (F.col("total_tokens") - F.col("covered_tokens"))
                * F.lit(1.0)
                / F.col("total_tokens"),
                6,
            ).alias("oov_rate"),
        )
    )


def length_bucketed_batches(
    docs: DataFrame,
    batch_size: int = 8,
    bucket_tokens: int = 64,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Group documents of similar token length into fixed-size batches
    (the padding-minimizing batching trick): bucket = token count /
    ``bucket_tokens``, batch = consecutive ``batch_size`` docs within
    the bucket in deterministic (n_tokens, id) order. Output
    ``(doc_id, n_tokens, len_bucket, batch_id)``.

    The numbering window partitions by bucket — dozens of buckets, each
    a fraction of the corpus — never one global partition; at extreme
    scale the same assignment runs per-shard with a shard offset."""
    sized = docs.select(
        F.col(id_col),
        F.size(tokens(F.col(text_col))).alias("n_tokens"),
    ).withColumn(
        "len_bucket",
        F.floor(F.col("n_tokens") / bucket_tokens).cast("int"),
    )
    w = Window.partitionBy("len_bucket").orderBy("n_tokens", id_col)
    return sized.withColumn(
        "batch_id",
        F.floor((F.row_number().over(w) - 1) / batch_size).cast("int"),
    )
