"""Skew-mitigated joins — explicit key salting (brief: "salting for
skew"), complementing the AQE skew-join handling that session.py enables.

AQE splits oversized *sort-merge* partitions at runtime; explicit
salting is the static alternative when the hot keys are known or AQE is
unavailable (e.g. broadcast-ineligible dimension under a hot fact key):
the fact side spreads each key over ``n_salts`` sub-keys with a
deterministic salt, the dimension side replicates each row once per
salt, and the join runs on (key, salt) — hot keys now occupy n_salts
tasks instead of one straggler.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


_SALTABLE_JOINS = {"inner", "left", "left_outer", "leftouter", "left_semi",
                   "leftsemi", "left_anti", "leftanti"}


def salted_join(
    fact: DataFrame,
    dim: DataFrame,
    key: str,
    n_salts: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Equi-join with the fact side salted and the dimension side
    replicated ``n_salts`` times. Result is row-identical to the plain
    join; the salt is a deterministic spread (crc32 of the full fact
    row's key + a per-row component would break join semantics, so the
    spread uses ``monotonically_increasing_id`` — distribution-only,
    never part of the result).

    Only fact-preserving join types are allowed: with a right/full outer
    join each dim row unmatched under one salt would surface as up to
    ``n_salts`` spurious null-extended copies (the dim side is
    replicated), so those types raise instead of silently corrupting."""
    if how.lower().replace("_", "") not in {
        h.replace("_", "") for h in _SALTABLE_JOINS
    }:
        raise ValueError(
            f"salted_join supports fact-preserving joins only "
            f"({sorted(_SALTABLE_JOINS)}); got how={how!r} — the replicated "
            f"dim side makes right/full outer results wrong"
        )
    salted_fact = fact.withColumn(
        "__salt", F.pmod(F.monotonically_increasing_id(), F.lit(n_salts))
    )
    salts = F.explode(
        F.sequence(F.lit(0), F.lit(n_salts - 1)).cast("array<long>")
    )
    salted_dim = dim.withColumn("__salt", salts)
    return (
        salted_fact.join(salted_dim, [key, "__salt"], how)
        .drop("__salt")
    )


def key_skew_profile(df: DataFrame, key_col: str) -> DataFrame:
    """Join-key skew diagnostic — the histogram you read BEFORE picking
    a strategy (plain shuffle / AQE skew split / ``salted_join`` /
    broadcast): bucket every key by floor(log2(rows-per-key)) and
    report, per bucket, how many keys live there and what share of the
    table's rows they carry. A healthy key is a flat low-bucket
    profile; a hot-key table shows a high bucket carrying a large
    ``rows_share`` with ``n_keys`` of 1-2 — those are the keys a
    shuffle partitions onto single straggler tasks.

    Purity contract: the log2 bucket is ``length(bin(n)) - 1`` — bit
    length of the per-key count — pure integer/string work, so the
    bucket boundary can never drift between engines the way a libm
    ``floor(log2())`` could for counts one ulp from a power of two.

    Plan: one combinable per-key count, one bucket groupBy (both
    map-side partial), and a single-row broadcast total for the share —
    linear at 100 TB, output bounded by 64 buckets.
    """
    per_key = (
        df.select(F.col(key_col).alias("__k"))
        .groupBy("__k")
        .agg(F.count(F.lit(1)).alias("__n"))
    )
    bucketed = (
        per_key.withColumn(
            "log2_bucket",
            (F.length(F.bin(F.col("__n"))) - 1).cast("int"),
        )
        .groupBy("log2_bucket")
        .agg(
            F.count(F.lit(1)).alias("n_keys"),
            F.sum("__n").alias("n_rows"),
            F.max("__n").alias("max_rows_per_key"),
        )
    )
    total = df.select(F.count(F.lit(1)).alias("__total"))
    return (
        bucketed.crossJoin(F.broadcast(total))
        .select(
            "log2_bucket",
            "n_keys",
            "n_rows",
            "max_rows_per_key",
            F.round(
                F.col("n_rows").cast("double") / F.col("__total"), 6
            ).alias("rows_share"),
        )
    )


def key_skew_profile_sql(table: str, key_expr: str) -> str:
    """DuckDB twin of ``key_skew_profile`` (same bit-length bucket)."""
    return f"""
WITH __per_key AS (
  SELECT {key_expr} AS k, count(*) AS n FROM {table} GROUP BY {key_expr}
),
__total AS (SELECT count(*) AS total FROM {table})
SELECT CAST(length(bin(n)) - 1 AS INTEGER) AS log2_bucket,
       count(*) AS n_keys,
       CAST(sum(n) AS BIGINT) AS n_rows,
       max(n) AS max_rows_per_key,
       round(CAST(sum(n) AS DOUBLE) / any_value(total), 6) AS rows_share
FROM __per_key CROSS JOIN __total
GROUP BY 1
"""
