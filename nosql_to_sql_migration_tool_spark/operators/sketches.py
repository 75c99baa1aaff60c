"""Sketch aggregates — the mergeable approximate structures a 100 TB
aggregation layer runs on when exact sorts/distincts stop being viable.

All built-in (HyperLogLog++ for distinct counts, Apache DataSketches HLL
for mergeable sketch columns, t-digest-style approx percentiles) —
deterministic for a given dataset, but NOT reproducible in DuckDB (each
engine's sketch implementation differs), so the declared query is a
rows-only check and the accuracy/merge contracts are pinned by pytest
instead: estimates within rsd of exact, and partition-wise sketch
union == whole-dataset sketch (the property that makes them scale).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def approx_distinct(df: DataFrame, col: str, rsd: float = 0.05) -> DataFrame:
    """HyperLogLog++ distinct count (one combinable aggregate; exact
    countDistinct needs a full shuffle of the distinct values)."""
    return df.agg(
        F.approx_count_distinct(col, rsd=rsd).alias("approx_distinct")
    )


def hll_sketch(df: DataFrame, col: str, group_col: str) -> DataFrame:
    """Per-group mergeable HLL sketch columns (DataSketches): the
    pre-aggregation shape — store sketches per partition/day, union them
    at query time instead of rescanning raw data."""
    return df.groupBy(group_col).agg(
        F.hll_sketch_agg(col).alias("sketch"),
        F.count(F.lit(1)).alias("n_rows"),
    )


def hll_merge_estimate(sketches: DataFrame) -> DataFrame:
    """Union pre-computed sketches to one global distinct estimate."""
    return sketches.agg(
        F.hll_sketch_estimate(F.hll_union_agg("sketch")).alias(
            "approx_distinct"
        )
    )


def approx_quantiles(
    df: DataFrame, col: str, group_col: str, quantiles: list[float]
) -> DataFrame:
    """Grouped approximate percentiles (mergeable digest) — the scale
    substitute for the exact sort-based ``percentile``."""
    return df.groupBy(group_col).agg(
        *[
            F.approx_percentile(col, q).alias(f"p{int(q * 100)}")
            for q in quantiles
        ]
    )
