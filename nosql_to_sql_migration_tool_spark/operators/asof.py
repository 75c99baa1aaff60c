"""As-of join — the canonical operator vanilla Spark lacks (brief:
"e.g., as-of join, range join"), implemented as a MERGE, not a join.

Naive as-of (equi-join on key + ``r.ts <= l.ts`` + argmax) explodes each
left row into every earlier right row before reducing — quadratic per
key. This implementation is the linear sort-merge form: union both
sides tagged, one shuffle+sort per key on (ts, side), carry the most
recent right payload forward with a running ``last(ignorenulls)`` window,
keep left rows. Cost: ONE shuffle of left+right, in-partition sort —
the same shape at any scale, no row explosion.

Tie rule: a right row at exactly ``l.ts`` matches (right sorts before
left at equal ts), matching DuckDB's inclusive ``ASOF JOIN`` — which is
the oracle for the declared query.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str,
    right_ts: str,
    right_cols: list[str],
    prefix: str = "asof_",
    tolerance_s: float | None = None,
) -> DataFrame:
    """Left as-of join: every left row gains the most recent right-side
    payload with ``right.ts <= left.ts`` for the same key (NULLs when no
    earlier right row exists).

    ``tolerance_s`` bounds staleness: a carried payload older than the
    left timestamp by more than this many seconds is nulled out (the
    max-staleness contract of market-data-style as-of joins). Timestamps
    compare through a double cast (epoch seconds), so numeric ts columns
    work too.

    Determinism: when several right rows share one (key, ts) the carried
    payload is the struct-max of their ``right_cols`` (the window sorts
    on the payload struct as the final tie-break), so output does not
    depend on partitioning or input order."""
    if tolerance_s is not None and right_ts not in right_cols:
        raise ValueError(
            f"tolerance_s requires the right timestamp {right_ts!r} in "
            f"right_cols (the staleness check reads it from the carried "
            f"payload)"
        )
    reserved = {"__ts", "__side", "__rv", "__carried"}
    clash = reserved & set(left.columns) | reserved & set(right.columns)
    if clash:
        raise ValueError(
            f"asof_join reserves temp column names {sorted(reserved)}; "
            f"rename input columns {sorted(clash)}"
        )
    l_tagged = left.select(
        "*",
        F.col(left_ts).alias("__ts"),
        F.lit(1).alias("__side"),
        F.lit(None)
        .cast(
            right.select(F.struct(*right_cols).alias("s")).schema["s"].dataType
        )
        .alias("__rv"),
    )
    r_tagged = right.select(
        F.col(key),
        F.col(right_ts).alias("__ts"),
        F.lit(0).alias("__side"),
        F.struct(*right_cols).alias("__rv"),
    )
    unioned = l_tagged.unionByName(r_tagged, allowMissingColumns=True)
    # __rv last in the sort: among equal-(ts, side) right rows the max
    # payload struct wins — a deterministic tie-break (left rows all
    # carry NULL __rv, so their relative order cannot matter: they only
    # read the running last(), never write it).
    w = (
        Window.partitionBy(key)
        .orderBy("__ts", "__side", "__rv")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = F.last("__rv", ignorenulls=True).over(w)
    with_carried = unioned.withColumn("__carried", carried).filter(
        F.col("__side") == 1
    )
    if tolerance_s is not None:
        fresh = (
            F.col("__ts").cast("double")
            - F.col(f"__carried.{right_ts}").cast("double")
        ) <= F.lit(float(tolerance_s))
        with_carried = with_carried.withColumn(
            "__carried", F.when(fresh, F.col("__carried"))
        )
    return with_carried.select(
        *left.columns,
        *[
            F.col(f"__carried.{c}").alias(f"{prefix}{c}")
            for c in right_cols
        ],
    )
