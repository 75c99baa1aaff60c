"""Range/interval join — the sibling of the as-of join (operators/asof.py)
that vanilla Spark also lacks as a first-class operator: join points to
intervals on ``start <= ts <= end`` WITHOUT a cartesian explosion.

Naive formulation (equi-join on key only, or no key, + range predicate)
makes Catalyst fall back to BroadcastNestedLoopJoin / cartesian — every
point against every interval, quadratic. This implementation bucketizes
time: each interval explodes to the buckets it covers, each point maps
to its single bucket, and the join becomes a plain equi-join on
(bucket [+ keys]) followed by the exact range filter. Each matched
(point, interval) pair materializes exactly once — the point lives in
one bucket — so no post-join dedup is needed.

Scale contract: work is linear in points + sum(interval_length /
bucket_width) over intervals. Pick ``bucket_width_s`` near the typical
interval length so intervals explode to O(1) buckets; the shuffle keys
on (bucket, keys), which inherits time-locality and spreads hot keys
across buckets. AQE handles residual bucket skew. Reference analogue:
the validation sample join generalized to a temporal predicate
(Migration_Validation.ps1:266-324 joins on key equality only).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, functions as F


def interval_join(
    points: DataFrame,
    intervals: DataFrame,
    point_ts: str,
    start_col: str,
    end_col: str,
    keys: Sequence[str] = (),
    bucket_width_s: int = 3600,
) -> DataFrame:
    """Inner-join every point row to every interval row with
    ``start_col <= point_ts <= end_col`` (inclusive both ends — SQL
    BETWEEN semantics) and equal ``keys``. Returns all columns of both
    sides (shared ``keys`` once); other column names must not collide.

    Only the inner form is offered: an outer variant through the bucket
    explode would need unmatched-side recovery that belongs in a
    separate anti-join, not hidden in this operator.
    """
    reserved = "__bkt"
    if reserved in points.columns or reserved in intervals.columns:
        raise ValueError(f"interval_join reserves column name {reserved!r}")
    p = points.withColumn(
        reserved,
        F.floor(F.unix_timestamp(F.col(point_ts)) / F.lit(bucket_width_s)),
    )
    i = intervals.withColumn(
        reserved,
        F.explode(
            F.sequence(
                F.floor(
                    F.unix_timestamp(F.col(start_col)) / F.lit(bucket_width_s)
                ),
                F.floor(
                    F.unix_timestamp(F.col(end_col)) / F.lit(bucket_width_s)
                ),
            )
        ),
    )
    joined = p.join(i, on=[reserved, *keys], how="inner").filter(
        (F.col(point_ts) >= F.col(start_col))
        & (F.col(point_ts) <= F.col(end_col))
    )
    return joined.drop(reserved)
