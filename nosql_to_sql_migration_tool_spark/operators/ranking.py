"""Distributed exact global ranking — the scalable replacement for
``row_number()/ntile()`` over an UNPARTITIONED window.

An unpartitioned window moves every row to one partition (Spark even
warns ``No Partition Defined for Window operation``) — the canonical
single-node bottleneck at 100 TB. But an exact global rank doesn't need
a global window: split the sort key's domain into buckets with a
MONOTONIC bucket function (bucket id non-decreasing in sort order),
rank within each bucket in parallel, then add per-bucket offsets
(cumulative counts of the lower buckets). The offsets are
metadata-sized — n_buckets rows collected to the driver, never data.

    global_rank(row) = offset(bucket(row)) + local_rank(row)

holds exactly whenever the bucket function is monotonic and rows of
equal bucket value sort entirely inside one bucket — both guaranteed
by construction here. Results are bit-identical to the single-window
form, so DuckDB oracles keep using plain ``row_number() OVER (ORDER BY
...)``.

Two bucket derivations cover the practical cases:
- ``bucketed_rank(df, bucket, order)`` — caller supplies the monotonic
  bucket column (e.g. the first hex byte of an md5 sort key: 256
  uniform buckets for free);
- ``range_bucket_expr(df, col, n)`` — derives value-range boundaries
  from ``approx_percentile`` and folds them into a ``width``-free
  monotone CASE ladder. Boundary skew only affects bucket SIZES, never
  rank values, so approximate quantiles are safe.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window, functions as F

_BKT = "__rank_bkt"
_LOCAL = "__rank_local"


def _raise_null_bucket():
    raise ValueError(
        "bucket expression produced NULL for some rows — the monotone-"
        "bucket contract requires a total, non-null bucket function "
        "(map NULL sort keys to a sentinel bucket explicitly)"
    )


def bucketed_rank(
    df: DataFrame,
    bucket: Column,
    order_cols: list[Column | str],
    out_col: str = "position",
) -> DataFrame:
    """Exact global ``row_number`` ordered by ``order_cols`` without a
    single-partition window. ``bucket`` must be monotonic w.r.t. the
    ordering (equal-order prefixes share a bucket). ``order_cols`` must
    be a total order (include a unique tiebreak) for a deterministic
    result — same contract as any deterministic ranking."""
    with_bkt = df.withColumn(_BKT, bucket)
    w = Window.partitionBy(_BKT).orderBy(*order_cols)
    local = with_bkt.withColumn(_LOCAL, F.row_number().over(w))
    counts = sorted(
        (r[0], r[1])
        for r in with_bkt.groupBy(_BKT).count().collect()
        if r[0] is not None or _raise_null_bucket()
    )
    offsets, acc = [], 0
    for b, c in counts:
        offsets.append((b, acc))
        acc += c
    if not offsets:  # empty input: nothing to rank
        return df.withColumn(out_col, F.lit(None).cast("long"))
    spark = df.sparkSession
    off_df = F.broadcast(
        spark.createDataFrame(offsets, [_BKT, "__rank_off"])
    )
    return (
        local.join(off_df, _BKT)
        .withColumn(out_col, (F.col("__rank_off") + F.col(_LOCAL)))
        .drop(_BKT, _LOCAL, "__rank_off")
    )


def range_bucket_expr(
    df: DataFrame, value_col: str, n_buckets: int = 32
) -> Column:
    """A monotone bucket expression for ``value_col`` from
    ``approx_percentile`` boundaries (one distributed sketch pass,
    n_buckets-1 scalar literals to the driver). Equal values always
    land in the same bucket (strict ``<=`` ladder), so ranking within
    buckets stays exact even with duplicate values."""
    qs = [i / n_buckets for i in range(1, n_buckets)]
    row = df.select(
        F.expr(
            f"approx_percentile({value_col}, array({','.join(map(str, qs))}))"
        ).alias("b")
    ).collect()[0]["b"]
    bounds = sorted(set(row or []))
    expr = F.lit(len(bounds))
    for i in reversed(range(len(bounds))):
        expr = F.when(F.col(value_col) <= F.lit(bounds[i]), F.lit(i)).otherwise(
            expr
        )
    return expr


def ntile_from_rank(rank: Column, total: Column, n: int) -> Column:
    """SQL ``NTILE(n)`` from an exact global rank and total row count.
    NTILE semantics: with ``q = total div n`` and ``r = total mod n``,
    the FIRST r tiles hold q+1 rows and the remaining tiles hold q.
    Closed form (pure integer arithmetic, bit-identical to the window
    form on any engine):

        cut = r * (q + 1)
        tile = ceil(rank / (q+1))            if rank <= cut
             = r + ceil((rank - cut) / q)    otherwise

    The q == 0 case (fewer rows than tiles) always takes the first
    branch, so the ``/ q`` never divides by zero on a taken row."""
    q = F.floor(total / F.lit(n))
    r = total % F.lit(n)
    qp1 = q + F.lit(1)
    cut = r * qp1
    first = F.ceil(rank / qp1)
    rest = r + F.ceil((rank - cut) / q)
    return (
        F.when(rank <= cut, first).otherwise(rest)
    ).cast("int")


def bucketed_cumsum(
    df: DataFrame,
    bucket: Column,
    order_cols: list[Column | str],
    value_col: str,
    out_col: str = "cum",
    materialize_input: bool = False,
) -> DataFrame:
    """Exact inclusive running ``sum(value_col)`` in global
    ``order_cols`` order — ``sum() OVER (ORDER BY ... ROWS UNBOUNDED
    PRECEDING)`` without the single-partition window, by the same
    monotonic-bucket decomposition as ``bucketed_rank``:

        global_cum(row) = bucket_offset(bucket) + local_cum(row)

    where bucket_offset is the total of all strictly-lower buckets
    (n_buckets rows to the driver — metadata, never data). Exactness
    contract: ``value_col`` must sum associatively (integers or
    DECIMAL; raw doubles would make the result accumulation-order-
    dependent in ANY formulation, windowed or bucketed).

    ``materialize_input`` (r15 optimization, guide §2.4): the bucketed
    frame feeds TWO actions with different shapes — the bucket-totals
    collect and the per-bucket window — so the caller's input subtree
    executes twice (no ReusedExchange: one side is a driver collect).
    When the input is a derived narrow frame (bin counts, per-doc
    scored rows) whose recompute costs more than storing it, pass True
    to eagerly ``localCheckpoint`` it once. Leave False for inputs that
    are cheap to re-derive or too wide to stage (guide §5: size
    decides). Bit-identical either way."""
    with_bkt = df.withColumn(_BKT, bucket)
    if materialize_input:
        with_bkt = with_bkt.localCheckpoint(eager=True)
    w = (
        Window.partitionBy(_BKT)
        .orderBy(*order_cols)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    local = with_bkt.withColumn(_LOCAL, F.sum(value_col).over(w))
    totals = sorted(
        (r[0], r[1] if r[1] is not None else 0)
        for r in with_bkt.groupBy(_BKT)
        .agg(F.sum(value_col).alias("__t"))
        .collect()
        if r[0] is not None or _raise_null_bucket()
    )
    offsets, acc = [], 0
    for b, t in totals:
        offsets.append((b, acc))
        acc += t
    if not offsets:
        return df.withColumn(out_col, F.lit(None).cast("long"))
    spark = df.sparkSession
    off_df = F.broadcast(
        spark.createDataFrame(offsets, [_BKT, "__cum_off"])
    )
    return (
        local.join(off_df, _BKT)
        .withColumn(out_col, F.col("__cum_off") + F.col(_LOCAL))
        .drop(_BKT, _LOCAL, "__cum_off")
    )
