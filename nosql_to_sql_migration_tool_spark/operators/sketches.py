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
from pyspark.sql import types as T


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


def binned_quantile_sketch(
    df: DataFrame, col: str, n_bins: int = 128
) -> DataFrame:
    """Equal-width histogram sketch ``(bin, n_rows)`` — the REPRODUCIBLE
    member of the sketch family: unlike HLL/t-digest (engine-specific
    internals, rows-only checkable), its construction is pure arithmetic
    both engines compute bit-identically, so quantile estimates from it
    ARE oracle-checkable.

    Contract (mirrored verbatim by ``binned_quantiles_sql``): values
    cast to double, NULLs excluded; ``bin = 0`` when max == min else
    ``least(floor(((v - mn) / (mx - mn)) * n_bins), n_bins - 1)`` with
    every operand double (IEEE — identical expression text on both
    sides, identical bits out). Mergeable: bin counts are additive, so
    per-partition/per-day sketches union by summing ``n_rows`` per bin
    — the pre-aggregation shape that answers quantile queries at 100 TB
    without re-scanning raw data. One combinable groupBy on <= n_bins
    keys; the min/max pre-pass is a 1-row broadcast."""
    vals = df.select(F.col(col).cast("double").alias("__v")).where(
        F.col("__v").isNotNull()
    )
    mm = vals.agg(F.min("__v").alias("__mn"), F.max("__v").alias("__mx"))
    rel = (F.col("__v") - F.col("__mn")) / (F.col("__mx") - F.col("__mn"))
    bin_ = (
        F.when(F.col("__mx") == F.col("__mn"), F.lit(0))
        .otherwise(
            F.least(
                F.floor(rel * F.lit(float(n_bins))), F.lit(n_bins - 1)
            )
        )
        .cast("long")
    )
    return (
        vals.crossJoin(F.broadcast(mm))
        .select(bin_.alias("bin"))
        .groupBy("bin")
        .agg(F.count(F.lit(1)).alias("n_rows"))
    )


def binned_quantiles(
    df: DataFrame,
    col: str,
    qs: tuple[float, ...] = (0.25, 0.5, 0.75, 0.9, 0.99),
    n_bins: int = 128,
    sketch: DataFrame | None = None,
) -> DataFrame:
    """Quantile estimates from the binned sketch: for each q, the upper
    edge of the first bin whose cumulative count reaches ``q * n`` —
    ``(q, bin, est)``, est rounded 6 dp, error bounded by one bin width.
    Pass a pre-merged ``sketch`` to answer from stored sketches without
    touching raw data. The cumulative count comes from a broadcast
    triangular self-join over the <= n_bins sketch rows (<= n_bins²/2
    joined rows — metadata-sized, never the corpus): the sketch family
    keeps ZERO partition-less windows, so any WindowExec warning in a
    bench log is a real offender (VERDICT r5 #6)."""
    vals = df.select(F.col(col).cast("double").alias("__v")).where(
        F.col("__v").isNotNull()
    )
    # r15 optimization (guide §2.4 remove redundant passes / §5 cut
    # lineage): the plan for this function used to re-derive the 1-row
    # min/max aggregate THREE times (qrows, the sketch's bin edges, the
    # est projection) and the <= n_bins sketch subtree three more times
    # (both sides of the triangular cum join, the total) — 7 full input
    # scans for one estimate, none reused by Catalyst because each
    # appears under a different broadcast. Materialize the two
    # metadata-sized frames ONCE with an eager localCheckpoint (1 row /
    # <= n_bins rows — never data) and let every reuse read memory.
    # Same expressions, bit-identical output.
    mm = vals.agg(
        F.min("__v").alias("__mn"), F.max("__v").alias("__mx")
    ).localCheckpoint(eager=True)
    if sketch is not None:
        h = sketch
    else:
        rel0 = (F.col("__v") - F.col("__mn")) / (
            F.col("__mx") - F.col("__mn")
        )
        bin0 = (
            F.when(F.col("__mx") == F.col("__mn"), F.lit(0))
            .otherwise(
                F.least(
                    F.floor(rel0 * F.lit(float(n_bins))), F.lit(n_bins - 1)
                )
            )
            .cast("long")
        )
        h = (
            vals.crossJoin(F.broadcast(mm))
            .select(bin0.alias("bin"))
            .groupBy("bin")
            .agg(F.count(F.lit(1)).alias("n_rows"))
            .localCheckpoint(eager=True)
        )
    h2 = h.select(F.col("bin").alias("__b2"), F.col("n_rows").alias("__n2"))
    cum = (
        h.join(F.broadcast(h2), F.col("__b2") <= F.col("bin"))
        .groupBy("bin")
        .agg(F.sum("__n2").alias("__cum"))
    )
    total = h.agg(F.sum("n_rows").alias("__n"))
    qrows = mm.select(
        F.explode(F.array(*[F.lit(float(q)) for q in qs])).alias("q")
    )
    pick = (
        qrows.crossJoin(F.broadcast(cum))
        .crossJoin(F.broadcast(total))
        .filter(F.col("__cum") >= F.col("q") * F.col("__n"))
        .groupBy("q")
        .agg(F.min("bin").alias("bin"))
    )
    est = F.round(
        F.col("__mn")
        + ((F.col("bin") + F.lit(1)) / F.lit(float(n_bins)))
        * (F.col("__mx") - F.col("__mn")),
        6,
    )
    return pick.crossJoin(F.broadcast(mm)).select("q", "bin", est.alias("est"))


def binned_quantiles_sql(
    table: str,
    col: str,
    qs: tuple[float, ...] = (0.25, 0.5, 0.75, 0.9, 0.99),
    n_bins: int = 128,
) -> str:
    """DuckDB twin of ``binned_quantiles``. Every literal is CAST to
    DOUBLE so DuckDB's DECIMAL literal arithmetic cannot diverge from
    Spark's double arithmetic at a cum == q*n boundary."""
    qlist = ", ".join(f"CAST({q} AS DOUBLE)" for q in qs)
    nb = f"CAST({n_bins} AS DOUBLE)"
    return f"""
WITH __vals AS (
  SELECT CAST({col} AS DOUBLE) AS v FROM {table} WHERE {col} IS NOT NULL
),
__mm AS (SELECT min(v) AS mn, max(v) AS mx FROM __vals),
__b AS (
  SELECT CASE WHEN mx = mn THEN 0
         ELSE CAST(least(floor(((v - mn) / (mx - mn)) * {nb}),
                         {n_bins - 1}) AS BIGINT) END AS bin
  FROM __vals, __mm
),
__h AS (SELECT bin, count(*) AS n_rows FROM __b GROUP BY bin),
__c AS (
  SELECT bin, sum(n_rows) OVER (ORDER BY bin
    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
  FROM __h
),
__n AS (SELECT sum(n_rows) AS n FROM __h),
__q AS (SELECT unnest([{qlist}]) AS q),
__pick AS (
  SELECT q, min(bin) AS bin
  FROM __q, __c, __n
  WHERE cum >= q * n
  GROUP BY q
)
SELECT q, bin,
       round(mn + ((bin + 1) / {nb}) * (mx - mn), 6) AS est
FROM __pick, __mm
"""


def exact_quantiles(
    df: DataFrame,
    col: str,
    qs: tuple[float, ...] = (0.25, 0.5, 0.75, 0.9, 0.99),
) -> DataFrame:
    """EXACT discrete quantiles at scale: ``(q, exact)`` where exact is
    the smallest data value whose cumulative row count reaches
    ``q * n``. No interpolation (the answer is always a real data value,
    so cross-engine determinism is exact double equality, not float
    arithmetic) and no single-partition window: the cumulative count
    runs over the DISTINCT-VALUE histogram with the monotone-bucket
    decomposition (``ranking.bucketed_cumsum`` over
    ``range_bucket_expr`` boundaries) — each value-range bucket cumsums
    in parallel and only bucket totals visit the driver.

    This is the truth side of the sketch-error audit: the binned sketch
    answers from <= n_bins rows, this answers from one extra shuffle on
    the distinct values — run it on a sample (or a partition) to grade
    the sketch's bin-width error with real numbers."""
    from pyspark.sql import Window

    from nosql_to_sql_migration_tool_spark.operators.ranking import (
        range_bucket_expr,
    )

    vals = df.select(F.col(col).cast("double").alias("__v")).where(
        F.col("__v").isNotNull()
    )
    # r16 optimization (VERDICT r15 what's-wrong #1; guide §5 "size
    # decides" / §2.2 shuffle fewer bytes): the r15 form eagerly
    # localCheckpoint'ed the full DISTINCT-VALUE histogram — DATA-sized
    # when the column is near-all-distinct (l_extendedprice at sf0.1:
    # 583k distinct of 600k rows; at 100 TB a near-corpus-sized
    # executor-disk write) — even though the downstream window was
    # already pruned to the crossing buckets. Restructured so nothing
    # data-sized is ever materialized OR fully shuffled:
    #   1. bucket boundaries from one approx_percentile pass over the
    #      RAW rows (metadata-sized result; boundary placement only
    #      affects bucket SIZES, never the answer — suffix argument
    #      below);
    #   2. per-bucket totals from one map-side-combinable count over
    #      the raw rows (<= 32 rows to the driver) — the same integers
    #      as summing the histogram's per-value counts;
    #   3. ONLY the <= len(qs) crossing buckets' rows group into a
    #      distinct-value histogram slice and checkpoint (the only
    #      shuffle, carrying ~|needed|/32 of the data).
    # The answer needs the cumulative count only at the q*n crossing
    # points: with the totals on the driver, the bucket containing each
    # crossing is known BEFORE any cumsum, and the windowed sum need
    # only run inside those crossing buckets. Every comparison below
    # reproduces Spark's own arithmetic (Python float IS the same IEEE
    # double: float(q) * float(n) == lit(q) * cast(n as double), and
    # float(run) >= target == cast(cum as double) >= target), so the
    # picked rows are bit-identical to the full-cumsum form; the
    # monotone bucket ladder guarantees the satisfying set is a suffix
    # in __v order, so the global min over crossing buckets equals the
    # min over all buckets.
    bkt = range_bucket_expr(vals, "__v", 32)
    with_bkt = vals.withColumn("__bkt", bkt)
    totals = sorted(
        (r[0], r[1] if r[1] is not None else 0)
        for r in with_bkt.groupBy("__bkt")
        .agg(F.count(F.lit(1)).alias("__t"))
        .collect()
    )
    n = sum(t for _, t in totals)
    offsets, acc = {}, 0
    for b, t in totals:
        offsets[b] = acc
        acc += t
    needed: set = set()
    for q in qs:
        target = float(q) * float(n)
        run = 0
        for b, t in totals:
            run += t
            if float(run) >= target:
                needed.add(b)
                break
    def _hist_slice(pred):
        # the crossing-bucket pruning filter sits BELOW the groupBy (and
        # the checkpoint), so both the shuffle and the staged frame are
        # bounded by the crossing buckets' rows, never the data
        return (
            with_bkt.filter(pred)
            .groupBy("__bkt", "__v")
            .agg(F.count(F.lit(1)).alias("__c"))
        )

    if needed:
        sel = _hist_slice(
            F.col("__bkt").isin(*sorted(needed))
        ).localCheckpoint(eager=True)
        off = F.lit(0).cast("long")
        for b in sorted(needed):
            off = F.when(
                F.col("__bkt") == F.lit(b), F.lit(offsets[b]).cast("long")
            ).otherwise(off)
    else:  # no crossing bucket (empty input, or every q > 1.0): keep
        # the one-row-of-nulls agg shape
        sel = _hist_slice(F.lit(False))
        off = F.lit(0).cast("long")
    w = (
        Window.partitionBy("__bkt")
        .orderBy("__v")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = sel.withColumn("__cum", F.sum("__c").over(w) + off)
    # One conditional-aggregate pass answers every q at once: min value
    # whose cum reaches q*n. No range join (a broadcast >= join would
    # emit ~|distinct|/2 rows per q before its groupBy), just len(qs)
    # aggregate expressions over the (crossing-bucket) cumulative frame.
    picked = cum.agg(
        *[
            F.min(
                F.when(
                    F.col("__cum") >= F.lit(float(q) * float(n)),
                    F.col("__v"),
                )
            ).alias(f"__x{i}")
            for i, q in enumerate(qs)
        ]
    )
    pairs = F.array(
        *[
            F.struct(
                F.lit(float(q)).alias("q"), F.col(f"__x{i}").alias("exact")
            )
            for i, q in enumerate(qs)
        ]
    )
    return picked.select(F.explode(pairs).alias("__p")).select(
        F.col("__p.q").alias("q"), F.col("__p.exact").alias("exact")
    )


def exact_quantiles_sql(
    table: str,
    col: str,
    qs: tuple[float, ...] = (0.25, 0.5, 0.75, 0.9, 0.99),
) -> str:
    """DuckDB twin of ``exact_quantiles`` — plain windowed cumulative
    count over the distinct-value histogram (bit-identical to the
    bucketed decomposition: counts are integers)."""
    qlist = ", ".join(f"CAST({q} AS DOUBLE)" for q in qs)
    return f"""
WITH __vals AS (
  SELECT CAST({col} AS DOUBLE) AS v FROM {table} WHERE {col} IS NOT NULL
),
__hist AS (SELECT v, count(*) AS c FROM __vals GROUP BY v),
__cum AS (
  SELECT v, sum(c) OVER (ORDER BY v
    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
  FROM __hist
),
__n AS (SELECT count(*) AS n FROM __vals),
__q AS (SELECT unnest([{qlist}]) AS q)
SELECT q, min(v) AS exact
FROM __q, __cum, __n
WHERE cum >= q * n
GROUP BY q
"""


# ---------------------------------------------------------------------------
# Count-min sketch (round 8): unlike the engine-specific HLL above, CMS
# is a pure integer structure — with the repo's shared md5-hex hashing it
# is bit-reproducible in DuckDB, so the heavy-hitter audit is a fully
# hash-checked declared query (the first sketch family with one since the
# HLL variant was de-registered in round 3).
# ---------------------------------------------------------------------------

CMS_DEPTH = 4
CMS_WIDTH = 512


def cms_bucket(item, row_idx: int, width: int = CMS_WIDTH):
    """Row ``row_idx``'s bucket for an item: md5('<row>|' || item) hex
    prefix -> 32-bit int mod width — the same md5-hex integer convention
    as the train/test split hash (traindata.py), reproducible in any
    engine with md5."""
    return (
        F.conv(
            F.substring(F.md5(F.concat(F.lit(f"{row_idx}|"), item)), 1, 8),
            16,
            10,
        ).cast("long")
        % width
    )


def cms_bucket_sql(expr: str, row_idx: int, width: int = CMS_WIDTH) -> str:
    return (
        f"CAST(concat('0x', substr(md5(concat('{row_idx}|', {expr})), 1, 8)) "
        f"AS BIGINT) % {width}"
    )


def cms_counts(
    items: DataFrame,
    col: str = "token",
    depth: int = CMS_DEPTH,
    width: int = CMS_WIDTH,
) -> DataFrame:
    """The count-min table ``(row_idx, bucket, cnt)`` of an item stream:
    ``depth`` hash rows x ``width`` buckets, built in ONE combinable
    groupBy over an explode of per-row buckets. The output is bounded by
    depth*width regardless of input size — the entire point of the
    sketch at 100 TB: partial maps combine on the map side and the final
    table broadcasts anywhere."""
    rb = F.explode(
        F.array(
            *[
                F.struct(
                    F.lit(r).alias("row_idx"),
                    cms_bucket(F.col(col), r, width).alias("bucket"),
                )
                for r in range(depth)
            ]
        )
    ).alias("rb")
    return (
        items.select(rb)
        .select("rb.row_idx", "rb.bucket")
        .groupBy("row_idx", "bucket")
        .agg(F.count(F.lit(1)).cast("long").alias("cnt"))
    )


def cms_heavy_hitter_audit(
    items: DataFrame,
    col: str = "token",
    k: int = 20,
    depth: int = CMS_DEPTH,
    width: int = CMS_WIDTH,
    cms: DataFrame | None = None,
) -> DataFrame:
    """Heavy-hitter accuracy audit: exact top-``k`` items (distributed
    top-k — TakeOrderedAndProject, never a global window) joined to
    their CMS estimates. Per item: ``exact_n``, ``est_n`` (min over the
    depth rows' bucket counts), ``never_under`` (CMS can only
    overestimate — must be uniformly true) and ``within_bound`` (the
    standard eps*N guarantee with eps = 3/width). Every value is integer
    arithmetic over md5 buckets, so a DuckDB replay matches bit-for-bit
    — the sketch itself is verified, not just sanity-checked.

    ``cms`` overrides the sketch table — pass ``read_cms(...)`` of a
    persisted partials store (streaming/cms_stream.py) to audit an
    incrementally-maintained sketch against the exact stream; by
    additivity the merged table equals the one-shot build, so the same
    oracle verifies both."""
    if cms is None:
        cms = cms_counts(items, col=col, depth=depth, width=width)
    exact = items.groupBy(col).agg(F.count(F.lit(1)).cast("long").alias("exact_n"))
    topk = exact.orderBy(F.desc("exact_n"), F.asc(col)).limit(k)
    total = items.agg(F.count(F.lit(1)).cast("long").alias("__n"))
    probes = topk.select(
        col,
        "exact_n",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(r).alias("row_idx"),
                        cms_bucket(F.col(col), r, width).alias("bucket"),
                    )
                    for r in range(depth)
                ]
            )
        ).alias("rb"),
    ).select(col, "exact_n", "rb.row_idx", "rb.bucket")
    est = (
        probes.join(F.broadcast(cms), ["row_idx", "bucket"])
        .groupBy(col, "exact_n")
        .agg(F.min("cnt").alias("est_n"))
    )
    bound = F.ceil(F.lit(3.0) * F.col("__n") / F.lit(width)).cast("long")
    return (
        est.crossJoin(F.broadcast(total))
        .select(
            col,
            "exact_n",
            "est_n",
            (F.col("est_n") >= F.col("exact_n")).alias("never_under"),
            (F.col("est_n") <= F.col("exact_n") + bound).alias("within_bound"),
        )
    )


# ---------------------------------------------------------------------------
# Linear probabilistic counting (round 9): the oracle-checkable distinct
# sketch. The round-3 HLL had to be de-registered because its estimate is
# engine-specific; linear counting (Whang et al. 1990) is a pure function
# of (m, n_occupied md5 buckets) — bit-reproducible in DuckDB, so the
# ESTIMATE itself can be hash-verified, not just sanity-checked. ANSI
# pitfall pinned by probe: `e / 4096.0` under ANSI is DECIMAL division
# (truncates to 6dp BEFORE ln, ~0.007% error that breaks hash parity);
# both engines must divide doubles — with the explicit cast the two
# engines agree on round(-m*ln(empty/m), 4) for EVERY one of the 4095
# possible ratios at m=4096 (measured exhaustively).
# ---------------------------------------------------------------------------

LC_M = 4096


def lc_bucket(item, m: int = LC_M):
    """md5-hex bucket of an item — same integer convention as
    ``cms_bucket``."""
    return (
        F.conv(F.substring(F.md5(item), 1, 8), 16, 10).cast("long") % m
    )


def lc_bucket_sql(expr: str, m: int = LC_M) -> str:
    return (
        f"CAST(concat('0x', substr(md5({expr}), 1, 8)) AS BIGINT) % {m}"
    )


def _lc_estimate(occupied, m: int):
    empty = F.lit(m) - occupied
    return F.when(occupied == 0, F.lit(0.0)).when(
        empty > 0,
        F.round(
            F.lit(-float(m))
            * F.log(empty.cast("double") / F.lit(float(m))),
            4,
        ),
    ).otherwise(F.lit(None).cast("double"))


def _lc_estimate_sql(occupied: str, m: int) -> str:
    return (
        f"CASE WHEN {occupied} = 0 THEN 0.0 "
        f"WHEN {m} - {occupied} > 0 THEN "
        f"round(-{m} * ln(CAST({m} - {occupied} AS DOUBLE) / {m}.0), 4) "
        f"ELSE NULL END"
    )


def linear_count(
    items: DataFrame, col: str, m: int = LC_M
) -> DataFrame:
    """One-row distinct-count sketch: ``(n_occupied, m_buckets,
    estimate)``. One distinct over m-bounded buckets (map-side
    combinable), never over the raw values — the point at 100 TB: the
    shuffle carries at most m rows per partition. ``estimate`` is the
    classic -m*ln(empty/m); NULL when every bucket is occupied (the
    documented saturation bound — use a larger m). Standard error
    ~sqrt(m)(e^t - t - 1)^.5/(m t) with t = n/m; at t <= 2 it is a few
    percent, pinned by pytest against exact distinct."""
    occ = (
        items.select(lc_bucket(F.col(col), m).alias("bucket"))
        .distinct()
        .agg(F.count(F.lit(1)).cast("long").alias("n_occupied"))
    )
    return occ.select(
        "n_occupied",
        F.lit(m).cast("long").alias("m_buckets"),
        _lc_estimate(F.col("n_occupied"), m).alias("estimate"),
    )


def linear_count_sql(items_sql: str, expr: str, m: int = LC_M) -> str:
    """DuckDB twin of ``linear_count`` (bit-identical buckets AND
    estimate — see the module-top parity note)."""
    return f"""
WITH items AS ({items_sql}),
occ AS (
  SELECT CAST(count(*) AS BIGINT) AS n_occupied
  FROM (SELECT DISTINCT {lc_bucket_sql(expr, m)} AS bucket FROM items)
)
SELECT n_occupied,
       CAST({m} AS BIGINT) AS m_buckets,
       {_lc_estimate_sql('n_occupied', m)} AS estimate
FROM occ
"""


def update_lc_index(
    items: DataFrame,
    index_path: str,
    batch_id: int = 0,
    col: str = "token",
    m: int = LC_M,
) -> None:
    """Fold one batch into a persisted occupied-bucket store — the
    mergeable form (a bucket set merges by UNION, even simpler than the
    CMS's additive cells). batch_id-keyed dynamic-partition overwrite:
    a replayed batch rewrites its own partition with identical rows,
    and duplicate bucket rows are harmless anyway (reads are DISTINCT)."""
    (
        items.select(lc_bucket(F.col(col), m).alias("bucket"))
        .distinct()
        .withColumn("batch_id", F.lit(int(batch_id)))
        .write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy("batch_id")
        .parquet(index_path)
    )


def read_lc(spark: SparkSession, index_path: str, m: int = LC_M) -> DataFrame:
    """Current sketch of everything ever folded: distinct buckets
    across all batch partitions -> same one-row shape as
    ``linear_count`` (set union is exact, so this EQUALS the one-shot
    whole-stream sketch bit-for-bit)."""
    occ = (
        spark.read.parquet(index_path)
        .select("bucket")
        .distinct()
        .agg(F.count(F.lit(1)).cast("long").alias("n_occupied"))
    )
    return occ.select(
        "n_occupied",
        F.lit(m).cast("long").alias("m_buckets"),
        _lc_estimate(F.col("n_occupied"), m).alias("estimate"),
    )


def compact_lc_index(
    spark: SparkSession,
    index_path: str,
    max_safe_batch_id: int | None = None,
) -> None:
    """Fold committed batches' buckets into the reserved ``batch_id=-1``
    partition, bounding the store at <= m rows (+ preserved unsafe
    batches) — same crash-window gate as the rollup/CMS compactions."""
    from nosql_to_sql_migration_tool_spark.hadoop_fs import try_read_parquet

    parts = try_read_parquet(spark, index_path)
    if parts is None:
        return
    if max_safe_batch_id is not None:
        safe_pred = (F.col("batch_id") == -1) | (
            F.col("batch_id") <= int(max_safe_batch_id)
        )
    else:
        safe_pred = F.lit(True)
    folded = (
        parts.filter(safe_pred)
        .select("bucket")
        .distinct()
        .withColumn("batch_id", F.lit(-1))
        .unionByName(parts.filter(~safe_pred))
        .localCheckpoint(eager=True)
    )
    (
        folded.write.mode("overwrite")
        .option("partitionOverwriteMode", "static")
        .partitionBy("batch_id")
        .parquet(index_path)
    )


def linear_count_by(
    items: DataFrame, group_col: str, col: str, m: int = LC_M
) -> DataFrame:
    """Per-group linear counting (round 10): ``(group, n_occupied,
    m_buckets, estimate)`` — one row per group, the grouped form of
    ``linear_count`` (distinct-users-per-segment at corpus scale
    without a per-group raw distinct). The shuffle carries at most
    groups x m bucket rows; estimates use the same DOUBLE-pinned
    formula, bit-replayable in DuckDB."""
    occ = (
        items.select(
            F.col(group_col).alias("grp"),
            lc_bucket(F.col(col), m).alias("bucket"),
        )
        .distinct()
        .groupBy("grp")
        .agg(F.count(F.lit(1)).cast("long").alias("n_occupied"))
    )
    return occ.select(
        F.col("grp").alias(group_col),
        "n_occupied",
        F.lit(m).cast("long").alias("m_buckets"),
        _lc_estimate(F.col("n_occupied"), m).alias("estimate"),
    )


def linear_count_by_sql(
    items_sql: str,
    group_expr: str,
    expr: str,
    m: int = LC_M,
    out_col: str | None = None,
) -> str:
    """DuckDB twin of ``linear_count_by``. ``group_expr`` may be any
    SQL expression; the output column name is ``out_col``, defaulting
    to ``group_expr`` only when that is a plain identifier (ADVICE r10:
    ``grp AS <cast(...)>`` is not a valid alias)."""
    if out_col is None:
        if not group_expr.replace("_", "").isalnum():
            raise ValueError(
                "linear_count_by_sql: group_expr is not a plain column "
                "name; pass out_col explicitly"
            )
        out_col = group_expr
    return f"""
WITH items AS ({items_sql}),
occ AS (
  SELECT grp, CAST(count(*) AS BIGINT) AS n_occupied
  FROM (
    SELECT DISTINCT {group_expr} AS grp,
           {lc_bucket_sql(expr, m)} AS bucket
    FROM items
  )
  GROUP BY grp
)
SELECT grp AS {out_col}, n_occupied,
       CAST({m} AS BIGINT) AS m_buckets,
       {_lc_estimate_sql('n_occupied', m)} AS estimate
FROM occ
"""


def binned_quantiles_by(
    df: DataFrame,
    group_col: str,
    col: str,
    qs: tuple[float, ...] = (0.25, 0.5, 0.75, 0.9, 0.99),
    n_bins: int = 128,
) -> DataFrame:
    """GROUPED quantile estimates from per-group binned sketches —
    the grouped member of the family, completing the scalar->grouped
    progression exactly as ``linear_count`` -> ``linear_count_by``
    (VERDICT r10 next #4): ``(group, q, bin, est)`` per group and
    requested q, est rounded 6 dp, error bounded by one per-group bin
    width.

    Plan shape: one combinable (group) min/max/count pass, one
    combinable (group, bin) histogram fold — the shuffle carries at
    most groups x n_bins rows, never the values — and the cumulative
    count is a window PARTITIONED BY GROUP over <= n_bins rows per
    partition (never a global single-partition window). Same
    bit-determinism contract as the scalar sketch: identical IEEE
    expression text on both engines, every literal double."""
    from pyspark.sql import Window

    vals = df.select(
        F.col(group_col).alias("grp"),
        F.col(col).cast("double").alias("__v"),
    ).where(F.col("__v").isNotNull())
    mm = vals.groupBy("grp").agg(
        F.min("__v").alias("__mn"),
        F.max("__v").alias("__mx"),
        F.count(F.lit(1)).cast("long").alias("__n"),
    )
    binned = vals.join(mm, "grp")
    rel = (F.col("__v") - F.col("__mn")) / (F.col("__mx") - F.col("__mn"))
    bin_ = (
        F.when(F.col("__mx") == F.col("__mn"), F.lit(0))
        .otherwise(
            F.least(F.floor(rel * F.lit(float(n_bins))), F.lit(n_bins - 1))
        )
        .cast("long")
    )
    h = (
        binned.select("grp", bin_.alias("bin"))
        .groupBy("grp", "bin")
        .agg(F.count(F.lit(1)).cast("long").alias("n_rows"))
    )
    w = (
        Window.partitionBy("grp")
        .orderBy("bin")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = h.select("grp", "bin", F.sum("n_rows").over(w).alias("__cum"))
    qrows = F.explode(F.array(*[F.lit(float(q)) for q in qs])).alias("q")
    pick = (
        cum.join(mm.select("grp", "__n"), "grp")
        .select("grp", "bin", "__cum", "__n", qrows)
        .filter(
            F.col("__cum").cast("double")
            >= F.col("q") * F.col("__n").cast("double")
        )
        .groupBy("grp", "q")
        .agg(F.min("bin").alias("bin"))
    )
    est = F.round(
        F.col("__mn")
        + ((F.col("bin") + F.lit(1)) / F.lit(float(n_bins)))
        * (F.col("__mx") - F.col("__mn")),
        6,
    )
    return pick.join(mm, "grp").select(
        F.col("grp").alias(group_col), "q", "bin", est.alias("est")
    )


def binned_quantiles_by_sql(
    table: str,
    group_expr: str,
    col: str,
    qs: tuple[float, ...] = (0.25, 0.5, 0.75, 0.9, 0.99),
    n_bins: int = 128,
    out_col: str | None = None,
) -> str:
    """DuckDB twin of ``binned_quantiles_by`` (window partitioned by
    group; every literal CAST to DOUBLE — the scalar twin's boundary
    discipline). ``out_col`` follows the linear_count_by_sql alias
    contract."""
    if out_col is None:
        if not group_expr.replace("_", "").isalnum():
            raise ValueError(
                "binned_quantiles_by_sql: group_expr is not a plain "
                "column name; pass out_col explicitly"
            )
        out_col = group_expr
    qlist = ", ".join(f"CAST({q} AS DOUBLE)" for q in qs)
    nb = f"CAST({n_bins} AS DOUBLE)"
    return f"""
WITH __vals AS (
  SELECT {group_expr} AS grp, CAST({col} AS DOUBLE) AS v
  FROM {table} WHERE {col} IS NOT NULL
),
__mm AS (
  SELECT grp, min(v) AS mn, max(v) AS mx,
         CAST(count(*) AS BIGINT) AS n
  FROM __vals GROUP BY grp
),
__b AS (
  SELECT __vals.grp,
         CASE WHEN mx = mn THEN 0
         ELSE CAST(least(floor(((v - mn) / (mx - mn)) * {nb}),
                         {n_bins - 1}) AS BIGINT) END AS bin
  FROM __vals JOIN __mm ON __vals.grp = __mm.grp
),
__h AS (
  SELECT grp, bin, CAST(count(*) AS BIGINT) AS n_rows
  FROM __b GROUP BY grp, bin
),
__c AS (
  SELECT grp, bin, sum(n_rows) OVER (PARTITION BY grp ORDER BY bin
    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
  FROM __h
),
__q AS (SELECT unnest([{qlist}]) AS q),
__pick AS (
  SELECT c.grp, q, min(bin) AS bin
  FROM __q, __c c JOIN __mm m ON c.grp = m.grp
  WHERE CAST(cum AS DOUBLE) >= q * CAST(n AS DOUBLE)
  GROUP BY c.grp, q
)
SELECT p.grp AS {out_col}, q, bin,
       round(mn + ((bin + 1) / {nb}) * (mx - mn), 6) AS est
FROM __pick p JOIN __mm m ON p.grp = m.grp
"""


# ---------------------------------------------------------------------------
# KMV (bottom-k / k-minimum-values) distinct sketch (round 14, r15
# queue): the MERGEABLE approximate-distinct the family was missing.
# linear_count's bitmap must grow with cardinality (the measured
# saturation bound); HLL was de-registered in r3 because engine
# estimates differ. KMV closes both gaps: the sketch is the k smallest
# DISTINCT 48-bit md5 hashes of the values — a pure function of the
# value SET — so two sketches merge by union+re-cut (set semantics,
# order-free, replay-safe) and the classic estimator
# (k-1) * 2^48 DIV h_k is exact INTEGER math both engines replay
# bit-identically (Beyer et al., SIGMOD'07). 48 bits (12 md5 hex
# chars) keeps (k-1) * 2^48 inside BIGINT for k <= 32768.
#
# Scale shape (corrected per ADVICE r14 — the earlier
# groupBy(spark_partition_id).collect_set form shipped each partition's
# FULL distinct set inside ONE unspillable array buffer): the cut is now
# hash DISTINCT -> TakeOrdered. The distinct's partial hash aggregate
# dedupes map-side with PER-KEY-bounded, spill-to-disk buffers (the
# standard exact-distinct shape — never an O(partition-distinct) array
# in memory), and its one exchange carries each partition's distinct
# hashes as plain spillable rows — O(distinct), not bounded by k; that
# is the honest cost of an exact distinct cut without a Python stage.
# The final bottom-k then plans as TakeOrdered, whose map-side cut
# ships only k rows per post-shuffle partition. Executor memory is
# bounded at any cardinality; shuffle volume is one long per distinct
# value (8 bytes/key — ~100x smaller than the count_distinct the
# sketch replaces runs on raw values).
#
# Cross-engine hash parity (ADVICE r14): kmv_hash feeds the value
# through CAST(x AS STRING/VARCHAR), which renders identically across
# Spark and DuckDB for strings, integers, booleans and dates but NOT
# for doubles (scientific notation), decimals (trailing zeros) or
# timestamps (fraction rendering) — kmv_bottomk therefore REJECTS
# those types; canonicalize to string/long first (linkage's _canon
# pattern) when sketching them.
# ---------------------------------------------------------------------------

KMV_K = 1024
KMV_SPACE = 1 << 48


def kmv_hash(item):
    """48-bit md5 hash of a value — the house md5 integer convention
    (12 hex chars so estimator arithmetic stays in BIGINT). Bit-equal
    across engines ONLY for types whose string rendering matches
    (string / integral / boolean / date — enforced by the
    ``kmv_bottomk`` type gate); see the header's parity note."""
    return F.conv(
        F.substring(F.md5(item.cast("string")), 1, 12), 16, 10
    ).cast("long")


# Types whose CAST-to-string renders identically in Spark and DuckDB —
# the precondition for the cross-engine sketch contract (ADVICE r14).
_KMV_SAFE_TYPES = (
    T.StringType,
    T.ByteType,
    T.ShortType,
    T.IntegerType,
    T.LongType,
    T.BooleanType,
    T.DateType,
)


def _require_kmv_safe(items: DataFrame, col: str) -> None:
    dt = items.schema[col].dataType
    if not isinstance(dt, _KMV_SAFE_TYPES):
        raise TypeError(
            f"kmv: column {col!r} has type {dt.simpleString()}, whose "
            "string rendering is not bit-stable across engines "
            "(doubles render scientific notation, decimals/timestamps "
            "differ in fraction form) — cast/canonicalize it to "
            "string or long first"
        )


def kmv_hash_sql(expr: str) -> str:
    return (
        f"CAST(concat('0x', substr(md5(CAST({expr} AS VARCHAR)), 1, 12))"
        f" AS BIGINT)"
    )


def kmv_bottomk(items: DataFrame, col: str, k: int = KMV_K) -> DataFrame:
    """The k smallest distinct hashes as rows ``(h)`` — the sketch's
    relational form (callers aggregate or persist it; it is at most k
    rows). Plan (ADVICE r14 rewrite): hash DISTINCT on the 8-byte hash
    (partial aggregate dedupes map-side with per-key-bounded spillable
    buffers; its ONE exchange carries each partition's distinct hashes
    as plain rows), then the bottom-k plans as TakeOrdered — a map-side
    cut shipping only k rows per post-shuffle partition. Input type is
    gated to the cross-engine-stable renderings (see header)."""
    _require_kmv_safe(items, col)
    cand = items.select(kmv_hash(F.col(col)).alias("h")).distinct()
    return cand.orderBy("h").limit(int(k))


def _kmv_estimate(n_kept_col: str, kth_col: str, k: int):
    """BIGINT estimator: exact count while the sketch is not full,
    (k-1)*2^48 DIV h_k once it is (integer division — both engines
    truncate identically for positive BIGINTs)."""
    num = (k - 1) * KMV_SPACE
    return F.when(
        F.col(n_kept_col) < k, F.col(n_kept_col).cast("long")
    ).otherwise(
        F.expr(f"{num}L DIV greatest({kth_col}, 1L)").cast("long")
    )


def kmv_distinct(items: DataFrame, col: str, k: int = KMV_K) -> DataFrame:
    """ONE row ``(n_kept, k, estimate)`` — the sketch summary. While
    fewer than k distinct hashes exist the estimate IS the exact
    distinct-hash count; at k it switches to the bottom-k estimator."""
    agg = kmv_bottomk(items, col, k).agg(
        F.count(F.lit(1)).cast("long").alias("n_kept"),
        F.max("h").alias("__kth"),
    )
    return agg.select(
        "n_kept",
        F.lit(int(k)).cast("long").alias("k"),
        _kmv_estimate("n_kept", "__kth", int(k)).alias("estimate"),
    )


def kmv_merge(a: DataFrame, b: DataFrame, k: int = KMV_K) -> DataFrame:
    """Union two sketches' rows and re-cut to bottom-k — the mergeable
    contract: merge(sketch(A), sketch(B)) == sketch(A union B) exactly
    (set semantics; pytest-pinned)."""
    return (
        a.select("h")
        .unionByName(b.select("h"))
        .distinct()
        .orderBy("h")
        .limit(int(k))
    )


def kmv_distinct_sql(items_sql: str, expr: str, k: int = KMV_K) -> str:
    """DuckDB twin of ``kmv_distinct`` — bit-identical hashes, cut and
    integer estimator (no partition trick needed: the global DISTINCT
    ORDER BY LIMIT k is definitionally the same set)."""
    num = (int(k) - 1) * KMV_SPACE
    return f"""
WITH items AS ({items_sql}),
bottom AS (
  SELECT DISTINCT {kmv_hash_sql(expr)} AS h FROM items
  ORDER BY h LIMIT {int(k)}
),
agg AS (
  SELECT CAST(count(*) AS BIGINT) AS n_kept, max(h) AS kth FROM bottom
)
SELECT n_kept, CAST({int(k)} AS BIGINT) AS k,
       CASE WHEN n_kept < {int(k)} THEN n_kept
            ELSE {num} // greatest(kth, 1) END AS estimate
FROM agg
"""


def kmv_error_audit(
    items: DataFrame, col: str, k: int = KMV_K
) -> DataFrame:
    """ONE row ``(estimate, exact, rel_err)`` — the sketch graded
    against the exact distinct count (the price_quantile_error_audit
    discipline: approximation error is a measured number). Expected
    relative error ~1/sqrt(k-2) (~3% at k=1024)."""
    est = kmv_distinct(items, col, k).select("estimate")
    exact = items.agg(
        F.count_distinct(F.col(col)).cast("long").alias("exact")
    )
    return est.crossJoin(F.broadcast(exact)).select(
        "estimate",
        "exact",
        F.round(
            F.abs(F.col("estimate") - F.col("exact")).cast("double")
            / F.col("exact").cast("double"),
            6,
        ).alias("rel_err"),
    )


def kmv_error_audit_sql(items_sql: str, expr: str, k: int = KMV_K) -> str:
    return f"""
WITH est AS ({kmv_distinct_sql(items_sql, expr, k)}),
ex AS (
  SELECT CAST(count(DISTINCT {expr}) AS BIGINT) AS exact
  FROM ({items_sql})
)
SELECT est.estimate, ex.exact,
       round(CAST(abs(est.estimate - ex.exact) AS DOUBLE)
             / CAST(ex.exact AS DOUBLE), 6) AS rel_err
FROM est, ex
"""


def update_kmv_sketch(
    items: DataFrame,
    store_path: str,
    batch_id: int = 0,
    col: str = "token",
    k: int = KMV_K,
) -> None:
    """Fold one batch into a persisted bottom-k store — the mergeable
    form (sketch rows union by SET semantics, so the reader's re-cut
    of all batch partitions EQUALS the one-shot whole-stream sketch —
    the update_lc_index discipline). batch_id-keyed dynamic-partition
    overwrite: a replayed batch rewrites its own partition with
    identical rows; duplicate hashes across batches are harmless (the
    read is DISTINCT before the cut). Each batch partition holds at
    most k longs — the store stays metadata-sized forever."""
    (
        kmv_bottomk(items, col, k)
        .withColumn("batch_id", F.lit(int(batch_id)))
        .write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy("batch_id")
        .parquet(store_path)
    )


def read_kmv(
    spark: SparkSession, store_path: str, k: int = KMV_K
) -> DataFrame:
    """Current sketch summary of everything ever folded: distinct
    hashes across all batch partitions, re-cut to bottom-k -> the same
    one-row shape as ``kmv_distinct`` (bit-equal to the one-shot
    whole-stream sketch — pytest-pinned)."""
    agg = (
        spark.read.parquet(store_path)
        .select("h")
        .distinct()
        .orderBy("h")
        .limit(int(k))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_kept"),
            F.max("h").alias("__kth"),
        )
    )
    return agg.select(
        "n_kept",
        F.lit(int(k)).cast("long").alias("k"),
        _kmv_estimate("n_kept", "__kth", int(k)).alias("estimate"),
    )


def kmv_distinct_by(
    items: DataFrame, group_col: str, col: str, k: int = KMV_K
) -> DataFrame:
    """Grouped KMV — ``(group, n_kept, k, estimate)`` per group value,
    the bottom-k sibling of ``linear_count_by`` (round 15, r16 queue):
    per-group approximate-distinct where the LC bitmap would need m
    rows PER GROUP regardless of group size, the KMV sketch holds
    min(k, group distinct) rows and keeps the exact-below-k branch per
    group. Plan: one spillable hash DISTINCT on (group, h), then the
    per-group bottom-k as a window PARTITIONED BY GROUP (never global
    — the partitioned-window shape every grouped top-k in the repo
    uses), then one combinable per-group fold. Input type gated like
    the scalar form."""
    _require_kmv_safe(items, col)
    from pyspark.sql import Window

    pairs = items.select(
        F.col(group_col).alias("grp"),
        kmv_hash(F.col(col)).alias("h"),
    ).distinct()
    w = Window.partitionBy("grp").orderBy("h")
    kept = pairs.withColumn("__rn", F.row_number().over(w)).where(
        F.col("__rn") <= int(k)
    )
    agg = kept.groupBy("grp").agg(
        F.count(F.lit(1)).cast("long").alias("n_kept"),
        F.max("h").alias("__kth"),
    )
    return agg.select(
        F.col("grp").alias(group_col),
        "n_kept",
        F.lit(int(k)).cast("long").alias("k"),
        _kmv_estimate("n_kept", "__kth", int(k)).alias("estimate"),
    )


def kmv_distinct_by_sql(
    items_sql: str, group_expr: str, expr: str, k: int = KMV_K
) -> str:
    """DuckDB twin of ``kmv_distinct_by`` — identical hash, per-group
    cut and integer estimator."""
    num = (int(k) - 1) * KMV_SPACE
    return f"""
WITH items AS ({items_sql}),
pairs AS (
  SELECT DISTINCT {group_expr} AS grp, {kmv_hash_sql(expr)} AS h FROM items
),
kept AS (
  SELECT grp, h,
         row_number() OVER (PARTITION BY grp ORDER BY h) AS rn
  FROM pairs
),
agg AS (
  SELECT grp, CAST(count(*) AS BIGINT) AS n_kept, max(h) AS kth
  FROM kept WHERE rn <= {int(k)} GROUP BY grp
)
SELECT grp AS {group_expr}, n_kept, CAST({int(k)} AS BIGINT) AS k,
       CASE WHEN n_kept < {int(k)} THEN n_kept
            ELSE {num} // greatest(kth, 1) END AS estimate
FROM agg
"""


def kmv_intersection(
    a: DataFrame, b: DataFrame, col: str, k: int = KMV_K
) -> DataFrame:
    """KMV set-operation estimation (Beyer et al., SIGMOD'07 §4 — the
    reason bottom-k beats HLL for planning): from the two column
    sketches alone, estimate |A ∪ B| and |A ∩ B| WITHOUT running the
    join — the join-cardinality / selectivity primitive a 100 TB
    planner consults before committing to a shuffle. ONE row
    ``(n_union_kept, rho, union_estimate, intersection_estimate)``:
    K = bottom-k(sketch(A) ∪ sketch(B)) is definitionally the sketch
    of A ∪ B; rho = |K ∩ sketch(A) ∩ sketch(B)| is a Binomial(k,
    |A∩B|/|A∪B|) draw, so intersection ≈ rho * union_est / k — kept
    INTEGER (rho * est DIV k) so both engines replay bit-identically.
    While the union holds < k distinct hashes, K is the whole union
    set, rho IS the exact intersection count, and both estimates are
    exact. Cost beyond the two input scans: sketch frames are <= k
    rows — every downstream join broadcasts."""
    sa = kmv_bottomk(a, col, k)
    sb = kmv_bottomk(b, col, k)
    union_k = kmv_merge(sa, sb, k)
    both = sa.join(sb, "h", "semi")
    marked = union_k.join(
        F.broadcast(both.withColumn("__both", F.lit(1))), "h", "left"
    )
    agg = marked.agg(
        F.count(F.lit(1)).cast("long").alias("n_union_kept"),
        F.max("h").alias("__kth"),
        F.sum(F.coalesce(F.col("__both"), F.lit(0))).cast("long").alias("rho"),
    )
    num = (int(k) - 1) * KMV_SPACE
    return agg.select(
        "n_union_kept",
        "rho",
        _kmv_estimate("n_union_kept", "__kth", int(k)).alias(
            "union_estimate"
        ),
        F.when(
            F.col("n_union_kept") < int(k), F.col("rho")
        ).otherwise(
            F.expr(
                f"(rho * ({num}L DIV greatest(__kth, 1L))) DIV {int(k)}L"
            )
        ).cast("long").alias("intersection_estimate"),
    )


def kmv_intersection_sql(
    a_sql: str, b_sql: str, expr: str, k: int = KMV_K
) -> str:
    """DuckDB twin of ``kmv_intersection`` — identical sketches, cut,
    rho and integer estimators."""
    num = (int(k) - 1) * KMV_SPACE
    return f"""
WITH sa AS (
  SELECT DISTINCT {kmv_hash_sql(expr)} AS h FROM ({a_sql})
  ORDER BY h LIMIT {int(k)}
),
sb AS (
  SELECT DISTINCT {kmv_hash_sql(expr)} AS h FROM ({b_sql})
  ORDER BY h LIMIT {int(k)}
),
uk AS (
  SELECT DISTINCT h FROM (SELECT h FROM sa UNION ALL SELECT h FROM sb)
  ORDER BY h LIMIT {int(k)}
),
agg AS (
  SELECT CAST(count(*) AS BIGINT) AS n_union_kept,
         max(h) AS kth,
         CAST(sum(CASE WHEN h IN (SELECT h FROM sa)
                        AND h IN (SELECT h FROM sb)
                   THEN 1 ELSE 0 END) AS BIGINT) AS rho
  FROM uk
)
SELECT n_union_kept, rho,
       CASE WHEN n_union_kept < {int(k)} THEN n_union_kept
            ELSE {num} // greatest(kth, 1) END AS union_estimate,
       CASE WHEN n_union_kept < {int(k)} THEN rho
            ELSE (rho * ({num} // greatest(kth, 1))) // {int(k)}
       END AS intersection_estimate
FROM agg
"""


def kmv_intersection_error_audit(
    a: DataFrame, b: DataFrame, col: str, k: int = KMV_K
) -> DataFrame:
    """``kmv_intersection`` GRADED against the exact set sizes — one
    row (union_estimate, union_exact, intersection_estimate,
    intersection_exact, rel_err_union, rel_err_intersection), the
    kmv_error_audit discipline applied to the set-operation estimators:
    a planner trusting these numbers should know their measured error,
    not the paper bound. The exact side pays the distinct + semi-join
    the sketch exists to avoid — audits compare against truth by
    definition."""
    est = kmv_intersection(a, b, col, k).select(
        "union_estimate", "intersection_estimate"
    )
    da = a.select(F.col(col).alias("__v")).distinct()
    db = b.select(F.col(col).alias("__v")).distinct()
    exact = (
        da.unionByName(db)
        .distinct()
        .agg(F.count(F.lit(1)).cast("long").alias("union_exact"))
        .crossJoin(
            F.broadcast(
                da.join(db, "__v", "semi").agg(
                    F.count(F.lit(1)).cast("long").alias(
                        "intersection_exact"
                    )
                )
            )
        )
    )
    rel = lambda e, x: F.round(  # noqa: E731
        F.abs(F.col(e) - F.col(x)).cast("double")
        / F.greatest(F.col(x).cast("double"), F.lit(1.0)),
        6,
    )
    return est.crossJoin(F.broadcast(exact)).select(
        "union_estimate",
        "union_exact",
        "intersection_estimate",
        "intersection_exact",
        rel("union_estimate", "union_exact").alias("rel_err_union"),
        rel("intersection_estimate", "intersection_exact").alias(
            "rel_err_intersection"
        ),
    )


def kmv_intersection_error_audit_sql(
    a_sql: str, b_sql: str, expr: str, k: int = KMV_K
) -> str:
    return f"""
WITH est AS ({kmv_intersection_sql(a_sql, b_sql, expr, k)}),
ex AS (
  SELECT
    CAST((SELECT count(DISTINCT v) FROM (
      SELECT {expr} AS v FROM ({a_sql})
      UNION ALL SELECT {expr} FROM ({b_sql})
    )) AS BIGINT) AS union_exact,
    CAST((SELECT count(*) FROM
      (SELECT DISTINCT {expr} AS v FROM ({a_sql})) da
      WHERE v IN (SELECT {expr} FROM ({b_sql}))
    ) AS BIGINT) AS intersection_exact
)
SELECT est.union_estimate, ex.union_exact,
       est.intersection_estimate, ex.intersection_exact,
       round(CAST(abs(est.union_estimate - ex.union_exact) AS DOUBLE)
             / greatest(CAST(ex.union_exact AS DOUBLE), 1.0), 6)
         AS rel_err_union,
       round(CAST(abs(est.intersection_estimate - ex.intersection_exact)
                  AS DOUBLE)
             / greatest(CAST(ex.intersection_exact AS DOUBLE), 1.0), 6)
         AS rel_err_intersection
FROM est, ex
"""


# ---------------------------------------------------------------------------
# Fixed-bound binned quantiles + maintained store (round 15): the
# mergeable member of the quantile family. ``binned_quantiles`` derives
# its bin edges from the data's min/max, which is the right one-shot
# shape but does NOT merge — a later batch can extend the range and
# silently re-mean every earlier bin. The batch-maintained form
# therefore pins the bounds as CALLER config (reviewable, like the CMS
# width/depth and the linkage m/u tables): histograms over fixed edges
# are ADDITIVE cells, so per-batch folds are O(n_bins) rows, reads
# never touch raw data, and read-of-store == one-shot-over-everything
# bit-for-bit. Out-of-range values clamp to the edge bins (visible
# mass, never dropped) — the documented trade for mergeability.
# ---------------------------------------------------------------------------


def fixed_bin(col, lo: float, hi: float, n_bins: int):
    """Bin index over caller-pinned ``[lo, hi)`` edges: values at or
    below lo -> bin 0, at or above hi -> bin n_bins-1, else
    floor((v-lo)/(hi-lo)*n_bins). All literals double — the family's
    cross-engine IEEE discipline."""
    if not (float(hi) > float(lo)):
        raise ValueError("fixed_bin: hi must be > lo")
    v = col.cast("double")
    rel = (v - F.lit(float(lo))) / (F.lit(float(hi)) - F.lit(float(lo)))
    return (
        F.when(v <= F.lit(float(lo)), F.lit(0))
        .when(v >= F.lit(float(hi)), F.lit(n_bins - 1))
        .otherwise(
            F.least(
                F.floor(rel * F.lit(float(n_bins))), F.lit(n_bins - 1)
            )
        )
        .cast("long")
    )


def fixed_bin_sql(expr: str, lo: float, hi: float, n_bins: int) -> str:
    if not (float(hi) > float(lo)):
        raise ValueError("fixed_bin_sql: hi must be > lo")
    v = f"CAST({expr} AS DOUBLE)"
    lo_l = f"CAST({float(lo)} AS DOUBLE)"
    hi_l = f"CAST({float(hi)} AS DOUBLE)"
    nb = f"CAST({n_bins} AS DOUBLE)"
    return (
        f"CASE WHEN {v} <= {lo_l} THEN 0 "
        f"WHEN {v} >= {hi_l} THEN {n_bins - 1} "
        f"ELSE CAST(least(floor((({v} - {lo_l}) / ({hi_l} - {lo_l})) "
        f"* {nb}), {n_bins - 1}) AS BIGINT) END"
    )


def _fixed_pick(h: DataFrame, lo: float, hi: float, qs, n_bins: int):
    """(q, bin, est) from a fixed-edge histogram ``(bin, n_rows)`` —
    cumulative count via the broadcast triangular self-join over
    <= n_bins rows (the family keeps ZERO partition-less windows),
    est = upper bin edge, rounded 6 dp."""
    h2 = h.select(F.col("bin").alias("__b2"), F.col("n_rows").alias("__n2"))
    cum = (
        h.join(F.broadcast(h2), F.col("__b2") <= F.col("bin"))
        .groupBy("bin")
        .agg(F.sum("__n2").alias("__cum"))
    )
    total = h.agg(F.sum("n_rows").alias("__n"))
    qrows = F.explode(
        F.array(*[F.lit(float(q)) for q in qs])
    ).alias("q")
    pick = (
        cum.select("bin", "__cum", qrows)
        .crossJoin(F.broadcast(total))
        .filter(
            F.col("__cum").cast("double")
            >= F.col("q") * F.col("__n").cast("double")
        )
        .groupBy("q")
        .agg(F.min("bin").alias("bin"))
    )
    est = F.round(
        F.lit(float(lo))
        + ((F.col("bin") + F.lit(1)) / F.lit(float(n_bins)))
        * (F.lit(float(hi)) - F.lit(float(lo))),
        6,
    )
    return pick.select("q", "bin", est.alias("est"))


def fixed_binned_quantiles(
    df: DataFrame,
    col: str,
    lo: float,
    hi: float,
    qs: tuple[float, ...] = (0.25, 0.5, 0.75, 0.9, 0.99),
    n_bins: int = 128,
    sketch: DataFrame | None = None,
) -> DataFrame:
    """One-shot quantile estimates over caller-pinned bin edges —
    ``(q, bin, est)``, error bounded by one bin width PLUS whatever
    mass clamps into the edge bins (pick bounds from domain knowledge
    or a prior ``exact_quantiles`` sample; grade with the audit
    discipline). Pass a pre-merged ``sketch`` (bin, n_rows) to answer
    without touching raw data — this is what ``read_quantile_bins``
    does."""
    if sketch is None:
        vals = df.select(F.col(col).cast("double").alias("__v")).where(
            F.col("__v").isNotNull()
        )
        sketch = (
            vals.select(
                fixed_bin(F.col("__v"), lo, hi, n_bins).alias("bin")
            )
            .groupBy("bin")
            .agg(F.count(F.lit(1)).cast("long").alias("n_rows"))
        )
    return _fixed_pick(sketch, lo, hi, qs, n_bins)


def fixed_binned_quantiles_sql(
    items_sql: str,
    expr: str,
    lo: float,
    hi: float,
    qs: tuple[float, ...] = (0.25, 0.5, 0.75, 0.9, 0.99),
    n_bins: int = 128,
) -> str:
    """DuckDB twin of ``fixed_binned_quantiles`` — identical fixed-edge
    binning, cumulative count, pick and rounded upper-edge estimate."""
    qlist = ", ".join(f"CAST({q} AS DOUBLE)" for q in qs)
    nb = f"CAST({n_bins} AS DOUBLE)"
    lo_l = f"CAST({float(lo)} AS DOUBLE)"
    hi_l = f"CAST({float(hi)} AS DOUBLE)"
    return f"""
WITH __vals AS (
  SELECT CAST({expr} AS DOUBLE) AS v FROM ({items_sql})
  WHERE {expr} IS NOT NULL
),
__h AS (
  SELECT {fixed_bin_sql('v', lo, hi, n_bins)} AS bin,
         CAST(count(*) AS BIGINT) AS n_rows
  FROM __vals GROUP BY 1
),
__c AS (
  SELECT a.bin, sum(b.n_rows) AS cum
  FROM __h a JOIN __h b ON b.bin <= a.bin
  GROUP BY a.bin
),
__n AS (SELECT sum(n_rows) AS n FROM __h),
__q AS (SELECT unnest([{qlist}]) AS q),
__pick AS (
  SELECT q, min(bin) AS bin
  FROM __q, __c, __n
  WHERE CAST(cum AS DOUBLE) >= q * CAST(n AS DOUBLE)
  GROUP BY q
)
SELECT q, bin,
       round({lo_l} + ((bin + 1) / {nb}) * ({hi_l} - {lo_l}), 6) AS est
FROM __pick
"""


def update_quantile_bins(
    items: DataFrame,
    col: str,
    index_path: str,
    lo: float,
    hi: float,
    batch_id: int = 0,
    n_bins: int = 128,
) -> None:
    """Fold one batch's fixed-edge histogram into the persisted store —
    additive cells like the CMS (each batch contributes <= n_bins
    ``(bin, n_rows)`` rows), batch_id-keyed dynamic-partition
    overwrite: a replayed batch rewrites its own partition with
    identical counts, so crash/duplicate delivery converges (the
    ingest-store discipline). The (lo, hi, n_bins) config must be held
    constant across the store's life — it defines the cell space, as
    width/depth do for the CMS."""
    vals = items.select(F.col(col).cast("double").alias("__v")).where(
        F.col("__v").isNotNull()
    )
    (
        vals.select(fixed_bin(F.col("__v"), lo, hi, n_bins).alias("bin"))
        .groupBy("bin")
        .agg(F.count(F.lit(1)).cast("long").alias("n_rows"))
        .withColumn("batch_id", F.lit(int(batch_id)))
        .write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy("batch_id")
        .parquet(index_path)
    )


def read_quantile_bins(
    spark: SparkSession,
    index_path: str,
    lo: float,
    hi: float,
    qs: tuple[float, ...] = (0.25, 0.5, 0.75, 0.9, 0.99),
    n_bins: int = 128,
) -> DataFrame:
    """Quantiles of everything ever folded, WITHOUT rescanning any
    batch: sum the additive cells by bin (<= batches x n_bins rows
    read, <= n_bins after the fold) and pick — EQUALS the one-shot
    ``fixed_binned_quantiles`` over the concatenated batches
    bit-for-bit (integer cells, identical pick expression). A store
    whose every fold was empty/all-NULL holds no files; reads answer
    zero rows rather than failing (the try_read_parquet discipline —
    matching the one-shot over an empty relation)."""
    from nosql_to_sql_migration_tool_spark.hadoop_fs import try_read_parquet

    parts = try_read_parquet(spark, index_path)
    if parts is None:
        parts = spark.createDataFrame(
            [], "bin bigint, n_rows bigint, batch_id bigint"
        )
    merged = parts.groupBy("bin").agg(
        F.sum("n_rows").cast("long").alias("n_rows")
    )
    return _fixed_pick(merged, lo, hi, qs, n_bins)


def compact_quantile_bins(
    spark: SparkSession,
    index_path: str,
    max_safe_batch_id: int | None = None,
) -> None:
    """Fold committed batches' cells into the reserved ``batch_id=-1``
    partition, bounding the store at <= n_bins rows (+ preserved
    unsafe batches) — additive cells sum associatively, so the fold is
    exact; same crash-window gate as the LC/CMS compactions."""
    _compact_binned_store(spark, index_path, ["bin"], max_safe_batch_id)


def _compact_binned_store(
    spark: SparkSession,
    index_path: str,
    key_cols: list[str],
    max_safe_batch_id: int | None,
) -> None:
    """Shared gate/fold/rewrite for the additive-cell quantile stores
    (scalar and grouped), parameterized by the cell key. The LC/CMS
    compactors (``compact_lc_index`` / ``compact_cms_partials``)
    predate this helper and keep their own copies — folding them in
    would shift registered plan fingerprints for a pure refactor;
    queued for a registration round that already re-verifies them."""
    from nosql_to_sql_migration_tool_spark.hadoop_fs import try_read_parquet

    parts = try_read_parquet(spark, index_path)
    if parts is None:
        return
    if max_safe_batch_id is not None:
        safe_pred = (F.col("batch_id") == -1) | (
            F.col("batch_id") <= int(max_safe_batch_id)
        )
    else:
        safe_pred = F.lit(True)
    folded = (
        parts.filter(safe_pred)
        .groupBy(*key_cols)
        .agg(F.sum("n_rows").cast("long").alias("n_rows"))
        .withColumn("batch_id", F.lit(-1))
        .unionByName(parts.filter(~safe_pred))
        .localCheckpoint(eager=True)
    )
    (
        folded.write.mode("overwrite")
        .option("partitionOverwriteMode", "static")
        .partitionBy("batch_id")
        .parquet(index_path)
    )


def _fixed_pick_by(h: DataFrame, lo: float, hi: float, qs, n_bins: int):
    """Per-group ``(grp, q, bin, est)`` from a fixed-edge grouped
    histogram ``(grp, bin, n_rows)`` — cumulative count via a window
    PARTITIONED BY GROUP over <= n_bins rows per partition (the
    binned_quantiles_by shape; never a global window)."""
    from pyspark.sql import Window

    w = (
        Window.partitionBy("grp")
        .orderBy("bin")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = h.select("grp", "bin", F.sum("n_rows").over(w).alias("__cum"))
    totals = h.groupBy("grp").agg(F.sum("n_rows").alias("__n"))
    qrows = F.explode(
        F.array(*[F.lit(float(q)) for q in qs])
    ).alias("q")
    pick = (
        cum.join(totals, "grp")
        .select("grp", "bin", "__cum", "__n", qrows)
        .filter(
            F.col("__cum").cast("double")
            >= F.col("q") * F.col("__n").cast("double")
        )
        .groupBy("grp", "q")
        .agg(F.min("bin").alias("bin"))
    )
    est = F.round(
        F.lit(float(lo))
        + ((F.col("bin") + F.lit(1)) / F.lit(float(n_bins)))
        * (F.lit(float(hi)) - F.lit(float(lo))),
        6,
    )
    return pick.select("grp", "q", "bin", est.alias("est"))


def fixed_binned_quantiles_by(
    df: DataFrame,
    group_col: str,
    col: str,
    lo: float,
    hi: float,
    qs: tuple[float, ...] = (0.25, 0.5, 0.75, 0.9, 0.99),
    n_bins: int = 128,
    sketch: DataFrame | None = None,
) -> DataFrame:
    """GROUPED quantile estimates over caller-pinned edges — the
    grouped member of the fixed-bound family, completing the
    scalar -> grouped progression exactly as ``binned_quantiles`` ->
    ``binned_quantiles_by`` (and sharing its scale shape: the shuffle
    carries at most groups x n_bins cell rows, the cumulative window is
    per-group). One (lo, hi) applies to every group — the mergeable
    trade; pass per-domain stores when groups need different ranges.
    Pass a pre-merged ``sketch`` (grp, bin, n_rows) to answer from a
    store without touching raw data."""
    if sketch is None:
        vals = df.select(
            F.col(group_col).alias("grp"),
            F.col(col).cast("double").alias("__v"),
        ).where(F.col("__v").isNotNull())
        sketch = (
            vals.select(
                "grp", fixed_bin(F.col("__v"), lo, hi, n_bins).alias("bin")
            )
            .groupBy("grp", "bin")
            .agg(F.count(F.lit(1)).cast("long").alias("n_rows"))
        )
    out = _fixed_pick_by(sketch, lo, hi, qs, n_bins)
    return out.select(
        F.col("grp").alias(group_col), "q", "bin", "est"
    )


def fixed_binned_quantiles_by_sql(
    items_sql: str,
    group_expr: str,
    expr: str,
    lo: float,
    hi: float,
    qs: tuple[float, ...] = (0.25, 0.5, 0.75, 0.9, 0.99),
    n_bins: int = 128,
    out_col: str | None = None,
) -> str:
    """DuckDB twin of ``fixed_binned_quantiles_by`` (per-group window,
    identical fixed-edge binning and pick; ``out_col`` follows the
    linear_count_by_sql alias contract)."""
    if out_col is None:
        if not group_expr.replace("_", "").isalnum():
            raise ValueError(
                "fixed_binned_quantiles_by_sql: group_expr is not a "
                "plain column name; pass out_col explicitly"
            )
        out_col = group_expr
    qlist = ", ".join(f"CAST({q} AS DOUBLE)" for q in qs)
    nb = f"CAST({n_bins} AS DOUBLE)"
    lo_l = f"CAST({float(lo)} AS DOUBLE)"
    hi_l = f"CAST({float(hi)} AS DOUBLE)"
    return f"""
WITH __vals AS (
  SELECT {group_expr} AS grp, CAST({expr} AS DOUBLE) AS v
  FROM ({items_sql}) WHERE {expr} IS NOT NULL
),
__h AS (
  SELECT grp, {fixed_bin_sql('v', lo, hi, n_bins)} AS bin,
         CAST(count(*) AS BIGINT) AS n_rows
  FROM __vals GROUP BY 1, 2
),
__c AS (
  SELECT grp, bin, sum(n_rows) OVER (PARTITION BY grp ORDER BY bin
    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
  FROM __h
),
__n AS (SELECT grp, sum(n_rows) AS n FROM __h GROUP BY grp),
__q AS (SELECT unnest([{qlist}]) AS q),
__pick AS (
  SELECT c.grp, q, min(bin) AS bin
  FROM __q, __c c JOIN __n ON c.grp = __n.grp
  WHERE CAST(cum AS DOUBLE) >= q * CAST(n AS DOUBLE)
  GROUP BY c.grp, q
)
SELECT grp AS {out_col}, q, bin,
       round({lo_l} + ((bin + 1) / {nb}) * ({hi_l} - {lo_l}), 6) AS est
FROM __pick
"""


def update_quantile_bins_by(
    items: DataFrame,
    group_col: str,
    col: str,
    index_path: str,
    lo: float,
    hi: float,
    batch_id: int = 0,
    n_bins: int = 128,
) -> None:
    """Grouped sibling of ``update_quantile_bins``: fold one batch's
    per-group fixed-edge histogram into the store — additive
    ``(grp, bin, n_rows)`` cells, <= groups x n_bins rows per batch,
    batch_id-keyed dynamic-partition overwrite (replay-idempotent)."""
    vals = items.select(
        F.col(group_col).alias("grp"),
        F.col(col).cast("double").alias("__v"),
    ).where(F.col("__v").isNotNull())
    (
        vals.select(
            "grp", fixed_bin(F.col("__v"), lo, hi, n_bins).alias("bin")
        )
        .groupBy("grp", "bin")
        .agg(F.count(F.lit(1)).cast("long").alias("n_rows"))
        .withColumn("batch_id", F.lit(int(batch_id)))
        .write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy("batch_id")
        .parquet(index_path)
    )


def read_quantile_bins_by(
    spark: SparkSession,
    index_path: str,
    group_col: str,
    lo: float,
    hi: float,
    qs: tuple[float, ...] = (0.25, 0.5, 0.75, 0.9, 0.99),
    n_bins: int = 128,
) -> DataFrame:
    """Per-group quantiles of everything ever folded, without
    rescanning any batch — sums the additive cells by (group, bin) and
    picks; EQUALS the one-shot ``fixed_binned_quantiles_by`` over the
    concatenated batches bit-for-bit. A store whose every fold was
    empty/all-NULL holds no files; reads answer zero rows (with a
    string-typed group column, immaterial at zero rows) rather than
    failing."""
    from nosql_to_sql_migration_tool_spark.hadoop_fs import try_read_parquet

    parts = try_read_parquet(spark, index_path)
    if parts is None:
        parts = spark.createDataFrame(
            [], "grp string, bin bigint, n_rows bigint, batch_id bigint"
        )
    merged = parts.groupBy("grp", "bin").agg(
        F.sum("n_rows").cast("long").alias("n_rows")
    )
    out = _fixed_pick_by(merged, lo, hi, qs, n_bins)
    return out.select(
        F.col("grp").alias(group_col), "q", "bin", "est"
    )


def compact_quantile_bins_by(
    spark: SparkSession,
    index_path: str,
    max_safe_batch_id: int | None = None,
) -> None:
    """Fold committed batches' grouped cells into ``batch_id=-1``,
    bounding the store at <= groups x n_bins rows (+ preserved unsafe
    batches) — same crash-window gate as the scalar compaction."""
    _compact_binned_store(
        spark, index_path, ["grp", "bin"], max_safe_batch_id
    )


def kmv_difference(
    a: DataFrame, b: DataFrame, col: str, k: int = KMV_K
) -> DataFrame:
    """KMV set-DIFFERENCE estimation, completing the set algebra
    (union + intersection shipped r15; this is the theta-sketch
    a-not-b shape): from the two column sketches alone, estimate
    |A \\ B| without running the anti-join. ONE row ``(n_union_kept,
    rho_a_not_b, union_estimate, difference_estimate)``: K =
    bottom-k(sketch(A) ∪ sketch(B)) is the union's sketch;
    rho_a_not_b = |K ∩ sketch(A) \\ sketch(B)| is a Binomial(k,
    |A\\B|/|A∪B|) draw, so difference ≈ rho * union_est DIV k —
    integer math both engines replay bit-identically, and EXACT while
    the union holds < k distinct hashes (K is then the whole union,
    rho the true difference count). Estimating via rho keeps the
    numerator and denominator on ONE sketch draw — subtracting two
    independent estimates (|A| - |A∩B|) could go negative and carries
    both draws' error. Cost beyond the two input scans: <= k-row
    frames, every downstream join broadcasts."""
    sa = kmv_bottomk(a, col, k)
    sb = kmv_bottomk(b, col, k)
    union_k = kmv_merge(sa, sb, k)
    only_a = sa.join(sb, "h", "anti")
    marked = union_k.join(
        F.broadcast(only_a.withColumn("__onlya", F.lit(1))), "h", "left"
    )
    agg = marked.agg(
        F.count(F.lit(1)).cast("long").alias("n_union_kept"),
        F.max("h").alias("__kth"),
        F.sum(F.coalesce(F.col("__onlya"), F.lit(0)))
        .cast("long")
        .alias("rho_a_not_b"),
    )
    num = (int(k) - 1) * KMV_SPACE
    return agg.select(
        "n_union_kept",
        "rho_a_not_b",
        _kmv_estimate("n_union_kept", "__kth", int(k)).alias(
            "union_estimate"
        ),
        F.when(
            F.col("n_union_kept") < int(k), F.col("rho_a_not_b")
        )
        .otherwise(
            F.expr(
                f"(rho_a_not_b * ({num}L DIV greatest(__kth, 1L))) "
                f"DIV {int(k)}L"
            )
        )
        .cast("long")
        .alias("difference_estimate"),
    )


def kmv_difference_sql(
    a_sql: str, b_sql: str, expr: str, k: int = KMV_K
) -> str:
    """DuckDB twin of ``kmv_difference`` — identical sketches, cut,
    rho and integer estimators."""
    num = (int(k) - 1) * KMV_SPACE
    return f"""
WITH sa AS (
  SELECT DISTINCT {kmv_hash_sql(expr)} AS h FROM ({a_sql})
  ORDER BY h LIMIT {int(k)}
),
sb AS (
  SELECT DISTINCT {kmv_hash_sql(expr)} AS h FROM ({b_sql})
  ORDER BY h LIMIT {int(k)}
),
uk AS (
  SELECT DISTINCT h FROM (SELECT h FROM sa UNION ALL SELECT h FROM sb)
  ORDER BY h LIMIT {int(k)}
),
agg AS (
  SELECT CAST(count(*) AS BIGINT) AS n_union_kept,
         max(h) AS kth,
         CAST(sum(CASE WHEN h IN (SELECT h FROM sa)
                        AND h NOT IN (SELECT h FROM sb)
                   THEN 1 ELSE 0 END) AS BIGINT) AS rho_a_not_b
  FROM uk
)
SELECT n_union_kept, rho_a_not_b,
       CASE WHEN n_union_kept < {int(k)} THEN n_union_kept
            ELSE {num} // greatest(kth, 1) END AS union_estimate,
       CASE WHEN n_union_kept < {int(k)} THEN rho_a_not_b
            ELSE (rho_a_not_b * ({num} // greatest(kth, 1))) // {int(k)}
       END AS difference_estimate
FROM agg
"""
