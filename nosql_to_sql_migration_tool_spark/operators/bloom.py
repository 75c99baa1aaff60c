"""Deterministic Bloom-filter sketch — semi-join pruning for 100 TB
joins, DuckDB-replayable bit-for-bit.

The scale problem this solves: a semi-join ("keep probe rows whose key
exists in the build side") normally shuffles BOTH relations on the key.
When the build side is too big to broadcast as an exact set but its
MEMBERSHIP can tolerate one-sided error, a Bloom filter compresses it
to a fixed-size bitmap (``BLOOM_M`` bits — 16 KiB of BIGINT words at
the default) that ships to every executor: the probe side filters
map-side with ZERO shuffle, and only the surviving rows (true matches +
the measured false-positive sliver) pay the exact join. This is the
same plan shape Spark's own runtime bloom-join pushdown uses —
implemented here as an explicit, persistable, ENGINE-PORTABLE artifact
(Spark's ``BloomFilterAggregate`` bits are JVM-internal and cannot be
replayed by another engine, so they could never pass the repo's oracle
gate).

Determinism contract (the md5canon house convention): hash ``i`` of a
key is the first 8 hex chars of ``md5(key || '#' || i)`` as a BIGINT,
mod ``m`` — the same primitive as ``sketches.lc_bucket``/``cms_bucket``,
so the bit positions (and therefore every word of the bitmap) are a
pure function of the key SET. Words are 32-bit (stored in BIGINTs: a
set bit never reaches the sign bit, so no engine-specific overflow
semantics are in play) and fold with ``bit_or`` — order-free, hence
partitioning-independent. False positives are a MEASURED property, not
a hoped one: ``bloom_fp_audit`` recomputes the confusion counts against
the exact key set — the same audit discipline as the MinHash/LSH recall
rows.

Reference analogue: none (the migration tool compares row-by-row);
extends SURVEY §2C alongside the sketch family (CMS / linear counting).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

BLOOM_M = 65536  # bits -> 2048 32-bit words; ~0.5% fp at 5k keys, k=4
BLOOM_K = 4
_WORD = 32


def bloom_pos(key: Column, i: int, m: int = BLOOM_M) -> Column:
    """Bit position of hash ``i`` for a key (key cast to string — the
    md5canon convention, so BIGINT and VARCHAR keys agree)."""
    return (
        F.conv(
            F.substring(
                F.md5(F.concat_ws("#", key.cast("string"), F.lit(i))), 1, 8
            ),
            16,
            10,
        ).cast("long")
        % m
    )


def _bloom_pos_sql(expr: str, i: int, m: int) -> str:
    return (
        f"CAST(concat('0x', substr(md5(CAST({expr} AS VARCHAR) || '#' || "
        f"'{i}'), 1, 8)) AS BIGINT) % {m}"
    )


def _bit(p: Column) -> Column:
    """``1 << (p % 32)`` as a BIGINT (shift count is a column, so this
    goes through the SQL shiftleft, not the literal-only DSL one)."""
    return F.call_function(
        "shiftleft",
        F.lit(1).cast("long"),
        (p % _WORD).cast("int"),
    )


def bloom_build(
    df: DataFrame,
    col: str,
    m: int = BLOOM_M,
    k: int = BLOOM_K,
) -> DataFrame:
    """ONE row ``(bits: array<long>, n_keys, m_bits, k_hashes)`` — the
    persistable filter. Plan shape: k positions per key (map-side
    projection), distinct positions (combinable — at most m survive),
    a bit_or fold into at most m/32 word rows, and one metadata-sized
    array assembly. The shuffle never carries more than ``m`` rows
    regardless of build-side cardinality — that is the whole point;
    NULL keys are ignored (a Bloom filter answers set membership and
    NULL is not a member in either engine's semi-join semantics)."""
    keys = df.select(F.col(col).alias("__key")).where(
        F.col("__key").isNotNull()
    )
    pos = keys.select(
        F.explode(
            F.array(*[bloom_pos(F.col("__key"), i, m) for i in range(k)])
        ).alias("p")
    ).distinct()
    words = (
        pos.select(
            (F.col("p") / _WORD).cast("long").alias("w"),
            _bit(F.col("p")).alias("b"),
        )
        .groupBy("w")
        .agg(F.call_function("bit_or", F.col("b")).alias("v"))
    )
    n = keys.distinct().agg(F.count(F.lit(1)).cast("long").alias("n"))
    # Dense word array via a bounded left join (m/32 rows) — NOT a
    # per-element map lookup: Catalyst re-evaluates a map_from_entries
    # inside a transform lambda for EVERY element, which is O((m/32)^2)
    # and took minutes at m=2^22 (found by the r13 1000x probe). The
    # join touches each word exactly once, so sizing m up for a bigger
    # build side stays linear in m.
    spark = df.sparkSession
    idx = spark.range(m // _WORD).select(F.col("id").alias("w"))
    dense = idx.join(words, "w", "left").select(
        "w", F.coalesce("v", F.lit(0).cast("long")).alias("v")
    )
    return (
        dense.groupBy()
        .agg(F.array_sort(F.collect_list(F.struct("w", "v"))).alias("__a"))
        .crossJoin(F.broadcast(n))
        .select(
            F.transform(F.col("__a"), lambda s: s["v"]).alias("bits"),
            F.col("n").alias("n_keys"),
            F.lit(m).cast("long").alias("m_bits"),
            F.lit(k).cast("long").alias("k_hashes"),
        )
    )


def bloom_build_sql(
    items_sql: str, expr: str, m: int = BLOOM_M, k: int = BLOOM_K
) -> str:
    """DuckDB twin of ``bloom_build`` — bit-identical words."""
    poss = " UNION ALL ".join(
        f"SELECT {_bloom_pos_sql('key', i, m)} AS p FROM keys"
        for i in range(k)
    )
    return f"""
WITH items AS ({items_sql}),
keys AS (SELECT {expr} AS key FROM items WHERE {expr} IS NOT NULL),
pos AS (SELECT DISTINCT p FROM ({poss})),
words AS (
  SELECT p // {_WORD} AS w,
         bit_or(CAST(1 AS BIGINT) << CAST(p % {_WORD} AS INT)) AS v
  FROM pos GROUP BY 1
),
dense AS (SELECT unnest(range({m // _WORD})) AS w),
n AS (SELECT CAST(count(DISTINCT key) AS BIGINT) AS n_keys FROM keys)
SELECT (SELECT list(coalesce(v, 0) ORDER BY d.w)
        FROM dense d LEFT JOIN words USING (w)) AS bits,
       n.n_keys,
       CAST({m} AS BIGINT) AS m_bits,
       CAST({k} AS BIGINT) AS k_hashes
FROM n
"""


def bloom_might_contain(
    key: Column,
    m: int = BLOOM_M,
    k: int = BLOOM_K,
    bits_col: str = "bits",
) -> Column:
    """All-k-bits-set predicate against an in-scope ``bits_col`` array
    column (attach the one-row filter with a broadcast crossJoin, as
    ``bloom_probe`` does). NULL keys probe as false."""
    out = None
    for i in range(k):
        p = bloom_pos(key, i, m)
        word = F.element_at(F.col(bits_col), (p / _WORD).cast("int") + 1)
        check = word.bitwiseAND(_bit(p)) != 0
        out = check if out is None else (out & check)
    return F.when(key.isNull(), F.lit(False)).otherwise(out)


def _might_contain_sql(
    expr: str, bits: str, m: int = BLOOM_M, k: int = BLOOM_K
) -> str:
    checks = " AND ".join(
        f"(({bits}[CAST(({_bloom_pos_sql(expr, i, m)}) // {_WORD} AS INT)"
        f" + 1] & (CAST(1 AS BIGINT) << "
        f"CAST(({_bloom_pos_sql(expr, i, m)}) % {_WORD} AS INT))) <> 0)"
        for i in range(k)
    )
    return f"CASE WHEN {expr} IS NULL THEN false ELSE ({checks}) END"


def bloom_probe(
    probe: DataFrame,
    bloom_row: DataFrame,
    col: str,
    m: int = BLOOM_M,
    k: int = BLOOM_K,
    flag_col: str = "might_contain",
) -> DataFrame:
    """Probe rows + the membership flag — a pure map-side projection
    against the broadcast one-row bitmap (no shuffle at any probe-side
    cardinality). The bitmap rides in under a reserved name so a probe
    relation that itself has a ``bits`` column can't collide."""
    return probe.crossJoin(
        F.broadcast(bloom_row.select(F.col("bits").alias("__bloom_bits")))
    ).select(
        *probe.columns,
        bloom_might_contain(F.col(col), m, k, "__bloom_bits").alias(
            flag_col
        ),
    )


def bloom_prune(
    probe: DataFrame,
    bloom_row: DataFrame,
    col: str,
    m: int = BLOOM_M,
    k: int = BLOOM_K,
) -> DataFrame:
    """The semi-join pruning shape: only might-contain survivors flow
    on to the exact join — Bloom guarantees NO false negatives, so
    ``exact_semi(bloom_prune(probe)) == exact_semi(probe)`` (pinned by
    pytest) while the pruned exact join reads a sliver of the probe
    side."""
    flagged = bloom_probe(probe, bloom_row, col, m, k, "__mc")
    return flagged.where(F.col("__mc")).select(*probe.columns)


def bloom_fp_audit(
    probe: DataFrame,
    build_keys: DataFrame,
    col: str,
    build_col: str,
    m: int = BLOOM_M,
    k: int = BLOOM_K,
    bloom_row: DataFrame | None = None,
) -> DataFrame:
    """ONE row of measured filter quality against the exact key set:
    ``(n_probe, n_flagged, n_members, n_false_pos, n_false_neg,
    fp_rate)``. ``n_false_neg`` MUST be 0 (the Bloom guarantee — a
    nonzero value would mean a broken hash contract); fp_rate =
    round(fp / non-members, 6), NULL when every probe row is a member.
    Pass a persisted ``bloom_row`` to audit the production artifact; it
    derives inline when omitted. Cost: the probe projection + one
    broadcast-able distinct key join + one global fold."""
    if bloom_row is None:
        bloom_row = bloom_build(build_keys, build_col, m, k)
    members = build_keys.select(
        F.col(build_col).cast("string").alias("__bk")
    ).where(F.col("__bk").isNotNull()).distinct()
    flagged = bloom_probe(probe, bloom_row, col, m, k, "__mc").select(
        F.col(col).cast("string").alias("__pk"), "__mc"
    )
    joined = flagged.join(
        members, flagged["__pk"] == members["__bk"], "left"
    ).select(
        "__mc", F.col("__bk").isNotNull().alias("__member")
    )
    agg = joined.agg(
        F.count(F.lit(1)).cast("long").alias("n_probe"),
        F.sum(F.col("__mc").cast("long")).cast("long").alias("n_flagged"),
        F.sum(F.col("__member").cast("long")).cast("long").alias(
            "n_members"
        ),
        F.sum((F.col("__mc") & ~F.col("__member")).cast("long"))
        .cast("long")
        .alias("n_false_pos"),
        F.sum((~F.col("__mc") & F.col("__member")).cast("long"))
        .cast("long")
        .alias("n_false_neg"),
    )
    non_members = F.col("n_probe") - F.col("n_members")
    return agg.select(
        "n_probe",
        "n_flagged",
        "n_members",
        "n_false_pos",
        "n_false_neg",
        F.when(
            non_members > 0,
            F.round(
                F.col("n_false_pos").cast("double")
                / non_members.cast("double"),
                6,
            ),
        ).alias("fp_rate"),
    )


def bloom_fp_audit_sql(
    probe_sql: str,
    build_sql: str,
    probe_expr: str,
    build_expr: str,
    m: int = BLOOM_M,
    k: int = BLOOM_K,
) -> str:
    """DuckDB twin of ``bloom_fp_audit`` (inline-build form): the full
    build -> probe -> confusion replay."""
    return f"""
WITH bloom AS ({bloom_build_sql(build_sql, build_expr, m, k)}),
probe AS ({probe_sql}),
members AS (
  SELECT DISTINCT CAST({build_expr} AS VARCHAR) AS bk
  FROM ({build_sql}) WHERE {build_expr} IS NOT NULL
),
flagged AS (
  SELECT CAST({probe_expr} AS VARCHAR) AS pk,
         {_might_contain_sql(probe_expr, 'bloom.bits', m, k)} AS mc
  FROM probe, bloom
),
joined AS (
  SELECT f.mc, m.bk IS NOT NULL AS member
  FROM flagged f LEFT JOIN members m ON f.pk = m.bk
),
agg AS (
  SELECT CAST(count(*) AS BIGINT) AS n_probe,
         CAST(sum(CASE WHEN mc THEN 1 ELSE 0 END) AS BIGINT) AS n_flagged,
         CAST(sum(CASE WHEN member THEN 1 ELSE 0 END) AS BIGINT)
           AS n_members,
         CAST(sum(CASE WHEN mc AND NOT member THEN 1 ELSE 0 END)
              AS BIGINT) AS n_false_pos,
         CAST(sum(CASE WHEN NOT mc AND member THEN 1 ELSE 0 END)
              AS BIGINT) AS n_false_neg
  FROM joined
)
SELECT n_probe, n_flagged, n_members, n_false_pos, n_false_neg,
       CASE WHEN n_probe - n_members > 0
            THEN round(CAST(n_false_pos AS DOUBLE)
                       / CAST(n_probe - n_members AS DOUBLE), 6)
       END AS fp_rate
FROM agg
"""
