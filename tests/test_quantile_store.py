"""Fixed-bound binned quantiles + the batch-maintained store (round
15): the mergeable member of the quantile family. Covered: clamp/edge
binning semantics, cross-engine parity of the one-shot form, the
store's read-equals-one-shot contract (with a replayed batch — the
replay-idempotence discipline), compaction (all-safe and crash-window
gated), and the one-bin-width error bound against exact truth."""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import functions as F

from nosql_to_sql_migration_tool_spark.operators.sketches import (
    compact_quantile_bins,
    exact_quantiles,
    fixed_bin,
    fixed_binned_quantiles,
    fixed_binned_quantiles_sql,
    read_quantile_bins,
    update_quantile_bins,
)
from nosql_to_sql_migration_tool_spark.sources.registry import load_table
from tests.conftest import SF_DIR_SMOKE

LO, HI, NB = 0.0, 600_000.0, 128
QS = (0.25, 0.5, 0.75, 0.9, 0.99)


def test_fixed_bin_clamp_and_edge_semantics(spark):
    """At-or-below lo -> bin 0; at-or-above hi -> last bin; interior
    values floor into [0, n_bins-1]; the hi-epsilon value stays in the
    last interior bin (no off-by-one at the top edge)."""
    df = spark.createDataFrame(
        [(-5.0,), (0.0,), (0.9,), (5.0,), (9.999,), (10.0,), (99.0,)],
        ["v"],
    )
    got = [
        r["b"]
        for r in df.select(
            fixed_bin(F.col("v"), 0.0, 10.0, 10).alias("b")
        ).collect()
    ]
    assert got == [0, 0, 0, 5, 9, 9, 9]
    with pytest.raises(ValueError, match="hi must be > lo"):
        fixed_bin(F.col("v"), 1.0, 1.0, 10)


def test_fixed_binned_quantiles_cross_engine_parity(spark):
    mine = sorted(
        map(
            tuple,
            fixed_binned_quantiles(
                load_table(spark, SF_DIR_SMOKE, "orders"),
                "o_totalprice",
                LO,
                HI,
                QS,
                NB,
            ).collect(),
        )
    )
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW orders AS SELECT * FROM "
        f"'{SF_DIR_SMOKE}/orders.parquet'"
    )
    want = sorted(
        tuple(r)
        for r in con.execute(
            fixed_binned_quantiles_sql(
                "SELECT * FROM orders", "o_totalprice", LO, HI, QS, NB
            )
        ).fetchall()
    )
    con.close()
    assert mine == want and len(mine) == len(QS)


def test_store_read_equals_one_shot_with_replay(spark, tmp_path):
    """Three key-split batches folded in, then batch 1 REPLAYED: the
    store read must equal the one-shot sketch over the whole relation
    bit-for-bit (additive cells; the replay rewrites its own partition
    with identical counts)."""
    path = str(tmp_path / "qbins")
    orders = load_table(spark, SF_DIR_SMOKE, "orders")
    for i in (0, 1, 2, 1):  # final 1 is the replay
        update_quantile_bins(
            orders.filter(F.col("o_orderkey") % 3 == i),
            "o_totalprice",
            path,
            LO,
            HI,
            batch_id=i,
            n_bins=NB,
        )
    got = sorted(
        map(tuple, read_quantile_bins(spark, path, LO, HI, QS, NB).collect())
    )
    want = sorted(
        map(
            tuple,
            fixed_binned_quantiles(
                orders, "o_totalprice", LO, HI, QS, NB
            ).collect(),
        )
    )
    assert got == want and len(got) == len(QS)


def test_compaction_bounds_store_and_preserves_reads(spark, tmp_path):
    path = str(tmp_path / "qbins")
    orders = load_table(spark, SF_DIR_SMOKE, "orders")
    for i in (0, 1, 2):
        update_quantile_bins(
            orders.filter(F.col("o_orderkey") % 3 == i),
            "o_totalprice",
            path,
            LO,
            HI,
            batch_id=i,
            n_bins=NB,
        )
    before = sorted(
        map(tuple, read_quantile_bins(spark, path, LO, HI, QS, NB).collect())
    )
    # crash-window gate: batch 2 not yet safe -> its partition survives
    compact_quantile_bins(spark, path, max_safe_batch_id=1)
    parts = spark.read.parquet(path)
    assert sorted(
        r["batch_id"] for r in parts.select("batch_id").distinct().collect()
    ) == [-1, 2]
    assert before == sorted(
        map(tuple, read_quantile_bins(spark, path, LO, HI, QS, NB).collect())
    )
    # full compaction bounds the store at <= n_bins rows
    compact_quantile_bins(spark, path)
    assert spark.read.parquet(path).count() <= NB
    assert before == sorted(
        map(tuple, read_quantile_bins(spark, path, LO, HI, QS, NB).collect())
    )


def test_estimates_within_one_bin_width_of_exact(spark):
    """With bounds covering the data range (no clamped mass), every
    estimate sits within one bin width above the exact quantile — the
    family's documented error contract."""
    orders = load_table(spark, SF_DIR_SMOKE, "orders")
    est = {
        r["q"]: r["est"]
        for r in fixed_binned_quantiles(
            orders, "o_totalprice", LO, HI, QS, NB
        ).collect()
    }
    exact = {
        r["q"]: r["exact"]
        for r in exact_quantiles(orders, "o_totalprice", QS).collect()
    }
    width = (HI - LO) / NB
    for q in QS:
        assert exact[q] <= est[q] <= exact[q] + width, (q, exact[q], est[q])


def test_grouped_fixed_quantiles_cross_engine_parity(spark):
    from nosql_to_sql_migration_tool_spark.operators.sketches import (
        fixed_binned_quantiles_by,
        fixed_binned_quantiles_by_sql,
    )

    mine = sorted(
        map(
            tuple,
            fixed_binned_quantiles_by(
                load_table(spark, SF_DIR_SMOKE, "orders"),
                "o_orderpriority",
                "o_totalprice",
                LO,
                HI,
                QS,
                NB,
            ).collect(),
        )
    )
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW orders AS SELECT * FROM "
        f"'{SF_DIR_SMOKE}/orders.parquet'"
    )
    want = sorted(
        tuple(r)
        for r in con.execute(
            fixed_binned_quantiles_by_sql(
                "SELECT * FROM orders",
                "o_orderpriority",
                "o_totalprice",
                LO,
                HI,
                QS,
                NB,
            )
        ).fetchall()
    )
    con.close()
    assert mine == want
    n_groups = len({g for g, _, _, _ in mine})
    assert n_groups == 5 and len(mine) == n_groups * len(QS)


def test_grouped_store_read_equals_one_shot_and_compacts(spark, tmp_path):
    from nosql_to_sql_migration_tool_spark.operators.sketches import (
        compact_quantile_bins_by,
        fixed_binned_quantiles_by,
        read_quantile_bins_by,
        update_quantile_bins_by,
    )

    path = str(tmp_path / "qbins_by")
    orders = load_table(spark, SF_DIR_SMOKE, "orders")
    for i in (0, 1, 2, 0):  # final 0 is the replay
        update_quantile_bins_by(
            orders.filter(F.col("o_orderkey") % 3 == i),
            "o_orderpriority",
            "o_totalprice",
            path,
            LO,
            HI,
            batch_id=i,
            n_bins=NB,
        )
    want = sorted(
        map(
            tuple,
            fixed_binned_quantiles_by(
                orders, "o_orderpriority", "o_totalprice", LO, HI, QS, NB
            ).collect(),
        )
    )
    got = sorted(
        map(
            tuple,
            read_quantile_bins_by(
                spark, path, "o_orderpriority", LO, HI, QS, NB
            ).collect(),
        )
    )
    assert got == want and len(got) > 0
    compact_quantile_bins_by(spark, path)
    assert spark.read.parquet(path).count() <= 5 * NB
    assert want == sorted(
        map(
            tuple,
            read_quantile_bins_by(
                spark, path, "o_orderpriority", LO, HI, QS, NB
            ).collect(),
        )
    )


def test_quantile_plan_shapes_no_cartesian_flagged_no_global_window(spark):
    """Plan-gate detectors for the queued quantile family: the scalar
    pick's <= n_bins broadcast triangular join must not register as an
    unbroadcast cartesian, and the grouped form must keep its window
    partitioned (never global)."""
    from nosql_to_sql_migration_tool_spark.operators.sketches import (
        fixed_binned_quantiles_by,
    )
    from nosql_to_sql_migration_tool_spark.plans.audit import (
        physical_plan,
        plan_report_from_string,
    )

    orders = load_table(spark, SF_DIR_SMOKE, "orders")
    scalar = fixed_binned_quantiles(orders, "o_totalprice", LO, HI, QS, NB)
    grouped = fixed_binned_quantiles_by(
        orders, "o_orderpriority", "o_totalprice", LO, HI, QS, NB
    )
    for df in (scalar, grouped):
        rep = plan_report_from_string(physical_plan(df))
        assert rep["cartesian_products"] == 0, rep
        assert rep["global_windows"] == 0, rep
        assert rep["python_stages"] == 0, rep


def test_all_null_first_fold_leaves_store_readable(spark, tmp_path):
    """Review r15: a first fold whose column is entirely NULL writes no
    parquet files; reads must answer zero rows (matching the one-shot
    over an empty relation), and a later real fold recovers the store.
    Covers scalar and grouped reads."""
    from nosql_to_sql_migration_tool_spark.operators.sketches import (
        fixed_binned_quantiles_by,
        read_quantile_bins_by,
        update_quantile_bins_by,
    )

    path = str(tmp_path / "qb")
    nulls = spark.createDataFrame(
        [(1, None), (2, None)], "k int, v double"
    )
    update_quantile_bins(nulls, "v", path, LO, HI, batch_id=0, n_bins=NB)
    assert read_quantile_bins(spark, path, LO, HI, QS, NB).count() == 0
    orders = load_table(spark, SF_DIR_SMOKE, "orders")
    update_quantile_bins(
        orders, "o_totalprice", path, LO, HI, batch_id=1, n_bins=NB
    )
    assert sorted(
        map(tuple, read_quantile_bins(spark, path, LO, HI, QS, NB).collect())
    ) == sorted(
        map(
            tuple,
            fixed_binned_quantiles(
                orders, "o_totalprice", LO, HI, QS, NB
            ).collect(),
        )
    )
    # grouped twin: same empty-store contract
    gpath = str(tmp_path / "qbg")
    update_quantile_bins_by(
        nulls, "k", "v", gpath, LO, HI, batch_id=0, n_bins=NB
    )
    assert (
        read_quantile_bins_by(spark, gpath, "k", LO, HI, QS, NB).count()
        == 0
    )
    update_quantile_bins_by(
        orders, "o_orderpriority", "o_totalprice", gpath, LO, HI,
        batch_id=1, n_bins=NB,
    )
    assert sorted(
        map(
            tuple,
            read_quantile_bins_by(
                spark, gpath, "o_orderpriority", LO, HI, QS, NB
            ).collect(),
        )
    ) == sorted(
        map(
            tuple,
            fixed_binned_quantiles_by(
                orders, "o_orderpriority", "o_totalprice", LO, HI, QS, NB
            ).collect(),
        )
    )
