"""Cursor pagination must be a lossless linear scan: chaining
scan_after pages reconstructs the entire key space exactly once, in
order — the property that makes it the correct replacement for the
reference's O(n²) skip-scan extraction loop."""

from __future__ import annotations

from nosql_to_sql_migration_tool_spark.operators.relational import (
    paginate,
    scan_after,
)
from nosql_to_sql_migration_tool_spark.sources.registry import load_table
from tests.conftest import SF_DIR_SMOKE


def test_scan_after_pages_reconstruct_full_table(spark):
    orders = load_table(spark, SF_DIR_SMOKE, "orders")
    expected = [
        r["o_orderkey"]
        for r in orders.select("o_orderkey")
        .orderBy("o_orderkey")
        .collect()
    ]
    got, cursor, page_size = [], -1, 400
    while True:
        page = [
            r["o_orderkey"]
            for r in scan_after(
                orders, "o_orderkey", cursor, page_size
            ).collect()
        ]
        if not page:
            break
        assert page == sorted(page), "each page arrives key-ordered"
        got.extend(page)
        cursor = page[-1]
    assert got == expected  # no loss, no duplicates, global order


def test_scan_after_agrees_with_offset_paging(spark):
    """The cursor page starting after the k-th key equals the offset
    page skipping k rows (same order key, unique keys)."""
    orders = load_table(spark, SF_DIR_SMOKE, "orders")
    keys = [
        r["o_orderkey"]
        for r in orders.select("o_orderkey")
        .orderBy("o_orderkey")
        .limit(201)
        .collect()
    ]
    via_offset = paginate(orders, "o_orderkey", 200, 50).collect()
    via_cursor = scan_after(orders, "o_orderkey", keys[199], 50).collect()
    assert [r["o_orderkey"] for r in via_cursor] == [
        r["o_orderkey"] for r in via_offset
    ]
