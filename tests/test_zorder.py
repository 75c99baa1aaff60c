"""Morton/Z-order key: golden bit interleave, and the data-skipping
claim made measurable — chunks of a Morton-sorted grid have bounding
boxes that a band predicate on EITHER dimension mostly skips."""

from __future__ import annotations

from pyspark.sql import functions as F

from nosql_to_sql_migration_tool_spark.functions.zorder import morton_key


def test_morton_golden_interleave(spark):
    cases = [
        (0, 0, 0),
        (1, 0, 1),
        (0, 1, 2),
        (1, 1, 3),
        (5, 3, 27),     # 101 ⨉ 011 -> 011011
        (7, 7, 63),
        # all-ones a, zero b -> a's bits occupy every even position
        (2**16 - 1, 0, sum(1 << (2 * i) for i in range(16))),
    ]
    df = spark.createDataFrame(
        [(a, b, want) for a, b, want in cases], "a long, b long, want long"
    )
    rows = df.select(
        morton_key(F.col("a"), F.col("b")).alias("got"), "want"
    ).collect()
    for r in rows:
        assert r["got"] == r["want"], r


def test_morton_chunks_skip_band_predicates(spark):
    """32x32 grid, 16 chunks of 64 consecutive keys. Row-major chunks
    each span the full b-range, so a b-band predicate intersects ALL of
    them; Morton chunks are 8x8 boxes, so the same band touches only a
    quarter. This inequality IS the file-skipping win."""
    grid = [(a, b) for a in range(32) for b in range(32)]
    df = spark.createDataFrame(grid, "a long, b long")
    keyed = df.select(
        "a", "b", morton_key(F.col("a"), F.col("b"), bits=5).alias("z"),
        (F.col("a") * 32 + F.col("b")).alias("rowmajor"),
    ).collect()

    def chunks(rows, key):
        s = sorted(rows, key=lambda r: r[key])
        return [s[i : i + 64] for i in range(0, len(s), 64)]

    def touched(chs, lo, hi):  # chunks whose b-bbox intersects [lo, hi]
        return sum(
            1
            for c in chs
            if not (max(r["b"] for r in c) < lo or min(r["b"] for r in c) > hi)
        )

    z_chunks = chunks(keyed, "z")
    rm_chunks = chunks(keyed, "rowmajor")
    for lo in (0, 8, 16, 24):
        band = touched(z_chunks, lo, lo + 7)
        full = touched(rm_chunks, lo, lo + 7)
        assert band == 4, (lo, band)       # 8x8 boxes: exactly a quarter
        assert full == 16, (lo, full)      # row-major: every chunk
    # and a-band predicates skip equally well under Morton
    for lo in (0, 8, 16, 24):
        a_band = sum(
            1
            for c in z_chunks
            if not (
                max(r["a"] for r in c) < lo or min(r["a"] for r in c) > lo + 7
            )
        )
        assert a_band == 4, (lo, a_band)
