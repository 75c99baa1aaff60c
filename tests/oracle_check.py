"""Local re-implementation of the driver's Spark-vs-DuckDB comparison:
row count, column names, and order-insensitive stringified values.
Used by tests so oracle drift is caught before the driver runs."""

from __future__ import annotations

import math
from datetime import datetime


def _canon(v) -> str:
    if v is None:
        return "<NULL>"
    if isinstance(v, float):  # incl. numpy float64 — checked BEFORE pd.isna
        if math.isnan(v):
            # NaN is NOT canonicalized to <NULL>: an engine returning NaN
            # where the other returns NULL must fail the check
            return "NaN"
        # round to absorb cross-engine ULP noise in float aggregates;
        # queries should already round/cast explicitly where it matters
        return f"{v:.6f}"
    try:  # pandas NaT scalars (e.g. unmatched LEFT-join timestamps)
        import pandas as pd

        if pd.isna(v):
            return "<NULL>"
    except (TypeError, ValueError):
        pass
    if isinstance(v, datetime):
        return v.strftime("%Y-%m-%d %H:%M:%S.%f")
    return str(v)


def rows_canon(df_pandas) -> list[tuple[str, ...]]:
    cols = sorted(df_pandas.columns)
    out = []
    for _, row in df_pandas[cols].iterrows():
        out.append(tuple(_canon(v) for v in row))
    return sorted(out)


def compare(spark_df, duck_rel) -> list[str]:
    """Return a list of mismatch descriptions (empty = parity)."""
    problems: list[str] = []
    sp = spark_df.toPandas()
    dk = duck_rel.df()
    if len(sp) != len(dk):
        problems.append(f"row count: spark={len(sp)} duckdb={len(dk)}")
    sp_cols, dk_cols = sorted(sp.columns), sorted(dk.columns)
    if sp_cols != dk_cols:
        problems.append(f"columns: spark={sp_cols} duckdb={dk_cols}")
        return problems
    a, b = rows_canon(sp), rows_canon(dk)
    if a != b:
        diffs = [(x, y) for x, y in zip(a, b) if x != y][:5]
        extra_a = [x for x in a if x not in b][:3]
        extra_b = [y for y in b if y not in a][:3]
        problems.append(
            f"values differ; first pair diffs={diffs} "
            f"spark-only={extra_a} duck-only={extra_b}"
        )
    return problems
