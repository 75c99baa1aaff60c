"""Canonical value normalization — the shared contract between row
hashing (CDC), validation comparison, and the DuckDB oracle.

Reproduces the *intended* semantics of the reference's
``Normalize-ValueForComparison`` (private/Migration_Validation.ps1:326-363)
and the stringification inside ``Get-DocumentHash``
(private/Sync.ps1:362-379):

- null        -> ""            (reference: null→"" before compare/hash)
- boolean     -> "1" / "0"     (reference: bool→"1"/"0" for MySQL parity)
- timestamp   -> "yyyy-MM-dd HH:mm:ss"
- date        -> "yyyy-MM-dd"
- float/double-> fixed-scale decimal string (6 dp) so Spark and DuckDB
                 produce byte-identical text (Spark's plain double→string
                 uses scientific notation where DuckDB does not — pinning
                 the scale removes the divergence; SURVEY.md §7.2 item 1)
- integral    -> decimal string
- string      -> trimmed
- other       -> CAST(.. AS STRING), trimmed

Both a Spark ``Column`` builder and a DuckDB SQL-text builder live here so
the two engines can never drift apart silently; ``tests/test_hashing.py``
pins them against each other.
"""

from __future__ import annotations

from pyspark.sql import Column, functions as F, types as T

TS_FMT = "yyyy-MM-dd HH:mm:ss"
TS_FMT_DUCK = "%Y-%m-%d %H:%M:%S"
FLOAT_SCALE = 6
FLOAT_PRECISION = 30


def normalize_for_comparison(col: Column, dtype: T.DataType) -> Column:
    """Spark Column producing the canonical string for one value."""
    if isinstance(dtype, T.BooleanType):
        out = F.when(col, F.lit("1")).otherwise(F.lit("0"))
    elif isinstance(dtype, T.TimestampType):
        out = F.date_format(col, TS_FMT)
    elif isinstance(dtype, T.DateType):
        out = F.date_format(col, "yyyy-MM-dd")
    elif isinstance(dtype, (T.DoubleType, T.FloatType)):
        out = col.cast(T.DecimalType(FLOAT_PRECISION, FLOAT_SCALE)).cast("string")
    elif isinstance(dtype, T.DecimalType):
        out = col.cast("string")
    elif isinstance(dtype, (T.ByteType, T.ShortType, T.IntegerType, T.LongType)):
        out = col.cast("string")
    elif isinstance(dtype, T.StringType):
        out = F.trim(col)
    else:
        out = F.trim(col.cast("string"))
    return F.coalesce(out, F.lit(""))


def normalize_sql(expr: str, dtype: T.DataType) -> str:
    """DuckDB SQL text computing the identical canonical string.

    ``expr`` is a SQL expression (usually a column name)."""
    if isinstance(dtype, T.BooleanType):
        out = f"CASE WHEN {expr} THEN '1' ELSE '0' END"
    elif isinstance(dtype, T.TimestampType):
        out = f"strftime({expr}, '{TS_FMT_DUCK}')"
    elif isinstance(dtype, T.DateType):
        out = f"strftime({expr}, '%Y-%m-%d')"
    elif isinstance(dtype, (T.DoubleType, T.FloatType)):
        out = (
            f"CAST(CAST({expr} AS DECIMAL({FLOAT_PRECISION},{FLOAT_SCALE}))"
            " AS VARCHAR)"
        )
    elif isinstance(dtype, T.DecimalType):
        out = f"CAST({expr} AS VARCHAR)"
    elif isinstance(dtype, (T.ByteType, T.ShortType, T.IntegerType, T.LongType)):
        out = f"CAST({expr} AS VARCHAR)"
    elif isinstance(dtype, T.StringType):
        out = f"trim({expr})"
    else:
        out = f"trim(CAST({expr} AS VARCHAR))"
    return f"coalesce({out}, '')"
