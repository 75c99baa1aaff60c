"""Canonical row hash — the CDC change-detection primitive.

The reference hashes each document as: top-level scalar fields only,
key-sorted, stringified, compact JSON, MD5 hex (``Get-DocumentHash``,
private/Sync.ps1:351-393). We keep the same contract — key-sorted scalar
fields, canonical stringification, MD5 — but hash a separator-joined
canonical string instead of engine JSON, because JSON formatting is the
likeliest cross-engine divergence point (SURVEY.md §7.2 item 1).

The per-field **hash canon** (``functions/normalize.py``) makes the join
injective: strings escape the ``\\x1f`` separator, and NULL gets a marker
distinct from every value (so NULL↔"" flips classify as UPDATED, matching
the reference's untrimmed stringification).

Entirely JVM-side in Spark (``md5(concat_ws(...))``) — no Python UDF, so
it stays inside whole-stage codegen and scales to 100 TB scans.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F, types as T

from nosql_to_sql_migration_tool_spark.functions.normalize import (
    HASH_SEP,
    hash_canon,
    hash_canon_sql,
)

_SCALAR_TYPES = (
    T.StringType,
    T.BooleanType,
    T.TimestampType,
    T.DateType,
    T.DoubleType,
    T.FloatType,
    T.DecimalType,
    T.ByteType,
    T.ShortType,
    T.IntegerType,
    T.LongType,
)


def scalar_columns(df: DataFrame, exclude: tuple[str, ...] = ()) -> list[str]:
    """Key-sorted top-level scalar columns — the hash input set, mirroring
    the reference's 'top-level scalars only' rule (Sync.ps1:362-378)."""
    return sorted(
        f.name
        for f in df.schema.fields
        if isinstance(f.dataType, _SCALAR_TYPES) and f.name not in exclude
    )


def row_hash(df: DataFrame, cols: list[str] | None = None) -> Column:
    """MD5 hex of the canonical, key-sorted scalar projection."""
    names = cols if cols is not None else scalar_columns(df)
    types = {f.name: f.dataType for f in df.schema.fields}
    parts = [hash_canon(F.col(c), types[c]) for c in sorted(names)]
    return F.md5(F.concat_ws(HASH_SEP, *parts))


def row_hash_sql(schema: T.StructType, cols: list[str] | None = None) -> str:
    """DuckDB SQL expression computing the identical hash (oracle side)."""
    types = {f.name: f.dataType for f in schema.fields}
    names = sorted(cols if cols is not None else types)
    parts = [hash_canon_sql(c, types[c]) for c in names]
    joined = f" || '{HASH_SEP}' || ".join(parts)
    return f"md5({joined})"
