"""mongoexport dump ingestion — the server-less half of the MongoDB
source (round 14): most real migrations can ship `mongoexport` JSON
Lines dumps instead of opening a live `mongodb://` connection, and
those dumps encode BSON types as MongoDB Extended JSON v2 wrappers
(`{"$oid": ...}`, `{"$date": ...}`, `{"$numberLong": "..."}`, ...).
This module reads a dump with the stock distributed JSON reader and
UNWRAPS the type wrappers into native Spark types, so a dump flows
into the same normalize/DDL/migration pipeline a live collection
would (reference: `private/Connection_DB.ps1:17-64` opens the live
connection; `private/Analyze_scheme.ps1:51-62` walks the documents —
this path walks the exported form of the same documents).

Scale shape: `spark.read.json` splits a JSONL dump by lines across
executors (one pass, no shuffle); unwrapping is a pure projection
(whole-stage codegen) derived from the INFERRED schema driver-side —
no data moves to the driver, no Python in the data path.

Type mapping (Extended JSON v2, the `mongoexport` default):
  {"$oid": hex}                      -> string (the 24-hex id)
  {"$date": iso-8601}                -> timestamp
  {"$date": {"$numberLong": ms}}     -> timestamp (epoch millis)
  {"$numberLong"/"$numberInt": s}    -> long
  {"$numberDouble": s}               -> double
  {"$numberDecimal": s}              -> decimal(38, 10)
Wrappers nest anywhere (inside structs and arrays); unwrapping
recurses structurally. Unknown structs pass through untouched.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, functions as F
from pyspark.sql import types as T

__all__ = [
    "read_mongoexport",
    "unwrap_extended_json",
    "decode_ext_column",
    "write_mongoexport_dump",
]


def _is_wrapper(schema: T.StructType) -> str | None:
    """The wrapper kind when ``schema`` is exactly one Extended JSON
    type wrapper, else None."""
    names = [f.name for f in schema.fields]
    if len(names) != 1:
        return None
    return names[0] if names[0] in (
        "$oid", "$date", "$numberLong", "$numberInt",
        "$numberDouble", "$numberDecimal",
    ) else None


def decode_ext_column(col: Column, schema: T.DataType) -> Column:
    """The unwrapped form of ``col`` given its inferred ``schema`` —
    recursing through structs and arrays; non-wrapper types return
    unchanged."""
    if isinstance(schema, T.StructType):
        kind = _is_wrapper(schema)
        if kind == "$oid":
            return col.getField("$oid")
        if kind == "$date":
            inner = schema.fields[0].dataType
            if isinstance(inner, T.StructType) and _is_wrapper(inner) == "$numberLong":
                return F.timestamp_millis(
                    col.getField("$date").getField("$numberLong").cast("long")
                )
            return F.to_timestamp(col.getField("$date").cast("string"))
        if kind in ("$numberLong", "$numberInt"):
            return col.getField(kind).cast("long")
        if kind == "$numberDouble":
            return col.getField(kind).cast("double")
        if kind == "$numberDecimal":
            return col.getField(kind).cast("decimal(38,10)")
        # plain struct: rebuild with each field unwrapped
        return F.struct(
            *[
                decode_ext_column(col.getField(f.name), f.dataType).alias(f.name)
                for f in schema.fields
            ]
        )
    if isinstance(schema, T.ArrayType):
        return F.transform(
            col, lambda x: decode_ext_column(x, schema.elementType)
        )
    return col


def unwrap_extended_json(df: DataFrame) -> DataFrame:
    """Every top-level column unwrapped per ``decode_ext_column`` —
    pure projection, schema decided driver-side from the frame's
    inferred schema."""
    return df.select(
        *[
            decode_ext_column(F.col(f.name), f.dataType).alias(f.name)
            for f in df.schema.fields
        ]
    )


def read_mongoexport(spark: SparkSession, path: str) -> DataFrame:
    """A mongoexport JSONL dump as a typed DataFrame: distributed
    line-split JSON read, then the Extended JSON unwrap projection."""
    return unwrap_extended_json(spark.read.json(path))


def write_mongoexport_dump(
    df: DataFrame,
    path: str,
    oid_col: str,
    long_cols: tuple[str, ...] = (),
    date_cols: tuple[str, ...] = (),
) -> None:
    """Write a frame AS a mongoexport-style Extended JSON dump — the
    export twin of ``read_mongoexport`` (and the test/benchmark fixture
    generator: a round trip through the dump must reproduce the source
    rows). ``oid_col`` becomes ``_id: {"$oid": md5-derived 24-hex}``
    (deterministic — a pure function of the key, so an oracle can
    re-derive it); ``long_cols`` wrap as ``{"$numberLong": "..."}``,
    ``date_cols`` as ISO ``{"$date": ...}`` with millisecond precision
    (``.SSS`` — ADVICE r14: the second-granular form silently truncated
    sub-second timestamps the read path supports); everything else
    stays a plain JSON value. The hardcoded ``'Z'`` suffix is correct
    because session.py pins ``spark.sql.session.timeZone=UTC`` — a
    non-UTC session would render local wall-clock digits under a Z
    label (documented dependency, pytest-pinned). One narrow projection
    + a text write — shard parallel, no shuffle."""
    wrapped = [
        F.struct(
            F.substring(F.md5(F.col(oid_col).cast("string")), 1, 24).alias(
                "$oid"
            )
        ).alias("_id")
    ]
    for c in df.columns:
        if c == oid_col:
            wrapped.append(
                F.struct(F.col(c).cast("string").alias("$numberLong")).alias(c)
            )
        elif c in long_cols:
            wrapped.append(
                F.struct(F.col(c).cast("string").alias("$numberLong")).alias(c)
            )
        elif c in date_cols:
            wrapped.append(
                F.struct(
                    F.date_format(
                        F.col(c), "yyyy-MM-dd'T'HH:mm:ss.SSS'Z'"
                    ).alias("$date")
                ).alias(c)
            )
        else:
            wrapped.append(F.col(c).alias(c))
    df.select(*wrapped).write.mode("overwrite").json(path)
