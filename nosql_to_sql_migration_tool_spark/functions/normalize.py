"""Canonical value normalization — the shared contract between row
hashing (CDC), validation comparison, and the DuckDB oracle.

Two distinct canons, matching the reference's two distinct code paths:

1. **Comparison canon** (``normalize_for_comparison`` / ``normalize_sql``)
   — the *intended* semantics of ``Normalize-ValueForComparison``
   (private/Migration_Validation.ps1:326-363), used by validation:
   null→"", bool→"1"/"0", timestamp→"yyyy-MM-dd HH:mm:ss",
   float→fixed-6dp decimal string, string→trimmed.

2. **Hash canon** (``hash_canon`` / ``hash_canon_sql``) — the CDC
   change-detection stringification (``Get-DocumentHash``,
   private/Sync.ps1:362-379). The reference stringifies *without*
   trimming, and a document where a value flipped NULL↔"" must classify
   as UPDATED, so the hash canon differs from the comparison canon:

   - NULL        -> the single marker ``N`` (distinct from any value)
   - non-NULL    -> ``V`` + canonical string, **untrimmed** for strings
   - strings escape the field separator (``\\x1f``) and the escape char
     (``\\x10``) so the later ``concat_ws`` join is injective —
     ``('a\\x1fb','c')`` and ``('a','b\\x1fc')`` hash differently.

Float canon (both paths): fixed-scale decimal string (6 dp) so Spark and
DuckDB produce byte-identical text (Spark's plain double→string uses
scientific notation where DuckDB does not). Doubles beyond
DECIMAL(30,6) range try_cast to NULL on both engines and collapse to the
``OVF`` marker — a documented limitation (two distinct >1e24 magnitudes
hash equal), irrelevant for the reference's money/measure domains.

Both a Spark ``Column`` builder and a DuckDB SQL-text builder live here so
the two engines can never drift apart silently; ``tests/test_hashing.py``
pins them against each other on adversarial values.
"""

from __future__ import annotations

from pyspark.sql import Column, functions as F, types as T

TS_FMT = "yyyy-MM-dd HH:mm:ss"
TS_FMT_DUCK = "%Y-%m-%d %H:%M:%S"
FLOAT_SCALE = 6
FLOAT_PRECISION = 30

# Hash-canon framing: US (unit separator) joins fields, DLE escapes.
HASH_SEP = "\x1f"
HASH_ESC = "\x10"
_ESC_ESC = HASH_ESC + HASH_ESC  # escaped escape char
_ESC_SEP = HASH_ESC + "\x11"  # escaped separator
_NULL_MARK = "N"
_VAL_MARK = "V"
_OVF_MARK = "OVF"

_INTEGRAL = (T.ByteType, T.ShortType, T.IntegerType, T.LongType)
_FLOATING = (T.DoubleType, T.FloatType)


def _canon_string(col: Column, dtype: T.DataType, trim: bool) -> Column:
    """Canonical string for one non-null value (Spark side). May still be
    NULL on float overflow — callers coalesce."""
    if isinstance(dtype, T.BooleanType):
        return F.when(col, F.lit("1")).otherwise(F.lit("0"))
    if isinstance(dtype, T.TimestampType):
        return F.date_format(col, TS_FMT)
    if isinstance(dtype, T.DateType):
        return F.date_format(col, "yyyy-MM-dd")
    if isinstance(dtype, _FLOATING):
        return col.try_cast(T.DecimalType(FLOAT_PRECISION, FLOAT_SCALE)).cast(
            "string"
        )
    if isinstance(dtype, (T.DecimalType, *_INTEGRAL)):
        return col.cast("string")
    if isinstance(dtype, T.StringType):
        return F.trim(col) if trim else col
    return F.trim(col.cast("string")) if trim else col.cast("string")


def _canon_string_sql(expr: str, dtype: T.DataType, trim: bool) -> str:
    """Identical canonical string, as DuckDB SQL text."""
    if isinstance(dtype, T.BooleanType):
        return f"CASE WHEN {expr} THEN '1' ELSE '0' END"
    if isinstance(dtype, T.TimestampType):
        return f"strftime({expr}, '{TS_FMT_DUCK}')"
    if isinstance(dtype, T.DateType):
        return f"strftime({expr}, '%Y-%m-%d')"
    if isinstance(dtype, _FLOATING):
        return (
            f"CAST(TRY_CAST({expr} AS "
            f"DECIMAL({FLOAT_PRECISION},{FLOAT_SCALE})) AS VARCHAR)"
        )
    if isinstance(dtype, (T.DecimalType, *_INTEGRAL)):
        return f"CAST({expr} AS VARCHAR)"
    if isinstance(dtype, T.StringType):
        return f"trim({expr})" if trim else expr
    base = f"CAST({expr} AS VARCHAR)"
    return f"trim({base})" if trim else base


# ---------------------------------------------------------------------------
# Comparison canon (validation): Normalize-ValueForComparison parity.
# ---------------------------------------------------------------------------


def normalize_for_comparison(col: Column, dtype: T.DataType) -> Column:
    """Spark Column producing the reference's comparison string
    (null→"", trimmed strings)."""
    overflow = F.lit(_OVF_MARK) if isinstance(dtype, _FLOATING) else F.lit("")
    out = F.coalesce(_canon_string(col, dtype, trim=True), overflow)
    return F.when(col.isNull(), F.lit("")).otherwise(out)


def normalize_sql(expr: str, dtype: T.DataType) -> str:
    """DuckDB SQL text computing the identical comparison string."""
    base = _canon_string_sql(expr, dtype, trim=True)
    fallback = f"'{_OVF_MARK}'" if isinstance(dtype, _FLOATING) else "''"
    return (
        f"CASE WHEN {expr} IS NULL THEN '' "
        f"ELSE coalesce({base}, {fallback}) END"
    )


# ---------------------------------------------------------------------------
# Hash canon (CDC change detection): Get-DocumentHash parity, injective.
# ---------------------------------------------------------------------------


def hash_canon(col: Column, dtype: T.DataType) -> Column:
    """Spark Column producing the injective hash-canon string for one field."""
    base = _canon_string(col, dtype, trim=False)
    if isinstance(dtype, (T.StringType,)) or not isinstance(
        dtype,
        (
            T.BooleanType,
            T.TimestampType,
            T.DateType,
            T.DecimalType,
            *_FLOATING,
            *_INTEGRAL,
        ),
    ):
        # Only strings (and string-casts of exotica) can contain the
        # separator/escape bytes; numeric/temporal canons never do.
        base = F.replace(base, F.lit(HASH_ESC), F.lit(_ESC_ESC))
        base = F.replace(base, F.lit(HASH_SEP), F.lit(_ESC_SEP))
    overflow = F.lit(_OVF_MARK) if isinstance(dtype, _FLOATING) else F.lit("")
    return F.when(col.isNull(), F.lit(_NULL_MARK)).otherwise(
        F.concat(F.lit(_VAL_MARK), F.coalesce(base, overflow))
    )


def hash_canon_sql(expr: str, dtype: T.DataType) -> str:
    """DuckDB SQL text computing the identical hash-canon string."""
    base = _canon_string_sql(expr, dtype, trim=False)
    if isinstance(dtype, T.StringType) or not isinstance(
        dtype,
        (
            T.BooleanType,
            T.TimestampType,
            T.DateType,
            T.DecimalType,
            *_FLOATING,
            *_INTEGRAL,
        ),
    ):
        base = (
            f"replace(replace({base}, '{HASH_ESC}', '{_ESC_ESC}'), "
            f"'{HASH_SEP}', '{_ESC_SEP}')"
        )
    fallback = f"'{_OVF_MARK}'" if isinstance(dtype, _FLOATING) else "''"
    return (
        f"CASE WHEN {expr} IS NULL THEN '{_NULL_MARK}' "
        f"ELSE '{_VAL_MARK}' || coalesce({base}, {fallback}) END"
    )
