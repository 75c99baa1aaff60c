"""Document → relational normalization: the reference's headline
capability (README.md:13 — nested objects and arrays become FK child
tables), implemented as declarative Spark plans.

Reference semantics (``New-SQLSchema``, private/Sql_Schema_Generator.ps1:57-181):

1. flat scalars          -> main table, ``_id`` PK
   (New-TableDefinition, :199-248)
2. nested object ``x``   -> child table ``<main>_x``: parent FK column
   ``<main>_<key>``, one column per leaf (New-NestedTableDefinition,
   :250-295)
3. array of objects      -> child table + ``array_index`` ordinal
   (New-ArrayObjectTableDefinition, :297-345)
4. array of primitives   -> child table + ``array_index`` + typed
   ``value`` column (New-ArrayPrimitiveTableDefinition, :347-402)

We implement the *intended* semantics (SURVEY.md §1.4): the reference's
dead ``-contains`` branch put nested leaves on the main table too, and its
data loader never populated child tables at all — here the child tables
are real, populated DataFrames.

Spark mapping: nested object = ``select(key, col("x.*"))`` (pure
projection — narrow, no shuffle, pushes column pruning into the scan);
arrays = ``posexplode`` (``pos`` ≡ ``array_index``, 0-based, also narrow).
A whole document table normalizes into N child plans that all share the
single parent scan — at 100 TB each child table is one scan+project job
with no join and no shuffle.

Surrogate keys: the reference declares ``id INT IDENTITY`` per child row.
A global dense identity is a scale anti-pattern (it serializes writes);
``with_surrogate_id`` uses ``monotonically_increasing_id`` — unique but
non-dense and partition-dependent, so it is optional and excluded from
the deterministic query surface. ``(parent FK, array_index)`` is the
stable natural key.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F, types as T


def fk_column(parent_table: str, key: str) -> str:
    """Child-table FK column name, reference convention ``<main>_<key>``
    (Sql_Schema_Generator.ps1:268: e.g. ``customer__id``)."""
    return f"{parent_table}_{key}"


def child_table_name(parent_table: str, field: str) -> str:
    """Child-table naming ``<main>_<field>`` (Sql_Schema_Generator.ps1:116)."""
    return f"{parent_table}_{field}"


def _leaf_columns(struct: T.StructType, prefix: str) -> list[tuple[str, str]]:
    """(qualified source path, dotted output name) for every leaf under a
    struct — dot-path naming per the reference (Analyze_scheme.ps1:160)."""
    out: list[tuple[str, str]] = []
    for field in struct.fields:
        path = f"{prefix}.{field.name}"
        if isinstance(field.dataType, T.StructType):
            out.extend(_leaf_columns(field.dataType, path))
        else:
            out.append((path, path.split(".", 1)[1]))
    return out


def main_table(df: DataFrame, key: str) -> DataFrame:
    """Flat scalars only — the main-table projection
    (New-TableDefinition intent; the loader's scalar projection,
    Data_Migration.ps1:217-231)."""
    cols = [
        f.name
        for f in df.schema.fields
        if not isinstance(f.dataType, (T.StructType, T.ArrayType, T.MapType))
    ]
    ordered = [key] + [c for c in cols if c != key]
    return df.select(*ordered)


def flatten_struct(
    df: DataFrame, key: str, struct_col: str, parent_table: str
) -> DataFrame:
    """Nested object -> child table rows: (parent FK, one column per leaf).

    Documents lacking the object (NULL struct) produce no child row,
    matching 'a child row exists iff the document has the object'.
    Leaves keep dotted names (``geo.lat``) so deep nesting stays one
    child table per root object, as the reference intends."""
    struct_field = df.schema[struct_col].dataType
    if not isinstance(struct_field, T.StructType):
        raise TypeError(f"{struct_col} is {struct_field}, expected struct")
    leaves = _leaf_columns(struct_field, struct_col)
    return df.filter(F.col(struct_col).isNotNull()).select(
        F.col(key).alias(fk_column(parent_table, key)),
        *[F.col(path).alias(name) for path, name in leaves],
    )


def explode_array_of_structs(
    df: DataFrame, key: str, array_col: str, parent_table: str
) -> DataFrame:
    """Array of objects -> child rows: (parent FK, array_index, *fields).

    ``posexplode`` pos is the 0-based ``array_index`` ordinal
    (Sql_Schema_Generator.ps1:297-345). NULL/empty arrays produce no
    rows (inner explode)."""
    elem = df.schema[array_col].dataType
    if not (
        isinstance(elem, T.ArrayType) and isinstance(elem.elementType, T.StructType)
    ):
        raise TypeError(f"{array_col} is {elem}, expected array<struct>")
    exploded = df.select(
        F.col(key).alias(fk_column(parent_table, key)),
        F.posexplode(array_col).alias("array_index", "__elem"),
    )
    field_names = [f.name for f in elem.elementType.fields]
    return exploded.select(
        fk_column(parent_table, key),
        "array_index",
        *[F.col(f"__elem.{n}").alias(n) for n in field_names],
    )


def explode_array_of_primitives(
    df: DataFrame,
    key: str,
    array_col: str,
    parent_table: str,
    value_name: str = "value",
) -> DataFrame:
    """Array of primitives -> child rows: (parent FK, array_index, value).

    The ``value`` column keeps the array's element type; the DDL layer
    types it from the element-type histogram
    (New-ArrayPrimitiveTableDefinition, Sql_Schema_Generator.ps1:383-392)."""
    elem = df.schema[array_col].dataType
    if not isinstance(elem, T.ArrayType):
        raise TypeError(f"{array_col} is {elem}, expected array")
    return df.select(
        F.col(key).alias(fk_column(parent_table, key)),
        F.posexplode(array_col).alias("array_index", value_name),
    )


def with_surrogate_id(df: DataFrame, id_col: str = "id") -> DataFrame:
    """Optional surrogate PK (reference: ``id INT IDENTITY``). Unique but
    non-dense and run-dependent — excluded from deterministic checks."""
    return df.withColumn(id_col, F.monotonically_increasing_id())


def normalize_document_table(
    df: DataFrame, key: str, table_name: str
) -> dict[str, DataFrame]:
    """Full intended New-SQLSchema data pipeline: partition a typed
    document DataFrame into ``{table_name: DataFrame}`` — the main table
    plus one child table per root-level nested object / array.

    All outputs are lazy plans over the same source scan; writing them is
    N independent scan+project jobs (no shuffles, no joins)."""
    out: dict[str, DataFrame] = {table_name: main_table(df, key)}
    for field in df.schema.fields:
        if field.name == key:
            continue
        child = child_table_name(table_name, field.name)
        if isinstance(field.dataType, T.StructType):
            out[child] = flatten_struct(df, key, field.name, table_name)
        elif isinstance(field.dataType, T.ArrayType):
            if isinstance(field.dataType.elementType, T.StructType):
                out[child] = explode_array_of_structs(
                    df, key, field.name, table_name
                )
            else:
                out[child] = explode_array_of_primitives(
                    df, key, field.name, table_name
                )
    return out
