"""Deterministic fixture transforms derived from the driver tables.

FIXTURES.md §B says the CDC matrix (B2), schema-drift (B3) and
dirty-target (B4) fixtures "can be derived from ``customer`` with a
deterministic transform" — these are those transforms, defined once with
both a DataFrame builder and the equivalent DuckDB SQL text so the oracle
sees byte-identical inputs.

The golden CDC proportions mirror the reference's key semantic test
(Tests/Sync.Tests.ps1:76-130): a source snapshot containing UNCHANGED,
UPDATED and NEW rows and omitting DELETED keys.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

# Rules (disjoint by construction on c_custkey):
#   deleted   : c_custkey % 11 == 0      -> omitted from the source
#   updated   : c_custkey % 7  == 0 (and not deleted) -> c_acctbal + 10.0
#   new       : one extra row per c_custkey % 13 == 0, key shifted +10_000_000
NEW_KEY_OFFSET = 10_000_000


def changed_customer_source(customer: DataFrame) -> DataFrame:
    """The 'current MongoDB snapshot' for CDC tests: customer with
    deterministic updates, deletes and inserts applied."""
    surviving = customer.filter(F.col("c_custkey") % 11 != 0)
    updated = surviving.withColumn(
        "c_acctbal",
        F.when(
            F.col("c_custkey") % 7 == 0, F.col("c_acctbal") + F.lit(10.0)
        ).otherwise(F.col("c_acctbal")),
    )
    new_rows = (
        customer.filter(F.col("c_custkey") % 13 == 0)
        .withColumn("c_custkey", F.col("c_custkey") + F.lit(NEW_KEY_OFFSET))
        .withColumn("c_name", F.concat(F.lit("NEW "), F.col("c_name")))
    )
    return updated.unionByName(new_rows)


def ragged_documents(customer: DataFrame) -> DataFrame:
    """FIXTURES.md B1: schemaless-document fixture for schema inference,
    derived from ``customer``. Mirrors the document population of the
    reference's inference tests (Tests/Analyze_scheme.Tests.ps1:41-133):
    flat fields, a nested object, a primitive array, an array of objects,
    type conflicts, and nulls — all deterministic functions of the key.

    Layout per key ``k``:
      name    : string c_name;  integer k%1000 when k%23==7 (type conflict)
      age     : integer k%90+18; null when k%19==4; string when k%17==5
      address : {city, zip} object, present when k%5==0
      tags    : ["t0".."t2"], 1+k%3 elements, present when k%4==1
      items   : [{sku, qty}] 1 element (2 when k%12==2), present when k%6==2
    """
    k = F.col("c_custkey")
    age = (k % 90 + 18).cast("string")
    age_json = (
        F.when(k % 19 == 4, F.lit("null"))
        .when(k % 17 == 5, F.concat(F.lit('"'), age, F.lit('"')))
        .otherwise(age)
    )
    name_json = F.when(k % 23 == 7, (k % 1000).cast("string")).otherwise(
        F.concat(F.lit('"'), F.col("c_name"), F.lit('"'))
    )
    address = F.when(
        k % 5 == 0,
        F.concat(
            F.lit(', "address": {"city": "'),
            F.col("c_mktsegment"),
            F.lit('", "zip": "Z'),
            (k % 100000).cast("string"),
            F.lit('"}'),
        ),
    ).otherwise(F.lit(""))
    tag_body = (
        F.when(k % 3 == 0, F.lit('"t0"'))
        .when(k % 3 == 1, F.lit('"t0", "t1"'))
        .otherwise(F.lit('"t0", "t1", "t2"'))
    )
    tags = F.when(
        k % 4 == 1, F.concat(F.lit(', "tags": ['), tag_body, F.lit("]"))
    ).otherwise(F.lit(""))
    item1 = F.concat(
        F.lit('{"sku": "S'),
        (k % 50).cast("string"),
        F.lit('", "qty": '),
        (k % 7).cast("string"),
        F.lit("}"),
    )
    item2 = F.concat(
        F.lit(', {"sku": "S'),
        ((k + 1) % 50).cast("string"),
        F.lit('", "qty": '),
        ((k + 1) % 7).cast("string"),
        F.lit("}"),
    )
    items = F.when(
        k % 6 == 2,
        F.concat(
            F.lit(', "items": ['),
            item1,
            F.when(k % 12 == 2, item2).otherwise(F.lit("")),
            F.lit("]"),
        ),
    ).otherwise(F.lit(""))
    doc = F.concat(
        F.lit('{"name": '),
        name_json,
        F.lit(', "age": '),
        age_json,
        address,
        tags,
        items,
        F.lit("}"),
    )
    return customer.select(k.alias("doc_id"), doc.alias("doc"))


# DuckDB twin of ragged_documents: the identical JSON-string concat as
# SQL, so oracles that parse the documents (e.g. the VARIANT extraction
# query) rebuild the same bytes independently. The inference oracle
# instead rebuilds exploded path rows; both derive from the same layout
# table in the ragged_documents docstring.
RAGGED_DOCUMENTS_SQL = """
SELECT c_custkey AS doc_id,
  '{"name": ' ||
  CASE WHEN c_custkey % 23 = 7 THEN CAST(c_custkey % 1000 AS VARCHAR)
       ELSE '"' || c_name || '"' END ||
  ', "age": ' ||
  CASE WHEN c_custkey % 19 = 4 THEN 'null'
       WHEN c_custkey % 17 = 5
         THEN '"' || CAST(c_custkey % 90 + 18 AS VARCHAR) || '"'
       ELSE CAST(c_custkey % 90 + 18 AS VARCHAR) END ||
  CASE WHEN c_custkey % 5 = 0
       THEN ', "address": {"city": "' || c_mktsegment || '", "zip": "Z'
            || CAST(c_custkey % 100000 AS VARCHAR) || '"}'
       ELSE '' END ||
  CASE WHEN c_custkey % 4 = 1
       THEN ', "tags": [' ||
            CASE WHEN c_custkey % 3 = 0 THEN '"t0"'
                 WHEN c_custkey % 3 = 1 THEN '"t0", "t1"'
                 ELSE '"t0", "t1", "t2"' END || ']'
       ELSE '' END ||
  CASE WHEN c_custkey % 6 = 2
       THEN ', "items": [{"sku": "S' || CAST(c_custkey % 50 AS VARCHAR)
            || '", "qty": ' || CAST(c_custkey % 7 AS VARCHAR) || '}' ||
            CASE WHEN c_custkey % 12 = 2
                 THEN ', {"sku": "S' || CAST((c_custkey + 1) % 50 AS VARCHAR)
                      || '", "qty": ' || CAST((c_custkey + 1) % 7 AS VARCHAR)
                      || '}'
                 ELSE '' END || ']'
       ELSE '' END ||
  '}' AS doc
FROM customer
"""


def regional_changed_customer_source(customer: DataFrame) -> DataFrame:
    """Like ``changed_customer_source`` but with every change confined to
    ``c_nationkey < 5`` — rows in other nations are byte-identical. Used
    by the partition-scoped apply query: only partitions 0-4 are touched,
    the rest of the target must never be rewritten."""
    k = F.col("c_custkey")
    hot = F.col("c_nationkey") < 5
    surviving = customer.filter(~(hot & (k % 11 == 0)))
    updated = surviving.withColumn(
        "c_acctbal",
        F.when(hot & (k % 7 == 0), F.col("c_acctbal") + F.lit(10.0)).otherwise(
            F.col("c_acctbal")
        ),
    )
    new_rows = (
        customer.filter(hot & (k % 13 == 0))
        .withColumn("c_custkey", k + F.lit(NEW_KEY_OFFSET))
        .withColumn("c_name", F.concat(F.lit("NEW "), F.col("c_name")))
    )
    return updated.unionByName(new_rows)


REGIONAL_CHANGED_SOURCE_SQL = f"""
SELECT c_custkey,
       c_name,
       c_nationkey,
       CASE WHEN c_nationkey < 5 AND c_custkey % 7 = 0
            THEN c_acctbal + 10.0 ELSE c_acctbal END AS c_acctbal,
       c_mktsegment
FROM customer
WHERE NOT (c_nationkey < 5 AND c_custkey % 11 = 0)
UNION ALL
SELECT c_custkey + {NEW_KEY_OFFSET},
       'NEW ' || c_name,
       c_nationkey,
       c_acctbal,
       c_mktsegment
FROM customer
WHERE c_nationkey < 5 AND c_custkey % 13 = 0
"""


def dirty_customer_target(customer: DataFrame) -> DataFrame:
    """FIXTURES.md B4: a corrupted migration target for the validation
    suite — rows dropped (missing in target), a string field corrupted,
    a numeric field shifted. All deterministic functions of the key.

      missing  : c_custkey % 31 == 0  -> row absent
      c_name   : c_custkey % 17 == 0  -> ' X' appended
      c_acctbal: c_custkey % 23 == 0  -> +0.5
    """
    k = F.col("c_custkey")
    return (
        customer.filter(k % 31 != 0)
        .withColumn(
            "c_name",
            F.when(k % 17 == 0, F.concat(F.col("c_name"), F.lit(" X"))).otherwise(
                F.col("c_name")
            ),
        )
        .withColumn(
            "c_acctbal",
            F.when(k % 23 == 0, F.col("c_acctbal") + F.lit(0.5)).otherwise(
                F.col("c_acctbal")
            ),
        )
    )


DIRTY_CUSTOMER_TARGET_SQL = """
SELECT c_custkey,
       CASE WHEN c_custkey % 17 = 0 THEN c_name || ' X' ELSE c_name END AS c_name,
       c_nationkey,
       CASE WHEN c_custkey % 23 = 0 THEN c_acctbal + 0.5 ELSE c_acctbal END
         AS c_acctbal,
       c_mktsegment
FROM customer
WHERE c_custkey % 31 <> 0
"""


def duplicated_documents(documents: DataFrame) -> DataFrame:
    """Dedup fixture: the documents corpus (which is duplicate-free by
    construction) plus deterministic exact copies and near-duplicates.

      exact copy : doc_id % 10 == 0 -> re-keyed +100000, same text
      near dup   : doc_id % 7 == 0  -> re-keyed +200000, 'xq zz ' prepended
                   (shifts a couple of leading shingles, keeps the rest)
    """
    base = documents.select("doc_id", "text")
    k = F.col("doc_id")
    exact = base.filter(k % 10 == 0).withColumn("doc_id", k + F.lit(100_000))
    near = (
        base.filter(k % 7 == 0)
        .withColumn("doc_id", k + F.lit(200_000))
        .withColumn("text", F.concat(F.lit("xq zz "), F.col("text")))
    )
    return base.unionByName(exact).unionByName(near)


DUPLICATED_DOCUMENTS_SQL = """
SELECT doc_id, text FROM documents
UNION ALL
SELECT doc_id + 100000, text FROM documents WHERE doc_id % 10 = 0
UNION ALL
SELECT doc_id + 200000, 'xq zz ' || text FROM documents WHERE doc_id % 7 = 0
"""


def duplicated_embeddings(embeddings: DataFrame) -> DataFrame:
    """ANN fixture: the embeddings table (whose max natural pairwise
    cosine is ~0.51) plus planted exact and near duplicates, so a 0.9
    cosine threshold cleanly separates planted pairs from noise.

      exact copy : vec_id % 10 == 0 -> re-keyed +10000, same vector
      near copy  : vec_id % 7 == 0  -> re-keyed +20000, first coordinate
                   scaled 1.05x (tiny angular perturbation)

    All vectors cast to array<double> so both branches and both engines
    share one element type.
    """
    base = embeddings.select(
        "vec_id",
        F.transform("embedding", lambda x: x.cast("double")).alias("embedding"),
    )
    k = F.col("vec_id")
    exact = base.filter(k % 10 == 0).withColumn("vec_id", k + F.lit(10_000))
    near = (
        base.filter(k % 7 == 0)
        .withColumn("vec_id", k + F.lit(20_000))
        .withColumn(
            "embedding",
            F.transform(
                "embedding",
                lambda x, i: F.when(i == 0, x * 1.05).otherwise(x),
            ),
        )
    )
    return base.unionByName(exact).unionByName(near)


DUPLICATED_EMBEDDINGS_SQL = """
SELECT vec_id, CAST(embedding AS DOUBLE[]) AS embedding FROM embeddings
UNION ALL
SELECT vec_id + 10000, CAST(embedding AS DOUBLE[]) FROM embeddings
WHERE vec_id % 10 = 0
UNION ALL
SELECT vec_id + 20000,
       list_transform(generate_series(1, len(embedding)),
         i -> CASE WHEN i = 1 THEN CAST(embedding[i] AS DOUBLE) * 1.05
                   ELSE CAST(embedding[i] AS DOUBLE) END)
FROM embeddings WHERE vec_id % 7 = 0
"""


def nested_customer(customer: DataFrame) -> DataFrame:
    """Typed nested-document fixture for the normalization operators
    (SURVEY.md §1.4 / M3): flat scalars + a nested object + an array of
    primitives + an array of objects, all deterministic functions of the
    key, with NULLs so 'no child row for absent object' is exercised.

    Layout per key ``k``:
      _id     : k
      name    : c_name                     (flat scalar)
      acctbal : c_acctbal                  (flat scalar)
      address : {city, zip}                NULL when k%5==4
      tags    : ["t0"..], 1+k%3 elements   NULL when k%7==3
      items   : [{sku, qty}], 1+k%2 elems  NULL when k%6==5
    """
    k = F.col("c_custkey")
    address = F.when(
        k % 5 != 4,
        F.struct(
            F.col("c_mktsegment").alias("city"),
            F.concat(F.lit("Z"), (k % 1000).cast("string")).alias("zip"),
        ),
    )
    tags = F.when(
        k % 7 != 3,
        F.slice(
            F.array(F.lit("t0"), F.lit("t1"), F.lit("t2")),
            F.lit(1),
            (k % 3 + 1).cast("int"),
        ),
    )
    item = lambda off: F.struct(  # noqa: E731
        F.concat(F.lit("S"), ((k + off) % 50).cast("string")).alias("sku"),
        ((k + off) % 7).alias("qty"),
    )
    items = F.when(
        k % 6 != 5,
        F.slice(F.array(item(0), item(1)), F.lit(1), (k % 2 + 1).cast("int")),
    )
    return customer.select(
        k.alias("_id"),
        F.col("c_name").alias("name"),
        F.col("c_acctbal").alias("acctbal"),
        address.alias("address"),
        tags.alias("tags"),
        items.alias("items"),
    )


NESTED_CUSTOMER_SQL = """
SELECT c_custkey AS _id,
       c_name AS name,
       c_acctbal AS acctbal,
       CASE WHEN c_custkey % 5 <> 4 THEN struct_pack(
            city := c_mktsegment,
            zip := 'Z' || CAST(c_custkey % 1000 AS VARCHAR)) END AS address,
       CASE WHEN c_custkey % 7 <> 3 THEN list_slice(
            ['t0', 't1', 't2'], 1, CAST(c_custkey % 3 + 1 AS INT)) END AS tags,
       CASE WHEN c_custkey % 6 <> 5 THEN list_slice([
            struct_pack(sku := 'S' || CAST(c_custkey % 50 AS VARCHAR),
                        qty := c_custkey % 7),
            struct_pack(sku := 'S' || CAST((c_custkey + 1) % 50 AS VARCHAR),
                        qty := (c_custkey + 1) % 7)
            ], 1, CAST(c_custkey % 2 + 1 AS INT)) END AS items
FROM customer
"""


CHANGED_CUSTOMER_SOURCE_SQL = f"""
SELECT c_custkey,
       c_name,
       c_nationkey,
       CASE WHEN c_custkey % 7 = 0 THEN c_acctbal + 10.0 ELSE c_acctbal END
         AS c_acctbal,
       c_mktsegment
FROM customer
WHERE c_custkey % 11 <> 0
UNION ALL
SELECT c_custkey + {NEW_KEY_OFFSET},
       'NEW ' || c_name,
       c_nationkey,
       c_acctbal,
       c_mktsegment
FROM customer
WHERE c_custkey % 13 = 0
"""


def noisy_documents(documents: DataFrame) -> DataFrame:
    """Cleaning fixture: the (markup-free, PII-free by construction)
    documents corpus with deterministic noise injected.

      doc_id % 5 == 0 -> wrapped in HTML with an entity and a per-doc
                         email address appended
      doc_id % 5 == 1 -> a phone number and a per-doc IPv4 appended
      otherwise       -> unchanged
    """
    base = documents.select("doc_id", "text")
    k = F.col("doc_id")
    html = base.filter(k % 5 == 0).withColumn(
        "text",
        F.concat(
            F.lit("<p>Hello &amp; welcome</p> "),
            F.col("text"),
            F.lit(" <br/>contact: user"),
            k.cast("string"),
            F.lit("@example.com"),
        ),
    )
    pii = base.filter(k % 5 == 1).withColumn(
        "text",
        F.concat(
            F.col("text"),
            F.lit(" call 555-123-4567 or ping 10.0.0."),
            (k % 250).cast("string"),
        ),
    )
    rest = base.filter((k % 5 != 0) & (k % 5 != 1))
    return html.unionByName(pii).unionByName(rest)


NOISY_DOCUMENTS_SQL = """
SELECT doc_id,
       '<p>Hello &amp; welcome</p> ' || text || ' <br/>contact: user'
         || CAST(doc_id AS VARCHAR) || '@example.com' AS text
FROM documents WHERE doc_id % 5 = 0
UNION ALL
SELECT doc_id,
       text || ' call 555-123-4567 or ping 10.0.0.'
         || CAST(doc_id % 250 AS VARCHAR) AS text
FROM documents WHERE doc_id % 5 = 1
UNION ALL
SELECT doc_id, text FROM documents WHERE doc_id % 5 NOT IN (0, 1)
"""


LINE_WRAP_TOKENS = 8


def lined_documents(documents: DataFrame) -> DataFrame:
    """Line-structure fixture for line-level dedup: the documents corpus
    re-wrapped so every ``LINE_WRAP_TOKENS`` whitespace tokens become one
    newline-terminated line. The driver corpus is single-line by
    construction; boilerplate-line removal (operators/cleaning.py)
    needs multi-line docs, and this deterministic re-wrap gives both
    engines the identical line structure. Pure per-row expression
    (``transform`` over ``slice`` windows) — no shuffle, no explode.
    """
    from nosql_to_sql_migration_tool_spark.operators.text import tokens

    toks = tokens(F.col("text"))
    w = LINE_WRAP_TOKENS
    n_lines = F.ceil(F.size(toks) / F.lit(float(w))).cast("int")
    lines = F.when(
        F.size(toks) == 0, F.array().cast("array<string>")
    ).otherwise(
        F.transform(
            F.sequence(F.lit(0), n_lines - F.lit(1)),
            lambda i: F.array_join(
                F.slice(toks, i * F.lit(w) + F.lit(1), F.lit(w)), " "
            ),
        )
    )
    return documents.select(
        "doc_id", F.array_join(lines, "\n").alias("text")
    )


def _lined_documents_sql() -> str:
    from nosql_to_sql_migration_tool_spark.operators.text import tokens_sql

    w = LINE_WRAP_TOKENS
    return f"""
SELECT doc_id,
       array_to_string(
         list_transform(
           range(0, CAST(ceil(len(toks) / {w}.0) AS INT)),
           i -> array_to_string(list_slice(toks, i*{w}+1, i*{w}+{w}), ' ')),
         chr(10)) AS text
FROM (SELECT doc_id, {tokens_sql('text')} AS toks FROM documents)
"""


LINED_DOCUMENTS_SQL = _lined_documents_sql()


def pii_documents(documents: DataFrame) -> DataFrame:
    """PII-scrub fixture (round 13): the documents corpus with
    deterministic planted PII — all pure functions of the key, so the
    DuckDB twin replays the identical corpus.

      email : doc_id % 13 == 0 -> ' contact user<id>@example.com'
      ipv4  : doc_id % 11 == 0 -> ' from 10.<id%256>.0.1'
      phone : doc_id % 7 == 0  -> ' call 555-<100+id%900>-<1000+id%9000>'

    A doc hitting several conditions gains several plants (the chained
    CASE order below IS the contract)."""
    k = F.col("doc_id")
    t = F.col("text")
    t = F.when(
        k % 13 == 0,
        F.concat(
            t, F.lit(" contact user"), k.cast("string"),
            F.lit("@example.com"),
        ),
    ).otherwise(t)
    t = F.when(
        k % 11 == 0,
        F.concat(
            t, F.lit(" from 10."), (k % 256).cast("string"),
            F.lit(".0.1"),
        ),
    ).otherwise(t)
    t = F.when(
        k % 7 == 0,
        F.concat(
            t, F.lit(" call 555-"),
            (k % 900 + 100).cast("string"),
            F.lit("-"),
            (k % 9000 + 1000).cast("string"),
        ),
    ).otherwise(t)
    return documents.select("doc_id", t.alias("text"))


PII_DOCUMENTS_SQL = """
SELECT doc_id,
       CASE WHEN doc_id % 7 = 0
            THEN t2 || ' call 555-' || CAST(doc_id % 900 + 100 AS VARCHAR)
                 || '-' || CAST(doc_id % 9000 + 1000 AS VARCHAR)
            ELSE t2 END AS text
FROM (
  SELECT doc_id,
         CASE WHEN doc_id % 11 = 0
              THEN t1 || ' from 10.' || CAST(doc_id % 256 AS VARCHAR)
                   || '.0.1'
              ELSE t1 END AS t2
  FROM (
    SELECT doc_id,
           CASE WHEN doc_id % 13 = 0
                THEN text || ' contact user' || CAST(doc_id AS VARCHAR)
                     || '@example.com'
                ELSE text END AS t1
    FROM documents
  )
)
"""


# Hex digits whose presence as md5(token)[0] TitleCases the token — a
# per-TYPE (not per-position) rule, so both engines case the exact same
# words and adjacent cased words form deterministic multi-word spans.
TITLECASE_HEX = ("0", "1", "2", "3", "4", "5")


def titlecased_documents(documents: DataFrame) -> DataFrame:
    """Entity-mining fixture: the documents corpus with a deterministic
    ~37% of token TYPES TitleCased (md5(token) first hex in
    ``TITLECASE_HEX``). The driver corpus is all-lowercase by
    construction, so capitalized-span extraction over it is vacuous;
    this per-type rule is engine-replayable (same md5, same casing) and
    produces genuine multi-word spans wherever two cased types are
    adjacent. Pure per-row expression — no shuffle, no explode."""
    cased = F.transform(
        F.split(F.col("text"), " "),
        lambda t: F.when(
            F.substring(F.md5(t), 1, 1).isin(*TITLECASE_HEX),
            F.concat(F.upper(t.substr(1, 1)), t.substr(F.lit(2), F.length(t))),
        ).otherwise(t),
    )
    return documents.select(
        "doc_id", F.array_join(cased, " ").alias("text")
    )


TITLECASED_DOCUMENTS_SQL = f"""
SELECT doc_id,
       array_to_string(list_transform(string_split(text, ' '),
         t -> CASE WHEN substr(md5(t), 1, 1) IN {TITLECASE_HEX!r}
                   THEN upper(substr(t, 1, 1)) || substr(t, 2)
                   ELSE t END), ' ') AS text
FROM documents
"""


def messy_customers(customer: DataFrame) -> DataFrame:
    """The self-ER fixture (round 15): ONE table holding both the clean
    customers and the dirty migration copy (``dirty_customer_target``,
    B4) RE-KEYED by +1_000_000 — the state a target lands in after a
    botched migration ran twice handing out fresh surrogate keys.
    Duplicate pairs share NO key, so entity resolution must find them
    from natural fields alone; B4's deterministic corruptions give
    every outcome class: twins reachable by an exact-name blocking pass
    (acctbal dirty at %23), twins reachable only by a balance pass
    (name dirty at %17), and %391 twins (both dirty) that stay
    unresolved singletons."""
    cols = [
        "c_custkey", "c_name", "c_nationkey", "c_acctbal", "c_mktsegment",
    ]
    rekeyed = dirty_customer_target(customer).withColumn(
        "c_custkey", F.col("c_custkey") + F.lit(1_000_000)
    )
    return customer.select(*cols).unionByName(rekeyed.select(*cols))


MESSY_CUSTOMERS_SQL = f"""
SELECT c_custkey, c_name, c_nationkey, c_acctbal, c_mktsegment FROM customer
UNION ALL
SELECT c_custkey + 1000000 AS c_custkey, c_name, c_nationkey, c_acctbal,
       c_mktsegment
FROM ({DIRTY_CUSTOMER_TARGET_SQL})
"""
