"""Entity-lite mining — capitalized-span extraction (round 14, r15
queue): multi-word TitleCase spans ("New York", "Apache Spark") are
the cheapest useful proxy for named entities a 100 TB corpus pass can
afford — no model, no Python, one regex projection + one combinable
count. Training-data pipelines use the resulting entity table for
corpus profiling (what is this corpus ABOUT), dedup blocking keys,
and targeted decontamination (scrub every doc mentioning a benchmark
entity).

Determinism contract: the span pattern uses the Java-regex/RE2 common
subset (character classes, a non-capturing group, no lookaround); the
top-k orders by (count DESC, entity ASC) — fully deterministic ties.

Scale shape (stated precisely — ADVICE r14): ``entity_spans`` is a
narrow shuffle-free projection; ``entity_counts`` groups by the span,
and because it reports ``n_docs = count_distinct(doc_id)`` the
aggregate plans as the standard TWO-shuffle partial-distinct expansion
(expand on (entity, doc_id), then fold to entity) — one shuffle more
than token_frequencies' pure-count floor, the honest price of the
distinct-doc reach column. Both shuffles are combinable map-side and
key on the span; the top-k plans as TakeOrdered. Approximating n_docs
(e.g. a KMV per entity) would buy back the shuffle if the single-pass
shape ever matters.

Reference analogue: none (the migration tool moves values verbatim);
extends the SURVEY §2C text-analysis family.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

# Two or more adjacent TitleCase words. Single capitalized words are
# deliberately excluded — they are dominated by sentence starts.
ENTITY_RE = r"[A-Z][a-z]+(?: [A-Z][a-z]+)+"


def entity_spans(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """``(doc_id, entity)`` — one row per extracted span occurrence
    (duplicates within a doc preserved: occurrence counts are signal).
    A shuffle-free extract + explode projection."""
    return df.select(
        F.col(id_col).alias("doc_id"),
        F.explode(
            F.regexp_extract_all(F.col(text_col), F.lit(ENTITY_RE), F.lit(0))
        ).alias("entity"),
    )


def entity_counts(
    df: DataFrame,
    k: int = 50,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Top-k corpus entities ``(entity, n_docs, n_occurrences)`` —
    n_docs is the distinct-doc reach (the decontamination blast
    radius), n_occurrences the raw count. Plans as the two-shuffle
    partial-distinct expansion (see module header — the cost of the
    exact n_docs column); the top-k plans as TakeOrdered (count DESC,
    entity ASC)."""
    spans = entity_spans(df, text_col, id_col)
    counts = spans.groupBy("entity").agg(
        F.count_distinct("doc_id").cast("long").alias("n_docs"),
        F.count(F.lit(1)).cast("long").alias("n_occurrences"),
    )
    return counts.orderBy(
        F.col("n_occurrences").desc(), F.col("entity")
    ).limit(int(k))


def entity_counts_sql(docs_sql: str, k: int = 50) -> str:
    """DuckDB twin of ``entity_counts`` — same pattern, same tie order."""
    return f"""
WITH docs AS ({docs_sql}),
spans AS (
  SELECT doc_id, unnest(regexp_extract_all(text, '{ENTITY_RE}')) AS entity
  FROM docs
)
SELECT entity,
       CAST(count(DISTINCT doc_id) AS BIGINT) AS n_docs,
       CAST(count(*) AS BIGINT) AS n_occurrences
FROM spans
GROUP BY entity
ORDER BY n_occurrences DESC, entity
LIMIT {int(k)}
"""


# Characters an entity literal may contain for the cross-engine scrub
# contract to hold with NO escaping layer (Java regex and RE2 would
# need engine-specific escapes for anything else; capitalized-span
# entities are [A-Za-z ]+ by construction, so this costs nothing).
_SCRUB_SAFE = r"^[A-Za-z0-9 _-]+$"


def _entity_alternation(entities: list[str]) -> str:
    """One word-bounded alternation of the entity literals,
    longest-first (alternation is leftmost-preference in BOTH Java
    regex and RE2, so longest-first ordering gives maximal-munch in
    both — 'New York City' wins over 'New York' when both are listed).
    Raises on characters outside the no-escaping-needed set."""
    import re as _re

    if not entities:
        raise ValueError("scrub_entities: empty entity list")
    for e in entities:
        if not _re.match(_SCRUB_SAFE, e):
            raise ValueError(
                f"scrub_entities: entity {e!r} contains characters "
                "outside [A-Za-z0-9 _-] — the cross-engine pattern "
                "contract covers plain span literals only"
            )
    parts = sorted(entities, key=len, reverse=True)
    return r"\b(?:" + "|".join(parts) + r")\b"


def scrub_entities(
    df: DataFrame,
    entities: list[str],
    replacement: str = "<ENTITY>",
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """``(doc_id, text, n_entity)`` — every mention of the listed
    entities replaced by the placeholder, with the per-document hit
    count alongside (the redact_pii audit-handle discipline). THE
    decontamination action for ``entity_counts``'s blast-radius table:
    mine the benchmark/forbidden entities, then scrub their mentions
    corpus-wide. The entity list is a PLAN LITERAL (one alternation
    pattern — metadata-sized, like the broadcast model tables), so the
    scrub is a single narrow codegen projection: no shuffle, no
    Python, the cheapest operator class at 100 TB."""
    pat = _entity_alternation(entities)
    return df.select(
        F.col(id_col).alias("doc_id"),
        F.regexp_replace(F.col(text_col), pat, replacement).alias(text_col),
        F.size(
            F.regexp_extract_all(F.col(text_col), F.lit(pat), F.lit(0))
        ).cast("long").alias("n_entity"),
    )


def scrub_entities_sql(
    docs_sql: str,
    entities: list[str],
    replacement: str = "<ENTITY>",
) -> str:
    """DuckDB twin of ``scrub_entities`` — identical alternation
    (RE2 takes the explicit 'g' flag Spark implies)."""
    pat = _entity_alternation(entities)
    return f"""
SELECT doc_id,
       regexp_replace(text, '{pat}', '{replacement}', 'g') AS text,
       CAST(len(regexp_extract_all(text, '{pat}')) AS BIGINT) AS n_entity
FROM ({docs_sql})
"""
