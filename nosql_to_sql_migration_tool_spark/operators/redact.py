"""PII redaction — the scrubbing stage every shipped training corpus
passes before use (round 13): emails, IPv4 addresses and NANP-style
phone numbers are replaced with typed placeholder tokens, and the
per-document hit counts come out alongside (the audit handle — a
corpus owner watches WHAT was scrubbed, not just that something was).

Determinism contract: the three patterns use the regex subset Java
(Spark) and RE2 (DuckDB) implement identically — character classes,
bounded repetition, ``\\b``/``\\d`` on ASCII text; no lookaround, no
flags. Counts and replacements apply in a FIXED chain (email → ipv4 →
phone), each stage counting on the PREVIOUS stage's output, so overlap
between pattern families (digits inside an email local part, say) has
one documented resolution both engines replay bit-identically.

Scale shape: a single narrow projection — no shuffle, no Python, whole
corpus in one codegen stage; at 100 TB this is the cheapest class of
operator the engine has (the same shape as ``clean_documents``).

Reference analogue: none (the migration tool moves values verbatim);
extends the SURVEY §2C text-quality family. Patterns follow the
common-crawl-pipeline convention of typed placeholder tokens.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

# (name, pattern, replacement) — ORDER IS THE CONTRACT: each stage
# counts and redacts on the previous stage's output.
PII_PATTERNS: tuple[tuple[str, str, str], ...] = (
    (
        "email",
        r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}",
        "<EMAIL>",
    ),
    (
        "ipv4",
        r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b",
        "<IP>",
    ),
    (
        "phone",
        r"\b\d{3}[-.]\d{3}[-.]\d{4}\b",
        "<PHONE>",
    ),
)


def redact_pii(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """``(id, text, n_email, n_ipv4, n_phone)`` — the redacted text and
    the per-type hit counts, in the fixed email→ipv4→phone chain."""
    cur = F.col(text_col)
    counts = []
    for name, pat, rep in PII_PATTERNS:
        counts.append(
            F.size(F.regexp_extract_all(cur, F.lit(pat), F.lit(0)))
            .cast("long")
            .alias(f"n_{name}")
        )
        cur = F.regexp_replace(cur, pat, rep)
    return df.select(
        F.col(id_col),
        cur.alias(text_col),
        *counts,
    )


def redact_pii_sql(
    docs_sql: str,
    text_expr: str = "text",
    id_expr: str = "doc_id",
) -> str:
    """DuckDB twin of ``redact_pii`` — identical patterns, identical
    chain (RE2 needs the explicit 'g' flag Spark implies). The output
    id column is always named ``doc_id``; for oracle comparison the
    Spark side's ``id_col`` must carry the same name (the default)."""
    stages = [f"SELECT {id_expr} AS doc_id, {text_expr} AS t0 FROM docs"]
    for i, (name, pat, rep) in enumerate(PII_PATTERNS):
        stages.append(
            f"SELECT doc_id, "
            f"CAST(len(regexp_extract_all(t{i}, '{pat}')) AS BIGINT) "
            f"AS n_{name}, "
            f"regexp_replace(t{i}, '{pat}', '{rep}', 'g') AS t{i + 1}"
            + (
                ", " + ", ".join(f"n_{n}" for n, _, _ in PII_PATTERNS[:i])
                if i
                else ""
            )
            + f" FROM s{i}"
        )
    ctes = ",\n".join(
        f"s{i} AS ({q})" for i, q in enumerate(stages)
    )
    names = ", ".join(f"n_{n}" for n, _, _ in PII_PATTERNS)
    return (
        f"WITH docs AS ({docs_sql}),\n{ctes}\n"
        f"SELECT doc_id, t{len(PII_PATTERNS)} AS text, {names} "
        f"FROM s{len(PII_PATTERNS)}"
    )
