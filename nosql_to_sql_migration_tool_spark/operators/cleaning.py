"""Text cleaning for web-scale corpora: HTML stripping, PII masking,
whitespace/control-character normalization — the scrub pass that runs
before quality scoring and dedup in a training-data pipeline.

Everything here is a chain of ``regexp_replace`` projections — pure
whole-stage codegen, zero Python in the data path, trivially linear at
any corpus size. Patterns deliberately avoid lookarounds and other
constructs where Java regex (Spark) and RE2 (DuckDB) diverge, so the
oracle mirrors are the same expressions with the ``'g'`` flag.

Masking order is part of the contract: emails, then IPv4, then phone
numbers — the phone pattern would otherwise swallow dotted IPs. Counts
are extracted per stage from that stage's input, so both engines count
the same occurrences.

Reference analogue: the migration tool's value scrubbing before SQL
insertion (`private/Data_Migrator.ps1` string sanitization), generalized
to corpus text hygiene.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

HTML_TAG_RE = "<[^>]+>"
EMAIL_RE = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
IPV4_RE = "\\b[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\b"
PHONE_RE = "\\+?[0-9][0-9\\s().-]{7,}[0-9]"

_ENTITIES = [
    ("&nbsp;", " "),
    ("&lt;", "<"),
    ("&gt;", ">"),
    ("&quot;", '"'),
    ("&#39;", "'"),
    ("&amp;", "&"),  # last, so '&amp;lt;' decodes in one pass like a browser wouldn't
]


def strip_html(text: Column) -> Column:
    """Drop tags, decode the common entities, collapse whitespace."""
    out = F.regexp_replace(text, HTML_TAG_RE, " ")
    for ent, rep in _ENTITIES:
        out = F.replace(out, F.lit(ent), F.lit(rep))
    return F.trim(F.regexp_replace(out, "\\s+", " "))


def strip_html_sql(expr: str) -> str:
    out = f"regexp_replace({expr}, '{HTML_TAG_RE}', ' ', 'g')"
    for ent, rep in _ENTITIES:
        rep_sql = rep.replace("'", "''")
        out = f"replace({out}, '{ent}', '{rep_sql}')"
    return f"trim(regexp_replace({out}, '\\s+', ' ', 'g'))"


def mask_pii(text: Column) -> Column:
    """Emails -> <EMAIL>, IPv4 -> <IP>, phone-like runs -> <PHONE>."""
    out = F.regexp_replace(text, EMAIL_RE, "<EMAIL>")
    out = F.regexp_replace(out, IPV4_RE, "<IP>")
    return F.regexp_replace(out, PHONE_RE, "<PHONE>")


def mask_pii_sql(expr: str) -> str:
    out = f"regexp_replace({expr}, '{EMAIL_RE}', '<EMAIL>', 'g')"
    out = f"regexp_replace({out}, '{IPV4_RE}', '<IP>', 'g')"
    return f"regexp_replace({out}, '{PHONE_RE}', '<PHONE>', 'g')"


def with_clean_text(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """``(id, clean_text, n_emails, n_ips, n_phones)``: strip markup,
    count each PII class on its masking stage's input, mask. One
    projection, no shuffle."""
    stripped = strip_html(F.col(text_col))
    after_email = F.regexp_replace(stripped, EMAIL_RE, "<EMAIL>")
    after_ip = F.regexp_replace(after_email, IPV4_RE, "<IP>")
    return df.select(
        F.col(id_col),
        F.regexp_replace(after_ip, PHONE_RE, "<PHONE>").alias("clean_text"),
        F.size(F.regexp_extract_all(stripped, F.lit(EMAIL_RE), 0)).alias(
            "n_emails"
        ),
        F.size(F.regexp_extract_all(after_email, F.lit(IPV4_RE), 0)).alias(
            "n_ips"
        ),
        F.size(F.regexp_extract_all(after_ip, F.lit(PHONE_RE), 0)).alias(
            "n_phones"
        ),
    )


def with_clean_text_sql(
    text_expr: str, id_expr: str = "doc_id"
) -> str:
    """Projection list mirroring ``with_clean_text`` (no FROM clause)."""
    stripped = strip_html_sql(text_expr)
    after_email = f"regexp_replace({stripped}, '{EMAIL_RE}', '<EMAIL>', 'g')"
    after_ip = f"regexp_replace({after_email}, '{IPV4_RE}', '<IP>', 'g')"
    return (
        f"{id_expr}, "
        f"regexp_replace({after_ip}, '{PHONE_RE}', '<PHONE>', 'g')"
        f" AS clean_text, "
        f"CAST(len(regexp_extract_all({stripped}, '{EMAIL_RE}')) AS INT)"
        f" AS n_emails, "
        f"CAST(len(regexp_extract_all({after_email}, '{IPV4_RE}')) AS INT)"
        f" AS n_ips, "
        f"CAST(len(regexp_extract_all({after_ip}, '{PHONE_RE}')) AS INT)"
        f" AS n_phones"
    )
