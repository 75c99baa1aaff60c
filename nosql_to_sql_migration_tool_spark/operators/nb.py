"""Multinomial naive-Bayes document classifier — the trained text
classifier of fastText/CLD-style pipeline stages (quality or language
classification), restated Spark-first with a PINNED integer-surprisal
model so two engines replay identical scores bit-for-bit.

Reference analogue: none — the migration tool has no text analytics;
this closes the VERDICT r6 "trained quality classifier" gap in the
north-star text-analysis surface, complementing the untrained signals
(``text.py:quality_scores``) and the character-level trained model
(``charlm.py``).

Scale shape (the charlm/mini-BPE pin-and-replay discipline):

- TRAINING is two combinable count aggregates: class priors (one
  groupBy over the label column — |classes| rows) and per-(class,
  token) counts over a BOUNDED vocab (global top-k tokens by count —
  the driver ships top_k + |classes|·top_k rows, never the corpus);
- the MODEL is pinned as integer microbits: per class a prior
  surprisal ``-log2(n_class / n_docs)`` and an OOV floor (Laplace
  zero-count mass), per (class, token) the smoothed conditional
  surprisal ``-log2((cnt + 1) / (class_vocab_total + V))``. log2 runs
  ONCE at training; scoring never touches libm (the cross-engine hash
  contract of ``charlm.py:115``);
- SCORING is one token explode + per-class broadcast map-literal
  lookups (``try_element_at`` — no join, no shuffle before the per-doc
  agg) + LONG sums, one sum column per class in a SINGLE combinable
  groupBy. The argmin class falls out of ``array_sort`` over
  ``(total, class)`` structs — deterministic ties (class ascending) on
  both engines. At 100 TB: linear whole-stage-codegen projection, one
  map-side-combinable shuffle keyed by doc id, model broadcast with
  the plan.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, functions as F

from nosql_to_sql_migration_tool_spark.operators.text import (
    tokens,
    tokens_sql,
)

MICRO = 1_000_000

# model = (classes, table):
#   classes: [(cls, prior_microbits, floor_microbits)]  — class asc
#   table:   [(cls, token, surprisal_microbits)]        — (cls, token) asc
NBModel = tuple[list[tuple[str, int, int]], list[tuple[str, str, int]]]


def _sql_quote(s: str) -> str:
    return s.replace("'", "''")


def learn_naive_bayes(
    df: DataFrame,
    label_col: str = "lang",
    text_col: str = "text",
    top_k: int = 64,
) -> NBModel:
    """Train the classifier and return the PINNED integer model.

    Vocab = global top-k tokens (count DESC, token ASC — deterministic);
    per class ``den = (class total count over vocab) + V`` (Laplace),
    ``su(c, t) = -log2((cnt(c, t) + 1) / den)``, OOV floor
    ``-log2(1 / den)``. Driver traffic is bounded by top_k·|classes|."""
    toked = df.filter(F.length(F.trim(F.col(text_col))) > 0).select(
        F.col(label_col).alias("__cls"),
        F.explode(tokens(F.col(text_col))).alias("__tok"),
    )
    vocab = [
        r["__tok"]
        for r in toked.groupBy("__tok")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.col("n").desc(), F.col("__tok"))
        .limit(top_k)
        .collect()
    ]
    v = len(vocab)
    cls_tok = {
        (r["__cls"], r["__tok"]): r["n"]
        for r in toked.filter(F.col("__tok").isin(vocab))
        .groupBy("__cls", "__tok")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    priors_n = {
        r["__cls"]: r["n"]
        for r in df.filter(F.length(F.trim(F.col(text_col))) > 0)
        .groupBy(F.col(label_col).alias("__cls"))
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    n_docs = sum(priors_n.values())
    classes: list[tuple[str, int, int]] = []
    table: list[tuple[str, str, int]] = []
    for cls in sorted(priors_n):
        den = sum(
            cls_tok.get((cls, t), 0) for t in vocab
        ) + v
        prior_su = round(-math.log2(priors_n[cls] / n_docs) * MICRO)
        floor_su = round(-math.log2(1 / den) * MICRO)
        classes.append((cls, prior_su, floor_su))
        for t in sorted(vocab):
            table.append(
                (cls, t, round(-math.log2((cls_tok.get((cls, t), 0) + 1) / den) * MICRO))
            )
    return classes, table


def nb_score(
    df: DataFrame,
    model: NBModel,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Score every non-empty document:
    ``(id, n_tokens, pred_cls, best_bits_per_token, margin_bits)`` —
    the argmin-surprisal class, its per-token cross-entropy, and the
    bits separating it from the runner-up (the classifier-confidence
    signal a quality filter thresholds on)."""
    classes, table = model
    per_cls_map = {
        cls: F.create_map(
            *[
                F.lit(x)
                for c, t, su in table
                if c == cls
                for x in (t, su)
            ]
        )
        for cls, _p, _f in classes
    }
    sums = [
        F.sum(
            F.coalesce(
                F.try_element_at(per_cls_map[cls], F.col("__tok")),
                F.lit(floor).cast("long"),
            ).cast("long")
        ).alias(f"__s_{i}")
        for i, (cls, _prior, floor) in enumerate(classes)
    ]
    agg = (
        df.filter(F.length(F.trim(F.col(text_col))) > 0)
        .select(F.col(id_col), F.explode(tokens(F.col(text_col))).alias("__tok"))
        .groupBy(id_col)
        .agg(F.count(F.lit(1)).alias("n_tokens"), *sums)
    )
    ranked = F.array_sort(
        F.array(
            *[
                F.struct(
                    (F.col(f"__s_{i}") + F.lit(prior).cast("long")).alias(
                        "total"
                    ),
                    F.lit(cls).alias("cls"),
                )
                for i, (cls, prior, _floor) in enumerate(classes)
            ]
        )
    )
    return agg.select(
        F.col(id_col),
        "n_tokens",
        ranked[0]["cls"].alias("pred_cls"),
        F.round(
            ranked[0]["total"].cast("double")
            / (F.lit(float(MICRO)) * F.col("n_tokens")),
            6,
        ).alias("best_bits_per_token"),
        F.round(
            (ranked[1]["total"] - ranked[0]["total"]).cast("double")
            / F.lit(float(MICRO)),
            6,
        ).alias("margin_bits"),
    )


def nb_score_sql(
    model: NBModel,
    table_name: str = "documents",
    text_expr: str = "text",
    id_expr: str = "doc_id",
) -> str:
    """DuckDB twin of ``nb_score`` — the pinned model replayed as
    VALUES tables (LEFT JOIN + coalesce = the per-class OOV floor)."""
    classes, table = model
    cls_vals = ",\n  ".join(
        f"('{_sql_quote(c)}', {p}::BIGINT, {fl}::BIGINT)"
        for c, p, fl in classes
    )
    tbl_vals = ",\n  ".join(
        f"('{_sql_quote(c)}', '{_sql_quote(t)}', {su}::BIGINT)"
        for c, t, su in table
    )
    return f"""
WITH __cls(cls, prior_su, floor_su) AS (VALUES
  {cls_vals}
),
__tbl(cls, tok, su) AS (VALUES
  {tbl_vals}
),
__toks AS (
  SELECT {id_expr} AS doc_id, unnest({tokens_sql(text_expr)}) AS tok
  FROM {table_name} WHERE length(trim({text_expr})) > 0
),
__scored AS (
  SELECT t.doc_id, c.cls,
         c.prior_su + sum(coalesce(x.su, c.floor_su)) AS total,
         count(*) AS n_tokens
  FROM __toks t
  CROSS JOIN __cls c
  LEFT JOIN __tbl x ON x.cls = c.cls AND x.tok = t.tok
  GROUP BY t.doc_id, c.cls, c.prior_su
),
__ranked AS (
  SELECT *,
         row_number() OVER (PARTITION BY doc_id ORDER BY total, cls) AS rk
  FROM __scored
)
SELECT doc_id,
       max(n_tokens) AS n_tokens,
       max(CASE WHEN rk = 1 THEN cls END) AS pred_cls,
       round(CAST(max(CASE WHEN rk = 1 THEN total END) AS DOUBLE)
             / ({MICRO}.0 * max(n_tokens)), 6) AS best_bits_per_token,
       round(CAST(max(CASE WHEN rk = 2 THEN total END)
                  - max(CASE WHEN rk = 1 THEN total END) AS DOUBLE)
             / {MICRO}.0, 6) AS margin_bits
FROM __ranked
GROUP BY doc_id
"""
