"""Corpus-cleaning pipeline — the LLM-data counterpart of workflow.py's
migration pipelines: one composition that takes a raw document corpus to
training-ready windows, each stage an operator this engine already
oracle-verifies individually.

Stage order follows standard practice (cheap narrow filters first, the
expensive pairwise stage last, packing over survivors only):

1. quality + language gate       (text.py — codegen predicate, no shuffle)
2. exact dedup                   (dedup.py — one combinable shuffle)
3. near dedup, greedy survivors  (dedup.py — LSH bucket join, never all-pairs)
4. eval-set decontamination      (dedup.py — distinct-shingle semi-join)
5. training-window packing       (text.py — per-bucket cumsum)

Every stage consumes/returns a DataFrame, so the composition is ONE
lazy plan per output; a ``report`` of per-stage counts is optional and
costs one count job per stage when requested (counts are the only
driver-side values — no data ever collects).
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, functions as F

from nosql_to_sql_migration_tool_spark.operators.dedup import (
    contamination_scores,
    dedup_exact,
    dedup_keep_best,
    dedup_near,
)
from nosql_to_sql_migration_tool_spark.operators.text import (
    assign_training_windows,
    tokens,
    with_lang_guess,
    with_text_stats,
)


@dataclass
class CorpusCleanReport:
    n_input: int
    n_quality: int
    n_exact: int
    n_near: int
    n_clean: int


def clean_corpus(
    docs: DataFrame,
    eval_set: DataFrame,
    min_quality: float = 0.3,
    lang: str = "en",
    near_threshold: float = 0.6,
    max_contamination: float = 0.5,
    budget_tokens: int = 256,
    text_col: str = "text",
    id_col: str = "doc_id",
    report: bool = False,
    keep_best: bool = False,
) -> tuple[DataFrame, DataFrame, CorpusCleanReport | None]:
    """Run the full cleaning pipeline. Returns ``(clean_docs, windows,
    report)`` — the surviving documents, their training-window
    assignment, and per-stage counts when ``report=True``.

    ``keep_best=True`` swaps greedy min-id near-dedup for quality-aware
    survivorship: one doc per transitive near-dup component, keeping
    the longest copy (``dedup_keep_best``) — slightly costlier (label
    propagation over the pair edges) but the survivor set a training
    corpus actually wants."""
    quality = (
        with_lang_guess(with_text_stats(docs, text_col), text_col)
        .filter(
            (F.col("quality_score") >= min_quality)
            & (F.col("lang_guess") == lang)
        )
        .select(*docs.columns)
    )
    exact = dedup_exact(quality, text_col, id_col)
    if keep_best:
        survivors = dedup_keep_best(
            exact,
            score=F.size(tokens(F.col(text_col))).cast("bigint"),
            text_col=text_col,
            id_col=id_col,
            threshold=near_threshold,
        ).select(id_col)
        near = exact.join(survivors, id_col, "left_semi")
    else:
        near = dedup_near(exact, text_col, id_col, near_threshold)
    contaminated = (
        contamination_scores(near, eval_set, text_col, id_col)
        .filter(F.col("contamination") > max_contamination)
        .select(id_col)
    )
    clean = near.join(contaminated, id_col, "left_anti")
    windows = assign_training_windows(
        clean, budget_tokens=budget_tokens, text_col=text_col, id_col=id_col
    )
    rep = None
    if report:
        rep = CorpusCleanReport(
            n_input=docs.count(),
            n_quality=quality.count(),
            n_exact=exact.count(),
            n_near=near.count(),
            n_clean=clean.count(),
        )
    return clean, windows, rep
