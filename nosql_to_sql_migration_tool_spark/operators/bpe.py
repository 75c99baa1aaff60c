"""Mini-BPE vocabulary induction — iterative pair-merge learning over a
corpus, the tokenizer-building step of a training-data pipeline
(SURVEY.md §2C north-star "token counting" surface; complements
``text.py:bpe_token_count``'s fixed pretoken regex with a LEARNED
subword vocabulary).

Reference analogue: none — the migration tool has no text analytics;
the algorithm is Sennrich et al., "Neural Machine Translation of Rare
Words with Subword Units" (ACL 2016), restated Spark-first.

Scale shape (the Lloyd's discipline from ``similarity.kmeans_centroids``
applied to vocab learning):

- the TRAINING corpus is a bounded word-frequency table — top
  ``train_limit`` (word, weight) rows; vocabulary learning needs word
  TYPES with counts, not tokens, so even a 100 TB corpus collapses to
  one combinable groupBy before training starts;
- each merge round is ONE distributed job over that table (explode
  adjacent symbol pairs, weight, groupBy-sum) with exactly one row —
  the argmax pair — returned to the driver; the merge TABLE lives on
  the driver (metadata-sized, like k-means centroids or PQ codebooks);
- applying the learned vocabulary is a pure JVM expression fold
  (``bpe_apply_expr``): no Python in the tokenize path, so corpus-wide
  tokenization is whole-stage-codegen work.

Application semantics — pinned precisely because two engines replay it:
each merge ``(l, r)`` rewrites the space-delimited symbol string by ONE
sequential left-to-right non-overlapping literal ``replace`` of
``" l r "`` with ``" lr "`` (the scan resumes after each replacement —
Java ``UTF8String.replace`` and DuckDB ``replace`` agree on this).
This is the replace-based application of the original subword-nmt
implementation; it differs from rescan-greedy BPE only on runs of 3+
identical adjacent symbols (where the shared delimiter space makes the
second occurrence start inside the consumed region). Learning COUNTS
pairs by plain adjacency (overlapping, like the paper's
``zip(word, word[1:])``) and APPLIES with the same replace, so learner
and tokenizer can never disagree.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

from nosql_to_sql_migration_tool_spark.operators.text import tokens


def word_frequency_table(
    df: DataFrame,
    text_col: str = "text",
    train_limit: int | None = 256,
) -> DataFrame:
    """(word, weight) training table: pinned-tokenizer words with corpus
    frequencies, bounded to the ``train_limit`` most frequent (count
    DESC, word ASC — deterministic). ``None`` keeps every word type;
    pair counting stays distributed either way."""
    words = (
        df.select(F.explode(tokens(F.col(text_col))).alias("word"))
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("weight"))
    )
    if train_limit is not None:
        words = words.orderBy(F.col("weight").desc(), "word").limit(
            train_limit
        )
    return words


def _initial_seq(word: Column) -> Column:
    """`` h e l l o `` — one space around every symbol (single chars to
    start). ASCII-exact on both engines; '.' code-point semantics differ
    between Java regex and RE2 only outside the BMP."""
    return F.concat(F.lit(" "), F.regexp_replace(word, "(.)", "$1 "))


def learn_bpe_merges(
    df: DataFrame,
    text_col: str = "text",
    n_merges: int = 24,
    train_limit: int | None = 256,
    min_count: int = 2,
) -> list[tuple[str, str]]:
    """Learn ``n_merges`` BPE merges. Per round: explode adjacent symbol
    pairs of every training word, weight by word frequency, groupBy-sum,
    take the argmax (ties broken lexicographically — deterministic
    cross-run and cross-engine), rewrite the training sequences with the
    winning merge. Stops early when the best pair's weighted count falls
    below ``min_count`` (merging hapax pairs memorizes the sample).

    Driver traffic per round is ONE row; training-table size is bounded
    by ``train_limit`` word types, so total cost is independent of
    corpus row count — the same contract as ``kmeans_centroids``."""
    words = (
        word_frequency_table(df, text_col, train_limit)
        .select(_initial_seq(F.col("word")).alias("seq"), "weight")
        .localCheckpoint(eager=True)
    )
    merges: list[tuple[str, str]] = []
    for _ in range(n_merges):
        pairs = (
            words.withColumn("__arr", F.split(F.trim(F.col("seq")), " "))
            .select(
                # adjacent (overlapping) symbol pairs; try_element_at's
                # out-of-range probe at the last index yields r IS NULL
                # (ANSI-safe, unlike bracket indexing) and is filtered,
                # which also makes single-symbol words safe (sequence()
                # would flip DESCENDING for size < 2).
                F.explode(
                    F.expr(
                        "filter(transform(sequence(1, size(__arr)), "
                        "i -> struct(__arr[i-1] AS l, "
                        "try_element_at(__arr, i + 1) AS r)), "
                        "p -> p.r IS NOT NULL)"
                    )
                ).alias("p"),
                "weight",
            )
            .select("p.l", "p.r", "weight")
        )
        best = (
            pairs.groupBy("l", "r")
            .agg(F.sum("weight").alias("n"))
            .orderBy(F.col("n").desc(), "l", "r")
            .limit(1)
            .collect()
        )
        if not best or best[0]["n"] < min_count:
            break
        left, right = best[0]["l"], best[0]["r"]
        merges.append((left, right))
        words = words.select(
            F.replace(
                F.col("seq"),
                F.lit(f" {left} {right} "),
                F.lit(f" {left}{right} "),
            ).alias("seq"),
            "weight",
        ).localCheckpoint(eager=True)
    return merges


def bpe_apply_expr(word: Column, merges: list[tuple[str, str]]) -> Column:
    """Tokenize a word with a learned merge list: initial char sequence,
    then one literal replace per merge IN LEARNED ORDER — a pure
    expression fold, whole-stage-codegen, no Python. Returns the
    space-delimited subword string ``" lo w er "``."""
    seq = _initial_seq(word)
    for left, right in merges:
        seq = F.replace(
            seq, F.lit(f" {left} {right} "), F.lit(f" {left}{right} ")
        )
    return seq


def bpe_subwords(word: Column, merges: list[tuple[str, str]]) -> Column:
    """Subword array of a word under the merge list."""
    return F.split(F.trim(bpe_apply_expr(word, merges)), " ")


def _sql_quote(s: str) -> str:
    return s.replace("'", "''")


def bpe_apply_sql(expr: str, merges: list[tuple[str, str]]) -> str:
    """DuckDB twin of ``bpe_apply_expr`` for the same merge list —
    generated nested ``replace`` chain over the identical initial
    sequence, so the oracle replays the exact application rule."""
    seq = f"(' ' || regexp_replace({expr}, '(.)', '\\1 ', 'g'))"
    for left, right in merges:
        pat = _sql_quote(f" {left} {right} ")
        rep = _sql_quote(f" {left}{right} ")
        seq = f"replace({seq}, '{pat}', '{rep}')"
    return seq


def bpe_subword_count_sql(expr: str, merges: list[tuple[str, str]]) -> str:
    return f"len(string_split(trim({bpe_apply_sql(expr, merges)}), ' '))"
