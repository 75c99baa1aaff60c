"""Mini-BPE vocabulary induction (operators/bpe.py): learning goldens
against a pure-python reference, the pinned-vocabulary replay contract,
and cross-engine application-rule parity."""

from __future__ import annotations

import duckdb
from pyspark.sql import functions as F

from nosql_to_sql_migration_tool_spark.operators.bpe import (
    bpe_apply_sql,
    bpe_subwords,
    learn_bpe_merges,
    word_frequency_table,
)

SF_DIR_SMOKE = "/root/testdata/sf0.001"


def _reference_learn(word_weights: dict[str, int], n_merges: int,
                     min_count: int = 2) -> list[tuple[str, str]]:
    """Pure-python twin of learn_bpe_merges: overlapping-adjacency pair
    counts, (count DESC, pair ASC) argmax, replace-based application."""
    seqs = {f" {' '.join(w)} ": c for w, c in word_weights.items()}
    merges = []
    for _ in range(n_merges):
        counts: dict[tuple[str, str], int] = {}
        for seq, c in seqs.items():
            syms = seq.split()
            for a, b in zip(syms, syms[1:]):
                counts[(a, b)] = counts.get((a, b), 0) + c
        if not counts:
            break
        best = min(counts.items(), key=lambda kv: (-kv[1], kv[0]))
        if best[1] < min_count:
            break
        (a, b) = best[0]
        merges.append((a, b))
        seqs = {
            s.replace(f" {a} {b} ", f" {a}{b} "): c for s, c in seqs.items()
        }
    return merges


def test_learning_matches_reference_on_classic_corpus(spark):
    weights = {"low": 5, "lower": 2, "newest": 6, "widest": 3}
    text = " ".join(w for w, c in weights.items() for _ in range(c))
    docs = spark.createDataFrame([(text,)], "text string")
    got = learn_bpe_merges(docs, n_merges=6, train_limit=None)
    assert got == _reference_learn(weights, 6)
    # the paper's canonical first merges: es, est, lo, low
    assert got[:4] == [("e", "s"), ("es", "t"), ("l", "o"), ("lo", "w")]


def test_pinned_vocabulary_rederives_from_smoke_corpus(spark):
    """The pin-and-replay contract: BPE_PINNED_MERGES must be exactly
    what learning produces from the sf0.001 corpus with the documented
    parameters — vocabulary drift breaks this, not the driver hash."""
    from nosql_to_sql_migration_tool_spark.queries import BPE_PINNED_MERGES
    from nosql_to_sql_migration_tool_spark.sources.registry import load_table

    docs = load_table(spark, SF_DIR_SMOKE, "documents")
    got = learn_bpe_merges(docs, n_merges=24, train_limit=256)
    assert got == BPE_PINNED_MERGES


def test_apply_parity_spark_vs_duckdb_on_adversarial_runs(spark):
    """The application rule (sequential left-to-right non-overlapping
    replace, scan resumes after the replacement) must agree between
    Java UTF8String.replace and DuckDB replace — exercised where
    rescan-greedy BPE would differ: runs of identical symbols."""
    merges = [("a", "a"), ("aa", "aa"), ("b", "a"), ("l", "o")]
    words = ["aaaa", "aaa", "aaaaa", "bababa", "baaab", "lol", "x", "alola"]
    sdf = spark.createDataFrame([(w,) for w in words], "w string")
    got = {
        r["w"]: list(r["sub"])
        for r in sdf.select(
            "w", bpe_subwords(F.col("w"), merges).alias("sub")
        ).collect()
    }
    con = duckdb.connect()
    sql = bpe_apply_sql("w", merges)
    for w in words:
        duck = con.sql(
            f"SELECT string_split(trim({sql}), ' ') FROM (SELECT '{w}' AS w)"
        ).fetchone()[0]
        assert got[w] == duck, w
    # subwords concatenate back to the word — segmentation, never loss
    assert all("".join(subs) == w for w, subs in got.items())


def test_learning_early_stop_and_degenerate_words(spark):
    docs = spark.createDataFrame(
        [("a b c d e f g h i j",)], "text string"  # all hapax pairs... none
    )
    # every word is a single char: no pairs at all -> no merges
    assert learn_bpe_merges(docs, n_merges=5, train_limit=None) == []
    docs2 = spark.createDataFrame([("ab ab cd",)], "text string")
    # ('a','b') count 2 passes min_count; ('c','d') count 1 stops
    assert learn_bpe_merges(docs2, n_merges=5, train_limit=None) == [
        ("a", "b")
    ]


def test_word_frequency_table_bound_and_determinism(spark):
    docs = spark.createDataFrame(
        [("z z z a a b",), ("b c",)], "text string"
    )
    rows = word_frequency_table(docs, train_limit=3).collect()
    assert [(r["word"], r["weight"]) for r in rows] == [
        ("z", 3), ("a", 2), ("b", 2)  # count DESC, word ASC tiebreak
    ]


def test_apply_matches_python_replace_reference_property():
    """Property pin of the application rule: for arbitrary words and
    merge lists the generated DuckDB replace chain must equal the
    pure-python sequential str.replace reference (Java-side parity is
    pinned batch-wise in test_apply_parity_spark_vs_duckdb). Hundreds
    of cases, no Spark job per example."""
    from hypothesis import given, settings, strategies as st

    merge_pool = [
        ("a", "b"), ("a", "a"), ("aa", "a"), ("ab", "a"),
        ("b", "b"), ("aa", "aa"), ("b", "ab"),
    ]
    words_st = st.lists(
        st.text(alphabet="ab", min_size=1, max_size=8),
        min_size=1, max_size=5,
    )
    merges_st = st.permutations(merge_pool).map(lambda p: list(p)[:4])

    def py_apply(word, merges):
        seq = " " + " ".join(word) + " "
        for l, r in merges:
            seq = seq.replace(f" {l} {r} ", f" {l}{r} ")
        return seq.split()

    @settings(max_examples=60, deadline=None)
    @given(words_st, merges_st)
    def prop(words, merges):
        con = duckdb.connect()
        sql = bpe_apply_sql("w", merges)
        for w in words:
            got = con.sql(
                f"SELECT string_split(trim({sql}), ' ') "
                f"FROM (SELECT '{w}' AS w)"
            ).fetchone()[0]
            want = py_apply(w, merges)
            assert got == want, (w, merges, got, want)
            assert "".join(got) == w  # segmentation, never loss
        con.close()

    prop()
