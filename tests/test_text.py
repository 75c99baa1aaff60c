"""Edge-case units for the text operators (operators/text.py); the
oracle-parity suite covers corpus-level cross-engine values."""

from __future__ import annotations

from pyspark.sql import functions as F

from nosql_to_sql_migration_tool_spark.operators.text import (
    token_frequencies,
    with_fingerprints,
    with_lang_guess,
    with_text_stats,
)


def _df(spark, *texts):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )


def test_stats_edge_cases(spark):
    rows = {
        r["doc_id"]: r
        for r in with_text_stats(
            _df(spark, "", "   ", "one", "a b! c, the the", "x " * 200)
        ).collect()
    }
    assert rows[0]["n_ws_tokens"] == 0 and rows[1]["n_ws_tokens"] == 0
    assert rows[2]["n_ws_tokens"] == 1
    r = rows[3]  # "a b! c, the the" -> 5 tokens, 2 punct, 3 stopwords
    assert r["n_ws_tokens"] == 5
    assert r["n_re_tokens"] == 5
    assert abs(r["punct_ratio"] - 2 / 15) < 1e-6
    assert abs(r["stopword_ratio"] - 3 / 5) < 1e-6
    assert rows[4]["quality_score"] == 1.0  # 200 clean tokens, no stopwords


def test_lang_guess_markers_and_unknown(spark):
    rows = {
        r["doc_id"]: r["lang_guess"]
        for r in with_lang_guess(
            _df(
                spark,
                "the table and the chair",
                "der hund und die katze",
                "le chat et la maison les",
                "xyz qrs",
            )
        ).collect()
    }
    assert rows[0] == "en"
    assert rows[1] == "de"
    assert rows[2] == "fr"
    assert rows[3] == "unknown"


def test_fingerprints(spark):
    rows = {
        r["doc_id"]: r
        for r in with_fingerprints(
            _df(
                spark,
                "a b c d e",
                "  A  b   c d e ",  # same canonical text
                "z z a b c d e",  # shares shingles with doc 0
                "ab",  # shorter than shingle size
            )
        ).collect()
    }
    assert rows[0]["exact_fp"] == rows[1]["exact_fp"]
    # shingle fp survives a prefix edit when the minimal shingle remains
    assert rows[0]["shingle_fp"] == rows[2]["shingle_fp"]
    assert rows[3]["shingle_fp"] is not None


def test_token_frequencies(spark):
    freqs = {
        r["token"]: r["cnt"]
        for r in token_frequencies(_df(spark, "a b a", "b a")).collect()
    }
    assert freqs == {"a": 3, "b": 2}


def test_bigram_frequencies_counts_consecutive_pairs(spark):
    from nosql_to_sql_migration_tool_spark.operators.text import (
        bigram_frequencies,
    )

    df = spark.createDataFrame(
        [("a b a b",), ("a b",), ("solo",), ("",)], "text string"
    )
    counts = {
        r["bigram"]: r["cnt"] for r in bigram_frequencies(df).collect()
    }
    # "a b a b" -> [a b, b a, a b]; "a b" -> [a b]; short/empty contribute none
    assert counts == {"a b": 3, "b a": 1}
