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


def test_shingle_rows_matches_shingle_sets_explode(spark):
    """The explode-first row builder must produce exactly the shingle
    set that shingle_sets -> explode produces, for long, short and
    empty docs alike; distinct=False may only add duplicates."""
    from nosql_to_sql_migration_tool_spark.operators.dedup import (
        shingle_sets,
    )
    from nosql_to_sql_migration_tool_spark.operators.text import (
        shingle_rows,
    )

    df = _df(
        spark,
        "a b c d e f g",
        "a b c d e a b c d e",  # repeated shingles
        "one two",  # shorter than k
        "",
    )
    via_sets = {
        (r["doc_id"], r["__s"])
        for r in shingle_sets(df)
        .select("doc_id", F.explode("__sh").alias("__s"))
        .collect()
    }
    via_rows = {
        (r["doc_id"], r["__s"]) for r in shingle_rows(df).collect()
    }
    assert via_rows == via_sets
    dup_rows = shingle_rows(df, distinct=False).collect()
    assert {(r["doc_id"], r["__s"]) for r in dup_rows} == via_sets
    # the repeated-shingle doc contributes duplicate rows without distinct
    assert len(dup_rows) > len(via_sets)


def test_tfidf_scores_hand_computed(spark):
    """tf * (N/df) on a 4-doc fixture, verified against hand arithmetic."""
    from nosql_to_sql_migration_tool_spark.operators.text import (
        tfidf_scores,
    )

    df = _df(
        spark,
        "spark spark table",  # tf(spark)=2 tf(table)=1
        "table window",
        "window window window",
        "nothing relevant here",
    )
    got = {
        r["doc_id"]: r["score"]
        for r in tfidf_scores(df, ("spark", "table", "window")).collect()
    }
    # N=4; df(spark)=1, df(table)=2, df(window)=2
    assert got[0] == round(2 * 4 / 1 + 1 * 4 / 2, 6)
    assert got[1] == round(1 * 4 / 2 + 1 * 4 / 2, 6)
    assert got[2] == round(3 * 4 / 2, 6)
    assert 3 not in got  # no matching terms -> no row


def test_repetition_flags_edges(spark):
    from nosql_to_sql_migration_tool_spark.operators.text import (
        repetition_flags,
    )

    looped = "spam ham " * 20  # one bigram dominates; 5-grams all repeat
    clean = " ".join(f"w{i} tok{i}" for i in range(20))  # 40 distinct tokens
    rows = {
        r["doc_id"]: r
        for r in repetition_flags(
            _df(spark, "", "tiny doc", looped.strip(), clean)
        ).collect()
    }
    assert rows[0]["n_tokens"] == 0 and rows[0]["keep"] == 0
    # 2-token doc: its single bigram occupies 100%; no 5-grams exist
    # (coalesced to 0) — and the length rule rejects it regardless
    assert rows[1]["top_bigram_share"] == 1.0
    assert rows[1]["dup_5gram_frac"] == 0.0
    assert rows[1]["keep"] == 0
    # looped doc: "spam ham" is 20 of 39 bigrams; every 5-gram repeats
    r = rows[2]
    assert abs(r["top_bigram_share"] - 20 / 39) < 1e-6
    assert r["dup_5gram_frac"] > 0.9
    assert r["keep"] == 0
    # clean doc passes every rule
    assert rows[3]["keep"] == 1
    assert rows[3]["dup_5gram_frac"] == 0.0


def test_bpe_token_count_goldens(spark):
    """GPT-2-ish pretokens: contractions split, punctuation runs are
    tokens, space-prefixed word runs count once each."""
    from nosql_to_sql_migration_tool_spark.operators.text import (
        bpe_token_count,
    )

    cases = [
        ("The quick brown fox doesn't jump over 42 lazy dogs!!", 12),
        ("  leading space, punct... and CamelCase Words123 mixed", 10),
        ("it's we're I'll they'd you've I'm can't", 14),
        ("", 0),
    ]
    df = spark.createDataFrame(cases, "text string, expected int")
    rows = df.select(
        bpe_token_count(df.text).alias("got"), "expected"
    ).collect()
    for r in rows:
        assert r["got"] == r["expected"], r


def test_vocab_growth_hand_case_and_cumulative(spark):
    """Heaps-law curve on a hand corpus: first-arrival accounting, slab
    stats, cumulative vocabulary, and empty-doc handling."""
    from nosql_to_sql_migration_tool_spark.operators.text import vocab_growth

    rows = [
        (0, "a b a"),          # types a,b arrive in bucket 0
        (1, "b c"),            # c arrives in bucket 0
        (2, "   "),            # empty: 1 doc, 0 tokens
        (3, "a d"),            # d arrives in bucket 1
        (5, "d e e"),          # e arrives in bucket 1
        (7, "a b c"),          # nothing new in bucket 2 (wait: 7//3=2)
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    got = {
        r["bucket"]: (
            r["n_docs"], r["n_tokens"], r["new_types"], r["cum_types"]
        )
        for r in vocab_growth(df, bucket_docs=3).collect()
    }
    assert got == {
        0: (3, 5, 3, 3),   # docs 0,1,2; tokens 3+2+0; new a,b,c
        1: (2, 5, 2, 5),   # docs 3,5; tokens 2+3; new d,e
        2: (1, 3, 0, 5),   # doc 7; no new types
    }


def test_vocab_growth_cross_engine_parity(spark):
    """Full value parity over the documents corpus."""
    import duckdb

    from nosql_to_sql_migration_tool_spark.operators.text import (
        vocab_growth,
        vocab_growth_sql,
    )
    from nosql_to_sql_migration_tool_spark.sources.registry import load_table
    from tests.conftest import SF_DIR_SMOKE

    docs = load_table(spark, SF_DIR_SMOKE, "documents").select(
        "doc_id", "text"
    )
    got = {
        tuple(r) for r in vocab_growth(docs, bucket_docs=50).collect()
    }
    con = duckdb.connect()
    want = {
        tuple(r)
        for r in con.execute(
            vocab_growth_sql(
                "SELECT doc_id, text FROM "
                f"read_parquet('{SF_DIR_SMOKE}/documents.parquet')",
                bucket_docs=50,
            )
        ).fetchall()
    }
    con.close()
    assert got == want and len(got) > 1
    # the curve is a valid cumulative: nondecreasing, ends at total vocab
    by_bucket = sorted(got)
    cums = [r[4] for r in by_bucket]
    assert cums == sorted(cums)
    assert cums[-1] == sum(r[3] for r in by_bucket)


def test_token_fertility_by_parity_and_semantics(spark):
    """Per-language tokenizer fertility: exact BIGINT sums, 6-dp ratio,
    whole relation bit-identical in DuckDB; a punctuation-dense string
    shows fertility > 1 (the statistic's point)."""
    import duckdb

    from nosql_to_sql_migration_tool_spark.operators.text import (
        token_fertility_by,
        token_fertility_by_sql,
    )
    from nosql_to_sql_migration_tool_spark.sources.registry import load_table
    from tests.conftest import SF_DIR_SMOKE

    docs = load_table(spark, SF_DIR_SMOKE, "documents").select("lang", "text")
    got = {
        r["lang"]: (
            r["n_docs"], r["ws_tokens"], r["bpe_tokens"], r["fertility"]
        )
        for r in token_fertility_by(docs, "lang").collect()
    }
    con = duckdb.connect()
    want = {
        r[0]: (r[1], r[2], r[3], r[4])
        for r in con.execute(
            token_fertility_by_sql(
                "SELECT lang, text FROM "
                f"read_parquet('{SF_DIR_SMOKE}/documents.parquet')",
                "lang",
            )
        ).fetchall()
    }
    con.close()
    assert got == want and len(got) >= 4
    assert all(f >= 1.0 for (_, _, _, f) in got.values())

    # hand case incl. the empty-group guard
    hand = spark.createDataFrame(
        [("a", "don't stop, it's fine."), ("b", "")],
        ["grp", "text"],
    )
    rows = {
        r["grp"]: (r["ws_tokens"], r["bpe_tokens"], r["fertility"])
        for r in token_fertility_by(hand, "grp").collect()
    }
    ws, bpe, fert = rows["a"]
    assert bpe > ws and fert > 1.0
    assert rows["b"] == (0, 0, 0.0)


def test_token_entropy_hand_cases_and_parity(spark):
    """Round 12: unigram entropy in integer micros — the repetition/
    gibberish signal the length-ratio filters can't see. Hand cases pin
    the formula ends (single-type -> 0, all-distinct -> ln(n), empty ->
    NULL); the whole real corpus hash-matches DuckDB."""
    import math

    import duckdb

    from nosql_to_sql_migration_tool_spark.operators.text import (
        token_entropy,
        token_entropy_sql,
    )

    from nosql_to_sql_migration_tool_spark.sources.registry import (
        load_table,
    )
    from tests.conftest import SF_DIR_SMOKE

    hand = spark.createDataFrame(
        [(1, "a a a a"), (2, "a b c d"), (3, ""), (4, "x x y y")],
        ["doc_id", "text"],
    )
    got = {
        r["doc_id"]: (r["n_tokens"], r["n_types"], r["entropy_micro"])
        for r in token_entropy(hand).collect()
    }
    ln_micro = lambda x: round(round(math.log(x), 6) * 1e6)  # noqa: E731
    assert got[1] == (4, 1, 0)
    assert got[2] == (4, 4, ln_micro(4))
    assert got[3] == (0, 0, None)
    # two types, two tokens each: ln(4) - (2*ln_micro(2)*2)/4
    assert got[4] == (4, 2, ln_micro(4) - round(4 * ln_micro(2) / 4))
    # a looped phrase scores far below a diverse doc of the same length
    rep = spark.createDataFrame(
        [(1, "buy now " * 200), (2, " ".join(f"w{i}" for i in range(400)))],
        ["doc_id", "text"],
    )
    s = {r["doc_id"]: r["entropy_micro"] for r in token_entropy(rep).collect()}
    assert s[1] < s[2] / 5

    docs = load_table(spark, SF_DIR_SMOKE, "documents").select(
        "doc_id", "text"
    )
    mine = sorted(tuple(r) for r in token_entropy(docs).collect())
    con = duckdb.connect()
    want = sorted(
        tuple(r)
        for r in con.execute(
            token_entropy_sql(
                f"SELECT doc_id, text FROM "
                f"'{SF_DIR_SMOKE}/documents.parquet'"
            )
        ).fetchall()
    )
    con.close()
    assert mine == want


def test_token_entropy_plan_invariants(spark):
    """Two combinable shuffles, no Python stage, no global window, scan
    pruned to (doc_id, text)."""
    from nosql_to_sql_migration_tool_spark.operators.text import (
        token_entropy,
    )
    from nosql_to_sql_migration_tool_spark.plans.audit import (
        cartesian_products,
        global_windows,
        python_stage_count,
        read_schemas,
    )
    from nosql_to_sql_migration_tool_spark.sources.registry import (
        load_table,
    )
    from tests.conftest import SF_DIR_SMOKE

    docs = load_table(spark, SF_DIR_SMOKE, "documents")
    df = token_entropy(docs)
    assert python_stage_count(df) == 0
    assert cartesian_products(df) == 0
    assert global_windows(df) == 0
    for schema in read_schemas(df):
        assert "n_chars" not in schema and "lang" not in schema
