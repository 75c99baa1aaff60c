"""Char-bigram LM scoring (operators/charlm.py): the pinned-model
re-derivation contract (same as BPE_PINNED_MERGES), a closed-form
golden, and the ANSI-safe floor path for unseen bigrams."""

from __future__ import annotations

import math

from nosql_to_sql_migration_tool_spark.operators.charlm import (
    bigram_counts,
    charlm_score,
    learn_char_lm,
)
from nosql_to_sql_migration_tool_spark.queries import (
    CHARLM_FLOOR,
    CHARLM_PINNED,
)
from tests.conftest import SF_DIR_SMOKE


def test_pinned_model_rederives_exactly(spark):
    """The literal pinned in queries.py IS what training on sf0.001
    produces — learner drift (extraction, normalization, ranking,
    rounding) breaks this before it can corrupt the oracle hash."""
    docs = spark.read.parquet(f"{SF_DIR_SMOKE}/documents.parquet")
    model, floor = learn_char_lm(docs)
    assert model == CHARLM_PINNED
    assert floor == CHARLM_FLOOR


def test_surprisal_matches_closed_form(spark):
    """Hand corpus: 'abab' + 'abc'. Bigrams: ab×3, ba×1, bc×1.
    prefix(a)=3, prefix(b)=2 ⇒ su(ab)=-log2(3/3)=0,
    su(ba)=-log2(1/2)=1e6 microbits, su(bc)=1e6."""
    df = spark.createDataFrame(
        [(1, "abab"), (2, "abc")], "doc_id long, text string"
    )
    model, floor = learn_char_lm(df)
    su = dict(model)
    assert su["ab"] == 0
    assert su["ba"] == 1_000_000
    assert su["bc"] == 1_000_000
    assert floor == 2_000_000  # max + one extra bit

    scored = {
        r["doc_id"]: r for r in charlm_score(df, model, floor).collect()
    }
    # doc 1: bigrams ab, ba, ab → (0 + 1e6 + 0) / 3e6 bits/char
    assert scored[1]["n_bigrams"] == 3
    assert scored[1]["bits_per_char"] == round(1 / 3, 6)
    # doc 2: ab, bc → (0 + 1e6) / 2e6
    assert scored[2]["bits_per_char"] == 0.5


def test_unseen_bigrams_pay_floor_not_error(spark):
    """ANSI mode makes a plain map subscript throw on a missing key;
    the scorer must take the floor instead (try_element_at)."""
    train = spark.createDataFrame([(1, "aaaa")], "doc_id long, text string")
    model, floor = learn_char_lm(train)
    test = spark.createDataFrame([(9, "zz")], "doc_id long, text string")
    row = charlm_score(test, model, floor).collect()[0]
    assert row["bits_per_char"] == round(floor / 1_000_000, 6)


def test_short_and_empty_docs_excluded(spark):
    df = spark.createDataFrame(
        [(1, "a"), (2, ""), (3, None), (4, "ab")],
        "doc_id long, text string",
    )
    model, floor = learn_char_lm(df)
    out = charlm_score(df, model, floor).collect()
    assert [r["doc_id"] for r in out] == [4]


def test_training_surprisal_is_conditional(spark):
    """surprisal uses count(c1c2)/count(c1·), not the global bigram
    share — verify against an independent recomputation from the raw
    histogram."""
    docs = spark.read.parquet(f"{SF_DIR_SMOKE}/documents.parquet")
    hist = {
        r["bigram"]: r["n"] for r in bigram_counts(docs).collect()
    }
    prefix: dict[str, int] = {}
    for bg, n in hist.items():
        prefix[bg[0]] = prefix.get(bg[0], 0) + n
    for bg, su in CHARLM_PINNED[:20]:
        expect = round(-math.log2(hist[bg] / prefix[bg[0]]) * 1_000_000)
        assert su == expect, bg
