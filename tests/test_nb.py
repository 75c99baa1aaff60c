"""Multinomial naive-Bayes (operators/nb.py): the pinned-model
re-derivation contract (same as CHARLM_PINNED / BPE_PINNED_MERGES), a
closed-form golden for the smoothed conditionals, OOV-floor scoring,
deterministic tie-breaks, and a genuine-signal corpus where the
classifier must reach perfect accuracy (the synthetic documents
fixture draws tokens independently of the label, so the registered
query can only verify mechanics — this test proves learning)."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from nosql_to_sql_migration_tool_spark.operators.nb import (
    MICRO,
    learn_naive_bayes,
    nb_score,
)
from nosql_to_sql_migration_tool_spark.queries import NB_CLASSES, NB_TABLE
from tests.conftest import SF_DIR_SMOKE


def test_pinned_model_rederives_exactly(spark):
    """The literal pinned in queries.py IS what training on sf0.001
    produces — learner drift (tokenization, vocab ranking, smoothing,
    rounding) breaks this before it can corrupt the oracle hash."""
    docs = spark.read.parquet(f"{SF_DIR_SMOKE}/documents.parquet")
    classes, table = learn_naive_bayes(docs, top_k=64)
    assert classes == NB_CLASSES
    assert table == NB_TABLE


def test_smoothed_conditionals_match_closed_form(spark):
    """Hand corpus, 2 classes. Class a: docs 'x x y' + 'x'. Class b:
    doc 'y y'. Vocab = {x, y} (V=2). den(a) = 4+2 = 6, den(b) = 2+2=4.
    su(a,x) = -log2(4/6)? No — Laplace: su(a,x) = -log2((3+1)/6),
    su(a,y) = -log2((1+1)/6), su(b,x) = -log2((0+1)/4),
    su(b,y) = -log2((2+1)/4); priors: a=2/3 docs, b=1/3;
    floors: -log2(1/6), -log2(1/4)."""
    df = spark.createDataFrame(
        [(1, "x x y", "a"), (2, "x", "a"), (3, "y y", "b")],
        "doc_id long, text string, lang string",
    )
    classes, table = learn_naive_bayes(df, top_k=8)
    su = {(c, t): s for c, t, s in table}
    mb = lambda p: round(-math.log2(p) * MICRO)  # noqa: E731
    assert su[("a", "x")] == mb(4 / 6)
    assert su[("a", "y")] == mb(2 / 6)
    assert su[("b", "x")] == mb(1 / 4)
    assert su[("b", "y")] == mb(3 / 4)
    by_cls = {c: (p, f) for c, p, f in classes}
    assert by_cls["a"] == (mb(2 / 3), mb(1 / 6))
    assert by_cls["b"] == (mb(1 / 3), mb(1 / 4))


def test_oov_pays_per_class_floor_and_ties_break_ascending(spark):
    """A doc of ONLY out-of-vocab tokens scores prior + n·floor per
    class; with equal totals the ascending class name wins."""
    train = spark.createDataFrame(
        [(1, "x", "a"), (2, "x", "b")],
        "doc_id long, text string, lang string",
    )
    model = learn_naive_bayes(train, top_k=8)
    classes, _ = model
    # identical priors, identical floors -> every doc is a tie
    assert len({(p, f) for _c, p, f in classes}) == 1
    scored = nb_score(
        spark.createDataFrame([(9, "zzz qqq")], "doc_id long, text string"),
        model,
    ).collect()[0]
    assert scored["pred_cls"] == "a"
    assert scored["n_tokens"] == 2
    assert scored["margin_bits"] == 0.0


def test_learns_real_signal_to_perfect_accuracy(spark):
    """Class-disjoint vocab: every 'spam' doc draws from one token set,
    every 'ham' doc from another. NB must classify a held-out mix with
    100% accuracy — proof the training signal actually flows through
    the pinned-integer scoring path."""
    rows = []
    for i in range(40):
        rows.append((i, "win cash prize now " * (1 + i % 3), "spam"))
    for i in range(40, 80):
        rows.append((i, "meeting agenda notes today " * (1 + i % 3), "ham"))
    train = spark.createDataFrame(rows, "doc_id long, text string, lang string")
    model = learn_naive_bayes(train, top_k=16)
    test = spark.createDataFrame(
        [(100, "cash prize"), (101, "agenda today notes"), (102, "win win")],
        "doc_id long, text string",
    )
    got = {
        r["doc_id"]: r["pred_cls"] for r in nb_score(test, model).collect()
    }
    assert got == {100: "spam", 101: "ham", 102: "spam"}
    # and on the training set itself: zero errors
    back = nb_score(train.drop("lang"), model)
    joined = back.join(train.select("doc_id", "lang"), "doc_id")
    assert joined.filter(F.col("pred_cls") != F.col("lang")).count() == 0
