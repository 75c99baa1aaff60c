"""BM25 lexical retrieval (round 10) — the text-side complement of the
embedding ANN family.

The determinism argument (operators/text.py module comment) rests on one
empirical pin: round(ln(...), 6) must be bit-identical Spark-vs-DuckDB over
ln's FINITE input domain ((N - df + 0.5)/(df + 0.5) + 1 for df in 1..N) —
RAW ln is NOT (JVM Math.log vs DuckDB libm differ in the last ulp on ~8%
of the domain, which is why the operator rounds idf at the source). The
exhaustive-domain test here is that pin, at the shipped corpus sizes and
above; everything else in the pipeline is integer arithmetic or
bit-deterministic IEEE float ops.
"""

from __future__ import annotations

import math

import duckdb
import pytest
from pyspark.sql import functions as F

from nosql_to_sql_migration_tool_spark.operators.text import (
    BM25_B,
    BM25_K1,
    bm25_idf_sql,
    bm25_scores,
    bm25_topk,
    bm25_topk_sql,
)
from nosql_to_sql_migration_tool_spark.sources.registry import load_table
from tests.conftest import SF_DIR_SMOKE


def _py_bm25(docs: dict[int, str], terms: tuple[str, ...]) -> dict[int, int]:
    """Independent Python reference (micros)."""
    toks = {i: t.split() for i, t in docs.items()}
    n = len(docs)
    avgdl = sum(len(t) for t in toks.values()) / n
    out: dict[int, int] = {}
    for i, t in toks.items():
        micros = 0
        hit = False
        for term in set(terms):
            tf = t.count(term)
            if tf == 0:
                continue
            hit = True
            df = sum(1 for tt in toks.values() if term in tt)
            idf = round(math.log((n - df + 0.5) / (df + 0.5) + 1.0), 6)
            contrib = (
                idf
                * (tf * (BM25_K1 + 1.0))
                / (tf + BM25_K1 * (1.0 - BM25_B + BM25_B * len(t) / avgdl))
            )
            micros += round(contrib * 1_000_000.0)
        if hit:
            out[i] = micros
    return out


def test_bm25_hand_case_and_semantics(spark):
    """Hand-built corpus: rarer term outweighs commoner one, higher tf
    wins within a term, longer docs are penalized, docs with no query
    term are absent."""
    docs = {
        1: "apple banana apple cherry",
        2: "apple banana",
        3: "banana banana banana banana banana banana banana banana",
        4: "cherry date",
        5: "date fig grape",
    }
    sdf = spark.createDataFrame(
        [(i, t) for i, t in docs.items()], ["doc_id", "text"]
    )
    got = {
        r["doc_id"]: r["score_micro"]
        for r in bm25_scores(sdf, ("apple", "cherry")).collect()
    }
    ref = _py_bm25(docs, ("apple", "cherry"))
    assert set(got) == set(ref) == {1, 2, 4}
    # python libm vs JVM StrictMath may differ in the last ulp -> allow
    # 1 micro against the PYTHON reference (the cross-engine test below
    # demands exactness where it matters)
    for i in ref:
        assert abs(got[i] - ref[i]) <= 1, (i, got[i], ref[i])
    # doc 1: two hits incl. the rare 'cherry'; doc 2 only 'apple' ->
    # doc 1 outranks doc 2; doc 4 has rare 'cherry' in a SHORT doc
    top = [r["doc_id"] for r in bm25_topk(sdf, ("apple", "cherry"), k=3).collect()]
    assert top[0] in (1, 4) and set(top) == {1, 2, 4}
    assert got[1] > got[2]


def test_bm25_cross_engine_parity(spark):
    """Full value parity on the real corpus: (doc_id, n_hit_terms,
    score_micro) identical Spark vs DuckDB, including the top-k cut."""
    terms = ("hash", "join", "spark", "window")
    docs = load_table(spark, SF_DIR_SMOKE, "documents").select(
        "doc_id", "text"
    )
    got = {
        (r["doc_id"], r["n_hit_terms"], r["score_micro"])
        for r in bm25_topk(docs, terms, k=25).collect()
    }
    con = duckdb.connect()
    sql = bm25_topk_sql(
        f"SELECT doc_id, text FROM read_parquet('{SF_DIR_SMOKE}/documents.parquet')",
        terms,
        k=25,
    )
    want = {(r[0], r[1], r[2]) for r in con.execute(sql).fetchall()}
    con.close()
    assert got == want
    assert len(got) == 25


@pytest.mark.parametrize("n_docs", [500, 5000, 20000, 100000])
def test_bm25_idf_domain_bit_parity(spark, n_docs):
    """THE pin: round(ln(...), 6) over the entire reachable idf input
    domain for a corpus of n_docs documents (df = 1..n_docs) is
    bit-identical Spark-vs-DuckDB — with it, every downstream float op
    is deterministic by IEEE, so score_micro can never drift between
    the engines at these corpus sizes."""
    sdf = (
        spark.range(1, n_docs + 1)
        .select(F.col("id").alias("df"))
        .select(
            "df",
            F.round(
                F.log(
                    (
                        F.lit(float(n_docs))
                        - F.col("df").cast("double")
                        + F.lit(0.5)
                    )
                    / (F.col("df").cast("double") + F.lit(0.5))
                    + F.lit(1.0)
                ),
                6,
            ).alias("idf"),
        )
    )
    got = {r["df"]: r["idf"] for r in sdf.collect()}
    con = duckdb.connect()
    want = dict(
        con.execute(
            f"SELECT df, {bm25_idf_sql(str(n_docs), 'df')} AS idf "
            f"FROM (SELECT unnest(range(1, {n_docs + 1})) AS df)"
        ).fetchall()
    )
    con.close()
    assert len(got) == n_docs
    diffs = [d for d in got if got[d] != want[d]]
    assert diffs == [], f"ln drift at df={diffs[:5]} (n={len(diffs)})"


def test_bm25_tie_break_and_length_penalty(spark):
    """Equal-text duplicates score identically and order by id; a
    longer doc with the same tf scores strictly lower."""
    sdf = spark.createDataFrame(
        [
            (10, "x y z"),
            (2, "x y z"),
            (7, "x y z pad pad pad pad pad pad"),
            (9, "pad only"),
        ],
        ["doc_id", "text"],
    )
    rows = bm25_topk(sdf, ("x",), k=10).collect()
    ids = [r["doc_id"] for r in rows]
    scores = {r["doc_id"]: r["score_micro"] for r in rows}
    assert ids == [2, 10, 7]  # ties -> id asc; longer doc last
    assert scores[2] == scores[10] > scores[7]


def test_bm25_batch_topk_matches_per_query_and_oracle(spark):
    """Batched retrieval == per-query bm25_topk for each query, and the
    full relation is bit-identical in DuckDB (salted two-phase top-k is
    exact)."""
    import duckdb

    from nosql_to_sql_migration_tool_spark.operators.text import (
        bm25_batch_topk,
        bm25_batch_topk_sql,
    )

    docs = load_table(spark, SF_DIR_SMOKE, "documents").select(
        "doc_id", "text"
    )
    qdefs = {
        101: ("hash", "join"),
        102: ("spark", "window", "scan"),
        103: ("customer",),
    }
    queries = spark.createDataFrame(
        [(qid, list(ts)) for qid, ts in qdefs.items()],
        ["query_id", "terms"],
    )
    batch = bm25_batch_topk(docs, queries, k=7, n_salts=4)
    got = {
        (r["query_id"], r["rank"]): (
            r["doc_id"], r["n_hit_terms"], r["score_micro"]
        )
        for r in batch.collect()
    }
    # per-query equivalence (scores AND ranking)
    for qid, ts in qdefs.items():
        solo = bm25_topk(docs, ts, k=7).collect()
        for rank, r in enumerate(solo, start=1):
            assert got[(qid, rank)] == (
                r["doc_id"], r["n_hit_terms"], r["score_micro"]
            ), (qid, rank)
    # cross-engine parity of the whole relation
    qrows = " UNION ALL ".join(
        f"SELECT {qid} AS query_id, '{t}' AS term"
        for qid, ts in qdefs.items()
        for t in ts
    )
    con = duckdb.connect()
    want = {
        (r[0], r[1]): (r[2], r[3], r[4])
        for r in con.execute(
            bm25_batch_topk_sql(
                "SELECT doc_id, text FROM "
                f"read_parquet('{SF_DIR_SMOKE}/documents.parquet')",
                qrows,
                k=7,
            )
        ).fetchall()
    }
    con.close()
    assert got == want


def test_phrase_match_semantics_and_parity(spark):
    """Exact phrase positions: overlapping occurrences count, token
    boundaries respected (no substring false hits), cross-engine
    parity on the real corpus."""
    from nosql_to_sql_migration_tool_spark.operators.text import (
        phrase_match,
        phrase_match_sql,
    )

    hand = spark.createDataFrame(
        [
            (1, "a b a b a b"),     # "a b a" occurs at 0 and 2 (overlap)
            (2, "ab a b"),          # token "ab" is NOT "a b"
            (3, "x a b a y"),       # one occurrence at 1
            (4, "a b"),             # shorter than the phrase
        ],
        ["doc_id", "text"],
    )
    got = {
        r["doc_id"]: (r["n_occurrences"], r["first_pos"])
        for r in phrase_match(hand, "a b a").collect()
    }
    assert got == {1: (2, 0), 3: (1, 1)}

    import duckdb

    docs = load_table(spark, SF_DIR_SMOKE, "documents").select(
        "doc_id", "text"
    )
    # a 2-token phrase with real hits in the synthetic corpus
    phrase = "hash join"
    mine = {
        tuple(r) for r in phrase_match(docs, phrase).collect()
    }
    con = duckdb.connect()
    want = {
        tuple(r)
        for r in con.execute(
            phrase_match_sql(
                "SELECT doc_id, text FROM "
                f"read_parquet('{SF_DIR_SMOKE}/documents.parquet')",
                phrase,
            )
        ).fetchall()
    }
    con.close()
    assert mine == want and len(mine) > 0


def test_doc_duplication_rate_hand_case_and_parity(spark):
    """Per-doc duplication rate: planted copy pairs rate ~1.0, unique
    docs rate 0.0, short docs NULL; full corpus parity with DuckDB."""
    from nosql_to_sql_migration_tool_spark.operators.text import (
        doc_duplication_rate,
        doc_duplication_rate_sql,
    )

    hand = spark.createDataFrame(
        [
            (1, "p q r s t u v w"),      # copied as doc 2
            (2, "p q r s t u v w"),
            (3, "one two three four five six seven"),  # unique
            (4, "tiny"),                 # < k tokens
        ],
        ["doc_id", "text"],
    )
    got = {
        r["doc_id"]: (r["n_grams"], r["n_duplicated"], r["dup_rate"])
        for r in doc_duplication_rate(hand, k=5).collect()
    }
    assert got[1] == (4, 4, 1.0) and got[2] == (4, 4, 1.0)
    assert got[3] == (3, 0, 0.0)
    assert got[4] == (0, 0, None)

    import duckdb

    from nosql_to_sql_migration_tool_spark.fixtures import (
        DUPLICATED_DOCUMENTS_SQL,
        duplicated_documents,
    )

    docs = duplicated_documents(
        load_table(spark, SF_DIR_SMOKE, "documents")
    )
    mine = {tuple(r) for r in doc_duplication_rate(docs).collect()}
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{SF_DIR_SMOKE}/documents.parquet')"
    )
    want = {
        tuple(r)
        for r in con.execute(
            doc_duplication_rate_sql(DUPLICATED_DOCUMENTS_SQL)
        ).fetchall()
    }
    con.close()
    assert mine == want
    # planted exact copies must sit at rate 1.0
    rates = {r[0]: r[3] for r in mine}
    planted = [d for d in rates if d >= 100_000 and d < 200_000]
    assert planted and all(rates[d] == 1.0 for d in planted)


def test_bm25_edge_cases(spark):
    """Terms absent from the corpus yield an empty result (not an
    error); duplicate terms in a batch query are deduplicated (no
    double-counted contribution); a query whose terms all miss
    contributes no rows to the batch output."""
    from nosql_to_sql_migration_tool_spark.operators.text import (
        bm25_batch_topk,
        bm25_scores,
    )

    docs = spark.createDataFrame(
        [(1, "alpha beta gamma"), (2, "beta beta delta")],
        ["doc_id", "text"],
    )
    assert bm25_scores(docs, ("zzz", "qqq")).count() == 0

    queries = spark.createDataFrame(
        [
            (1, ["beta", "beta", "beta"]),  # dup terms -> one contribution
            (2, ["beta"]),
            (3, ["nosuchterm"]),
        ],
        ["query_id", "terms"],
    )
    out = bm25_batch_topk(docs, queries, k=5)
    rows = {(r["query_id"], r["doc_id"]): r for r in out.collect()}
    # q1 (deduped) scores identically to q2
    for d in (1, 2):
        assert (
            rows[(1, d)]["score_micro"] == rows[(2, d)]["score_micro"]
        )
        assert rows[(1, d)]["n_hit_terms"] == 1
    assert not [k for k in rows if k[0] == 3]


def test_r10_retrieval_plan_invariants(spark):
    """Scale-shape pins for the round-10 retrieval/statistics operators
    (the registered surface gets this mechanically from
    test_plan_shapes.test_full_surface_plan_invariants; these are the
    r11 candidates): no Python stages, no cartesian products, no global
    (unpartitioned ordered) windows, pruned read schemas, and the BM25
    term filter sits below the first shuffle (posting fan-in bounded by
    the term list, never the corpus token count)."""
    from nosql_to_sql_migration_tool_spark.operators.text import (
        bm25_batch_topk,
        bm25_topk,
        doc_duplication_rate,
        phrase_match,
        vocab_growth,
    )
    from nosql_to_sql_migration_tool_spark.plans.audit import (
        cartesian_products,
        global_windows,
        physical_plan,
        python_stage_count,
        read_schemas,
    )

    docs = load_table(spark, SF_DIR_SMOKE, "documents").select(
        "doc_id", "text"
    )
    queries = spark.createDataFrame(
        [(1, ["hash", "join"]), (2, ["spark"])], ["query_id", "terms"]
    )
    frames = {
        "bm25_topk": bm25_topk(docs, ("hash", "join"), k=5),
        "bm25_batch_topk": bm25_batch_topk(docs, queries, k=5),
        "phrase_match": phrase_match(docs, "hash join"),
        "vocab_growth": vocab_growth(docs),
        "doc_duplication_rate": doc_duplication_rate(docs),
    }
    for name, df in frames.items():
        assert python_stage_count(df) == 0, name
        assert cartesian_products(df) == 0, name
        assert global_windows(df) == 0, name
        # column pruning reached the scan: only (doc_id, text) read
        for schema in read_schemas(df):
            assert "lang" not in schema and "source" not in schema, (
                name, schema
            )
    # BM25's term filter sits BELOW the shuffle: in the printed plan
    # tree (parents above children) the nearest ancestors of the token
    # Generate must encounter the term Filter BEFORE any Exchange —
    # i.e. the filter executes pre-shuffle, bounding posting fan-in
    plan = physical_plan(frames["bm25_topk"])
    lines = plan.splitlines()
    gen_idx = next(
        i for i, l in enumerate(lines) if "Generate" in l and "explode" in l
    )
    above = list(reversed(lines[:gen_idx]))
    filt_d = next(
        (i for i, l in enumerate(above) if "Filter" in l and "hash" in l),
        None,
    )
    exch_d = next(
        (i for i, l in enumerate(above) if "Exchange" in l), None
    )
    assert filt_d is not None, "term filter not found above Generate"
    assert exch_d is None or filt_d < exch_d, (
        "term filter is above the shuffle (posting fan-in unbounded)"
    )
