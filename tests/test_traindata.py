"""Training-data prep operators: split stability under corpus growth,
shuffle permutation properties, batch-size bounds, vocabulary coverage
arithmetic."""

from __future__ import annotations

from pyspark.sql import functions as F

from nosql_to_sql_migration_tool_spark.operators.traindata import (
    length_bucketed_batches,
    shuffle_positions,
    vocab_coverage,
    with_split,
)
from nosql_to_sql_migration_tool_spark.sources.registry import load_table
from tests.conftest import SF_DIR_SMOKE


def test_split_stable_under_growth(spark):
    """Adding rows must never move an existing row between splits, and
    proportions must be roughly 90/5/5."""
    docs = load_table(spark, SF_DIR_SMOKE, "documents")
    small = docs.filter(F.col("doc_id") < 30)
    full_assign = {
        r["doc_id"]: r["split"]
        for r in with_split(docs, "doc_id").select("doc_id", "split").collect()
    }
    small_assign = {
        r["doc_id"]: r["split"]
        for r in with_split(small, "doc_id").select("doc_id", "split").collect()
    }
    for k, v in small_assign.items():
        assert full_assign[k] == v
    n = len(full_assign)
    n_train = sum(1 for v in full_assign.values() if v == "train")
    assert 0.8 * n <= n_train <= 0.97 * n


def test_shuffle_positions_is_permutation_and_salted(spark):
    docs = load_table(spark, SF_DIR_SMOKE, "documents")
    n = docs.count()
    e0 = shuffle_positions(docs, "doc_id", salt="epoch0").collect()
    assert sorted(r["position"] for r in e0) == list(range(1, n + 1))
    # deterministic across runs
    again = shuffle_positions(docs, "doc_id", salt="epoch0").collect()
    assert {(r["position"], r["doc_id"]) for r in e0} == {
        (r["position"], r["doc_id"]) for r in again
    }
    # a different salt is a different permutation
    e1 = shuffle_positions(docs, "doc_id", salt="epoch1").collect()
    assert {(r["position"], r["doc_id"]) for r in e0} != {
        (r["position"], r["doc_id"]) for r in e1
    }


def test_length_bucketed_batches_bounds(spark):
    docs = load_table(spark, SF_DIR_SMOKE, "documents")
    rows = length_bucketed_batches(docs, batch_size=8, bucket_tokens=64).collect()
    assert len(rows) == docs.count()
    sizes = {}
    for r in rows:
        assert r["len_bucket"] == r["n_tokens"] // 64
        sizes.setdefault((r["len_bucket"], r["batch_id"]), []).append(
            r["n_tokens"]
        )
    for (bucket, batch), toks in sizes.items():
        assert len(toks) <= 8
        # every doc in a batch sits in the batch's length bucket
        assert all(t // 64 == bucket for t in toks)


def test_vocab_coverage_arithmetic(spark):
    df = spark.createDataFrame(
        [(0, "a a a b"), (1, "b c d"), (2, "a e")],
        "doc_id long, text string",
    )
    r = vocab_coverage(df, vocab_size=2).collect()[0]
    # counts: a=4 b=2 c=1 d=1 e=1 -> vocab {a,b} covers 6 of 9
    assert r["total_tokens"] == 9
    assert r["covered_tokens"] == 6
    assert abs(r["oov_rate"] - 3 / 9) < 1e-6  # rate rounds to 6 dp


def test_sequence_packing_layout_invariants(spark):
    """Packing layout must be a contiguous token stream cut at seq_len:
    offsets within [0, seq_len); consecutive docs in shuffle order are
    adjacent (start offsets differ by exactly n_tokens); every doc
    appears once; a salt change yields a different layout."""
    from nosql_to_sql_migration_tool_spark.operators.traindata import (
        sequence_packing,
    )
    from nosql_to_sql_migration_tool_spark.sources.registry import load_table
    from tests.conftest import SF_DIR_SMOKE

    docs = load_table(spark, SF_DIR_SMOKE, "documents")
    seq_len = 512
    packed = sequence_packing(docs, seq_len).collect()
    assert len(packed) == docs.count()
    assert all(0 <= r["bin_offset"] < seq_len for r in packed)
    # reconstruct global start offsets and check the stream is gapless
    rows = sorted(packed, key=lambda r: r["bin_id"] * seq_len + r["bin_offset"])
    pos = 0
    for r in rows:
        start = r["bin_id"] * seq_len + r["bin_offset"]
        assert start == pos, (r, pos)
        pos += r["n_tokens"]
    # epoch salt changes the layout but not the token totals
    repacked = sequence_packing(docs, seq_len, salt="epoch1").collect()
    assert sum(r["n_tokens"] for r in repacked) == pos
    assert {r["doc_id"]: (r["bin_id"], r["bin_offset"]) for r in repacked} != {
        r["doc_id"]: (r["bin_id"], r["bin_offset"]) for r in packed
    }


def test_chunk_documents_layout_and_edges(spark):
    """Sliding chunks: starts every stride while < n_tokens, last chunk
    truncated, short docs one chunk, empty docs none, fingerprints
    content-true."""
    import hashlib

    import pytest

    from nosql_to_sql_migration_tool_spark.operators.traindata import (
        chunk_documents,
    )

    words = [f"w{i}" for i in range(70)]
    df = spark.createDataFrame(
        [(1, " ".join(words)), (2, "a b"), (3, ""), (4, "   ")],
        "doc_id long, text string",
    )
    rows = sorted(
        chunk_documents(df, 32, 24).collect(),
        key=lambda r: (r["doc_id"], r["chunk_idx"]),
    )
    got = [(r["doc_id"], r["chunk_idx"], r["n_tokens"]) for r in rows]
    assert got == [(1, 0, 32), (1, 1, 32), (1, 2, 22), (2, 0, 2)]
    # fingerprint equals md5 of the exact token slice
    fp0 = hashlib.md5(" ".join(words[0:32]).encode()).hexdigest()
    fp2 = hashlib.md5(" ".join(words[48:70]).encode()).hexdigest()
    assert rows[0]["chunk_fp"] == fp0 and rows[2]["chunk_fp"] == fp2
    with pytest.raises(ValueError):
        chunk_documents(df, 0, 5)


def test_split_leakage_counts_cross_split_pairs(spark):
    """Hand case: pairs (1,2) same split, (1,3) and (2,4) cross-split —
    leakage rows flagged, combinations unordered (least/greatest)."""
    from nosql_to_sql_migration_tool_spark.operators.traindata import (
        split_leakage,
    )

    pairs = spark.createDataFrame(
        [(1, 2), (1, 3), (2, 4)], "id_a long, id_b long"
    )
    splits = spark.createDataFrame(
        [(1, "train"), (2, "train"), (3, "test"), (4, "val")],
        "doc_id long, split string",
    )
    got = {
        (r["split_a"], r["split_b"]): (r["n_pairs"], r["leaked"])
        for r in split_leakage(pairs, splits).collect()
    }
    assert got == {
        ("train", "train"): (1, False),
        ("test", "train"): (1, True),
        ("train", "val"): (1, True),
    }


def test_leakage_safe_split_keeps_components_together(spark):
    """Component-keyed splitting: every near-dup group lands wholly on
    one side (zero straddling pairs by construction), singletons split
    on their own id identically to with_split, and the audit composes
    to a clean report."""
    from pyspark.sql import functions as F

    from nosql_to_sql_migration_tool_spark.fixtures import (
        duplicated_documents,
    )
    from nosql_to_sql_migration_tool_spark.operators.dedup import (
        near_dup_components,
        near_dup_pairs,
    )
    from nosql_to_sql_migration_tool_spark.operators.traindata import (
        leakage_safe_split,
        with_split,
    )
    from nosql_to_sql_migration_tool_spark.sources.registry import load_table
    from tests.conftest import SF_DIR_SMOKE

    docs = duplicated_documents(
        load_table(spark, SF_DIR_SMOKE, "documents")
    ).localCheckpoint(eager=True)
    labels = near_dup_components(docs).localCheckpoint(eager=True)
    split = leakage_safe_split(docs, labels).localCheckpoint(eager=True)

    # no verified near-dup pair straddles splits
    pairs = near_dup_pairs(docs).select("id_a", "id_b")
    sa = split.select(F.col("doc_id").alias("id_a"), F.col("split").alias("sa"))
    sb = split.select(F.col("doc_id").alias("id_b"), F.col("split").alias("sb"))
    straddle = pairs.join(sa, "id_a").join(sb, "id_b").filter(
        F.col("sa") != F.col("sb")
    )
    assert straddle.count() == 0
    # whole components share one split (stronger: transitive closure)
    comp_splits = (
        split.join(labels, "doc_id")
        .groupBy("component_id")
        .agg(F.count_distinct("split").alias("n"))
    )
    assert comp_splits.filter(F.col("n") > 1).count() == 0
    # fractions roughly honored
    frac = {
        r["split"]: r["n"]
        for r in split.groupBy("split").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    n = sum(frac.values())
    assert frac["train"] / n > 0.8 and frac.get("test", 0) / n < 0.12
    # singleton docs (no component row covering them beyond themselves)
    # get exactly the with_split assignment keyed on their own id
    singles = labels.filter(
        F.col("component_id") == F.col("doc_id")
    ).select("doc_id")
    lone = (
        split.join(singles, "doc_id")
        .select("doc_id", "split")
        .withColumnRenamed("split", "got")
    )
    ref = with_split(
        docs.join(singles, "doc_id").withColumn(
            "__k", F.col("doc_id").cast("string")
        ),
        "__k",
    ).select("doc_id", "split")
    diff = lone.join(ref, "doc_id").filter(F.col("got") != F.col("split"))
    # component label == own id -> identical hash key -> identical split
    assert diff.count() == 0


# --- DSIR importance resampling (round 11) ---------------------------------


def test_dsir_weights_hand_case(spark):
    """A target of apple-documents must weight apple-bearing raw docs
    above apple-free ones; empty docs weigh 0 and survive the left
    join."""
    from nosql_to_sql_migration_tool_spark.operators.traindata import (
        dsir_select,
        dsir_weights,
    )

    raw = spark.createDataFrame(
        [
            (1, "apple apple pie"),
            (2, "quantum flux capacitor"),
            (3, "apple orchard"),
            (4, ""),
        ],
        ["doc_id", "text"],
    )
    target = spark.createDataFrame(
        [(100, "apple apple apple tart"), (101, "apple sauce")],
        ["doc_id", "text"],
    )
    got = {
        r["doc_id"]: (r["n_tokens"], r["weight_micro"])
        for r in dsir_weights(raw, target).collect()
    }
    assert set(got) == {1, 2, 3, 4}
    assert got[4] == (0, 0)
    assert got[1][0] == 3 and got[3][0] == 2
    # apple docs outscore the apple-free doc; within the apple docs the
    # denser one wins; every out-of-target token carries the smoothed
    # negative log ratio, so the all-unseen doc is the most negative
    assert got[1][1] > got[2][1] and got[3][1] > got[2][1]
    assert got[1][1] > got[3][1] > got[2][1]
    # selection follows (weight desc, id) exactly — note the empty doc
    # legitimately ranks at 0, above any negative-log-weight doc
    ranking = sorted(got, key=lambda d: (-got[d][1], d))
    picked = [r["doc_id"] for r in dsir_select(raw, target, 2).collect()]
    assert picked == ranking[:2]


def test_dsir_weights_cross_engine_parity(spark):
    """Whole-relation bit parity on the real corpus: raw = all
    documents, target = the English slice — every (doc_id, n_tokens,
    weight_micro) row identical Spark vs DuckDB."""
    import duckdb

    from nosql_to_sql_migration_tool_spark.operators.traindata import (
        dsir_weights,
        dsir_weights_sql,
    )
    from nosql_to_sql_migration_tool_spark.sources.registry import load_table
    from tests.conftest import SF_DIR_SMOKE

    docs = load_table(spark, SF_DIR_SMOKE, "documents")
    raw = docs.select("doc_id", "text")
    target = docs.filter(F.col("lang") == "en").select("doc_id", "text")
    got = {
        r["doc_id"]: (r["n_tokens"], r["weight_micro"])
        for r in dsir_weights(raw, target).collect()
    }
    con = duckdb.connect()
    sql = dsir_weights_sql(
        "SELECT doc_id, text FROM "
        f"read_parquet('{SF_DIR_SMOKE}/documents.parquet')",
        "SELECT doc_id, text FROM "
        f"read_parquet('{SF_DIR_SMOKE}/documents.parquet') "
        "WHERE lang = 'en'",
    )
    want = {r[0]: (r[1], r[2]) for r in con.execute(sql).fetchall()}
    con.close()
    assert got == want and len(got) == 500
    # the semantic claim: English documents look more target-like
    langs = {r["doc_id"]: r["lang"] for r in docs.select("doc_id", "lang").collect()}
    en = [w for d, (_, w) in got.items() if langs[d] == "en"]
    rest = [w for d, (_, w) in got.items() if langs[d] != "en"]
    assert sum(en) / len(en) > sum(rest) / len(rest)


def test_dsir_ln_domain_parity(spark):
    """The BM25 ln-pin applied to DSIR's ratio form: round(ln((ct+1) *
    nrb / ((cr+1) * ntb)), 6) is bit-identical Spark-vs-DuckDB over a
    dense grid of count pairs at realistic corpus totals — with the
    single ln pinned, every downstream weight is integer arithmetic."""
    import duckdb

    grid = spark.range(1, 2001).select(
        (F.col("id") % 50 + 1).alias("ct"),
        (F.col("id") % 437 + 1).alias("cr"),
    )
    ntb, nrb = 1_234_567.0 + 8192.0, 9_876_543.0 + 8192.0
    got = [
        r["lr"]
        for r in grid.select(
            F.round(
                F.log(
                    (F.col("ct") + F.lit(1)).cast("double")
                    * F.lit(nrb)
                    / ((F.col("cr") + F.lit(1)).cast("double") * F.lit(ntb))
                ),
                6,
            ).alias("lr")
        ).collect()
    ]
    con = duckdb.connect()
    want = [
        r[0]
        for r in con.execute(
            f"""
            SELECT round(ln((CAST(ct AS DOUBLE) + 1.0) * {nrb}
                          / ((CAST(cr AS DOUBLE) + 1.0) * {ntb})), 6)
            FROM (SELECT i % 50 + 1 AS ct, i % 437 + 1 AS cr
                  FROM generate_series(1, 2000) t(i))
            """
        ).fetchall()
    ]
    con.close()
    assert got == want


def test_dsir_persisted_ratios_reuse(spark):
    """The production shape: the <= n_buckets ratio table persists once
    (one model) and is reused across selection rounds — identical
    output to the inline derivation."""
    from nosql_to_sql_migration_tool_spark.operators.traindata import (
        dsir_bucket_ratios,
        dsir_weights,
    )
    from nosql_to_sql_migration_tool_spark.sources.registry import load_table
    from tests.conftest import SF_DIR_SMOKE

    docs = load_table(spark, SF_DIR_SMOKE, "documents")
    raw = docs.select("doc_id", "text")
    target = docs.filter(F.col("lang") == "en").select("doc_id", "text")
    ratios = dsir_bucket_ratios(raw, target).localCheckpoint(eager=True)
    assert ratios.count() <= 8192
    via = sorted(
        map(tuple, dsir_weights(raw, target, ratios=ratios).collect())
    )
    inline = sorted(map(tuple, dsir_weights(raw, target).collect()))
    assert via == inline


# --- deterministic weighted sampling (round 11) -----------------------------


def test_weighted_sample_determinism_and_parity(spark):
    """Same (id, weight) -> same sample, bit-identical in DuckDB; zero/
    NULL weights never selected; n caps the output."""
    import duckdb

    from nosql_to_sql_migration_tool_spark.operators.traindata import (
        weighted_sample,
        weighted_sample_sql,
    )
    from tests.conftest import SF_DIR_SMOKE

    docs = spark.read.parquet(f"{SF_DIR_SMOKE}/documents.parquet").select(
        "doc_id",
        # cross-engine-stable integer weights, some zeros
        (F.col("doc_id") % 7).cast("long").alias("w"),
    )
    got = [
        (r["doc_id"], r["w"], r["key_micro"])
        for r in weighted_sample(docs, "w", 50).collect()
    ]
    got2 = [
        (r["doc_id"], r["w"], r["key_micro"])
        for r in weighted_sample(docs, "w", 50).collect()
    ]
    assert got == got2 and len(got) == 50
    assert all(w > 0 for _, w, _ in got)
    con = duckdb.connect()
    want = [
        tuple(r)
        for r in con.execute(
            weighted_sample_sql(
                "SELECT doc_id, CAST(doc_id % 7 AS BIGINT) AS w FROM "
                f"read_parquet('{SF_DIR_SMOKE}/documents.parquet')",
                "w",
                50,
            )
        ).fetchall()
    ]
    con.close()
    assert got == want


def test_weighted_sample_follows_weights(spark):
    """The statistical contract: across many disjoint id universes, the
    inclusion frequency of heavy items dominates light ones (weight 9
    vs 1 -> a 9x expected key advantage)."""
    from nosql_to_sql_migration_tool_spark.operators.traindata import (
        weighted_sample,
    )

    rows = spark.range(2000).select(
        F.col("id").alias("doc_id"),
        F.when(F.col("id") % 2 == 0, F.lit(9.0))
        .otherwise(F.lit(1.0))
        .alias("w"),
    )
    picked = weighted_sample(rows, "w", 200).collect()
    heavy = sum(1 for r in picked if r["w"] == 9.0)
    # E[heavy] ~ 185/200 at 9:1 odds; even loosely, heavy must dominate
    assert heavy > 140, heavy
    # stability: adding MORE rows never changes an existing row's key
    bigger = spark.range(4000).select(
        F.col("id").alias("doc_id"),
        F.when(F.col("id") % 2 == 0, F.lit(9.0))
        .otherwise(F.lit(1.0))
        .alias("w"),
    )
    keys_small = {
        r["doc_id"]: r["key_micro"]
        for r in weighted_sample(rows, "w", 2000).collect()
    }
    keys_big = {
        r["doc_id"]: r["key_micro"]
        for r in weighted_sample(bigger, "w", 4000).collect()
    }
    assert all(keys_big[d] == k for d, k in keys_small.items())


def test_data_recipe_caps_and_parity(spark):
    """The pre-launch mixture table: shares sum to ~1, the repetition
    cap binds exactly where desired > max_epochs*avail (shortfall
    REPORTED, never silently redistributed), and the whole relation is
    bit-identical in DuckDB."""
    import duckdb

    from nosql_to_sql_migration_tool_spark.operators.traindata import (
        data_recipe,
        data_recipe_sql,
    )
    from nosql_to_sql_migration_tool_spark.sources.registry import load_table
    from tests.conftest import SF_DIR_SMOKE

    docs = load_table(spark, SF_DIR_SMOKE, "documents").select("lang", "text")
    target, epochs = 1_000_000, 1.5
    got = sorted(
        map(tuple, data_recipe(docs, target, epochs).collect())
    )
    con = duckdb.connect()
    want = sorted(
        map(
            tuple,
            con.execute(
                data_recipe_sql(
                    "SELECT lang, text FROM "
                    f"read_parquet('{SF_DIR_SMOKE}/documents.parquet')",
                    target,
                    epochs,
                )
            ).fetchall(),
        )
    )
    con.close()
    assert got == want and len(got) >= 4
    rows = {
        r[0]: dict(
            avail=r[1], share=r[2], desired=r[3], planned=r[4],
            epochs=r[5], capped=r[6],
        )
        for r in got
    }
    assert abs(sum(v["share"] for v in rows.values()) - 1.0) < 1e-4
    for v in rows.values():
        import math

        cap = math.floor(epochs * v["avail"])
        assert v["planned"] == min(v["desired"], cap)
        assert v["capped"] == int(v["desired"] > v["planned"])
        assert v["epochs"] <= epochs + 1e-9
    # the target is large vs this corpus, so every domain must cap at
    # max_epochs — and the planner reports the global shortfall
    assert all(v["capped"] == 1 for v in rows.values())
    shortfall = sum(v["desired"] - v["planned"] for v in rows.values())
    assert shortfall > 0
    # a tiny target caps nothing
    small = {
        r["lang"]: r["capped"]
        for r in data_recipe(docs, 1000, epochs).collect()
    }
    assert all(c == 0 for c in small.values())


def test_dsir_stale_ratio_table_keeps_token_counts(spark):
    """ADVICE r11 (low): a persisted ratio table built on an OLDER
    corpus snapshot may lack buckets new docs hash to. Those tokens
    must contribute zero weight — not vanish from n_tokens (whose
    documented meaning is the document's token count)."""
    from nosql_to_sql_migration_tool_spark.operators.traindata import (
        dsir_bucket_ratios,
        dsir_weights,
    )

    old_raw = spark.createDataFrame(
        [(1, "alpha beta"), (2, "beta gamma")], ["doc_id", "text"]
    )
    target = spark.createDataFrame([(9, "alpha alpha")], ["doc_id", "text"])
    stale = dsir_bucket_ratios(old_raw, target).localCheckpoint(eager=True)
    # the new corpus has tokens the stale model never saw
    new_raw = spark.createDataFrame(
        [(1, "alpha beta"), (3, "zzz_unseen qqq_unseen alpha")],
        ["doc_id", "text"],
    )
    got = {
        r["doc_id"]: (r["n_tokens"], r["weight_micro"])
        for r in dsir_weights(new_raw, target, ratios=stale).collect()
    }
    # n_tokens is the FULL token count even when buckets are unseen
    assert got[1][0] == 2
    assert got[3][0] == 3
    # doc 3's weight equals just its 'alpha' contribution: same as a
    # one-token 'alpha' doc scored against the same stale model
    alpha_only = spark.createDataFrame([(7, "alpha")], ["doc_id", "text"])
    alpha_w = (
        dsir_weights(alpha_only, target, ratios=stale)
        .collect()[0]["weight_micro"]
    )
    assert got[3][1] == alpha_w


def test_weighted_sample_sql_expression_alias_guard(spark):
    """ADVICE r11 (low): '<expr> AS <expr>' is invalid SQL for
    non-identifier expressions — the out_col guard from
    linear_count_by_sql applies to id_expr and weight_expr too."""
    import duckdb
    import pytest

    from nosql_to_sql_migration_tool_spark.operators.traindata import (
        weighted_sample,
        weighted_sample_sql,
    )

    with pytest.raises(ValueError, match="id_expr"):
        weighted_sample_sql("SELECT 1", "w", 5, id_expr="CAST(id AS INT)")
    with pytest.raises(ValueError, match="weight_expr"):
        weighted_sample_sql("SELECT 1", "w + 1", 5)

    # expression forms work once out columns are named, and replay the
    # Spark plan bit-identically
    rows = spark.createDataFrame(
        [(i, i % 7 + 1) for i in range(200)], ["doc_id", "q"]
    )
    got = [
        (r["doc_id"], r["w"], r["key_micro"])
        for r in weighted_sample(
            rows.select("doc_id", (F.col("q") * 2).alias("w")), "w", 20
        ).collect()
    ]
    con = duckdb.connect()
    want = con.execute(
        weighted_sample_sql(
            "SELECT doc_id, q FROM (SELECT unnest(range(200)) AS doc_id, "
            "unnest(range(200)) % 7 + 1 AS q)",
            "q * 2",
            20,
            weight_out="w",
        )
    ).fetchall()
    con.close()
    assert got == [tuple(r) for r in want]


def test_plain_ident_rejects_digit_leading():
    """ADVICE r12: isalnum() admitted '123' / '1col', which render as
    invalid '<expr> AS 123' SQL — the guard must be isidentifier()."""
    import pytest

    from nosql_to_sql_migration_tool_spark.operators.traindata import (
        _plain_ident,
    )

    for bad in ("123", "1col", "a-b", "a b", ""):
        with pytest.raises(ValueError, match="plain column name"):
            _plain_ident(bad, "guard", None)
    assert _plain_ident("n_tokens", "guard", None) == "n_tokens"
    assert _plain_ident("_hidden", "guard", None) == "_hidden"
    # an explicit out column always wins, whatever the expression
    assert _plain_ident("1 + 2", "guard", "s") == "s"
