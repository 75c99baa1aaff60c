"""Recall/precision checks for the dedup pipeline on the planted-duplicate
fixture: exact copies must always be found; prepend-edited near-dups must
be recovered by MinHash LSH with high recall and verified by Jaccard."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from nosql_to_sql_migration_tool_spark.fixtures import duplicated_documents
from nosql_to_sql_migration_tool_spark.operators.dedup import (
    dedup_exact,
    exact_dup_groups,
    near_dup_pairs,
    simhash_candidates,
)
from nosql_to_sql_migration_tool_spark.sources.registry import load_table
from tests.conftest import SF_DIR_SMOKE


@pytest.fixture(scope="module")
def docs(spark):
    return duplicated_documents(load_table(spark, SF_DIR_SMOKE, "documents"))


def test_exact_dedup_finds_all_planted_copies(spark, docs):
    base = load_table(spark, SF_DIR_SMOKE, "documents")
    planted = base.filter(F.col("doc_id") % 10 == 0).count()
    groups = exact_dup_groups(docs)
    assert groups.count() == planted
    assert groups.filter(F.col("n_dups") != 2).count() == 0
    # keeper is the original (min) id
    assert groups.filter(F.col("keep_id") >= 100_000).count() == 0

    deduped = dedup_exact(docs)
    assert deduped.count() == docs.count() - planted


def test_near_dup_recall_and_jaccard(spark, docs):
    base = load_table(spark, SF_DIR_SMOKE, "documents")
    expected_near = {
        r["doc_id"] for r in base.filter(F.col("doc_id") % 7 == 0).collect()
    }
    pairs = near_dup_pairs(docs).collect()
    found_near = {
        p["id_a"] for p in pairs if p["id_b"] == p["id_a"] + 200_000
    }
    # LSH banding: recall over planted prepend-edits must be high
    assert len(found_near) >= 0.9 * len(expected_near)
    # verified pairs carry true jaccard
    for p in pairs:
        assert p["jaccard"] >= 0.6
    # (original, exact copy) pairs only — id_a < 100k excludes the
    # (copy-of-k, near-dup-of-k) pairs that also differ by 100k
    exact_pairs = [
        p
        for p in pairs
        if p["id_b"] == p["id_a"] + 100_000 and p["id_a"] < 100_000
    ]
    assert exact_pairs and all(p["jaccard"] == 1.0 for p in exact_pairs)


def test_dedup_near_drops_planted_copies(spark, docs):
    from nosql_to_sql_migration_tool_spark.operators.dedup import dedup_near

    kept = dedup_near(docs)
    # every surviving planted copy would be the higher-id side of a pair
    survivors_over_100k = kept.filter(F.col("doc_id") >= 100_000).count()
    base = load_table(spark, SF_DIR_SMOKE, "documents")
    planted = (
        base.filter(F.col("doc_id") % 10 == 0).count()
        + base.filter(F.col("doc_id") % 7 == 0).count()
    )
    # LSH recall is >=90%; at most a few planted copies survive
    assert survivors_over_100k <= 0.1 * planted
    # exactly the higher-id side of every verified pair is dropped
    # (the small-vocab corpus has some NATURAL near-dup pairs too, so
    # a handful of base docs legitimately dedup away)
    from nosql_to_sql_migration_tool_spark.operators.dedup import (
        near_dup_pairs,
    )

    losers = near_dup_pairs(docs).select("id_b").distinct().count()
    assert kept.count() == docs.count() - losers


def test_near_dup_components_closes_chains(spark):
    from nosql_to_sql_migration_tool_spark.operators.dedup import (
        near_dup_components,
    )

    base = "alpha beta gamma delta epsilon zeta eta theta iota kappa " * 4
    chain = spark.createDataFrame(
        [
            (1, base),
            (2, "xq zz " + base),            # near-dup of 1
            (3, "xq zz yy ww " + base),      # near-dup of 2, farther from 1
            (10, "totally different words entirely unrelated content here "
                 "nothing shared with the chain at all " * 4),
        ],
        "doc_id long, text string",
    )
    comps = {
        r["doc_id"]: r["component_id"]
        for r in near_dup_components(chain, threshold=0.6).collect()
    }
    # the whole edit chain collapses to the min id
    assert comps[1] == comps[2] == comps[3] == 1
    # the unrelated doc keeps its own component
    assert comps[10] == 10


def test_dedup_keep_best_picks_highest_score_min_id_ties(spark):
    """Quality-aware survivorship: the longest copy wins its component;
    on a score tie the min id wins; singletons survive untouched."""
    from pyspark.sql import functions as F

    from nosql_to_sql_migration_tool_spark.operators.dedup import (
        dedup_keep_best,
    )
    from nosql_to_sql_migration_tool_spark.operators.text import tokens

    base = "alpha beta gamma delta epsilon zeta eta theta iota kappa " * 4
    docs = spark.createDataFrame(
        [
            (1, base),                       # 40 tokens
            (2, "xq zz " + base),            # 42 tokens -> wins component 1
            (7, "uu vv " + base),            # 42 tokens, tie -> id 2 wins
            (10, "totally different words entirely unrelated content here "
                 "nothing shared with the chain at all " * 4),
        ],
        "doc_id long, text string",
    )
    kept = {
        r["doc_id"]: (r["component_id"], r["score"])
        for r in dedup_keep_best(
            docs, score=F.size(tokens(F.col("text"))).cast("bigint")
        ).collect()
    }
    assert set(kept) == {2, 10}
    assert kept[2] == (1, 42)


def test_simhash_finds_exact_copies(spark, docs):
    cands = simhash_candidates(docs, max_hamming=3)
    exact = cands.filter(
        (F.col("id_b") - F.col("id_a") == 100_000) & (F.col("hamming") == 0)
    )
    base = load_table(spark, SF_DIR_SMOKE, "documents")
    planted = base.filter(F.col("doc_id") % 10 == 0).count()
    assert exact.count() == planted


def test_near_dup_components_string_ids(spark):
    """String-keyed corpora must work: labels propagate the id itself
    (min over strings), never a numeric cast (which NULLs out)."""
    from nosql_to_sql_migration_tool_spark.operators.dedup import (
        near_dup_components,
    )

    base = "alpha beta gamma delta epsilon zeta eta theta iota kappa " * 4
    chain = spark.createDataFrame(
        [
            ("doc-a", base),
            ("doc-b", "xq zz " + base),
            ("doc-c", "xq zz yy ww " + base),
            ("doc-z", "totally different words entirely unrelated content "
                      "here nothing shared with the chain at all " * 4),
        ],
        "doc_id string, text string",
    )
    comps = {
        r["doc_id"]: r["component_id"]
        for r in near_dup_components(chain, threshold=0.6).collect()
    }
    assert comps["doc-a"] == comps["doc-b"] == comps["doc-c"] == "doc-a"
    assert comps["doc-z"] == "doc-z"


def test_jaccard_prefix_pairs_complete_vs_brute_force(spark, docs):
    """The prefix-filter contract is EXACTNESS: the pair set must equal
    brute-force all-pairs Jaccard >= 0.6 on the fixture corpus (LSH is
    allowed to miss pairs; this operator is not)."""
    from nosql_to_sql_migration_tool_spark.operators.dedup import (
        jaccard_prefix_pairs,
    )
    from nosql_to_sql_migration_tool_spark.operators.text import word_shingles

    got = {
        (r["id_a"], r["id_b"]): r["jaccard"]
        for r in jaccard_prefix_pairs(docs).collect()
    }
    sh = docs.select("doc_id", word_shingles(F.col("text")).alias("sh"))
    a = sh.select(F.col("doc_id").alias("id_a"), F.col("sh").alias("sha"))
    b = sh.select(F.col("doc_id").alias("id_b"), F.col("sh").alias("shb"))
    brute = (
        a.crossJoin(b)
        .filter(F.col("id_a") < F.col("id_b"))
        .select(
            "id_a",
            "id_b",
            F.round(
                F.size(F.array_intersect("sha", "shb"))
                * F.lit(1.0)
                / F.size(F.array_union("sha", "shb")),
                6,
            ).alias("jaccard"),
        )
        .filter(F.col("jaccard") >= 0.6)
    )
    want = {(r["id_a"], r["id_b"]): r["jaccard"] for r in brute.collect()}
    assert got == want
    assert len(want) > 0  # the fixture plants near-dups; empty = broken test


def test_jaccard_prefix_pairs_short_and_single_shingle_docs(spark):
    """Boundary sizes: s=1 gives prefix length 1 (the whole set); exact
    integer ceil means tau boundaries are hit exactly, not float-fuzzed."""
    from nosql_to_sql_migration_tool_spark.operators.dedup import (
        jaccard_prefix_pairs,
    )

    docs = spark.createDataFrame(
        [
            ("a", "one two"),          # < k tokens: single whole-text shingle
            ("b", "one two"),          # identical -> jaccard 1.0
            ("c", "something else"),   # disjoint single shingle
        ],
        "doc_id string, text string",
    )
    pairs = {
        (r["id_a"], r["id_b"]): r["jaccard"]
        for r in jaccard_prefix_pairs(docs).collect()
    }
    assert pairs == {("a", "b"): 1.0}


def test_twostar_matches_propagation_on_random_graphs(spark):
    """Alternating large-star/small-star must produce the identical
    component labeling as min-label propagation on arbitrary edge sets —
    both operators accept a prebuilt ``pairs`` frame, so the comparison
    runs on pure graph structure (no text similarity in the loop)."""
    import random

    from nosql_to_sql_migration_tool_spark.operators.dedup import (
        near_dup_components,
        near_dup_components_twostar,
    )

    rng = random.Random(42)
    for trial in range(4):
        n = 40
        nodes = [(i, "") for i in range(n)]
        docs = spark.createDataFrame(nodes, "doc_id long, text string")
        n_edges = rng.choice([0, 15, 40, 80])
        edges = set()
        while len(edges) < n_edges:
            a, b = rng.randrange(n), rng.randrange(n)
            if a != b:
                edges.add((min(a, b), max(a, b)))
        if edges:
            pairs = spark.createDataFrame(
                [(a, b) for a, b in sorted(edges)], "id_a long, id_b long"
            )
        else:
            pairs = spark.createDataFrame([], "id_a long, id_b long")
        prop = {
            r["doc_id"]: r["component_id"]
            for r in near_dup_components(docs, pairs=pairs).collect()
        }
        star = {
            r["doc_id"]: r["component_id"]
            for r in near_dup_components_twostar(docs, pairs=pairs).collect()
        }
        assert star == prop, f"trial {trial}: {star} != {prop}"


def test_twostar_converges_on_long_chain_in_log_rounds(spark):
    """A 64-node path graph has diameter 63 — label propagation needs
    ~63 rounds but star contraction must finish far inside its default
    30-iteration budget (O(log n) in practice). Correct labels prove it
    converged rather than hitting the cap."""
    from nosql_to_sql_migration_tool_spark.operators.dedup import (
        near_dup_components_twostar,
    )

    n = 64
    docs = spark.createDataFrame(
        [(i, "") for i in range(n)], "doc_id long, text string"
    )
    pairs = spark.createDataFrame(
        [(i, i + 1) for i in range(n - 1)], "id_a long, id_b long"
    )
    comps = {
        r["doc_id"]: r["component_id"]
        for r in near_dup_components_twostar(
            docs, pairs=pairs, max_iterations=10
        ).collect()
    }
    assert all(comps[i] == 0 for i in range(n))


def test_twostar_raises_when_iteration_budget_too_small(spark):
    """ADVICE r5: an unconverged star forest must raise, not silently
    return wrong component ids. Two rounds cannot contract (and then
    CONFIRM the fixpoint of) a 64-node path graph."""
    import pytest

    from nosql_to_sql_migration_tool_spark.operators.dedup import (
        near_dup_components_twostar,
    )

    n = 64
    docs = spark.createDataFrame(
        [(i, "") for i in range(n)], "doc_id long, text string"
    )
    pairs = spark.createDataFrame(
        [(i, i + 1) for i in range(n - 1)], "id_a long, id_b long"
    )
    with pytest.raises(RuntimeError, match="did not reach"):
        near_dup_components_twostar(docs, pairs=pairs, max_iterations=2)


def test_corpus_overlap_exact_small_fixture(spark):
    """Hand-checkable overlap matrix: identical corpora -> jaccard 1,
    disjoint -> 0 with the pair still present, partial computed from
    distinct shingle sets."""
    from nosql_to_sql_migration_tool_spark.operators.dedup import (
        corpus_overlap,
    )

    # 5-token texts with SHINGLE_K-token shingles; craft via short texts
    # (< k tokens collapse to one whole-text shingle) for exact control
    docs = spark.createDataFrame(
        [
            (1, "alpha beta", "A"),
            (2, "gamma delta", "A"),
            (3, "alpha beta", "B"),     # shares 1 of A's 2 shingles
            (4, "epsilon zeta", "B"),
            (5, "omega psi", "C"),      # disjoint from everyone
            (6, "alpha beta", "D"),
            (7, "gamma delta", "D"),    # D == A exactly
        ],
        "doc_id long, text string, source string",
    )
    got = {
        (r["source_a"], r["source_b"]): r
        for r in corpus_overlap(docs, "source").collect()
    }
    assert len(got) == 6  # 4 choose 2, zero-overlap pairs included
    assert got[("A", "D")]["jaccard"] == 1.0
    assert got[("A", "C")]["jaccard"] == 0.0 and got[("A", "C")]["n_common"] == 0
    ab = got[("A", "B")]
    assert (ab["n_common"], ab["n_a"], ab["n_b"]) == (1, 2, 2)
    assert ab["jaccard"] == round(1 / 3, 6)


def test_containment_catches_embedded_subset_jaccard_misses(spark):
    """The asymmetric case containment exists for: a short doc wholly
    embedded in a long one — low Jaccard (below 0.6) but containment
    1.0 — plus a disjoint doc that must produce nothing."""
    from nosql_to_sql_migration_tool_spark.operators.dedup import (
        containment_pairs,
    )

    short = " ".join(f"w{i}" for i in range(10))
    long_ = short + " " + " ".join(f"x{i}" for i in range(40))
    other = " ".join(f"z{i}" for i in range(20))
    docs = spark.createDataFrame(
        [(1, short), (2, long_), (3, other)], "doc_id long, text string"
    )
    rows = containment_pairs(docs).collect()
    assert len(rows) == 1
    r = rows[0]
    assert (r["id_a"], r["id_b"]) == (1, 2)
    assert r["containment_a_in_b"] == 1.0       # short fully inside long
    assert r["containment_b_in_a"] < 0.5        # and NOT vice versa
    # sanity: symmetric Jaccard would be ~6/47 — far below any near-dup
    # threshold, which is exactly why a Jaccard pipeline misses this


def test_band_index_incremental_update_equals_rebuild(spark, tmp_path):
    """VERDICT r6 #7: the persisted LSH band index is maintained
    append-only — updating with a batch computes bucket rows from the
    BATCH ALONE (O(batch); the update plan never references the corpus)
    and the updated index is row-equivalent to a fresh rebuild over
    corpus + batch. Probing the persisted index gives the same verdicts
    as the inline oracle-checked form."""
    from nosql_to_sql_migration_tool_spark.hadoop_fs import (
        executed_plan_string,
    )
    from nosql_to_sql_migration_tool_spark.operators.dedup import (
        band_bucket_rows,
        build_band_index,
        ingest_near_dup_flags,
        update_band_index,
    )

    docs = spark.read.parquet(f"{SF_DIR_SMOKE}/documents.parquet").select(
        "doc_id", "text"
    )
    corpus = docs.filter(F.col("doc_id") % 3 != 0)
    batch = docs.filter(F.col("doc_id") % 3 == 0)
    idx = str(tmp_path / "band_index")

    build_band_index(corpus, idx)
    # O(batch): the update's input plan scans the batch only — the
    # corpus parquet must not appear anywhere in it
    update_plan = executed_plan_string(band_bucket_rows(batch))
    assert "band_index" not in update_plan
    update_band_index(batch, idx)

    rebuilt = band_bucket_rows(docs)
    stored = spark.read.parquet(idx).select(
        "band_idx", "band_hash", "doc_id"
    )
    assert stored.count() == rebuilt.count()
    assert stored.exceptAll(rebuilt).isEmpty()
    assert rebuilt.exceptAll(stored).isEmpty()

    # probing the PERSISTED index == computing corpus buckets inline
    incoming = batch.select(
        (F.col("doc_id") + F.lit(500_000)).alias("doc_id"),
        F.concat("text", F.lit(" tail")).alias("text"),
    )
    corpus_all = docs  # index now covers corpus + batch
    via_index = ingest_near_dup_flags(
        corpus_all,
        incoming,
        corpus_buckets=spark.read.parquet(idx).select(
            "band_idx", "band_hash", "doc_id"
        ),
    )
    inline = ingest_near_dup_flags(corpus_all, incoming)
    assert via_index.exceptAll(inline).isEmpty()
    assert inline.exceptAll(via_index).isEmpty()
    # planted edits must be flagged
    assert via_index.filter(F.col("is_near_dup")).count() > 0


def test_ingest_width_cap_counts_distinct_index_rows(spark, tmp_path):
    """ADVICE r7: an at-least-once replay appends duplicate
    (band, hash, id) rows to the persisted index; the bucket-width cap
    must count DISTINCT rows, or a replay would double every width and
    silently drop genuine candidates. At cap=1 every bucket in use
    busts the cap the moment it's duplicated, so verdicts through a
    2x-duplicated index diverge from the single-copy verdicts unless
    the dedup happens."""
    from nosql_to_sql_migration_tool_spark.operators.dedup import (
        build_band_index,
        ingest_near_dup_flags,
    )

    docs = spark.read.parquet(f"{SF_DIR_SMOKE}/documents.parquet").select(
        "doc_id", "text"
    )
    corpus = docs.filter(F.col("doc_id") % 3 != 0)
    idx = str(tmp_path / "band_index")
    build_band_index(corpus, idx)
    stored = spark.read.parquet(idx).select("band_idx", "band_hash", "doc_id")
    replayed = stored.unionByName(stored)  # every index row twice

    incoming = corpus.filter(F.col("doc_id") % 7 == 1).select(
        (F.col("doc_id") + F.lit(500_000)).alias("doc_id"),
        F.concat("text", F.lit(" tail")).alias("text"),
    )
    single = ingest_near_dup_flags(
        corpus, incoming, corpus_buckets=stored, max_bucket_width=1
    )
    doubled = ingest_near_dup_flags(
        corpus, incoming, corpus_buckets=replayed, max_bucket_width=1
    )
    assert single.exceptAll(doubled).isEmpty()
    assert doubled.exceptAll(single).isEmpty()
    assert single.filter(F.col("is_near_dup")).count() > 0


def test_ingest_probe_never_self_matches(spark, tmp_path):
    """ADVICE r7: when a replayed batch probes an index that already
    contains its OWN bucket rows (crash fell after the index append)
    and its own text is on the verify side (it's in accepted_path),
    the self-pair must be excluded — otherwise every doc verifies
    against itself at Jaccard 1.0 and flips to near-dup. Batch docs
    here are mutually dissimilar so the ONLY possible delta between
    the clean and crash-window probes is self-matching."""
    from nosql_to_sql_migration_tool_spark.operators.dedup import (
        band_bucket_rows,
        ingest_near_dup_flags,
    )

    corpus = spark.createDataFrame(
        [
            (1, "alpha bravo charlie delta echo foxtrot golf hotel india"),
            (2, "juliet kilo lima mike november oscar papa quebec romeo"),
        ],
        "doc_id long, text string",
    )
    batch = spark.createDataFrame(
        [
            (10, "sierra tango uniform victor whiskey xray yankee zulu one"),
            (11, "apple banana cherry date elderberry fig grape honeydew kiwi"),
            (12, "red orange yellow green blue indigo violet magenta cyan"),
        ],
        "doc_id long, text string",
    )
    clean = band_bucket_rows(corpus).localCheckpoint(eager=True)
    # crash-window index: corpus buckets + the batch's own rows
    dirty = clean.unionByName(band_bucket_rows(batch))
    verify_side = corpus.unionByName(batch)  # batch text in accepted_path

    want = ingest_near_dup_flags(verify_side, batch, corpus_buckets=clean)
    got = ingest_near_dup_flags(verify_side, batch, corpus_buckets=dirty)
    assert want.exceptAll(got).isEmpty()
    assert got.exceptAll(want).isEmpty()
    # and in particular nothing self-matched its way to a 1.0 verdict
    assert got.filter(F.col("is_near_dup")).count() == 0


def test_substring_spans_exact_lengths_and_islands(spark):
    """Substring-level dedup semantic pins: maximal span lengths are
    EXACT (gaps-and-islands over aligned k-gram positions), multiple
    disjoint spans per pair each count, spans shorter than min_len drop,
    and sub-k docs contribute nothing."""
    from nosql_to_sql_migration_tool_spark.operators.dedup import (
        substring_span_pairs,
    )

    # Distinct vocabularies so every anchor gram is rare (df <= cap).
    w = [f"w{i}" for i in range(40)]
    j = [f"j{i}" for i in range(20)]
    a_text = " ".join(w[:30])
    # B holds two disjoint copies from A: w5..w16 (12 tokens) and
    # w20..w29 (10 tokens), separated by junk so the runs break.
    b_text = " ".join(w[5:17] + j[:6] + w[20:30])
    # C shares only a 7-token span with A -> below min_len=8, dropped.
    c_text = " ".join(j[6:12] + w[0:7] + j[12:18])
    docs = spark.createDataFrame(
        [
            (1, a_text),
            (2, b_text),
            (3, c_text),
            (4, a_text),       # exact duplicate of A: one 30-token span
            (5, "w0 w1 w2"),   # shorter than k: ignored entirely
        ],
        "doc_id long, text string",
    )
    got = {
        (r["id_a"], r["id_b"]): (
            r["n_spans"], r["max_span_words"], r["total_span_words"]
        )
        for r in substring_span_pairs(
            docs, k=5, min_len=8, df_cap=20
        ).collect()
    }
    assert got[(1, 2)] == (2, 12, 22)      # two exact spans: 12 + 10
    assert got[(1, 4)] == (1, 30, 30)      # full-doc duplicate
    assert got[(2, 4)] == (2, 12, 22)      # transitivity via copy of A
    assert (1, 3) not in got               # 7 < min_len
    assert not any(5 in pair for pair in got)
    # self-pairs never emitted
    assert all(a < b for a, b in got)


def test_substring_cross_leakage_detects_eval_contamination(spark):
    """Cross-split substring leakage: a train doc embedding an exact
    span of an eval doc is flagged with the exact span length; pairs
    WITHIN a split are never emitted (the whole point vs the self-join
    form), and clean eval docs produce no rows."""
    from nosql_to_sql_migration_tool_spark.operators.dedup import (
        substring_cross_leakage,
        substring_span_pairs,
    )

    w = [f"w{i}" for i in range(40)]
    j = [f"j{i}" for i in range(30)]
    eval_text = " ".join(w[:20])
    train = spark.createDataFrame(
        [
            # train doc 1 embeds eval doc 10's tokens 0..11 (12 tokens)
            (1, " ".join(j[:5] + w[0:12] + j[5:10])),
            # train docs 2 and 3 duplicate EACH OTHER (within-split)
            (2, " ".join(j[10:28])),
            (3, " ".join(j[10:28])),
        ],
        "doc_id long, text string",
    )
    evals = spark.createDataFrame(
        [(10, eval_text), (11, " ".join(f"q{i}" for i in range(15)))],
        "doc_id long, text string",
    )
    got = {
        (r["id_a"], r["id_b"]): (r["n_spans"], r["max_span_words"])
        for r in substring_cross_leakage(
            train, evals, k=5, min_len=8, df_cap=20
        ).collect()
    }
    assert got == {(1, 10): (1, 12)}  # only the cross-split pair

    # parity: the same pair surfaces in the self-join form over the
    # union, with identical span stats
    both = train.unionByName(evals)
    self_form = {
        (r["id_a"], r["id_b"]): (r["n_spans"], r["max_span_words"])
        for r in substring_span_pairs(
            both, k=5, min_len=8, df_cap=20
        ).collect()
    }
    assert self_form[(1, 10)] == got[(1, 10)]
    assert (2, 3) in self_form  # the self-join DOES see within-split


def test_scrub_token_spans_removes_exactly_the_leaked_ranges(spark):
    """Decontamination remediation: leaked spans are cut from train
    docs token-exactly — surrounding tokens and order intact, untouched
    docs byte-identical, overlapping spans composed, fully-leaked docs
    become empty rather than disappearing."""
    from nosql_to_sql_migration_tool_spark.operators.dedup import (
        leaked_span_positions,
        scrub_token_spans,
        substring_cross_leakage,
    )

    w = [f"w{i}" for i in range(40)]
    j = [f"j{i}" for i in range(30)]
    train = spark.createDataFrame(
        [
            (1, " ".join(j[:5] + w[0:12] + j[5:10])),  # leaks w0..w11
            (2, " ".join(j[10:28])),                   # clean
            (3, " ".join(w[0:20])),                    # fully leaked
        ],
        "doc_id long, text string",
    )
    evals = spark.createDataFrame(
        [(10, " ".join(w[:20]))], "doc_id long, text string"
    )
    spans = leaked_span_positions(train, evals, k=5, min_len=8, df_cap=20)
    got = {
        (r["doc_id"], r["start_pos"], r["span_words"])
        for r in spans.collect()
    }
    assert got == {(1, 5, 12), (3, 0, 20)}

    clean = {
        r["doc_id"]: r["text"]
        for r in scrub_token_spans(train, spans).collect()
    }
    assert clean[1] == " ".join(j[:5] + j[5:10])  # leak cut, rest intact
    assert clean[2] == " ".join(j[10:28])         # untouched
    assert clean[3] == ""                          # fully leaked -> empty
    # and the scrubbed corpus no longer leaks
    assert substring_cross_leakage(
        scrub_token_spans(train, spans), evals, k=5, min_len=8, df_cap=20
    ).count() == 0

    # overlapping ranges compose: drop tokens 2..6 and 4..9 of doc 2
    import pyspark.sql.functions as F  # noqa: F401 (local clarity)
    manual = spark.createDataFrame(
        [(2, 2, 5), (2, 4, 6)], "doc_id long, start_pos long, span_words long"
    )
    out = {
        r["doc_id"]: r["text"]
        for r in scrub_token_spans(train, manual).collect()
    }
    expect = j[10:28][:2] + j[10:28][10:]  # positions 0,1 then 10..17
    assert out[2] == " ".join(expect)
    originals = {r["doc_id"]: r["text"] for r in train.collect()}
    assert out[1] == originals[1]  # no spans for doc 1 in `manual`
    assert out[3] == originals[3]


def _token_level_span_reference(docs, k, min_len):
    """Independent reference for substring spans: token-level maximal
    matching runs per (pair, alignment offset) — no grams, no islands
    arithmetic. A maximal run of L >= k consecutive equal tokens at one
    offset is exactly one maximal span of span_words == L."""
    out = {}
    ids = sorted(docs)
    for i, a in enumerate(ids):
        for b in ids[i + 1:]:
            ta, tb = docs[a], docs[b]
            spans = []
            for d in range(-(len(tb) - 1), len(ta)):
                run = 0
                for pa in range(max(0, d), min(len(ta), len(tb) + d)):
                    if ta[pa] == tb[pa - d]:
                        run += 1
                    else:
                        if run >= max(k, min_len):
                            spans.append(run)
                        run = 0
                if run >= max(k, min_len):
                    spans.append(run)
            spans = [s for s in spans if s >= min_len]
            if spans:
                out[(a, b)] = (len(spans), max(spans), sum(spans))
    return out


def test_substring_spans_match_token_level_reference_random(spark):
    """Property: over random small corpora (tiny vocab to force shared
    grams, unbounded df_cap so blocking never prunes), the gram-islands
    implementation reproduces an independent token-level computation of
    every maximal span exactly — counts, max, and total."""
    from hypothesis import HealthCheck, given, settings, strategies as st

    from nosql_to_sql_migration_tool_spark.operators.dedup import (
        substring_span_pairs,
    )

    k, min_len = 3, 5
    vocab = st.sampled_from([f"t{i}" for i in range(6)])
    doc = st.lists(vocab, min_size=1, max_size=24)

    @settings(
        max_examples=12,
        deadline=None,
        suppress_health_check=[HealthCheck.too_slow],
    )
    @given(st.lists(doc, min_size=2, max_size=5))
    def check(token_docs):
        docs = {i: toks for i, toks in enumerate(token_docs)}
        df = spark.createDataFrame(
            [(i, " ".join(t)) for i, t in docs.items()],
            "doc_id long, text string",
        )
        got = {
            (r["id_a"], r["id_b"]): (
                r["n_spans"], r["max_span_words"], r["total_span_words"]
            )
            for r in substring_span_pairs(
                df, k=k, min_len=min_len, df_cap=10**6
            ).collect()
        }
        assert got == _token_level_span_reference(docs, k, min_len)

    check()


def test_update_components_matches_full_recompute(spark):
    """Incremental component maintenance == full recompute on the union
    corpus, across every interesting churn shape: new doc joins an old
    component, a new doc BRIDGES two old components (merge to the
    smaller label), new-new pairs form a fresh component, isolated new
    docs become singletons, and untouched components pass through
    row-for-row."""
    from pyspark.sql import functions as F

    from nosql_to_sql_migration_tool_spark.operators.dedup import (
        near_dup_components,
        update_components,
    )

    old_docs = spark.createDataFrame(
        [(i,) for i in (1, 2, 3, 10, 11, 20, 30)], ["doc_id"]
    )
    old_pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (10, 11)], ["id_a", "id_b"]
    )
    labels = near_dup_components(old_docs, pairs=old_pairs)

    # churn: 40 joins {10,11}; 41 bridges components {1,2,3} and {10,11};
    # 50-51 are a brand-new pair; 60 arrives isolated
    new_pairs = spark.createDataFrame(
        [(40, 10), (41, 3), (41, 11), (50, 51)], ["id_a", "id_b"]
    )
    new_docs = spark.createDataFrame([(60,)], ["doc_id"])

    updated = update_components(labels, new_pairs, new_docs=new_docs)
    got = {r["doc_id"]: r["component_id"] for r in updated.collect()}

    all_docs = old_docs.unionByName(
        spark.createDataFrame(
            [(i,) for i in (40, 41, 50, 51, 60)], ["doc_id"]
        )
    )
    full = {
        r["doc_id"]: r["component_id"]
        for r in near_dup_components(
            all_docs, pairs=old_pairs.unionByName(new_pairs)
        ).collect()
    }
    assert got == full
    # the bridge merged both old components under the global min label
    assert got[1] == got[2] == got[3] == got[10] == got[11] == got[40] == got[41] == 1
    assert got[50] == got[51] == 50
    assert got[60] == 60 and got[20] == 20 and got[30] == 30


def test_update_components_on_real_corpus(spark):
    """Split the planted-dup corpus by id: components from the 'old'
    half plus an incremental update with the remaining pairs equals the
    full-corpus recompute (labels AND row counts)."""
    from pyspark.sql import functions as F

    from nosql_to_sql_migration_tool_spark.fixtures import (
        duplicated_documents,
    )
    from nosql_to_sql_migration_tool_spark.operators.dedup import (
        near_dup_components,
        near_dup_pairs,
        update_components,
    )
    from nosql_to_sql_migration_tool_spark.sources.registry import load_table
    from tests.conftest import SF_DIR_SMOKE

    docs = duplicated_documents(
        load_table(spark, SF_DIR_SMOKE, "documents")
    ).localCheckpoint(eager=True)
    pairs = near_dup_pairs(docs).localCheckpoint(eager=True)

    cutoff = 100_000  # originals are old; planted copies arrive later
    old_docs = docs.filter(F.col("doc_id") < cutoff)
    old_pairs = pairs.filter(
        (F.col("id_a") < cutoff) & (F.col("id_b") < cutoff)
    )
    new_pairs = pairs.filter(
        (F.col("id_a") >= cutoff) | (F.col("id_b") >= cutoff)
    )
    labels = near_dup_components(old_docs, pairs=old_pairs)
    new_docs = docs.filter(F.col("doc_id") >= cutoff).select("doc_id")

    updated = update_components(labels, new_pairs, new_docs=new_docs)
    full = near_dup_components(docs, pairs=pairs)
    assert updated.count() == docs.count()
    assert updated.exceptAll(full).isEmpty()
    assert full.exceptAll(updated).isEmpty()


def test_update_components_new_docs_overlap_guard(spark):
    """Regression: a new_docs frame that (incorrectly but plausibly)
    re-lists already-labeled docs must not duplicate their rows or
    reset untouched labels — only genuinely-new ids enter the
    recompute."""
    from nosql_to_sql_migration_tool_spark.operators.dedup import (
        near_dup_components,
        update_components,
    )

    old_docs = spark.createDataFrame(
        [(i,) for i in (1, 2, 20)], ["doc_id"]
    )
    old_pairs = spark.createDataFrame([(1, 2)], ["id_a", "id_b"])
    labels = near_dup_components(old_docs, pairs=old_pairs)

    new_pairs = spark.createDataFrame([(30, 31)], ["id_a", "id_b"])
    # 20 is ALREADY labeled (untouched component) — sloppy caller
    sloppy_new = spark.createDataFrame([(30,), (31,), (20,)], ["doc_id"])
    updated = update_components(labels, new_pairs, new_docs=sloppy_new)
    rows = updated.collect()
    got = {r["doc_id"]: r["component_id"] for r in rows}
    assert len(rows) == len(got) == 5  # no duplicate rows
    assert got == {1: 1, 2: 1, 20: 20, 30: 30, 31: 30}


def test_components_raise_on_nonconvergence(spark):
    """ADVICE r10 (low): min-label propagation needs O(chain diameter)
    rounds; an exhausted max_iterations must raise (like the twostar
    variant), never silently return wrong labels — update_components'
    exact-equivalence contract depends on it."""
    import pytest

    from nosql_to_sql_migration_tool_spark.operators.dedup import (
        near_dup_components,
        update_components,
    )

    chain_ids = spark.createDataFrame(
        [(i,) for i in range(6)], ["doc_id"]
    )
    chain_pairs = spark.createDataFrame(
        [(i, i + 1) for i in range(5)], ["id_a", "id_b"]
    )
    with pytest.raises(RuntimeError, match="max_iterations"):
        near_dup_components(
            chain_ids, pairs=chain_pairs, max_iterations=1
        ).collect()
    labels = spark.createDataFrame(
        [(i, i) for i in range(6)], ["doc_id", "component_id"]
    )
    with pytest.raises(RuntimeError, match="max_iterations"):
        update_components(labels, chain_pairs, max_iterations=1).collect()
    # ample iterations: the same chain converges to one component
    got = update_components(labels, chain_pairs, max_iterations=20)
    assert {r["component_id"] for r in got.collect()} == {0}
