"""Pins for the at-scale parameter contracts (VERDICT r4 item 4 /
next-round ask 5): k(n) cluster blocking and the band bucket-width cap.

These are the knobs that keep the blocking family LINEAR in corpus size:
fixed k makes per-block pair volume n²/k (100× corpus → ~10,000×/k pair
work); an uncapped band bucket makes one degenerate band hash quadratic.
"""

from __future__ import annotations

import hashlib

import duckdb
import pytest
from pyspark.sql import functions as F

from nosql_to_sql_migration_tool_spark.operators.dedup import (
    MAX_BUCKET_WIDTH,
    minhash_candidates,
    simhash_candidates,
    with_salt_cells,
)
from nosql_to_sql_migration_tool_spark.operators.similarity import (
    blocking_clusters,
)


def test_blocking_clusters_is_the_sqrt_operating_point():
    # k ≈ √n: balances brute-force assignment (n·k) against per-block
    # pair volume (n²/k) — both Θ(n^1.5); k ∝ n would make assignment
    # quadratic, fixed k makes pairs quadratic.
    import math

    for n in (622, 2486, 100_000, 10_000_000):
        k = blocking_clusters(n)
        assert abs(k - math.sqrt(n)) <= 1
        cost = n * k + n * n / k
        # within 1% of the continuous optimum 2·n^1.5
        assert cost <= 2.02 * n**1.5
    # 100x corpus -> ~10x clusters (the sqrt contract)
    assert 9 <= blocking_clusters(1_000_000) / blocking_clusters(10_000) <= 11
    # clamps
    assert blocking_clusters(1) == 4
    assert blocking_clusters(10**12) == 1 << 16


def test_sf001_embedding_count_pin(duck):
    """The oracle strings derive k from a PINNED sf0.01 fixture count;
    this asserts the pin equals the live count so the static oracle and
    the dynamic Spark plan resolve the same k."""
    from nosql_to_sql_migration_tool_spark.fixtures import (
        DUPLICATED_EMBEDDINGS_SQL,
    )
    from nosql_to_sql_migration_tool_spark.queries import (
        SF001_DUP_EMBEDDINGS_N,
        _blocking_params,
        _SF001_BLOCK_K,
        _SF001_BLOCK_TRAIN,
    )

    con = duckdb.connect()
    con.execute(
        "CREATE VIEW embeddings AS SELECT * FROM "
        "'/root/testdata/sf0.01/embeddings.parquet'"
    )
    n = con.sql(
        f"SELECT count(*) FROM ({DUPLICATED_EMBEDDINGS_SQL})"
    ).fetchone()[0]
    assert n == SF001_DUP_EMBEDDINGS_N
    assert (_SF001_BLOCK_K, _SF001_BLOCK_TRAIN) == _blocking_params(n)
    # √622 → k=25; 8 vectors/centroid < floor → train=256 (r5 oracle)
    assert (_SF001_BLOCK_K, _SF001_BLOCK_TRAIN) == (25, 256)


def test_salt_cells_split_only_wide_buckets(spark):
    rows = [(i, "bucket_a") for i in range(600)] + [
        (1000 + i, "bucket_b") for i in range(10)
    ]
    buckets = spark.createDataFrame(rows, ["doc_id", "band_hash"]).withColumn(
        "band_idx", F.lit(0)
    )
    salted = with_salt_cells(
        buckets, ["band_idx", "band_hash"], "doc_id", max_bucket_width=256
    ).toPandas()
    wide = salted[salted.band_hash == "bucket_a"]
    narrow = salted[salted.band_hash == "bucket_b"]
    # narrow bucket: untouched, one cell
    assert set(narrow["__cell"]) == {0}
    # wide bucket: split into ceil(600/256)=3 deterministic cells
    assert set(wide["__cell"]) == {0, 1, 2}
    # the effective width is bounded ~n/cells, not 600
    assert wide.groupby("__cell").size().max() < 300


def _degenerate_corpus_sql(n: int) -> str:
    return (
        f"SELECT CAST(i AS BIGINT) AS doc_id, "
        f"'identical boilerplate text shared by every document' AS text "
        f"FROM generate_series(0, {n - 1}) t(i)"
    )


def _canon(df) -> str:
    return hashlib.md5(
        str(
            sorted(
                map(tuple, df[sorted(df.columns)].astype(str).values.tolist())
            )
        ).encode()
    ).hexdigest()


@pytest.mark.parametrize("family", ["minhash", "simhash"])
def test_capped_band_join_matches_oracle_on_degenerate_bucket(
    spark, family
):
    """600 identical documents — every band bucket is width 600 (>
    MAX_BUCKET_WIDTH) — the salt cap must (a) bound the join and (b)
    produce byte-identical pairs cross-engine, since the oracle mirrors
    the same salt/cell arithmetic."""
    from nosql_to_sql_migration_tool_spark.operators.dedup import (
        band_hashes_sql,
        minhash_signature_sql,
        salted_buckets_sql,
        simhash_sql,
    )

    n = 600
    docs = spark.createDataFrame(
        [(i, "identical boilerplate text shared by every document") for i in range(n)],
        ["doc_id", "text"],
    )
    con = duckdb.connect()
    if family == "minhash":
        got = minhash_candidates(docs).toPandas()
        oracle = f"""
WITH docs AS ({_degenerate_corpus_sql(n)}),
sig AS (SELECT doc_id, {minhash_signature_sql('text')} AS sig FROM docs),
bands AS (
  SELECT doc_id, generate_subscripts(b, 1) AS band_idx, unnest(b) AS band_hash
  FROM (SELECT doc_id, {band_hashes_sql('sig')} AS b FROM sig)
),
salted AS ({salted_buckets_sql('bands', ['band_idx', 'band_hash'], 'doc_id')})
SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
FROM salted a JOIN salted b
  ON a.band_idx = b.band_idx AND a.band_hash = b.band_hash
 AND a.cell = b.cell AND a.doc_id < b.doc_id
"""
    else:
        got = simhash_candidates(docs, max_hamming=3).toPandas()
        oracle = f"""
WITH docs AS ({_degenerate_corpus_sql(n)}),
sigs AS (SELECT doc_id, {simhash_sql('text')} AS sh FROM docs),
bands AS (
  SELECT doc_id, sh, generate_subscripts(b, 1) AS band_idx,
         unnest(b) AS band_val
  FROM (SELECT doc_id, sh,
               [substr(sh, 1, 8), substr(sh, 9, 8),
                substr(sh, 17, 8), substr(sh, 25, 8)] AS b
        FROM sigs)
),
salted AS ({salted_buckets_sql('bands', ['band_idx', 'band_val'], 'doc_id')})
SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b,
       CAST(0 AS INT) AS hamming
FROM salted a JOIN salted b
  ON a.band_idx = b.band_idx AND a.band_val = b.band_val
 AND a.cell = b.cell AND a.doc_id < b.doc_id
"""
    want = con.sql(oracle).df()
    assert len(got) == len(want)
    assert _canon(got) == _canon(want)
    # the cap engaged: identical docs would otherwise pair all-vs-all
    assert 0 < len(got) < n * (n - 1) / 2
    # every surviving pair is a genuine same-cell pair per band — the
    # bounded-work contract: with width 600 and B=256, 3 cells of ~200
    # members pair within themselves, so pair count is ~3 * C(200, 2)
    assert len(got) < 3 * (n / 3) * (n / 3 - 1) / 2 * 1.2


def test_uncapped_path_still_available(spark):
    """max_bucket_width=None restores the exact (quadratic-risk) join —
    the knob is a cap, not a silent semantics change."""
    docs = spark.createDataFrame(
        [(i, "identical boilerplate text shared by every document") for i in range(40)],
        ["doc_id", "text"],
    )
    got = minhash_candidates(docs, max_bucket_width=None).toPandas()
    assert len(got) == 40 * 39 / 2


def test_two_level_quantizer_parents_and_determinism():
    from nosql_to_sql_migration_tool_spark.operators.similarity import (
        two_level_quantizer,
    )

    cents = [
        (i, [float((i * 7 + d) % 5) - 2.0 for d in range(8)], 1.0)
        for i in range(16)
    ]
    import math

    cents = [
        (cid, v, math.sqrt(sum(x * x for x in v))) for cid, v, _ in cents
    ]
    coarse, parents = two_level_quantizer(cents)
    again = two_level_quantizer(cents)
    assert (coarse, parents) == again  # fully deterministic
    assert sorted(parents) == [c[0] for c in cents]  # every fine cid mapped
    coarse_ids = {c[0] for c in coarse}
    assert set(parents.values()) <= coarse_ids
    assert 2 <= len(coarse) <= 4  # ~sqrt(16), empties may drop


def test_hierarchical_blocking_finds_planted_exact_dups(spark):
    """The planted exact copies (vec_id +10000, identical vector) have
    cosine 1.0 and must survive hierarchical assignment: both copies of
    a pair land in the SAME fine block (identical vectors take the
    identical coarse cell and cell-local argmax)."""
    from nosql_to_sql_migration_tool_spark.queries import QUERIES

    pairs = (
        QUERIES["semantic_near_dup_hier"](spark, "/root/testdata/sf0.001")
        .toPandas()
    )
    exact = pairs[
        (pairs.id_a < 10_000) & (pairs.id_b == pairs.id_a + 10_000)
    ]
    assert (exact.cos_sim == 1.0).all()
    assert len(exact) > 0
