#!/usr/bin/env python
"""Round-15 optimization: time each SUB-STEP of the big build:* rows so
the concurrency/redundancy work targets measured cost, not guesses
(guide §1 measure-first). Read-only: uses the same memo functions the
bench prewarms, in the same order, and prints a per-step table.

Usage: SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 python tools/profile_builds_r15.py
"""

from __future__ import annotations

import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import nosql_to_sql_migration_tool_spark.queries as Q
from nosql_to_sql_migration_tool_spark.session import get_spark


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("profile_builds_r15")
    # same warmup as bench.py so step 1 is not billed JVM startup
    spark.range(1_000_000).selectExpr("sum(id)").write.format("noop").mode(
        "overwrite"
    ).save()

    def step(label, fn):
        spark.sparkContext.setJobDescription(label)
        t0 = time.perf_counter()
        out = fn()
        dt = time.perf_counter() - t0
        print(f"{dt:8.2f}s  {label}", flush=True)
        spark.sparkContext.setJobDescription(None)
        return out

    force = Q._force

    print("== build:dedup_text_memos ==")
    step("dedup_docs", lambda: force(Q._dedup_docs(spark, sf_dir)))
    step("dedup_shingles", lambda: force(Q._dedup_shingles(spark, sf_dir)))
    step("raw_shingles", lambda: force(Q._raw_shingles(spark, sf_dir)))
    step("dedup_simhash", lambda: force(Q._dedup_simhash(spark, sf_dir)))

    def _fp():
        from nosql_to_sql_migration_tool_spark.operators.text import (
            with_fingerprints,
        )

        with_fingerprints(
            Q.load_table(spark, sf_dir, "documents"),
            shingles=Q._raw_shingles(spark, sf_dir),
        ).select("doc_id", "exact_fp", "shingle_fp").write.format(
            "noop"
        ).mode("overwrite").save()

    step("with_fingerprints", _fp)
    step("dedup_cands", lambda: force(Q._dedup_cands(spark, sf_dir)))
    step("dedup_pairs", lambda: force(Q._dedup_pairs(spark, sf_dir)))
    step("dedup_components", lambda: force(Q._dedup_components(spark, sf_dir)))
    step("leak_spans", lambda: force(Q._leak_spans(spark, sf_dir)))

    print("== build:audit_truths ==")
    step("memo_emb_pairs", lambda: force(Q._memo_emb_pairs(spark, sf_dir)))
    step(
        "prefix_truth_pairs",
        lambda: force(Q._prefix_truth_pairs(spark, sf_dir)),
    )
    step("memo_truth_pairs", lambda: force(Q._memo_truth_pairs(spark, sf_dir)))
    step(
        "price_quantile_error_audit(first)",
        lambda: Q.q_price_quantile_error_audit(spark, sf_dir)
        .write.format("noop")
        .mode("overwrite")
        .save(),
    )
    step("orders_price_baseline", lambda: Q._orders_price_baseline(spark, sf_dir))
    step("events_type_baseline", lambda: Q._events_type_baseline(spark, sf_dir))

    print("== build:block_quantizers ==")
    step(
        "memo_centroids(raw,8,2,256)",
        lambda: Q._memo_centroids(spark, sf_dir, "raw", 8, 2, 256),
    )

    def _dup_q():
        k, tl = Q._blocking_params(Q._dup_emb_count(spark, sf_dir))
        Q._dup_emb_centroids(spark, sf_dir, k, 2, tl)

    step("dup_emb_centroids", _dup_q)
    step(
        "dup_emb_assigned(flat)",
        lambda: force(Q._dup_emb_assigned(spark, sf_dir, "flat")),
    )
    step(
        "dup_emb_assigned(two_level)",
        lambda: force(Q._dup_emb_assigned(spark, sf_dir, "two_level")),
    )
    step("memo_sq_params", lambda: force(Q._memo_sq_params(spark, sf_dir)))
    step("memo_sq_codes", lambda: force(Q._memo_sq_codes(spark, sf_dir)))
    step("memo_pq_books", lambda: Q._memo_pq_books(spark, sf_dir))
    step("memo_pq_encoded", lambda: force(Q._memo_pq_encoded(spark, sf_dir)))

    print("== build:ingest_state ==")
    step(
        "ingest_corpus_buckets",
        lambda: force(Q._ingest_corpus_buckets(spark, sf_dir)),
    )
    step(
        "ingest_emb_bands", lambda: force(Q._ingest_emb_bands(spark, sf_dir))
    )
    step(
        "ingest_cms_heavy_hitters",
        lambda: force(Q.q_ingest_cms_heavy_hitters(spark, sf_dir)),
    )
    step("takedown_state", lambda: Q._takedown_state(spark, sf_dir))
    step("inverted_store", lambda: Q._inverted_store(spark, sf_dir))
    step(
        "takedown_inverted_store",
        lambda: Q._takedown_inverted_store(spark, sf_dir),
    )
    step(
        "linkage_match_store", lambda: Q._linkage_match_store(spark, sf_dir)
    )

    print("== build:service_boot ==")
    step(
        "catalog_listing(first)",
        lambda: Q.q_catalog_listing(spark, sf_dir)
        .write.format("noop")
        .mode("overwrite")
        .save(),
    )
    step(
        "jdbc_roundtrip_agg(first)",
        lambda: Q.q_jdbc_roundtrip_agg(spark, sf_dir)
        .write.format("noop")
        .mode("overwrite")
        .save(),
    )

    print("== build:training_shards ==")
    for name, fn in Q.PREWARMS.items():
        if name == "build:training_shards":
            t0 = time.perf_counter()
            fn(spark, sf_dir)
            print(f"{time.perf_counter() - t0:8.2f}s  {name} (whole row)")


if __name__ == "__main__":
    main()
