#!/usr/bin/env python
"""Session-3 measure-first probe for the embedding-family cosine/HOF
costs (guide §1): times the two audit-truth memo builds (cache cleared
between reps) and the steady-state consumer query rows."""

from __future__ import annotations

import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent.parent))

import nosql_to_sql_migration_tool_spark.queries as Q
from nosql_to_sql_migration_tool_spark.session import get_spark


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("probe_cos_s3")
    spark.range(1_000_000).selectExpr("sum(id)").write.format("noop").mode(
        "overwrite"
    ).save()

    def step(label, fn):
        t0 = time.perf_counter()
        fn()
        dt = time.perf_counter() - t0
        print(f"{dt:8.2f}s  {label}", flush=True)

    # corpus size context
    from nosql_to_sql_migration_tool_spark.fixtures import (
        duplicated_embeddings,
    )

    emb = duplicated_embeddings(Q.load_table(spark, sf_dir, "embeddings"))
    print("emb rows:", emb.count(), flush=True)

    for rep in range(3):
        Q._EMB_PAIRS_CACHE.clear()
        Q._TRUTH_CACHE.clear()
        step(
            f"[{rep}] memo_emb_pairs build",
            lambda: Q._force(Q._memo_emb_pairs(spark, sf_dir)),
        )
        step(
            f"[{rep}] memo_truth_pairs build",
            lambda: Q._force(Q._memo_truth_pairs(spark, sf_dir)),
        )

    for q in (
        "knn_batch",
        "ivf_topk",
        "label_centroid_similarity",
        "semantic_near_dup_hier",
        "cosine_topk_exact" if "cosine_topk_exact" in Q.QUERIES else None,
        "sq8_topk" if "sq8_topk" in Q.QUERIES else None,
        "sq_recall_audit" if "sq_recall_audit" in Q.QUERIES else None,
        "embedding_lsh_recall_audit"
        if "embedding_lsh_recall_audit" in Q.QUERIES
        else None,
        "embedding_near_dup"
        if "embedding_near_dup" in Q.QUERIES
        else None,
        "hard_negatives" if "hard_negatives" in Q.QUERIES else None,
    ):
        if q is None or q not in Q.QUERIES:
            continue
        fn = Q.QUERIES[q]
        best = None
        for _ in range(3):
            t0 = time.perf_counter()
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            best = (
                time.perf_counter() - t0
                if best is None
                else min(best, time.perf_counter() - t0)
            )
        print(f"{best:8.2f}s  query {q} (min of 3)", flush=True)


if __name__ == "__main__":
    main()
