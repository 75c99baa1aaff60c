#!/usr/bin/env python
"""Session-3 decomposition of build:ingest_state's critical chain
(guide §1 measure-first): time gate_batch and takedown_docs separately
inside _takedown_state, and the two inverted-store maintenance steps.
Read-only probe; replays exactly what the prewarm row does."""

from __future__ import annotations

import os
import shutil
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent.parent))

import nosql_to_sql_migration_tool_spark.queries as Q
from nosql_to_sql_migration_tool_spark.session import get_spark
from pyspark.sql import functions as F


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("probe_ingest_s3")
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

    from nosql_to_sql_migration_tool_spark.streaming.ingest_stream import (
        gate_batch,
        takedown_docs,
    )

    # replicate _takedown_state body with per-step timing
    step(
        "ingest_corpus_buckets(memo)",
        lambda: Q._force(Q._ingest_corpus_buckets(spark, sf_dir)),
    )
    for rep in range(2):
        base = os.path.join(
            Q._scratch_dir("probe_takedown_s3"),
            os.path.basename(sf_dir.rstrip("/")),
        )
        shutil.rmtree(base, ignore_errors=True)
        idx = base + "/index"
        acc = base + "/accepted"
        qua = base + "/quarantine"
        docs = Q.load_table(spark, sf_dir, "documents").select(
            "doc_id", "text"
        )
        k = F.col("doc_id")
        corpus = docs.filter(k % 5 != 0)
        step(
            f"[{rep}] index write",
            lambda: Q._ingest_corpus_buckets(spark, sf_dir)
            .write.mode("overwrite")
            .partitionBy("band_idx")
            .parquet(idx),
        )
        batch = step(
            f"[{rep}] batch ckpt",
            lambda: docs.filter(k % 5 == 0).localCheckpoint(eager=True),
        )
        step(
            f"[{rep}] gate_batch",
            lambda: gate_batch(batch, 0, corpus, idx, acc, qua),
        )
        step(
            f"[{rep}] takedown_docs",
            lambda: takedown_docs(
                spark,
                docs.filter(k % 15 == 0).select("doc_id"),
                acc,
                qua,
                idx,
            ),
        )

    # inverted store chain, twice (first pays codegen warmup)
    from nosql_to_sql_migration_tool_spark.operators.inverted import (
        compact_inverted_index,
        update_inverted_index,
    )

    for rep in range(2):
        base = os.path.join(
            Q._scratch_dir("probe_inv_s3"),
            os.path.basename(sf_dir.rstrip("/")),
        )
        shutil.rmtree(base, ignore_errors=True)
        docs = Q.load_table(spark, sf_dir, "documents").select(
            "doc_id", "text"
        )
        k = F.col("doc_id")
        step(
            f"[{rep}] update_inverted(batch0)",
            lambda: update_inverted_index(docs.filter(k % 2 == 0), base, 0),
        )
        step(
            f"[{rep}] update_inverted(batch1)",
            lambda: update_inverted_index(docs.filter(k % 2 == 1), base, 1),
        )
        step(
            f"[{rep}] compact_inverted",
            lambda: compact_inverted_index(spark, base),
        )


if __name__ == "__main__":
    main()
