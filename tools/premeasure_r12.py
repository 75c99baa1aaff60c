"""Pre-registration 10x measurement for the round-12 candidates
(SQ8 ANN, DSIR importance weights) — the same two-point protocol as
tools/scale_probe.py (min-of-2, noop sink, fixed cores), run BEFORE the
operators enter the registry so their scale behavior is measured, not
argued. Expects the probe's 10x data at /tmp/sfprobe1 (run
tools/scale_probe.py once to generate)."""

from __future__ import annotations

import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F  # noqa: E402

from nosql_to_sql_migration_tool_spark.operators.sq import (  # noqa: E402
    sq_encode,
    sq_param_arrays,
    sq_params,
    sq_topk,
)
from nosql_to_sql_migration_tool_spark.operators.traindata import (  # noqa: E402
    dsir_bucket_ratios,
    dsir_weights,
)
from nosql_to_sql_migration_tool_spark.session import get_spark  # noqa: E402

SRC = "/root/testdata/sf0.1"
BIG = "/tmp/sfprobe1"


def main() -> None:
    spark = get_spark("premeasure-r12")
    spark.range(1_000_000).selectExpr("sum(id)").write.format("noop").mode(
        "overwrite"
    ).save()
    results: dict[str, dict[str, float]] = {}
    for sf_dir, key in ((SRC, "sf0.1"), (BIG, "10x")):
        emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet").select(
            "vec_id", "embedding"
        )
        docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
            "doc_id", "text", "lang"
        )
        raw = docs.select("doc_id", "text")
        target = docs.filter(F.col("lang") == "en").select("doc_id", "text")
        query = emb.filter(F.col("vec_id") == 7).select("embedding")

        # one-time artifacts (timed as their own build rows)
        builds = {}
        s = time.perf_counter()
        row = sq_param_arrays(sq_params(emb)).localCheckpoint(eager=True)
        codes = sq_encode(emb, row).localCheckpoint(eager=True)
        builds["build:sq_index"] = round(time.perf_counter() - s, 2)
        s = time.perf_counter()
        ratios = dsir_bucket_ratios(raw, target).localCheckpoint(eager=True)
        builds["build:dsir_ratios"] = round(time.perf_counter() - s, 2)

        frames = {
            "sq_topk (k=10, refine=4, persisted codes)": lambda: sq_topk(
                emb, query, k=10, refine=4, codes=codes, param_row=row
            ),
            "dsir_weights (persisted ratios)": lambda: dsir_weights(
                raw, target, ratios=ratios
            ),
        }
        res = dict(builds)
        for name, fn in frames.items():
            best = None
            for _ in range(2):
                s = time.perf_counter()
                fn().write.format("noop").mode("overwrite").save()
                el = time.perf_counter() - s
                best = el if best is None else min(best, el)
            res[name] = round(best, 2)
        results[key] = res
    print(f"\n{'row':45} {'sf0.1':>7} {'10x':>7} {'ratio':>6}")
    for name in results["sf0.1"]:
        a, b = results["sf0.1"][name], results["10x"][name]
        print(f"{name:45} {a:7.2f} {b:7.2f} {b / a:6.1f}")


if __name__ == "__main__":
    main()
