#!/usr/bin/env python
"""Round-15 micro A/B: time alternative plan shapes for one query
against the current shape, same session, alternating repeats (guide §1:
isolate what you measure; noop sink). Each variant is a (label, fn)
pair; fn(spark, sf_dir) -> DataFrame.

Usage: python tools/micro_ab_r15.py <case> [repeats]
"""

from __future__ import annotations

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import os

from pyspark.sql import functions as F


def _noop(df):
    df.write.format("noop").mode("overwrite").save()


def case_quality(spark, sf_dir):
    from nosql_to_sql_migration_tool_spark.operators.text import (
        tokens,
        with_lang_guess,
        with_text_stats,
    )
    from nosql_to_sql_migration_tool_spark.sources.registry import load_table

    docs = load_table(spark, sf_dir, "documents")

    def current(spark, sf_dir):
        return (
            with_lang_guess(with_text_stats(docs))
            .filter(
                (F.col("quality_score") >= 0.3)
                & (F.col("lang_guess") == "en")
            )
            .select("doc_id", "quality_score", "lang_guess")
        )

    def materialized(spark, sf_dir):
        # token array materialized once; stats/lang read the array col
        from nosql_to_sql_migration_tool_spark.operators.text import (
            _in_list,
            LANG_MARKERS,
            PUNCT_RE,
            STOPWORDS,
            TOKEN_RE,
        )

        text = F.col("text")
        base = docs.select("doc_id", "text").withColumn(
            "__toks", tokens(text)
        )
        toks = F.col("__toks")
        n_ws = F.size(toks)
        punct = F.regexp_count(text, F.lit(PUNCT_RE))
        punct_ratio = F.round(
            punct * F.lit(1.0) / F.greatest(F.length(text), F.lit(1)), 6
        )
        stop = F.size(F.filter(toks, _in_list(STOPWORDS)))
        stop_ratio = F.round(
            stop * F.lit(1.0) / F.greatest(n_ws, F.lit(1)), 6
        )
        quality = F.round(
            F.least(F.lit(1.0), n_ws / F.lit(100.0))
            * (F.lit(1.0) - punct_ratio)
            * (F.lit(1.0) - F.lit(0.5) * stop_ratio),
            6,
        )
        scored = F.array(
            *[
                F.struct(
                    F.size(F.filter(toks, _in_list(words))).alias("s"),
                    F.lit(lang).alias("l"),
                )
                for lang, words in LANG_MARKERS.items()
            ]
        )
        best = F.array_max(scored)
        guess = F.when(best["s"] == 0, F.lit("unknown")).otherwise(
            best["l"]
        )
        stats = base.select(
            "doc_id",
            quality.alias("quality_score"),
            guess.alias("lang_guess"),
        )
        return stats.filter(
            (F.col("quality_score") >= 0.3)
            & (F.col("lang_guess") == "en")
        )

    return [("current", current), ("materialized", materialized)]


CASES = {"quality": case_quality}


def main() -> None:
    case = sys.argv[1]
    repeats = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    from nosql_to_sql_migration_tool_spark.session import get_spark

    spark = get_spark("micro_ab_r15")
    spark.range(1_000_000).selectExpr("sum(id)").write.format("noop").mode(
        "overwrite"
    ).save()

    variants = CASES[case](spark, sf_dir)
    # warm each once, then alternate timed repeats
    for label, fn in variants:
        _noop(fn(spark, sf_dir))
    times = {label: [] for label, _ in variants}
    for _ in range(repeats):
        for label, fn in variants:
            t0 = time.perf_counter()
            _noop(fn(spark, sf_dir))
            times[label].append(round(time.perf_counter() - t0, 3))
    for label, ts in times.items():
        print(f"{case}/{label}: min={min(ts):.3f} all={ts}")
    # result parity: sorted-row hash of each variant must agree
    import hashlib

    hashes = {}
    for label, fn in variants:
        pdf = fn(spark, sf_dir).toPandas()
        canon = hashlib.md5(
            str(
                sorted(
                    map(
                        tuple,
                        pdf[sorted(pdf.columns)].astype(str).values.tolist(),
                    )
                )
            ).encode()
        ).hexdigest()
        hashes[label] = canon
    print("hashes:", hashes, "match:", len(set(hashes.values())) == 1)


if __name__ == "__main__":
    main()
