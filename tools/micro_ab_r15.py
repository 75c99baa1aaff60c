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


def case_containment(spark, sf_dir):
    """Decompose containment_dup_pairs (2.96s baseline): candidate-prune
    stage alone vs the full current shape vs a common-array verify that
    ships only non-rare shingles through the pair join. Exactness of the
    variant: every shared shingle is globally rare or globally common, so
    |A∩B| = __cr (shared-rare, already aggregated by the prune shuffle)
    + |common(A) ∩ common(B)|."""
    from nosql_to_sql_migration_tool_spark.operators.dedup import (
        DEFAULT_CONTAINMENT_DF_CAP,
        containment_pairs,
        shingle_sets,
    )
    import nosql_to_sql_migration_tool_spark.queries as Q

    docs = Q._dedup_docs(spark, sf_dir)
    sh_sets = Q._dedup_shingles(spark, sf_dir)
    sh_sets.count()  # memo forced outside the timings, as in bench

    def current(spark, sf_dir):
        return containment_pairs(docs, shingles=sh_sets)

    def _stages(num, den, cap):
        id_col = "doc_id"
        rows = sh_sets.select(
            F.col(id_col).alias("id"), F.explode("__sh").alias("__s")
        )
        rare = (
            rows.groupBy("__s")
            .agg(F.count(F.lit(1)).alias("__df"))
            .filter(F.col("__df") <= cap)
            .select("__s")
        )
        rare_rows = rows.join(rare, "__s").localCheckpoint(eager=True)
        doc_stats = (
            rare_rows.groupBy("id")
            .agg(F.count(F.lit(1)).alias("__n_rare"))
            .join(
                sh_sets.select(
                    F.col(id_col).alias("id"), F.size("__sh").alias("__n")
                ),
                "id",
            )
            .withColumn("__n_common", F.col("__n") - F.col("__n_rare"))
        )
        pair_counts = (
            rare_rows.select(F.col("id").alias("id_a"), "__s")
            .join(rare_rows.select(F.col("id").alias("id_b"), "__s"), "__s")
            .filter(F.col("id_a") < F.col("id_b"))
            .groupBy("id_a", "id_b")
            .agg(F.count(F.lit(1)).alias("__cr"))
        )
        sa = doc_stats.select(
            F.col("id").alias("id_a"),
            F.col("__n").alias("__na"),
            F.col("__n_common").alias("__ca"),
        )
        sb = doc_stats.select(
            F.col("id").alias("id_b"),
            F.col("__n").alias("__nb"),
            F.col("__n_common").alias("__cb"),
        )
        upper = F.col("__cr") + F.least(F.col("__ca"), F.col("__cb"))
        cands = (
            pair_counts.join(sa, "id_a")
            .join(sb, "id_b")
            .filter(
                (upper * den >= F.lit(num) * F.col("__na"))
                | (upper * den >= F.lit(num) * F.col("__nb"))
            )
        )
        return rows, rare, cands

    def cands_only(spark, sf_dir):
        _, _, cands = _stages(4, 5, DEFAULT_CONTAINMENT_DF_CAP)
        return cands.select("id_a", "id_b")

    def commonverify(spark, sf_dir):
        num, den = 4, 5
        rows, rare, cands = _stages(num, den, DEFAULT_CONTAINMENT_DF_CAP)
        common_sets = (
            rows.join(rare, "__s", "left_anti")
            .groupBy("id")
            .agg(F.collect_list("__s").alias("__shc"))
        )
        a = common_sets.select(
            F.col("id").alias("id_a"), F.col("__shc").alias("__shc_a")
        )
        b = common_sets.select(
            F.col("id").alias("id_b"), F.col("__shc").alias("__shc_b")
        )
        empty = F.array().cast("array<string>")
        ic = F.size(
            F.array_intersect(
                F.coalesce("__shc_a", empty), F.coalesce("__shc_b", empty)
            )
        )
        return (
            cands.join(a, "id_a", "left")
            .join(b, "id_b", "left")
            .withColumn("__i", F.col("__cr") + ic)
            .filter(
                (F.col("__i") * den >= F.lit(num) * F.col("__na"))
                | (F.col("__i") * den >= F.lit(num) * F.col("__nb"))
            )
            .select(
                "id_a",
                "id_b",
                F.round(F.col("__i") * F.lit(1.0) / F.col("__na"), 6).alias(
                    "containment_a_in_b"
                ),
                F.round(F.col("__i") * F.lit(1.0) / F.col("__nb"), 6).alias(
                    "containment_b_in_a"
                ),
            )
        )

    def rarerows_only(spark, sf_dir):
        id_col = "doc_id"
        rows = sh_sets.select(
            F.col(id_col).alias("id"), F.explode("__sh").alias("__s")
        )
        rare = (
            rows.groupBy("__s")
            .agg(F.count(F.lit(1)).alias("__df"))
            .filter(F.col("__df") <= DEFAULT_CONTAINMENT_DF_CAP)
            .select("__s")
        )
        return rows.join(rare, "__s").localCheckpoint(eager=True)

    def window_rarerows(spark, sf_dir):
        from pyspark.sql import Window

        id_col = "doc_id"
        rows = sh_sets.select(
            F.col(id_col).alias("id"), F.explode("__sh").alias("__s")
        )
        return (
            rows.withColumn(
                "__df", F.count(F.lit(1)).over(Window.partitionBy("__s"))
            )
            .filter(F.col("__df") <= DEFAULT_CONTAINMENT_DF_CAP)
            .select("id", "__s")
            .localCheckpoint(eager=True)
        )

    def groupgen(spark, sf_dir):
        """ONE groupBy(__s) with collect_list replaces {df groupBy,
        rows-rare join, row-level self-join}: rare shingles hold <=
        df_cap ids, so the <=C(cap,2) pairs per shingle generate from
        the sorted id array with higher-order functions."""
        num, den, cap = 4, 5, DEFAULT_CONTAINMENT_DF_CAP
        id_col = "doc_id"
        rows = sh_sets.select(
            F.col(id_col).alias("id"), F.explode("__sh").alias("__s")
        )
        grouped = (
            rows.groupBy("__s")
            .agg(F.sort_array(F.collect_list("id")).alias("__ids"))
            .filter(F.size("__ids") <= cap)
            .localCheckpoint(eager=True)
        )
        pair_structs = F.flatten(
            F.transform(
                "__ids",
                lambda x, i: F.transform(
                    F.slice(
                        "__ids", i + F.lit(2), F.size("__ids") - i - 1
                    ),
                    lambda y: F.struct(
                        x.alias("id_a"), y.alias("id_b")
                    ),
                ),
            )
        )
        pair_counts = (
            grouped.select(F.explode(pair_structs).alias("__p"))
            .select("__p.id_a", "__p.id_b")
            .groupBy("id_a", "id_b")
            .agg(F.count(F.lit(1)).alias("__cr"))
        )
        doc_stats = (
            grouped.select(F.explode("__ids").alias("id"))
            .groupBy("id")
            .agg(F.count(F.lit(1)).alias("__n_rare"))
            .join(
                sh_sets.select(
                    F.col(id_col).alias("id"), F.size("__sh").alias("__n")
                ),
                "id",
            )
            .withColumn("__n_common", F.col("__n") - F.col("__n_rare"))
        )
        sa = doc_stats.select(
            F.col("id").alias("id_a"),
            F.col("__n").alias("__na"),
            F.col("__n_common").alias("__ca"),
        )
        sb = doc_stats.select(
            F.col("id").alias("id_b"),
            F.col("__n").alias("__nb"),
            F.col("__n_common").alias("__cb"),
        )
        upper = F.col("__cr") + F.least(F.col("__ca"), F.col("__cb"))
        cands = (
            pair_counts.join(sa, "id_a")
            .join(sb, "id_b")
            .filter(
                (upper * den >= F.lit(num) * F.col("__na"))
                | (upper * den >= F.lit(num) * F.col("__nb"))
            )
            .select("id_a", "id_b")
        )
        a = sh_sets.select(
            F.col(id_col).alias("id_a"), F.col("__sh").alias("__sh_a")
        )
        b = sh_sets.select(
            F.col(id_col).alias("id_b"), F.col("__sh").alias("__sh_b")
        )
        inter = F.size(F.array_intersect("__sh_a", "__sh_b"))
        na, nb = F.size("__sh_a"), F.size("__sh_b")
        return (
            cands.join(a, "id_a")
            .join(b, "id_b")
            .withColumn("__i", inter)
            .filter(
                (F.col("__i") * den >= F.lit(num) * na)
                | (F.col("__i") * den >= F.lit(num) * nb)
            )
            .select(
                "id_a",
                "id_b",
                F.round(F.col("__i") * F.lit(1.0) / na, 6).alias(
                    "containment_a_in_b"
                ),
                F.round(F.col("__i") * F.lit(1.0) / nb, 6).alias(
                    "containment_b_in_a"
                ),
            )
        )

    return [
        ("current", current),
        ("cands_only", cands_only),
        ("commonverify", commonverify),
        ("rarerows_only", rarerows_only),
        ("window_rarerows", window_rarerows),
        ("groupgen", groupgen),
    ]


def case_cands(spark, sf_dir):
    """Decompose build:dedup_text_memos' dominant step (dedup_cands,
    ~5.1s profiled): the sig-table subtree feeds the bucket widths
    groupBy, the width join-back AND both sides of the bucket self-join
    — up to 4 references. Variants checkpoint the metadata-sized frames
    (sig: 1 row/doc x 13 cols; buckets: N_BANDS rows/doc x 3 cols) so
    downstream reads them instead of re-deriving."""
    from nosql_to_sql_migration_tool_spark.operators.dedup import (
        MAX_BUCKET_WIDTH,
        N_BANDS,
        ROWS_PER_BAND,
        minhash_candidates,
        minhash_sig_table,
        with_salt_cells,
    )
    import nosql_to_sql_migration_tool_spark.queries as Q

    docs = Q._dedup_docs(spark, sf_dir)
    sh_sets = Q._dedup_shingles(spark, sf_dir)
    sh_sets.count()  # memo forced outside the timings, as in bench

    def current(spark, sf_dir):
        return minhash_candidates(docs, shingles=sh_sets)

    def sig_only(spark, sf_dir):
        return minhash_sig_table(docs, shingles=sh_sets)

    def _from_buckets(buckets):
        keys = ["band_idx", "band_hash"]
        buckets = with_salt_cells(buckets, keys, "doc_id", MAX_BUCKET_WIDTH)
        keys = keys + ["__cell"]
        a = buckets.select(F.col("doc_id").alias("id_a"), *keys)
        b = buckets.select(F.col("doc_id").alias("id_b"), *keys)
        return (
            a.join(b, keys)
            .filter(F.col("id_a") < F.col("id_b"))
            .select("id_a", "id_b")
            .distinct()
        )

    def _buckets_of(sig):
        bands_arr = F.array(
            *[
                F.md5(
                    F.concat_ws(
                        ",",
                        *[
                            F.col(f"__h{bnd * ROWS_PER_BAND + j}")
                            for j in range(ROWS_PER_BAND)
                        ],
                    )
                )
                for bnd in range(N_BANDS)
            ]
        )
        return sig.select(
            "doc_id", F.posexplode(bands_arr).alias("band_idx", "band_hash")
        )

    def ckpt_sig(spark, sf_dir):
        sig = minhash_sig_table(docs, shingles=sh_sets).localCheckpoint(
            eager=True
        )
        return _from_buckets(_buckets_of(sig))

    def ckpt_buckets(spark, sf_dir):
        sig = minhash_sig_table(docs, shingles=sh_sets)
        buckets = _buckets_of(sig).localCheckpoint(eager=True)
        return _from_buckets(buckets)

    return [
        ("current", current),
        ("sig_only", sig_only),
        ("ckpt_sig", ckpt_sig),
        ("ckpt_buckets", ckpt_buckets),
    ]


def case_prefix(spark, sf_dir):
    """Decompose jaccard_prefix_pairs (prefix_truth_pairs memo, ~4.3s
    profiled): the prefix frame (rows -> dfreq join -> two windows ->
    filter) feeds BOTH sides of the candidate self-join — the same
    multi-referenced-subtree disease as the quantile audit. Variant
    checkpoints the (metadata-narrow) prefix frame once."""
    from pyspark.sql import Window

    from nosql_to_sql_migration_tool_spark.operators.dedup import (
        jaccard_prefix_pairs,
    )
    import nosql_to_sql_migration_tool_spark.queries as Q

    docs = Q._dedup_docs(spark, sf_dir)
    sh_sets = Q._dedup_shingles(spark, sf_dir)
    sh_sets.count()

    def rows():
        return sh_sets.select("doc_id", F.explode("__sh").alias("__s"))

    def current(spark, sf_dir):
        return jaccard_prefix_pairs(
            docs, tau_num=3, tau_den=5, rows=rows(), shingles=sh_sets
        )

    def ckpt_prefix(spark, sf_dir):
        tau_num, tau_den, id_col = 3, 5, "doc_id"
        r = rows()
        dfreq = r.groupBy("__s").agg(F.count(F.lit(1)).alias("__df"))
        w = Window.partitionBy(id_col).orderBy("__df", "__s")
        sized = r.join(dfreq, "__s").select(
            id_col,
            "__s",
            F.row_number().over(w).alias("__pos"),
            F.count(F.lit(1))
            .over(Window.partitionBy(id_col))
            .alias("__sz"),
        )
        ceil_tau_s = F.floor(
            (F.lit(tau_num) * F.col("__sz") + F.lit(tau_den - 1))
            / F.lit(tau_den)
        )
        prefix = (
            sized.filter(
                F.col("__pos") <= F.col("__sz") - ceil_tau_s + F.lit(1)
            )
            .select(id_col, "__s")
            .localCheckpoint(eager=True)
        )
        cand = (
            prefix.select(F.col(id_col).alias("id_a"), "__s")
            .join(prefix.select(F.col(id_col).alias("id_b"), "__s"), "__s")
            .filter(F.col("id_a") < F.col("id_b"))
            .select("id_a", "id_b")
            .distinct()
        )
        a = sh_sets.select(
            F.col(id_col).alias("id_a"), F.col("__sh").alias("__sh_a")
        )
        b = sh_sets.select(
            F.col(id_col).alias("id_b"), F.col("__sh").alias("__sh_b")
        )
        jac = F.round(
            F.size(F.array_intersect("__sh_a", "__sh_b"))
            * F.lit(1.0)
            / F.size(F.array_union("__sh_a", "__sh_b")),
            6,
        )
        return (
            cand.join(a, "id_a")
            .join(b, "id_b")
            .select("id_a", "id_b", jac.alias("jaccard"))
            .filter(F.col("jaccard") >= F.lit(tau_num) / F.lit(tau_den))
        )

    return [("current", current), ("ckpt_prefix", ckpt_prefix)]


CASES = {
    "quality": case_quality,
    "containment": case_containment,
    "cands": case_cands,
    "prefix": case_prefix,
}


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
