#!/usr/bin/env python
"""Two-point scaling probe (SCALE.md "Measured scaling", round 7).

Builds a 10x replica of the sf0.1 test data under ``--out`` and times
the heavy query families at both scales in one session (min-of-2 per
query, one-shot build rows), printing a family table of wall ratios.

Replication is key-shifted so per-copy distributions are identical and
keys stay unique; DOCUMENTS additionally pass a per-copy lowercase
letter substitution — each copy must be an independent shard, NOT a
near-dup of the others, or dedup workloads inherit a synthetic
quadratic pair blow-up that measures the fixture instead of the plan
(the same lesson as knn_batch's bounded probe batch).

Usage::

    python tools/scale_probe.py --out /tmp/sfprobe1 [--skip-gen]
"""

from __future__ import annotations

import argparse
import json
import shutil
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

SRC = "/root/testdata/sf0.1"
REP = 10
ALPHA = "abcdefghijklmnopqrstuvwxyz"

# Above 26 copies the alphabet-rotation trick runs out of distinct
# substitutions (copies would become exact dups of earlier copies and
# dedup workloads would inherit a synthetic quadratic pair blow-up), so
# large replications tag every token with the copy index instead —
# vocabularies stay pairwise disjoint, each copy an independent shard.

FAMS = {
    # minhash_candidates was de-registered in r14 (bench trim) — the
    # candidate stage stays probed through near_dup_pairs' shared memos
    "dedup": [
        "exact_dup_groups", "near_dup_pairs",
        "containment_dup_pairs", "cross_doc_chunk_dups",
        "simhash_near_pairs", "jaccard_prefix_pairs", "ingest_near_dup",
    ],
    # pq_topk was de-registered in r12 (bench trim); the PQ pipeline
    # stays probed via pq_topk_rerank's shared artifacts
    "similarity": [
        "cosine_topk", "knn_batch", "ivf_topk", "semantic_near_dup",
        "pq_topk_rerank",
    ],
    "quantile": [
                "customer_spend_deciles", "price_quantile_error_audit",
        "median_price_by_priority",
    ],
    "text": [
        "bpe_token_stats", "charlm_doc_scores", "token_frequencies",
        "nb_doc_scores",
    ],
    "events": [
        "events_trailing_hour_avg", "weekly_active_users",
        "events_user_skew_profile",
    ],
    # round 8 (VERDICT r7 next #6): families with no measured 10x row yet
    "timeseries": [
        "events_hourly_gapfill", "event_funnel_counts",
        "user_cohort_retention", "event_mad_outlier_days",
        "events_session_window",
    ],
    "graph": ["near_dup_pagerank", "near_dup_components_twostar"],
    # orders_asof_recent_event was de-registered in r12 (bench trim) —
    # the linear-merge asof operator stays probed via the last-event row
    "asof": ["orders_asof_last_event"],
    "newcomers_r7r8": [
        "split_leakage_audit", "ingest_embedding_near_dup",
        "cms_heavy_hitters_audit", "orders_price_drift_audit",
        "events_type_drift_audit",
    ],
    # round 9 additions
    "newcomers_r9": [
        "substring_dup_spans", "ingest_cms_heavy_hitters",
        "orders_price_drift_vs_baseline",
    ],
    # round 10 additions (the registered six; linear_count and the
    # categorical baseline are metadata-bounded by construction but
    # measured anyway — cheap rows, and "measured" beats "argued")
    "newcomers_r10": [
        "substring_cross_leakage", "scrub_token_spans", "linear_count",
        "leakage_safe_split", "categorical_drift_vs_baseline",
        "training_shard_export",
    ],
    # round 11 additions (the registered five)
    # bm25_topk (scan form) was de-registered in r14 (bench trim) — the
    # scan math stays probed via bm25_batch_topk + the indexed row
    "newcomers_r11": [
        "vocab_growth", "linear_count_by",
        "update_components", "takedown_audit",
    ],
    # round 12 additions (the registered seven; bm25_topk_indexed joined
    # late — its first 100x rows were measured manually, SCALE.md
    # round-12 addendum)
    # phrase_match (scan form) was de-registered in r14 (bench trim) —
    # the scan semantics are the indexed row's oracle
    "newcomers_r12": [
        "sq8_topk", "dsir_select", "weighted_sample",
        "token_fertility_by_lang", "doc_duplication_rate",
        "bm25_topk_indexed", "bm25_batch_topk",
    ],
    # round 13 additions (the registered six). linkage_scores runs on
    # customer, which the replica keeps FIXED (dims are copied, not
    # replicated), so its ratio here is trivially ~1 — its real scale
    # evidence is the r12 blocking-cardinality study (SCALE.md: compound
    # key 30x faster at 10x). bloom_fp_audit's BUILD side (orders)
    # replicates while its probe (customer) stays fixed — exactly the
    # shape the bitmap is for (shuffle <= m rows at any build size).
    "newcomers_r13": [
        "linkage_scores", "phrase_match_indexed", "bloom_fp_audit",
        "data_recipe", "binned_quantiles_by", "token_entropy",
    ],
    # round 14 additions (the registered six). linkage_blocking_recall
    # runs on the fixed customer dim (same caveat as linkage_scores —
    # its real scale evidence is the r12 blocking-cardinality study);
    # sq_recall_audit / hard_negatives run on the REPLICATED embeddings;
    # webdataset_roundtrip / bm25_after_takedown probe the replicated
    # corpus through their build:-hosted stores (training_shards /
    # ingest_state).
    "newcomers_r14": [
        "redact_pii", "sq_recall_audit", "hard_negatives",
        "linkage_blocking_recall", "webdataset_roundtrip",
        "bm25_after_takedown",
    ],
    # round 15 additions (the registered six). kmv_* re-probed on the
    # ADVICE-r14 rewritten plan (hash DISTINCT + TakeOrdered) — the
    # replica keeps o_custkey cardinality fixed, so the sketch cut is
    # constant and the ratio measures the scan+distinct. The linkage
    # rows and mongoexport_roundtrip run on the FIXED customer dim
    # (the r13 linkage caveat: real scale evidence is the r12
    # blocking-cardinality study + the O(batch) store argument);
    # entity_counts runs on the replicated corpus through the
    # TitleCase fixture projection.
    "newcomers_r15": [
        "kmv_distinct", "kmv_error_audit", "entity_counts",
        "multi_pass_linkage_scores", "update_linkage_matches",
        "mongoexport_roundtrip",
    ],
}


def generate(out: str, rep: int = REP) -> None:
    import duckdb

    con = duckdb.connect()
    Path(out).mkdir(parents=True, exist_ok=True)
    shifted = {
        "embeddings": "SELECT vec_id + {i}*100000 AS vec_id, embedding, label FROM t",
        "orders": (
            "SELECT o_orderkey + {i}*10000000 AS o_orderkey, o_custkey, "
            "o_orderstatus, o_totalprice, o_orderdate, o_orderpriority FROM t"
        ),
        "lineitem": (
            "SELECT l_orderkey + {i}*10000000 AS l_orderkey, l_partkey, "
            "l_suppkey, l_linenumber, l_quantity, l_extendedprice, "
            "l_discount, l_tax, l_returnflag, l_linestatus, l_shipdate FROM t"
        ),
        "events": (
            "SELECT event_id + {i}*10000000 AS event_id, ts, "
            "user_id + {i}*1000000 AS user_id, event_type, value, props FROM t"
        ),
    }
    for t, q in shifted.items():
        con.execute(f"CREATE OR REPLACE VIEW t AS SELECT * FROM '{SRC}/{t}.parquet'")
        union = " UNION ALL ".join(q.format(i=i) for i in range(rep))
        con.execute(f"COPY ({union}) TO '{out}/{t}.parquet' (FORMAT PARQUET)")
    parts = []
    for i in range(rep):
        if rep <= 26:
            rot = ALPHA[i:] + ALPHA[:i]
            text_expr = f"translate(text, '{ALPHA}', '{rot}')"
        else:
            text_expr = (
                "regexp_replace(text, '(\\S+)', " f"'\\1x{i}'" ", 'g')"
            )
        parts.append(
            f"SELECT doc_id + {i}*100000 AS doc_id, "
            f"{text_expr} AS text, lang, source, "
            f"n_chars FROM '{SRC}/documents.parquet'"
        )
    con.execute(
        f"COPY ({' UNION ALL '.join(parts)}) TO '{out}/documents.parquet' "
        "(FORMAT PARQUET)"
    )
    for t in ("customer", "supplier", "part", "nation", "region"):
        shutil.copy(f"{SRC}/{t}.parquet", f"{out}/{t}.parquet")


def run(
    out: str,
    fams: "dict[str, list[str]] | None" = None,
    rep: int = REP,
    builds: "list[str] | None" = None,
) -> dict:
    from nosql_to_sql_migration_tool_spark.queries import PREWARMS, QUERIES
    from nosql_to_sql_migration_tool_spark.session import get_spark

    fams = fams if fams is not None else FAMS
    spark = get_spark("scale-probe")
    spark.range(1_000_000).selectExpr("sum(id)").write.format("noop").mode(
        "overwrite"
    ).save()
    names = [n for f in fams.values() for n in f]
    results: dict[str, dict[str, float]] = {}
    for sf_dir, key in ((SRC, "sf0.1"), (out, f"{rep}x")):
        res: dict[str, float] = {}
        t0 = time.time()
        for name, fn in PREWARMS.items():
            if builds is not None and name not in builds:
                continue
            s = time.perf_counter()
            fn(spark, sf_dir)
            res[name] = round(time.perf_counter() - s, 2)
        res["__build_total"] = round(time.time() - t0, 2)
        for name in names:
            best = None
            for _ in range(2):
                s = time.perf_counter()
                QUERIES[name](spark, sf_dir).write.format("noop").mode(
                    "overwrite"
                ).save()
                e = time.perf_counter() - s
                best = e if best is None else min(best, e)
            res[name] = round(best, 2)
        results[key] = res
        print(f"{key} done ({res['__build_total']}s builds)", flush=True)
    return results


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="/tmp/sfprobe1")
    ap.add_argument("--skip-gen", action="store_true")
    ap.add_argument("--rep", type=int, default=REP,
                    help="replication factor (default 10)")
    ap.add_argument(
        "--families",
        default=None,
        help="comma-separated family subset (default: all)",
    )
    ap.add_argument(
        "--queries",
        default=None,
        help="comma-separated explicit query list (overrides --families)",
    )
    ap.add_argument(
        "--builds",
        default=None,
        help=("comma-separated prewarm subset to run ('none' skips all; "
              "default: all — at large --rep restrict to the builds the "
              "chosen queries need, heavy truth builds take minutes)"),
    )
    args = ap.parse_args()
    if not args.skip_gen:
        generate(args.out, rep=args.rep)
        print(f"generated {args.rep}x data ->", args.out, flush=True)
    fams = FAMS
    if args.families:
        keep = {f.strip() for f in args.families.split(",")}
        fams = {k: v for k, v in FAMS.items() if k in keep}
    if args.queries:
        fams = {"custom": [q.strip() for q in args.queries.split(",")]}
    builds = None
    if args.builds is not None:
        builds = (
            [] if args.builds == "none"
            else [b.strip() for b in args.builds.split(",")]
        )
    results = run(args.out, fams, rep=args.rep, builds=builds)
    print(json.dumps(results, indent=1))
    a, b = results["sf0.1"], results[f"{args.rep}x"]
    print(f"\n{'query':35} {'sf0.1':>7} {f'{args.rep}x':>8} {'ratio':>6}")
    for fam, names in fams.items():
        print(f"-- {fam}")
        for n in names:
            if a.get(n):
                print(f"{n:35} {a[n]:7.2f} {b[n]:8.2f} {b[n]/a[n]:6.1f}")


if __name__ == "__main__":
    main()
