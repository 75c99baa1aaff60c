"""Probabilistic record linkage (Fellegi–Sunter) — entity resolution
for STRUCTURED records, the dedup family's relational sibling
(round 12).

The reference's validation step answers "is THIS document THIS row?"
for known-key pairs (``private/Migration_Validation.ps1:266-363``,
mirrored by ``operators/validation.py:compare_records``). Record
linkage answers the harder production question — which rows of two
tables (or one table with itself) are the SAME ENTITY when keys are
absent or dirty: candidate pairs come from a BLOCKING join (equi-join
on a blocking key — linear in block sizes, never the |A|x|B| cross
product), each candidate is scored by summing per-field log-likelihood
ratios (agreement on a discriminating field adds ln(m/u), disagreement
adds ln((1-m)/(1-u)) — the Fellegi & Sunter 1969 decision model, the
same math Splink runs on Spark), and pairs above a threshold are
matches.

Determinism contract: the per-field (m, u) parameters are CALLER
inputs (review-able model config, like the trained charlm/NB tables),
and their ln weights are computed DRIVER-SIDE in Python and embedded
as integer-micro literals — no engine transcendental anywhere, so the
score is a pure integer fold both engines replay bit-identically.
Field comparison is exact equality after the house canonicalization
(trim + lower for strings); a NULL on either side contributes 0 (the
standard partial-knowledge treatment).

Scale shape: one equi-join shuffle on the blocking key; weights are
plan literals; the score is a single projection — at 100 TB the only
knob that matters is block-key cardinality, exactly like every LSH
bucket join in ``dedup.py``.
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame, functions as F

__all__ = [
    "field_weights_micro",
    "linkage_scores",
    "linkage_matches",
    "linkage_scores_sql",
    "multi_pass_linkage_scores",
    "multi_pass_linkage_scores_sql",
    "blocking_recall",
    "blocking_recall_sql",
    "er_matches",
    "er_matches_sql",
    "er_clusters",
    "er_clusters_sql",
    "er_golden_records",
    "er_golden_records_sql",
    "update_er_clusters",
    "write_er_label_store",
    "read_er_label_store",
    "update_er_label_store",
    "er_survivorship_report",
    "er_survivorship_report_sql",
]


def field_weights_micro(params: dict[str, tuple[float, float]]) -> dict:
    """``{field: (agree_micro, disagree_micro)}`` from ``{field: (m,
    u)}`` — m = P(agree | match), u = P(agree | non-match). Computed
    once, driver-side, with the house 6-dp ln pin; both engines then
    see only integer literals."""
    out = {}
    for field, (m, u) in params.items():
        if not (0.0 < u < 1.0 and 0.0 < m < 1.0):
            raise ValueError(f"{field}: m/u must be in (0, 1)")
        agree = round(round(math.log(m / u), 6) * 1_000_000)
        disagree = round(round(math.log((1.0 - m) / (1.0 - u)), 6) * 1_000_000)
        out[field] = (agree, disagree)
    return out


def _canon(col: Column) -> Column:
    """String fields compare trim+lower (the validation canon); other
    types compare as-is (cast through string for a single code path)."""
    return F.lower(F.trim(col.cast("string")))


def _canon_sql(expr: str) -> str:
    return f"lower(trim(CAST({expr} AS VARCHAR)))"


def _block_exprs(block_key) -> list[str]:
    """Normalize a blocking-key spec to a list of SQL expression
    strings: a plain column name, a derived expression
    (``"c_custkey % 997"``), or a compound key as a sequence of either.
    Compound keys are record linkage's one scale dial — the r12 probe
    measured ``("c_nationkey", "c_custkey % 997")`` ~linear and 30x
    faster at 10x than nation alone (SCALE.md), because block sizes
    stay constant as the corpus grows."""
    if isinstance(block_key, str):
        return [block_key]
    out = list(block_key)
    if not out or not all(isinstance(e, str) for e in out):
        raise ValueError(
            f"block key must be an expression string or a non-empty "
            f"sequence of them, got {block_key!r}"
        )
    return out


def linkage_scores(
    a: DataFrame,
    b: DataFrame,
    block_col,
    params: dict[str, tuple[float, float]],
    id_col: str,
) -> DataFrame:
    """``(id_a, id_b, n_agree, score_micro)`` for every blocked
    candidate pair (same blocking-key value, ``id_a`` from ``a``,
    ``id_b`` from ``b``). ``block_col`` is a column name, a derived
    SQL expression, or a compound key as a sequence of either (the
    scale-safe configuration — see ``_block_exprs``); ``params`` maps
    each compared field to its (m, u); the blocking key itself should
    not be a compared field (it agrees by construction and would add a
    constant)."""
    w = field_weights_micro(params)
    fields = list(params)
    exprs = _block_exprs(block_col)
    blk = [f"__blk{i}" for i in range(len(exprs))]
    left = a.select(
        *[F.expr(e).alias(n) for e, n in zip(exprs, blk)],
        F.col(id_col).alias("id_a"),
        *[_canon(F.col(f)).alias(f"__a_{f}") for f in fields],
    )
    right = b.select(
        *[F.expr(e).alias(n) for e, n in zip(exprs, blk)],
        F.col(id_col).alias("id_b"),
        *[_canon(F.col(f)).alias(f"__b_{f}") for f in fields],
    )
    pairs = left.join(right, blk)
    score = F.lit(0).cast("long")
    agree_n = F.lit(0).cast("long")
    for f in fields:
        av, bv = F.col(f"__a_{f}"), F.col(f"__b_{f}")
        known = av.isNotNull() & bv.isNotNull()
        agree = known & (av == bv)
        score = score + (
            F.when(agree, F.lit(w[f][0]))
            .when(known, F.lit(w[f][1]))
            .otherwise(F.lit(0))
            .cast("long")
        )
        agree_n = agree_n + agree.cast("long")
    return pairs.select(
        "id_a",
        "id_b",
        agree_n.alias("n_agree"),
        score.alias("score_micro"),
    )


def linkage_matches(
    a: DataFrame,
    b: DataFrame,
    block_col: str,
    params: dict[str, tuple[float, float]],
    id_col: str,
    threshold_micro: int,
) -> DataFrame:
    """Blocked pairs whose summed log-likelihood ratio clears the
    threshold — the match set. Same plan as ``linkage_scores`` plus one
    filter (the threshold is the reviewed decision boundary of the
    Fellegi-Sunter model)."""
    return linkage_scores(a, b, block_col, params, id_col).where(
        F.col("score_micro") >= int(threshold_micro)
    )


def linkage_scores_sql(
    a_sql: str,
    b_sql: str,
    block_col,
    params: dict[str, tuple[float, float]],
    id_col: str,
) -> str:
    """DuckDB twin of ``linkage_scores`` — identical integer weight
    literals, canon, NULL treatment; ``block_col`` accepts the same
    name / expression / compound-sequence spec (derived expressions are
    projected as ``__blk{i}`` inside each CTE, mirroring the Spark
    side, so qualification never leaks into the caller's SQL)."""
    w = field_weights_micro(params)
    fields = list(params)
    exprs = _block_exprs(block_col)
    blk_proj = ", ".join(
        f"({e}) AS __blk{i}" for i, e in enumerate(exprs)
    )
    on = " AND ".join(
        f"a.__blk{i} = b.__blk{i}" for i in range(len(exprs))
    )
    score_terms = []
    agree_terms = []
    for f in fields:
        av, bv = _canon_sql(f"a.{f}"), _canon_sql(f"b.{f}")
        known = f"({av} IS NOT NULL AND {bv} IS NOT NULL)"
        agree = f"({known} AND {av} = {bv})"
        score_terms.append(
            f"CASE WHEN {agree} THEN {w[f][0]} "
            f"WHEN {known} THEN {w[f][1]} ELSE 0 END"
        )
        agree_terms.append(f"CASE WHEN {agree} THEN 1 ELSE 0 END")
    return f"""
WITH a AS (SELECT *, {blk_proj} FROM ({a_sql})),
b AS (SELECT *, {blk_proj} FROM ({b_sql}))
SELECT a.{id_col} AS id_a, b.{id_col} AS id_b,
       CAST({' + '.join(agree_terms)} AS BIGINT) AS n_agree,
       CAST({' + '.join(score_terms)} AS BIGINT) AS score_micro
FROM a JOIN b ON {on}
"""


def multi_pass_linkage_scores(
    a: DataFrame,
    b: DataFrame,
    block_cols: list[str],
    params: dict[str, tuple[float, float]],
    id_col: str,
) -> DataFrame:
    """Multi-pass blocking — the standard ER answer to "one block key
    misses pairs whose key field is itself dirty": candidates are the
    UNION of each pass's equi-join (a pair found by several passes
    dedupes to one row — the score is a pure function of the pair, so
    distinct is exact). Splink's blocking_rules, expressed as passes;
    each pass is any ``linkage_scores`` block spec (column name,
    expression, or compound sequence). Cost is additive in the passes,
    each still a blocked equi-join — never a cross product."""
    out = None
    for col in block_cols:
        scored = linkage_scores(a, b, col, params, id_col)
        out = scored if out is None else out.unionByName(scored)
    return out.distinct()


def blocking_recall(
    a: DataFrame,
    b: DataFrame,
    block_cols: list[str],
    truth_pairs: DataFrame,
    id_col: str,
) -> DataFrame:
    """ONE row ``(n_truth, n_covered, recall)`` — the measured share of
    ground-truth matches the blocking passes retain as candidates (the
    dedup family's blocking_recall_audit discipline applied to ER: a
    threshold can only decide on pairs the blocking produced, so
    blocking recall bounds end-to-end recall). ``truth_pairs`` yields
    (id_a, id_b); each pass in ``block_cols`` is any ``linkage_scores``
    block spec (column name, expression, or compound sequence)."""
    cand = None
    for col in block_cols:
        exprs = _block_exprs(col)
        blk = [f"__blk{i}" for i in range(len(exprs))]
        left = a.select(
            *[F.expr(e).alias(n) for e, n in zip(exprs, blk)],
            F.col(id_col).alias("id_a"),
        )
        right = b.select(
            *[F.expr(e).alias(n) for e, n in zip(exprs, blk)],
            F.col(id_col).alias("id_b"),
        )
        pairs = left.join(right, blk).select("id_a", "id_b")
        cand = pairs if cand is None else cand.unionByName(pairs)
    cand = cand.distinct()
    truth = truth_pairs.select("id_a", "id_b").distinct()
    covered = truth.join(cand, ["id_a", "id_b"], "semi")
    return truth.agg(
        F.count(F.lit(1)).cast("long").alias("n_truth")
    ).crossJoin(
        F.broadcast(
            covered.agg(
                F.count(F.lit(1)).cast("long").alias("n_covered")
            )
        )
    ).select(
        "n_truth",
        "n_covered",
        F.when(
            F.col("n_truth") > 0,
            F.round(
                F.col("n_covered").cast("double")
                / F.col("n_truth").cast("double"),
                6,
            ),
        ).alias("recall"),
    )


def blocking_recall_sql(
    a_sql: str,
    b_sql: str,
    block_cols: list,
    truth_sql: str,
    id_col: str,
) -> str:
    """DuckDB twin of ``blocking_recall`` — each pass's candidate join
    re-derived with the same ``__blk{i}`` projections, unioned,
    de-duplicated, then intersected with the distinct truth pairs."""
    passes = []
    for col in block_cols:
        exprs = _block_exprs(col)
        proj = ", ".join(
            f"({e}) AS __blk{i}" for i, e in enumerate(exprs)
        )
        on = " AND ".join(
            f"a.__blk{i} = b.__blk{i}" for i in range(len(exprs))
        )
        passes.append(
            f"SELECT a.{id_col} AS id_a, b.{id_col} AS id_b\n"
            f"  FROM (SELECT *, {proj} FROM ({a_sql})) a\n"
            f"  JOIN (SELECT *, {proj} FROM ({b_sql})) b ON {on}"
        )
    union = "\nUNION ALL\n".join(passes)
    return f"""
WITH cand AS (SELECT DISTINCT id_a, id_b FROM ({union})),
truth AS (SELECT DISTINCT id_a, id_b FROM ({truth_sql})),
counts AS (
  SELECT CAST((SELECT count(*) FROM truth) AS BIGINT) AS n_truth,
         CAST((SELECT count(*) FROM truth t
               WHERE EXISTS (SELECT 1 FROM cand c
                             WHERE c.id_a = t.id_a AND c.id_b = t.id_b))
              AS BIGINT) AS n_covered
)
SELECT n_truth, n_covered,
       CASE WHEN n_truth > 0
            THEN round(CAST(n_covered AS DOUBLE) / CAST(n_truth AS DOUBLE), 6)
       END AS recall
FROM counts
"""


# ---------------------------------------------------------------------------
# Batch-maintained match store (round 14, r15 queue): entity resolution
# composed with the engine's incremental-ingest discipline. A migration
# that syncs in batches (the reference's Start-IncrementalSync loop,
# private/Sync.ps1:125-163) should not re-link the whole target per
# batch: the Fellegi-Sunter score is a pure function of the PAIR, so
# linking a new batch touches only (a x batch) blocked candidates and
# the match store grows by appending that batch's matches — the same
# O(batch) maintenance contract as the inverted index and the ingest
# band stores.
# ---------------------------------------------------------------------------


def update_linkage_matches(
    a: DataFrame,
    b_batch: DataFrame,
    path: str,
    block_col,
    params: dict[str, tuple[float, float]],
    id_col: str,
    threshold_micro: int,
    batch_id: int,
) -> None:
    """Append batch ``batch_id``'s thresholded matches against the
    reference table ``a`` to the parquet match store at ``path``,
    partitioned by batch_id. Cost is ONE blocked equi-join of a x
    b_batch — never a x b_full — so per-batch maintenance is O(batch)
    at any accumulated store size. Replay-idempotent: the batch's
    matches are a pure function of (a, b_batch, model), and the
    dynamic partition overwrite replaces exactly this batch_id's rows,
    so a crashed or duplicated run converges to the same store
    (the ingest-store discipline). Incremental ≡ full-recompute is
    pinned by pytest: the union of per-batch stores equals
    ``linkage_matches(a, union of batches)`` row-for-row."""
    scored = linkage_matches(
        a, b_batch, block_col, params, id_col, threshold_micro
    ).withColumn("batch_id", F.lit(int(batch_id)).cast("long"))
    (
        scored.write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy("batch_id")
        .parquet(path)
    )


def read_linkage_matches(spark, path: str) -> DataFrame:
    """Every accumulated match ``(id_a, id_b, n_agree, score_micro,
    batch_id)`` — the store a downstream merge/dedup step consumes."""
    return spark.read.parquet(path)


def multi_pass_linkage_scores_sql(
    a_sql: str,
    b_sql: str,
    block_cols: list,
    params: dict[str, tuple[float, float]],
    id_col: str,
) -> str:
    """DuckDB twin of ``multi_pass_linkage_scores`` — each pass's
    blocked scoring re-derived via ``linkage_scores_sql``, unioned,
    DISTINCT (the score is a pure function of the pair, so the dedupe
    is exact)."""
    passes = "\nUNION ALL\n".join(
        f"SELECT * FROM ({linkage_scores_sql(a_sql, b_sql, col, params, id_col)})"
        for col in block_cols
    )
    return f"SELECT DISTINCT id_a, id_b, n_agree, score_micro FROM ({passes})"


# ---------------------------------------------------------------------------
# Entity-resolution completion (round 15): match relation -> transitive
# CLUSTERS -> one GOLDEN RECORD per cluster. The reference's end state
# is one clean SQL row per real-world entity (classify:
# private/Sync.ps1:125-163; apply: private/Data_Migration.ps1 upsert);
# for keyless/dirty data that takes two steps past the thresholded
# match relation — the cluster closure and per-field survivorship.
# ---------------------------------------------------------------------------


def er_matches(
    entities: DataFrame,
    block_cols: list,
    params: dict[str, tuple[float, float]],
    id_col: str,
    threshold_micro: int,
) -> DataFrame:
    """Self-ER match relation over ONE messy table: multi-pass scores
    of the table against itself, kept in canonical orientation
    (``id_a < id_b`` — drops self-pairs and mirror duplicates) and
    thresholded. Blocking MUST use natural fields: duplicate rows share
    no surrogate key by definition, so a key-derived block
    (``c_custkey % 997``) can never pair a record with its duplicate.
    Cost: the same additive blocked equi-joins as
    ``multi_pass_linkage_scores`` — never |T|x|T| — with per-pass block
    size the one scale dial."""
    scored = multi_pass_linkage_scores(
        entities, entities, block_cols, params, id_col
    )
    return scored.filter(F.col("id_a") < F.col("id_b")).filter(
        F.col("score_micro") >= int(threshold_micro)
    )


def er_matches_sql(
    entities_sql: str,
    block_cols: list,
    params: dict[str, tuple[float, float]],
    id_col: str,
    threshold_micro: int,
) -> str:
    """DuckDB twin of ``er_matches`` — same union-of-passes scoring,
    orientation and threshold filter."""
    inner = multi_pass_linkage_scores_sql(
        entities_sql, entities_sql, block_cols, params, id_col
    )
    return (
        f"SELECT * FROM ({inner}) "
        f"WHERE id_a < id_b AND score_micro >= {int(threshold_micro)}"
    )


def er_clusters(
    entities: DataFrame, matches: DataFrame, id_col: str
) -> DataFrame:
    """``(id_col, entity_id)`` — the transitive closure of the match
    relation: records reachable through any match chain share one
    entity_id = min member id (which doubles as the canonical surrogate
    key downstream). Unmatched records are singleton entities labelled
    by their own id.

    Reuses the alternating large-star/small-star contraction
    (``dedup.near_dup_components_twostar``, Kiveris et al. SoCC'14):
    O(log² n) shuffle rounds over the EDGE set only — at 100 TB the
    edge set is bounded by the blocking passes, and contraction rounds
    never touch the entity table; the one full-table step is the final
    left join that labels singletons."""
    from nosql_to_sql_migration_tool_spark.operators.dedup import (
        near_dup_components_twostar,
    )

    labels = near_dup_components_twostar(
        entities, id_col=id_col, pairs=matches.select("id_a", "id_b")
    )
    return labels.select(
        F.col(id_col), F.col("component_id").alias("entity_id")
    )


def er_clusters_sql(
    entities_sql: str, matches_sql: str, id_col: str
) -> str:
    """DuckDB twin of ``er_clusters`` — the recursive-CTE reachability
    closure (the dedup components-oracle pattern), min label per
    source."""
    return f"""
WITH RECURSIVE ents AS ({entities_sql}),
m AS (SELECT DISTINCT id_a, id_b FROM ({matches_sql})),
edges AS (
  SELECT id_a AS a, id_b AS b FROM m
  UNION ALL
  SELECT id_b, id_a FROM m
),
reach(src, dst) AS (
  SELECT {id_col}, {id_col} FROM ents
  UNION
  SELECT r.src, e.b FROM reach r JOIN edges e ON r.dst = e.a
)
SELECT src AS {id_col}, min(dst) AS entity_id FROM reach GROUP BY src
"""


_GOLDEN_POLICIES = ("canonical", "latest", "min", "max", "mode")


def er_golden_records(
    entities: DataFrame,
    clusters: DataFrame,
    id_col: str,
    rules: dict[str, str],
) -> DataFrame:
    """One consolidated row per entity cluster — survivorship:
    ``(entity_id, n_members, <one column per rules field>)``. Policies:

      canonical — the value from the min-id member (the cluster label's
                  own record; in a clean-plus-rekeyed-dirty merge the
                  clean record wins when it holds the lower id)
      latest    — the value from the MAX-id member: last-writer-wins
                  when ids are ingest-monotonic (the ER form of the
                  reference's upsert semantics, Sync.ps1 apply /
                  relational.upsert_last_wins)
      min / max — field extremes across members
      mode      — most frequent non-NULL value, ties to the smallest
                  value (deterministic in both engines); NULL when the
                  field is NULL across the whole cluster

    Plan: ONE groupBy(entity_id) covers every scalar policy (min_by
    rides the same combinable shuffle), plus one entity-partitioned
    count + row_number window per mode field — no global window, no
    second pass over the entity table; after the first shuffle every
    frame is bounded by cluster count."""
    if not rules:
        raise ValueError("er_golden_records: rules must be non-empty")
    bad = {f: p for f, p in rules.items() if p not in _GOLDEN_POLICIES}
    if bad:
        raise ValueError(
            f"unknown survivorship policy {bad}; pick from "
            f"{_GOLDEN_POLICIES}"
        )
    joined = entities.join(clusters, id_col)
    aggs = [F.count(F.lit(1)).cast("long").alias("n_members")]
    for f, p in rules.items():
        if p == "canonical":
            aggs.append(F.min_by(F.col(f), F.col(id_col)).alias(f))
        elif p == "latest":
            aggs.append(F.max_by(F.col(f), F.col(id_col)).alias(f))
        elif p == "max":
            aggs.append(F.max(f).alias(f))
        elif p == "min":
            aggs.append(F.min(f).alias(f))
    out = joined.groupBy("entity_id").agg(*aggs)
    from pyspark.sql import Window

    for f, p in rules.items():
        if p != "mode":
            continue
        counts = (
            joined.filter(F.col(f).isNotNull())
            .groupBy("entity_id", f)
            .agg(F.count(F.lit(1)).alias("__n"))
        )
        w = Window.partitionBy("entity_id").orderBy(
            F.col("__n").desc(), F.col(f).asc()
        )
        top = (
            counts.withColumn("__rn", F.row_number().over(w))
            .filter(F.col("__rn") == 1)
            .select("entity_id", f)
        )
        out = out.join(top, "entity_id", "left")
    return out.select("entity_id", "n_members", *rules)


def er_golden_records_sql(
    entities_sql: str,
    matches_sql: str,
    id_col: str,
    rules: dict[str, str],
) -> str:
    """DuckDB twin of ``er_clusters`` + ``er_golden_records`` composed:
    the recursive closure, then identical survivorship aggregates
    (min_by / min / max in one GROUP BY; per-mode-field windows with
    the same count-DESC, value-ASC tie-break over non-NULL values)."""
    if not rules:
        raise ValueError("er_golden_records_sql: rules must be non-empty")
    bad = {f: p for f, p in rules.items() if p not in _GOLDEN_POLICIES}
    if bad:
        raise ValueError(
            f"unknown survivorship policy {bad}; pick from "
            f"{_GOLDEN_POLICIES}"
        )
    scalar = []
    for f, p in rules.items():
        if p == "canonical":
            scalar.append(f"min_by({f}, {id_col}) AS {f}")
        elif p == "latest":
            scalar.append(f"max_by({f}, {id_col}) AS {f}")
        elif p == "max":
            scalar.append(f"max({f}) AS {f}")
        elif p == "min":
            scalar.append(f"min({f}) AS {f}")
    scalar_sql = (", " + ", ".join(scalar)) if scalar else ""
    mode_ctes = []
    mode_joins = []
    for f, p in rules.items():
        if p != "mode":
            continue
        mode_ctes.append(
            f"""mode_{f} AS (
  SELECT entity_id, {f} FROM (
    SELECT entity_id, {f},
           row_number() OVER (PARTITION BY entity_id
                              ORDER BY __n DESC, {f} ASC) AS __rn
    FROM (SELECT entity_id, {f}, count(*) AS __n
          FROM j WHERE {f} IS NOT NULL GROUP BY entity_id, {f})
  ) WHERE __rn = 1
)"""
        )
        mode_joins.append(f"LEFT JOIN mode_{f} USING (entity_id)")
    sel = ", ".join(
        f"mode_{f}.{f}" if rules[f] == "mode" else f"base.{f}"
        for f in rules
    )
    mode_cte_sql = (",\n" + ",\n".join(mode_ctes)) if mode_ctes else ""
    return f"""
WITH RECURSIVE ents AS ({entities_sql}),
m AS (SELECT DISTINCT id_a, id_b FROM ({matches_sql})),
edges AS (
  SELECT id_a AS a, id_b AS b FROM m
  UNION ALL
  SELECT id_b, id_a FROM m
),
reach(src, dst) AS (
  SELECT {id_col}, {id_col} FROM ents
  UNION
  SELECT r.src, e.b FROM reach r JOIN edges e ON r.dst = e.a
),
clusters AS (
  SELECT src AS {id_col}, min(dst) AS entity_id FROM reach GROUP BY src
),
j AS (
  SELECT e.*, c.entity_id FROM ents e
  JOIN clusters c ON e.{id_col} = c.{id_col}
),
base AS (
  SELECT entity_id, CAST(count(*) AS BIGINT) AS n_members{scalar_sql}
  FROM j GROUP BY entity_id
){mode_cte_sql}
SELECT base.entity_id, base.n_members, {sel}
FROM base {' '.join(mode_joins)}
"""


def update_er_clusters(
    labels: DataFrame,
    new_matches: DataFrame,
    id_col: str,
    new_entities: DataFrame | None = None,
) -> DataFrame:
    """Incremental ER cluster maintenance: given the existing
    ``(id, entity_id)`` labels and the matches a new ingest batch
    produced (one ``update_linkage_matches`` fold), return updated
    labels for the whole entity set WITHOUT re-running contraction over
    it — ``dedup.update_components``' churn-bounded IVM applied to the
    ER family, so the full incremental pipeline is O(batch) match folds
    plus O(churn) cluster repair: only components a new match touches
    are re-labelled; a match bridging two old entities merges them to
    the smaller label exactly as a recompute would. ``new_entities``
    adds unmatched newcomers as singletons.

    Completeness contract: ``new_matches`` must cover BOTH directions a
    batch can introduce duplication — base x batch (the
    ``update_linkage_matches`` fold) AND batch-internal pairs
    (``er_matches`` over the batch alone; an ingest batch can carry its
    own duplicates). Both sides are O(batch)-bounded blocked joins.
    Incremental ≡ full recompute under that recipe is pinned by pytest
    on the messy fixture, including a batch-internal-duplicate case."""
    from nosql_to_sql_migration_tool_spark.operators.dedup import (
        update_components,
    )

    relabeled = labels.select(
        F.col(id_col), F.col("entity_id").alias("component_id")
    )
    out = update_components(
        relabeled,
        new_matches.select("id_a", "id_b"),
        id_col=id_col,
        new_docs=new_entities,
    )
    return out.select(
        F.col(id_col), F.col("component_id").alias("entity_id")
    )


_ER_BUCKET = "__bucket"


def _er_bucket(col: Column, n_buckets: int) -> Column:
    """Stable store bucket of a record id. Keyed on the ID, not the
    entity label: a merge can move a record's entity_id, and a
    label-keyed partition scheme would strand the stale row in its old
    partition when only new partitions are overwritten."""
    return F.pmod(F.xxhash64(col), F.lit(int(n_buckets))).cast("int")


def write_er_label_store(
    labels: DataFrame, path: str, id_col: str, n_buckets: int = 64
) -> None:
    """Initialize the persisted ``(id, entity_id)`` label store,
    partitioned by the stable id bucket so incremental folds can
    rewrite only touched partitions (``update_er_label_store``).
    Repartitioned BY THE BUCKET COLUMN before the write: each bucket
    directory gets one file instead of one per (task x bucket) — the
    r15 store probe measured the naive layout 18x slower to fold
    (every downstream scan pays the small-files tax)."""
    (
        labels.select(
            F.col(id_col),
            "entity_id",
            _er_bucket(F.col(id_col), n_buckets).alias(_ER_BUCKET),
        )
        .repartition(F.col(_ER_BUCKET))
        .write.mode("overwrite")
        .partitionBy(_ER_BUCKET)
        .parquet(path)
    )


def read_er_label_store(spark, path: str) -> DataFrame:
    """Current ``(id, entity_id)`` labels."""
    return spark.read.parquet(path).drop(_ER_BUCKET)


def update_er_label_store(
    spark,
    path: str,
    new_matches: DataFrame,
    id_col: str,
    new_entities: DataFrame | None = None,
    n_buckets: int = 64,
) -> None:
    """Fold one ingest batch's matches (base x batch ∪ batch-internal —
    the ``update_er_clusters`` completeness contract) into the
    persisted label store, REWRITING ONLY TOUCHED PARTITIONS: every
    label that can change belongs to a component some new match
    touches, those members' stable id buckets (plus the new entities')
    are the touched partitions, and the dynamic overwrite replaces
    exactly them — at any accumulated store size the rewrite is
    O(touched buckets), not O(corpus). Relabeling itself is
    ``update_er_clusters``' churn-bounded repair; untouched partitions
    are never opened for write (pytest pins their files byte-identical
    across a fold).

    The store and the match frame are each read/computed ONCE and
    pinned (``localCheckpoint``): the relabel consults both several
    times (touched-component semi-joins, the untouched anti-join, the
    repair itself), and re-running a blocked score join or re-listing
    a thousand-partition store per reference is exactly the rescan tax
    this layout must not pay. ``n_buckets`` must equal the store's
    write-time config; a mismatch is detected against the stored
    ``__bucket`` values and raises (a silent mismatch would strand
    stale rows in old partitions)."""
    labels = spark.read.parquet(path).localCheckpoint(eager=True)
    bad_bucket = labels.filter(
        _er_bucket(F.col(id_col), n_buckets) != F.col(_ER_BUCKET)
    ).limit(1)
    if bad_bucket.count() > 0:
        raise ValueError(
            f"update_er_label_store: n_buckets={n_buckets} does not "
            f"match the store's bucket layout at {path}; fold with the "
            f"same n_buckets the store was written with"
        )
    pairs = new_matches.select("id_a", "id_b").localCheckpoint(eager=True)
    touched_ids = (
        pairs.select(F.col("id_a").alias(id_col))
        .unionByName(pairs.select(F.col("id_b").alias(id_col)))
        .distinct()
    )
    if new_entities is not None:
        touched_ids = touched_ids.unionByName(
            new_entities.select(id_col)
        ).distinct()
    touched_comps = (
        labels.join(touched_ids, id_col, "semi")
        .select("entity_id")
        .distinct()
    )
    affected_buckets = (
        labels.join(touched_comps, "entity_id", "semi")
        .select(_ER_BUCKET)
        .unionByName(
            touched_ids.select(
                _er_bucket(F.col(id_col), n_buckets).alias(_ER_BUCKET)
            )
        )
        .distinct()
    )
    new_labels = update_er_clusters(
        labels.drop(_ER_BUCKET),
        pairs,
        id_col,
        new_entities=new_entities,
    )
    out = new_labels.withColumn(
        _ER_BUCKET, _er_bucket(F.col(id_col), n_buckets)
    ).join(F.broadcast(affected_buckets), _ER_BUCKET, "semi")
    (
        out.repartition(F.col(_ER_BUCKET))
        .write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy(_ER_BUCKET)
        .parquet(path)
    )


def er_survivorship_report(
    entities: DataFrame,
    clusters: DataFrame,
    id_col: str,
    rules: dict[str, str],
) -> DataFrame:
    """Consolidation explainability — one row per (entity, field):
    ``(entity_id, n_members, field, policy, n_values, n_dissenting)``
    where n_values counts the cluster's distinct non-NULL values for
    the field and n_dissenting counts members whose non-NULL value
    differs from the survivorship choice. This is the review surface a
    golden-record merge ships with (the validation-report ethos of
    ``Compare-DocumentToRecord``, reference
    ``private/Migration_Validation.ps1:266-363``, applied to ER): a
    field with n_dissenting > 0 is a conflict a reviewer may audit.
    Deliberately emits COUNTS, not the losing values — casting mixed
    field types to one display column is the known cross-engine
    rendering hazard; consumers join ``er_golden_records`` for values.

    Plan: the golden frame plus ONE further groupBy(entity_id) with
    per-field count_distinct + dissent sums, melted to long form by an
    explode projection — no window, no per-field shuffle."""
    golden = er_golden_records(entities, clusters, id_col, rules)
    chosen = golden.select(
        "entity_id", *[F.col(f).alias(f"__g_{f}") for f in rules]
    )
    j = entities.join(clusters, id_col).join(chosen, "entity_id")
    aggs = [F.count(F.lit(1)).cast("long").alias("n_members")]
    for f in rules:
        aggs.append(
            F.count_distinct(F.col(f)).cast("long").alias(f"__nv_{f}")
        )
        aggs.append(
            F.sum(
                (
                    F.col(f).isNotNull()
                    & (F.col(f) != F.col(f"__g_{f}"))
                ).cast("long")
            )
            .cast("long")
            .alias(f"__nd_{f}")
        )
    wide = j.groupBy("entity_id").agg(*aggs)
    pairs = F.array(
        *[
            F.struct(
                F.lit(f).alias("field"),
                F.lit(rules[f]).alias("policy"),
                F.col(f"__nv_{f}").alias("n_values"),
                F.col(f"__nd_{f}").alias("n_dissenting"),
            )
            for f in rules
        ]
    )
    return wide.select(
        "entity_id", "n_members", F.explode(pairs).alias("__p")
    ).select(
        "entity_id",
        "n_members",
        F.col("__p.field").alias("field"),
        F.col("__p.policy").alias("policy"),
        F.col("__p.n_values").alias("n_values"),
        F.col("__p.n_dissenting").alias("n_dissenting"),
    )


def er_survivorship_report_sql(
    entities_sql: str,
    matches_sql: str,
    id_col: str,
    rules: dict[str, str],
) -> str:
    """DuckDB twin of ``er_survivorship_report`` — the golden twin as a
    nested CTE (DuckDB permits WITH RECURSIVE in a CTE body), the same
    per-field distinct/dissent aggregates, long form via UNION ALL."""
    golden = er_golden_records_sql(entities_sql, matches_sql, id_col, rules)
    clusters = er_clusters_sql(entities_sql, matches_sql, id_col)
    arms = []
    for f, p in rules.items():
        arms.append(
            f"""SELECT j.entity_id, g.n_members,
       '{f}' AS field, '{p}' AS policy,
       CAST(count(DISTINCT j.{f}) AS BIGINT) AS n_values,
       CAST(sum(CASE WHEN j.{f} IS NOT NULL AND j.{f} <> g.{f}
                     THEN 1 ELSE 0 END) AS BIGINT) AS n_dissenting
FROM j JOIN g ON j.entity_id = g.entity_id
GROUP BY j.entity_id, g.n_members"""
        )
    union = "\nUNION ALL\n".join(arms)
    return f"""
WITH g AS ({golden}),
c AS ({clusters}),
e AS ({entities_sql}),
j AS (SELECT e.*, c.entity_id FROM e JOIN c ON e.{id_col} = c.{id_col})
{union}
"""
