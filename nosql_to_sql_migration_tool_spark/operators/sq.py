"""Scalar quantization (SQ8) ANN — the second memory-compression scale
path of embedding retrieval, complementing product quantization
(``operators/pq.py``): each vector dimension is affinely mapped onto
0..255 using per-dimension corpus min/max, so a 64-dim float32 vector
(256 bytes) stores as 64 small ints (1 byte each after parquet
dictionary/bit-pack encoding — ~4x smaller, and unlike PQ the code
stream preserves per-dimension structure, so reconstruction error is
bounded by span/256 per dimension instead of a codebook's cell radius).

Retrieval is two-phase, the knn/PQ house shape: approximate scores come
from the DEQUANTIZED codes alone (the scan reads only the code column —
column pruning keeps raw embeddings out of the plan), a top
``k * refine`` candidate cut is taken with the deterministic
(score desc, id asc) ordering, and only the candidates' raw vectors are
fetched for the exact cosine rerank — a semi-join point-fetch, never a
second corpus scan.

Determinism contract (cross-engine, DuckDB-replayable):
- params = exact per-dimension ``min``/``max`` (order-free combinable
  aggregates; float32 inputs widen to double exactly);
- code  = ``floor((x - vmin) * 255 / (vmax - vmin))`` clamped to
  [0, 255], constant dimensions (span 0) code as 0 — floor of
  identical IEEE doubles is identical in both engines, so no rounding
  pin is needed;
- dequant = bucket midpoint ``vmin + (code + 0.5) * span / 255``;
- approximate and exact cosines round 6 dp (the house pin), ties break
  on id ascending.

Training is one corpus pass; encoding is per-row ``zip_with`` over the
broadcast (vmin, vmax) arrays — no shuffle at all, which is what makes
re-encoding after a corpus append an O(batch) maintenance step.

Reference analogue: none (the migration tool has no vector surface);
extends SURVEY §2C similarity alongside IVF/LSH/PQ.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

from nosql_to_sql_migration_tool_spark.operators.similarity import (
    as_double,
    cosine_pre,
    cosine_sql,
    dot,
)

SQ_LEVELS = 255  # codes span 0..255 -> 255 buckets of width span/255


def sq_params(df: DataFrame, vec_col: str = "embedding") -> DataFrame:
    """Per-dimension quantization range: ``(dim, vmin, vmax)`` — 1-based
    dim index, one combinable min/max pass over the corpus. At 100 TB
    this is a single map-side-combining aggregate whose shuffle carries
    dims x partitions rows."""
    dims = df.select(
        F.posexplode(as_double(F.col(vec_col))).alias("__d", "__v")
    )
    return (
        dims.groupBy((F.col("__d") + 1).alias("dim"))
        .agg(F.min("__v").alias("vmin"), F.max("__v").alias("vmax"))
    )


def sq_param_arrays(params: DataFrame) -> DataFrame:
    """Fold the params relation to ONE broadcastable row of dim-ordered
    arrays ``(vmin: array<double>, vmax: array<double>)``."""
    return (
        params.groupBy()
        .agg(
            F.array_sort(
                F.collect_list(F.struct("dim", F.col("vmin").alias("v")))
            ).alias("__a"),
            F.array_sort(
                F.collect_list(F.struct("dim", F.col("vmax").alias("v")))
            ).alias("__b"),
        )
        .select(
            F.transform("__a", lambda s: s["v"]).alias("vmin"),
            F.transform("__b", lambda s: s["v"]).alias("vmax"),
        )
    )


def _codes(vec: Column, vmin: Column, vmax: Column) -> Column:
    span = F.zip_with(vmax, vmin, lambda a, b: a - b)
    shifted = F.zip_with(vec, vmin, lambda x, m: x - m)
    return F.zip_with(
        shifted,
        span,
        lambda x, s: F.when(s <= 0, F.lit(0)).otherwise(
            F.greatest(
                F.lit(0),
                F.least(
                    F.lit(SQ_LEVELS),
                    F.floor(x * F.lit(float(SQ_LEVELS)) / s),
                ),
            )
        ).cast("int"),
    )


def _dequant(codes: Column, vmin: Column, vmax: Column) -> Column:
    span = F.zip_with(vmax, vmin, lambda a, b: a - b)
    mid = F.zip_with(
        codes.cast("array<double>"),
        span,
        lambda c, s: (c + F.lit(0.5)) * s / F.lit(float(SQ_LEVELS)),
    )
    return F.zip_with(mid, vmin, lambda m, lo: m + lo)


def sq_encode(
    df: DataFrame,
    param_row: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """``(id, codes: array<int>)`` — pure per-row projection against the
    broadcast param row; no shuffle, so appends re-encode in O(batch)."""
    return df.crossJoin(F.broadcast(param_row)).select(
        F.col(id_col),
        _codes(
            as_double(F.col(vec_col)), F.col("vmin"), F.col("vmax")
        ).alias("codes"),
    )


def sq_topk(
    df: DataFrame,
    query: DataFrame,
    k: int = 10,
    refine: int = 4,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    codes: DataFrame | None = None,
    param_row: DataFrame | None = None,
) -> DataFrame:
    """Two-phase SQ retrieval: approximate cosine over the dequantized
    code column cuts a ``k * refine`` candidate set (TakeOrdered — a
    per-partition heap + candidate-sized merge, never a full sort),
    then ONLY the candidates' raw vectors are point-fetched for the
    exact rerank. Returns ``(id, approx_cos, cos_sim)`` — keeping the
    approximate score in the output makes the quantization error
    directly observable (and auditable) per hit.

    Pass persisted ``codes``/``param_row`` (the production shape: both
    are one-time build artifacts maintained per append); when omitted
    they derive inline from ``df``."""
    if param_row is None:
        param_row = sq_param_arrays(sq_params(df, vec_col))
    if codes is None:
        codes = sq_encode(df, param_row, vec_col, id_col)
    # r16 (guide §1.2): the query self-norm folds once at broadcast
    # build instead of once per corpus row in BOTH phases (the
    # similarity.cosine_pre hoist), and the dequantized vector is
    # projected ONCE per row instead of re-expanding inside each of the
    # old three-fold cosine's dot arguments; the dequantized/raw row
    # norms still fold per row (each row is distinct). Bit-identical.
    q = F.broadcast(
        query.select(as_double(F.col(vec_col)).alias("__q")).withColumn(
            "__qn", F.sqrt(dot(F.col("__q"), F.col("__q")))
        )
    )
    approx = (
        codes.crossJoin(F.broadcast(param_row))
        .select(
            F.col(id_col),
            _dequant(F.col("codes"), F.col("vmin"), F.col("vmax")).alias(
                "__dq"
            ),
        )
        .withColumn("__dn", F.sqrt(dot(F.col("__dq"), F.col("__dq"))))
        .crossJoin(q)
        .select(
            F.col(id_col),
            cosine_pre(
                dot(F.col("__dq"), F.col("__q")), F.col("__dn"), F.col("__qn")
            ).alias("approx_cos"),
        )
    )
    cand = approx.orderBy(
        F.col("approx_cos").desc(), F.col(id_col)
    ).limit(k * refine)
    rerank = (
        df.select(id_col, vec_col)
        .join(cand, id_col)
        .select(
            F.col(id_col),
            F.col("approx_cos"),
            as_double(F.col(vec_col)).alias("__v"),
        )
        .withColumn("__n", F.sqrt(dot(F.col("__v"), F.col("__v"))))
        .crossJoin(q)
        .select(
            F.col(id_col),
            F.col("approx_cos"),
            cosine_pre(
                dot(F.col("__v"), F.col("__q")), F.col("__n"), F.col("__qn")
            ).alias("cos_sim"),
        )
    )
    return rerank.orderBy(F.col("cos_sim").desc(), F.col(id_col)).limit(k)


# ---------------------------------------------------------------------------
# DuckDB twins
# ---------------------------------------------------------------------------


def sq_codes_sql(vec: str, vmin: str, vmax: str) -> str:
    """Element-wise code list: floor-affine onto 0..SQ_LEVELS, clamped;
    constant dims code 0."""
    return (
        f"list_transform(generate_series(1, len({vec})), i -> CAST("
        f"CASE WHEN {vmax}[i] - {vmin}[i] <= 0 THEN 0 ELSE greatest(0, "
        f"least({SQ_LEVELS}, CAST(floor((CAST({vec}[i] AS DOUBLE) - "
        f"{vmin}[i]) * {float(SQ_LEVELS)} / ({vmax}[i] - {vmin}[i])) "
        f"AS BIGINT))) END AS INT))"
    )


def sq_dequant_sql(codes: str, vmin: str, vmax: str) -> str:
    return (
        f"list_transform(generate_series(1, len({codes})), i -> "
        f"{vmin}[i] + (CAST({codes}[i] AS DOUBLE) + 0.5) * "
        f"({vmax}[i] - {vmin}[i]) / {float(SQ_LEVELS)})"
    )


def sq_topk_sql(
    emb_sql: str,
    query_sql: str,
    k: int = 10,
    refine: int = 4,
) -> str:
    """DuckDB replay of ``sq_topk``: same params, codes, midpoint
    dequantization, 6-dp approximate cut and exact rerank. ``emb_sql``
    yields (vec_id, embedding); ``query_sql`` yields one row
    (embedding)."""
    return f"""
WITH emb AS ({emb_sql}),
q AS (SELECT list_transform(embedding, x -> CAST(x AS DOUBLE)) AS qv
      FROM ({query_sql})),
params AS (
  SELECT list(vmin ORDER BY dim) AS vmin, list(vmax ORDER BY dim) AS vmax
  FROM (
    SELECT d AS dim, min(v) AS vmin, max(v) AS vmax
    FROM (
      SELECT generate_subscripts(embedding, 1) AS d,
             CAST(unnest(embedding) AS DOUBLE) AS v
      FROM emb
    )
    GROUP BY d
  )
),
codes AS (
  SELECT vec_id, {sq_codes_sql('embedding', 'p.vmin', 'p.vmax')} AS c
  FROM emb, params p
),
approx AS (
  SELECT vec_id,
         {cosine_sql(sq_dequant_sql('c', 'p.vmin', 'p.vmax'), 'q.qv')}
           AS approx_cos
  FROM codes, params p, q
),
cand AS (
  SELECT vec_id, approx_cos FROM approx
  ORDER BY approx_cos DESC, vec_id
  LIMIT {k * refine}
)
SELECT e.vec_id, cand.approx_cos,
       {cosine_sql("list_transform(e.embedding, x -> CAST(x AS DOUBLE))",
                   'q.qv')} AS cos_sim
FROM emb e JOIN cand ON e.vec_id = cand.vec_id, q
ORDER BY cos_sim DESC, e.vec_id
LIMIT {k}
"""


def sq_recall_audit(
    df: DataFrame,
    query: DataFrame,
    k: int = 10,
    refine: int = 4,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    codes: DataFrame | None = None,
    param_row: DataFrame | None = None,
) -> DataFrame:
    """ONE row ``(k, n_hits, recall)`` — the measured share of the
    EXACT cosine top-k that SQ8's two-phase retrieval returns (the
    MinHash/hyperplane/blocking recall-audit discipline applied to the
    scalar quantizer: approximation error is a number you watch, not
    an assumption). Exact truth is the brute-force top-k over the raw
    vectors (deterministic ties: cosine desc, id asc); both sides are
    k-row relations, so the audit join is metadata-sized."""
    from nosql_to_sql_migration_tool_spark.operators.similarity import (
        cosine_topk,
    )

    approx = sq_topk(
        df, query, k, refine, vec_col, id_col, codes, param_row
    ).select(F.col(id_col).alias("__a"))
    # ADVICE r12: the exact side must honor the same column names as the
    # approximate side, or non-default vec/id columns break the audit.
    exact = cosine_topk(
        df, query, k=k, vec_col=vec_col, id_col=id_col
    ).select(F.col(id_col).alias("__e"))
    hits = exact.join(
        approx, F.col("__e") == F.col("__a"), "semi"
    ).agg(F.count(F.lit(1)).cast("long").alias("n_hits"))
    return hits.select(
        F.lit(k).cast("long").alias("k"),
        "n_hits",
        F.round(
            F.col("n_hits").cast("double") / F.lit(float(k)), 6
        ).alias("recall"),
    )


def sq_recall_audit_sql(
    emb_sql: str,
    query_sql: str,
    k: int = 10,
    refine: int = 4,
) -> str:
    """DuckDB twin of ``sq_recall_audit``: the full SQ replay
    (``sq_topk_sql``) intersected with the exact brute-force top-k."""
    return f"""
WITH approx AS ({sq_topk_sql(emb_sql, query_sql, k, refine)}),
q AS (SELECT list_transform(embedding, x -> CAST(x AS DOUBLE)) AS qv
      FROM ({query_sql})),
exact AS (
  SELECT vec_id FROM ({emb_sql}) e, q
  ORDER BY {cosine_sql(
      "list_transform(e.embedding, x -> CAST(x AS DOUBLE))", "q.qv"
  )} DESC, vec_id
  LIMIT {k}
),
hits AS (
  SELECT CAST(count(*) AS BIGINT) AS n_hits
  FROM exact WHERE vec_id IN (SELECT vec_id FROM approx)
)
SELECT CAST({k} AS BIGINT) AS k, n_hits,
       round(CAST(n_hits AS DOUBLE) / {float(k)}, 6) AS recall
FROM hits
"""
