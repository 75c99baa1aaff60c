"""PCA / whitening over an embedding column — the linear-algebra
preprocessing an embedding pipeline runs before ANN (whitened vectors
make cosine buckets rounder, centering removes the corpus-mean bias
every IVF/LSH partitioner otherwise learns first).

Training follows the same pattern as the sampled k-means quantizer
(similarity.py): a BOUNDED distributed pass produces metadata-sized
sufficient statistics, the tiny eigen-solve happens on the driver, and
the per-row hot path (projection) is a pure JVM-side fold over literal
component vectors — the corpus is never iterated twice and no Python
touches the projection.

Sufficient statistics are one Arrow `mapInPandas` stage emitting ONE
partial row per partition — (count, sum vector, sum of outer products,
flattened) — then `d + d²` scalar sums; work is O(rows·d²) inside
vectorized numpy, shuffle is `partitions × d²` doubles (metadata). The
d×d eigendecomposition is driver-side numpy (`eigh`), sign-fixed so
components are reproducible up to float accumulation order (documented:
no cross-engine oracle for an eigensolve — this family is pytest-gated
with tolerances, like the streaming operators).

Reference: standard PCA; at 100 TB you train on an md5-ranked sample
(`train_limit`, same contract as the quantizer) and project everything.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import Column, DataFrame, functions as F

from nosql_to_sql_migration_tool_spark.operators.similarity import as_double


@dataclass(frozen=True)
class PCAModel:
    mean: list[float]            # d
    components: list[list[float]]  # k rows of d (orthonormal, sign-fixed)
    eigenvalues: list[float]     # k, descending, >= 0


def _md5_ranked_sample(
    df: DataFrame, vec_col: str, id_col: str, limit: int | None
) -> DataFrame:
    base = df.select(F.col(id_col), as_double(F.col(vec_col)).alias("__v"))
    if limit is None:
        return base
    return (
        base.withColumn("__m", F.md5(F.col(id_col).cast("string")))
        .orderBy("__m", id_col)
        .limit(limit)
        .drop("__m")
    )


def fit_pca(
    df: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    k: int = 8,
    train_limit: int | None = 4096,
) -> PCAModel:
    """Fit PCA on an md5-ranked bounded sample (``train_limit=None``
    trains on everything — only sane for small corpora)."""
    import numpy as np
    import pandas as pd

    sample = _md5_ranked_sample(df, vec_col, id_col, train_limit)

    # d must come from a NON-NULL vector: size(NULL) is NULL and would
    # surface later as a cryptic reshape TypeError (ADVICE r5).
    first = (
        sample.where(F.col("__v").isNotNull())
        .select(F.size("__v").alias("d"))
        .first()
    )
    if first is None:
        raise ValueError("fit_pca: no non-null vectors")
    d = first["d"]

    schema = "n long, s array<double>, ss array<double>"

    def partials(batches):
        for pdf in batches:
            vecs = np.asarray(
                [v for v in pdf["__v"] if v is not None], dtype=np.float64
            )
            if len(vecs) == 0:
                continue
            yield pd.DataFrame(
                {
                    "n": [len(vecs)],
                    "s": [vecs.sum(axis=0).tolist()],
                    "ss": [(vecs.T @ vecs).ravel().tolist()],
                }
            )

    rows = sample.select("__v").mapInPandas(partials, schema).collect()
    if not rows:
        raise ValueError("fit_pca: no non-null vectors")
    n = sum(r["n"] for r in rows)
    s = np.sum([np.asarray(r["s"]) for r in rows], axis=0)
    ss = np.sum([np.asarray(r["ss"]).reshape(d, d) for r in rows], axis=0)
    mean = s / n
    cov = ss / n - np.outer(mean, mean)
    vals, vecs = np.linalg.eigh(cov)           # ascending
    order = np.argsort(vals)[::-1][:k]
    comps = []
    eigs = []
    for idx in order:
        v = vecs[:, idx]
        # sign convention: first element with |.| > tiny is positive
        nz = np.flatnonzero(np.abs(v) > 1e-12)
        if len(nz) and v[nz[0]] < 0:
            v = -v
        comps.append(v.tolist())
        eigs.append(float(max(vals[idx], 0.0)))
    return PCAModel(mean=mean.tolist(), components=comps, eigenvalues=eigs)


def _dot_with_literal(vec: Column, lit_vec: list[float]) -> Column:
    arr = F.array(*[F.lit(float(c)) for c in lit_vec])
    return F.aggregate(
        F.zip_with(vec, arr, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def project_embeddings(
    df: DataFrame,
    model: PCAModel,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    whiten: bool = False,
    out_col: str = "pca",
) -> DataFrame:
    """Project every vector onto the model's components — the per-row
    hot path, a pure JVM fold over literal component arrays (the same
    literal-centroid codegen shape as the k-means assignment). With
    ``whiten=True`` each coordinate divides by sqrt(eigenvalue), giving
    ~unit variance per retained dimension."""
    centered = F.zip_with(
        as_double(F.col(vec_col)),
        F.array(*[F.lit(float(m)) for m in model.mean]),
        lambda x, m: x - m,
    )
    coords = []
    for comp, eig in zip(model.components, model.eigenvalues):
        c = _dot_with_literal(centered, comp)
        if whiten:
            c = c / F.lit(float(max(eig, 1e-12) ** 0.5))
        coords.append(c)
    return df.select(F.col(id_col), F.array(*coords).alias(out_col))
