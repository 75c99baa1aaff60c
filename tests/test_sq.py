"""Scalar quantization (SQ8) ANN: exact affine params, in-range codes,
midpoint dequantization, and the two-phase retrieve whose approximate
cut + exact rerank replays bit-identically in DuckDB."""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import functions as F

from nosql_to_sql_migration_tool_spark.operators.sq import (
    SQ_LEVELS,
    sq_encode,
    sq_param_arrays,
    sq_params,
    sq_topk,
    sq_topk_sql,
)
from tests.conftest import SF_DIR_SMOKE

EMB = f"{SF_DIR_SMOKE}/embeddings.parquet"


def _emb(spark):
    return spark.read.parquet(EMB).select("vec_id", "embedding")


def test_sq_params_and_codes_hand_case(spark):
    """Hand corpus: params are exact per-dim min/max; codes hit 0 at the
    minimum and SQ_LEVELS at the maximum; a constant dimension codes 0
    everywhere (span-0 guard, no NaN/inf)."""
    df = spark.createDataFrame(
        [
            (1, [0.0, 5.0, -2.0]),
            (2, [10.0, 5.0, 2.0]),
            (3, [5.0, 5.0, 0.0]),
        ],
        ["vec_id", "embedding"],
    )
    params = {
        r["dim"]: (r["vmin"], r["vmax"])
        for r in sq_params(df).collect()
    }
    assert params == {1: (0.0, 10.0), 2: (5.0, 5.0), 3: (-2.0, 2.0)}
    row = sq_param_arrays(sq_params(df))
    codes = {
        r["vec_id"]: r["codes"] for r in sq_encode(df, row).collect()
    }
    assert codes[1] == [0, 0, 0]
    assert codes[2] == [SQ_LEVELS, 0, SQ_LEVELS]
    # midpoints: 5.0 in [0,10] -> floor(5*255/10)=127; 0.0 in [-2,2]
    # -> floor(2*255/4)=127
    assert codes[3] == [127, 0, 127]
    for c in codes.values():
        assert all(0 <= x <= SQ_LEVELS for x in c)


def test_sq_topk_matches_duckdb(spark):
    """Full two-phase parity on the real embeddings table: identical
    (id, approx_cos, cos_sim) rows including the candidate cut and the
    final top-k, Spark vs the unrolled DuckDB replay."""
    emb = _emb(spark)
    query = emb.filter(F.col("vec_id") == 7).select("embedding")
    got = [
        (r["vec_id"], r["approx_cos"], r["cos_sim"])
        for r in sq_topk(emb, query, k=10, refine=4).collect()
    ]
    con = duckdb.connect()
    sql = sq_topk_sql(
        f"SELECT vec_id, embedding FROM read_parquet('{EMB}')",
        f"SELECT embedding FROM read_parquet('{EMB}') WHERE vec_id = 7",
        k=10,
        refine=4,
    )
    want = [tuple(r) for r in con.execute(sql).fetchall()]
    con.close()
    assert got == want
    assert len(got) == 10
    # the query vector itself must lead with exact cosine 1.0
    assert got[0][0] == 7 and got[0][2] == pytest.approx(1.0)


def test_sq_recall_vs_exact_and_determinism(spark):
    """SQ8 with refine=4 recovers (nearly) the exact brute-force top-10
    — 8-bit per-dimension error is tiny at 64 dims — and repeated runs
    are identical (floor/min/max only, nothing sampled)."""
    from nosql_to_sql_migration_tool_spark.operators.similarity import (
        cosine_topk,
    )

    emb = _emb(spark)
    query = emb.filter(F.col("vec_id") == 42).select("embedding")
    exact = [r["vec_id"] for r in cosine_topk(emb, query, k=10).collect()]
    approx1 = [
        r["vec_id"] for r in sq_topk(emb, query, k=10, refine=4).collect()
    ]
    approx2 = [
        r["vec_id"] for r in sq_topk(emb, query, k=10, refine=4).collect()
    ]
    assert approx1 == approx2
    assert len(set(exact) & set(approx1)) >= 8
    # per-hit quantization error is observable and small
    rows = sq_topk(emb, query, k=10, refine=4).collect()
    for r in rows:
        assert abs(r["approx_cos"] - r["cos_sim"]) < 0.05


def test_sq_persisted_artifacts_shape(spark):
    """The production shape: params + codes persist once and are passed
    back in; results identical to the inline derivation (so the
    maintained-artifact path can never drift from the spec), and every
    stored code is an int in [0, SQ_LEVELS]."""
    emb = _emb(spark)
    row = sq_param_arrays(sq_params(emb)).localCheckpoint(eager=True)
    codes = sq_encode(emb, row).localCheckpoint(eager=True)
    query = emb.filter(F.col("vec_id") == 3).select("embedding")
    via_artifacts = sq_topk(
        emb, query, k=5, codes=codes, param_row=row
    ).collect()
    inline = sq_topk(emb, query, k=5).collect()
    assert via_artifacts == inline
    # code column is ints in [0, SQ_LEVELS]
    sample = codes.limit(20).collect()
    assert all(
        0 <= c <= SQ_LEVELS for r in sample for c in r["codes"]
    )


def test_r11_candidate_plan_invariants(spark):
    """The mechanical scale-shape pins the registered surface gets from
    test_plan_shapes, applied to the round-11 r12-registration
    candidates: no Python stages, no unbroadcast cartesian products, no
    global ordered windows, and scans pruned to the columns the
    operator actually uses."""
    from pyspark.sql import functions as F

    from nosql_to_sql_migration_tool_spark.operators.text import (
        token_fertility_by,
    )
    from nosql_to_sql_migration_tool_spark.operators.traindata import (
        dsir_weights,
        weighted_sample,
    )
    from nosql_to_sql_migration_tool_spark.plans.audit import (
        cartesian_products,
        global_windows,
        python_stage_count,
        read_schemas,
    )
    from nosql_to_sql_migration_tool_spark.sources.registry import load_table

    emb = _emb(spark)
    query = emb.filter(F.col("vec_id") == 7).select("embedding")
    docs = load_table(spark, SF_DIR_SMOKE, "documents")
    raw = docs.select("doc_id", "text")
    target = docs.filter(F.col("lang") == "en").select("doc_id", "text")
    frames = {
        "sq_topk": sq_topk(emb, query, k=10),
        "dsir_weights": dsir_weights(raw, target),
        "weighted_sample": weighted_sample(
            docs.select("doc_id", (F.col("doc_id") % 7).alias("w")), "w", 50
        ),
        "token_fertility_by": token_fertility_by(
            docs.select("lang", "text"), "lang"
        ),
    }
    for name, df in frames.items():
        assert python_stage_count(df) == 0, name
        assert cartesian_products(df) == 0, name
        assert global_windows(df) == 0, name
        for schema in read_schemas(df):
            # neither operator family ever needs these payload columns
            assert "n_chars" not in schema and "source" not in schema, (
                name,
                schema,
            )


def test_sq_recall_audit_value_and_parity(spark):
    """Round 12: the recall-audit discipline applied to SQ8 — the
    measured exact-top-k coverage matches a hand intersection of the
    two rankings, replays bit-identically in DuckDB, and accepts the
    persisted artifacts."""
    import duckdb

    from nosql_to_sql_migration_tool_spark.operators.similarity import (
        cosine_topk,
    )
    from nosql_to_sql_migration_tool_spark.operators.sq import (
        sq_recall_audit,
        sq_recall_audit_sql,
    )
    from tests.conftest import SF_DIR_SMOKE

    emb = _emb(spark)
    query = emb.filter(F.col("vec_id") == 0).select("embedding")
    got = sq_recall_audit(emb, query, k=10).collect()[0]
    approx_ids = {
        r["vec_id"] for r in sq_topk(emb, query, k=10).collect()
    }
    exact_ids = {
        r["vec_id"] for r in cosine_topk(emb, query, k=10).collect()
    }
    assert got["n_hits"] == len(exact_ids & approx_ids)
    assert got["recall"] == round(got["n_hits"] / 10.0, 6)
    assert got["n_hits"] >= 8  # the pinned SQ8 quality bar

    con = duckdb.connect()
    src = f"SELECT vec_id, embedding FROM '{SF_DIR_SMOKE}/embeddings.parquet'"
    want = con.execute(
        sq_recall_audit_sql(src, src + " WHERE vec_id = 0", k=10)
    ).fetchone()
    con.close()
    assert tuple(got) == want

    row = sq_param_arrays(sq_params(emb)).localCheckpoint(eager=True)
    codes = sq_encode(emb, row).localCheckpoint(eager=True)
    via = sq_recall_audit(
        emb, query, k=10, codes=codes, param_row=row
    ).collect()[0]
    assert tuple(via) == tuple(got)


def test_sq_recall_audit_respects_column_names(spark):
    """ADVICE r12: the exact side of the audit must honor vec_col/id_col
    — renamed columns produce the identical audit row."""
    from nosql_to_sql_migration_tool_spark.operators.sq import (
        sq_recall_audit,
    )

    emb = _emb(spark)
    q = emb.filter(F.col("vec_id") == 7).select("embedding")
    want = sq_recall_audit(emb, q, k=10).collect()

    renamed = emb.select(
        F.col("vec_id").alias("item_id"),
        F.col("embedding").alias("vec"),
    )
    q2 = renamed.filter(F.col("item_id") == 7).select("vec")
    got = sq_recall_audit(
        renamed, q2, k=10, vec_col="vec", id_col="item_id"
    ).collect()
    assert [tuple(r) for r in got] == [tuple(r) for r in want]
    assert got[0]["n_hits"] >= 1  # the query vector itself always hits
