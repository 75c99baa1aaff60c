"""Property-based pins for the round-12 primitives, DuckDB-evaluated
(the test_hash_properties convention: hypothesis drives hundreds of
cases through the SQL twins without a Spark job per example; Spark ≡
DuckDB parity for the same operators is pinned by their own suites)."""

from __future__ import annotations

import math

import duckdb
from hypothesis import given, settings, strategies as st

from nosql_to_sql_migration_tool_spark.operators.bloom import (
    _might_contain_sql,
    bloom_build_sql,
)
from nosql_to_sql_migration_tool_spark.operators.linkage import (
    field_weights_micro,
)
from nosql_to_sql_migration_tool_spark.operators.text import (
    token_entropy_sql,
)

key_text = st.text(
    alphabet=st.sampled_from("ab0'\"\\ \x1f"), min_size=0, max_size=8
)


def _values_sql(rows: list[tuple], cols: str) -> str:
    vals = ", ".join(
        "(" + ", ".join(
            "NULL" if v is None
            else (str(v) if isinstance(v, int) else "'%s'" % v.replace("'", "''"))
            for v in r
        ) + ")"
        for r in rows
    )
    return f"SELECT * FROM (VALUES {vals}) AS t({cols})"


@settings(max_examples=40, deadline=None)
@given(st.lists(key_text, min_size=1, max_size=12, unique=True))
def test_bloom_never_false_negative_and_order_free(keys):
    """∀ key sets (adversarial strings): every member probes True, and
    the bitmap is identical for the reversed insertion order (bit_or is
    an order-free fold — the partitioning-independence contract)."""
    m, k = 128, 3
    con = duckdb.connect()
    fwd = con.execute(
        bloom_build_sql(_values_sql([(x,) for x in keys], "key"), "key", m, k)
    ).fetchone()
    rev = con.execute(
        bloom_build_sql(
            _values_sql([(x,) for x in reversed(keys)], "key"), "key", m, k
        )
    ).fetchone()
    assert fwd[0] == rev[0] and fwd[1] == len(keys)
    probe = con.execute(
        f"SELECT key, {_might_contain_sql('key', 'b.bits', m, k)} "
        f"FROM ({_values_sql([(x,) for x in keys], 'key')}) p, "
        f"({bloom_build_sql(_values_sql([(x,) for x in keys], 'key'), 'key', m, k)}) b"
    ).fetchall()
    con.close()
    assert all(hit for _, hit in probe), probe


token = st.text(alphabet=st.sampled_from("abc"), min_size=1, max_size=2)


@settings(max_examples=40, deadline=None)
@given(st.lists(token, min_size=1, max_size=20))
def test_token_entropy_bounds_and_permutation_invariance(toks):
    """∀ token multisets: 0 <= entropy_micro <= ln_micro(n) (within one
    micro of rounding), 0 exactly for a single-type doc, and any
    permutation of the tokens scores identically (the multiset is the
    whole input)."""
    con = duckdb.connect()

    def entropy(ts):
        doc = " ".join(ts)
        row = con.execute(
            token_entropy_sql(
                _values_sql([(1, doc)], "doc_id, text")
            )
        ).fetchone()
        return row

    _, n, n_types, h = entropy(toks)
    assert n == len(toks)
    ln_micro_n = round(round(math.log(n), 6) * 1e6) if n else 0
    assert -1 <= h <= ln_micro_n + 1
    if n_types == 1:
        assert h == 0
    _, _, _, h_rev = entropy(list(reversed(toks)))
    con.close()
    assert h_rev == h


@settings(max_examples=60, deadline=None)
@given(
    st.integers(min_value=0, max_value=10**9),
    st.integers(min_value=1, max_value=10**6),
    st.integers(min_value=1, max_value=10**6),
)
def test_weighted_sample_key_monotone_in_weight(doc_id, w1, w2):
    """A-RES keys: for a FIXED id (fixed uniform u < 1, so ln(u) <= 0),
    a larger weight never worsens the key — raising a row's weight can
    only improve its selection odds, all else equal."""
    lo, hi = sorted((w1, w2))
    con = duckdb.connect()
    u = (
        f"(CAST(concat('0x', substr(md5(CAST({doc_id} AS VARCHAR)), 1, 13))"
        f" AS BIGINT) + 1) / {float(1 << 52)}"
    )
    k_lo, k_hi = con.execute(
        f"SELECT CAST(round(round(ln({u}), 6) / {lo}.0 * 1000000.0, 0) AS BIGINT),"
        f"       CAST(round(round(ln({u}), 6) / {hi}.0 * 1000000.0, 0) AS BIGINT)"
    ).fetchone()
    con.close()
    assert k_hi >= k_lo


@settings(max_examples=100, deadline=None)
@given(
    st.floats(min_value=0.01, max_value=0.99),
    st.floats(min_value=0.01, max_value=0.99),
)
def test_linkage_weight_signs_follow_discrimination(m, u):
    """Fellegi-Sunter weight signs: when agreement is likelier under a
    match (m > u), agreeing adds evidence and disagreeing subtracts;
    when m < u the field is anti-discriminating and the signs flip —
    for every (m, u) the agree weight strictly exceeds the disagree
    weight whenever m > u (within the 6-dp ln pin's one-micro slack)."""
    w_agree, w_disagree = field_weights_micro({"f": (m, u)})["f"]
    if m > u + 1e-9:
        assert w_agree > 0 >= -abs(w_agree)
        assert w_disagree < w_agree
    if m < u - 1e-9:
        assert w_agree < 0 < w_disagree or w_agree <= w_disagree
