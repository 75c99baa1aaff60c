"""Skew-mitigated joins — explicit key salting (brief: "salting for
skew"), complementing the AQE skew-join handling that session.py enables.

AQE splits oversized *sort-merge* partitions at runtime; explicit
salting is the static alternative when the hot keys are known or AQE is
unavailable (e.g. broadcast-ineligible dimension under a hot fact key):
the fact side spreads each key over ``n_salts`` sub-keys with a
deterministic salt, the dimension side replicates each row once per
salt, and the join runs on (key, salt) — hot keys now occupy n_salts
tasks instead of one straggler.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


_SALTABLE_JOINS = {"inner", "left", "left_outer", "leftouter", "left_semi",
                   "leftsemi", "left_anti", "leftanti"}


def salted_join(
    fact: DataFrame,
    dim: DataFrame,
    key: str,
    n_salts: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Equi-join with the fact side salted and the dimension side
    replicated ``n_salts`` times. Result is row-identical to the plain
    join; the salt is a deterministic spread (crc32 of the full fact
    row's key + a per-row component would break join semantics, so the
    spread uses ``monotonically_increasing_id`` — distribution-only,
    never part of the result).

    Only fact-preserving join types are allowed: with a right/full outer
    join each dim row unmatched under one salt would surface as up to
    ``n_salts`` spurious null-extended copies (the dim side is
    replicated), so those types raise instead of silently corrupting."""
    if how.lower().replace("_", "") not in {
        h.replace("_", "") for h in _SALTABLE_JOINS
    }:
        raise ValueError(
            f"salted_join supports fact-preserving joins only "
            f"({sorted(_SALTABLE_JOINS)}); got how={how!r} — the replicated "
            f"dim side makes right/full outer results wrong"
        )
    salted_fact = fact.withColumn(
        "__salt", F.pmod(F.monotonically_increasing_id(), F.lit(n_salts))
    )
    salts = F.explode(
        F.sequence(F.lit(0), F.lit(n_salts - 1)).cast("array<long>")
    )
    salted_dim = dim.withColumn("__salt", salts)
    return (
        salted_fact.join(salted_dim, [key, "__salt"], how)
        .drop("__salt")
    )
