"""Randomized pins of the round-6 operators against brute-force python
references — seeded randoms, a handful of examples each (one Spark job
per example), covering shapes the hand fixtures don't enumerate."""

from __future__ import annotations

import math
import random
from collections import Counter
from datetime import datetime, timedelta
from decimal import ROUND_HALF_UP, Decimal


def _round6(x: float) -> float:
    """The engines' rounding, not python's: Spark rounds the double's
    SHORTEST decimal repr HALF_UP (BigDecimal.valueOf), and DuckDB's
    multiply-add-floor agrees with it on these values — python's
    correctly-rounded half-even round() does not (e.g.
    1.4312484999...9 reprs as "1.4312485" and rounds UP on both
    engines)."""
    return float(
        Decimal(repr(x)).quantize(Decimal("1e-6"), rounding=ROUND_HALF_UP)
    )


def test_key_skew_profile_matches_enumeration(spark):
    from nosql_to_sql_migration_tool_spark.operators.skew import (
        key_skew_profile,
    )

    rng = random.Random(7)
    for _ in range(3):
        keys = [rng.choice("abcdefgh") for _ in range(rng.randint(1, 60))]
        df = spark.createDataFrame([(k,) for k in keys], "k string")
        per_key = Counter(keys)
        total = len(keys)
        expect: dict[int, list] = {}
        for cnt in per_key.values():
            b = cnt.bit_length() - 1
            e = expect.setdefault(b, [0, 0, 0])
            e[0] += 1
            e[1] += cnt
            e[2] = max(e[2], cnt)
        got = {
            r["log2_bucket"]: (
                r["n_keys"],
                r["n_rows"],
                r["max_rows_per_key"],
                r["rows_share"],
            )
            for r in key_skew_profile(df, "k").collect()
        }
        assert got == {
            b: (nk, nr, mx, _round6(nr / total))
            for b, (nk, nr, mx) in expect.items()
        }, keys


def test_mad_outliers_match_enumeration(spark):
    from nosql_to_sql_migration_tool_spark.operators.timeseries import (
        mad_outlier_days,
    )

    def median(xs):
        xs = sorted(xs)
        n = len(xs)
        mid = n // 2
        return float(xs[mid]) if n % 2 else (xs[mid - 1] + xs[mid]) / 2.0

    rng = random.Random(11)
    for _ in range(3):
        rows = []
        eid = 0
        series = {}
        for t in "xy":
            days = rng.randint(1, 8)
            counts = [rng.randint(1, 12) for _ in range(days)]
            series[t] = counts
            for d, n in enumerate(counts):
                for _ in range(n):
                    rows.append(
                        (eid, datetime(2024, 5, 1) + timedelta(days=d, hours=3), t)
                    )
                    eid += 1
        df = spark.createDataFrame(
            rows, "event_id long, ts timestamp, event_type string"
        )
        expect = set()
        for t, counts in series.items():
            med = median(counts)
            mad = median([abs(c - med) for c in counts])
            for d, n in enumerate(counts):
                if abs(n - med) > 3 * mad:
                    expect.add((t, d, n))
        got = {
            (
                r["event_type"],
                (r["day"] - datetime(2024, 5, 1)).days,
                r["n_events"],
            )
            for r in mad_outlier_days(df).collect()
        }
        assert got == expect, series


def test_charlm_scores_match_enumeration(spark):
    from nosql_to_sql_migration_tool_spark.operators.charlm import (
        charlm_score,
        learn_char_lm,
    )

    rng = random.Random(13)
    corpus = [
        (i, "".join(rng.choice("ab ") for _ in range(rng.randint(0, 12))))
        for i in range(10)
    ]
    df = spark.createDataFrame(corpus, "doc_id long, text string")
    model, floor = learn_char_lm(df)
    table = dict(model)

    # python reference: identical integer-microbit fold
    counts = Counter()
    prefix: Counter = Counter()
    for _, t in corpus:
        for i in range(len(t) - 1):
            bg = t[i : i + 2]
            counts[bg] += 1
            prefix[bg[0]] += 1
    for bg, su in model:
        expect_su = round(-math.log2(counts[bg] / prefix[bg[0]]) * 1_000_000)
        assert su == expect_su, bg

    got = {
        r["doc_id"]: (r["n_bigrams"], r["bits_per_char"])
        for r in charlm_score(df, model, floor).collect()
    }
    for i, t in corpus:
        if len(t) < 2:
            assert i not in got
            continue
        sus = [
            table.get(t[j : j + 2], floor) for j in range(len(t) - 1)
        ]
        assert got[i] == (
            len(sus),
            _round6(sum(sus) / (1_000_000.0 * len(sus))),
        ), t
