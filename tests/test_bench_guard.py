"""The bench regression guard must flag real per-query outliers without
flooding on whole-run environment drift in EITHER direction.

VERDICT r4 fixed the drift>1 flood (driver container slower than the
committed baseline -> every query looked 1.5x slower). Round 5 closes the
mirror image: when the BASELINE run was the slow one (drift<1), the
normalized threshold ``1.5 * drift * old`` can drop below ``old`` itself,
flagging flat-timing queries as regressions. The guard now also requires
an absolute slowdown (``new > 1.2 * old``).
"""

from __future__ import annotations

import importlib.util
import json
import sys
from pathlib import Path

_SPEC = importlib.util.spec_from_file_location(
    "bench", Path(__file__).resolve().parent.parent / "bench.py"
)
bench = importlib.util.module_from_spec(_SPEC)
_SPEC.loader.exec_module(bench)


def _run_guard(tmp_path, old, new, capsys):
    detail = {
        "sf": 0.1,
        "repeat": 2,
        "host": "testhost",
        "cpus": 4,
        "total_sec": sum(old.values()),
        "queries": old,
        "errors": [],
    }
    (tmp_path / "bench_detail.json").write_text(json.dumps(detail))
    bench._regression_report(new, 0.1, tmp_path)
    err = capsys.readouterr().err
    return [line for line in err.splitlines() if "REGRESSION" in line]


def test_flat_timings_vs_slow_baseline_not_flagged(tmp_path, capsys):
    # Prior run was ~2x slower across the board (slow environment);
    # current run matches it per-query after normalization -> drift ~0.5.
    # Flat queries (1.0x of old) must NOT be flagged.
    old = {f"q{i}": 2.0 for i in range(10)}
    new = {f"q{i}": 1.0 for i in range(9)}
    new["q9"] = 2.0  # flat vs old, 2x the run drift -- still NOT a regression
    assert _run_guard(tmp_path, old, new, capsys) == []


def test_true_outlier_flagged_despite_drift(tmp_path, capsys):
    # Whole run 1.5x slower (environment), one query 9x slower (real).
    old = {f"q{i}": 1.0 for i in range(10)}
    new = {f"q{i}": 1.5 for i in range(9)}
    new["q9"] = 9.0
    flagged = _run_guard(tmp_path, old, new, capsys)
    assert len(flagged) == 1 and "q9" in flagged[0]


def test_absolute_regression_flagged_when_run_is_faster(tmp_path, capsys):
    # Run overall faster (drift < 1) but one query genuinely 3x slower.
    old = {f"q{i}": 2.0 for i in range(10)}
    new = {f"q{i}": 1.0 for i in range(9)}
    new["q9"] = 6.0
    flagged = _run_guard(tmp_path, old, new, capsys)
    assert len(flagged) == 1 and "q9" in flagged[0]


def test_mismatched_sf_baseline_ignored(tmp_path, capsys):
    # A detail file recorded at another sf must not be used as baseline.
    old = {f"q{i}": 0.3 for i in range(10)}
    detail = {
        "sf": 0.01,
        "repeat": 2,
        "host": "testhost",
        "cpus": 4,
        "total_sec": sum(old.values()),
        "queries": old,
        "errors": [],
    }
    (tmp_path / "bench_detail.json").write_text(json.dumps(detail))
    bench._regression_report({f"q{i}": 3.0 for i in range(10)}, 0.1, tmp_path)
    assert "REGRESSION" not in capsys.readouterr().err


def test_no_duplicate_module_globals_in_queries():
    """Regression guard: queries.py is one module, so a second
    assignment to a helper global (e.g. a column list reused by an
    earlier query's builder at CALL time) silently rebinds it for
    everyone — exactly how lineitem's profile columns once broke
    customer_profile. Every module-level name may be assigned once."""
    import re
    from collections import Counter
    from pathlib import Path

    src = Path("nosql_to_sql_migration_tool_spark/queries.py").read_text()
    names = re.findall(
        r"^([A-Za-z_][A-Za-z0-9_]*)\s*(?::[^=]+)?=(?!=)", src, re.M
    )
    dups = {n: c for n, c in Counter(names).items() if c > 1}
    assert not dups, f"module globals assigned more than once: {dups}"


def test_subsecond_flap_below_delta_floor_not_flagged(tmp_path, capsys):
    # Round 8: the FIRST execution of any plan pays ~1.5-2x in
    # codegen/shuffle warmup, so a driver repeat-1 run vs the committed
    # repeat-2 min shows dozens of 0.3s -> 0.6s "regressions" that are
    # pure repeat asymmetry. Below the 0.75s absolute-delta floor they
    # must not flag; a real multi-second outlier still must.
    old = {f"q{i}": 0.3 for i in range(10)}
    new = {f"q{i}": 0.6 for i in range(9)}  # 2.0x but delta 0.3s
    new["q9"] = 3.0  # 10x AND delta 2.7s — real
    flagged = _run_guard(tmp_path, old, new, capsys)
    assert len(flagged) == 1 and "q9" in flagged[0]


def test_build_rows_flag_only_on_catastrophic_blowup(tmp_path, capsys):
    # Build rows can't be re-measured (memoized artifacts) and swing
    # 2-3x with VM noise — only a super-linear blowup should flag.
    old = {"build:x": 3.0, "build:y": 3.0, "q0": 10.0}
    new = {"build:x": 7.0, "build:y": 30.0, "q0": 10.0}  # 2.3x vs 10x
    flagged = _run_guard(tmp_path, old, new, capsys)
    assert len(flagged) == 1 and "build:y" in flagged[0]


def test_bench_capacity_tripwire():
    """Round 9 (VERDICT r8 next #2): the bench grew to within sight of
    the driver's historical ceiling (~196s survived in r8; the actual
    timeout is unknown). Pin the committed baseline's size so growth is
    a deliberate act: a round that pushes past these bounds must trim
    redundant rows (the round-9 discipline) or produce fresh margin
    evidence, not discover the ceiling in a driver run."""
    import json
    from pathlib import Path

    detail = json.loads(
        (Path(__file__).resolve().parent.parent / "bench_detail.json").read_text()
    )
    assert len(detail["queries"]) <= 215, (
        f"bench has {len(detail['queries'])} rows — trim before growing"
    )
    assert detail["total_sec"] <= 215, (
        f"committed bench total {detail['total_sec']}s — trim before growing"
    )
