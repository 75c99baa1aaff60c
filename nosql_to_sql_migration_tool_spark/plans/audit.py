"""Physical-plan auditing — the scale guardrails as a public API.

``tests/test_plan_shapes.py`` pins this repo's own queries; this module
exports the same checks so a deployment can pin ITS queries in CI: at
100 TB the difference between "filter reached the parquet scan" and
"filter ran after the scan" is hours, and plan regressions arrive
silently with innocent refactors. Audit functions inspect the
EXECUTED plan (what would run), never execute data jobs themselves —
the only cost is Catalyst analysis/planning.

Typical CI usage::

    report = plan_report(my_query_df)
    assert not report["cartesian_products"]
    assert not report["global_windows"]
    assert report["pushed_filters"]          # reached the scan
    assert report["python_stages"] == 0      # stayed JVM-side

Reference analogue: none — the reference executes opaque per-row
PowerShell; plan-shape contracts only exist on an engine with a
declarative optimizer to hold to account.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame

from nosql_to_sql_migration_tool_spark.hadoop_fs import executed_plan_string



def physical_plan(df: DataFrame) -> str:
    """The executed-plan string Spark would run for ``df`` (via the
    repo's single sanctioned private-JVM shim)."""
    return executed_plan_string(df)


def pushed_filters(df: DataFrame) -> list[str]:
    """Every non-empty ``PushedFilters`` entry in the scan nodes.
    Greedy to the LAST ``]`` on the line: filter text itself may nest
    brackets (``In(col, [a,b])``), and nothing bracketed follows on a
    scan line (``ReadSchema`` prints ``struct<...>``)."""
    plan = physical_plan(df)
    out = []
    for m in re.finditer(r"PushedFilters: \[(.*)\]", plan):
        body = m.group(1).strip()
        if body:
            out.append(body)
    return out


def read_schemas(df: DataFrame) -> list[str]:
    """The pruned ``ReadSchema`` of every scan — what actually leaves
    storage. A schema listing columns the query never returns means
    pruning failed."""
    plan = physical_plan(df)
    return re.findall(r"ReadSchema: (struct<[^\n]*)", plan)


def shuffle_count(df: DataFrame) -> int:
    """Number of shuffle exchanges (hash or single-partition) the plan
    executes — each is a full materialization boundary."""
    plan = physical_plan(df)
    return len(
        re.findall(
            r"Exchange (?:hashpartitioning|rangepartitioning|"
            r"SinglePartition)",
            plan,
        )
    )


def broadcast_count(df: DataFrame) -> int:
    """Number of broadcast exchanges — small sides shipped to every
    task instead of shuffled."""
    return physical_plan(df).count("BroadcastExchange")


def python_stage_count(df: DataFrame) -> int:
    """Python-execution stages in the plan (Arrow/Pandas eval nodes,
    mapInPandas, Python UDFs). The hot path of a JVM-first engine
    should report 0; sanctioned Arrow stages report exactly where they
    run."""
    plan = physical_plan(df)
    return len(
        re.findall(
            r"ArrowEvalPython|BatchEvalPython|MapInPandas|"
            r"FlatMapGroupsInPandas|PythonMapInArrow",
            plan,
        )
    )


def cartesian_products(df: DataFrame) -> int:
    """Unbroadcast cartesian products — always a bug at scale."""
    return physical_plan(df).count("CartesianProduct")


def global_windows(df: DataFrame) -> int:
    """Window nodes with an EMPTY partition spec: the whole input sorts
    on a single partition — the canonical unbounded-scale bug. A
    PARTITIONED WindowExec prints three bracket groups
    (``Window [exprs], [partition], [order]``); a GLOBAL one prints
    two, leaving one ``], [`` separator instead of two (the inner
    ``windowspecdefinition(...)`` text contains no ``], [`` — same
    detection the repo's own plan guard uses)."""
    plan = physical_plan(df)
    n = 0
    for line in plan.splitlines():
        if re.search(r"\bWindow\b", line) and "windowspecdefinition(" in line:
            if line.count("], [") == 1:
                n += 1
    return n


def plan_report(df: DataFrame) -> dict:
    """One-call audit summary — the dict a CI gate asserts against."""
    return {
        "pushed_filters": pushed_filters(df),
        "read_schemas": read_schemas(df),
        "shuffles": shuffle_count(df),
        "broadcasts": broadcast_count(df),
        "python_stages": python_stage_count(df),
        "cartesian_products": cartesian_products(df),
        "global_windows": global_windows(df),
    }
