"""Plan-quality audit — the 100 TB scale checklist as a first-class API.

The structural properties that make a DataFrame plan viable at cluster
scale are all visible in the physical plan text: filters reaching the
parquet scan, small sides broadcasting, no row-at-a-time Python, no
window funneling the whole input through one task. tests/test_plans.py
enforces them for every registry query; this module exposes the same
checks to USERS, so a pipeline author can gate their own queries:

    from sql_cdc_spark.plans import assert_scale_safe
    assert_scale_safe(df)                      # raises with reasons
    flags = plan_flags(df)                     # inspect individual facts

The checks are heuristics over ``explain`` output — the same evidence a
human plan review reads — not a cost model. They catch the failure
classes that silently de-optimize (a dim that stopped broadcasting, a
filter that stopped pushing down, a window that lost its PARTITION BY),
which is exactly what regresses when code is refactored.
"""

from __future__ import annotations

import re
from typing import NamedTuple

from pyspark.sql import DataFrame


def explain_str(df: DataFrame, mode: str = "extended") -> str:
    """The explain output as a string (what ``df.explain`` prints)."""
    return df._sc._jvm.PythonSQLUtils.explainString(  # type: ignore[attr-defined]
        df._jdf.queryExecution(), mode
    )


class PlanFlags(NamedTuple):
    """Structural facts extracted from one physical plan."""

    row_python_udf: bool        # BatchEvalPython — row-at-a-time Python
    arrow_python: bool          # MapInPandas / ArrowEvalPython / grouped map
    partitionless_window: bool  # Window fed by Exchange SinglePartition
    sort_merge_joins: int
    broadcast_joins: int
    exchanges: int
    take_ordered: bool          # TakeOrderedAndProject (heap top-k)
    file_scans: dict[str, int]  # parquet file name → scan count
    pushed_filters: list[str]   # PushedFilters: [...] payloads, per scan

    def scans_of(self, table: str) -> int:
        return sum(
            n for name, n in self.file_scans.items() if table in name
        )


def plan_flags(df: DataFrame) -> PlanFlags:
    """Extract ``PlanFlags`` from a DataFrame's physical plan."""
    plan = explain_str(df)
    phys = plan.split("== Physical Plan ==")[-1]
    lines = phys.splitlines()
    partitionless = False
    for i, line in enumerate(lines):
        if "Window " not in line:
            continue
        # a Window whose child exchange is SinglePartition funnels the
        # whole input into one task; scalar aggregates also use
        # SinglePartition, so only flag ones directly feeding a Window
        for follow in lines[i + 1 : i + 4]:
            if "Exchange SinglePartition" in follow:
                partitionless = True
    scans: dict[str, int] = {}
    for m in re.finditer(r"FileScan parquet[^\[]*\[", phys):
        seg = phys[m.start() : m.start() + 600]
        loc = re.search(r"Location:[^\[]*\[([^\]]*)", seg)
        name = loc.group(1).rstrip("/").rsplit("/", 1)[-1] if loc else "?"
        scans[name] = scans.get(name, 0) + 1
    pushed = re.findall(r"PushedFilters: \[([^\]]*)\]", phys)
    return PlanFlags(
        row_python_udf="BatchEvalPython" in phys,
        arrow_python=any(
            tok in phys
            for tok in ("MapInPandas", "ArrowEvalPython", "FlatMapGroupsInPandas")
        ),
        partitionless_window=partitionless,
        sort_merge_joins=phys.count("SortMergeJoin"),
        broadcast_joins=phys.count("BroadcastHashJoin"),
        exchanges=phys.count("Exchange"),
        take_ordered="TakeOrderedAndProject" in phys,
        file_scans=scans,
        pushed_filters=pushed,
    )


def assert_scale_safe(
    df: DataFrame,
    *,
    allow_arrow: bool = False,
    max_sort_merge_joins: int = 0,
    max_scans_per_table: int | None = None,
) -> PlanFlags:
    """Raise AssertionError (listing every violation) unless the plan is
    free of the known scale-killers. Returns the flags on success so
    callers can make further assertions.

    ``max_sort_merge_joins`` defaults to 0 because in this engine's
    query shapes every non-fact join side is dim- or aggregate-sized and
    must broadcast; raise it for genuine fact⨝fact queries."""
    flags = plan_flags(df)
    problems: list[str] = []
    if flags.row_python_udf:
        problems.append(
            "row-at-a-time Python UDF (BatchEvalPython) — 10-100× slower "
            "than built-ins; use pyspark.sql.functions or a Pandas UDF"
        )
    if flags.arrow_python and not allow_arrow:
        problems.append(
            "Python evaluation (MapInPandas/ArrowEvalPython) in the plan — "
            "pass allow_arrow=True only if this stage genuinely needs Python"
        )
    if flags.partitionless_window:
        problems.append(
            "window without PARTITION BY — the whole input funnels through "
            "one task at any scale"
        )
    if flags.sort_merge_joins > max_sort_merge_joins:
        problems.append(
            f"{flags.sort_merge_joins} SortMergeJoin(s) — a small side "
            "stopped broadcasting, or pass max_sort_merge_joins for a "
            "genuine fact⨝fact join"
        )
    if max_scans_per_table is not None:
        for name, n in flags.file_scans.items():
            if n > max_scans_per_table:
                problems.append(
                    f"{name} scanned {n}× — share the subtree "
                    "(checkpoint/cache) instead of recomputing per branch"
                )
    if problems:
        raise AssertionError(
            "plan is not scale-safe:\n  - " + "\n  - ".join(problems)
        )
    return flags


def audit_registry(
    spark, sf_dir: str, names: list[str] | None = None
) -> dict[str, PlanFlags]:
    """Flags for every registry query (or the given subset) — the
    whole-engine plan census the per-round review reads."""
    from sql_cdc_spark.queries import _registry

    reg = _registry()
    out: dict[str, PlanFlags] = {}
    for name in names or reg:
        out[name] = plan_flags(reg[name].fn(spark, sf_dir))
    return out
