"""Declarative data-quality expectations — the reusable core of the
rel_dq_audit pattern (queries/relational_q.py): a rule set evaluated in
ONE pass over a DataFrame, reported as (rule, n_violations) rows.

The reference delegates integrity to SQL Server DDL (NOT NULL / FK in
sqls/setup-invoice-db.sql); a lake table has no enforcing engine, so the
pipeline itself must CHECK. This is the engine-side primitive: callers
declare each rule as a boolean Column that is True when the ROW IS VALID,
and every rule is folded into a single aggregate pass — adding a rule
never adds a scan. Cross-table rules (referential integrity, rollup
reconciliation) are expressed by the caller joining first and passing
the joined frame — see rel_dq_audit for the two-fact-pass composition.

Scale stance: one map-side-combined aggregate over the input, a 1-row
result stacked to |rules| rows driver-side-free (stack(), no collect);
a null rule verdict (e.g. a comparison against a null from an outer
join) counts as a VIOLATION unless the rule handles it — nulls are
exactly what audits exist to catch.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def expectations(df: DataFrame, rules: dict[str, Column]) -> DataFrame:
    """Evaluate every rule in one aggregate pass → (rule, n_violations).

    ``rules`` maps rule name → boolean Column, True when the row
    SATISFIES the expectation. A row where the rule evaluates to null
    (three-valued logic from nullable inputs) is counted as a violation:
    "we could not prove it valid" is a finding, not a pass.
    """
    if not rules:
        raise ValueError("expectations requires at least one rule")
    for name in rules:
        # names are interpolated into a stack() expression
        if not name.replace("_", "").replace("-", "").isalnum():
            raise ValueError(f"rule name must be alphanumeric/_/-: {name!r}")
    bad = [
        F.sum(
            F.when(rule_col.isNull() | ~rule_col, 1).otherwise(0)
        ).cast("long").alias(f"__r{i}")
        for i, rule_col in enumerate(rules.values())
    ]
    one_row = df.agg(*bad)
    pairs = ", ".join(
        f"'{name}', __r{i}" for i, name in enumerate(rules.keys())
    )
    return one_row.selectExpr(
        f"stack({len(rules)}, {pairs}) AS (rule, n_violations)"
    ).select(
        "rule",
        F.coalesce(F.col("n_violations"), F.lit(0)).cast("long").alias(
            "n_violations"
        ),
    )


def assert_expectations(df: DataFrame, rules: dict[str, Column]) -> None:
    """Gate form: raise ``ValueError`` listing every violated rule (with
    counts) if any expectation fails — the pre-publish check a pipeline
    stage calls before writing a snapshot downstream consumers trust."""
    failed = {
        r.rule: r.n_violations
        for r in expectations(df, rules).collect()
        if r.n_violations
    }
    if failed:
        raise ValueError(f"expectations violated: {failed}")
