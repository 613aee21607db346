"""Point-in-time (as-of) join — temporal enrichment Spark has no built-in
for.

For each left row, attach the most recent right row with the same key and
``right.ts <= left.ts`` (the "last known value at that moment" join:
price-at-trade, last-purchase-before-click, config-active-at-event).

The naive formulation is a range join (key-equi + ts inequality), which
Spark plans as a broadcast-nested-loop or a full sort-merge with
per-row scanning — quadratic per key in the worst case. This operator
uses the union + windowed last_value formulation instead:

    tag left rows side=1, right rows side=0
    union both (right's carried columns null on the left side)
    last_value(col, ignorenulls=True) OVER (PARTITION BY key
                                            ORDER BY ts, side
                                            ROWS UNBOUNDED PRECEDING)
    keep side=1 rows

One shuffle on the key, one ordered pass per partition — linear in
|left|+|right| at any scale, and the per-key ordering is exactly the
merge an ASOF join does. Ties (right.ts == left.ts) resolve to
"at-or-before": side 0 sorts before side 1.

No reference analog (the reference has no temporal joins); DuckDB's
native ASOF JOIN is the oracle twin.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key_col: str,
    ts_col: str,
    value_cols: list[str],
) -> DataFrame:
    """Left as-of join: every ``left`` row, plus each of
    ``right``'s ``value_cols`` as of the latest right row at-or-before
    the left row's ``ts_col`` (null when no prior right row exists —
    LEFT semantics).

    ``right`` must be unique per (key, ts) for a deterministic result —
    the same requirement DuckDB's ASOF JOIN has for a defined tiebreak.
    Null values in ``value_cols`` are treated as "no observation"
    (ignorenulls): the join carries the last non-null observation."""
    l_tagged = left.withColumn("__side", F.lit(1))
    r_tagged = right.select(
        key_col, ts_col, *value_cols
    ).withColumn("__side", F.lit(0))
    both = l_tagged.unionByName(r_tagged, allowMissingColumns=True)
    w = (
        Window.partitionBy(key_col)
        .orderBy(F.col(ts_col).asc(), F.col("__side").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    filled = both.select(
        *[c for c in left.columns],
        "__side",
        *[
            F.last(F.col(c), ignorenulls=True).over(w).alias(f"__asof_{c}")
            for c in value_cols
        ],
    )
    out = filled.filter(F.col("__side") == 1).drop("__side")
    for c in value_cols:
        out = out.withColumn(c, F.col(f"__asof_{c}")).drop(f"__asof_{c}")
    return out
