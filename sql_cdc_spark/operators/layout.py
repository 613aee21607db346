"""Multi-dimensional data layout: Z-order (Morton) interleaving for
scan-pruning on more than one column.

At 100 TB the dominant cost of a selective query is which FILES and row
groups the scan can skip via parquet min/max footer stats. Sorting the
table by one column makes that column's stats tight and every other
column's useless; interleaving the bits of two (or more) columns into one
sort key gives every participating column locally-bounded ranges in every
file — the layout trick behind Delta OPTIMIZE ZORDER / Iceberg sort
orders, here as plain DataFrame ops:

  write:  repartitionByRange(zkey) + sortWithinPartitions(zkey) → parquet
  read:   ordinary filters; Spark's parquet reader prunes row groups via
          footer stats, no special read path needed.

The interleave is pure integer column algebra (generated SQL, identical
text on the DuckDB oracle side), so the key itself is hash-gateable.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

ZORDER_BITS = 16  # per-dimension resolution of the interleave


def zorder_key_sql(cols: list[str], bits: int = ZORDER_BITS) -> str:
    """Engine-portable SQL for the Morton interleave of the given integer
    expressions (each masked to ``bits`` low bits first). Generated as an
    explicit sum of shift/mask terms — the same text parses in Spark SQL
    and DuckDB, so the oracle replays the identical arithmetic. For n
    columns, bit b of column i lands at output bit b·n + i."""
    n = len(cols)
    terms = []
    for i, c in enumerate(cols):
        masked = f"(CAST({c} AS BIGINT) & {(1 << bits) - 1})"
        for b in range(bits):
            terms.append(f"((({masked} >> {b}) & 1) << {b * n + i})")
    return " + ".join(terms)


def zorder_key(cols: list[str], bits: int = ZORDER_BITS) -> Column:
    return F.expr(zorder_key_sql(cols, bits))


def write_zordered(
    df: DataFrame,
    path: str,
    cols: list[str],
    n_files: int,
    bits: int = ZORDER_BITS,
) -> None:
    """Write ``df`` as parquet laid out in Z-order over ``cols``.

    repartitionByRange on the z-key gives each output file a compact,
    non-overlapping z-range (range boundaries come from a sampled
    sketch — one extra pass, standard for a layout rewrite); the
    within-partition sort tightens row-group stats inside each file.
    Because a compact z-range bounds EVERY interleaved dimension, the
    parquet footer min/max of each ``cols`` member is tight in every
    file, and a selective filter on ANY of them prunes most files —
    tests/test_layout.py measures exactly that against the footers.

    Each column is min/max-scaled to the full ``bits`` domain BEFORE
    interleaving. Without this, a column whose values occupy fewer bits
    than its peers (user ids in the hundreds next to cents in the
    millions) contributes only LOW interleave bits, the z-order
    degenerates to a sort on the wide column, and the narrow column
    stops pruning entirely — tests/test_layout.py caught exactly that.
    Equal-width scaling needs two scalars per column (one agg pass);
    heavily skewed columns would want rank scaling instead (range-
    partition ids, the Delta OPTIMIZE ZORDER approach) — documented
    trade, same interleave either way."""
    lo_hi = df.agg(
        *[F.min(c).alias(f"__mn_{c}") for c in cols],
        *[F.max(c).alias(f"__mx_{c}") for c in cols],
    ).first()
    if any(lo_hi[f"__mn_{c}"] is None for c in cols):
        # empty input (a layout rewrite of a partition that compacted to
        # nothing) or an all-NULL z-column: there is nothing to order —
        # write the empty-but-typed dataset instead of int(None) crashing
        df.write.mode("overwrite").parquet(path)
        return
    top = (1 << bits) - 1
    scaled = []
    for c in cols:
        mn, mx = int(lo_hi[f"__mn_{c}"]), int(lo_hi[f"__mx_{c}"])
        span = max(1, mx - mn)
        scaled.append(f"(((CAST({c} AS BIGINT) - {mn}) * {top}) div {span})")
    keyed = df.withColumn("__zkey", zorder_key(scaled, bits))
    (
        keyed.repartitionByRange(n_files, F.col("__zkey"))
        .sortWithinPartitions("__zkey")
        .drop("__zkey")
        .write.mode("overwrite")
        .parquet(path)
    )
