"""Deterministic sampling / splitting primitives for training-data
pipelines.

A 100 TB corpus cannot use ``rand()`` for train/test assignment: the
split must be (a) reproducible across runs and engines, (b) stable under
repartitioning, and (c) a pure function of the record key so late-arriving
shards land in the same split. The standard trick is hash-bucketing the
key into the unit interval — every row is a scan-local expression, no
shuffle, no state, and the same md5 arithmetic runs in any engine (the
DuckDB oracles reuse it verbatim).

No reference analog (the reference has no sampling surface); these are
north-star extensions in the spirit of SURVEY.md §7 Phase 3.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

# 60 bits of md5 → [0, 2^60); dividing gives a uniform double in [0,1).
# 15 hex chars so the value is exact in both Spark's long and DuckDB's
# BIGINT, and the double division is the same IEEE754 op on both sides.
_HASH_SPAN = float(2**60)


def hash60(col: Column, salt: str = "") -> Column:
    """The 60-bit key hash every deterministic sampling/shuffling
    primitive here derives from: the first 15 hex chars of
    md5(salt || key) as an exact bigint in [0, 2^60) — the same
    arithmetic runs verbatim in the DuckDB oracles. Changing ``salt``
    draws an independent assignment."""
    return F.conv(
        F.substring(F.md5(F.concat(F.lit(salt), col.cast("string"))), 1, 15),
        16,
        10,
    ).cast("long")


def hash_unit(col: Column, salt: str = "") -> Column:
    """Deterministic uniform [0,1) from a key column: hash60 divided by
    2^60 (the same IEEE754 division on both engines)."""
    return hash60(col, salt) / F.lit(_HASH_SPAN)


def with_split(
    df: DataFrame,
    id_col: str,
    test_frac: float = 0.1,
    val_frac: float = 0.0,
    salt: str = "split",
) -> DataFrame:
    """Add a ``split`` column ('train' / 'val' / 'test') assigned by key
    hash. Fractions are exact in expectation and reproducible exactly:
    the same key always lands in the same split, on any cluster size."""
    u = hash_unit(F.col(id_col), salt)
    split = (
        F.when(u < test_frac, "test")
        .when(u < test_frac + val_frac, "val")
        .otherwise("train")
    )
    return df.withColumn("split", split)


def stratified_sample(
    df: DataFrame,
    strata_col: str,
    id_col: str,
    fracs: dict[str, float],
    default_frac: float = 0.0,
    salt: str = "sample",
) -> DataFrame:
    """Deterministic per-stratum sampling: keep a row iff its key hash
    falls under its stratum's fraction. Unlike ``df.sampleBy`` this is
    reproducible independent of partitioning and engine — the exact same
    rows survive in Spark and in the SQL oracle."""
    u = hash_unit(F.col(id_col), salt)
    frac = F.lit(default_frac)
    for value, f in fracs.items():
        frac = F.when(F.col(strata_col) == value, F.lit(f)).otherwise(frac)
    return df.filter(u < frac)


def split_sql(key_expr: str, test_frac: float, val_frac: float = 0.0, salt: str = "split") -> str:
    """DuckDB twin of with_split's assignment expression."""
    u = unit_sql(key_expr, salt)
    return (
        f"CASE WHEN {u} < {test_frac} THEN 'test' "
        f"WHEN {u} < {test_frac + val_frac} THEN 'val' "
        f"ELSE 'train' END"
    )


def pps_systematic_sample(
    df: DataFrame,
    id_col: str,
    weight_col: str,
    n_draws: int,
    n_buckets: int = 64,
    salt: str = "pps",
) -> DataFrame:
    """Probability-proportional-to-size systematic sampling: draw ~n rows
    such that each row's inclusion probability is proportional to its
    integer weight (token/char count) — the standard way to sample a
    training corpus so the SAMPLE's token mass, not its document count,
    matches a quota. Deterministic and engine-portable: the draw is pure
    integer arithmetic over a hash-defined total order, so the exact same
    rows are selected in Spark and in the SQL oracle, on any cluster.

    Mechanics: rows are ordered by (hash-bucket(id), id); with W = total
    weight and step = W // n, grid points sit at step/2, step/2 + step, …
    and a row is drawn iff a grid point lands in its cumulative-weight
    interval [cum−w, cum). Rows heavier than ``step`` are certainty
    inclusions (drawn once).

    Scale: the global cumulative sum is two-phase — a per-bucket window
    (PARTITIONED by the hash bucket, never partition-less) plus bucket
    offsets from a ``n_buckets``-row grouped aggregate collected to the
    driver (bounded by the constant bucket count, the win_ntile_quartiles
    pattern). One shuffle on the bucket key; no task ever sorts more than
    ~1/n_buckets of the corpus.

    Returns the selected rows with ``cum`` (global cumulative weight,
    inclusive) appended."""
    bucket = (
        F.conv(
            F.substring(
                F.md5(F.concat(F.lit(salt), F.col(id_col).cast("string"))), 1, 15
            ),
            16,
            10,
        ).cast("long")
        % n_buckets
    )
    bucketed = df.withColumn("__b", bucket)
    bsums = {
        r["__b"]: r["w"]
        for r in bucketed.groupBy("__b")
        .agg(F.sum(weight_col).alias("w"))
        .collect()
    }
    total = sum(bsums.values())
    step = max(total // n_draws, 1)
    half = step // 2
    offsets, acc = {}, 0
    for b in range(n_buckets):
        offsets[b] = acc
        acc += bsums.get(b, 0)
    off_map = F.create_map(
        *[lit for b in range(n_buckets) for lit in (F.lit(b), F.lit(offsets[b]))]
    )
    w = Window.partitionBy("__b").orderBy(F.col(id_col).asc())
    cum = (
        F.element_at(off_map, F.col("__b"))
        + F.sum(weight_col).over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
    )
    with_cum = bucketed.withColumn("cum", cum).drop("__b")
    # grid-point count below x: g(x) = (x + step - 1 - half) DIV step;
    # a row is drawn iff g crosses between its interval's two ends.
    # Integer DIV end-to-end — exact at any corpus size (no doubles).
    g_hi = F.expr(f"(cum + {step - 1 - half}) DIV {step}")
    g_lo = F.expr(f"(cum - {weight_col} + {step - 1 - half}) DIV {step}")
    return with_cum.filter(g_hi > g_lo)


def pps_sample_sql(
    table: str,
    id_col: str,
    weight_col: str,
    cols: str,
    n_draws: int,
    n_buckets: int = 64,
    salt: str = "pps",
) -> str:
    """DuckDB twin of pps_systematic_sample (same hash order, same integer
    grid arithmetic; the oracle may use one global window where the Spark
    side is two-phase)."""
    return f"""
WITH __w AS (
  SELECT *,
         CAST(('0x' || substring(md5('{salt}' || CAST({id_col} AS VARCHAR)), 1, 15)) AS BIGINT)
           % {n_buckets} AS __b
  FROM {table}
),
__c AS (
  SELECT *,
         -- CASTs: DuckDB's SUM(BIGINT) yields HUGEINT; the driver's
         -- value-hash is type-sensitive, so pin both to BIGINT
         CAST(SUM({weight_col}) OVER (ORDER BY __b, {id_col}
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum,
         CAST(SUM({weight_col}) OVER () AS BIGINT) AS __total
  FROM __w
),
__s AS (
  SELECT *, GREATEST(__total // {n_draws}, 1) AS __step
  FROM __c
)
SELECT {cols}, cum
FROM __s
WHERE ((cum + __step - 1 - __step // 2) // __step)
    > ((cum - {weight_col} + __step - 1 - __step // 2) // __step)
"""


def unit_sql(key_expr: str, salt: str) -> str:
    """DuckDB twin of hash_unit (same md5 prefix, same 2^60 divide)."""
    return (
        f"(CAST(('0x' || substring(md5('{salt}' || CAST({key_expr} AS VARCHAR)), 1, 15)) AS BIGINT)"
        f" / {_HASH_SPAN!r})"
    )
