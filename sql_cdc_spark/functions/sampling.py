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

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# 60 bits of md5 → [0, 2^60); dividing gives a uniform double in [0,1).
# 15 hex chars so the value is exact in both Spark's long and DuckDB's
# BIGINT, and the double division is the same IEEE754 op on both sides.
_HASH_SPAN = float(2**60)


def hash_unit(col: Column, salt: str = "") -> Column:
    """Deterministic uniform [0,1) from a key column: the first 15 hex
    chars of md5(salt || key) as a 60-bit integer, divided by 2^60.
    Changing ``salt`` draws an independent assignment (e.g. one salt for
    the split, another for subsampling)."""
    h = F.conv(F.substring(F.md5(F.concat(F.lit(salt), col.cast("string"))), 1, 15), 16, 10).cast("long")
    return h / F.lit(_HASH_SPAN)


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


def unit_sql(key_expr: str, salt: str) -> str:
    """DuckDB twin of hash_unit (same md5 prefix, same 2^60 divide)."""
    return (
        f"(CAST(('0x' || substring(md5('{salt}' || CAST({key_expr} AS VARCHAR)), 1, 15)) AS BIGINT)"
        f" / {_HASH_SPAN!r})"
    )
