"""Mergeable cardinality sketches — register-level HyperLogLog in pure
column algebra.

``approx_count_distinct`` returns an opaque estimate; a 100 TB pipeline
needs the REGISTERS, because registers merge: per-partition / per-day /
per-source sketch tables can be maintained incrementally and combined by
a plain groupBy-max, never re-scanning history (the discipline Druid/
ClickHouse-style aggregating engines use for distinct-count rollups).

The register state is exact integer data — (group, reg, rho) with
rho = leading-zero rank — so stream-equals-batch equality for the
maintenance loop is EXACT (max is associative + commutative + idempotent),
while the cardinality estimate keeps the usual ~1.04/√m error.

Hash: xxhash64 (JVM built-in, engine-deterministic). Register index =
low ``p`` bits; rank = leading zeros of the remaining 64−p bits + 1,
computed from the bit length (length of F.bin) — no float log2.
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

HLL_P = 11  # 2048 registers → standard error ≈ 1.04/√2048 ≈ 2.3%


def hll_registers(
    df: DataFrame,
    group_cols: list[str],
    value_col: str,
    p: int = HLL_P,
) -> DataFrame:
    """Per-group HLL register table: (group…, reg, rho) with one row per
    OCCUPIED register (sparse — absent registers mean rho 0). One
    map-side-combined groupBy; the shuffle carries ≤ |groups|·2^p rows
    regardless of input size."""
    h = F.xxhash64(F.col(value_col))
    reg = h.bitwiseAND(F.lit((1 << p) - 1)).cast("int")
    rest = F.shiftrightunsigned(h, p)
    # bit_length(rest) = 64−p − leading_zeros; F.bin drops leading zeros
    bl = F.when(rest == 0, F.lit(0)).otherwise(F.length(F.bin(rest)))
    rho = (F.lit(64 - p) - bl + 1).cast("int")
    return df.groupBy(*group_cols, reg.alias("reg")).agg(F.max(rho).alias("rho"))


def merge_registers(
    *register_tables: DataFrame, group_cols: list[str]
) -> DataFrame:
    """Union any number of register tables and keep the per-register max —
    the HLL merge. Associative/commutative/idempotent, so partial sketch
    tables combine in any order (and replaying a batch is a no-op)."""
    out = register_tables[0]
    for t in register_tables[1:]:
        out = out.unionByName(t)
    return out.groupBy(*group_cols, "reg").agg(F.max("rho").alias("rho"))


def _alpha(m: int) -> float:
    if m <= 16:
        return 0.673
    if m <= 32:
        return 0.697
    if m <= 64:
        return 0.709
    return 0.7213 / (1 + 1.079 / m)


def hll_estimate(
    registers: DataFrame, group_cols: list[str], p: int = HLL_P
) -> DataFrame:
    """Cardinality estimate per group from a (sparse) register table —
    the classic HLL estimator with the small-range linear-counting
    correction. Returns (group…, estimate double, n_registers)."""
    m = 1 << p
    alpha = _alpha(m)
    per_group = registers.groupBy(*group_cols).agg(
        F.sum(F.pow(F.lit(0.5), F.col("rho"))).alias("__present_sum"),
        F.count(F.lit(1)).alias("n_registers"),
    )
    zeros = F.lit(m) - F.col("n_registers")
    denom = F.col("__present_sum") + zeros  # absent registers add 2^-0 = 1
    raw = F.lit(alpha * m * m) / denom
    small = F.lit(float(m)) * F.log(F.lit(float(m)) / zeros)
    est = F.when(
        (raw <= F.lit(2.5 * m)) & (zeros > 0), small
    ).otherwise(raw)
    return per_group.select(
        *group_cols, est.alias("estimate"), F.col("n_registers")
    )


def hll_error_bound(p: int = HLL_P, k_sigma: float = 3.0) -> float:
    """Relative error bound: k σ of the 1.04/√m standard error."""
    return k_sigma * 1.04 / math.sqrt(1 << p)


def distinct_within_bound(
    df: DataFrame,
    group_cols: list[str],
    value_col: str,
    p: int = HLL_P,
) -> DataFrame:
    """Estimate next to exact with an in-plan accuracy verdict — the
    hash-gateable contract form (a sketch regression flips ``ok``)."""
    est = hll_estimate(hll_registers(df, group_cols, value_col, p), group_cols, p)
    exact = df.groupBy(*group_cols).agg(
        F.countDistinct(value_col).alias("exact_distinct")
    )
    bound = hll_error_bound(p)
    return est.join(exact, group_cols).select(
        *group_cols,
        "exact_distinct",
        F.round("estimate", 1).alias("estimate"),
        (
            F.abs(F.col("estimate") - F.col("exact_distinct"))
            <= F.greatest(F.lit(2.0), F.lit(bound) * F.col("exact_distinct"))
        ).alias("ok"),
    )
