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


CMS_D = 4    # hash rows — P(min over rows misses the ε bound) ≈ e^-d
CMS_W = 512  # columns per row — overestimate ≤ e/w · N w.h.p.


def cms_cells(
    df: DataFrame,
    group_cols: list[str],
    value_col: str,
    d: int = CMS_D,
    w: int = CMS_W,
) -> DataFrame:
    """Sparse count-min sketch: (group…, row, col, cnt) with one row per
    occupied cell. Cell (i, xxhash64(i, v) mod w) accumulates every
    occurrence of value v; absent cells are zero. One map-side-combined
    groupBy; the shuffle carries ≤ |groups|·d·w rows regardless of input
    size — the frequency analog of hll_registers (and like it, the cell
    table is the MERGEABLE state a 100 TB pipeline maintains per
    partition/day/source and combines by sum, never re-scanning
    history)."""
    pairs = F.array(
        *[
            F.struct(
                F.lit(i).alias("row"),
                F.pmod(F.xxhash64(F.lit(i), F.col(value_col)), F.lit(w))
                .cast("int")
                .alias("col"),
            )
            for i in range(d)
        ]
    )
    return (
        df.select(*group_cols, F.explode(pairs).alias("rc"))
        .groupBy(
            *group_cols,
            F.col("rc.row").alias("row"),
            F.col("rc.col").alias("col"),
        )
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def cms_merge(*cell_tables: DataFrame, group_cols: list[str]) -> DataFrame:
    """Union any number of CMS cell tables and sum per cell — the CMS
    merge (counts are additive, so partial sketches combine in any
    order; batch-equals-merged-minibatches exactly)."""
    out = cell_tables[0]
    for t in cell_tables[1:]:
        out = out.unionByName(t)
    return out.groupBy(*group_cols, "row", "col").agg(
        F.sum("cnt").alias("cnt")
    )


def cms_point_estimates(
    cells: DataFrame,
    items: DataFrame,
    value_col: str,
    d: int = CMS_D,
    w: int = CMS_W,
    group_cols: list[str] | None = None,
) -> DataFrame:
    """CMS point queries: for each candidate item, the estimate is the
    MIN over the d rows of its cell's count (a missing cell is 0 — only
    possible for never-seen items). Guarantees: estimate ≥ true count
    ALWAYS (one-sided error, every occurrence landed in every probed
    cell); estimate ≤ true + (e/w)·N with probability ≈ 1 − e^−d per
    item. The candidate set is small (heavy-hitter candidates), so the
    probe explode is |items|·d rows joined against the sparse cell
    table.

    ``group_cols`` must name the SAME grouping the cell table was built
    with (and ``items`` must carry those columns): the probe join
    includes them, so a per-day/per-source sketch is estimated within
    its own group. Omitting them against a grouped cell table would
    min() across groups and silently break the one-sided guarantee."""
    group_cols = group_cols or []
    probes = items.select(
        *group_cols,
        value_col,
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).alias("row"),
                        F.pmod(
                            F.xxhash64(F.lit(i), F.col(value_col)), F.lit(w)
                        )
                        .cast("int")
                        .alias("col"),
                    )
                    for i in range(d)
                ]
            )
        ).alias("rc"),
    ).select(
        *group_cols,
        value_col,
        F.col("rc.row").alias("row"),
        F.col("rc.col").alias("col"),
    )
    return (
        probes.join(cells, [*group_cols, "row", "col"], "left")
        .groupBy(*group_cols, value_col)
        .agg(F.min(F.coalesce(F.col("cnt"), F.lit(0))).alias("cms_estimate"))
    )


def cms_inner_product(
    cells_a: DataFrame,
    cells_b: DataFrame,
    group_cols: list[str] | None = None,
    d: int = CMS_D,
) -> DataFrame:
    """Equi-join cardinality estimate from two CMS cell tables — the
    AMS/CMS inner-product estimator an optimizer uses to size a join
    WITHOUT scanning either side: |A ⋈_k B| = Σ_v f_A(v)·f_B(v), and
    each sketch row's Σ_col cntA·cntB overestimates that (collisions
    only ever ADD mass), so the MIN over the d rows is a one-sided
    estimate: always ≥ the true join size, ≤ true + (e/w)·N_A·N_B with
    probability ≈ 1 − e^−d. Work is |cells| ≤ d·w per group — constant,
    never touching the inputs again (the sketches are the maintained
    state).

    Returns (group…, join_size_est). A sketch row absent from the cell
    join contributes inner product 0, making the min 0 — handled by
    counting surviving rows per group; a group present in only ONE
    sketch (or sketches with zero overlapping cells) still gets its
    0-estimate row, from the group universe of both inputs."""
    group_cols = group_cols or []
    a = cells_a.select(*group_cols, "row", "col", F.col("cnt").alias("ca"))
    b = cells_b.select(*group_cols, "row", "col", F.col("cnt").alias("cb"))
    per_row = (
        a.join(b, [*group_cols, "row", "col"])
        .groupBy(*group_cols, "row")
        .agg(F.sum(F.col("ca") * F.col("cb")).alias("ip"))
    )
    est = F.when(
        F.coalesce(F.col("__rows"), F.lit(0)) < d, F.lit(0).cast("long")
    ).otherwise(F.col("__min_ip"))
    if not group_cols:
        # global agg always emits exactly one row (min=null, count=0 on
        # empty input), so the 0-estimate row survives disjoint sketches
        agg = per_row.agg(
            F.min("ip").alias("__min_ip"), F.count(F.lit(1)).alias("__rows")
        )
        return agg.select(est.alias("join_size_est"))
    universe = (
        cells_a.select(*group_cols).union(cells_b.select(*group_cols)).distinct()
    )
    agg = per_row.groupBy(*group_cols).agg(
        F.min("ip").alias("__min_ip"), F.count(F.lit(1)).alias("__rows")
    )
    return universe.join(agg, group_cols, "left").select(
        *group_cols, est.alias("join_size_est")
    )


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


# ---------------------------------------------------------------------------
# Bloom filter — runtime semi-join pruning in pure column algebra
# ---------------------------------------------------------------------------

BLOOM_M_BITS = 1 << 16  # 65536 bits = 1024 longs ≈ 8 KiB broadcast
BLOOM_K = 5             # ~3% FP at 5k keys / 64k bits; FPs are join-removed

# element_at masks for single-bit tests: shiftleft's shift argument must
# be a literal in the DataFrame API, so bit j is selected from a 64-entry
# literal array instead (1 << 63 wraps to long min — that IS bit 63)
_BIT_MASKS = [1 << j for j in range(63)] + [-(1 << 63)]


def _bloom_positions(col: Column, k: int, m_bits: int) -> list[Column]:
    """k engine-deterministic bit positions: xxhash64 over (salt, key)."""
    return [F.pmod(F.xxhash64(F.lit(i), col), F.lit(m_bits)) for i in range(k)]


def bloom_bitmap(
    keys: DataFrame,
    key_col: str,
    k: int = BLOOM_K,
    m_bits: int = BLOOM_M_BITS,
) -> list[int]:
    """Build a Bloom bitmap over a key set as ``m_bits/64`` longs.

    The per-word BIT_OR aggregate is map-side combined, so the shuffle
    carries ≤ partitions × m_bits/64 rows no matter how many keys go in;
    the driver collect is bounded by the CONSTANT word count (1024 at the
    default m) — this list is exactly the broadcast object a cluster-side
    runtime filter ships. Spark's own bloom_filter_agg is not SQL-exposed
    in this build; this is the same construction in engine-portable
    column algebra (the HLL-register discipline applied to membership)."""
    pos = F.explode(
        F.array(*_bloom_positions(F.col(key_col), k, m_bits))
    ).alias("pos")
    masks = F.array(*[F.lit(m) for m in _BIT_MASKS])
    words = (
        keys.select(pos)
        .select(
            F.floor(F.col("pos") / 64).cast("int").alias("w"),
            F.element_at(masks, F.pmod(F.col("pos"), F.lit(64)).cast("int") + 1)
            .alias("bit"),
        )
        .groupBy("w")
        .agg(F.bit_or("bit").alias("word"))
        .collect()
    )
    bitmap = [0] * (m_bits // 64)
    for r in words:
        bitmap[r["w"]] = r["word"]
    return bitmap


def bloom_probe(
    col: Column,
    bitmap: list[int],
    k: int = BLOOM_K,
    m_bits: int = BLOOM_M_BITS,
) -> Column:
    """Membership predicate against a built bitmap — a scan-local filter
    (no join, no shuffle) that drops most non-matching fact rows BEFORE
    the join/exchange, the classic runtime semi-join reduction. May pass
    false positives (the downstream join removes them), never drops a
    true member."""
    words = F.array(*[F.lit(w) for w in bitmap])
    masks = F.array(*[F.lit(m) for m in _BIT_MASKS])
    cond = F.lit(True)
    for pos_expr in _bloom_positions(col, k, m_bits):
        pos = pos_expr
        word = F.element_at(words, F.floor(pos / 64).cast("int") + 1)
        mask = F.element_at(masks, F.pmod(pos, F.lit(64)).cast("int") + 1)
        cond = cond & (word.bitwiseAND(mask) != 0)
    return cond
