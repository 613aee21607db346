"""Iterative distributed algorithms — the full loops whose single-step
bodies are registered, oracle-gated queries (sim_pagerank_step,
sim_kmeans_step, sim_power_iteration). The registry pins one exact
iteration against DuckDB; these drivers compose that iteration to a
fixpoint, the Pregel-without-Pregel pattern dup_clusters established:

- every round is declarative DataFrame work (one join + one aggregate,
  or one scan + one aggregate) — the engine stays fully distributed;
- the driver holds only BOUNDED state between rounds (a per-round delta
  scalar, a k-row centroid table, a |dims|-length direction vector),
  never corpus-scale data;
- ``localCheckpoint`` truncates lineage each round so iteration k does
  not replan k rounds deep, and superseded snapshots are released
  eagerly (the dup_clusters discipline).

All arithmetic stays in the step operators' integer domains (ppm rank
mass, micro centroids, milli vector elements), so every round — and
therefore the whole trajectory — is bit-deterministic on any engine and
recomputable row-for-row in plain Python.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from sql_cdc_spark.functions import similarity as SIM
from sql_cdc_spark.functions.dedup import release_local_checkpoint

# the loop bodies ARE the registered step queries, so the constants are
# imported from them, never re-declared — retuning a step constant
# retunes its driver with it
from sql_cdc_spark.queries.similarity_q import (
    POWER_SEED_ID,
    POWER_UNIT,
    PR_DAMPING_PCT,
    PR_RANK_UNIT,
    _emb_micro,
    kmeans_stats,
    kmeans_update,
    pagerank_round,
)

__all__ = ["pagerank", "kmeans_train", "power_iteration"]


def pagerank(
    edges: DataFrame,
    max_iters: int = 20,
    damping_pct: int = PR_DAMPING_PCT,
    stats: dict | None = None,
) -> DataFrame:
    """Full PageRank over an undirected edge list (id_a, id_b) →
    (node, degree, rank_ppm). Iteration 1 is exactly the registered
    sim_pagerank_step recurrence (rank' = floor((100−d)%·unit) +
    floor(d%·inflow) with floor-division contributions), looped to the
    integer fixpoint: stop when a round moves zero rank mass, when the
    dynamics enter a 2-CYCLE (VERDICT r7 #8 — integer floor divisions
    can oscillate A→B→A forever instead of fixing), or after
    ``max_iters``. The returned state is the last round's.

    The 2-cycle test is a STATE checksum compared two rounds apart
    (bit_xor of per-node (node, rank_ppm) hashes, computed in the same
    aggregate as the delta — no extra pass): sig(t) == sig(t−2) with
    delta > 0 certifies the state genuinely revisited itself, so
    ``two_cycle`` in stats means what it says. The previous rule,
    delta(t) == delta(t−2), also fired on converging runs whose L1
    deltas merely plateau for three rounds (ADVICE r8 — the 100×
    dynamics decay geometrically and plateau long before fixing, so
    the flag mislabeled slow convergence as cycling and returned a
    pre-fixpoint state).

    Per round: one shuffle-hash join (ranks are one-row-per-node and
    corpus-scale — the documented broadcast-abort band) + one inflow
    aggregate. The driver reads one scalar per round.

    The rank update is a LEFT join with coalesce(inflow, 0): on the
    internally-symmetrized graph every node with an edge always
    receives inflow, but the function is public and accepts any
    (id_a, id_b) frame — a caller-supplied shape where a node can
    receive zero inflow rows must decay that node to base rank, not
    silently drop it from the result (ADVICE r6).

    ``stats``, if a dict, receives {'rounds': executed round count,
    'last_delta': the final L1 delta, 'two_cycle': whether the 2-cycle
    stop fired} — the fixpoint telemetry the bench's graph_100x block
    records."""
    rounds, delta, two_cycle = 0, 0, False
    sigs: list[int] = []
    und = (
        edges.select(F.col("id_a").alias("src"), F.col("id_b").alias("dst"))
        .unionByName(
            edges.select(F.col("id_b").alias("src"), F.col("id_a").alias("dst"))
        )
        .persist()
    )
    deg = (
        und.groupBy("src")
        .agg(F.count(F.lit(1)).alias("degree"))
        .persist()
    )
    snap = deg.select(
        F.col("src").alias("node"),
        "degree",
        F.lit(PR_RANK_UNIT).cast("long").alias("rank_ppm"),
    ).localCheckpoint()
    ranks = snap
    for _ in range(max_iters):
        # the round body is the shared queries/similarity_q.pagerank_round
        # expression — also the unroll body of the registered
        # sim_pagerank_fixed3, so the driver-checked chain and this
        # fixpoint loop cannot drift by edit
        nxt = pagerank_round(
            und, ranks, damping_pct,
            extra=(F.col("rank_ppm").alias("__prev"),),
        ).localCheckpoint()
        delta, sig = nxt.agg(
            F.sum(F.abs(F.col("rank_ppm") - F.col("__prev"))),
            F.bit_xor(F.xxhash64("node", "rank_ppm")),
        ).first()
        release_local_checkpoint(snap)
        snap = nxt
        ranks = nxt.drop("__prev")
        rounds += 1
        # SUM over zero rows is None, not 0 — an empty/degenerate graph
        # must stop after one round, not burn max_iters empty rounds
        if not delta:
            break
        sigs.append(int(sig))
        # 2-cycle stop: the state checksum revisits itself two rounds
        # apart while still moving mass — A→B→A confirmed on the STATE,
        # not inferred from a delta plateau (ADVICE r8); graph_100x
        # measured the dynamics burning the whole 20-round budget in a
        # stable 2-cycle before this stop existed
        if len(sigs) >= 3 and sigs[-1] == sigs[-3]:
            two_cycle = True
            break
    und.unpersist()
    deg.unpersist()
    if stats is not None:
        stats["rounds"] = rounds
        stats["last_delta"] = int(delta or 0)
        stats["two_cycle"] = two_cycle
    return ranks


def kmeans_train(
    emb: DataFrame, k: int = 8, n_iters: int = 5
) -> tuple[DataFrame, list[int]]:
    """Full Lloyd's k-means in the integer-micro domain → (assignments
    (vec_id, cluster_id), per-round inertia list). Each round is the
    SHARED kmeans_stats / kmeans_update bodies (queries/similarity_q)
    that also compose the registered sim_kmeans_step report and the
    fixed-depth sim_kmeans_fixed chain — drift-proof by reference:
    centroids baked as literals so assignment is scan-local
    least(struct(dist², cluster)); the M-step centroid is the
    element-wise floor(Σx / n) — an exact integer division, so the
    whole trajectory is engine-independent. Seeds are the vectors with
    vec_id < k (the step operator's convention).

    Per round: one corpus scan + one k-group aggregate; the driver
    holds k centroid arrays (bounded). Empty clusters keep their
    previous centroid."""
    assert k >= 2, "kmeans_train needs k >= 2"
    assert n_iters >= 1, "kmeans_train needs at least one round"
    base = _emb_micro(emb).persist()
    seed_rows = base.filter(F.col("vec_id") < k).collect()
    cents = {int(r["vec_id"]): [int(v) for v in r["mv"]] for r in seed_rows}
    assert len(cents) == k, f"need vec_id 0..{k - 1} as seeds"
    inertia_by_round: list[int] = []
    last_cents = cents
    for _ in range(n_iters):
        last_cents = cents
        stats = kmeans_stats(base, cents).collect()
        inertia_by_round.append(sum(int(r["inertia"]) for r in stats))
        cents = kmeans_update(cents, stats)
    # assignments under the final round's ENTERING centroids (the ones
    # that produced the last inertia reading); materialized BEFORE
    # unpersisting base so no caller ever recomputes the scan after the
    # cache is gone
    out = SIM.assign_to_centroids(base, last_cents).select(
        "vec_id", F.col("b.c").alias("cluster_id")
    ).localCheckpoint()
    base.unpersist()
    return out, inertia_by_round


def power_iteration(
    emb: DataFrame, n_iters: int = 10, unit: int = POWER_UNIT
) -> tuple[list[int], list[float]]:
    """Converging power iteration toward the corpus's dominant embedding
    direction → (final integer direction vector at scale ``unit``,
    per-round cosines with the previous direction). Each round is the
    registered sim_power_iteration body (y = Xᵀ(X·v), scan-local dot
    against a literal v, one |dims|-row aggregate); the re-normalization
    v' = round(y·unit / ‖y‖) happens DRIVER-side on the collected
    |dims|-length y — exact integers in, one deterministic float sqrt,
    so the whole trajectory is recomputable in plain Python.

    ‖v‖ ≈ unit keeps the milli-domain overflow budget of the step
    operator: |x|≤0.53·unit', per-row term ≤ dims·(0.53·1e3)²·1e3."""
    base = emb.select("vec_id", F.transform(
        F.col("embedding"),
        lambda x: F.round(x.cast("double") * unit).cast("long"),
    ).alias("mv")).persist()
    first = base.filter(F.col("vec_id") == POWER_SEED_ID).first()
    assert first is not None, "power-iteration seed vector (vec_id 0) missing"
    v = [int(x) for x in first["mv"]]
    dims = len(v)
    cosines: list[float] = []
    for _ in range(n_iters):
        # the step is the shared expression the registered
        # sim_power_iteration query also plans — drift-proof by reference
        rows = SIM.power_step(base, v).collect()
        y = [0] * dims
        for r in rows:
            y[int(r["pos"])] = int(r["y"])
        norm = math.sqrt(sum(e * e for e in y))
        assert norm > 0, "degenerate corpus: y vanished"
        v_new = [
            math.floor(e * unit / norm + 0.5)
            if e >= 0
            else -math.floor(-e * unit / norm + 0.5)
            for e in y
        ]
        na = math.sqrt(sum(e * e for e in v))
        nb = math.sqrt(sum(e * e for e in v_new))
        cosines.append(
            sum(a * b for a, b in zip(v, v_new)) / (na * nb)
        )
        v = v_new
    base.unpersist()
    return v, cosines
