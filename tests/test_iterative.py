"""Iterative-algorithm drivers (operators/iterative.py): each loop's
round 1 must equal its registered step operator, and the whole
trajectory must be bit-recomputable in plain Python — the integer
domains make 'the distributed loop did exactly what the algorithm says'
a checkable equality, not a tolerance."""

import math

import pytest
from pyspark.sql import functions as F

from sql_cdc_spark import tables
from sql_cdc_spark.operators import iterative as IT
from tests.conftest import SF_DIR_SMALL


def _nn_edges(spark):
    """The symmetrized top-1-NN edge set sim_pagerank_step builds."""
    from sql_cdc_spark.queries.similarity_q import knn_join

    best = knn_join(tables.load(spark, SF_DIR_SMALL, "embeddings"))
    return (
        best.select(
            F.least("vec_id", "nn_id").alias("id_a"),
            F.greatest("vec_id", "nn_id").alias("id_b"),
        )
        .distinct()
    )


def _py_pagerank(edges, max_iters, damping_pct=85):
    deg, adj = {}, {}
    for a, b in edges:
        deg[a] = deg.get(a, 0) + 1
        deg[b] = deg.get(b, 0) + 1
        adj.setdefault(a, []).append(b)
        adj.setdefault(b, []).append(a)
    unit = IT.PR_RANK_UNIT
    base = unit * (100 - damping_pct) // 100
    rank = {n: unit for n in deg}
    states = []
    for _ in range(max_iters):
        inflow = {n: 0 for n in deg}
        for n, r in rank.items():
            c = r // deg[n]
            for m in adj[n]:
                inflow[m] += c
        nxt = {n: base + damping_pct * inflow[n] // 100 for n in deg}
        delta = sum(abs(nxt[n] - rank[n]) for n in deg)
        rank = nxt
        if delta == 0:
            break
        states.append(dict(rank))
        # the driver's STATE-cycle stop (VERDICT r7 #8 / ADVICE r8),
        # mirrored exactly: the state revisits itself two rounds apart
        if len(states) >= 3 and states[-1] == states[-3]:
            break
    return deg, rank


@pytest.mark.slow
def test_pagerank_round1_equals_registered_step(spark):
    from sql_cdc_spark.queries.similarity_q import sim_pagerank_step

    edges = _nn_edges(spark)
    got = {
        r.node: (r.degree, r.rank_ppm)
        for r in IT.pagerank(edges, max_iters=1).collect()
    }
    top = sim_pagerank_step(spark, SF_DIR_SMALL).collect()
    assert top
    for r in top:
        assert got[r.vec_id] == (r.degree, r.rank_ppm)


@pytest.mark.slow
def test_pagerank_trajectory_matches_python(spark):
    edges_df = _nn_edges(spark)
    edges = [(r.id_a, r.id_b) for r in edges_df.collect()]
    deg, want = _py_pagerank(edges, max_iters=7)
    got = {
        r.node: (r.degree, r.rank_ppm)
        for r in IT.pagerank(edges_df, max_iters=7).collect()
    }
    assert got == {n: (deg[n], want[n]) for n in deg}


@pytest.mark.slow
def test_pagerank_fixed3_equals_driver_at_depth3(spark):
    """The registered fixed-depth unroll (sim_pagerank_fixed3) and the
    fixpoint driver must agree at depth 3 — both compose the SAME
    pagerank_round body, and this pins that the unrolled declarative
    chain and the localCheckpoint loop produce identical integer state
    (integer dynamics cannot stop early in 3 rounds unless the delta is
    genuinely zero, in which case the states agree too)."""
    from sql_cdc_spark.queries.similarity_q import (
        PR_TOPN,
        sim_pagerank_fixed3,
    )

    fixed = [
        (r.vec_id, r.degree, r.rank_ppm)
        for r in sim_pagerank_fixed3(spark, SF_DIR_SMALL).collect()
    ]
    loop = (
        IT.pagerank(_nn_edges(spark), max_iters=3)
        .orderBy(F.desc("rank_ppm"), F.asc("node"))
        .limit(PR_TOPN)
        .collect()
    )
    assert fixed == [(r.node, r.degree, r.rank_ppm) for r in loop]


@pytest.mark.slow
def test_kmeans_fixed_report_matches_trainer_round3(spark):
    """The registered fixed-depth chain (sim_kmeans_fixed) and the
    fixpoint trainer share kmeans_stats/kmeans_update by reference;
    pin the composition: the chain's round-3 inertia total must equal
    kmeans_train's third per-round inertia reading (both are the
    E-step measurement under the same twice-updated centroids)."""
    from sql_cdc_spark.queries.similarity_q import sim_kmeans_fixed

    report = sim_kmeans_fixed(spark, SF_DIR_SMALL).collect()
    emb = tables.load(spark, SF_DIR_SMALL, "embeddings")
    _, inertia = IT.kmeans_train(emb, k=8, n_iters=3)
    assert sum(int(r.inertia) for r in report) == inertia[2]


def test_kmeans_train_matches_python(spark):
    emb = tables.load(spark, SF_DIR_SMALL, "embeddings")
    rows = emb.select("vec_id", "embedding").collect()

    def q(x):
        v = float(x) * 1e6
        return math.floor(v + 0.5) if v >= 0 else math.ceil(v - 0.5)

    vecs = {int(r.vec_id): [q(x) for x in r.embedding] for r in rows}
    k, n_iters = 4, 3
    cents = {i: list(vecs[i]) for i in range(k)}
    inertia_rounds = []
    assign = {}
    for _ in range(n_iters):
        sums = {c: [0] * 64 for c in cents}
        cnt = {c: 0 for c in cents}
        inertia = 0
        for vid, x in vecs.items():
            best = min(
                (
                    sum((a - b) ** 2 for a, b in zip(x, cents[c])),
                    c,
                )
                for c in cents
            )
            assign[vid] = best[1]
            inertia += best[0]
            cnt[best[1]] += 1
            s = sums[best[1]]
            for d in range(64):
                s[d] += x[d]
        inertia_rounds.append(inertia)
        for c in cents:
            if cnt[c]:
                cents[c] = [sums[c][d] // cnt[c] for d in range(64)]
    got_df, got_inertia = IT.kmeans_train(emb, k=k, n_iters=n_iters)
    got = {r.vec_id: r.cluster_id for r in got_df.collect()}
    assert got == assign
    assert got_inertia == inertia_rounds
    # Lloyd with exact assignment should not increase inertia here
    assert got_inertia[-1] <= got_inertia[0]


def test_power_iteration_matches_python_and_stabilizes(spark):
    emb = tables.load(spark, SF_DIR_SMALL, "embeddings")
    rows = emb.select("vec_id", "embedding").collect()
    unit = 1_000

    def q(x):
        v = float(x) * unit
        return math.floor(v + 0.5) if v >= 0 else math.ceil(v - 0.5)

    vecs = {int(r.vec_id): [q(x) for x in r.embedding] for r in rows}
    v = list(vecs[0])
    cosines = []
    for _ in range(8):
        y = [0] * 64
        for x in vecs.values():
            dot = sum(a * b for a, b in zip(x, v))
            for d in range(64):
                y[d] += dot * x[d]
        norm = math.sqrt(sum(e * e for e in y))
        v_new = [
            math.floor(e * unit / norm + 0.5)
            if e >= 0
            else -math.floor(-e * unit / norm + 0.5)
            for e in y
        ]
        na = math.sqrt(sum(e * e for e in v))
        nb = math.sqrt(sum(e * e for e in v_new))
        cosines.append(sum(a * b for a, b in zip(v, v_new)) / (na * nb))
        v = v_new
    got_v, got_cos = IT.power_iteration(emb, n_iters=8, unit=unit)
    assert got_v == v
    assert got_cos == cosines
    # the direction stabilizes: successive rounds end nearly parallel
    # and closer than they started (the eigengap here is modest, so the
    # bound is loose; exactness is pinned by the recompute above)
    assert got_cos[-1] > 0.99
    assert got_cos[-1] > got_cos[0]


def test_bpe_train_matches_python(spark):
    """functions/text.py::bpe_train: the learned merge table (pair +
    count per round) and EVERY document's final token sequence must
    equal a plain-Python BPE trainer run with the same tokenization,
    election tiebreak, and left-to-right non-overlapping merge rule."""
    import re

    from sql_cdc_spark.functions.text import BPE_RE, bpe_train

    docs = tables.load(spark, SF_DIR_SMALL, "documents").select(
        "doc_id", "text"
    )
    # re.ASCII: Java regex \s (the Spark side) is ASCII-only, Python's
    # is Unicode-wide — without the flag a U+00A0 in the corpus splits
    # the two tokenizations and the parity claim silently narrows
    corpus = {
        int(r.doc_id): re.findall(BPE_RE, r.text.lower(), flags=re.ASCII)
        for r in docs.collect()
    }
    n_merges = 5
    py_merges = []
    for _ in range(n_merges):
        census: dict[tuple, int] = {}
        for t in corpus.values():
            for a, b in zip(t, t[1:]):
                census[(a, b)] = census.get((a, b), 0) + 1
        if not census:
            break
        (left, right), n = min(
            census.items(), key=lambda kv: (-kv[1], kv[0])
        )
        if n < 2:
            break
        py_merges.append((left, right, n))
        for did, t in corpus.items():
            out, pend = [], None
            for tok in t:
                if pend is None:
                    pend = tok
                elif pend == left and tok == right:
                    out.append(left + right)
                    pend = None
                else:
                    out.append(pend)
                    pend = tok
            if pend is not None:
                out.append(pend)
            corpus[did] = out

    merges, toks = bpe_train(docs, n_merges=n_merges)
    assert merges == py_merges
    got = {int(r.doc_id): list(r.t) for r in toks.collect()}
    assert got == corpus
    # the loop genuinely rewrote the corpus: every learned merge token
    # exists somewhere in the final sequences
    final_vocab = {tok for t in got.values() for tok in t}
    assert all(left + right in final_vocab for left, right, _ in merges)


def test_bpe_encode_equals_training_corpus_and_is_shuffle_free(spark):
    """bpe_encode with the learned table reproduces the training loop's
    final token sequences exactly, and the encode plan contains ZERO
    exchanges — the deploy-inside-ingest property."""
    from sql_cdc_spark.functions.text import bpe_encode, bpe_train
    from sql_cdc_spark.plans import plan_flags

    docs = tables.load(spark, SF_DIR_SMALL, "documents").select(
        "doc_id", "text"
    )
    merges, trained = bpe_train(docs, n_merges=4)
    assert merges
    enc = bpe_encode(docs, merges)
    assert plan_flags(enc).exchanges == 0
    got = {int(r.doc_id): list(r.t) for r in enc.collect()}
    want = {int(r.doc_id): list(r.t) for r in trained.collect()}
    assert got == want

@pytest.mark.slow
def test_pagerank_two_cycle_stop_fires_and_state_matches_python(spark):
    """VERDICT r7 #8: integer PageRank dynamics can enter a stable
    2-cycle and previously burned the whole round budget; the driver
    must detect delta(t) == delta(t−2) and stop, reporting it in
    stats — and the state at the stop round must still be the exact
    Python recompute (the stop changes WHEN we stop, never the
    per-round arithmetic). The fixture graph is a measured 2-cycler
    (deltas settle at ...4, 4, 4 from round 15)."""
    edges = [(0, 2), (0, 4), (0, 5), (1, 4), (3, 5)]
    edges_df = spark.createDataFrame(edges, "id_a long, id_b long")
    stats = {}
    got = {
        r.node: (r.degree, r.rank_ppm)
        for r in IT.pagerank(edges_df, max_iters=60, stats=stats).collect()
    }
    assert stats["two_cycle"] is True
    assert stats["rounds"] < 60
    assert stats["last_delta"] > 0
    deg, want = _py_pagerank(edges, max_iters=60)
    assert got == {n: (deg[n], want[n]) for n in deg}
    # the state really does 2-cycle: one more round returns to this state
    again = {
        r.node: (r.degree, r.rank_ppm)
        for r in IT.pagerank(
            edges_df, max_iters=stats["rounds"] + 2
        ).collect()
    }
    assert again == got


@pytest.mark.slow
def test_pagerank_plateau_is_not_flagged_as_two_cycle(spark):
    """ADVICE r8: the old delta(t) == delta(t−2) rule also fired on runs
    whose L1 deltas merely plateau for three rounds while the STATE is
    still moving, stopping early with a mislabeled two_cycle=True. On
    this fixture graph the deltas settle at 6,6,6,6 from round 24 with
    changing states (the old rule stops at round 26), and the genuine
    state 2-cycle only starts at round 28 — the checksum rule must ride
    through the plateau and stop exactly on the confirmed cycle."""
    edges = [(0, 3), (0, 4), (0, 7), (2, 4), (3, 7), (4, 5), (4, 7),
             (4, 8), (5, 8), (6, 8)]
    edges_df = spark.createDataFrame(edges, "id_a long, id_b long")

    # Python recompute with NO stop rule: locate where the old
    # delta-plateau rule would have fired vs the genuine state cycle
    deg, adj = {}, {}
    for a, b in edges:
        deg[a] = deg.get(a, 0) + 1
        deg[b] = deg.get(b, 0) + 1
        adj.setdefault(a, []).append(b)
        adj.setdefault(b, []).append(a)
    unit = IT.PR_RANK_UNIT
    base = unit * (100 - 85) // 100
    rank = {n: unit for n in deg}
    deltas, states = [], []
    old_stop = new_stop = None
    for t in range(60):
        inflow = {n: 0 for n in deg}
        for n, r in rank.items():
            c = r // deg[n]
            for m in adj[n]:
                inflow[m] += c
        nxt = {n: base + 85 * inflow[n] // 100 for n in deg}
        deltas.append(sum(abs(nxt[n] - rank[n]) for n in deg))
        rank = nxt
        states.append(dict(rank))
        if (
            old_stop is None
            and len(deltas) >= 3
            and deltas[-1] > 0
            and deltas[-1] == deltas[-3]
        ):
            old_stop = t + 1
        if len(states) >= 3 and states[-1] == states[-3]:
            new_stop = t + 1
            break
    assert old_stop is not None and new_stop is not None
    assert old_stop < new_stop, "fixture lost its plateau-before-cycle"
    assert states[old_stop - 1] != states[old_stop - 3], (
        "old rule fired on a plateau, not a cycle — fixture property"
    )

    stats = {}
    got = {
        r.node: r.rank_ppm
        for r in IT.pagerank(edges_df, max_iters=60, stats=stats).collect()
    }
    # the driver rode through the plateau to the genuine cycle…
    assert stats["two_cycle"] is True
    assert stats["rounds"] == new_stop
    # …and its state is the Python recompute at that round
    assert got == states[new_stop - 1]
