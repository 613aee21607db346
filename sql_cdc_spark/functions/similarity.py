"""Embedding similarity: cosine top-k (brute force) and bucketed ANN.

Dot products run JVM-side via zip_with/aggregate over array<double> —
sequential, so the float result is bit-identical to DuckDB's
list_dot_product on the same data (both fold left-to-right). Cosines are
rounded to 6dp before thresholds/ordering to keep cross-engine hashes
stable regardless.

Scale notes (100 TB / billions of vectors):
- brute-force top-k against ONE query is a single scan + TakeOrdered —
  fine at any scale for ad-hoc queries.
- all-pairs work must be blocked first: `lsh_bucket` (sign-random-
  projection via deterministic per-dimension hash weights) turns the
  quadratic join into per-bucket joins. The bucket join is a shuffle on
  the bucket key; skewed buckets split by AQE.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def as_double_array(col: Column) -> Column:
    return F.transform(col, lambda x: x.cast("double"))


def dot(a: Column, b: Column) -> Column:
    """Sequential fold of elementwise products — order matches DuckDB's
    list_dot_product, so doubles agree bitwise."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, v: acc + v
    )


def norm(a: Column) -> Column:
    return F.sqrt(dot(a, a))


def cosine(a: Column, b: Column) -> Column:
    return F.round(dot(a, b) / (norm(a) * norm(b)), 6)


def topk_cosine(
    vectors: DataFrame,
    query: DataFrame,
    k: int = 10,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Brute-force cosine top-k: broadcast the 1-row query, scan, take
    ordered k with (cos desc, id asc) total ordering. Plans as
    TakeOrderedAndProject — per-partition heaps, no global sort."""
    q = F.broadcast(query.select(F.col(vec_col).alias("__qvec")))
    a = as_double_array(F.col(vec_col))
    b = as_double_array(F.col("__qvec"))
    return (
        vectors.crossJoin(q)
        .select(
            id_col,
            cosine(a, b).alias("cos_sim"),
        )
        .orderBy(F.col("cos_sim").desc(), F.col(id_col).asc())
        .limit(k)
    )


def ivf_assign(
    vectors: DataFrame,
    n_clusters: int = 16,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    seed: int = 42,
    fit_fraction: float | None = None,
):
    """IVF coarse quantizer: k-means fit on a SAMPLE, assignment over the
    full corpus (one map-side pass, no shuffle), returning (assignments
    DataFrame with `cluster`, fitted model). The inverted-file ANN shape:
    search probes only the query's nearest centroid(s) instead of the
    corpus.

    ``fit_fraction=None`` sizes the seeded Bernoulli sample to ~50 points
    per centroid — at billions of vectors the fit touches a vanishing
    fraction of the corpus instead of iterating k-means over all of it
    (the round-2 scale flaw); tiny corpora degrade to a full fit."""
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector

    feat = vectors.withColumn("__feat", array_to_vector(as_double_array(F.col(vec_col))))
    if fit_fraction is None:
        n = vectors.count()
        fit_fraction = min(1.0, (50.0 * n_clusters) / max(n, 1))
    fit_df = feat.sample(fraction=fit_fraction, seed=seed) if fit_fraction < 1.0 else feat
    model = KMeans(k=n_clusters, seed=seed, featuresCol="__feat", predictionCol="cluster").fit(
        fit_df
    )
    assigned = model.transform(feat).drop("__feat")
    return assigned, model


def ivf_topk(
    vectors: DataFrame,
    query_id: int,
    k: int = 10,
    n_clusters: int = 16,
    n_probe: int = 1,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    fit_fraction: float | None = None,
) -> DataFrame:
    """IVF ANN top-k: exact cosine within the query's n_probe nearest
    clusters only. n_probe trades recall for scan fraction (~n_probe/
    n_clusters of the corpus). Centroid ranking happens driver-side over
    exactly n_clusters vectors — O(k·dim), scale-independent."""
    import numpy as np

    assigned, model = ivf_assign(
        vectors, n_clusters, vec_col, id_col, fit_fraction=fit_fraction
    )
    centers = model.clusterCenters()
    qvec = np.array(
        vectors.filter(F.col(id_col) == query_id).select(vec_col).first()[0],
        dtype="float64",
    )

    def _cos(c):
        denom = (np.linalg.norm(c) * np.linalg.norm(qvec)) or 1.0
        return float(np.dot(c, qvec) / denom)

    probe = sorted(range(len(centers)), key=lambda i: -_cos(centers[i]))[:n_probe]
    q = F.broadcast(
        vectors.filter(F.col(id_col) == query_id).select(
            F.col(vec_col).alias("__qvec")
        )
    )
    a = as_double_array(F.col(vec_col))
    b = as_double_array(F.col("__qvec"))
    return (
        assigned.filter(F.col("cluster").isin(probe))
        .crossJoin(q)
        .select(id_col, "cluster", cosine(a, b).alias("cos_sim"))
        .orderBy(F.col("cos_sim").desc(), F.col(id_col).asc())
        .limit(k)
    )


PQ_M = 8       # subspaces
PQ_K = 16      # centroids per subspace codebook
PQ_ITERS = 15  # Lloyd iterations for the codebook fit


def _kmeans_np(X, k: int, seed: int, iters: int):
    """Seeded Lloyd k-means over a small numpy sample (the PQ codebook
    fit). Deterministic: seeded init, fixed iteration count, empty
    clusters keep their previous centroid."""
    import numpy as np

    rs = np.random.RandomState(seed)
    idx = rs.choice(len(X), size=min(k, len(X)), replace=False)
    C = X[idx].copy()
    if len(C) < k:  # degenerate tiny sample: pad by repeating
        C = np.vstack([C] * (k // len(C) + 1))[:k]
    for _ in range(iters):
        d = ((X[:, None, :] - C[None, :, :]) ** 2).sum(-1)
        a = d.argmin(1)
        for j in range(k):
            pts = X[a == j]
            if len(pts):
                C[j] = pts.mean(0)
    return C


def pq_codebooks(
    vectors: DataFrame,
    m: int = PQ_M,
    k: int = PQ_K,
    vec_col: str = "embedding",
    seed: int = 42,
    fit_fraction: float | None = None,
):
    """Product-quantization codebooks: split the vector into ``m``
    subspaces and fit a ``k``-centroid k-means per subspace on a seeded
    SAMPLE (sized ~50 points per centroid, like ivf_assign — the fit
    touches a vanishing corpus fraction at billions of vectors; the
    collect is bounded by construction, never corpus-sized). Returned
    centroids are snapped to INTEGER MICROS (round(c·1e6)) so encoding
    and ADC scoring downstream are exact int64 algebra — deterministic
    across partitionings and engines.

    Returns list of m int64 arrays of shape (k, dim/m)."""
    import numpy as np

    if fit_fraction is None:
        n = vectors.count()
        fit_fraction = min(1.0, (50.0 * k) / max(n, 1))
    sample = (
        vectors.select(vec_col).sample(fraction=fit_fraction, seed=seed)
        if fit_fraction < 1.0
        else vectors.select(vec_col)
    )
    X = np.array([r[0] for r in sample.collect()], dtype="float64")
    dim = X.shape[1]
    assert dim % m == 0, f"dim {dim} not divisible by m {m}"
    sub = dim // m
    return [
        np.round(_kmeans_np(X[:, mi * sub : (mi + 1) * sub], k, seed + mi, PQ_ITERS) * 1e6)
        .astype("int64")
        for mi in range(m)
    ]


def _vec_micros(vec_col: str) -> Column:
    return F.transform(
        F.col(vec_col), lambda x: F.round(x.cast("double") * 1e6).cast("long")
    )


def pq_encode(
    vectors: DataFrame,
    books,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """PQ encoding: each vector → m one-byte codes (argmin sub-centroid
    per subspace). The codebooks are embedded as integer literals and the
    argmin is min-struct column algebra over exact int64 squared
    distances (ties break on the lower code) — whole-stage codegen, one
    map-side pass, NO shuffle and no Python in the hot path. 64 floats
    become m=8 small ints: a ~32× memory compression of the corpus index,
    which is the entire point of PQ at the 100 TB scale."""
    m = len(books)
    k, sub = books[0].shape
    # two deliberate construction choices, both measured:
    # (1) each code column is ONE generated SQL string, not composed
    #     Column objects — the latter costs thousands of py4j round-trips
    #     (~14 s of pure driver overhead for m·k·sub terms);
    # (2) the codebook lives in DATA (a k×sub array literal folded with
    #     higher-order functions), not in unrolled code — an unrolled
    #     m·k·sub arithmetic expression overflows Janino's 64 KB method
    #     limit and silently drops the stage to interpreted mode. The
    #     fold keeps the expression tree tiny and the stage codegen'd.
    df = vectors.withColumn("__vm", _vec_micros(vec_col))

    def enc_sql(mi: int) -> str:
        cb = ", ".join(
            "array(" + ", ".join(f"{int(v)}L" for v in cent) + ")"
            for cent in books[mi]
        )
        return (
            f"array_min(zip_with(transform(array({cb}), cb -> "
            f"aggregate(zip_with(slice(__vm, {mi * sub + 1}, {sub}), cb, "
            f"(x, y) -> (x - y) * (x - y)), 0L, (a, v) -> a + v)), "
            f"sequence(0, {k - 1}), "
            f"(d, c) -> named_struct('d', d, 'c', c)))['c']"
        )

    return df.select(
        id_col, *[F.expr(enc_sql(mi)).alias(f"code{mi}") for mi in range(m)]
    )


def pq_adc_topk(
    vectors: DataFrame,
    query_id: int,
    k: int = 10,
    shortlist: int = 100,
    m: int = PQ_M,
    n_codes: int = PQ_K,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    fit_fraction: float | None = None,
) -> DataFrame:
    """PQ ANN top-k with asymmetric distance computation (ADC) and exact
    re-rank: the query stays UNquantized; per subspace a k-entry lookup
    table of exact int64 squared distances (query sub-vector → each
    sub-centroid) is built driver-side (m·k ints — scale-independent)
    and embedded as literals; each corpus vector's approximate distance
    is the sum of m array lookups on its codes. The ADC scan reads ONLY
    the (id, codes) index — never the float vectors — then the
    ``shortlist`` nearest by ADC are re-ranked with exact cosine against
    the full vectors (a broadcast-semi-joined slice). Both the ADC scan
    and the re-rank plan as TakeOrderedAndProject: per-partition heaps,
    no global sort. ``shortlist`` is the recall/IO knob: the full-vector
    fetch touches shortlist rows, not the corpus."""
    import numpy as np

    qrow = vectors.filter(F.col(id_col) == query_id).select(vec_col).first()
    if qrow is None:
        raise ValueError(
            f"query_id {query_id!r} not found in {id_col} — checked before "
            "the codebook fit so a bad id fails fast"
        )
    books = pq_codebooks(
        vectors, m, n_codes, vec_col, fit_fraction=fit_fraction
    )
    codes = pq_encode(vectors, books, vec_col, id_col)
    qm = np.round(np.array(qrow[0], dtype="float64") * 1e6).astype("int64")
    sub = len(qm) // m
    adist: Column | None = None
    for mi in range(m):
        qs = qm[mi * sub : (mi + 1) * sub]
        lut = [int(((qs - books[mi][c]) ** 2).sum()) for c in range(n_codes)]
        term = F.element_at(
            F.array(*[F.lit(v) for v in lut]), F.col(f"code{mi}") + 1
        )
        adist = term if adist is None else adist + term
    short = (
        codes.select(id_col, adist.alias("adc_dist"))
        .orderBy(F.col("adc_dist").asc(), F.col(id_col).asc())
        .limit(shortlist)
    )
    q = F.broadcast(
        vectors.filter(F.col(id_col) == query_id).select(
            F.col(vec_col).alias("__qvec")
        )
    )
    a = as_double_array(F.col(vec_col))
    b = as_double_array(F.col("__qvec"))
    return (
        vectors.join(F.broadcast(short.select(id_col)), id_col, "left_semi")
        .crossJoin(q)
        .select(id_col, cosine(a, b).alias("cos_sim"))
        .orderBy(F.col("cos_sim").desc(), F.col(id_col).asc())
        .limit(k)
    )


def lsh_bucket(vec: Column, n_bits: int = 8, dim: int = 64) -> Column:
    """Sign-random-projection LSH bucket id in [0, 2^n_bits): bit i is the
    sign of <v, h_i> where hyperplane h_i has deterministic pseudo-random
    weights w[i][d] = ((1 + i*dim + d) * 2654435761 mod 2^31) / 2^31 - 0.5
    (Knuth multiplicative hash — reproducible in any engine, no RNG).

    Near vectors share buckets with high probability; candidate pairs are
    then verified with exact cosine. This is the scale path for all-pairs
    similarity: the quadratic join becomes per-bucket joins.

    Weights are precomputed driver-side and embedded as literals: every
    value is a rational with denominator 2^31, hence exactly representable
    in float64 and bit-identical to DuckDB's integer-math evaluation."""
    v = as_double_array(vec)
    bucket = F.lit(0)
    for i in range(n_bits):
        weights = F.array(
            *[
                F.lit((1 + i * dim + d) * 2654435761 % 2147483648 / 2147483648.0 - 0.5)
                for d in range(dim)
            ]
        )
        proj = F.aggregate(
            F.zip_with(v, weights, lambda x, w: x * w),
            F.lit(0.0),
            lambda acc, val: acc + val,
        )
        bucket = bucket + F.when(proj > 0, F.lit(1 << i)).otherwise(F.lit(0))
    return bucket


def assign_to_centroids(base: DataFrame, cents: dict[int, list[int]]) -> DataFrame:
    """Scan-local nearest-centroid assignment in the integer-micro
    domain — the ONE E-step expression shared by the registered
    sim_kmeans_step query and the full kmeans_train loop
    (operators/iterative.py), so the two cannot drift by edit. ``base``
    is (vec_id, mv: array<long>); centroids are baked as literals, so
    assignment is one scan: per-row argmin over the k candidates via
    least(struct(dist², cluster)) with the ‖x‖² − 2x·c + ‖c‖²
    decomposition (‖c‖² folds at plan-build time). Returns (vec_id, mv,
    b: struct(d, c))."""
    assert len(cents) >= 2, "nearest-centroid assignment needs k >= 2"
    x2 = F.aggregate(
        F.transform("mv", lambda v: v * v),
        F.lit(0).cast("long"),
        lambda acc, v: acc + v,
    )
    cands = []
    for cid in sorted(cents):
        cv = cents[cid]
        c2 = sum(v * v for v in cv)
        dot = F.aggregate(
            F.zip_with(
                "mv",
                F.array(*[F.lit(v).cast("long") for v in cv]),
                lambda a, b: a * b,
            ),
            F.lit(0).cast("long"),
            lambda acc, v: acc + v,
        )
        cands.append(
            F.struct(
                (F.col("x2") - 2 * dot + F.lit(c2).cast("long")).alias("d"),
                F.lit(cid).cast("long").alias("c"),
            )
        )
    return base.withColumn("x2", x2).select(
        "vec_id", "mv", F.least(*cands).alias("b")
    )


def power_step(base: DataFrame, seed: list[int]) -> DataFrame:
    """One y = Xᵀ(X·v) pass over an integer-quantized embedding frame —
    the ONE step expression shared by the registered sim_power_iteration
    query and the converging power_iteration driver
    (operators/iterative.py). ``base`` is (vec_id, mv: array<long>);
    the seed bakes as a literal array so the dot is scan-local; the only
    exchange is the |dims|-group aggregate. Returns (pos, y) with pos
    0-indexed."""
    dot = F.aggregate(
        F.zip_with(
            "mv",
            F.array(*[F.lit(v).cast("long") for v in seed]),
            lambda a, b: a * b,
        ),
        F.lit(0).cast("long"),
        lambda acc, v: acc + v,
    )
    return (
        base.select(F.posexplode("mv").alias("pos", "x"), dot.alias("dot"))
        .groupBy("pos")
        .agg(F.sum(F.col("dot") * F.col("x")).alias("y"))
    )
