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
