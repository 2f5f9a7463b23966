"""Similarity search over embedding columns (array<float>).

Baseline: brute-force cosine top-k — one scan, JVM-side fold for the
dot product, TakeOrderedAndProject for the top-k (no full sort).

Scale path: IVF (inverted file) — k-means centroids fitted on a driver
sample, assignment broadcast as literal expressions, search restricted
to the nprobe nearest centroid partitions. At 100 TB the assignment
step is a narrow map (no shuffle) and the search only scans the probed
clusters' partitions.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def _norm(a: Column) -> Column:
    return F.sqrt(F.aggregate(a, F.lit(0.0), lambda acc, x: acc + x * x))


def cosine_col(a: Column, b: Column) -> Column:
    """Cosine similarity of two array columns, computed in double with a
    strict left fold (deterministic summation order)."""
    a = a.cast("array<double>")
    b = b.cast("array<double>")
    return _dot(a, b) / (_norm(a) * _norm(b))


def brute_force_topk(
    df: DataFrame,
    vec_col: str,
    query: list[float],
    k: int = 10,
    id_col: str = "id",
) -> DataFrame:
    """Exact top-k by cosine vs a literal query vector.

    sort+limit fuses into TakeOrderedAndProject: each partition keeps a
    k-heap, the driver merges — no global sort at any scale.
    """
    q = F.array(*[F.lit(float(x)) for x in query]).cast("array<double>")
    return (
        df.select(
            F.col(id_col),
            cosine_col(F.col(vec_col), q).alias("cosine"),
        )
        .orderBy(F.col("cosine").desc(), F.col(id_col))
        .limit(k)
    )


def near_dup_pairs(
    df: DataFrame,
    vec_col: str,
    threshold: float = 0.9,
    id_col: str = "id",
    bucket_bits: int = 0,
) -> DataFrame:
    """Embedding near-duplicate pairs with cosine >= threshold.

    bucket_bits=0 is the exact O(n^2/2) self-join baseline (fine to a few
    million rows with AQE); bucket_bits>0 adds random-hyperplane LSH
    buckets so only same-bucket pairs are compared (approximate recall,
    exact precision).
    """
    import random

    base = df.select(F.col(id_col).alias("_id"), F.col(vec_col).alias("_v"))
    if bucket_bits > 0:
        rng = random.Random(42)
        dim = len(base.select(F.size("_v")).first() and base.select("_v").first()[0])
        bucket = F.lit(0)
        for j in range(bucket_bits):
            plane = [rng.gauss(0, 1) for _ in range(dim)]
            p = F.array(*[F.lit(float(x)) for x in plane]).cast("array<double>")
            bucket = bucket + F.when(_dot(F.col("_v").cast("array<double>"), p) > 0,
                                     F.lit(2 ** j)).otherwise(F.lit(0))
        base = base.withColumn("_bkt", bucket)
        cond = (F.col("a._id") < F.col("b._id")) & (F.col("a._bkt") == F.col("b._bkt"))
    else:
        cond = F.col("a._id") < F.col("b._id")
    a, b = base.alias("a"), base.alias("b")
    return (
        a.join(b, cond)
        .select(
            F.col("a._id").alias("id1"),
            F.col("b._id").alias("id2"),
            cosine_col(F.col("a._v"), F.col("b._v")).alias("cosine"),
        )
        .filter(F.col("cosine") >= threshold)
    )


# --------------------------------------------------------------------- #
# IVF: sample -> driver k-means -> broadcast centroids -> probe clusters
# --------------------------------------------------------------------- #
def ivf_build(
    df: DataFrame,
    vec_col: str,
    n_clusters: int = 16,
    sample: int = 10_000,
    iters: int = 10,
    id_col: str = "id",
):
    """Fit centroids on a driver sample (numpy k-means), return
    (assigned_df, centroids). assigned_df adds a `_cluster` column via a
    broadcast argmin expression — a narrow map, no shuffle; persist or
    re-partition by `_cluster` downstream to co-locate clusters."""
    import numpy as np

    rows = (
        df.select(vec_col).limit(sample).collect()
    )
    X = np.array([r[0] for r in rows], dtype="float64")
    rng = np.random.RandomState(42)
    cents = X[rng.choice(len(X), size=min(n_clusters, len(X)), replace=False)]
    for _ in range(iters):
        d2 = ((X[:, None, :] - cents[None, :, :]) ** 2).sum(-1)
        lab = d2.argmin(1)
        for c in range(len(cents)):
            pts = X[lab == c]
            if len(pts):
                cents[c] = pts.mean(0)
    centroids = [list(map(float, c)) for c in cents]

    v = F.col(vec_col).cast("array<double>")
    dists = [
        _dot(v, v)
        - 2 * _dot(v, F.array(*[F.lit(x) for x in c]).cast("array<double>"))
        for c in centroids
    ]  # ||v-c||^2 up to the constant ||c||^2, corrected below
    dists = [
        d + F.lit(sum(x * x for x in c)) for d, c in zip(dists, centroids)
    ]
    best = F.lit(0)
    best_d = dists[0]
    for i in range(1, len(dists)):
        cond = dists[i] < best_d
        best = F.when(cond, F.lit(i)).otherwise(best)
        best_d = F.when(cond, dists[i]).otherwise(best_d)
    assigned = df.withColumn("_cluster", best)
    return assigned, centroids


def ivf_topk(
    assigned: DataFrame,
    centroids: list[list[float]],
    vec_col: str,
    query: list[float],
    k: int = 10,
    nprobe: int = 4,
    id_col: str = "id",
) -> DataFrame:
    """Approximate top-k: scan only the nprobe clusters nearest the query."""
    import numpy as np

    q = np.array(query, dtype="float64")
    C = np.array(centroids, dtype="float64")
    order = (((C - q) ** 2).sum(1)).argsort()[:nprobe].tolist()
    probed = assigned.filter(F.col("_cluster").isin(order))
    return brute_force_topk(probed, vec_col, query, k, id_col)
