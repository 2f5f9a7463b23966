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
    bands: int = 32,
    band_bits: int = 4,
    seed: int = 42,
    exact: bool = False,
) -> DataFrame:
    """Embedding near-duplicate pairs with cosine >= threshold.

    Default (the 100 TB path): banded random-hyperplane LSH — two vectors
    are candidates iff they agree on all `band_bits` hyperplane signs in
    at least one of `bands` bands (same sub-quadratic shape as
    MinHash-LSH banding: explode to (band, bucket), equi-join on the
    bucket key, verify candidates with the exact cosine). Precision is
    exact (every output pair passes the real cosine test); recall is
    1-(1-p^band_bits)^bands with p = 1 - theta/pi, tuned by the band
    parameters — tests/test_llmops.py pins recall vs the exact baseline.

    exact=True is the O(n^2/2) all-pairs self-join baseline for tests
    and small inputs. Never the default: at 100 TB an all-pairs join is
    a cartesian-class scale killer.
    """
    import random

    base = df.select(F.col(id_col).alias("_id"), F.col(vec_col).alias("_v"))
    if exact:
        a, b = base.alias("a"), base.alias("b")
        return (
            a.join(b, F.col("a._id") < F.col("b._id"))
            .select(
                F.col("a._id").alias("id1"),
                F.col("b._id").alias("id2"),
                cosine_col(F.col("a._v"), F.col("b._v")).alias("cosine"),
            )
            .filter(F.col("cosine") >= threshold)
        )

    rng = random.Random(seed)
    # null vectors can never pass the cosine verify; drop them up front so
    # the dimension probe below can't land on a null row (TypeError)
    base = base.filter(F.col("_v").isNotNull())
    first = base.select("_v").first()
    if first is None or first[0] is None:
        return (
            base.select(
                F.col("_id").alias("id1"),
                F.col("_id").alias("id2"),
                F.lit(0.0).alias("cosine"),
            ).limit(0)
        )
    dim = len(first[0])
    v = F.col("_v").cast("array<double>")
    # all bands*band_bits hyperplanes as ONE literal tensor + nested
    # higher-order folds: the expression tree is O(1) in bands/bits
    # (unrolled per-band columns would be bands*bits copies of the dot
    # fold — the analyzer/codegen blowup measured on the minhash op)
    planes = F.array(*[
        F.array(*[
            F.array(*[F.lit(rng.gauss(0, 1)) for _ in range(dim)])
            for _ in range(band_bits)
        ])
        for _ in range(bands)
    ])

    def _band_sig(b):
        pb = F.element_at(planes, b + 1)
        return F.aggregate(
            F.sequence(F.lit(0), F.lit(band_bits - 1)),
            F.lit(0),
            lambda acc, j: acc
            + F.when(
                _dot(v, F.element_at(pb, j + 1)) > 0,
                F.call_function("shiftleft", F.lit(1), j),
            ).otherwise(F.lit(0)),
        )

    sig_arr = F.transform(F.sequence(F.lit(0), F.lit(bands - 1)), _band_sig)
    sig = base.withColumn("_sigs", sig_arr).select(
        "_id", "_v", "_sigs",
        F.posexplode(F.col("_sigs")).alias("_band", "_bkt"),
    )
    a, b = sig.alias("a"), sig.alias("b")
    # a duplicate-heavy corpus makes buckets hot: a tight cluster of m
    # near-identical vectors collides in ALL bands, so a post-join
    # dropDuplicates must sort bands*m^2/2 rows (measured: task-memory
    # spill death at m~2.5k, bands=32). Standard LSH fix: emit a pair
    # only from its FIRST colliding band — an in-join filter, so each
    # pair leaves the join exactly once and no dedup pass exists.
    first_collision = (
        F.array_position(
            F.zip_with(F.col("a._sigs"), F.col("b._sigs"), lambda x, y: x == y),
            F.lit(True),
        )
        - 1
    )
    cand = (
        a.join(
            b,
            (F.col("a._band") == F.col("b._band"))
            & (F.col("a._bkt") == F.col("b._bkt"))
            & (F.col("a._id") < F.col("b._id"))
            & (first_collision == F.col("a._band")),
        )
        .select(
            F.col("a._id").alias("id1"),
            F.col("b._id").alias("id2"),
            F.col("a._v").alias("_v1"),
            F.col("b._v").alias("_v2"),
        )
    )
    return (
        cand.select(
            "id1", "id2", cosine_col(F.col("_v1"), F.col("_v2")).alias("cosine")
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

    vecs = df.select(vec_col).filter(F.col(vec_col).isNotNull())
    # representative sample for the k-means fit: limit() would take the
    # FIRST partitions only (ordered/skewed data -> biased centroids ->
    # silent recall loss), so pay one count() job and sample() uniformly
    n = vecs.count()
    if n == 0:
        raise ValueError(f"ivf_build: no non-null vectors in '{vec_col}'")
    if n <= sample:
        rows = vecs.collect()
    else:
        # uniform sample; any trim back to `sample` happens DRIVER-side
        # with the RNG — a .limit() after sample() would take the first
        # partitions of the sampled stream, silently dropping the tail
        # partitions of partition-ordered data (round-5 ADVICE fix)
        frac = min(1.0, 1.5 * sample / n)
        rows = vecs.sample(fraction=frac, seed=42).collect()
        if not rows:  # pathological tiny-fraction draw
            rows = vecs.limit(sample).collect()
    X = np.array([r[0] for r in rows], dtype="float64")
    rng = np.random.RandomState(42)
    if len(X) > sample:
        X = X[rng.choice(len(X), size=sample, replace=False)]
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
