"""DSIR — Data Selection with Importance Resampling (Xie et al. 2023,
"Data Selection for Language Models via Importance Resampling").

Select raw-corpus documents that look like a small target domain:

1. **Features**: each document is a bag of hashed word n-grams
   (unigrams + bigrams in the paper) over ``buckets`` hash buckets.
2. **Importance**: fit bag-of-buckets categorical distributions
   ``p`` (target) and ``q`` (raw) with add-``smoothing`` estimation;
   a document's log importance weight is
   ``log w(x) = sum_b count_b(x) * (log p[b] - log q[b])``.
3. **Resample**: Gumbel-top-k over ``log w + Gumbel(0,1)`` draws k
   documents without replacement ~ importance weights (the paper's
   sampled-without-replacement variant).

Spark-first shape, sized for a 100 TB raw corpus:

* The raw corpus is only ever touched by narrow explodes and ONE
  groupBy per phase (bucket histogram; per-doc bucket counts).
* The bucket log-ratio table is exactly ``buckets`` rows (10^4–10^5) —
  always broadcast; the raw side is never shuffled for the join.
* The Gumbel noise is a pure column expression keyed on
  ``(id, seed)`` — deterministic, no ``rand()`` (resume/retry-safe
  across task re-execution, which nondeterministic rand is NOT).
* Top-k is ``orderBy(key).limit(k)`` — Spark plans TakeOrderedAndProject
  (per-partition heaps + single driver merge of k rows), no global sort.

``hash_fn='md5'`` makes bucketing bit-reproducible in DuckDB
(``('0x' || substr(md5(g),1,15))::BIGINT % buckets``) for the oracle
gate; the default xxhash64 path is the fast production one.
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from pycypher_nmetl_spark.llmops.lm import _grams, _toks

DEFAULT_BUCKETS = 10_000
# dsir_log_ratios collects the bucket histogram and re-emits it as a
# local relation when the bucket space is at most this big: 2M rows of
# three longs is ~50 MB on the driver, far above any published DSIR
# config (the paper uses 10^4) and far below driver limits. Above it
# the ratio table stays a lazy plan with window-derived totals.
_LOCAL_RATIO_MAX_BUCKETS = 2_000_000
# 2^53: the largest power of two where every integer fits in a double —
# uniform u = (h + 0.5) / 2^53 stays in (0, 1) exactly
_U53 = float(1 << 53)


def _gram_hash(g: Column, hash_fn: str) -> Column:
    if hash_fn == "md5":
        return F.conv(F.substring(F.md5(g), 1, 15), 16, 10).cast("long")
    if hash_fn == "xxhash64":
        return F.xxhash64(g)
    raise ValueError(f"hash_fn must be 'xxhash64' or 'md5', got {hash_fn!r}")


def _doc_buckets(
    df: DataFrame,
    text_col: str,
    buckets: int,
    hash_fn: str,
    *keep: str,
    outer: bool = False,
) -> DataFrame:
    """One row per (doc, n-gram occurrence) with its hash bucket —
    unigrams + bigrams, the paper's feature set. Narrow (explode only).

    ``outer=True`` keeps zero-gram documents (null/empty text) as a
    single ``bucket IS NULL`` row instead of dropping them — the weights
    path uses this so empty docs flow through the one aggregation pass
    rather than being resurrected by a second corpus scan + join."""
    t = _toks(text_col)
    grams = F.concat(_grams(t, 1), _grams(t, 2))
    expl = F.explode_outer(grams) if outer else F.explode(grams)
    out = df.select(*[F.col(c) for c in keep], expl.alias("_g"))
    return out.select(
        *keep, F.pmod(_gram_hash(F.col("_g"), hash_fn), F.lit(buckets)).alias("bucket")
    )


def dsir_log_ratios(
    target_df: DataFrame,
    raw_df: DataFrame,
    text_col: str,
    buckets: int = DEFAULT_BUCKETS,
    smoothing: float = 1.0,
    hash_fn: str = "xxhash64",
) -> DataFrame:
    """``(bucket, log_ratio)`` — log p_target[b] - log q_raw[b] with
    add-``smoothing`` estimates over ``buckets`` categories. At most
    ``buckets`` rows (absent buckets fall out of the join and score
    with the pure-smoothing ratio via the fill in :func:`dsir_weights`).

    ONE histogram pass: the two exploded gram streams are unioned with
    a target flag and aggregated by bucket in a single shuffle (the old
    per-corpus aggregates + full-outer join recomputed both corpora for
    every lazy reference — ``totals`` inside this function and the two
    references in :func:`dsir_weights` multiplied the corpus scan 8x).
    The bucket histogram is *bounded by construction* (``<= buckets``
    rows of three longs), so for any sane ``buckets`` it is collected
    and re-emitted as a local relation: totals become literals and every
    downstream reference — the zero-ratio scalar, the broadcast join,
    resampling — is free instead of a full corpus re-aggregation."""
    if buckets < 2:
        raise ValueError(f"buckets must be >= 2, got {buckets}")
    if smoothing <= 0:
        raise ValueError(f"smoothing must be > 0, got {smoothing}")
    s = float(smoothing)
    flagged = (
        _doc_buckets(target_df, text_col, buckets, hash_fn)
        .select("bucket", F.lit(1).alias("_t"))
        .unionByName(
            _doc_buckets(raw_df, text_col, buckets, hash_fn).select(
                "bucket", F.lit(0).alias("_t")
            )
        )
    )
    hist = flagged.groupBy("bucket").agg(
        F.sum("_t").alias("tc"),
        (F.count(F.lit(1)) - F.sum("_t")).alias("rc"),
    )

    def _ratio_cols(src: DataFrame, tt, rt) -> DataFrame:
        return src.select(
            "bucket",
            (
                F.log((F.col("tc") + F.lit(s)) / (tt + F.lit(s * buckets)))
                - F.log((F.col("rc") + F.lit(s)) / (rt + F.lit(s * buckets)))
            ).alias("log_ratio"),
            # the ratio a bucket with zero observed counts would get —
            # the weights join fills misses with this (computed once
            # here so dsir_weights needs no extra action)
            (
                F.log(F.lit(s) / (tt + F.lit(s * buckets)))
                - F.log(F.lit(s) / (rt + F.lit(s * buckets)))
            ).alias("zero_ratio"),
        )

    if buckets <= _LOCAL_RATIO_MAX_BUCKETS:
        rows = hist.collect()  # bounded: <= buckets rows of 3 longs
        tt = sum(r["tc"] for r in rows)
        rt = sum(r["rc"] for r in rows)
        local = target_df.sparkSession.createDataFrame(
            [(r["bucket"], r["tc"], r["rc"]) for r in rows],
            "bucket bigint, tc bigint, rc bigint",
        )
        # log() stays a Spark expression so values are bit-identical to
        # the lazy path (and to what this produced before the rewrite)
        return _ratio_cols(local, F.lit(tt), F.lit(rt))
    # absurdly large bucket spaces: stay lazy; totals via a single-
    # partition window over the (still bounded) histogram — one tiny
    # extra exchange instead of a second corpus pass
    w = Window.partitionBy(F.lit(1))
    tot = hist.withColumn("_tt", F.sum("tc").over(w)).withColumn(
        "_rt", F.sum("rc").over(w)
    )
    return _ratio_cols(
        tot.select("bucket", "tc", "rc", "_tt", "_rt"),
        F.col("_tt"),
        F.col("_rt"),
    )


def dsir_weights(
    df: DataFrame,
    id_col: str,
    text_col: str,
    log_ratios: DataFrame,
    buckets: int = DEFAULT_BUCKETS,
    hash_fn: str = "xxhash64",
) -> DataFrame:
    """``(id, n_features, logw)`` for every distinct ``id`` of ``df``.
    Documents with no tokens get ``logw = 0`` (an empty product — the
    paper's weight 1; they surface as a single ``bucket IS NULL`` row
    from the outer explode rather than via a second corpus scan).

    Plan: explode_outer -> broadcast-join the ratio table per gram ->
    ONE groupBy(id). The corpus is scanned exactly once and pays exactly
    one exchange, whose map side partially aggregates every doc's grams
    (contiguous after the explode) down to one row per id — strictly
    fewer shuffled bytes than the old (id, bucket) pre-aggregate, and
    the old ids-resurrection join (a second corpus scan + sort-merge
    join on id) is gone outright. Per-gram summation also mirrors the
    pure-Python/DuckDB references' arithmetic.
    """
    exploded = _doc_buckets(df, text_col, buckets, hash_fn, id_col, outer=True)
    # a bucket absent from BOTH corpora (possible when scoring held-out
    # docs) misses the join; zero_ratio rides the ratio rows, so its
    # scalar is carried separately and coalesced in. A null bucket (the
    # zero-gram marker row) contributes 0 to logw and is excluded from
    # n_features by count("bucket").
    zr = log_ratios.select(F.min("zero_ratio").alias("zr"))
    scored = (
        exploded.join(F.broadcast(log_ratios.drop("zero_ratio")), "bucket", "left")
        .crossJoin(F.broadcast(zr))
        .select(
            id_col,
            "bucket",
            F.when(
                F.col("bucket").isNotNull(),
                F.coalesce("log_ratio", F.col("zr")),
            )
            .otherwise(F.lit(0.0))
            .alias("lr"),
        )
    )
    return scored.groupBy(id_col).agg(
        F.count("bucket").alias("n_features"),
        F.sum("lr").alias("logw"),
    )


def _gumbel(id_c: Column, seed: int, hash_fn: str) -> Column:
    h = F.pmod(
        _gram_hash(F.concat_ws(":", id_c.cast("string"), F.lit(str(seed))), hash_fn),
        F.lit(1 << 53),
    )
    u = (h.cast("double") + F.lit(0.5)) / F.lit(_U53)
    return -F.log(-F.log(u))


def dsir_resample(
    raw_df: DataFrame,
    target_df: DataFrame,
    k: int,
    id_col: str = "doc_id",
    text_col: str = "text",
    buckets: int = DEFAULT_BUCKETS,
    smoothing: float = 1.0,
    seed: int = 42,
    hash_fn: str = "xxhash64",
    gumbel: bool = True,
) -> DataFrame:
    """Gumbel-top-k importance resampling: the k raw documents with the
    largest ``logw + Gumbel(0,1)`` — a without-replacement sample
    proportional to importance weights. Deterministic for a fixed seed
    (hash-derived noise, retry-safe). ``gumbel=False`` drops the noise
    for the paper's plain top-k heuristic selection (highest weights
    win outright). Returns the selected raw rows plus ``logw`` and the
    sampling ``key``."""
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    ratios = dsir_log_ratios(
        target_df, raw_df, text_col, buckets, smoothing, hash_fn
    )
    w = dsir_weights(raw_df, id_col, text_col, ratios, buckets, hash_fn)
    key = F.col("logw")
    if gumbel:
        key = key + _gumbel(F.col(id_col), seed, hash_fn)
    # zero-feature (empty) docs carry no evidence either way; their
    # convention weight of 1 (logw 0) would outrank every real doc on a
    # negatively-shifted corpus, so they are excluded from selection
    keyed = (
        raw_df.join(w, id_col)
        .filter(F.col("n_features") > 0)
        .withColumn("key", key)
    )
    return keyed.orderBy(F.desc("key"), id_col).limit(k)


def dsir_local(
    raw: dict,
    target: dict,
    buckets: int = DEFAULT_BUCKETS,
    smoothing: float = 1.0,
) -> dict:
    """Pure-Python reference of the md5 bucketing + weighting (the
    differential-test oracle): raw/target map id -> text; returns
    id -> (n_features, logw)."""
    import hashlib

    def bucket_of(g: str) -> int:
        return int(hashlib.md5(g.encode()).hexdigest()[:15], 16) % buckets

    def doc_buckets(text: str) -> list[int]:
        t = [w for w in text.strip().split() if w]
        grams = t + [" ".join(t[i : i + 2]) for i in range(len(t) - 1)]
        return [bucket_of(g) for g in grams]

    tc: dict[int, int] = {}
    rc: dict[int, int] = {}
    for txt in target.values():
        for b in doc_buckets(txt):
            tc[b] = tc.get(b, 0) + 1
    raw_b = {did: doc_buckets(txt) for did, txt in raw.items()}
    for bs in raw_b.values():
        for b in bs:
            rc[b] = rc.get(b, 0) + 1
    tt, rt = sum(tc.values()), sum(rc.values())
    s = smoothing

    def ratio(b: int) -> float:
        return math.log((tc.get(b, 0) + s) / (tt + s * buckets)) - math.log(
            (rc.get(b, 0) + s) / (rt + s * buckets)
        )

    return {
        did: (len(bs), sum(ratio(b) for b in bs) if bs else 0.0)
        for did, bs in raw_b.items()
    }
