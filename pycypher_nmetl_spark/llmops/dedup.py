"""Deduplication operators, all JVM-side (no Python UDFs in the hot path).

Scale design (100 TB):
  * exact dedup = hash-partitioned groupBy on a 64-bit content hash —
    one shuffle, map-side combined;
  * n-gram Jaccard = inverted-index self-join on shingles (exact; the
    join fans out only on shared shingles, never a cross join);
  * MinHash-LSH = signature columns computed per-row (embarrassingly
    parallel), banding via explode -> groupBy band bucket; candidate
    verification joins back to shingle sets, so output pairs are exact
    above the threshold while candidate generation stays sub-quadratic;
  * SimHash = fixed-width bit-fold over token hashes, bucketed by
    hash prefix for candidate pruning.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def tokens_col(text: Column) -> Column:
    return F.split(F.trim(text), r"\s+")


def shingles(text: Column, k: int = 3) -> Column:
    """Distinct word k-gram shingles of a text column (JVM-side).

    Guarded for texts shorter than k tokens (Spark's sequence(1, 0)
    would count *down*, producing an invalid slice start)."""
    toks = tokens_col(text)
    n = F.size(toks) - (k - 1)
    sh = F.array_distinct(
        F.transform(
            F.sequence(F.lit(1), F.greatest(n, F.lit(1))),
            lambda i: F.concat_ws(" ", F.slice(toks, i, k)),
        )
    )
    return F.when(n >= 1, sh).otherwise(F.array().cast("array<string>"))


# --------------------------------------------------------------------- #
def exact_dedup(df: DataFrame, cols: list[str] | None = None) -> DataFrame:
    """Keep one row per distinct content (hash-groupBy, one shuffle).

    With `cols`, deduplicates on those columns; otherwise on all.
    """
    return df.dropDuplicates(cols)


def content_hashes(df: DataFrame, cols: list[str]) -> DataFrame:
    """The persistable exact-dedup index: one ``_h`` (xxhash64 over the
    content columns) per distinct content. Write this once for the
    standing corpus; every ingest batch then dedups against it via
    :func:`exact_dedup_against` without touching corpus content."""
    if not cols:
        raise ValueError("content_hashes: cols must be non-empty")
    return df.select(F.xxhash64(*cols).alias("_h")).dropDuplicates()


def exact_dedup_against(
    new_df: DataFrame,
    corpus: DataFrame,
    cols: list[str],
    corpus_is_hashes: bool = False,
    verify: bool = False,
) -> DataFrame:
    """Exact ingest dedup: drop every NEW row whose content columns
    already occur in the EXISTING corpus (within-batch duplicates are
    :func:`exact_dedup` — run both for a full ingest pass).

    Scale shape, the point of this operator: the (small) batch hash set
    broadcasts into a map-side semi join against the corpus index, so
    the 100 TB corpus is scanned once and NEVER shuffled — the same
    "batch moves, corpus doesn't" contract as
    :func:`minhash_lsh_pairs_against`, here for byte-exact duplicates.
    The matched hash set (bounded by the batch size) broadcasts back
    into an anti join on the batch. Pass the persisted
    :func:`content_hashes` frame with ``corpus_is_hashes=True`` to skip
    recomputing corpus hashes.

    Collision note: xxhash64 equality stands in for content equality
    (2^-64 per pair — the standard trade at corpus scale). Pass
    ``verify=True`` (needs the corpus CONTENT frame, so incompatible
    with ``corpus_is_hashes``) to re-check every hash match on the raw
    columns before dropping a batch row: the matched corpus rows —
    bounded by the batch size, found by a broadcast semi filter that
    still never shuffles the corpus — broadcast back into a null-safe
    content anti join, so a colliding-but-different new document
    survives.
    """
    import functools

    if not cols:
        raise ValueError("exact_dedup_against: cols must be non-empty")
    missing = [c for c in cols if c not in new_df.columns]
    if missing:
        raise ValueError(f"exact_dedup_against: {missing} missing from new_df")
    if verify and corpus_is_hashes:
        raise ValueError(
            "exact_dedup_against: verify=True re-checks matched rows on "
            "content and needs the corpus frame, not corpus_is_hashes"
        )
    new_h = new_df.select(F.xxhash64(*cols).alias("_h")).dropDuplicates()
    if verify:
        # matched CONTENT (not hashes): corpus rows whose hash occurs in
        # the batch — map-side broadcast filter, corpus still unshuffled;
        # the surviving set is bounded by the batch row count (+ any
        # colliding rows), so it broadcasts
        matched_content = (
            corpus.join(
                F.broadcast(new_h),
                F.xxhash64(*[corpus[c] for c in cols]) == new_h["_h"],
                "left_semi",
            )
            .select(*[F.col(c).alias(f"__xd_{c}") for c in cols])
            .dropDuplicates()
        )
        cond = functools.reduce(
            lambda a, b: a & b,
            [new_df[c].eqNullSafe(F.col(f"__xd_{c}")) for c in cols],
        )
        return new_df.join(F.broadcast(matched_content), cond, "left_anti")
    corpus_h = (
        corpus.select("_h")
        if corpus_is_hashes
        else corpus.select(F.xxhash64(*cols).alias("_h"))
    )
    matched = corpus_h.join(F.broadcast(new_h), "_h", "left_semi")
    return new_df.join(
        F.broadcast(matched),
        F.xxhash64(*[new_df[c] for c in cols]) == matched["_h"],
        "left_anti",
    )


def _pair_jaccard(
    df: DataFrame,
    id_col: str,
    shingle_col: Column,
    max_df: float | str | None = "auto",
) -> DataFrame:
    """Exact Jaccard for every pair sharing >= 1 shingle (inverted index).

    The join key is xxhash64(shingle), not the shingle string — long
    comparisons and a narrower shuffle (measured 2.2s -> 1.8s warm on the
    sf0.01 gate query; collision odds 2^-64 per pair are far below any
    operational concern).

    ``max_df`` is the hot-shingle (skew) mitigation for corpus scale: a
    shingle present in more than that fraction of documents contributes
    a near-quadratic join fan-out while carrying almost no similarity
    signal — the standard DF-style stop-shingle cut drops it from BOTH
    the numerator and the denominator (Jaccard over the filtered shingle
    space).

    Default ``"auto"`` (round-5): cut shingles present in more than
    max(1000, 0.1% of docs) documents, so a first-time user on a corpus
    with one viral shingle doesn't hit a near-quadratic hot bucket. The
    auto cut is a no-op below 1000 documents (no shingle can exceed it
    — the plan stays the exact inverted-index self-join), and above that
    it perturbs a pair's Jaccard by at most 1/|union| per cut shingle.
    Pass ``max_df=None`` for exact Jaccard regardless of corpus shape."""
    base = df.select(F.col(id_col).alias("_id"), shingle_col.alias("_sh"))
    cut = None
    if max_df == "auto":
        n_docs = base.count()
        auto_cut = max(1000, int(0.001 * n_docs))
        if n_docs > auto_cut:
            cut = auto_cut
    elif max_df is not None:
        cut = max(1, int(max_df * base.count()))
    if cut is not None:
        exploded = base.select(
            "_id", F.explode(F.transform("_sh", lambda g: F.xxhash64(g))).alias("_g")
        ).dropDuplicates(["_id", "_g"])
        hot = (
            exploded.groupBy("_g")
            .agg(F.count(F.lit(1)).alias("_df"))
            .filter(F.col("_df") > cut)
            .select("_g")
        )
        kept = exploded.join(F.broadcast(hot), on="_g", how="left_anti")
        sizes = kept.groupBy("_id").agg(F.count(F.lit(1)).alias("_n"))
        ex = kept.join(sizes, on="_id")
    else:
        ex = base.select(
            "_id",
            F.explode(F.transform("_sh", lambda g: F.xxhash64(g))).alias("_g"),
            F.size("_sh").alias("_n"),
        )
    a, b = ex.alias("a"), ex.alias("b")
    pairs = (
        a.join(b, (F.col("a._g") == F.col("b._g")) & (F.col("a._id") < F.col("b._id")))
        .groupBy(F.col("a._id").alias("id1"), F.col("b._id").alias("id2"))
        .agg(
            F.count(F.lit(1)).alias("shared"),
            F.first("a._n").alias("n1"),
            F.first("b._n").alias("n2"),
        )
    )
    return pairs.withColumn(
        "jaccard",
        F.col("shared") / (F.col("n1") + F.col("n2") - F.col("shared")),
    )


def ngram_jaccard_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    k: int = 3,
    threshold: float = 0.7,
    max_df: float | str | None = "auto",
) -> DataFrame:
    """Near-duplicate pairs by word-k-gram Jaccard >= threshold.

    ``max_df="auto"`` (default) cuts shingles present in more than
    max(1000, 0.1% of docs) documents before the inverted-index
    self-join — the hot-shingle skew mitigation, a no-op below 1000
    docs. Pass a fraction (e.g. 0.3) for an explicit cut, or None for
    exact Jaccard regardless of corpus shape (see _pair_jaccard)."""
    return (
        _pair_jaccard(df, id_col, shingles(F.col(text_col), k), max_df=max_df)
        .filter(F.col("jaccard") >= threshold)
        .select("id1", "id2", "jaccard")
    )


# --------------------------------------------------------------------- #
def _perm_min(sh: Column, i: int) -> Column:
    # NOTE: must be a 1-arg lambda — pyspark treats 2-arg transform
    # lambdas as (element, index)
    return F.array_min(F.transform(sh, lambda s: F.xxhash64(s, F.lit(i))))


def signature_from_shingles(sh: Column, num_perm: int = 32) -> Column:
    """MinHash signature from an already-computed shingle array column.

    Prefer this over ``minhash_signature`` when the shingle array is a
    real column: referencing the raw-text expression would clone the
    whole shingling subtree into each of the ``num_perm`` folds (the
    analyzer/codegen cost alone dominated the LSH gate query before this
    split — measured 9.5s -> see minhash_lsh_pairs).

    The permutations are one nested higher-order expression (transform
    over sequence) rather than ``num_perm`` unrolled folds — the plan
    tree stays O(1) in num_perm, which is what the analyzer/codegen cost
    scales with."""
    return F.transform(
        F.sequence(F.lit(0), F.lit(num_perm - 1)),
        lambda i: F.array_min(F.transform(sh, lambda s: F.xxhash64(s, i))),
    )


def minhash_signature(text: Column, k: int = 3, num_perm: int = 32) -> Column:
    """MinHash signature as an array column: sig[i] = min over shingles of
    xxhash64(shingle, i). One pass over the shingle array per permutation,
    all inside whole-stage codegen."""
    return signature_from_shingles(shingles(text, k), num_perm)


def minhash_lsh_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    k: int = 3,
    num_perm: int = 32,
    bands: int = 16,
    threshold: float = 0.7,
    verify: bool = True,
    eager: bool = True,
) -> DataFrame:
    """Near-duplicate pairs via MinHash + LSH banding.

    bands * rows_per_band = num_perm; candidate probability at Jaccard j
    is 1-(1-j^r)^b (with r=2, b=16: ~1.0 at j>=0.7). With verify=True the
    candidates are re-checked with exact Jaccard, so precision is exact
    and only recall depends on the banding.

    ``eager=True`` (default) materializes the pair result and releases
    the internal signature cache (no CacheManager residue across
    batches); ``eager=False`` returns the lazy plan and leaves the
    cache to the caller.
    """
    rows_per_band = num_perm // bands
    base = (
        df.select(
            F.col(id_col).alias("_id"),
            shingles(F.col(text_col), k).alias("_sh"),
        )
        .withColumn("_sig", signature_from_shingles(F.col("_sh"), num_perm))
        .filter(F.size("_sh") > 0)
    )
    # shingling + 32 signature folds is the expensive part and feeds three
    # consumers (banding, both verification joins) — compute it once
    base = base.persist()

    # band key = hash of the signature slice for that band; posexplode
    # gives (band, key) pairs from one nested expression instead of
    # `bands` unrolled struct columns
    buckets = base.select(
        "_id",
        F.posexplode(
            F.transform(
                F.sequence(F.lit(0), F.lit(bands - 1)),
                lambda b: F.xxhash64(
                    F.slice(F.col("_sig"), b * rows_per_band + 1, rows_per_band)
                ),
            )
        ).alias("band", "key"),
    )

    a, b_ = buckets.alias("a"), buckets.alias("b")
    candidates = (
        a.join(
            b_,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.key") == F.col("b.key"))
            & (F.col("a._id") < F.col("b._id")),
        )
        .select(F.col("a._id").alias("id1"), F.col("b._id").alias("id2"))
        .dropDuplicates()
    )
    if not verify:
        if eager:
            candidates = candidates.localCheckpoint(eager=True)
            base.unpersist()
        return candidates

    sh = base.select("_id", "_sh")
    out = (
        candidates.join(sh.withColumnsRenamed({"_id": "id1", "_sh": "_sh1"}), on="id1")
        .join(sh.withColumnsRenamed({"_id": "id2", "_sh": "_sh2"}), on="id2")
        .withColumn(
            "jaccard",
            F.size(F.array_intersect("_sh1", "_sh2"))
            / (
                F.size("_sh1")
                + F.size("_sh2")
                - F.size(F.array_intersect("_sh1", "_sh2"))
            ),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("id1", "id2", "jaccard")
    )
    if eager:
        out = out.localCheckpoint(eager=True)
        base.unpersist()
    return out


# --------------------------------------------------------------------- #
def _token_hash64(t: Column, hash_fn: str) -> Column:
    """64-bit token hash. 'xxhash64' (default, fastest JVM path) or
    'md5' — the top 60 bits of md5 as a non-negative long, reproducible
    bit-for-bit in DuckDB (``('0x' || substr(md5(t),1,15))::BIGINT``),
    which is what makes the SQL correctness oracle possible."""
    if hash_fn == "xxhash64":
        return F.xxhash64(t)
    if hash_fn == "md5":
        return F.conv(F.substring(F.md5(t), 1, 15), 16, 10).cast("long")
    raise ValueError(f"unknown hash_fn: {hash_fn!r}")


def simhash(text: Column, bits: int = 16, hash_fn: str = "xxhash64") -> Column:
    """SimHash fingerprint over distinct tokens (JVM-side bit fold).

    bit j of the fingerprint = majority vote of bit j across token
    hashes. ONE pass over the tokens with an array<long> accumulator
    (zip_with inside aggregate) — the expression tree is O(1) in `bits`,
    not O(bits) copies of the token-hash transform, which matters for
    analyzer/codegen time on wide folds. `shiftright`/`shiftleft` with a
    *column* shift amount exist only at the SQL layer, hence
    F.call_function.
    """
    toks = F.array_distinct(tokens_col(text))
    hashes = F.transform(toks, lambda t: _token_hash64(t, hash_fn))
    js = F.sequence(F.lit(0), F.lit(bits - 1))
    zero = F.array_repeat(F.lit(0).cast("long"), bits)
    weights = F.aggregate(
        hashes,
        zero,
        lambda acc, h: F.zip_with(
            acc,
            js,
            lambda a, j: a
            + F.call_function("shiftright", h, j).bitwiseAND(F.lit(1)) * 2
            - 1,
        ),
    )
    return F.aggregate(
        F.zip_with(
            weights,
            js,
            lambda w, j: F.when(
                w > 0, F.call_function("shiftleft", F.lit(1).cast("long"), j)
            ).otherwise(F.lit(0).cast("long")),
        ),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )


def explode_paragraphs(
    df: DataFrame, id_col: str, text_col: str, sep: str = r"\n+"
) -> DataFrame:
    """(doc_id, para_idx, para): one row per non-empty paragraph. The
    paragraph index is the span identifier downstream verdicts map back
    to — exact for cutting, stable under recomputation."""
    return (
        df.select(
            F.col(id_col).alias("doc_id"),
            F.posexplode(F.split(F.col(text_col), sep)).alias("para_idx", "para"),
        )
        .filter(F.trim("para") != "")
        .withColumn("para_idx", F.col("para_idx").cast("long"))
    )


def paragraph_near_dup_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    k: int = 3,
    threshold: float = 0.7,
    sep: str = r"\n+",
) -> DataFrame:
    """Near-duplicate PARAGRAPH pairs across (or within) documents —
    the paragraph-granularity composition of MinHash-LSH (round-9:
    exact_substring catches verbatim passages; this catches *almost*-
    verbatim ones, e.g. boilerplate with a date substituted).

    Explodes to paragraphs, runs minhash_lsh_pairs with a struct id
    (doc_id, para_idx) — structs order lexicographically, so the
    id1 < id2 candidate dedup and the keep-first policy below stay
    well-defined — and maps verdicts back to document + paragraph-index
    spans. Scale shape is the LSH pipeline's (banded buckets, exact
    verify); the explode only narrows rows.
    """
    paras = explode_paragraphs(df, id_col, text_col, sep).select(
        F.struct("doc_id", "para_idx").alias("pid"), "para"
    )
    pairs = minhash_lsh_pairs(paras, "pid", "para", k=k, threshold=threshold)
    return pairs.select(
        F.col("id1.doc_id").alias("doc_id1"),
        F.col("id1.para_idx").alias("para_idx1"),
        F.col("id2.doc_id").alias("doc_id2"),
        F.col("id2.para_idx").alias("para_idx2"),
        "jaccard",
    )


def cut_duplicate_paragraphs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    k: int = 3,
    threshold: float = 0.7,
    sep: str = r"\n+",
    joiner: str = "\n\n",
    out_col: str | None = None,
) -> DataFrame:
    """Remove every paragraph that near-duplicates an EARLIER one
    (struct order (doc_id, para_idx)): a paragraph is cut iff it is the
    greater side of >= 1 verified pair, so each duplicate group keeps
    its least member. Documents are rebuilt from surviving paragraphs
    joined with ``joiner`` (paragraph-boundary whitespace normalizes;
    paragraph text is untouched). Documents with no cut paragraph pass
    through byte-identical.
    """
    out_col = out_col or text_col
    pairs = paragraph_near_dup_pairs(df, id_col, text_col, k, threshold, sep)
    cut = pairs.select(
        F.col("doc_id2").alias("doc_id"), F.col("para_idx2").alias("para_idx")
    ).distinct()
    paras = explode_paragraphs(df, id_col, text_col, sep)
    kept = paras.join(cut, ["doc_id", "para_idx"], "left_anti")
    rebuilt = (
        kept.groupBy(F.col("doc_id").alias("_rb_id"))
        .agg(
            F.concat_ws(
                joiner, F.array_sort(F.collect_list(F.struct("para_idx", "para")))
                .getField("para")
            ).alias("_rebuilt"),
            F.count(F.lit(1)).alias("_kept"),
        )
    )
    n_paras = paras.groupBy(F.col("doc_id").alias("_np_id")).agg(
        F.count(F.lit(1)).alias("_total")
    )
    joined = (
        df.join(rebuilt, df[id_col] == F.col("_rb_id"), "left")
        .drop("_rb_id")
        .join(n_paras, df[id_col] == F.col("_np_id"), "left")
        .drop("_np_id")
    )
    cleaned = F.when(
        F.col("_kept").isNull(), F.lit("")  # every paragraph cut (or none existed)
    ).otherwise(
        F.when(F.col("_kept") == F.col("_total"), F.col(text_col)).otherwise(
            F.col("_rebuilt")
        )
    )
    # a doc whose text had no non-empty paragraphs keeps its original
    cleaned = F.when(F.col("_total").isNull(), F.col(text_col)).otherwise(cleaned)
    return joined.withColumn(out_col, cleaned).drop("_rebuilt", "_kept", "_total")


def simhash_buckets(
    df: DataFrame,
    id_col: str,
    text_col: str,
    bits: int = 16,
    prefix_bits: int = 8,
    hash_fn: str = "xxhash64",
) -> DataFrame:
    """(id, simhash, bucket) — bucket by hash prefix for candidate pruning."""
    h = simhash(F.col(text_col), bits, hash_fn)
    return df.select(
        F.col(id_col).alias("id"),
        h.alias("simhash"),
        F.shiftright(h, bits - prefix_bits).alias("bucket"),
    )


def minhash_signatures(
    df: DataFrame,
    id_col: str,
    text_col: str,
    k: int = 3,
    num_perm: int = 32,
) -> DataFrame:
    """The persistable MinHash dedup index: ``(id, _sh, _sig)`` — shingle
    set + signature per document. Write this once for the standing
    corpus; every new ingest batch then dedups against it via
    :func:`minhash_lsh_pairs_against` without touching corpus text.
    Docs with no shingles (shorter than k tokens) are excluded — they
    have no LSH identity."""
    return (
        df.select(
            F.col(id_col).alias("_id"),
            shingles(F.col(text_col), k).alias("_sh"),
        )
        .withColumn("_sig", signature_from_shingles(F.col("_sh"), num_perm))
        .filter(F.size("_sh") > 0)
    )


def minhash_lsh_pairs_against(
    new_df: DataFrame,
    corpus: DataFrame,
    id_col: str,
    text_col: str,
    k: int = 3,
    num_perm: int = 32,
    bands: int = 16,
    threshold: float = 0.7,
    corpus_is_signatures: bool = False,
    eager: bool = True,
) -> DataFrame:
    """Incremental near-dedup — the ingest shape: find near-duplicate
    pairs between a NEW batch and the EXISTING corpus without comparing
    corpus x corpus (that work was already done when the corpus was
    ingested) and without recomputing corpus signatures (pass the
    persisted :func:`minhash_signatures` frame with
    ``corpus_is_signatures=True``).

    Returns ``(new_id, corpus_id, jaccard)``. Within-batch duplicates
    are the plain :func:`minhash_lsh_pairs` over ``new_df`` — run both
    for a full ingest dedup.

    ``eager=True`` (default) materializes the (small) pair result and
    releases the signature caches built inside this call — repeated
    ingest batches in a long-lived session then leave nothing cached.
    Pass ``eager=False`` to get the lazy plan instead; the caches this
    call created stay alive and managing them is the caller's job.

    Scale shape: band buckets for the (small) new batch join the corpus
    band buckets on (band, key) — with AQE the batch side broadcasts, so
    the standing corpus index is scanned map-side, never shuffled; the
    verification join touches only candidate corpus rows.
    """
    rows_per_band = num_perm // bands
    if rows_per_band < 1:
        raise ValueError(f"bands={bands} > num_perm={num_perm}")
    new_base = minhash_signatures(new_df, id_col, text_col, k, num_perm).persist()
    if corpus_is_signatures:
        corpus_base = corpus.select("_id", "_sh", "_sig")
    else:
        # computed from text: persist — the banding join AND the verify
        # join both consume it, and shingling + 32 signature folds per
        # doc is the expensive part (same reasoning as minhash_lsh_pairs)
        corpus_base = minhash_signatures(
            corpus, id_col, text_col, k, num_perm
        ).persist()

    def _buckets(base: DataFrame) -> DataFrame:
        return base.select(
            "_id",
            F.posexplode(
                F.transform(
                    F.sequence(F.lit(0), F.lit(bands - 1)),
                    lambda b: F.xxhash64(
                        F.slice(F.col("_sig"), b * rows_per_band + 1, rows_per_band)
                    ),
                )
            ).alias("band", "key"),
        )

    nb = _buckets(new_base).withColumnRenamed("_id", "new_id")
    cb = _buckets(corpus_base).withColumnRenamed("_id", "corpus_id")
    candidates = (
        nb.join(cb, ["band", "key"])
        .select("new_id", "corpus_id")
        .dropDuplicates()
    )
    out = (
        candidates.join(
            new_base.select(F.col("_id").alias("new_id"), F.col("_sh").alias("_sh1")),
            on="new_id",
        )
        .join(
            corpus_base.select(
                F.col("_id").alias("corpus_id"), F.col("_sh").alias("_sh2")
            ),
            on="corpus_id",
        )
        .withColumn(
            "jaccard",
            F.size(F.array_intersect("_sh1", "_sh2"))
            / (
                F.size("_sh1")
                + F.size("_sh2")
                - F.size(F.array_intersect("_sh1", "_sh2"))
            ),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("new_id", "corpus_id", F.col("jaccard"))
    )
    if eager:
        # materialize, then drop the caches THIS call created (a
        # caller-persisted signature corpus is the caller's to manage);
        # the checkpoint blocks are context-cleaned when the returned
        # frame is garbage collected, unlike CacheManager entries
        out = out.localCheckpoint(eager=True)
        new_base.unpersist()
        if not corpus_is_signatures:
            corpus_base.unpersist()
    return out
