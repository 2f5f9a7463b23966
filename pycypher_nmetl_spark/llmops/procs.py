"""``CALL llm.*`` procedures: the llmops operators exposed to Cypher
(SURVEY §7.2 M8: each operator is "registered as a procedure and as a
Python API").

A procedure is ``fn(engine, args) -> DataFrame`` (see
``pycypher_nmetl_spark/procedures.py``); CALL cross-joins its rows into
the bindings, so each of these returns the same DataFrame the Python
API would, with the node label's ``id`` column as the document key.
Args arrive as plain Python values for literals and ``$params``.

    CALL llm.jaccardPairs('Document', 'text', 3, 0.7)
         YIELD id1, id2, jaccard RETURN count(*) AS dups

All execution stays in the same JVM-side plans as the Python API —
these are thin arg-validating adapters, not reimplementations.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _nodes(engine, label) -> DataFrame:
    if not isinstance(label, str):
        raise TypeError(f"llm.* procedures take a node label string, got {label!r}")
    return engine.catalog.nodes(label)


def _str_arg(args, i, name) -> str:
    if len(args) <= i or not isinstance(args[i], str):
        raise TypeError(f"llm procedure argument {i} ({name}) must be a string")
    return args[i]


def _num_arg(args, i, default):
    if len(args) <= i or args[i] is None:
        return default
    v = args[i]
    if not isinstance(v, (int, float)) or isinstance(v, bool):
        raise TypeError(f"llm procedure argument {i} must be a number")
    return v


def _exact_duplicates(engine, args) -> DataFrame:
    """llm.exactDuplicates(label, prop) -> (keep_id, dup_id)."""
    df = _nodes(engine, _str_arg(args, 0, "label"))
    prop = _str_arg(args, 1, "prop")
    hashed = df.select(F.col("id"), F.xxhash64(F.col(prop)).alias("_h"))
    keep = hashed.groupBy("_h").agg(F.min("id").alias("keep_id"))
    return (
        hashed.join(keep, "_h")
        .filter(F.col("id") != F.col("keep_id"))
        .select("keep_id", F.col("id").alias("dup_id"))
    )


def _jaccard_pairs(engine, args) -> DataFrame:
    """llm.jaccardPairs(label, prop, k=3, threshold=0.7) -> (id1, id2, jaccard)."""
    from pycypher_nmetl_spark.llmops.dedup import ngram_jaccard_pairs

    df = _nodes(engine, _str_arg(args, 0, "label"))
    return ngram_jaccard_pairs(
        df,
        "id",
        _str_arg(args, 1, "prop"),
        k=int(_num_arg(args, 2, 3)),
        threshold=float(_num_arg(args, 3, 0.7)),
    )


def _minhash_pairs(engine, args) -> DataFrame:
    """llm.minhashPairs(label, prop, threshold=0.7) -> (id1, id2, jaccard)."""
    from pycypher_nmetl_spark.llmops.dedup import minhash_lsh_pairs

    df = _nodes(engine, _str_arg(args, 0, "label"))
    return minhash_lsh_pairs(
        df, "id", _str_arg(args, 1, "prop"), threshold=float(_num_arg(args, 2, 0.7))
    )


def _simhash(engine, args) -> DataFrame:
    """llm.simhash(label, prop) -> (id, simhash, bucket)."""
    from pycypher_nmetl_spark.llmops.dedup import simhash_buckets

    df = _nodes(engine, _str_arg(args, 0, "label"))
    return simhash_buckets(df, "id", _str_arg(args, 1, "prop"))


def _textstats(engine, args) -> DataFrame:
    """llm.textStats(label, prop) ->
    (id, n_tokens, quality_score, lang_pred, fingerprint)."""
    from pycypher_nmetl_spark.llmops.textstats import (
        add_fingerprint, add_lang_id, add_quality, add_token_count,
    )

    prop = _str_arg(args, 1, "prop")
    df = _nodes(engine, _str_arg(args, 0, "label"))
    df = add_token_count(df, prop)
    df = add_quality(df, prop)
    df = add_lang_id(df, prop)
    df = add_fingerprint(df, prop)
    return df.select("id", "n_tokens", "quality_score", "lang_pred", "fingerprint")


def _contamination(engine, args) -> DataFrame:
    """llm.contamination(trainLabel, evalLabel, prop, n=8, minContamination=0.0)
    -> (train_id, eval_id, shared, eval_ngrams, contamination)."""
    from pycypher_nmetl_spark.llmops.decontam import contamination_pairs

    train = _nodes(engine, _str_arg(args, 0, "trainLabel"))
    eval_df = _nodes(engine, _str_arg(args, 1, "evalLabel"))
    return contamination_pairs(
        train,
        eval_df,
        id_col="id",
        text_col=_str_arg(args, 2, "prop"),
        n=int(_num_arg(args, 3, 8)),
        min_contamination=float(_num_arg(args, 4, 0.0)),
    )


def _neardup_components(engine, args) -> DataFrame:
    """llm.nearDupComponents(label, embeddingProp, threshold=0.95)
    -> (id, component)."""
    from pycypher_nmetl_spark.llmops.similarity import near_dup_components

    df = _nodes(engine, _str_arg(args, 0, "label"))
    return near_dup_components(
        df,
        _str_arg(args, 1, "embeddingProp"),
        threshold=float(_num_arg(args, 2, 0.95)),
        id_col="id",
    )


def _topk(engine, args) -> DataFrame:
    """llm.topK(label, embeddingProp, queryVector, k=10) -> (id, cosine).

    queryVector is a list parameter (``$q``) or list literal."""
    from pycypher_nmetl_spark.llmops.similarity import brute_force_topk

    df = _nodes(engine, _str_arg(args, 0, "label"))
    if len(args) <= 2 or not isinstance(args[2], (list, tuple)):
        raise TypeError("llm.topK argument 2 (queryVector) must be a list")
    q = [float(x) for x in args[2]]
    return brute_force_topk(
        df,
        _str_arg(args, 1, "embeddingProp"),
        q,
        k=int(_num_arg(args, 3, 10)),
        id_col="id",
    )


def _repetition(engine, args) -> DataFrame:
    """llm.repetitionSignals(label, prop) ->
    (id, dup_line_frac, dup_token_frac, top_token_frac, max_line_len)."""
    from pycypher_nmetl_spark.llmops.textstats import add_repetition_signals

    prop = _str_arg(args, 1, "prop")
    df = add_repetition_signals(_nodes(engine, _str_arg(args, 0, "label")), prop)
    return df.select(
        "id", "dup_line_frac", "dup_token_frac", "top_token_frac", "max_line_len"
    )


def _scrub_pii(engine, args) -> DataFrame:
    """llm.scrubPii(label, prop) -> (id, masked, pii_hits)."""
    from pycypher_nmetl_spark.llmops.textstats import scrub_pii

    prop = _str_arg(args, 1, "prop")
    df = scrub_pii(_nodes(engine, _str_arg(args, 0, "label")), prop, out="masked")
    return df.select("id", "masked", "pii_hits")


def _exact_substring_pairs(engine, args) -> DataFrame:
    """llm.exactSubstringPairs(label, prop, window=50, maxCount=1000)
    -> (id1, id2, n_windows)."""
    from pycypher_nmetl_spark.llmops.substring import exact_substring_pairs

    df = _nodes(engine, _str_arg(args, 0, "label"))
    return exact_substring_pairs(
        df,
        "id",
        _str_arg(args, 1, "prop"),
        window=int(_num_arg(args, 2, 50)),
        max_count=int(_num_arg(args, 3, 1000)),
    )


def _exact_substring_spans(engine, args) -> DataFrame:
    """llm.exactSubstringSpans(label, prop, window=50, keep='none')
    -> (doc_id, span_start, span_end)."""
    from pycypher_nmetl_spark.llmops.substring import duplicate_spans

    df = _nodes(engine, _str_arg(args, 0, "label"))
    keep = args[3] if len(args) > 3 and args[3] is not None else "none"
    return duplicate_spans(
        df,
        "id",
        _str_arg(args, 1, "prop"),
        window=int(_num_arg(args, 2, 50)),
        keep=keep,
    )


def _exact_substring_cut(engine, args) -> DataFrame:
    """llm.exactSubstringCut(label, prop, window=50, keep='none')
    -> (id, text) with duplicated >= window-token substrings removed."""
    from pycypher_nmetl_spark.llmops.substring import exact_substring_dedup

    df = _nodes(engine, _str_arg(args, 0, "label"))
    prop = _str_arg(args, 1, "prop")
    keep = args[3] if len(args) > 3 and args[3] is not None else "none"
    out = exact_substring_dedup(
        df, "id", prop, window=int(_num_arg(args, 2, 50)), keep=keep
    )
    return out.select("id", F.col(prop).alias("text"))


def _dedup_against(engine, args) -> DataFrame:
    """llm.dedupAgainst(newLabel, corpusLabel, prop, threshold=0.7)
    -> (new_id, corpus_id, jaccard): incremental near-dedup of a new
    batch against the standing corpus (batch side broadcasts)."""
    from pycypher_nmetl_spark.llmops.dedup import minhash_lsh_pairs_against

    new_df = _nodes(engine, _str_arg(args, 0, "newLabel"))
    corpus = _nodes(engine, _str_arg(args, 1, "corpusLabel"))
    prop = _str_arg(args, 2, "prop")
    thr = float(_num_arg(args, 3, 0.7))
    return minhash_lsh_pairs_against(new_df, corpus, "id", prop, threshold=thr)


def _semantic_dedup(engine, args) -> DataFrame:
    """llm.semanticDedup(label, vecProp, nClusters=16, threshold=0.9)
    -> surviving (id): SemDeDup (Abbas et al. 2023) — k-means-bounded
    embedding dedup keeping the farthest-from-centroid member per
    duplicate group."""
    from pycypher_nmetl_spark.llmops.similarity import semantic_dedup

    df = _nodes(engine, _str_arg(args, 0, "label"))
    prop = _str_arg(args, 1, "vecProp")
    n_clusters = int(_num_arg(args, 2, 16))
    thr = float(_num_arg(args, 3, 0.9))
    kept = semantic_dedup(df, prop, n_clusters=n_clusters, threshold=thr)
    return kept.select("id")


def _dedup_exact_against(engine, args) -> DataFrame:
    """llm.dedupExactAgainst(newLabel, corpusLabel, prop)
    -> surviving (id, text): NEW rows whose prop content does not occur
    byte-exactly in the standing corpus (batch side broadcasts; the
    corpus is scanned map-side, never shuffled)."""
    from pycypher_nmetl_spark.llmops.dedup import exact_dedup_against

    new_df = _nodes(engine, _str_arg(args, 0, "newLabel"))
    corpus = _nodes(engine, _str_arg(args, 1, "corpusLabel"))
    prop = _str_arg(args, 2, "prop")
    kept = exact_dedup_against(new_df, corpus, cols=[prop])
    return kept.select("id", F.col(prop).alias("text"))


def _dsir_weights(engine, args) -> DataFrame:
    """llm.dsirWeights(rawLabel, prop, targetLabel, buckets=10000)
    -> (id, n_features, logw): DSIR importance weights of every raw doc
    against the target-label corpus (Xie et al. 2023)."""
    from pycypher_nmetl_spark.llmops.dsir import dsir_log_ratios, dsir_weights

    raw = _nodes(engine, _str_arg(args, 0, "rawLabel"))
    prop = _str_arg(args, 1, "prop")
    target = _nodes(engine, _str_arg(args, 2, "targetLabel"))
    buckets = int(_num_arg(args, 3, 10_000))
    ratios = dsir_log_ratios(target, raw, prop, buckets)
    return dsir_weights(raw, "id", prop, ratios, buckets)


def _dsir_resample(engine, args) -> DataFrame:
    """llm.dsirResample(rawLabel, prop, targetLabel, k, seed=42)
    -> (id, logw, key): the k raw docs selected by Gumbel-top-k
    importance resampling toward the target corpus."""
    from pycypher_nmetl_spark.llmops.dsir import dsir_resample

    raw = _nodes(engine, _str_arg(args, 0, "rawLabel"))
    prop = _str_arg(args, 1, "prop")
    target = _nodes(engine, _str_arg(args, 2, "targetLabel"))
    k = int(_num_arg(args, 3, 1000))
    seed = int(_num_arg(args, 4, 42))
    out = dsir_resample(raw, target, k, id_col="id", text_col=prop, seed=seed)
    return out.select("id", "logw", "key")


def _lm_score(engine, args) -> DataFrame:
    """llm.lmScore(label, prop, n=2, trainLabel=null)
    -> (id, n_scored, lm_avg_logprob, ppl): stupid-backoff n-gram LM
    perplexity (CCNet-style quality filter). trainLabel defaults to
    scoring the corpus under its own LM."""
    from pycypher_nmetl_spark.llmops.lm import add_lm_perplexity

    df = _nodes(engine, _str_arg(args, 0, "label"))
    prop = _str_arg(args, 1, "prop")
    n = int(_num_arg(args, 2, 2))
    train = None
    if len(args) > 3 and args[3] is not None:
        train = _nodes(engine, _str_arg(args, 3, "trainLabel")).withColumnRenamed(
            "id", "__train_id"
        )
        # train frame only needs the text column for counting
    out = add_lm_perplexity(
        df.select("id", prop), prop, n=n, id_col="id",
        train_df=train.select(F.col(prop)) if train is not None else None,
    )
    return out.select("id", "n_scored", "lm_avg_logprob", "ppl")


# keys are lowercase: the engine lowercases procedure names on lookup
LLM_PROCEDURES = {
    "llm.lmscore": _lm_score,
    "llm.dsirweights": _dsir_weights,
    "llm.dsirresample": _dsir_resample,
    "llm.dedupagainst": _dedup_against,
    "llm.dedupexactagainst": _dedup_exact_against,
    "llm.semanticdedup": _semantic_dedup,
    "llm.exactduplicates": _exact_duplicates,
    "llm.jaccardpairs": _jaccard_pairs,
    "llm.minhashpairs": _minhash_pairs,
    "llm.simhash": _simhash,
    "llm.textstats": _textstats,
    "llm.contamination": _contamination,
    "llm.neardupcomponents": _neardup_components,
    "llm.topk": _topk,
    "llm.repetitionsignals": _repetition,
    "llm.scrubpii": _scrub_pii,
    "llm.exactsubstringpairs": _exact_substring_pairs,
    "llm.exactsubstringspans": _exact_substring_spans,
    "llm.exactsubstringcut": _exact_substring_cut,
}
