"""End-to-end training-data curation pipeline over the llmops operators.

documents.parquet -> language ID -> quality + repetition signals ->
PII scrub -> exact dedup ->
MinHash-LSH near-dedup (representative per duplicate component) ->
embedding near-dup collapse -> leak-free split -> eval-set
decontamination of train vs the held-out splits -> global shuffle ->
sequence packing. Every stage is a lazy DataFrame transformation; the
only actions are the final writes.

Usage:
    python examples/curation/curate.py [sf_dir] [out_dir]

Defaults: sf_dir=/root/testdata/sf0.001, out_dir=/tmp/curated.
At 100 TB the same script runs unchanged on a cluster: each stage is
shuffle-bounded (see SCALING.md) — exact dedup is one hash groupBy,
MinHash banding is explode + equi-join, near-dup verify is prefiltered
JVM-side, split/shuffle/pack are one shuffle total.
"""

from __future__ import annotations

import sys

from pyspark.sql import functions as F


def curate(spark, sf_dir: str, out_dir: str) -> dict:
    from pycypher_nmetl_spark.llmops import (
        add_lang_id, add_quality, add_repetition_signals,
        add_token_count, decontaminate, exact_dedup, global_shuffle,
        minhash_lsh_pairs, pack_sequences, scrub_pii, split,
    )
    from pycypher_nmetl_spark.algorithms import connected_components

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    stats = {"input": docs.count()}

    # 1. annotate: token counts, language, quality — pure column
    #    expressions, zero Python UDFs, one scan
    docs = add_token_count(docs, "text")
    docs = add_quality(docs, "text")
    docs = add_lang_id(docs, "text")
    docs = add_repetition_signals(docs, "text")

    # 2. filter: drop empty/garbage/repetitive docs (Gopher-style
    #    quality + repetition cuts), then mask PII before anything is
    #    persisted downstream
    docs = docs.filter(
        (F.col("n_tokens") >= 5)
        & (F.col("quality_score") > 0.2)
        & (F.col("dup_line_frac") <= 0.5)
        & (F.col("top_token_frac") <= 0.5)
    )
    docs = scrub_pii(docs, "text")
    stats["after_quality"] = docs.count()

    # 2b. model-based quality (round 9): CCNet-style n-gram-LM
    #     perplexity against a reference LM trained on the corpus's
    #     top-quality slice — docs in the worst 5% ppl tail drop —
    #     then a fastText-style hashed-n-gram classifier scored with
    #     GPT-3's stochastic Pareto keep rule (low scorers survive
    #     occasionally; no hard cliff). Both stages are joins/maps —
    #     nothing driver-side but the two fitted models + one quantile.
    from pycypher_nmetl_spark.llmops import (
        add_lm_perplexity, pareto_keep, score_quality,
        train_quality_classifier,
    )

    reference = docs.filter(F.col("quality_score") >= 0.5).select("text")
    docs = add_lm_perplexity(docs, "text", n=2, train_df=reference)
    ppl_cap = docs.approxQuantile("ppl", [0.95], 0.01)[0]
    docs = docs.filter(F.col("ppl").isNotNull() & (F.col("ppl") <= ppl_cap))
    stats["after_lm_perplexity"] = docs.count()

    clf = train_quality_classifier(
        positive_df=docs.filter(F.col("quality_score") >= 0.5),
        negative_df=docs.filter(F.col("quality_score") < 0.35),
        text_col="text",
        num_features=1 << 15,
    )
    docs = pareto_keep(score_quality(docs, "text", clf), "quality_prob")
    docs = docs.filter(F.col("keep")).drop("keep", "quality_prob")
    stats["after_classifier_keep"] = docs.count()

    # 3. exact dedup on normalized text (hash groupBy — one shuffle)
    docs = exact_dedup(docs, ["text"])
    stats["after_exact_dedup"] = docs.count()

    # 3b. passage-level cuts INSIDE surviving documents (round 9):
    #     exact-substring (Lee et al. 2021) removes verbatim >=20-token
    #     passages duplicated anywhere in the corpus; the paragraph-
    #     granularity near-dup then catches almost-verbatim boilerplate
    #     paragraphs (keeps the first copy). Both rebuild text in place.
    from pycypher_nmetl_spark.llmops import (
        cut_duplicate_paragraphs, exact_substring_dedup,
    )

    docs = exact_substring_dedup(docs, "doc_id", "text", window=20, keep="first")
    docs = cut_duplicate_paragraphs(docs, "doc_id", "text", threshold=0.8)
    docs = docs.filter(F.length(F.trim("text")) > 0)  # fully-cut docs drop
    stats["after_passage_cuts"] = docs.count()

    # 4. near-dedup: MinHash-LSH pairs -> connected components ->
    #    keep one representative (min doc_id) per duplicate cluster
    pairs = minhash_lsh_pairs(docs, "doc_id", "text", threshold=0.8)
    edges = pairs.select(F.col("id1").alias("src"), F.col("id2").alias("dst"))
    comp = connected_components(edges)
    reps = comp.groupBy("component").agg(F.min("id").alias("keep_id"))
    dupes = comp.join(
        reps, "component"
    ).filter(F.col("id") != F.col("keep_id")).select(F.col("id").alias("doc_id"))
    docs = docs.join(dupes, "doc_id", "left_anti")
    stats["after_near_dedup"] = docs.count()

    # 5. leak-free split: pure hash of doc_id — stable under re-runs
    #    and corpus growth (val/test never bleed into train)
    docs = split(docs, {"train": 0.98, "val": 0.01, "test": 0.01}, key="doc_id")

    # 6. decontaminate train against the held-out splits: any train doc
    #    sharing >=50% of a held-out doc's word 5-grams is dropped (the
    #    eval side is broadcast — the train side is never shuffled)
    train = docs.where(F.col("split") == "train")
    heldout = docs.where(F.col("split") != "train")
    train = decontaminate(train, heldout, n=5, threshold=0.5)
    stats["after_decontamination"] = train.count()

    # 7. reproducible global shuffle (one repartition) + greedy packing
    shuffled = global_shuffle(train, key="doc_id", num_partitions=8)
    packed = pack_sequences(shuffled, "doc_id", "n_tokens", max_tokens=2048)
    stats["train_sequences"] = packed.count()

    packed.write.mode("overwrite").parquet(f"{out_dir}/train_sequences.parquet")
    docs.where(F.col("split") != "train").write.mode("overwrite").partitionBy(
        "split"
    ).parquet(f"{out_dir}/heldout.parquet")
    return stats


if __name__ == "__main__":
    sys.path.insert(0, ".")
    from pycypher_nmetl_spark import get_spark

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    out_dir = sys.argv[2] if len(sys.argv) > 2 else "/tmp/curated"
    spark = get_spark(app_name="curation-example")
    for k, v in curate(spark, sf_dir, out_dir).items():
        print(f"{k}: {v}")
