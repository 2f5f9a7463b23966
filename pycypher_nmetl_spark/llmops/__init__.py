"""LLM-training-data pipeline operators (SURVEY.md §7.2 M8).

Beyond-reference operators a 100 TB training-data pipeline needs:
deduplication (exact / n-gram Jaccard / MinHash-LSH / SimHash /
embedding near-dup), eval-set decontamination (directional n-gram
overlap), similarity search (brute-force + IVF), text
analysis (tokens, quality, language, fingerprints), and multimodal
column plumbing. All hot paths are JVM-side DataFrame expressions —
no Python row loops; the only Arrow crossings are the (stubbed)
multimodal decoders.
"""

from pycypher_nmetl_spark.llmops.decontam import (
    contamination_pairs, decontaminate,
)
from pycypher_nmetl_spark.llmops.dedup import (
    content_hashes, cut_duplicate_paragraphs, exact_dedup,
    exact_dedup_against, explode_paragraphs,
    minhash_lsh_pairs, minhash_lsh_pairs_against, minhash_signatures,
    ngram_jaccard_pairs, paragraph_near_dup_pairs,
    shingles, simhash, simhash_buckets,
)
from pycypher_nmetl_spark.llmops.similarity import (
    brute_force_topk, brute_force_topk_many, cosine_col, ivf_build,
    ivf_topk, ivf_topk_many, near_dup_components, near_dup_pairs,
    semantic_dedup, semantic_dedup_pairs,
)
from pycypher_nmetl_spark.llmops.textstats import (
    add_fingerprint, add_lang_id, add_quality, add_repetition_signals,
    add_token_count, add_url_canonical, chunk_documents, scrub_pii, tokens,
)
from pycypher_nmetl_spark.llmops.export import (
    global_shuffle, pack_sequences, split, stratified_sample,
)
from pycypher_nmetl_spark.llmops.substring import (
    cut_spans, duplicate_spans, exact_substring_dedup,
    exact_substring_pairs, hot_windows,
)
from pycypher_nmetl_spark.llmops.lm import (
    add_lm_perplexity, score_ngram_lm, score_ngram_lm_local, train_ngram_lm,
)
from pycypher_nmetl_spark.llmops.dsir import (
    dsir_local, dsir_log_ratios, dsir_resample, dsir_weights,
)
from pycypher_nmetl_spark.llmops.classifier import (
    pareto_keep, score_quality, train_quality_classifier,
)

__all__ = [
    "contamination_pairs", "decontaminate",
    "exact_dedup", "exact_dedup_against", "content_hashes",
    "ngram_jaccard_pairs", "minhash_lsh_pairs", "shingles",
    "minhash_signatures", "minhash_lsh_pairs_against",
    "simhash", "simhash_buckets",
    "brute_force_topk", "brute_force_topk_many", "cosine_col", "ivf_build", "ivf_topk",
    "ivf_topk_many", "semantic_dedup", "semantic_dedup_pairs",
    "near_dup_components", "near_dup_pairs",
    "tokens", "add_token_count", "add_quality", "add_lang_id", "add_fingerprint",
    "add_repetition_signals", "scrub_pii", "add_url_canonical",
    "chunk_documents",
    "split", "stratified_sample", "global_shuffle", "pack_sequences",
    "exact_substring_pairs", "exact_substring_dedup", "duplicate_spans",
    "cut_spans", "hot_windows",
    "explode_paragraphs", "paragraph_near_dup_pairs",
    "cut_duplicate_paragraphs",
    "train_ngram_lm", "score_ngram_lm", "score_ngram_lm_local",
    "add_lm_perplexity",
    "dsir_log_ratios", "dsir_weights", "dsir_resample", "dsir_local",
    "train_quality_classifier", "score_quality", "pareto_keep",
]
