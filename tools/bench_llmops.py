"""Scaling bench for the LLM-data-pipeline operators (llmops/ + export).

Runs each op at $SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1) and,
when present, at the genuine-10x dataset produced by tools/gen_sf.py
(/tmp/spark_graft_gen_sf10x — `python tools/bench_scaling.py gen10`
builds it).  Reports per-op wall time at both scales and the scaling
exponent log(t10/t1)/log(10): < 1 sublinear, > 1 superlinear (a shape
that would degrade at 100 TB and needs attention).

Usage: python tools/bench_llmops.py [out.json]
"""

from __future__ import annotations

import json
import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F


def _docs(spark, d):
    return spark.read.parquet(f"{d}/documents.parquet")


def _embs(spark, d):
    return spark.read.parquet(f"{d}/embeddings.parquet")


def _ops():
    from pycypher_nmetl_spark.llmops import (
        add_fingerprint, add_lang_id, add_quality, add_token_count,
        brute_force_topk, contamination_pairs, exact_dedup, global_shuffle,
        minhash_lsh_pairs, near_dup_pairs, pack_sequences, simhash_buckets,
        split,
    )

    def exact(spark, d):
        return exact_dedup(_docs(spark, d), ["text"]).count()

    def minhash(spark, d):
        return minhash_lsh_pairs(
            _docs(spark, d), "doc_id", "text", threshold=0.7
        ).count()

    def simhash_op(spark, d):
        return simhash_buckets(_docs(spark, d), "doc_id", "text").count()

    def textstats(spark, d):
        df = _docs(spark, d)
        df = add_token_count(df, "text")
        df = add_quality(df, "text")
        df = add_lang_id(df, "text")
        df = add_fingerprint(df, "text")
        # force every derived column to materialize
        return df.agg(
            F.sum("n_tokens"), F.countDistinct("lang_pred"),
            F.countDistinct("fingerprint"),
        ).collect()[0][0]

    def embed_topk(spark, d):
        q = _embs(spark, d).limit(1).collect()[0]["embedding"]
        return len(
            brute_force_topk(
                _embs(spark, d), "embedding", [float(x) for x in q],
                k=10, id_col="vec_id",
            ).collect()
        )

    def embed_neardup(spark, d):
        return near_dup_pairs(
            _embs(spark, d), "embedding", threshold=0.95, id_col="vec_id"
        ).count()

    def decontam(spark, d):
        docs = _docs(spark, d)
        return contamination_pairs(
            docs.filter(F.col("doc_id") % 97 != 0),
            docs.filter(F.col("doc_id") % 97 == 0),
            n=3,
            min_contamination=0.02,
        ).count()

    def substring_pairs(spark, d):
        from pycypher_nmetl_spark.llmops import exact_substring_pairs

        return exact_substring_pairs(
            _docs(spark, d), "doc_id", "text", window=10
        ).count()

    def substring_cut(spark, d):
        # full ExactSubstr roundtrip: window hashes -> dup flag (one
        # corpus-wide exchange) -> span islands -> token cut. On the
        # replicated gen datasets EVERY position is duplicated (each doc
        # has k-1 exact copies), so this measures the op's worst case.
        from pycypher_nmetl_spark.llmops import exact_substring_dedup

        out = exact_substring_dedup(_docs(spark, d), "doc_id", "text", window=10)
        return out.agg(F.sum(F.length("text"))).collect()[0][0]

    def bpe_count(spark, d):
        # real BPE token counting (the one justified Python-per-batch op):
        # merges trained once per dataset on a 200-doc sample (cached in
        # /tmp), then counted distributed; result = total corpus tokens
        import hashlib
        import os as _os

        from pycypher_nmetl_spark.llmops.bpe import save_merges, train_bpe_merges
        from pycypher_nmetl_spark.llmops.textstats import add_token_count

        mp = f"/tmp/spark_graft_bpe_{hashlib.md5(d.encode()).hexdigest()[:8]}.txt"
        if not _os.path.exists(mp):
            sample = [r["text"] for r in _docs(spark, d).limit(200).collect()]
            save_merges(train_bpe_merges(sample, n_merges=200), mp)
        out = add_token_count(_docs(spark, d), "text", tokenizer="bpe", merges_path=mp)
        return out.agg(F.sum("n_tokens_bpe")).collect()[0][0]

    def lm_perplexity(spark, d):
        # stupid-backoff bigram LM: train on 2/3 of the corpus, score
        # everything — 2 count aggregations + 3 gram-string joins
        from pycypher_nmetl_spark.llmops import add_lm_perplexity

        docs = _docs(spark, d)
        out = add_lm_perplexity(
            docs.select("doc_id", "text"), "text", n=2,
            train_df=docs.filter(F.col("doc_id") % 3 != 0),
        )
        return out.agg(F.sum("n_scored")).collect()[0][0]

    def dsir(spark, d):
        # DSIR weights: two bucket histograms + broadcast ratio join +
        # per-doc sum; the raw side shuffles once (doc,bucket groupBy)
        from pycypher_nmetl_spark.llmops import dsir_log_ratios, dsir_weights

        docs = _docs(spark, d)
        ratios = dsir_log_ratios(
            docs.filter(F.col("doc_id") % 7 == 0),
            docs.filter(F.col("doc_id") % 7 != 0),
            "text",
        )
        w = dsir_weights(
            docs.filter(F.col("doc_id") % 7 != 0), "doc_id", "text", ratios
        )
        return w.agg(F.sum("n_features")).collect()[0][0]

    def quality_classifier(spark, d):
        # hashed-n-gram LR: fit on quality-split halves, score corpus
        from pycypher_nmetl_spark.llmops import (
            add_quality, score_quality, train_quality_classifier,
        )

        docs = add_quality(_docs(spark, d), "text")
        clf = train_quality_classifier(
            docs.filter(F.col("quality_score") >= 0.5),
            docs.filter(F.col("quality_score") < 0.5),
            "text", num_features=1 << 15, max_iter=10,
        )
        return score_quality(docs, "text", clf).agg(
            F.sum("quality_prob")
        ).collect()[0][0]

    def paragraph_neardup(spark, d):
        # paragraph-granularity near-dup pairs over the whole corpus
        from pycypher_nmetl_spark.llmops import paragraph_near_dup_pairs

        return paragraph_near_dup_pairs(
            _docs(spark, d), "doc_id", "text", threshold=0.8
        ).count()

    def dedup_against(spark, d):
        # incremental ingest dedup: 10% batch vs 90% standing corpus
        from pycypher_nmetl_spark.llmops import minhash_lsh_pairs_against

        docs = _docs(spark, d)
        return minhash_lsh_pairs_against(
            docs.filter(F.col("doc_id") % 10 == 0),
            docs.filter(F.col("doc_id") % 10 != 0),
            "doc_id", "text", threshold=0.7,
        ).count()

    def export_pipeline(spark, d):
        df = split(_docs(spark, d), {"train": 0.9, "val": 0.1}, key="doc_id")
        train = df.where(F.col("split") == "train")
        sh = global_shuffle(train, key="doc_id", num_partitions=32)
        return pack_sequences(sh, "doc_id", "n_chars", max_tokens=8000).count()

    def asof(spark, d):
        # latest error at-or-before each click, per user (union-window:
        # 1 exchange, 0 joins)
        from pycypher_nmetl_spark.temporal_joins import asof_join

        ev = spark.read.parquet(f"{d}/events.parquet")
        clicks = ev.filter(F.col("event_type") == "click").select(
            "event_id", "ts", "user_id"
        )
        errors = ev.filter(F.col("event_type") == "error").select(
            "ts", "user_id", F.col("value").alias("err_v")
        )
        return asof_join(clicks, errors, on="ts", by="user_id").count()

    def range_windows(spark, d):
        # clicks inside [view, view+30min) windows (bin-bucketed equi-join)
        from pycypher_nmetl_spark.temporal_joins import range_join

        ev = spark.read.parquet(f"{d}/events.parquet")
        clicks = ev.filter(F.col("event_type") == "click").select(
            "event_id", "ts", "user_id"
        )
        win = ev.filter(F.col("event_type") == "view").select(
            "user_id", F.col("ts").alias("w_start"),
            (F.col("ts") + F.expr("INTERVAL 30 MINUTES")).alias("w_end"),
        )
        return range_join(
            clicks, win, "ts", "w_start", "w_end", by="user_id",
            bin_width=1800.0,
        ).count()

    def semdedup(spark, d):
        # SemDeDup pairs with the paper's k ~ sqrt(n) cluster scaling:
        # per-cluster pair work is (n/k)^2 * k = n^2/k, so k ~ sqrt(n)
        # keeps total candidate volume ~ n^1.5 while assignment stays
        # n*k*d. threshold 0.35 ~ the p99 of the synthetic corpus's
        # within-cluster cosine (it has no planted semantic dups).
        from pycypher_nmetl_spark.llmops.similarity import semantic_dedup_pairs

        e = _embs(spark, d)
        n = e.count()
        k = max(16, min(256, int((n / 8) ** 0.5)))
        pairs, _, _ = semantic_dedup_pairs(
            e, "embedding", id_col="vec_id", n_clusters=k, threshold=0.35
        )
        return pairs.count()

    def semdedup_capped(spark, d):
        # the round-11 skew path: max_cluster_size BELOW the mean
        # cluster size forces every cluster through the recursive
        # k-means split before the matmul — measures the capped path's
        # overhead and exponent (the skew defense at 100 TB)
        from pycypher_nmetl_spark.llmops.similarity import semantic_dedup_pairs

        e = _embs(spark, d)
        n = e.count()
        k = max(16, min(256, int((n / 8) ** 0.5)))
        cap = max(500, n // (k * 2))
        pairs, _, _ = semantic_dedup_pairs(
            e, "embedding", id_col="vec_id", n_clusters=k, threshold=0.35,
            max_cluster_size=cap,
        )
        return pairs.count()

    def exact_against(spark, d):
        # byte-exact ingest dedup: 10% batch vs 90% corpus (broadcast-semi)
        from pycypher_nmetl_spark.llmops import exact_dedup_against

        docs = _docs(spark, d)
        return exact_dedup_against(
            docs.filter(F.col("doc_id") % 10 == 0),
            docs.filter(F.col("doc_id") % 10 != 0),
            cols=["text"],
        ).count()

    return [
        ("exact_dedup", exact),
        ("minhash_lsh_pairs", minhash),
        ("simhash_buckets", simhash_op),
        ("textstats_scan", textstats),
        ("embed_topk", embed_topk),
        ("embed_neardup_lsh", embed_neardup),
        ("decontaminate", decontam),
        ("exact_substring_pairs", substring_pairs),
        ("exact_substring_cut", substring_cut),
        ("bpe_token_count", bpe_count),
        ("paragraph_neardup", paragraph_neardup),
        ("dedup_against_incremental", dedup_against),
        ("ngram_lm_perplexity", lm_perplexity),
        ("dsir_weights", dsir),
        ("quality_classifier", quality_classifier),
        ("export_split_shuffle_pack", export_pipeline),
        ("asof_join", asof),
        ("range_join", range_windows),
        ("exact_dedup_against", exact_against),
        ("semantic_dedup_pairs", semdedup),
        ("semantic_dedup_capped", semdedup_capped),
    ]


def _time(fn, spark, d, reps=3, budget_s=60.0):
    """Median of `reps` warm runs; ops slower than budget_s get one
    timed run (their runtime dwarfs scheduler jitter anyway)."""
    t0 = time.perf_counter()
    fn(spark, d)  # warm (plan compile, file listing, code paths)
    warm = time.perf_counter() - t0
    if warm > budget_s:
        t0 = time.perf_counter()
        out = fn(spark, d)
        return time.perf_counter() - t0, out
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        out = fn(spark, d)
        ts.append(time.perf_counter() - t0)
    ts.sort()
    return ts[len(ts) // 2], out


def main():
    from pycypher_nmetl_spark import get_spark

    base = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    gen10 = "/tmp/spark_graft_gen_sf10x"
    gen100 = "/tmp/spark_graft_gen_sf100x"
    only = set(sys.argv[2:])  # optional op-name filter
    spark = get_spark(app_name="bench_llmops")

    out_path = sys.argv[1] if len(sys.argv) > 1 else None
    rows = []
    for name, fn in _ops():
        if only and name not in only:
            continue
        t1, out1 = _time(fn, spark, base)
        rec = {"op": name, "sf0.1_s": round(t1, 4), "result": out1}
        print(json.dumps(rec), flush=True)
        if os.path.isdir(gen10):
            t10, out10 = _time(fn, spark, gen10)
            rec["gen10x_s"] = round(t10, 4)
            rec["result10"] = out10
            rec["exp10"] = round(math.log(t10 / t1) / math.log(10), 3)
            print(json.dumps(rec), flush=True)
        if os.path.isdir(gen100):
            t100, out100 = _time(fn, spark, gen100, reps=1)
            rec["gen100x_s"] = round(t100, 4)
            rec["result100"] = out100
            rec["exp100"] = round(math.log(t100 / t1) / math.log(100), 3)
            print(json.dumps(rec), flush=True)
        rows.append(rec)
        # checkpoint after every op so a killed run keeps its results
        if out_path:
            with open(out_path, "w") as f:
                json.dump(
                    {"metric": "llmops_scaling", "rows": rows, "base": base},
                    f, indent=1,
                )
    print(json.dumps({"total_ops": len(rows)}))


if __name__ == "__main__":
    main()
