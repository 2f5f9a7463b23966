"""LLM-pipeline operator tests: dedup, similarity, text stats, multimodal."""

import pytest
from pyspark.sql import functions as F

from pycypher_nmetl_spark.llmops import (
    add_fingerprint, add_lang_id, add_quality, add_token_count,
    brute_force_topk, exact_dedup, ivf_build, ivf_topk, minhash_lsh_pairs,
    near_dup_pairs, ngram_jaccard_pairs, simhash_buckets,
)
from pycypher_nmetl_spark.llmops.multimodal import (
    exact_binary_dedup, extract_audio_features, extract_image_features,
    frame_sample_plan,
)


@pytest.fixture()
def docs(spark):
    rows = [
        (1, "the quick brown fox jumps over the lazy dog"),
        (2, "the quick brown fox jumps over the lazy cat"),  # near-dup of 1
        (3, "completely different content about spark engines"),
        (4, "the quick brown fox jumps over the lazy dog"),  # exact dup of 1
        (5, "short"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_exact_dedup(docs):
    assert exact_dedup(docs, ["text"]).count() == 4


def test_ngram_jaccard_finds_near_dup(docs):
    out = ngram_jaccard_pairs(docs, "doc_id", "text", k=3, threshold=0.5).collect()
    pairs = {(r["id1"], r["id2"]) for r in out}
    assert (1, 2) in pairs and (1, 4) in pairs and (2, 4) in pairs
    exact = [r for r in out if (r["id1"], r["id2"]) == (1, 4)]
    assert exact[0]["jaccard"] == 1.0


def test_minhash_lsh_matches_exact(docs):
    lsh = minhash_lsh_pairs(docs, "doc_id", "text", threshold=0.5)
    exact = ngram_jaccard_pairs(docs, "doc_id", "text", threshold=0.5)
    assert sorted(map(tuple, lsh.select("id1", "id2").collect())) == sorted(
        map(tuple, exact.select("id1", "id2").collect())
    )


def test_simhash_close_for_near_dups(docs):
    out = {r["id"]: r["simhash"] for r in simhash_buckets(docs, "doc_id", "text").collect()}
    ham_near = bin(out[1] ^ out[2]).count("1")
    ham_far = bin(out[1] ^ out[3]).count("1")
    assert out[1] == out[4]  # identical text -> identical hash
    assert ham_near < ham_far


def test_token_count_and_quality(docs):
    out = {r["doc_id"]: r for r in add_token_count(docs, "text").collect()}
    assert out[1]["n_tokens"] == 9
    assert out[5]["n_tokens"] == 1
    q = {r["doc_id"]: r for r in add_quality(docs, "text").collect()}
    assert q[1]["stopword_ratio"] > 0
    assert 0 <= q[1]["quality_score"] <= 1


def test_lang_id(spark):
    df = spark.createDataFrame(
        [
            (1, "hello world"),
            (2, "großes haus über straße"),
            (3, "你好世界"),
            (4, "a la mañana señor"),
        ],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r["lang_pred"] for r in add_lang_id(df, "text").collect()}
    assert out == {1: "en", 2: "de", 3: "zh", 4: "es"}


def test_fingerprint_order_invariant(spark):
    df = spark.createDataFrame(
        [(1, "b a c"), (2, "c b a"), (3, "a b x")], "doc_id long, text string"
    )
    out = {r["doc_id"]: r["fingerprint"] for r in add_fingerprint(df, "text").collect()}
    assert out[1] == out[2] != out[3]


# ------------------------------------------------------------------ #
@pytest.fixture()
def vectors(spark):
    rows = [
        (1, [1.0, 0.0, 0.0]),
        (2, [0.9, 0.1, 0.0]),
        (3, [0.0, 1.0, 0.0]),
        (4, [0.0, 0.0, 1.0]),
        (5, [0.8, 0.2, 0.0]),
    ]
    return spark.createDataFrame(rows, "id long, embedding array<double>")


def test_brute_force_topk(vectors):
    out = brute_force_topk(vectors, "embedding", [1.0, 0.0, 0.0], k=3).collect()
    assert [r["id"] for r in out] == [1, 2, 5]
    assert out[0]["cosine"] == pytest.approx(1.0)


def test_near_dup_pairs_exact(vectors):
    out = near_dup_pairs(vectors, "embedding", threshold=0.95, exact=True)
    got = {(r["id1"], r["id2"]) for r in out.collect()}
    assert (1, 2) in got and (2, 5) in got and (3, 4) not in got


def test_near_dup_pairs_lsh_default_matches_exact(vectors):
    # default (banded LSH) on a tiny near-identical set: full recall,
    # exact precision (candidates are verified with the real cosine)
    exact = near_dup_pairs(vectors, "embedding", threshold=0.95, exact=True)
    lsh = near_dup_pairs(vectors, "embedding", threshold=0.95)
    assert {tuple(r) for r in lsh.collect()} == {tuple(r) for r in exact.collect()}


def test_near_dup_pairs_lsh_recall_at_moderate_threshold(spark):
    # sf0.001 embeddings at the gate's 0.45 threshold: the 32x4 banding
    # must not lose pairs vs the exact baseline (recall pinned at 1.0 on
    # this fixed dataset; precision is exact by construction)
    e = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    exact = {
        (r.id1, r.id2)
        for r in near_dup_pairs(
            e, "embedding", threshold=0.45, id_col="vec_id", exact=True
        ).collect()
    }
    got = {
        (r.id1, r.id2)
        for r in near_dup_pairs(
            e, "embedding", threshold=0.45, id_col="vec_id"
        ).collect()
    }
    assert got == exact and len(exact) > 0


def test_ivf_topk_recovers_neighbors(vectors):
    assigned, cents = ivf_build(vectors, "embedding", n_clusters=3, sample=5, iters=5)
    out = ivf_topk(assigned, cents, "embedding", [1.0, 0.0, 0.0], k=2, nprobe=3)
    assert [r["id"] for r in out.collect()] == [1, 2]


# ------------------------------------------------------------------ #
@pytest.fixture()
def media(spark):
    rows = [
        (1, "image", bytearray(b"x" * 100), "image/png", {"w": "10"}),
        (2, "image", bytearray(b"y" * 200), "image/png", {}),
        (3, "audio", bytearray(b"z" * 300), "audio/wav", {}),
        (4, "video", bytearray(b"v" * 400), "video/mp4", {"duration_ms": "3500"}),
        (5, "image", bytearray(b"x" * 100), "image/png", {}),  # dup content of 1
    ]
    from pycypher_nmetl_spark.llmops.multimodal import MEDIA_SCHEMA

    return spark.createDataFrame(rows, MEDIA_SCHEMA)


def test_image_features_fake_decoder(media):
    out = {r["media_id"]: r for r in extract_image_features(media, fake=True).collect()}
    assert set(out) == {1, 2, 5}
    assert out[1]["n_bytes"] == 100
    assert out[1]["content_hash"] == out[5]["content_hash"]
    assert out[1]["width"] == 101 and out[1]["height"] == 101


def test_image_decoder_stub_raises(media):
    import pytest as _pytest

    with _pytest.raises(Exception):  # NotImplementedError inside executors
        extract_image_features(media, fake=False).collect()


def test_audio_features_fake_decoder(media):
    out = extract_audio_features(media, fake=True).collect()
    assert len(out) == 1 and out[0]["duration_ms"] == 3000


def test_frame_sample_plan(media):
    out = frame_sample_plan(media, every_ms=1000, max_frames=16).collect()
    assert [r["frame_ts_ms"] for r in out] == [0, 1000, 2000, 3000]


def test_exact_binary_dedup(media):
    assert exact_binary_dedup(media).count() == 4


def test_near_dup_pairs_all_null_vectors_empty(spark):
    # round-4 ADVICE: null vectors must not crash the dimension probe;
    # an all-null column yields an empty result with the pair schema
    df = spark.createDataFrame(
        [(1, None), (2, None)], "id long, embedding array<double>"
    )
    out = near_dup_pairs(df, "embedding", threshold=0.9)
    assert out.collect() == []
    assert set(out.columns) == {"id1", "id2", "cosine"}


def test_near_dup_pairs_ignores_null_rows(vectors, spark):
    withnull = vectors.union(
        spark.createDataFrame([(9, None)], "id long, embedding array<double>")
    )
    got = {
        (r["id1"], r["id2"])
        for r in near_dup_pairs(withnull, "embedding", threshold=0.95).collect()
    }
    assert (1, 2) in got and all(9 not in p for p in got)


def test_ivf_build_skew_ordered_sample(spark):
    # round-4 ADVICE: the k-means fit must sample uniformly, not take the
    # first partitions. Data arrives sorted so cluster A fills the early
    # partitions; limit()-based sampling would fit centroids on A only.
    import numpy as np

    rng = np.random.RandomState(7)
    a = rng.normal([10, 0, 0], 0.1, size=(500, 3))
    b = rng.normal([0, 10, 0], 0.1, size=(500, 3))
    rows = [(i, v.tolist()) for i, v in enumerate(np.concatenate([a, b]))]
    df = spark.createDataFrame(
        rows, "id long, embedding array<double>"
    ).repartitionByRange(8, "id")  # sorted -> cluster A in first partitions
    assigned, cents = ivf_build(
        df, "embedding", n_clusters=2, sample=100, iters=10
    )
    # both true clusters must be represented among the fitted centroids
    cents = np.array(cents)
    assert any(c[0] > 5 for c in cents) and any(c[1] > 5 for c in cents)
    # null vectors rejected cleanly
    nulls = spark.createDataFrame([(1, None)], "id long, embedding array<double>")
    with pytest.raises(ValueError, match="non-null"):
        ivf_build(nulls, "embedding", n_clusters=2, sample=10)


def test_real_image_decoders_parse_headers():
    # round-4: decoders are real — dimensions come from the container
    # headers, no imaging library needed
    from pycypher_nmetl_spark.llmops.multimodal import (
        decode_image, synth_bmp, synth_gif, synth_jpeg, synth_png,
    )

    assert decode_image(synth_png(101, 77)) == (101, 77)
    assert decode_image(synth_gif(320, 200)) == (320, 200)
    assert decode_image(synth_bmp(64, 48)) == (64, 48)
    assert decode_image(synth_jpeg(1920, 1080)) == (1920, 1080)
    with pytest.raises(NotImplementedError, match="unrecognized image"):
        decode_image(b"not an image")


def test_real_audio_decoder_parses_wav():
    from pycypher_nmetl_spark.llmops.multimodal import decode_audio, synth_wav

    assert decode_audio(synth_wav(8000, 16000)) == (500, 16000)
    assert decode_audio(synth_wav(44100, 44100)) == (1000, 44100)
    with pytest.raises(NotImplementedError, match="WAV"):
        decode_audio(b"not audio")


def test_image_features_real_decoder_in_spark(spark):
    from pycypher_nmetl_spark.llmops.multimodal import (
        MEDIA_SCHEMA, extract_image_features, synth_png,
    )

    rows = [(1, "image", bytearray(synth_png(33, 21)), "image/png", {})]
    out = extract_image_features(spark.createDataFrame(rows, MEDIA_SCHEMA)).collect()
    assert len(out) == 1
    assert (out[0]["width"], out[0]["height"]) == (33, 21)


def test_ngram_jaccard_max_df_drops_hot_shingles(spark):
    # a shingle shared by EVERY doc fans out quadratically; max_df cuts
    # it while near-identical pairs still surface
    from pycypher_nmetl_spark.llmops import ngram_jaccard_pairs

    common = "the quick brown fox jumps over"
    rows = [
        (1, common + " lazy dog one"),
        (2, common + " lazy dog one"),   # exact dup of 1
        (3, common + " something else entirely here"),
        (4, common + " another unrelated tail text"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        (r.id1, r.id2)
        for r in ngram_jaccard_pairs(
            df, "doc_id", "text", threshold=0.9, max_df=0.6
        ).collect()
    }
    assert got == {(1, 2)}
    # without the cut the same pair (and only it) passes 0.9 too
    exact = {
        (r.id1, r.id2)
        for r in ngram_jaccard_pairs(df, "doc_id", "text", threshold=0.9).collect()
    }
    assert exact == {(1, 2)}


def test_ivf_build_trim_not_partition_ordered(spark):
    # round-5 ADVICE: after sample(), trimming back to `sample` rows must
    # happen driver-side with the RNG — a .limit() would keep only the
    # FIRST partitions of the sampled stream. Cluster B lives entirely in
    # the tail partitions and is wider than the oversample margin, so a
    # partition-ordered trim would drop it completely.
    import numpy as np

    rng = np.random.RandomState(11)
    a = rng.normal([10, 0, 0], 0.1, size=(700, 3))
    b = rng.normal([0, 10, 0], 0.1, size=(300, 3))
    rows = [(i, v.tolist()) for i, v in enumerate(np.concatenate([a, b]))]
    df = spark.createDataFrame(
        rows, "id long, embedding array<double>"
    ).repartitionByRange(10, "id")
    assigned, cents = ivf_build(df, "embedding", n_clusters=2, sample=60, iters=10)
    cents = np.array(cents)
    assert any(c[0] > 5 for c in cents) and any(c[1] > 5 for c in cents)


def test_ngram_jaccard_auto_cut_viral_shingle(spark):
    # round-5: default max_df="auto" bounds the hot bucket on a corpus
    # with one viral shingle while leaving pair recall unchanged — and
    # is a pure no-op below 1000 docs (identical result to exact).
    import random

    rng = random.Random(3)
    docs = []
    # 1200 docs, each ending with the same viral 3-gram; two true dups
    for i in range(1200):
        words = [f"w{rng.randrange(10_000)}" for _ in range(12)]
        docs.append((i, " ".join(words) + " visit our site now"))
    docs.append((2000, docs[0][1]))  # exact dup of doc 0
    df = spark.createDataFrame(docs, "doc_id long, text string")
    auto = ngram_jaccard_pairs(df, "doc_id", "text", k=3, threshold=0.7)
    exact = ngram_jaccard_pairs(df, "doc_id", "text", k=3, threshold=0.7, max_df=None)
    got_auto = {(r["id1"], r["id2"]) for r in auto.collect()}
    got_exact = {(r["id1"], r["id2"]) for r in exact.collect()}
    assert (0, 2000) in got_auto
    assert got_auto == got_exact  # recall unchanged by the auto cut


# ------------------------------------------------------------------ #
# round-7: dense-cluster defenses in near_dup_pairs
# ------------------------------------------------------------------ #
def _clustered_vectors(spark, n_per=60, n_clusters=4, dim=16, spread=0.45, seed=7):
    """Clusters whose internal cosine hovers BELOW a high threshold —
    the correlated-corpus shape that made the verify stage superlinear
    (gen10x exponent 1.44 before the codegen prefilter)."""
    import random

    rnd = random.Random(seed)
    rows = []
    for c in range(n_clusters):
        center = [2.0 if d % n_clusters == c else 0.0 for d in range(dim)]
        for i in range(n_per):
            rows.append(
                (
                    c * n_per + i,
                    [x + rnd.gauss(0, spread) for x in center],
                )
            )
    return spark.createDataFrame(rows, "id long, embedding array<double>")


def test_near_dup_prefilter_recall_pinned_on_clustered(spark):
    # below-threshold cluster pairs are rejected by the codegen Hamming
    # prefilter; every pair the exact baseline finds must survive it
    df = _clustered_vectors(spark)
    t = 0.95
    exact = {
        (r.id1, r.id2, round(r.cosine, 9))
        for r in near_dup_pairs(df, "embedding", threshold=t, exact=True).collect()
    }
    got = {
        (r.id1, r.id2, round(r.cosine, 9))
        for r in near_dup_pairs(df, "embedding", threshold=t).collect()
    }
    assert got == exact


def test_near_dup_prefilter_disabled_matches_too(spark):
    df = _clustered_vectors(spark, n_per=30)
    t = 0.9
    base = {
        (r.id1, r.id2)
        for r in near_dup_pairs(df, "embedding", threshold=t, exact=True).collect()
    }
    no_pre = {
        (r.id1, r.id2)
        for r in near_dup_pairs(
            df, "embedding", threshold=t, prefilter_bits=0
        ).collect()
    }
    assert no_pre == base


def test_near_dup_bucket_cap_accounting(spark):
    # 300 identical vectors flood every band's bucket; with cap=50 the
    # stats DataFrame must report every over-cap (band, bucket) and the
    # dropped membership count, and surviving pairs stay transitively
    # connected enough to recover the cluster via components
    rows = [(i, [1.0, 0.0, 0.0, 0.0]) for i in range(300)]
    rows += [(1000, [0.0, 1.0, 0.0, 0.0])]  # singleton far away
    df = spark.createDataFrame(rows, "id long, embedding array<double>")
    pairs, stats = near_dup_pairs(
        df, "embedding", threshold=0.99, bucket_cap=50, return_cap_stats=True
    )
    st = stats.collect()
    assert st, "over-cap buckets must be reported"
    assert all(r["size"] == 300 and r["dropped"] == 250 for r in st)
    # identical vectors share every band signature -> one bucket per band
    assert len(st) == 32
    got = pairs.collect()
    # capped: each band keeps a DIFFERENT salted top-50, and the
    # survival-aware dedup (round-8) emits a pair from its first band
    # where both ids survive — so coverage is the union over bands,
    # bounded by bands * C(50,2), far better than the single band's
    # C(50,2) the round-7 rule was limited to
    assert 0 < len(got) <= 32 * (50 * 49 // 2)
    assert all(r.cosine == pytest.approx(1.0) for r in got)
    # the flood stays one connected component for downstream dedup
    parent = {i: i for i in range(300)}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for r in got:
        parent[find(r.id1)] = find(r.id2)
    touched = {i for r in got for i in (r.id1, r.id2)}
    assert len({find(i) for i in touched}) == 1


def test_near_dup_cap_stats_empty_when_under_cap(vectors):
    pairs, stats = near_dup_pairs(
        vectors, "embedding", threshold=0.95, return_cap_stats=True
    )
    assert stats.collect() == []
    assert len(pairs.collect()) > 0


def test_near_dup_components_recovers_clusters(spark):
    from pycypher_nmetl_spark.llmops import near_dup_components

    rows = [(i, [1.0, 0.001 * i, 0.0]) for i in range(10)]       # cluster A
    rows += [(100 + i, [0.0, 1.0, 0.001 * i]) for i in range(10)]  # cluster B
    rows += [(500, [0.0, 0.0, 1.0])]                               # singleton
    df = spark.createDataFrame(rows, "id long, embedding array<double>")
    comp = {r.id: r.component for r in
            near_dup_components(df, "embedding", threshold=0.999).collect()}
    assert {comp[i] for i in range(10)} == {0}
    assert {comp[100 + i] for i in range(10)} == {100}
    assert comp[500] == 500


def test_near_dup_audit_event_on_cap(spark):
    import logging

    from pycypher_nmetl_spark import audit

    records = []

    class _H(logging.Handler):
        def emit(self, record):
            records.append(record.getMessage())

    audit.enable_audit_log(_H())
    try:
        df = spark.createDataFrame(
            [(1, [1.0, 0.0]), (2, [0.9, 0.1])], "id long, embedding array<double>"
        )
        near_dup_pairs(df, "embedding", threshold=0.9)
        # round-8: no bucket exceeds the cap -> capping (and its two
        # window exchanges) is skipped entirely, so no cap event fires;
        # nothing was dropped, so there is nothing to account
        assert not any("near_dup_bucket_cap" in r for r in records)
        # a flood that binds the cap DOES emit the accounting event
        flood = spark.createDataFrame(
            [(i, [1.0, 0.0]) for i in range(200)],
            "id long, embedding array<double>",
        )
        near_dup_pairs(flood, "embedding", threshold=0.9, bucket_cap=50)
    finally:
        audit.disable_audit_log()
    assert any("near_dup_bucket_cap" in r for r in records)


def test_near_dup_exact_honors_return_cap_stats(vectors):
    # exact=True must return the same (pairs, stats) shape as the LSH
    # path when return_cap_stats=True (stats empty: no buckets exist)
    pairs, stats = near_dup_pairs(
        vectors, "embedding", threshold=0.95, exact=True, return_cap_stats=True
    )
    got = {(r["id1"], r["id2"]) for r in pairs.collect()}
    assert (1, 2) in got
    assert stats.columns == ["band", "bucket", "size", "dropped"]
    assert stats.count() == 0


def test_near_dup_components_tolerates_cap_stats_kwarg(vectors):
    from pycypher_nmetl_spark.llmops.similarity import near_dup_components

    comp = {
        r["id"]: r["component"]
        for r in near_dup_components(
            vectors, "embedding", threshold=0.95, return_cap_stats=True
        ).collect()
    }
    assert comp[1] == comp[2] == comp[5]
    assert comp[3] == 3 and comp[4] == 4


# ------------------------------------------------------------------ #
# Eval-set decontamination

@pytest.fixture()
def contam(spark):
    from pycypher_nmetl_spark.llmops import contamination_pairs  # noqa: F401

    train = spark.createDataFrame(
        [
            # contains all 3 eval trigrams -> contamination 1.0
            (1, "intro text alpha beta gamma delta epsilon closing remarks"),
            # shares exactly one eval trigram -> 1/3
            (2, "xx alpha beta gamma yy"),
            (3, "totally unrelated content here"),
        ],
        "doc_id long, text string",
    )
    eval_df = spark.createDataFrame(
        [
            (100, "alpha beta gamma delta epsilon"),  # 3 distinct trigrams
            (101, "one two"),  # shorter than n -> no n-grams, no pairs
        ],
        "doc_id long, text string",
    )
    return train, eval_df


def test_contamination_fraction_directional(contam):
    from pycypher_nmetl_spark.llmops import contamination_pairs

    train, eval_df = contam
    out = {
        (r["train_id"], r["eval_id"]): r
    for r in contamination_pairs(train, eval_df, n=3).collect()}
    assert set(out) == {(1, 100), (2, 100)}
    assert out[(1, 100)]["shared"] == 3
    assert out[(1, 100)]["eval_ngrams"] == 3
    assert out[(1, 100)]["contamination"] == pytest.approx(1.0)
    assert out[(2, 100)]["contamination"] == pytest.approx(1 / 3)


def test_contamination_min_filter_and_shuffle_fallback(contam):
    from pycypher_nmetl_spark.llmops import contamination_pairs

    train, eval_df = contam
    out = contamination_pairs(
        train, eval_df, n=3, min_contamination=0.5, broadcast_eval=False
    ).collect()
    assert [(r["train_id"], r["eval_id"]) for r in out] == [(1, 100)]


def test_decontaminate_drops_contaminated(contam):
    from pycypher_nmetl_spark.llmops import decontaminate

    train, eval_df = contam
    kept = sorted(
        r["doc_id"] for r in decontaminate(train, eval_df, n=3, threshold=0.5).collect()
    )
    assert kept == [2, 3]
    # threshold above every pair's contamination keeps everything
    all_kept = decontaminate(train, eval_df, n=3, threshold=1.01).count()
    assert all_kept == 3


def test_contamination_plan_broadcasts_eval_one_shuffle(contam):
    """The 100 TB design constraint: the train side is never shuffled for
    the join (eval side broadcast); the only Exchange is the final
    (train_id, eval_id) aggregation."""
    import re

    from pycypher_nmetl_spark.llmops import contamination_pairs

    train, eval_df = contam
    df = contamination_pairs(train, eval_df, n=3)
    plan = df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )
    assert "BroadcastHashJoin" in plan
    assert len(re.findall(r"^\(\d+\) Exchange\b", plan, re.M)) == 1


def test_near_dup_adaptive_cap_keeps_cross_band_recall(spark):
    """Round-8: the skew-adaptive cap (candidate_budget) must not lose a
    pair that is capped out of its first-agreeing band but meets in a
    later band — the survival-aware dedup nulls capped-out bands per id
    so the emission band is the first band where BOTH ids survive AND
    agree. A hot near-identical flood plus two moderately-similar
    outlier vectors: the flood forces a small cap, the outlier pair
    must still be found."""
    import random

    rnd = random.Random(11)
    # 500 near-identical vectors (one hot bucket in every band)
    rows = [
        (i, [1.0 + rnd.gauss(0, 0.001), 0.0, 0.0, 0.0]) for i in range(500)
    ]
    # a distinct pair far from the flood, clearly above threshold
    rows += [(9001, [0.0, 1.0, 0.1, 0.0]), (9002, [0.0, 1.0, 0.11, 0.0])]
    df = spark.createDataFrame(rows, "id long, embedding array<double>")
    got = {
        (r.id1, r.id2)
        for r in near_dup_pairs(
            df, "embedding", threshold=0.99, bucket_cap=50,
            candidate_budget=8,
        ).collect()
    }
    assert (9001, 9002) in got
    # flood pairs that survive are still correct (precision exact)
    assert all(i1 < 500 and i2 < 500 or (i1, i2) == (9001, 9002)
               for i1, i2 in got)


def test_near_dup_adaptive_cap_binds_on_skew(spark):
    """candidate_budget picks a cap below bucket_cap when the measured
    bucket histogram predicts over-budget candidates; the audit event
    records the effective cap."""
    import logging

    from pycypher_nmetl_spark import audit as audit_mod

    rows = [(i, [1.0, 0.0, 0.0, 0.0]) for i in range(400)]
    df = spark.createDataFrame(rows, "id long, embedding array<double>")
    recs = []
    h = logging.Handler()
    h.emit = lambda r: recs.append(r.getMessage())
    audit_mod.enable_audit_log(h)
    try:
        near_dup_pairs(
            df, "embedding", threshold=0.99, candidate_budget=4
        ).count()
    finally:
        audit_mod.disable_audit_log()
    cap_events = [m for m in recs if "near_dup_bucket_cap" in m]
    assert cap_events
    # 400-member buckets x 32 bands with budget 4*(401*32) rows predicts
    # far over; the chosen cap must be well below the 4096 default
    assert "bucket_cap_4096" not in cap_events[-1]


# ------------------------------------------------------------------ #
# round-8: repetition signals, PII scrub, URL canonicalization
# ------------------------------------------------------------------ #
def test_repetition_signals(spark):
    from pycypher_nmetl_spark.llmops import add_repetition_signals

    df = spark.createDataFrame(
        [
            (1, "unique line one\nunique line two\nunique line three"),
            (2, "same\nsame\nsame\nsame"),
            (3, "spam spam spam spam ham"),
        ],
        "id long, text string",
    )
    out = {r["id"]: r for r in add_repetition_signals(df, "text").collect()}
    assert out[1]["dup_line_frac"] == 0.0
    assert out[2]["dup_line_frac"] == 0.75  # 3 of 4 lines are repeats
    assert out[3]["dup_token_frac"] == 0.6  # 5 tokens, 2 distinct
    assert out[3]["top_token_frac"] == 0.8  # 'spam' is 4 of 5
    assert out[1]["max_line_len"] == len("unique line three")


def test_scrub_pii_masks_and_counts(spark):
    from pycypher_nmetl_spark.llmops import scrub_pii

    df = spark.createDataFrame(
        [
            (1, "mail me at jo.doe+x@example.co.uk or call 415-555-1234."),
            (2, "server 10.1.2.3 ssn 123-45-6789"),
            (3, "clean text, no identifiers here"),
        ],
        "id long, text string",
    )
    out = {r["id"]: r for r in scrub_pii(df, "text", out="masked").collect()}
    assert "<EMAIL>" in out[1]["masked"] and "example.co.uk" not in out[1]["masked"]
    assert "<PHONE>" in out[1]["masked"]
    assert "<IP>" in out[2]["masked"] and "<SSN>" in out[2]["masked"]
    assert out[3]["masked"] == out[3]["text"]
    assert out[1]["pii_hits"] >= 2 and out[3]["pii_hits"] == 0
    # in-place masking (no out column) keeps the original column name
    inplace = scrub_pii(df, "text").collect()
    assert all("@" not in r["text"] for r in inplace)


def test_url_canonicalization(spark):
    from pycypher_nmetl_spark.llmops import add_url_canonical

    df = spark.createDataFrame(
        [
            (1, "HTTPS://Example.COM/Path/?utm_source=x&b=2&a=1#frag"),
            (2, "https://example.com/Path?a=1&b=2"),
            (3, "http://example.com/dir/"),
        ],
        "id long, url string",
    )
    out = {r["id"]: r["url_canonical"] for r in add_url_canonical(df, "url").collect()}
    # tracking params stripped, remaining query sorted, fragment gone,
    # scheme+host lowercased, trailing slash trimmed -> 1 == 2
    assert out[1] == out[2] == "https://example.com/Path?a=1&b=2"
    assert out[3] == "http://example.com/dir"


def test_brute_force_topk_many(vectors, spark):
    """Batched exact retrieval: per-query top-k must equal the
    single-query brute_force_topk for every query vector, and the plan
    must broadcast the query frame (corpus never shuffled for the
    scoring pass)."""
    from pycypher_nmetl_spark.llmops import brute_force_topk, brute_force_topk_many

    queries = spark.createDataFrame(
        [(100, [1.0, 0.0, 0.0]), (200, [0.0, 1.0, 0.0])],
        "query_id long, query_vec array<double>",
    )
    out = brute_force_topk_many(vectors, "embedding", queries, k=2)
    got = {
        qid: [(r["id"], round(r["cosine"], 9)) for r in rows]
        for qid, rows in (
            (q, sorted(
                [r for r in out.collect() if r["query_id"] == q],
                key=lambda r: (-r["cosine"], r["id"]),
            ))
            for q in (100, 200)
        )
    }
    for qid, vec in ((100, [1.0, 0.0, 0.0]), (200, [0.0, 1.0, 0.0])):
        want = [
            (r["id"], round(r["cosine"], 9))
            for r in brute_force_topk(vectors, "embedding", vec, k=2).collect()
        ]
        assert got[qid] == want, (qid, got[qid], want)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastHashJoin" in plan


# --------------------------------------------------------------------- #
# exact-substring dedup (Lee et al. 2021 ExactSubstr) — round 9
# --------------------------------------------------------------------- #
@pytest.fixture()
def passage_docs(spark):
    """Planted duplicated passages: docs 1/2 share a 6-token passage,
    doc 3 repeats one internally, doc 4 is clean, doc 5 is too short
    to hold any window."""
    return spark.createDataFrame(
        [
            (1, "a b c p q r s t u d e f"),
            (2, "g h p q r s t u i j k l"),
            (3, "x y z w v u m n x y z w v u o"),
            (4, "one two three four five six seven eight"),
            (5, "tiny doc"),
        ],
        "doc_id long, text string",
    )


def test_exact_substring_pairs_recall(passage_docs):
    from pycypher_nmetl_spark.llmops import exact_substring_pairs

    got = sorted(
        tuple(r) for r in
        exact_substring_pairs(passage_docs, "doc_id", "text", window=6).collect()
    )
    assert got == [(1, 2, 1)]  # the planted cross-doc passage, found once


def test_duplicate_spans_merge_and_policies(passage_docs):
    from pycypher_nmetl_spark.llmops import duplicate_spans

    spans = sorted(
        tuple(r) for r in
        duplicate_spans(passage_docs, "doc_id", "text", window=6).collect()
    )
    # "p q r s t u" at 1:4 and 2:3; doc 3's repeat at 1 and 9
    assert spans == [(1, 4, 9), (2, 3, 8), (3, 1, 6), (3, 9, 14)]

    first = sorted(
        tuple(r) for r in
        duplicate_spans(
            passage_docs, "doc_id", "text", window=6, keep="first"
        ).collect()
    )
    # canonical (min doc, min pos) occurrences survive
    assert first == [(2, 3, 8), (3, 9, 14)]

    with pytest.raises(ValueError, match="keep"):
        duplicate_spans(passage_docs, "doc_id", "text", window=6, keep="bogus")


def test_exact_substring_dedup_roundtrip(passage_docs):
    from pycypher_nmetl_spark.llmops import exact_substring_dedup

    out = {
        r["doc_id"]: r["text"]
        for r in exact_substring_dedup(
            passage_docs, "doc_id", "text", window=6
        ).collect()
    }
    assert out == {
        1: "a b c d e f",
        2: "g h i j k l",
        3: "m n o",
        4: "one two three four five six seven eight",  # byte-identical
        5: "tiny doc",
    }
    kept_first = {
        r["doc_id"]: r["text"]
        for r in exact_substring_dedup(
            passage_docs, "doc_id", "text", window=6, keep="first"
        ).collect()
    }
    assert kept_first[1] == "a b c p q r s t u d e f"  # one copy survives
    assert kept_first[2] == "g h i j k l"
    assert kept_first[3] == "x y z w v u m n o"


def test_exact_substring_overlapping_spans_merge(spark):
    """Duplicated windows whose token ranges overlap (start gap <= window)
    must merge into ONE span, not leave a gap-free pair of spans."""
    from pycypher_nmetl_spark.llmops import duplicate_spans

    # two docs share the 8-token passage "p1..p8": with window=6 the
    # shared region produces 3 overlapping duplicated windows per doc
    docs = spark.createDataFrame(
        [
            (1, "a b p1 p2 p3 p4 p5 p6 p7 p8 c d"),
            (2, "e p1 p2 p3 p4 p5 p6 p7 p8 f g h"),
        ],
        "doc_id long, text string",
    )
    spans = sorted(
        tuple(r) for r in
        duplicate_spans(docs, "doc_id", "text", window=6).collect()
    )
    assert spans == [(1, 3, 10), (2, 2, 9)]  # exactly the shared passage


def test_exact_substring_hot_window_cut(spark):
    """Pairs op drops boilerplate windows present in > max_count docs
    (accounted via hot_windows); span/cut path is unaffected."""
    from pycypher_nmetl_spark.llmops import (
        exact_substring_pairs, hot_windows,
    )

    boiler = "this boilerplate footer text appears in every single document here"
    docs = spark.createDataFrame(
        [(i, f"unique{i} " + boiler) for i in range(6)],
        "doc_id long, text string",
    )
    # every doc shares the 10-token boilerplate window
    all_pairs = exact_substring_pairs(docs, "doc_id", "text", window=10)
    assert all_pairs.count() == 15  # 6 choose 2
    cut = exact_substring_pairs(docs, "doc_id", "text", window=10, max_count=5)
    assert cut.count() == 0
    hot = hot_windows(docs, "doc_id", "text", window=10, max_count=5).collect()
    assert len(hot) == 1 and hot[0]["n_docs"] == 6


# --------------------------------------------------------------------- #
# byte-level BPE token counting — round 9
# --------------------------------------------------------------------- #
FIXTURE_CORPUS = [
    "the quick brown fox jumps over the lazy dog",
    "the lazy dog sleeps while the quick fox runs",
    "I'm sure they'll be quick, won't they?",
    "numbers 123 and 456 mixed with words",
    "  leading spaces\tand\nnewlines  ",
    "répétition of accented élève tokens, naïve café",
    "",
]


def _reference_bpe_encode(text, ranks):
    """Independent reference: index-based lowest-rank merging (a
    different implementation shape from llmops.bpe.bpe_piece's
    rebuild-the-list loop) over the same byte-encoded pre-tokens."""
    from pycypher_nmetl_spark.llmops.bpe import bytes_to_unicode, pre_tokenize

    b2u = bytes_to_unicode()
    out = []
    for piece in pre_tokenize(text):
        enc = "".join(b2u[b] for b in piece.encode("utf-8"))
        parts = list(enc)
        while len(parts) > 1:
            ranked = [
                (ranks[(parts[i], parts[i + 1])], i)
                for i in range(len(parts) - 1)
                if (parts[i], parts[i + 1]) in ranks
            ]
            if not ranked:
                break
            _, i = min(ranked)
            parts[i : i + 2] = [parts[i] + parts[i + 1]]
        out.extend(parts)
    return out


def test_bpe_pre_tokenize_gpt2_shapes():
    from pycypher_nmetl_spark.llmops.bpe import pre_tokenize

    assert pre_tokenize("Hello world, I'm 2 cats!") == [
        "Hello", " world", ",", " I", "'m", " 2", " cats", "!",
    ]
    assert pre_tokenize("a  b") == ["a", " ", " b"]
    assert pre_tokenize("a\nb") == ["a", "\n", "b"]
    assert pre_tokenize("tab\t x") == ["tab", "\t", " x"]
    assert pre_tokenize("") == []
    # every split is a partition of the input
    for t in FIXTURE_CORPUS:
        assert "".join(pre_tokenize(t)) == t


def test_bpe_encode_matches_independent_reference(tmp_path):
    from pycypher_nmetl_spark.llmops.bpe import (
        count_tokens, encode, load_merges, save_merges, train_bpe_merges,
    )

    merges = train_bpe_merges(FIXTURE_CORPUS * 3, n_merges=80)
    assert len(merges) > 20
    p = str(tmp_path / "merges.txt")
    save_merges(merges, p)
    ranks = load_merges(p)
    assert list(ranks) == merges  # save/load roundtrip preserves rank order
    for t in FIXTURE_CORPUS + ["unseen wörds he'll 789 zap!"]:
        got = encode(t, ranks)
        want = _reference_bpe_encode(t, ranks)
        assert got == want, (t, got, want)
        assert count_tokens(t, ranks) == len(want)
        # merging never crosses pre-token boundaries: decode roundtrip
        rev = {v: k for k, v in
               __import__("pycypher_nmetl_spark.llmops.bpe",
                          fromlist=["bytes_to_unicode"]).bytes_to_unicode().items()}
        decoded = bytes(rev[c] for tok in got for c in tok).decode("utf-8")
        assert decoded == t


def test_bpe_distributed_count_matches_local(spark, tmp_path):
    from pycypher_nmetl_spark.llmops.bpe import (
        count_tokens, load_merges, save_merges, train_bpe_merges,
    )
    from pycypher_nmetl_spark.llmops.textstats import add_token_count

    p = str(tmp_path / "merges.txt")
    save_merges(train_bpe_merges(FIXTURE_CORPUS * 3, n_merges=60), p)
    ranks = load_merges(p)
    rows = [(i, t) for i, t in enumerate(FIXTURE_CORPUS)] + [(99, None)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = add_token_count(df, "text", tokenizer="bpe", merges_path=p)
    got = {r["doc_id"]: r["n_tokens_bpe"] for r in out.collect()}
    for i, t in enumerate(FIXTURE_CORPUS):
        assert got[i] == count_tokens(t, ranks), (i, t)
    assert got[99] == 0  # null text counts 0
    # the ws estimate columns are still present (default path untouched)
    assert {"n_tokens", "n_tokens_bpe_est", "n_tokens_bpe"} <= set(out.columns)


def test_bpe_tokenizer_arg_validation(spark):
    from pycypher_nmetl_spark.llmops.textstats import add_token_count

    df = spark.createDataFrame([(1, "x")], "doc_id long, text string")
    with pytest.raises(ValueError, match="merges_path"):
        add_token_count(df, "text", tokenizer="bpe")
    with pytest.raises(ValueError, match="unknown tokenizer"):
        add_token_count(df, "text", tokenizer="wordpiece")


# --------------------------------------------------------------------- #
# paragraph-granularity near-dup — round 9
# --------------------------------------------------------------------- #
@pytest.fixture()
def para_docs(spark):
    """Planted cross-doc near-duplicate paragraph (one word differs),
    an exact within-doc repeat, a clean doc, and a whitespace-only doc."""
    return spark.createDataFrame(
        [
            (1, "unique intro one\nthe quick brown fox jumps over the lazy dog today\nclosing one"),
            (2, "other intro two\nthe quick brown fox jumps over the lazy cat today\nclosing two"),
            (3, "repeated paragraph body with many words here\nmiddle bit\nrepeated paragraph body with many words here"),
            (4, "totally unrelated content\nwith other paragraphs"),
            (5, "\n\n"),
        ],
        "doc_id long, text string",
    )


def test_paragraph_near_dup_pairs_planted(para_docs):
    from pycypher_nmetl_spark.llmops import paragraph_near_dup_pairs

    got = sorted(
        (r["doc_id1"], r["para_idx1"], r["doc_id2"], r["para_idx2"])
        for r in paragraph_near_dup_pairs(
            para_docs, "doc_id", "text", threshold=0.5
        ).collect()
    )
    # the planted cross-doc pair and the exact within-doc repeat
    assert got == [(1, 1, 2, 1), (3, 0, 3, 2)]


def test_cut_duplicate_paragraphs_keeps_first(para_docs):
    from pycypher_nmetl_spark.llmops import cut_duplicate_paragraphs

    out = {
        r["doc_id"]: r["text"]
        for r in cut_duplicate_paragraphs(
            para_docs, "doc_id", "text", threshold=0.5
        ).collect()
    }
    # canonical doc keeps its paragraph byte-identical
    assert out[1] == (
        "unique intro one\nthe quick brown fox jumps over the lazy dog today\nclosing one"
    )
    assert out[2] == "other intro two\n\nclosing two"
    assert out[3] == "repeated paragraph body with many words here\n\nmiddle bit"
    assert out[4] == "totally unrelated content\nwith other paragraphs"  # untouched
    assert out[5] == "\n\n"  # no non-empty paragraphs: untouched


# ------------------------- n-gram LM perplexity -------------------------

_LM_TRAIN = {
    101: "the cat sat on the mat",
    102: "the cat sat",
    103: "a dog sat on a rug",
    104: "the dog ran to the mat",
}
_LM_SCORE = {
    1: "the cat sat on the mat",       # in-domain
    2: "the dog sat on the rug",       # near-domain
    3: "zzz qqq www eee rrr ttt",      # gibberish, all OOV
    4: "",                             # empty: null scores
}


@pytest.fixture(scope="module")
def lm_frames(spark):
    train = spark.createDataFrame(
        [(k, v) for k, v in _LM_TRAIN.items()], ["doc_id", "text"]
    )
    score = spark.createDataFrame(
        [(k, v) for k, v in _LM_SCORE.items()], ["doc_id", "text"]
    )
    return train, score


def test_lm_spark_matches_local_reference(lm_frames):
    from pycypher_nmetl_spark.llmops import (
        add_lm_perplexity, score_ngram_lm_local,
    )

    train, score = lm_frames
    for n in (1, 2, 3):
        want = score_ngram_lm_local(_LM_SCORE, _LM_TRAIN, n=n)
        got = {
            r["doc_id"]: (r["n_scored"], r["lm_avg_logprob"], r["ppl"])
            for r in add_lm_perplexity(
                score, "text", n=n, train_df=train
            ).collect()
        }
        assert set(got) == set(want)
        for did, (wn, wl, wp) in want.items():
            gn, gl, gp = got[did]
            if wl is None:
                assert gl is None and gp is None
            else:
                assert gn == wn
                assert abs(gl - wl) < 1e-9, (n, did, gl, wl)
                assert abs(gp - wp) < 1e-6 * wp


def test_lm_discriminates_gibberish(lm_frames):
    from pycypher_nmetl_spark.llmops import add_lm_perplexity

    train, score = lm_frames
    ppl = {
        r["doc_id"]: r["ppl"]
        for r in add_lm_perplexity(score, "text", n=2, train_df=train).collect()
    }
    assert ppl[3] > ppl[2] > ppl[1]  # gibberish >> near-domain > in-domain


def test_lm_train_counts_hand_checked(spark):
    from pycypher_nmetl_spark.llmops import train_ngram_lm

    df = spark.createDataFrame([("a b a b a",), ("b c",)], ["text"])
    model, total, vocab = train_ngram_lm(df, "text", n=2)
    assert (total, vocab) == (7, 3)
    counts = {(r["order"], r["gram"]): r["count"] for r in model.collect()}
    assert counts[(1, "a")] == 3 and counts[(1, "b")] == 3 and counts[(1, "c")] == 1
    assert counts[(2, "a b")] == 2 and counts[(2, "b a")] == 2
    assert counts[(2, "b c")] == 1
    assert (2, "c b") not in counts


def test_lm_arg_validation(lm_frames):
    from pycypher_nmetl_spark.llmops import score_ngram_lm, train_ngram_lm

    train, score = lm_frames
    with pytest.raises(ValueError, match="n must be"):
        train_ngram_lm(train, "text", n=0)
    model, total, vocab = train_ngram_lm(train, "text", n=2)
    with pytest.raises(ValueError, match="alpha"):
        score_ngram_lm(score, "text", model, total, vocab, alpha=0.0)
    with pytest.raises(ValueError, match="empty model"):
        score_ngram_lm(score, "text", model, 0, 0)


def test_lm_broadcast_gate_plan(lm_frames):
    """Small models broadcast (no shuffle of the scoring side for the
    joins); the plan must show BroadcastHashJoin when model_rows is
    under the gate and none when forced above it."""
    from pycypher_nmetl_spark.llmops import score_ngram_lm, train_ngram_lm

    train, score = lm_frames
    model, total, vocab = train_ngram_lm(train, "text", n=2)
    small = score_ngram_lm(
        score, "text", model, total, vocab, model_rows=10
    )._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in small
    big = score_ngram_lm(
        score, "text", model, total, vocab, model_rows=10**9
    )._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" not in big


def test_lm_self_scoring_sf0001(spark):
    """Self-scored corpus (the gate setup): every non-empty doc gets a
    finite score, and an exact duplicate pair scores identically."""
    from pycypher_nmetl_spark.llmops import add_lm_perplexity

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    out = add_lm_perplexity(docs, "text", n=2).collect()
    assert len(out) == docs.count()
    for r in out:
        if r["n_scored"]:
            assert r["ppl"] is not None and r["ppl"] >= 1.0


def test_lm_short_docs_do_not_crash(spark):
    """Regression: Spark's sequence(1, 0) is DESCENDING [1, 0]; un-
    guarded, gram windows over docs shorter than the order crashed
    slice() with start=0."""
    from pycypher_nmetl_spark.llmops import (
        add_lm_perplexity, score_ngram_lm_local,
    )

    texts = {1: "", 2: "one", 3: "a b", 4: "x y z w"}
    df = spark.createDataFrame(list(texts.items()), ["doc_id", "text"])
    got = {
        r["doc_id"]: (r["n_scored"], r["lm_avg_logprob"])
        for r in add_lm_perplexity(df, "text", n=3).collect()
    }
    want = score_ngram_lm_local(texts, n=3)
    for did, (wn, wl, _) in want.items():
        gn, gl = got[did]
        if wl is None:
            assert gl is None
        else:
            assert gn == wn and abs(gl - wl) < 1e-9


# ------------------------- DSIR importance resampling -------------------------

_DSIR_TARGET = {
    201: "physics energy momentum quantum field theory",
    202: "quantum entanglement energy levels in the field",
    203: "momentum conservation and energy in physics",
}
_DSIR_RAW = {
    1: "quantum field energy and momentum physics notes",   # in-domain
    2: "the cat sat on the mat with the dog",               # off-domain
    3: "recipe for chocolate cake with butter and sugar",   # off-domain
    4: "energy momentum tensor in quantum field theory",    # in-domain
    5: "",                                                  # empty: logw 0
}


@pytest.fixture(scope="module")
def dsir_frames(spark):
    raw = spark.createDataFrame(list(_DSIR_RAW.items()), ["doc_id", "text"])
    target = spark.createDataFrame(
        [(k, v) for k, v in _DSIR_TARGET.items()], ["doc_id", "text"]
    )
    return raw, target


def test_dsir_weights_match_local_reference(dsir_frames):
    from pycypher_nmetl_spark.llmops.dsir import (
        dsir_local, dsir_log_ratios, dsir_weights,
    )

    raw, target = dsir_frames
    want = dsir_local(_DSIR_RAW, _DSIR_TARGET, buckets=1000)
    ratios = dsir_log_ratios(target, raw, "text", buckets=1000, hash_fn="md5")
    got = {
        r["doc_id"]: (r["n_features"], r["logw"])
        for r in dsir_weights(
            raw, "doc_id", "text", ratios, buckets=1000, hash_fn="md5"
        ).collect()
    }
    assert set(got) == set(want)
    for did, (wn, wl) in want.items():
        gn, gl = got[did]
        assert gn == wn, (did, gn, wn)
        assert abs(gl - wl) < 1e-9, (did, gl, wl)


def test_dsir_prefers_in_domain(dsir_frames):
    from pycypher_nmetl_spark.llmops.dsir import dsir_resample

    raw, target = dsir_frames
    # noiseless top-k: the two in-domain docs win outright
    sel = dsir_resample(raw, target, k=2, buckets=1000, hash_fn="md5", gumbel=False)
    picked = {r["doc_id"] for r in sel.collect()}
    assert picked == {1, 4}
    # Gumbel sampling is deterministic for a fixed seed (hash noise) —
    # on a 5-doc fixture the noise can outvote the weights, so assert
    # reproducibility + size, not membership
    g1 = {
        r["doc_id"]
        for r in dsir_resample(raw, target, k=2, buckets=1000, hash_fn="md5").collect()
    }
    g2 = {
        r["doc_id"]
        for r in dsir_resample(raw, target, k=2, buckets=1000, hash_fn="md5").collect()
    }
    assert g1 == g2 and len(g1) == 2
    other = dsir_resample(raw, target, k=3, seed=7, buckets=1000, hash_fn="md5")
    assert other.count() == 3


def test_dsir_empty_doc_weight_zero(dsir_frames):
    from pycypher_nmetl_spark.llmops.dsir import dsir_log_ratios, dsir_weights

    raw, target = dsir_frames
    ratios = dsir_log_ratios(target, raw, "text", buckets=500, hash_fn="md5")
    row = (
        dsir_weights(raw, "doc_id", "text", ratios, buckets=500, hash_fn="md5")
        .filter(F.col("doc_id") == 5)
        .first()
    )
    assert row["n_features"] == 0 and row["logw"] == 0.0


def test_dsir_arg_validation(dsir_frames):
    from pycypher_nmetl_spark.llmops.dsir import dsir_log_ratios, dsir_resample

    raw, target = dsir_frames
    with pytest.raises(ValueError, match="buckets"):
        dsir_log_ratios(target, raw, "text", buckets=1)
    with pytest.raises(ValueError, match="smoothing"):
        dsir_log_ratios(target, raw, "text", smoothing=0.0)
    with pytest.raises(ValueError, match="k must be"):
        dsir_resample(raw, target, k=0)
    with pytest.raises(ValueError, match="hash_fn"):
        dsir_log_ratios(target, raw, "text", hash_fn="sha9000")


def test_dsir_plan_broadcasts_ratios_and_takeordered(dsir_frames):
    """Scale shape: the ratio table is broadcast (raw side never
    shuffles for the join) and top-k plans TakeOrderedAndProject, not a
    global Sort."""
    from pycypher_nmetl_spark.llmops.dsir import dsir_resample

    raw, target = dsir_frames
    plan = (
        dsir_resample(raw, target, k=2, buckets=100)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "BroadcastHashJoin" in plan
    assert "TakeOrderedAndProject" in plan


# ------------------------- quality classifier -------------------------

_QC_POS = [
    "the theory of relativity describes gravity as curvature of spacetime",
    "a balanced essay considers evidence from multiple reliable sources",
    "the committee published its findings in a peer reviewed journal",
    "careful analysis of the data reveals a consistent long term trend",
]
_QC_NEG = [
    "click here buy now cheap pills free offer",
    "win win win casino jackpot lucky lucky spin",
    "xxx hot singles near you click click",
    "free free free buy cheap cheap offer now",
]


@pytest.fixture(scope="module")
def qc_model(spark):
    from pycypher_nmetl_spark.llmops.classifier import train_quality_classifier

    pos = spark.createDataFrame([(t,) for t in _QC_POS], ["text"])
    neg = spark.createDataFrame([(t,) for t in _QC_NEG], ["text"])
    return train_quality_classifier(pos, neg, "text", num_features=1 << 12)


def test_quality_classifier_separates(spark, qc_model):
    from pycypher_nmetl_spark.llmops.classifier import score_quality

    docs = spark.createDataFrame(
        [
            (1, "the journal published a careful analysis of the evidence"),
            (2, "buy cheap pills now free casino offer click"),
        ],
        ["doc_id", "text"],
    )
    out = {r["doc_id"]: r["quality_prob"] for r in score_quality(docs, "text", qc_model).collect()}
    assert out[1] > 0.8 > 0.2 > out[2]


def test_quality_classifier_score_is_narrow_plan(spark, qc_model):
    from pycypher_nmetl_spark.llmops.classifier import score_quality

    docs = spark.createDataFrame([(1, "some text here")], ["doc_id", "text"])
    scored = score_quality(docs, "text", qc_model)
    plan = scored._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan  # pure map: hash + dot product per row
    assert set(scored.columns) == {"doc_id", "text", "quality_prob"}


def test_quality_classifier_save_load_roundtrip(spark, qc_model, tmp_path):
    from pyspark.ml import PipelineModel

    from pycypher_nmetl_spark.llmops.classifier import score_quality

    p = str(tmp_path / "qc_model")
    qc_model.save(p)
    loaded = PipelineModel.load(p)
    docs = spark.createDataFrame([(1, "peer reviewed journal analysis")], ["doc_id", "text"])
    a = score_quality(docs, "text", qc_model).first()["quality_prob"]
    b = score_quality(docs, "text", loaded).first()["quality_prob"]
    assert abs(a - b) < 1e-12


def test_pareto_keep_deterministic_and_monotone(spark):
    from pycypher_nmetl_spark.llmops.classifier import pareto_keep

    n = 2000
    half = spark.range(n).select(
        F.col("id").alias("doc_id"), F.lit(0.95).alias("quality_prob")
    )
    low = spark.range(n).select(
        F.col("id").alias("doc_id"), F.lit(0.05).alias("quality_prob")
    )
    kept_hi = pareto_keep(half).filter("keep").count()
    kept_hi2 = pareto_keep(half).filter("keep").count()
    kept_lo = pareto_keep(low).filter("keep").count()
    assert kept_hi == kept_hi2          # hash noise: deterministic
    assert kept_hi > kept_lo            # higher score -> kept more often
    assert 0 < kept_lo < n              # but the tail still survives

    with pytest.raises(ValueError, match="alpha"):
        pareto_keep(half, alpha=0.0)


# ------------------------- BPE token ids -> packing -------------------------

def test_bpe_vocab_from_merges_structure():
    from pycypher_nmetl_spark.llmops.bpe import (
        bytes_to_unicode, train_bpe_merges, vocab_from_merges,
    )

    merges = train_bpe_merges(FIXTURE_CORPUS * 3, n_merges=40)
    ranks = {m: i for i, m in enumerate(merges)}
    vocab = vocab_from_merges(ranks)
    b2u = bytes_to_unicode()
    assert vocab[b2u[ord("a")]] == ord("a")  # byte symbols keep byte ids
    assert len(vocab) == 256 + len(merges)
    for (a, b), rank in ranks.items():
        assert vocab[a + b] == 256 + rank


def test_bpe_encode_ids_roundtrip_to_bytes(tmp_path):
    """ids -> pieces -> byte decode reproduces the input exactly."""
    from pycypher_nmetl_spark.llmops.bpe import (
        bytes_to_unicode, encode_ids, train_bpe_merges, vocab_from_merges,
    )

    merges = train_bpe_merges(FIXTURE_CORPUS * 3, n_merges=60)
    ranks = {m: i for i, m in enumerate(merges)}
    vocab = vocab_from_merges(ranks)
    inv = {i: p for p, i in vocab.items()}
    u2b = {u: b for b, u in bytes_to_unicode().items()}
    for t in FIXTURE_CORPUS:
        ids = encode_ids(t, ranks, vocab)
        decoded = bytes(
            u2b[ch] for i in ids for ch in inv[i]
        ).decode("utf-8")
        assert decoded == t


def test_bpe_token_ids_distributed_matches_local_and_packs(spark, tmp_path):
    from pycypher_nmetl_spark.llmops.bpe import (
        add_bpe_token_ids, encode_ids, load_merges, save_merges,
        train_bpe_merges, vocab_from_merges,
    )
    from pycypher_nmetl_spark.llmops.export import pack_sequences

    p = str(tmp_path / "merges.txt")
    save_merges(train_bpe_merges(FIXTURE_CORPUS * 3, n_merges=60), p)
    ranks = load_merges(p)
    vocab = vocab_from_merges(ranks)
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(FIXTURE_CORPUS)], ["doc_id", "text"]
    )
    out = add_bpe_token_ids(df, "text", p)
    got = {r["doc_id"]: r["token_ids"] for r in out.collect()}
    for i, t in enumerate(FIXTURE_CORPUS):
        assert got[i] == encode_ids(t, ranks, vocab), i
    # feed real token counts into sequence packing end-to-end
    packed = pack_sequences(
        out.select(
            F.col("doc_id").cast("string").alias("doc_id"),
            F.size("token_ids").alias("n"),
        ),
        "doc_id", "n", max_tokens=16,
    ).collect()
    packed_ids = sorted(d for r in packed for d in r["doc_ids"])
    assert packed_ids == [str(i) for i in range(len(FIXTURE_CORPUS))]
    assert all(r["seq_len"] <= 16 or len(r["doc_ids"]) == 1 for r in packed)


def test_bpe_external_vocab_file(tmp_path):
    import json

    from pycypher_nmetl_spark.llmops.bpe import (
        load_vocab, vocab_from_merges, train_bpe_merges,
    )

    merges = train_bpe_merges(FIXTURE_CORPUS * 3, n_merges=20)
    ranks = {m: i for i, m in enumerate(merges)}
    vocab = vocab_from_merges(ranks)
    p = tmp_path / "encoder.json"
    p.write_text(json.dumps(vocab))
    assert load_vocab(str(p)) == vocab


# --------------- LM / DSIR differential fuzzers (vs local refs) ---------------

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

_WORDS = ["alpha", "beta", "gamma", "delta", "x", "y", "zz", "Q", "1", "é"]
_doc_strategy = st.lists(
    st.sampled_from(_WORDS), min_size=0, max_size=12
).map(" ".join)
_corpus_strategy = st.lists(_doc_strategy, min_size=1, max_size=8)

_FUZZ = dict(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)


@settings(**_FUZZ)
@given(train=_corpus_strategy, score=_corpus_strategy, n=st.integers(1, 3))
def test_lm_differential_random_corpora(spark, train, score, n):
    from pycypher_nmetl_spark.llmops import (
        add_lm_perplexity, score_ngram_lm_local,
    )

    train_d = {i: t for i, t in enumerate(train)}
    score_d = {i: t for i, t in enumerate(score)}
    if not any(t.strip() for t in train):
        return  # empty model raises by contract (covered in arg tests)
    tdf = spark.createDataFrame(list(train_d.items()), ["doc_id", "text"])
    sdf = spark.createDataFrame(list(score_d.items()), ["doc_id", "text"])
    want = score_ngram_lm_local(score_d, train_d, n=n)
    got = {
        r["doc_id"]: (r["n_scored"], r["lm_avg_logprob"])
        for r in add_lm_perplexity(sdf, "text", n=n, train_df=tdf).collect()
    }
    for did, (wn, wl, _) in want.items():
        gn, gl = got[did]
        if wl is None:
            assert gl is None, did
        else:
            assert gn == wn and abs(gl - wl) < 1e-9, (did, gl, wl)


@settings(**_FUZZ)
@given(raw=_corpus_strategy, target=_corpus_strategy)
def test_dsir_differential_random_corpora(spark, raw, target):
    from pycypher_nmetl_spark.llmops import dsir_local, dsir_log_ratios, dsir_weights

    raw_d = {i: t for i, t in enumerate(raw)}
    target_d = {i: t for i, t in enumerate(target)}
    rdf = spark.createDataFrame(list(raw_d.items()), ["doc_id", "text"])
    tdf = spark.createDataFrame(list(target_d.items()), ["doc_id", "text"])
    want = dsir_local(raw_d, target_d, buckets=97)
    ratios = dsir_log_ratios(tdf, rdf, "text", buckets=97, hash_fn="md5")
    got = {
        r["doc_id"]: (r["n_features"], r["logw"])
        for r in dsir_weights(
            rdf, "doc_id", "text", ratios, buckets=97, hash_fn="md5"
        ).collect()
    }
    for did, (wn, wl) in want.items():
        gn, gl = got[did]
        assert gn == wn and abs(gl - wl) < 1e-9, (did, gl, wl)


# ------------------------- context-window chunking -------------------------

def test_chunk_documents_no_overlap(spark):
    from pycypher_nmetl_spark.llmops import chunk_documents

    df = spark.createDataFrame(
        [(1, "a b c d e f g"), (2, "x y"), (3, "")], ["doc_id", "text"]
    )
    rows = chunk_documents(df, "doc_id", "text", max_tokens=3).collect()
    got = {(r["doc_id"], r["chunk_idx"]): (r["chunk"], r["n_chunk_tokens"]) for r in rows}
    assert got == {
        (1, 0): ("a b c", 3),
        (1, 1): ("d e f", 3),
        (1, 2): ("g", 1),
        (2, 0): ("x y", 2),
    }  # empty doc 3 yields no rows


def test_chunk_documents_with_stride_overlap(spark):
    from pycypher_nmetl_spark.llmops import chunk_documents

    df = spark.createDataFrame([(1, "a b c d e")], ["doc_id", "text"])
    rows = chunk_documents(df, "doc_id", "text", max_tokens=3, overlap=1).collect()
    chunks = [r["chunk"] for r in sorted(rows, key=lambda r: r["chunk_idx"])]
    # stride 2: starts 1, 3 — a start at 5 would yield 'e', fully
    # contained in 'c d e' (duplicated training data; ADVICE r9)
    assert chunks == ["a b c", "c d e"]


def test_chunk_documents_no_fully_contained_trailing_window(spark):
    """Every window must contribute at least one token not covered by
    its predecessor, for every (n, max_tokens, overlap) combination —
    and the union of windows still covers the whole document."""
    from pycypher_nmetl_spark.llmops import chunk_documents

    docs = [(n, " ".join(f"t{i}" for i in range(1, n + 1))) for n in range(1, 13)]
    df = spark.createDataFrame(docs, ["doc_id", "text"])
    for max_tokens, overlap in [(3, 1), (3, 2), (4, 2), (5, 1), (2, 1)]:
        rows = chunk_documents(
            df, "doc_id", "text", max_tokens=max_tokens, overlap=overlap
        ).collect()
        by_doc: dict[int, list[str]] = {}
        for r in sorted(rows, key=lambda r: (r["doc_id"], r["chunk_idx"])):
            by_doc.setdefault(r["doc_id"], []).append(r["chunk"])
        assert set(by_doc) == {n for n, _ in docs}
        for n, chunks in by_doc.items():
            prev_end = 0
            covered: set[str] = set()
            step = max_tokens - overlap
            for i, c in enumerate(chunks):
                toks = c.split()
                start = 1 + i * step
                end = start + len(toks) - 1
                assert end > prev_end, (n, max_tokens, overlap, chunks)
                prev_end = end
                covered.update(toks)
            assert covered == {f"t{i}" for i in range(1, n + 1)}, (
                n, max_tokens, overlap, chunks,
            )


def test_chunk_documents_reconstructs_corpus(spark):
    """With zero overlap the concatenation of a doc's chunks equals the
    normalized token stream — no token lost, none duplicated."""
    from pycypher_nmetl_spark.llmops import chunk_documents

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    chunks = chunk_documents(docs, "doc_id", "text", max_tokens=7)
    # sort INSIDE the aggregate: collect_list order is not preserved
    # across the groupBy exchange
    re_joined = chunks.groupBy("doc_id").agg(
        F.concat_ws(
            " ",
            F.transform(
                F.array_sort(F.collect_list(F.struct("chunk_idx", "chunk"))),
                lambda s: s["chunk"],
            ),
        ).alias("re")
    )
    joined = docs.join(re_joined, "doc_id", "left").select(
        "doc_id",
        F.concat_ws(" ", F.filter(F.split(F.trim("text"), r"\s+"), lambda t: t != F.lit(""))).alias("want"),
        F.coalesce("re", F.lit("")).alias("got"),
    )
    bad = joined.filter(F.col("want") != F.col("got")).count()
    assert bad == 0


def test_chunk_documents_arg_validation(spark):
    from pycypher_nmetl_spark.llmops import chunk_documents

    df = spark.createDataFrame([(1, "a")], ["doc_id", "text"])
    with pytest.raises(ValueError, match="max_tokens"):
        chunk_documents(df, "doc_id", "text", max_tokens=0)
    with pytest.raises(ValueError, match="overlap"):
        chunk_documents(df, "doc_id", "text", max_tokens=3, overlap=3)


def test_chunk_documents_plan_is_narrow(spark):
    from pycypher_nmetl_spark.llmops import chunk_documents

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    plan = (
        chunk_documents(docs, "doc_id", "text", max_tokens=64)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "Exchange" not in plan  # generate over the scan, zero shuffles


def test_ivf_topk_many_matches_per_query_probe(spark):
    """Batched IVF == single-query ivf_topk per query, on the sf0.001
    embeddings with full recall settings (nprobe = n_clusters)."""
    from pycypher_nmetl_spark.llmops import (
        brute_force_topk_many, ivf_build, ivf_topk_many,
    )

    e = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    assigned, cents = ivf_build(e, "embedding", n_clusters=6, id_col="vec_id")
    queries = (
        e.filter(F.col("vec_id") < 3)
        .select(F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec"))
    )
    # nprobe == n_clusters -> probes every cluster -> must equal brute force
    exact = {
        (r["query_id"], r["vec_id"])
        for r in brute_force_topk_many(
            e, "embedding", queries, k=5, id_col="vec_id"
        ).collect()
    }
    got = {
        (r["query_id"], r["vec_id"])
        for r in ivf_topk_many(
            assigned, cents, "embedding", queries, k=5, nprobe=6, id_col="vec_id"
        ).collect()
    }
    assert got == exact
    # at nprobe=2 it stays approximate but returns k rows per query with
    # decent recall on this clustered synthetic set
    approx = ivf_topk_many(
        assigned, cents, "embedding", queries, k=5, nprobe=2, id_col="vec_id"
    )
    counts = {r["query_id"]: r["c"] for r in approx.groupBy("query_id").agg(F.count(F.lit(1)).alias("c")).collect()}
    assert all(v == 5 for v in counts.values())
    inter = {t for t in got if t in {(r["query_id"], r["vec_id"]) for r in approx.collect()}}
    assert len(inter) >= 0.6 * len(got)


def test_ivf_topk_many_corpus_not_broadcast_plan(spark):
    from pycypher_nmetl_spark.llmops import ivf_build, ivf_topk_many

    e = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    assigned, cents = ivf_build(e, "embedding", n_clusters=4, id_col="vec_id")
    queries = e.limit(2).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )
    plan = (
        ivf_topk_many(assigned, cents, "embedding", queries, k=3, id_col="vec_id")
        ._jdf.queryExecution().executedPlan().toString()
    )
    # probe map + query frame broadcast; corpus side streamed
    assert "BroadcastHashJoin" in plan


def test_ivf_topk_many_empty_queries_raises(spark):
    from pycypher_nmetl_spark.llmops import ivf_build, ivf_topk_many

    e = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    assigned, cents = ivf_build(e, "embedding", n_clusters=4, id_col="vec_id")
    empty = e.filter(F.lit(False)).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )
    with pytest.raises(ValueError, match="empty query frame"):
        ivf_topk_many(assigned, cents, "embedding", empty, k=3)


# ------------------------- incremental (ingest) dedup -------------------------

def test_minhash_against_finds_cross_corpus_dups(spark):
    from pycypher_nmetl_spark.llmops import (
        minhash_lsh_pairs_against, minhash_signatures,
    )

    corpus = spark.createDataFrame(
        [
            (1, "the quick brown fox jumps over the lazy dog"),
            (2, "completely different content about spark engines"),
            (3, "tiny"),
        ],
        "doc_id long, text string",
    )
    new = spark.createDataFrame(
        [
            (101, "the quick brown fox jumps over the lazy cat"),  # near-dup of 1
            (102, "unrelated brand new document text entirely"),
            (103, "the quick brown fox jumps over the lazy dog"),  # exact dup of 1
        ],
        "doc_id long, text string",
    )
    got = {
        (r["new_id"], r["corpus_id"])
        for r in minhash_lsh_pairs_against(
            new, corpus, "doc_id", "text", threshold=0.5
        ).collect()
    }
    assert got == {(101, 1), (103, 1)}

    # same result against a PRE-COMPUTED signatures index
    sigs = minhash_signatures(corpus, "doc_id", "text")
    got2 = {
        (r["new_id"], r["corpus_id"])
        for r in minhash_lsh_pairs_against(
            new, sigs, "doc_id", "text", threshold=0.5,
            corpus_is_signatures=True,
        ).collect()
    }
    assert got2 == got

    with pytest.raises(ValueError, match="bands"):
        minhash_lsh_pairs_against(new, corpus, "doc_id", "text", num_perm=8, bands=16)


def test_minhash_pairs_release_caches(spark):
    """ADVICE r9: repeated ingest batches must not accumulate cached
    signature frames — with eager=True (default) the pair functions
    materialize their result and unpersist everything they persisted;
    with eager=False the cache is deliberately left to the caller."""
    from pycypher_nmetl_spark.llmops import (
        minhash_lsh_pairs, minhash_lsh_pairs_against,
    )

    cm = spark._jsparkSession.sharedState().cacheManager()
    spark.catalog.clearCache()
    corpus = spark.createDataFrame(
        [(i, f"alpha beta gamma delta {i}") for i in range(20)],
        "doc_id long, text string",
    )
    new = spark.createDataFrame(
        [(100 + i, f"alpha beta gamma delta {i}") for i in range(5)],
        "doc_id long, text string",
    )
    out = minhash_lsh_pairs_against(new, corpus, "doc_id", "text", threshold=0.5)
    assert out.count() >= 5  # result survives the unpersist (checkpointed)
    assert cm.isEmpty()

    out2 = minhash_lsh_pairs(corpus, "doc_id", "text", threshold=0.9)
    out2.count()
    assert cm.isEmpty()

    lazy = minhash_lsh_pairs_against(
        new, corpus, "doc_id", "text", threshold=0.5, eager=False
    )
    lazy.count()
    assert not cm.isEmpty()  # caller-managed mode keeps the caches
    spark.catalog.clearCache()


def test_minhash_against_consistent_with_full_rerun(spark):
    """Incremental dedup of batch-vs-corpus must agree with running the
    full minhash_lsh_pairs over corpus+batch, restricted to cross pairs."""
    from pycypher_nmetl_spark.llmops import (
        minhash_lsh_pairs, minhash_lsh_pairs_against,
    )

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    corpus = docs.filter(F.col("doc_id") % 5 != 0)
    new = docs.filter(F.col("doc_id") % 5 == 0).withColumn(
        "doc_id", F.col("doc_id") + 100000
    )
    # full rerun over the union: cross pairs are those spanning the split
    full = minhash_lsh_pairs(
        corpus.unionByName(new), "doc_id", "text", threshold=0.7
    )
    cross_full = {
        (max(r["id1"], r["id2"]), min(r["id1"], r["id2"]))
        for r in full.collect()
        if (r["id1"] >= 100000) != (r["id2"] >= 100000)
    }
    inc = {
        (r["new_id"], r["corpus_id"])
        for r in minhash_lsh_pairs_against(
            new, corpus, "doc_id", "text", threshold=0.7
        ).collect()
    }
    assert inc == cross_full and len(inc) > 0


def test_exact_dedup_against_basic_and_index(spark):
    """Ingest exact dedup vs a standing corpus: duplicate content is
    dropped, fresh content survives, the precomputed content_hashes
    index gives identical results, and the result matches a DuckDB
    NOT-EXISTS oracle on the raw columns."""
    import duckdb

    from pycypher_nmetl_spark.llmops import (
        content_hashes, exact_dedup_against,
    )

    corpus_rows = [(i, f"doc body {i % 10}") for i in range(30)]
    new_rows = [(100, "doc body 3"),      # exact dup of corpus content
                (101, "doc body 999"),    # fresh
                (102, "doc body 7"),      # dup
                (103, "unseen entirely")]
    corpus = spark.createDataFrame(corpus_rows, "doc_id long, text string")
    new = spark.createDataFrame(new_rows, "doc_id long, text string")

    kept = exact_dedup_against(new, corpus, cols=["text"])
    assert sorted(r["doc_id"] for r in kept.collect()) == [101, 103]

    idx = content_hashes(corpus, ["text"])
    kept2 = exact_dedup_against(new, idx, cols=["text"], corpus_is_hashes=True)
    assert sorted(r["doc_id"] for r in kept2.collect()) == [101, 103]

    con = duckdb.connect()
    con.register("corpus", corpus.toPandas())
    con.register("new", new.toPandas())
    oracle = sorted(
        t[0] for t in con.execute(
            "SELECT doc_id FROM new n WHERE NOT EXISTS "
            "(SELECT 1 FROM corpus c WHERE c.text = n.text)"
        ).fetchall()
    )
    assert sorted(r["doc_id"] for r in kept.collect()) == oracle


def test_exact_dedup_against_corpus_never_shuffled(spark):
    """The scale contract: both joins broadcast the batch-derived side —
    the corpus scan reaches the semi join with NO Exchange above it."""
    from pycypher_nmetl_spark.llmops import exact_dedup_against

    corpus = spark.createDataFrame(
        [(i, f"t{i}") for i in range(50)], "doc_id long, text string"
    )
    new = spark.createDataFrame([(1, "t3")], "doc_id long, text string")
    plan = (
        exact_dedup_against(new, corpus, cols=["text"])
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert plan.count("BroadcastHashJoin") == 2
    assert "SortMergeJoin" not in plan
    # exactly ONE hash exchange: the batch's own hash dedup — the corpus
    # scan feeds the semi join directly with no Exchange above it
    assert plan.count("Exchange hashpartitioning") == 1


def test_exact_dedup_against_validation(spark):
    from pycypher_nmetl_spark.llmops import content_hashes, exact_dedup_against

    df = spark.createDataFrame([(1, "a")], "doc_id long, text string")
    import pytest as _pt
    with _pt.raises(ValueError, match="non-empty"):
        exact_dedup_against(df, df, cols=[])
    with _pt.raises(ValueError, match="missing from new_df"):
        exact_dedup_against(df, df, cols=["nope"])
    with _pt.raises(ValueError, match="non-empty"):
        content_hashes(df, [])


# ------------------------- SemDeDup (semantic dedup) -------------------------

def _clustered_vecs(spark, seed=7):
    """3 well-separated clusters; ids 0-2 near-identical in cluster A,
    ids 10-11 near-identical in cluster B, the rest distinct."""
    import random

    rng = random.Random(seed)

    def vec(base, jitter):
        return [b + rng.uniform(-jitter, jitter) for b in base]

    A = [10.0, 0.0, 0.0, 1.0]
    B = [0.0, 10.0, 0.0, -1.0]
    C = [0.0, 0.0, 10.0, 3.0]
    rows = [
        (0, vec(A, 0.01)), (1, vec(A, 0.01)), (2, vec(A, 0.01)),
        (3, vec(A, 3.0)),                      # same cluster, not a dup
        (10, vec(B, 0.01)), (11, vec(B, 0.01)),
        (12, vec(B, 3.0)),
        (20, vec(C, 3.0)), (21, vec(C, 3.0)),  # distinct C members
    ]
    return spark.createDataFrame(rows, "id long, embedding array<double>")


def test_semantic_dedup_pairs_match_within_cluster_exact(spark):
    """SemDeDup pairs == brute-force exact cosine pairs restricted to
    same-cluster membership (the paper's candidate structure)."""
    from pycypher_nmetl_spark.llmops import near_dup_pairs
    from pycypher_nmetl_spark.llmops.similarity import semantic_dedup_pairs

    df = _clustered_vecs(spark)
    pairs, assigned, _ = semantic_dedup_pairs(
        df, "embedding", n_clusters=3, threshold=0.995
    )
    got = {(r["id1"], r["id2"]) for r in pairs.collect()}
    exact = {
        (r["id1"], r["id2"])
        for r in near_dup_pairs(
            df, "embedding", threshold=0.995, exact=True
        ).collect()
    }
    cluster = {r["id"]: r["_cluster"] for r in
               assigned.selectExpr("id", "_cluster").collect()}
    exact_same_cluster = {
        (a, b) for a, b in exact if cluster[a] == cluster[b]
    }
    assert got == exact_same_cluster
    assert {(0, 1), (0, 2), (1, 2), (10, 11)} <= got


def test_semantic_dedup_keeps_one_per_group(spark):
    from pycypher_nmetl_spark.llmops import semantic_dedup

    df = _clustered_vecs(spark)
    for keep in ("farthest", "min_id"):
        kept = sorted(
            r["id"]
            for r in semantic_dedup(
                df, "embedding", n_clusters=3, threshold=0.995, keep=keep
            ).collect()
        )
        # groups {0,1,2} and {10,11} each collapse to one survivor;
        # singletons 3, 12, 20, 21 always survive
        assert len(kept) == 6, (keep, kept)
        assert {3, 12, 20, 21} <= set(kept)
        assert len({0, 1, 2} & set(kept)) == 1
        assert len({10, 11} & set(kept)) == 1
    # min_id keep rule is fully deterministic: lowest id per group
    kept = sorted(
        r["id"]
        for r in semantic_dedup(
            df, "embedding", n_clusters=3, threshold=0.995, keep="min_id"
        ).collect()
    )
    assert kept == [0, 3, 10, 12, 20, 21]


def test_semantic_dedup_validation(spark):
    from pycypher_nmetl_spark.llmops import semantic_dedup

    df = _clustered_vecs(spark)
    import pytest as _pt
    with _pt.raises(ValueError, match="keep"):
        semantic_dedup(df, "embedding", keep="random")


# --------------- SemDeDup skew hardening + nprobe=2 (round 11) ---------------

def test_effective_block_bounds_slab_memory():
    from pycypher_nmetl_spark.llmops.similarity import (
        _PAIR_SLAB_BYTES, _effective_block,
    )

    for m in (1, 100, 2048, 200_000, 1_000_000, 50_000_000):
        blk = _effective_block(m, 2048)
        assert 1 <= blk <= 2048
        # the blk x m float64 slab never exceeds the budget (except the
        # hard floor of 32 rows, whose slab is bounded by 32*m)
        assert blk * m * 8 <= max(_PAIR_SLAB_BYTES, 32 * m * 8)
    assert _effective_block(100, 2048) == 2048           # small m: full block
    assert _effective_block(200_000, 2048) == 167        # 256MB / 1.6MB-per-row
    assert _effective_block(1_000_000, 2048) == 33       # bound holds to 1M
    assert _effective_block(10_000_000, 2048) == 32      # hard floor


def test_semantic_dedup_hot_cluster_split(spark):
    """Planted skew: >=80% of the vectors in ONE dense region. With
    max_cluster_size the hot cluster is re-clustered before the matmul,
    and pairs still equal brute force restricted to the FINAL cluster
    structure; planted near-identical dups stay co-clustered."""
    import random

    from pycypher_nmetl_spark.llmops import near_dup_pairs
    from pycypher_nmetl_spark.llmops.similarity import semantic_dedup_pairs

    rng = random.Random(11)
    rows = []
    # 800 vectors spread across one dense-but-splittable region
    for i in range(800):
        base = [rng.uniform(5.0, 15.0), rng.uniform(-5.0, 5.0), 0.0, 1.0]
        rows.append((i, base))
    # planted near-identical duplicate pairs inside the hot region
    for j, anchor in enumerate((100, 300, 500)):
        v = rows[anchor][1]
        rows.append((2000 + j, [x + rng.uniform(-1e-4, 1e-4) for x in v]))
    # 100 vectors far away (the cold cluster)
    for i in range(3000, 3100):
        rows.append((i, [-50.0 + rng.uniform(-1, 1), 50.0, 9.0, -3.0]))
    df = spark.createDataFrame(rows, "id long, embedding array<double>")

    pairs, assigned, cents = semantic_dedup_pairs(
        df, "embedding", n_clusters=2, threshold=0.99999,
        max_cluster_size=200, sample=2000,
    )
    sizes = {
        r["_cluster"]: r["count"]
        for r in assigned.groupBy("_cluster").count().collect()
    }
    # the 800+-vector hot cluster was split: >2 final clusters exist and
    # centroid list grew past the original k
    assert len(sizes) > 2
    assert len(cents) > 2
    got = {(r["id1"], r["id2"]) for r in pairs.collect()}
    # differential: brute-force pairs restricted to final clusters
    cluster = {r["id"]: r["_cluster"] for r in assigned.select("id", "_cluster").collect()}
    exact = {
        (r["id1"], r["id2"])
        for r in near_dup_pairs(
            df, "embedding", threshold=0.99999, exact=True
        ).collect()
        if cluster[r["id1"]] == cluster[r["id2"]]
    }
    assert got == exact
    # the planted near-identical pairs survive the split (they co-assign)
    assert {(100, 2000), (300, 2001), (500, 2002)} <= got


def test_semantic_dedup_nprobe2_boundary_recall(spark):
    """nprobe=2: a near-identical duplicate pair straddling a cluster
    boundary is invisible to hard assignment but recovered when each
    vector also probes its second-nearest cluster."""
    import random

    from pycypher_nmetl_spark.llmops.similarity import semantic_dedup_pairs

    rng = random.Random(3)
    rows = []
    # a large shared z-component keeps the boundary pair near-identical
    # in COSINE while their x-signs decide opposite k-means assignment
    for i in range(40):  # blob L
        rows.append((i, [-10.0 + rng.uniform(-0.5, 0.5), 0.0, 100.0]))
    for i in range(50, 90):  # blob R
        rows.append((i, [10.0 + rng.uniform(-0.5, 0.5), 0.0, 100.0]))
    # boundary pair: nudged to opposite sides of the midplane
    rows.append((900, [-0.3, 0.0, 100.0]))
    rows.append((901, [0.3, 0.0, 100.0]))
    df = spark.createDataFrame(rows, "id long, embedding array<double>")

    kw = dict(n_clusters=2, threshold=0.999, sample=500, iters=25)
    p1, a1, _ = semantic_dedup_pairs(df, "embedding", nprobe=1, **kw)
    got1 = {(r["id1"], r["id2"]) for r in p1.collect()}
    cl = {r["id"]: r["_cluster"] for r in a1.select("id", "_cluster").collect()}
    if cl[900] == cl[901]:
        import pytest as _pt

        _pt.skip("k-means co-assigned the boundary pair this seed")
    assert (900, 901) not in got1  # the paper's blind spot
    p2, _, _ = semantic_dedup_pairs(df, "embedding", nprobe=2, **kw)
    got2 = {(r["id1"], r["id2"]) for r in p2.collect()}
    assert (900, 901) in got2      # recovered by the second probe
    assert got1 <= got2            # strictly more recall, no losses
    # no duplicate pair rows despite double probing
    assert p2.count() == p2.dropDuplicates(["id1", "id2"]).count()


def test_semantic_dedup_nprobe_validation(spark):
    from pycypher_nmetl_spark.llmops.similarity import semantic_dedup_pairs

    df = spark.createDataFrame([(1, [1.0, 0.0])], "id long, embedding array<double>")
    import pytest as _pt
    with _pt.raises(ValueError, match="nprobe"):
        semantic_dedup_pairs(df, "embedding", nprobe=3)


def test_exact_dedup_against_verify_content(spark):
    """verify=True re-checks every hash match on the raw columns (a
    64-bit collision can no longer drop a genuinely new document);
    results match the DuckDB NOT-EXISTS oracle, null content dedups
    null-safely, and the corpus still reaches its joins unshuffled."""
    import duckdb

    from pycypher_nmetl_spark.llmops import exact_dedup_against

    corpus = spark.createDataFrame(
        [(i, f"doc body {i % 10}") for i in range(30)] + [(90, None)],
        "doc_id long, text string",
    )
    new = spark.createDataFrame(
        [(100, "doc body 3"), (101, "doc body 999"), (103, None)],
        "doc_id long, text string",
    )
    kept = exact_dedup_against(new, corpus, cols=["text"], verify=True)
    got = sorted(r["doc_id"] for r in kept.collect())
    con = duckdb.connect()
    con.register("corpus", corpus.toPandas())
    con.register("new", new.toPandas())
    oracle = sorted(
        t[0] for t in con.execute(
            "SELECT doc_id FROM new n WHERE NOT EXISTS (SELECT 1 FROM "
            "corpus c WHERE c.text IS NOT DISTINCT FROM n.text)"
        ).fetchall()
    )
    assert got == oracle == [101]

    plan = (
        exact_dedup_against(new, corpus, cols=["text"], verify=True)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "SortMergeJoin" not in plan  # everything broadcasts

    import pytest as _pt
    with _pt.raises(ValueError, match="verify"):
        exact_dedup_against(
            new, corpus, cols=["text"], corpus_is_hashes=True, verify=True
        )


def test_semantic_dedup_split_with_nprobe2(spark):
    """Code-review r11: with a split hot cluster, nprobe=2 must probe
    only LIVE centroids — the emptied parent would otherwise regroup the
    whole blob into one O(m^2) group. Planted dups stay found; pair set
    is a superset of nprobe=1's."""
    import random

    from pycypher_nmetl_spark.llmops.similarity import semantic_dedup_pairs

    rng = random.Random(17)
    rows = []
    for i in range(600):
        rows.append((i, [rng.uniform(5.0, 15.0), rng.uniform(-5.0, 5.0), 1.0]))
    for j, anchor in enumerate((50, 150)):
        v = rows[anchor][1]
        rows.append((5000 + j, [x + rng.uniform(-1e-4, 1e-4) for x in v]))
    for i in range(7000, 7050):
        rows.append((i, [-50.0, 50.0, -3.0]))
    df = spark.createDataFrame(rows, "id long, embedding array<double>")
    kw = dict(n_clusters=2, threshold=0.99999, sample=2000,
              max_cluster_size=150)
    p1, a1, _ = semantic_dedup_pairs(df, "embedding", nprobe=1, **kw)
    p2, a2, _ = semantic_dedup_pairs(df, "embedding", nprobe=2, **kw)
    g1 = {(r["id1"], r["id2"]) for r in p1.collect()}
    g2 = {(r["id1"], r["id2"]) for r in p2.collect()}
    assert {(50, 5000), (150, 5001)} <= g1
    assert g1 <= g2
    # the split actually happened (more than the 2 fitted clusters)
    assert a2.select("_cluster").distinct().count() > 2


# ------------------------- round-12 scale guards -------------------------

def test_ivf_topk_many_query_batch_guard(spark):
    """ivf_topk_many collects the query frame to the driver (the probe
    map is built from local centroids) — the batched-retrieval CONTRACT
    caps |queries|; above the cap it raises with guidance instead of
    silently pulling a corpus onto the driver."""
    from pycypher_nmetl_spark.llmops import ivf_build, ivf_topk_many

    e = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    assigned, cents = ivf_build(e, "embedding", n_clusters=4, id_col="vec_id")
    queries = e.limit(4).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )
    with pytest.raises(ValueError, match="exceeds 3"):
        ivf_topk_many(
            assigned, cents, "embedding", queries, k=3,
            id_col="vec_id", max_queries=3,
        )
    # at/below the cap the call still works
    ok = ivf_topk_many(
        assigned, cents, "embedding", queries.limit(3), k=3,
        id_col="vec_id", max_queries=3,
    )
    assert ok.count() > 0


def test_hot_cluster_fit_sample_global_byte_cap(spark, monkeypatch):
    """The hot-cluster stratified fit sample is driver-collected: its
    TOTAL bytes are capped across all hot clusters (fractions scale
    down proportionally). Under a squeezed budget the split still
    separates the planted-skew region and keeps planted dups
    co-clustered."""
    import random

    from pycypher_nmetl_spark.llmops import similarity as S

    # ~100 sampled rows' worth of budget at dim 4 float64
    monkeypatch.setattr(S, "_FIT_SAMPLE_BYTES", 100 * 4 * 8)

    rng = random.Random(11)
    rows = []
    for i in range(800):
        rows.append((i, [rng.uniform(5.0, 15.0), rng.uniform(-5.0, 5.0), 0.0, 1.0]))
    for j, anchor in enumerate((100, 300)):
        v = rows[anchor][1]
        rows.append((2000 + j, [x + rng.uniform(-1e-4, 1e-4) for x in v]))
    for i in range(3000, 3100):
        rows.append((i, [-50.0 + rng.uniform(-1, 1), 50.0, 9.0, -3.0]))
    df = spark.createDataFrame(rows, "id long, embedding array<double>")

    pairs, assigned, cents = S.semantic_dedup_pairs(
        df, "embedding", n_clusters=2, threshold=0.99999,
        max_cluster_size=200, sample=2000,
    )
    # the split still engaged despite the scaled-down sample
    assert len(cents) > 2
    got = {(r["id1"], r["id2"]) for r in pairs.collect()}
    assert {(100, 2000), (300, 2001)} <= got
