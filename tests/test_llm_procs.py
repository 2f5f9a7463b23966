"""CALL llm.* procedures: the llmops operators exposed to Cypher
(SURVEY §7.2 M8 'registered as a procedure and as a Python API')."""

import pytest

from pycypher_nmetl_spark import CypherEngine, GraphCatalog


@pytest.fixture(scope="module")
def tpch_engine(spark):
    return CypherEngine(GraphCatalog.from_tpch(spark, "/root/testdata/sf0.001"))


def test_embedding_label_registered(tpch_engine):
    rows = tpch_engine.run("CALL db.labels() YIELD label RETURN label")
    assert ("Embedding",) in [tuple(r) for r in rows]


def test_llm_jaccard_pairs_matches_python_api(tpch_engine):
    from pycypher_nmetl_spark.llmops import ngram_jaccard_pairs

    rows = tpch_engine.run(
        "CALL llm.jaccardPairs('Document', 'text', 3, 0.7) "
        "YIELD id1, id2, jaccard RETURN id1, id2"
    )
    api = ngram_jaccard_pairs(
        tpch_engine.catalog.nodes("Document"), "id", "text", k=3, threshold=0.7
    )
    assert sorted(map(tuple, rows)) == sorted(
        map(tuple, api.select("id1", "id2").collect())
    )


def test_llm_minhash_pairs_runs(tpch_engine):
    rows = tpch_engine.run(
        "CALL llm.minhashPairs('Document', 'text', 0.7) "
        "YIELD id1, id2, jaccard RETURN count(*) AS c"
    )
    assert rows[0][0] >= 0


def test_llm_exact_duplicates(tpch_engine):
    # keep_id is the minimum id of each duplicate group, dup_id != keep_id
    rows = tpch_engine.run(
        "CALL llm.exactDuplicates('Document', 'text') "
        "YIELD keep_id, dup_id RETURN keep_id, dup_id"
    )
    for keep, dup in rows:
        assert keep < dup


def test_llm_simhash_yield_projection(tpch_engine):
    rows = tpch_engine.run(
        "CALL llm.simhash('Document', 'text') YIELD id, bucket "
        "RETURN count(DISTINCT bucket) AS buckets"
    )
    assert rows[0][0] >= 1


def test_llm_textstats(tpch_engine):
    rows = tpch_engine.run(
        "CALL llm.textStats('Document', 'text') "
        "YIELD id, n_tokens, quality_score, lang_pred, fingerprint "
        "WHERE n_tokens >= 5 RETURN count(*) AS c"
    )
    assert rows[0][0] > 0


def test_llm_contamination_against_python_api(tpch_engine):
    from pycypher_nmetl_spark.llmops import contamination_pairs
    from pyspark.sql import functions as F

    rows = tpch_engine.run(
        "CALL llm.contamination('Document', 'Document', 'text', 3, 0.5) "
        "YIELD train_id, eval_id, contamination "
        "WHERE train_id <> eval_id RETURN count(*) AS c"
    )
    docs = tpch_engine.catalog.nodes("Document")
    api = (
        contamination_pairs(docs, docs, id_col="id", text_col="text", n=3,
                            min_contamination=0.5)
        .filter(F.col("train_id") != F.col("eval_id"))
        .count()
    )
    assert rows[0][0] == api


def test_llm_topk_with_param_vector(tpch_engine):
    emb = tpch_engine.catalog.nodes("Embedding").limit(1).collect()[0]
    q = [float(x) for x in emb["embedding"]]
    rows = tpch_engine.run(
        "CALL llm.topK('Embedding', 'embedding', $q, 3) "
        "YIELD id, cosine RETURN id, cosine ORDER BY cosine DESC",
        {"q": q},
    )
    assert len(rows) == 3
    # the query vector itself is its own nearest neighbor
    assert rows[0][0] == emb["id"]
    assert rows[0][1] == pytest.approx(1.0, abs=1e-6)


def test_llm_neardup_components(tpch_engine):
    rows = tpch_engine.run(
        "CALL llm.nearDupComponents('Embedding', 'embedding', 0.99) "
        "YIELD id, component RETURN count(*) AS c"
    )
    assert rows[0][0] >= 0


def test_llm_proc_bad_args_raise(tpch_engine):
    with pytest.raises(Exception, match="label|string"):
        tpch_engine.run(
            "CALL llm.simhash(42, 'text') YIELD id RETURN count(*) AS c"
        )
    with pytest.raises(Exception, match="unknown node label"):
        tpch_engine.run(
            "CALL llm.simhash('Nope', 'text') YIELD id RETURN count(*) AS c"
        )


def test_unlabeled_scan_spans_embedding_label(tpch_engine):
    # regression: embeddings.parquet carries a 'label' column; unlabeled
    # scans union every node table and collided on x__label until the
    # property was renamed at registration (round-7)
    rows = tpch_engine.run("MATCH (x) WHERE x.cluster IS NOT NULL RETURN count(*) AS c")
    assert rows[0][0] > 0


def test_reserved_property_names_raise(spark):
    from pycypher_nmetl_spark import GraphCatalog

    cat = GraphCatalog(spark)
    bad_nodes = spark.createDataFrame([(1, "x")], "id long, label string")
    with pytest.raises(ValueError, match="reserved"):
        cat.register_nodes("Thing", bad_nodes)
    bad_edges = spark.createDataFrame([(1, 2, "t")], "src long, dst long, type string")
    with pytest.raises(ValueError, match="reserved"):
        cat.register_edges("REL", bad_edges)


def test_llm_repetition_and_scrub_procs(tpch_engine):
    out = tpch_engine.execute(
        "CALL llm.repetitionSignals('Document', 'text') "
        "YIELD id, dup_token_frac RETURN count(*) AS n, "
        "max(dup_token_frac) AS m"
    ).collect()[0]
    assert out["n"] > 0 and out["m"] is not None
    rows = tpch_engine.execute(
        "CALL llm.scrubPii('Document', 'text') YIELD id, masked, pii_hits "
        "RETURN count(*) AS n, sum(pii_hits) AS hits"
    ).collect()[0]
    assert rows["n"] > 0 and rows["hits"] is not None


def test_llm_exact_substring_procs_match_python_api(tpch_engine):
    from pycypher_nmetl_spark.llmops import (
        duplicate_spans, exact_substring_pairs,
    )

    docs = tpch_engine.catalog.nodes("Document")
    rows = tpch_engine.run(
        "CALL llm.exactSubstringPairs('Document', 'text', 10) "
        "YIELD id1, id2, n_windows RETURN id1, id2, n_windows"
    )
    api = exact_substring_pairs(docs, "id", "text", window=10)
    assert sorted(map(tuple, rows)) == sorted(map(tuple, api.collect()))

    spans = tpch_engine.run(
        "CALL llm.exactSubstringSpans('Document', 'text', 10) "
        "YIELD doc_id, span_start, span_end "
        "RETURN doc_id, span_start, span_end"
    )
    api_spans = duplicate_spans(docs, "id", "text", window=10)
    assert sorted(map(tuple, spans)) == sorted(map(tuple, api_spans.collect()))


def test_llm_exact_substring_cut_proc(tpch_engine):
    # cut text must contain no duplicated 10-token window afterwards:
    # re-running the span finder on the cleaned corpus finds nothing
    from pycypher_nmetl_spark.llmops import duplicate_spans

    rows = tpch_engine.run(
        "CALL llm.exactSubstringCut('Document', 'text', 10) "
        "YIELD id, text RETURN id, text"
    )
    assert len(rows) == tpch_engine.catalog.nodes("Document").count()
    spark = tpch_engine.catalog.spark
    cleaned = spark.createDataFrame(
        [(r[0], r[1]) for r in rows], "id long, text string"
    )
    # idempotence: ExactSubstr of an ExactSubstr'd corpus is a no-op
    assert duplicate_spans(cleaned, "id", "text", window=10).count() == 0


def test_llm_lm_score_matches_python_api(tpch_engine):
    from pycypher_nmetl_spark.llmops import add_lm_perplexity

    rows = tpch_engine.run(
        "CALL llm.lmScore('Document', 'text', 2) "
        "YIELD id, n_scored, ppl RETURN id, n_scored, ppl"
    )
    api = {
        r["id"]: (r["n_scored"], r["ppl"])
        for r in add_lm_perplexity(
            tpch_engine.catalog.nodes("Document").select("id", "text"),
            "text", n=2, id_col="id",
        ).collect()
    }
    assert len(rows) == len(api)
    for rid, n_scored, ppl in rows:
        wn, wp = api[rid]
        assert n_scored == wn
        assert (ppl is None) == (wp is None)
        if wp is not None:
            assert abs(ppl - wp) < 1e-9 * max(wp, 1.0)


def test_llm_dsir_weights_proc_matches_python_api(spark):
    from pycypher_nmetl_spark import CypherEngine, GraphCatalog
    from pycypher_nmetl_spark.llmops import dsir_log_ratios, dsir_weights

    cat = GraphCatalog(spark)
    raw = spark.createDataFrame(
        [(1, "quantum field energy notes"), (2, "cat sat on the mat"),
         (3, "energy momentum quantum theory")],
        "id long, text string",
    )
    target = spark.createDataFrame(
        [(10, "quantum energy momentum field theory")], "id long, text string"
    )
    cat.register_nodes("RawDoc", raw)
    cat.register_nodes("TargetDoc", target)
    eng = CypherEngine(cat)
    rows = eng.run(
        "CALL llm.dsirWeights('RawDoc', 'text', 'TargetDoc', 500) "
        "YIELD id, n_features, logw RETURN id, n_features, logw"
    )
    ratios = dsir_log_ratios(target, raw, "text", 500)
    api = {
        r["id"]: (r["n_features"], r["logw"])
        for r in dsir_weights(raw, "id", "text", ratios, 500).collect()
    }
    assert len(rows) == 3
    for rid, nf, logw in rows:
        wn, wl = api[rid]
        assert nf == wn and abs(logw - wl) < 1e-9


def test_llm_dsir_resample_proc(spark):
    from pycypher_nmetl_spark import CypherEngine, GraphCatalog

    cat = GraphCatalog(spark)
    raw = spark.createDataFrame(
        [(1, "quantum field energy notes"), (2, "cat sat on the mat"),
         (3, "energy momentum quantum theory"), (4, "buy cheap pills now")],
        "id long, text string",
    )
    target = spark.createDataFrame(
        [(10, "quantum energy momentum field theory")], "id long, text string"
    )
    cat.register_nodes("RawDoc", raw)
    cat.register_nodes("TargetDoc", target)
    eng = CypherEngine(cat)
    rows = eng.run(
        "CALL llm.dsirResample('RawDoc', 'text', 'TargetDoc', 2, 7) "
        "YIELD id, logw, key RETURN id ORDER BY id"
    )
    assert len(rows) == 2
    again = eng.run(
        "CALL llm.dsirResample('RawDoc', 'text', 'TargetDoc', 2, 7) "
        "YIELD id, logw, key RETURN id ORDER BY id"
    )
    assert rows == again  # deterministic for a fixed seed


def test_llm_dedup_against_proc(spark):
    from pycypher_nmetl_spark import CypherEngine, GraphCatalog

    cat = GraphCatalog(spark)
    corpus = spark.createDataFrame(
        [(1, "the quick brown fox jumps over the lazy dog"),
         (2, "other corpus content entirely different here")],
        "id long, text string",
    )
    new = spark.createDataFrame(
        [(101, "the quick brown fox jumps over the lazy cat"),
         (102, "fresh unseen text with no duplicate anywhere")],
        "id long, text string",
    )
    cat.register_nodes("Corpus", corpus)
    cat.register_nodes("NewBatch", new)
    eng = CypherEngine(cat)
    rows = eng.run(
        "CALL llm.dedupAgainst('NewBatch', 'Corpus', 'text', 0.5) "
        "YIELD new_id, corpus_id RETURN new_id, corpus_id"
    )
    assert sorted(map(tuple, rows)) == [(101, 1)]


def test_llm_dedup_exact_against_proc(spark):
    from pycypher_nmetl_spark import CypherEngine, GraphCatalog

    cat = GraphCatalog(spark)
    corpus = spark.createDataFrame(
        [(1, "alpha beta gamma"), (2, "delta epsilon zeta")],
        "id long, text string",
    )
    new = spark.createDataFrame(
        [(101, "alpha beta gamma"),        # byte-exact dup: dropped
         (102, "alpha beta gamma!"),       # near but not exact: kept
         (103, "completely fresh text")],
        "id long, text string",
    )
    cat.register_nodes("Corpus", corpus)
    cat.register_nodes("NewBatch", new)
    eng = CypherEngine(cat)
    rows = eng.run(
        "CALL llm.dedupExactAgainst('NewBatch', 'Corpus', 'text') "
        "YIELD id RETURN id ORDER BY id"
    )
    assert [r[0] for r in rows] == [102, 103]


def test_temporal_asof_and_range_procs(spark):
    import datetime as dt

    from pycypher_nmetl_spark import CypherEngine, GraphCatalog

    t0 = dt.datetime(2024, 1, 1)

    def ts(m):
        return t0 + dt.timedelta(minutes=m)

    cat = GraphCatalog(spark)
    cat.register_nodes(
        "Trade",
        spark.createDataFrame(
            [(1, "A", ts(1), 100.0), (2, "A", ts(5), 101.0)],
            "id long, sym string, ts timestamp, price double",
        ),
    )
    cat.register_nodes(
        "Quote",
        spark.createDataFrame(
            [(10, "A", ts(0), 99.5), (11, "A", ts(4), 100.5)],
            "id long, sym string, ts timestamp, bid double",
        ),
    )
    cat.register_nodes(
        "Window",
        spark.createDataFrame(
            [(20, "A", ts(0), ts(2))],
            "id long, sym string, w_start timestamp, w_end timestamp",
        ),
    )
    eng = CypherEngine(cat)
    rows = eng.run(
        "CALL temporal.asofJoin('Trade', 'Quote', 'ts', 'sym') "
        "YIELD left_id, bid RETURN left_id, bid ORDER BY left_id"
    )
    assert [tuple(r) for r in rows] == [(1, 99.5), (2, 100.5)]
    rows = eng.run(
        "CALL temporal.rangeJoin('Trade', 'Window', 'ts', 'w_start', "
        "'w_end', 'sym') YIELD left_id, right_id RETURN left_id, right_id"
    )
    assert [tuple(r) for r in rows] == [(1, 20)]


def test_llm_semantic_dedup_proc(spark):
    from pycypher_nmetl_spark import CypherEngine, GraphCatalog

    cat = GraphCatalog(spark)
    rows = [
        (0, [10.0, 0.0, 0.0]), (1, [10.001, 0.0, 0.0]),   # near-dup pair
        (2, [0.0, 10.0, 0.0]), (3, [0.0, 0.0, 10.0]),
    ]
    cat.register_nodes(
        "Vec", spark.createDataFrame(rows, "id long, embedding array<double>")
    )
    eng = CypherEngine(cat)
    got = eng.run(
        "CALL llm.semanticDedup('Vec', 'embedding', 2, 0.999) "
        "YIELD id RETURN id ORDER BY id"
    )
    kept = [r[0] for r in got]
    assert len(kept) == 3 and {2, 3} <= set(kept)
    assert len({0, 1} & set(kept)) == 1
