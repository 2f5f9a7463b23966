"""Training-data export operators: splits, stratified sampling,
global shuffle, sequence packing (llmops/export.py).

Beyond-reference extension (SURVEY.md §7.2 M8): the reference pipeline
stops at load/transform (packages/nmetl/src/nmetl/pipeline.py); these
are the last-mile operators a 100 TB curation pipeline needs.
"""

from __future__ import annotations

import re

import pytest
from pyspark.sql import functions as F

from pycypher_nmetl_spark.llmops import (
    global_shuffle,
    pack_sequences,
    split,
    stratified_sample,
)

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def docs(spark):
    return spark.read.parquet(f"{SF}/documents.parquet")


def _formatted_plan(df) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )


class TestSplit:
    def test_disjoint_exhaustive(self, docs):
        out = split(docs, {"train": 0.8, "val": 0.1, "test": 0.1}, key="doc_id")
        n = docs.count()
        counts = {r["split"]: r["c"] for r in
                  out.groupBy("split").agg(F.count("*").alias("c")).collect()}
        assert sum(counts.values()) == n  # every row in exactly one split
        assert set(counts) <= {"train", "val", "test"}
        # proportions roughly honored (500 docs, loose bounds)
        assert counts["train"] > 0.6 * n
        assert 0 < counts.get("val", 0) < 0.25 * n
        assert 0 < counts.get("test", 0) < 0.25 * n

    def test_deterministic_and_repartition_stable(self, docs):
        w = {"train": 0.9, "val": 0.1}
        a = {r["doc_id"]: r["split"] for r in split(docs, w, key="doc_id").collect()}
        b = {r["doc_id"]: r["split"]
             for r in split(docs.repartition(7), w, key="doc_id").collect()}
        assert a == b

    def test_incremental_growth_keeps_assignments(self, docs):
        """Rows keep their split when the corpus grows — the anti-leak
        property randomSplit does not have."""
        w = {"train": 0.8, "test": 0.2}
        subset = docs.where(F.col("doc_id") < 200)
        sub = {r["doc_id"]: r["split"] for r in split(subset, w, key="doc_id").collect()}
        full = {r["doc_id"]: r["split"] for r in split(docs, w, key="doc_id").collect()}
        assert sub == {k: v for k, v in full.items() if k < 200}

    def test_seed_changes_assignment(self, docs):
        w = {"a": 0.5, "b": 0.5}
        s0 = {r["doc_id"]: r["split"] for r in split(docs, w, key="doc_id", seed=0).collect()}
        s1 = {r["doc_id"]: r["split"] for r in split(docs, w, key="doc_id", seed=1).collect()}
        assert s0 != s1

    def test_no_shuffle_in_plan(self, docs):
        """split is a pure column expression — scan + project, zero
        Exchange nodes (the 100 TB design constraint)."""
        out = split(docs, {"train": 0.9, "val": 0.1}, key="doc_id")
        plan = _formatted_plan(out)
        assert not re.search(r"^\(\d+\) Exchange\b", plan, re.M)

    def test_validation(self, docs):
        with pytest.raises(ValueError):
            split(docs, {}, key="doc_id")
        with pytest.raises(ValueError):
            split(docs, {"a": 0.0}, key="doc_id")


class TestStratifiedSample:
    def test_fractions_per_stratum(self, docs):
        base = {r["lang"]: r["c"] for r in
                docs.groupBy("lang").agg(F.count("*").alias("c")).collect()}
        langs = sorted(base)
        fr = {langs[0]: 1.0, langs[1]: 0.5}
        out = stratified_sample(docs, "lang", fr, key="doc_id")
        got = {r["lang"]: r["c"] for r in
               out.groupBy("lang").agg(F.count("*").alias("c")).collect()}
        assert got[langs[0]] == base[langs[0]]  # fraction 1.0 keeps all
        # fraction 0.5 keeps roughly half
        assert 0.2 * base[langs[1]] <= got.get(langs[1], 0) <= 0.8 * base[langs[1]]
        # strata not listed default to 0.0 → dropped entirely
        assert set(got) <= {langs[0], langs[1]}

    def test_default_fraction_keeps_unlisted(self, docs):
        out = stratified_sample(docs, "lang", {}, key="doc_id", default_fraction=1.0)
        assert out.count() == docs.count()

    def test_sample_is_subset_and_stable(self, docs):
        fr = {r["lang"]: 0.5 for r in docs.select("lang").distinct().collect()}
        a = {r["doc_id"] for r in stratified_sample(docs, "lang", fr, key="doc_id").collect()}
        b = {r["doc_id"] for r in
             stratified_sample(docs.repartition(5), "lang", fr, key="doc_id").collect()}
        assert a == b
        all_ids = {r["doc_id"] for r in docs.collect()}
        assert a <= all_ids

    def test_validation(self, docs):
        with pytest.raises(ValueError):
            stratified_sample(docs, "lang", {"en": 1.5}, key="doc_id")
        with pytest.raises(ValueError):
            stratified_sample(docs, "lang", {}, key="doc_id", default_fraction=-0.1)


class TestGlobalShuffle:
    def test_permutation_preserves_rows(self, docs):
        out = global_shuffle(docs, key="doc_id", num_partitions=8)
        assert sorted(r["doc_id"] for r in out.collect()) == \
               sorted(r["doc_id"] for r in docs.collect())
        assert out.columns == docs.columns  # rank column dropped

    def test_reproducible_order(self, docs):
        a = [r["doc_id"] for r in global_shuffle(docs, key="doc_id", seed=7,
                                                 num_partitions=4).collect()]
        b = [r["doc_id"] for r in global_shuffle(docs.repartition(9), key="doc_id",
                                                 seed=7, num_partitions=4).collect()]
        assert a == b  # order is a function of (key, seed, num_partitions) only

    def test_seed_changes_order_not_content(self, docs):
        a = [r["doc_id"] for r in global_shuffle(docs, key="doc_id", seed=0,
                                                 num_partitions=4).collect()]
        b = [r["doc_id"] for r in global_shuffle(docs, key="doc_id", seed=1,
                                                 num_partitions=4).collect()]
        assert a != b and sorted(a) == sorted(b)

    def test_exactly_one_exchange(self, docs):
        out = global_shuffle(docs, key="doc_id", num_partitions=8)
        plan = _formatted_plan(out)
        assert len(re.findall(r"^\(\d+\) Exchange\b", plan, re.M)) == 1


class TestPackSequences:
    def test_every_doc_packed_once(self, docs):
        packed = pack_sequences(docs, "doc_id", "n_chars", max_tokens=5000)
        rows = packed.collect()
        ids = [d for r in rows for d in r["doc_ids"]]
        assert sorted(ids) == sorted(str(r["doc_id"]) for r in docs.collect())

    def test_capacity_respected(self, docs):
        max_tokens = 5000
        packed = pack_sequences(docs, "doc_id", "n_chars", max_tokens=max_tokens)
        lens = {str(r["doc_id"]): r["n_chars"] for r in docs.collect()}
        for r in packed.collect():
            total = sum(lens[d] for d in r["doc_ids"])
            assert total == r["seq_len"]
            # oversized docs are allowed only as singletons
            if r["seq_len"] > max_tokens:
                assert len(r["doc_ids"]) == 1

    def test_packing_efficiency(self, spark):
        """Greedy first-fit on uniform small docs should approach full
        bins, not one doc per bin."""
        df = spark.createDataFrame(
            [(i, 100) for i in range(400)], "id long, toks long"
        ).coalesce(1)
        packed = pack_sequences(df, "id", "toks", max_tokens=1000)
        rows = packed.collect()
        assert len(rows) == 40  # 400 * 100 / 1000 — perfect fill
        assert all(r["seq_len"] == 1000 for r in rows)

    def test_oversized_doc_is_singleton(self, spark):
        df = spark.createDataFrame(
            [(1, 50), (2, 9999), (3, 60)], "id long, toks long"
        ).coalesce(1)
        rows = pack_sequences(df, "id", "toks", max_tokens=100).collect()
        big = [r for r in rows if "2" in r["doc_ids"]]
        assert len(big) == 1 and big[0]["doc_ids"] == ["2"]
        assert big[0]["seq_len"] == 9999

    def test_validation(self, docs):
        with pytest.raises(ValueError):
            pack_sequences(docs, "doc_id", "n_chars", max_tokens=0)


def test_pipeline_composes(docs):
    """End-to-end: quality-filter → split → sample train → shuffle →
    pack. The whole export path holds together on real parquet."""
    out = split(docs, {"train": 0.8, "val": 0.2}, key="doc_id")
    train = out.where(F.col("split") == "train")
    sampled = stratified_sample(train, "lang",
                                {r["lang"]: 0.9 for r in
                                 train.select("lang").distinct().collect()},
                                key="doc_id")
    shuffled = global_shuffle(sampled, key="doc_id", num_partitions=4)
    packed = pack_sequences(shuffled, "doc_id", "n_chars", max_tokens=8000)
    n_docs = sampled.count()
    rows = packed.collect()
    assert sum(len(r["doc_ids"]) for r in rows) == n_docs


def test_curation_example_end_to_end(spark, tmp_path):
    """The examples/curation pipeline runs at sf0.001 and produces a
    monotonically shrinking corpus plus packed train sequences."""
    import importlib.util

    spec = importlib.util.spec_from_file_location(
        "curate_example", "examples/curation/curate.py"
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    stats = mod.curate(spark, "/root/testdata/sf0.001", str(tmp_path))
    assert stats["input"] >= stats["after_quality"] >= stats["after_lm_perplexity"]
    assert stats["after_lm_perplexity"] >= stats["after_classifier_keep"]
    assert stats["after_classifier_keep"] >= stats["after_exact_dedup"]
    assert stats["after_exact_dedup"] >= stats["after_near_dedup"] > 0
    assert stats["train_sequences"] > 0
    out = spark.read.parquet(str(tmp_path / "train_sequences.parquet"))
    assert set(out.columns) == {"doc_ids", "seq_len"}
    assert out.agg({"seq_len": "max"}).collect()[0][0] <= 2048
