"""Round-12 optimization pins (OPTIMIZATION_r12.md).

Each optimization that changed an operator's internals gets a focused
test: values stay identical (differential where cheap) and the plan
property the optimization bought is asserted so it cannot silently
regress.

1. DSIR: one-pass union histogram re-emitted as a local relation —
   ratio values must equal an independent pure-Python computation, and
   the weights plan must carry no full-outer corpus join.
2. near_dup_pairs: the signature / verify pandas UDFs are evaluated
   once (asNondeterministic pin) — the optimized plan duplicated them.
3. QPP: repetition-boundary nodes bind from edge endpoints when the
   registration proves the label (no node-table join); with unproven
   endpoints the node join must remain (fallback).
"""

from __future__ import annotations

import math
import re

import pytest
from pyspark.sql import functions as F

from pycypher_nmetl_spark import CypherEngine, GraphCatalog


def _plan(df) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )


# ---------------------------------------------------------------------- #
# 1. DSIR
# ---------------------------------------------------------------------- #
class TestDsirOnePass:
    def test_ratio_values_match_pure_python(self, spark):
        from pycypher_nmetl_spark.llmops.dsir import dsir_log_ratios

        target = spark.createDataFrame(
            [(1, "a b a"), (2, "b c")], "doc_id long, text string"
        )
        raw = spark.createDataFrame(
            [(3, "a a"), (4, "c d e"), (5, "")], "doc_id long, text string"
        )
        buckets, s = 7, 1.0
        out = {
            r["bucket"]: (r["log_ratio"], r["zero_ratio"])
            for r in dsir_log_ratios(
                target, raw, "text", buckets=buckets, hash_fn="md5"
            ).collect()
        }

        # independent reference: unigrams + bigrams, md5 bucket, add-1
        def toks(t):
            return [w for w in t.strip().split() if w]

        def grams(t):
            ts = toks(t)
            return ts + [" ".join(ts[i : i + 2]) for i in range(len(ts) - 1)]

        import hashlib

        def bucket(g):
            return int(hashlib.md5(g.encode()).hexdigest()[:15], 16) % buckets

        tc: dict[int, int] = {}
        rc: dict[int, int] = {}
        for t in ("a b a", "b c"):
            for g in grams(t):
                tc[bucket(g)] = tc.get(bucket(g), 0) + 1
        for t in ("a a", "c d e", ""):
            for g in grams(t):
                rc[bucket(g)] = rc.get(bucket(g), 0) + 1
        tt, rt = sum(tc.values()), sum(rc.values())
        assert set(out) == set(tc) | set(rc)
        for b in out:
            want = math.log((tc.get(b, 0) + s) / (tt + s * buckets)) - math.log(
                (rc.get(b, 0) + s) / (rt + s * buckets)
            )
            zero = math.log(s / (tt + s * buckets)) - math.log(
                s / (rt + s * buckets)
            )
            assert out[b][0] == pytest.approx(want, rel=1e-12)
            assert out[b][1] == pytest.approx(zero, rel=1e-12)

    def test_weights_plan_has_no_corpus_fullouter(self, spark):
        from pycypher_nmetl_spark.llmops.dsir import (
            dsir_log_ratios, dsir_weights,
        )

        docs = spark.createDataFrame(
            [(i, f"w{i % 5} w{i % 3} common") for i in range(40)],
            "doc_id long, text string",
        )
        target = docs.filter(F.col("doc_id") % 7 == 0)
        raw = docs.filter(F.col("doc_id") % 7 != 0)
        ratios = dsir_log_ratios(target, raw, "text", buckets=100)
        w = dsir_weights(raw, "doc_id", "text", ratios, buckets=100)
        plan = _plan(w)
        # the old shape full-outer-joined two per-corpus aggregates and
        # re-planned that subtree on every reference (10 SMJs); the
        # ratio table is now a local relation
        assert "FullOuter" not in plan
        assert len(re.findall(r"^\(\d+\) Exchange", plan, re.M)) <= 4
        # and the values still flow: every raw doc gets a row
        assert w.count() == raw.count()

    def test_lazy_fallback_above_bucket_guard(self, spark, monkeypatch):
        import pycypher_nmetl_spark.llmops.dsir as dsir_mod

        monkeypatch.setattr(dsir_mod, "_LOCAL_RATIO_MAX_BUCKETS", 4)
        target = spark.createDataFrame([(1, "a b")], "doc_id long, text string")
        raw = spark.createDataFrame([(2, "b c")], "doc_id long, text string")
        out = dsir_mod.dsir_log_ratios(target, raw, "text", buckets=7)
        rows = {r["bucket"]: r["log_ratio"] for r in out.collect()}
        # same arithmetic through the window-totals path
        eager = {
            r["bucket"]: r["log_ratio"]
            for r in dsir_mod.dsir_log_ratios(
                target, raw, "text", buckets=7
            ).collect()
        }
        monkeypatch.undo()
        lazy_again = {
            r["bucket"]: r["log_ratio"]
            for r in dsir_mod.dsir_log_ratios(
                target, raw, "text", buckets=7
            ).collect()
        }
        assert rows == eager == lazy_again


# ---------------------------------------------------------------------- #
# 2. near_dup_pairs single UDF evaluation
# ---------------------------------------------------------------------- #
class TestNearDupSingleEval:
    def test_plan_has_three_python_evals(self, spark):
        from pycypher_nmetl_spark.llmops import near_dup_pairs

        import random

        random.seed(7)
        rows = [
            (i, [random.gauss(0, 1) for _ in range(8)]) for i in range(60)
        ]
        df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
        out = near_dup_pairs(df, "embedding", threshold=0.6, id_col="vec_id")
        plan = _plan(out)
        evals = re.findall(r"^\(\d+\) ArrowEvalPython", plan, re.M)
        # one signature eval per self-join side + one pair verify — the
        # minimum; the unpinned plan had 6 (each duplicated by pushdown)
        assert len(evals) == 3, plan

    def test_pairs_unchanged_vs_exact(self, spark):
        from pycypher_nmetl_spark.llmops import near_dup_pairs

        import random

        random.seed(11)
        base = [random.gauss(0, 1) for _ in range(16)]
        rows = [(0, base), (1, [x * 1.001 + 0.001 for x in base])] + [
            (i, [random.gauss(0, 1) for _ in range(16)]) for i in range(2, 40)
        ]
        df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
        lsh = {
            (r["id1"], r["id2"])
            for r in near_dup_pairs(
                df, "embedding", threshold=0.9, id_col="vec_id"
            ).collect()
        }
        exact = {
            (r["id1"], r["id2"])
            for r in near_dup_pairs(
                df, "embedding", threshold=0.9, id_col="vec_id", exact=True
            ).collect()
        }
        assert lsh == exact


# ---------------------------------------------------------------------- #
# 3. QPP boundary-node join elimination
# ---------------------------------------------------------------------- #
@pytest.fixture()
def chain_graph(spark):
    """4-node chain with REGISTERED endpoint labels (elimination legal)."""
    cat = GraphCatalog(spark)
    cat.register_nodes(
        "N",
        spark.createDataFrame(
            [(i, f"n{i}") for i in range(1, 5)], "id long, name string"
        ),
    )
    cat.register_edges(
        "E",
        spark.createDataFrame([(1, 2), (2, 3), (3, 4)], "src long, dst long"),
        src_label="N",
        dst_label="N",
    )
    return CypherEngine(cat)


@pytest.fixture()
def unregistered_graph(spark):
    """Same chain but endpoints NOT registered — elimination must not fire."""
    cat = GraphCatalog(spark)
    cat.register_nodes(
        "N",
        spark.createDataFrame(
            [(i, f"n{i}") for i in range(1, 5)], "id long, name string"
        ),
    )
    cat.register_edges(
        "E",
        spark.createDataFrame([(1, 2), (2, 3), (3, 4)], "src long, dst long"),
    )
    return CypherEngine(cat)


class TestQppBoundaryElimination:
    QUERY = (
        "MATCH (s:N)((a)-[r:E]->(b)){2,2}(t:N) "
        "RETURN s.name AS sn, t.name AS tn"
    )

    def test_results(self, chain_graph):
        rows = sorted(
            tuple(r) for r in chain_graph.execute(self.QUERY).collect()
        )
        assert rows == [("n1", "n3"), ("n2", "n4")]

    def test_registered_endpoints_skip_boundary_join(self, chain_graph):
        plan = _plan(chain_graph.execute(self.QUERY))
        # {2,2}: scans = s anchor, t anchor, 2 edge scans — no scan for
        # the boundary node between the repetitions
        scans = len(re.findall(r"^\(\d+\) Scan ", plan, re.M))
        assert scans == 4, plan

    def test_unregistered_endpoints_keep_boundary_join(self, unregistered_graph):
        rows = sorted(
            tuple(r) for r in unregistered_graph.execute(self.QUERY).collect()
        )
        assert rows == [("n1", "n3"), ("n2", "n4")]
        plan = _plan(unregistered_graph.execute(self.QUERY))
        # fallback: the boundary node still joins a node scan (5 scans:
        # 2 anchors + 2 edges + boundary)
        scans = len(re.findall(r"^\(\d+\) Scan ", plan, re.M))
        assert scans >= 5, plan

    def test_inline_where_on_boundary_keeps_join(self, chain_graph):
        # a boundary constraint needs the node's properties — the
        # elimination must not fire when the hoisted WHERE references it
        q = (
            "MATCH (s:N)((a)-[r:E]->(b WHERE b.name <> 'n0')){2,2}(t:N) "
            "RETURN s.name AS sn, t.name AS tn"
        )
        rows = sorted(tuple(r) for r in chain_graph.execute(q).collect())
        assert rows == [("n1", "n3"), ("n2", "n4")]
