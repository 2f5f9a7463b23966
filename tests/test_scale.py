"""Physical layout: bucketed catalog persistence + salted aggregation."""

import pytest
from pyspark.sql import functions as F

from pycypher_nmetl_spark import CypherEngine, GraphCatalog
from pycypher_nmetl_spark.scale import (
    load_catalog_bucketed, salted_agg, save_catalog_bucketed,
)


def test_bucketed_roundtrip_and_shuffle_elimination(spark, golden):
    tables = save_catalog_bucketed(golden.catalog, "tb", buckets=4)
    assert len(tables) == 4
    cat2 = load_catalog_bucketed(
        spark, "tb", ["Person", "Company"],
        {"KNOWS": ("Person", "Person"), "WORKS_AT": ("Person", "Company")},
    )
    eng = CypherEngine(cat2)
    out = eng.execute(
        "MATCH (a:Person)-[:KNOWS]->(b:Person) RETURN a.name AS a, b.name AS b"
    )
    rows = sorted(tuple(r) for r in out.collect())
    assert rows == [("Alice", "Bob"), ("Alice", "Carol"), ("Bob", "Carol")]

    # with broadcast disabled, the node-side of the (id == src) join must
    # come straight from the bucketed scan — no Exchange on that side
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        nodes = spark.table("tb_nodes_person")
        edges = spark.table("tb_edges_knows")
        plan = (
            nodes.join(edges, nodes["id"] == edges["src"])
            ._jdf.queryExecution().executedPlan().toString()
        )
        assert "SortMergeJoin" in plan
        # exactly zero exchanges: both sides share the bucket layout
        assert "Exchange hashpartitioning" not in plan
    finally:
        spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")


def test_salted_agg_matches_plain(spark):
    df = spark.createDataFrame(
        [("a", i * 1.0) for i in range(100)] + [("b", 5.0)], "k string, v double"
    )
    out = salted_agg(
        df,
        ["k"],
        {
            "cnt": ("sum", F.count(F.lit(1))),
            "total": ("sum", F.sum("v")),
            "mx": ("max", F.max("v")),
        },
        salt_buckets=8,
    )
    got = {r["k"]: (r["cnt"], r["total"], r["mx"]) for r in out.collect()}
    assert got == {"a": (100, sum(range(100)) * 1.0, 99.0), "b": (1, 5.0, 5.0)}


def test_materialize_preserves_results(spark, golden, tmp_path):
    eng = CypherEngine(golden.catalog)
    q = "MATCH (a:Person)-[:KNOWS]->(b:Person) RETURN a.name AS a, b.name AS b"
    before = sorted(tuple(r) for r in eng.execute(q).collect())
    golden.catalog.materialize(
        labels=["Person"], rel_types=["KNOWS"], path=str(tmp_path / "mat")
    )
    after = sorted(tuple(r) for r in eng.execute(q).collect())
    assert after == before
    # the re-registered frames are plain parquet scans now
    plan = golden.catalog.nodes("Person")._jdf.queryExecution().toString()
    assert "parquet" in plan.lower()


def test_from_tpch_materialized_matches_lazy(spark):
    q = (
        "MATCH (a:Lineitem)-[:NEXT_LINE*1..3]->(b:Lineitem) "
        "WHERE a.linenumber = 1 RETURN a.orderkey AS ok, b.linenumber AS ln"
    )
    sf = "/root/testdata/sf0.001"
    lazy = CypherEngine(GraphCatalog.from_tpch(spark, sf)).execute(q)
    mat = CypherEngine(
        GraphCatalog.from_tpch(spark, sf, materialize_derived=True)
    ).execute(q)
    rows_l = sorted(tuple(r) for r in lazy.collect())
    rows_m = sorted(tuple(r) for r in mat.collect())
    assert rows_m == rows_l and len(rows_l) > 0
