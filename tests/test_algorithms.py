"""Graph algorithms: PageRank, connected components, triangle count."""

import pytest
from pyspark.sql import functions as F

from pycypher_nmetl_spark.algorithms import (
    connected_components, pagerank, triangle_count,
)


@pytest.fixture()
def edges(spark):
    # two components: triangle {1,2,3} + chain 4->5; 6-7 isolated pair
    rows = [(1, 2), (2, 3), (3, 1), (4, 5), (6, 7)]
    return spark.createDataFrame(rows, "src long, dst long")


def test_connected_components(edges):
    out = {r["id"]: r["component"] for r in connected_components(edges).collect()}
    assert out == {1: 1, 2: 1, 3: 1, 4: 4, 5: 4, 6: 6, 7: 6}


def test_triangle_count(edges):
    out = {r["id"]: r["triangles"] for r in triangle_count(edges).collect()}
    assert out == {1: 1, 2: 1, 3: 1, 4: 0, 5: 0, 6: 0, 7: 0}


def test_triangle_count_ignores_duplicates_and_direction(spark):
    rows = [(1, 2), (2, 1), (2, 3), (3, 1), (1, 3)]
    out = triangle_count(spark.createDataFrame(rows, "src long, dst long"))
    assert {r["triangles"] for r in out.collect()} == {1}


def test_pagerank_sums_to_one_and_ranks_hub(spark):
    # star: everyone points at 1
    rows = [(2, 1), (3, 1), (4, 1), (1, 2)]
    pr = pagerank(spark.createDataFrame(rows, "src long, dst long"), iterations=15)
    got = {r["id"]: r["rank"] for r in pr.collect()}
    assert sum(got.values()) == pytest.approx(1.0, abs=1e-6)
    assert got[1] == max(got.values())


def test_pagerank_uniform_on_cycle(spark):
    rows = [(1, 2), (2, 3), (3, 1)]
    pr = pagerank(spark.createDataFrame(rows, "src long, dst long"), iterations=20)
    for r in pr.collect():
        assert r["rank"] == pytest.approx(1 / 3, abs=1e-6)


def test_procedure_surface(golden):
    out = golden.execute(
        "CALL graph.triangleCount('KNOWS') YIELD id, triangles "
        "RETURN id, triangles ORDER BY id"
    ).collect()
    # KNOWS: 1->2, 1->3, 2->3 forms one undirected triangle
    assert [(r["id"], r["triangles"]) for r in out] == [(1, 1), (2, 1), (3, 1)]
