"""Variable-length paths & shortest paths (reference: path_expander.py)."""

import pytest

from pycypher_nmetl_spark import CypherEngine, GraphCatalog


@pytest.fixture()
def chain(spark):
    """1 -> 2 -> 3 -> 4 -> 5 plus a shortcut 1 -> 3."""
    cat = GraphCatalog(spark)
    cat.register_nodes(
        "N", spark.createDataFrame([(i, f"n{i}") for i in range(1, 6)], "id long, name string")
    )
    cat.register_edges(
        "E",
        spark.createDataFrame(
            [(10, 1, 2), (11, 2, 3), (12, 3, 4), (13, 4, 5), (14, 1, 3)],
            "id long, src long, dst long",
        ),
    )
    return CypherEngine(cat)


def pairs(engine, q):
    return sorted(
        [tuple(r) for r in engine.execute(q).collect()], key=repr
    )


def test_varlength_1_2(chain):
    assert pairs(
        chain, "MATCH (a:N {name:'n1'})-[:E*1..2]->(b:N) RETURN b.name AS b"
    ) == [("n2",), ("n3",), ("n3",), ("n4",)]


def test_varlength_fixed_hops(chain):
    assert pairs(
        chain, "MATCH (a:N {name:'n1'})-[:E*3..3]->(b:N) RETURN b.name AS b"
    ) == [("n4",), ("n5",)]


def test_varlength_zero_min(chain):
    assert pairs(
        chain, "MATCH (a:N {name:'n1'})-[:E*0..1]->(b:N) RETURN b.name AS b"
    ) == [("n1",), ("n2",), ("n3",)]


def test_varlength_unbounded(chain):
    assert pairs(
        chain, "MATCH (a:N {name:'n1'})-[:E*]->(b:N) RETURN b.name AS b"
    ) == [("n2",), ("n3",), ("n3",), ("n4",), ("n4",), ("n5",), ("n5",)]


def test_path_length(chain):
    assert pairs(
        chain,
        "MATCH p = ((a:N {name:'n1'})-[:E*1..2]->(b:N {name:'n3'})) "
        "RETURN length(p) AS l",
    ) == [(1,), (2,)]


def test_shortest_path(chain):
    assert pairs(
        chain,
        "MATCH p = shortestPath((a:N {name:'n1'})-[:E*]->(b:N {name:'n5'})) "
        "RETURN length(p) AS l",
    ) == [(3,)]


def test_all_shortest_paths(chain, spark):
    # two distinct 2-hop routes 1->3->4 and ... only one: 1->2->3? shortest 1->3 is 1 hop
    # build diamond: 1->2->4, 1->3->4
    cat = GraphCatalog(spark)
    cat.register_nodes("N", spark.createDataFrame([(i,) for i in range(1, 5)], "id long"))
    cat.register_edges(
        "E",
        spark.createDataFrame(
            [(10, 1, 2), (11, 1, 3), (12, 2, 4), (13, 3, 4)],
            "id long, src long, dst long",
        ),
    )
    eng = CypherEngine(cat)
    out = eng.execute(
        "MATCH p = allShortestPaths((a:N)-[:E*]->(b:N)) "
        "WHERE id(a) = 1 AND id(b) = 4 RETURN length(p) AS l"
    ).collect()
    assert [r["l"] for r in out] == [2, 2]


def test_varlength_respects_edge_uniqueness(spark):
    # cycle 1->2->1: paths from 1 can't reuse the same edge
    cat = GraphCatalog(spark)
    cat.register_nodes("N", spark.createDataFrame([(1,), (2,)], "id long"))
    cat.register_edges(
        "E", spark.createDataFrame([(10, 1, 2), (11, 2, 1)], "id long, src long, dst long")
    )
    eng = CypherEngine(cat)
    out = eng.execute(
        "MATCH (a:N)-[:E*1..5]->(b:N) WHERE id(a) = 1 RETURN id(b) AS b"
    ).collect()
    # 1->2 (1 hop), 1->2->1 (2 hops), then stuck (both edges used)
    assert sorted(r["b"] for r in out) == [1, 2]
