"""BFS / path-expansion stress parity.

Reference parity: tests/load_testing/test_bfs_stress.py — termination
and boundedness of the path expander on adversarial graph shapes:
self-loops, 2-cycles, complete graphs, long chains, unbounded-hop caps.
The engine's expander is a distributed frontier BFS
(compiler/paths.py): these tests pin the guard rails (MAX_HOPS cap,
visited-set termination, edge-uniqueness) rather than timings.
"""

from __future__ import annotations

import pytest

# Slow tier (VERDICT r12 #1): bulk campaign — deselected by default,
# runs under SPARK_GRAFT_FULL_SUITE=1 / -m slow.
pytestmark = pytest.mark.slow



def _engine(spark, nodes, edges):
    from pycypher_nmetl_spark import CypherEngine, GraphCatalog

    cat = GraphCatalog(spark)
    cat.register_nodes(
        "N", spark.createDataFrame([(i,) for i in nodes], "id long")
    )
    cat.register_edges(
        "E",
        spark.createDataFrame(
            [(i, s, d) for i, (s, d) in enumerate(edges)],
            "id long, src long, dst long",
        ),
        src_label="N",
        dst_label="N",
    )
    return CypherEngine(cat)


def test_self_loop_does_not_hang(spark):
    eng = _engine(spark, [1], [(1, 1)])
    # unbounded expansion over a pure self-loop: edge-uniqueness means
    # the single edge is usable once per path -> exactly one path
    rows = eng.execute(
        "MATCH (a:N)-[:E*]->(b:N) RETURN count(*) AS c"
    ).collect()
    assert rows[0]["c"] == 1


def test_two_node_cycle_terminates(spark):
    eng = _engine(spark, [1, 2], [(1, 2), (2, 1)])
    # paths: 1>2, 2>1, 1>2>1, 2>1>2 — then both edges are consumed
    rows = eng.execute(
        "MATCH (a:N)-[:E*]->(b:N) RETURN count(*) AS c"
    ).collect()
    assert rows[0]["c"] == 4


def test_complete_graph_bounded(spark):
    n = 8
    edges = [(i, j) for i in range(1, n + 1) for j in range(1, n + 1) if i != j]
    eng = _engine(spark, range(1, n + 1), edges)
    # bounded 1..2 on K8: 56 one-hop + 56*7 two-hop — every out-edge of
    # the midpoint is usable, including the (distinct, directed) return
    # edge back to the start; only reusing the SAME edge is barred
    rows = eng.execute(
        "MATCH (a:N)-[:E*1..2]->(b:N) RETURN count(*) AS c"
    ).collect()
    assert rows[0]["c"] == 56 + 56 * 7
    # shortestPath on a complete graph: every ordered pair at hop 1
    rows = eng.execute(
        "MATCH p = shortestPath((a:N)-[:E*]->(b:N)) "
        "RETURN length(p) AS l, count(*) AS c"
    ).collect()
    assert [(r["l"], r["c"]) for r in rows] == [(1, 56)]


def test_long_chain_shortest_path(spark):
    n = 2000
    eng = _engine(spark, range(n), [(i, i + 1) for i in range(n - 1)])
    rows = eng.execute(
        "MATCH p = shortestPath((a:N {id: 0})-[:E*]->(b:N {id: 15})) "
        "RETURN length(p) AS l"
    ).collect()
    assert [r["l"] for r in rows] == [15]


def test_unbounded_path_capped_at_max_hops(spark):
    from pycypher_nmetl_spark.compiler import paths as P

    n = P.MAX_HOPS + 10
    eng = _engine(spark, range(n), [(i, i + 1) for i in range(n - 1)])
    rows = eng.execute(
        "MATCH (a:N {id: 0})-[:E*]->(b:N) RETURN max(b.id) AS far"
    ).collect()
    # expansion stops at the documented cap, not at graph diameter
    assert rows[0]["far"] == P.MAX_HOPS


def test_query_after_deep_expansion_still_works(spark):
    # engine remains usable after a capped unbounded expansion
    n = 64
    eng = _engine(spark, range(n), [(i, i + 1) for i in range(n - 1)])
    eng.execute("MATCH (a:N)-[:E*]->(b:N) RETURN count(*) AS c").collect()
    rows = eng.execute("MATCH (x:N) RETURN count(*) AS c").collect()
    assert rows[0]["c"] == n


def test_dense_fan_frontier_bounded(spark):
    # hub -> 300 leaves -> sink: frontier width = leaf count, two hops
    edges = [(0, i) for i in range(1, 301)] + [(i, 400) for i in range(1, 301)]
    eng = _engine(spark, list(range(0, 301)) + [400], edges)
    rows = eng.execute(
        "MATCH (a:N {id: 0})-[:E*2..2]->(b:N) RETURN count(*) AS c"
    ).collect()
    assert rows[0]["c"] == 300  # 300 distinct 2-hop paths to the sink
    rows = eng.execute(
        "MATCH p = shortestPath((a:N {id: 0})-[:E*]->(b:N {id: 400})) "
        "RETURN length(p) AS l, count(*) AS c"
    ).collect()
    assert [(r["l"], r["c"]) for r in rows] == [(2, 1)]
