"""Per-label id-space semantics in traversals (round-5 fixes).

Node ids are unique per LABEL, not globally (reference mutation engine
allocates ids per label table; see test_advice_fixes per-label id-space
tests). Every traversal join therefore guards raw-id equality with
label-space compatibility — these tests pin the collision cases that
raw-id joins used to fabricate or drop:

1. fixed hop from a wrong-label binding matched same-id edge keys;
2. var-length chained a tip back onto same-id edges of another label;
3. shortestPath dropped 1-hop pairs whose endpoint shared the start's
   raw id in a different label space (visited pre-seed);
4. shortestPath could never find a cycle back to its start.
"""

from __future__ import annotations

import pytest

from pycypher_nmetl_spark import CypherEngine, GraphCatalog


@pytest.fixture()
def collide(spark):
    """Two label spaces with fully overlapping ids 1..3 and edges whose
    endpoints collide by raw id:

      A1 -R-> B1   A2 -R-> B3   B1 -S-> A2
    """
    cat = GraphCatalog(spark)
    cat.register_nodes(
        "A", spark.createDataFrame([(1, "a1"), (2, "a2"), (3, "a3")], "id long, name string")
    )
    cat.register_nodes(
        "B", spark.createDataFrame([(1, "b1"), (2, "b2"), (3, "b3")], "id long, name string")
    )
    cat.register_edges(
        "R",
        spark.createDataFrame([(100, 1, 1), (101, 2, 3)], "id long, src long, dst long"),
        src_label="A", dst_label="B",
    )
    cat.register_edges(
        "S",
        spark.createDataFrame([(200, 1, 2)], "id long, src long, dst long"),
        src_label="B", dst_label="A",
    )
    return CypherEngine(cat)


def rows(df):
    return sorted(tuple(r) for r in df.collect())


def test_fixed_hop_wrong_label_matches_nothing(collide):
    # B1 exists and id 1 is an R src key — but R starts from A, not B
    assert rows(collide.execute("MATCH (b:B)-[:R]->(x) RETURN count(*) AS c")) == [(0,)]
    assert rows(collide.execute("MATCH (a:A)<-[:R]-(x) RETURN count(*) AS c")) == [(0,)]


def test_fixed_hop_unlabeled_var_respects_spaces(collide):
    # unlabeled start: only the A-labeled rows may traverse R
    out = collide.execute("MATCH (x)-[:R]->(y:B) RETURN x.name AS n ORDER BY n")
    assert rows(out) == [("a1",), ("a2",)]


def test_fixed_hop_endpoint_label_mismatch_empty(collide):
    # R's dst space is B; asking for an A endpoint must be empty even
    # though ids collide
    assert rows(collide.execute("MATCH (a:A)-[:R]->(x:A) RETURN count(*) AS c")) == [(0,)]


def test_two_hop_chain_crosses_spaces_correctly(collide):
    # A1 -R-> B1 -S-> A2 is the only valid R;S chain
    out = collide.execute("MATCH (a:A)-[:R]->(b:B)-[:S]->(c:A) RETURN a.name AS an, c.name AS cn")
    assert rows(out) == [("a1", "a2")]


def test_varlength_two_hops_single_type_empty(collide):
    # R*2 would need B-space tips to feed A-space srcs: ids collide
    # (B1/A1) but the spaces differ — nothing matches
    assert rows(collide.execute("MATCH (a:A)-[:R*2]->(x) RETURN count(*) AS c")) == [(0,)]


def test_varlength_multi_type_chain(collide):
    out = collide.execute("MATCH (a:A)-[:R|S*2]->(c:A) RETURN a.name AS an, c.name AS cn")
    assert rows(out) == [("a1", "a2")]


def test_shortest_path_same_id_cross_label_endpoint(collide):
    # A1 -R-> B1: endpoint shares the start's raw id; the old visited
    # pre-seed swallowed this pair entirely
    out = collide.execute(
        "MATCH p = shortestPath((a:A {name:'a1'})-[:R*1..3]->(b:B)) "
        "RETURN b.name AS n, length(p) AS l"
    )
    assert rows(out) == [("b1", 1)]
    # and with the mixed-type traversal, the longer chain appears too
    out2 = collide.execute(
        "MATCH p = shortestPath((a:A {name:'a1'})-[:R|S*1..3]->(b:B)) "
        "RETURN b.name AS n, length(p) AS l"
    )
    assert rows(out2) == [("b1", 1), ("b3", 3)]


def test_shortest_path_identical_endpoints_excluded(spark):
    # Neo4j: shortestPath yields nothing when start and end are the SAME
    # node — but "same node" is (id, label), not raw id (the fuzzer
    # oracle's `a <> tip` rule). A cycle back to the start is excluded...
    cat = GraphCatalog(spark)
    cat.register_nodes(
        "P", spark.createDataFrame([(1, "x"), (2, "y"), (3, "z")], "id long, name string")
    )
    cat.register_edges(
        "E",
        spark.createDataFrame(
            [(10, 1, 2), (11, 2, 3), (12, 3, 1)], "id long, src long, dst long"
        ),
        src_label="P", dst_label="P",
    )
    eng = CypherEngine(cat)
    out = eng.execute(
        "MATCH p = shortestPath((a:P {name:'x'})-[:E*1..6]->(b:P {name:'x'})) "
        "RETURN length(p) AS l"
    )
    assert rows(out) == []
    # ...and so is a pure self-loop pair
    out2 = eng.execute(
        "MATCH p = shortestPath((a:P {name:'y'})-[:E*1..1]->(b:P {name:'y'})) "
        "RETURN length(p) AS l"
    )
    assert rows(out2) == []
    # but the plain var-length enumeration still finds the cycle
    out3 = eng.execute(
        "MATCH (a:P {name:'x'})-[:E*1..6]->(b:P {name:'x'}) "
        "RETURN size([1]) AS one LIMIT 1"
    )
    assert rows(out3) == [(1,)]


def test_undirected_same_id_cross_label_not_a_self_loop(collide):
    # undirected traversal of R from B1: the reversal B1 ~ A1 must
    # exist even though src == dst by raw id on edge 100? (edge 100 is
    # A1->B1, ids 1==1 — a cross-space pair, not a self-loop)
    out = collide.execute("MATCH (b:B {name:'b1'})-[:R]-(x:A) RETURN x.name AS n")
    assert rows(out) == [("a1",)]


def test_varlength_unlabeled_start_keeps_spaces(collide):
    # unlabeled var-length start: A rows traverse R, B rows traverse S;
    # same-id bindings must not swap traversals on the join back
    out = collide.execute("MATCH (x)-[:R|S*1]->(y) RETURN x.name AS xn, y.name AS yn")
    assert rows(out) == [("a1", "b1"), ("a2", "b3"), ("b1", "a2")]
