"""GQL quantified path patterns (compiler/qpp.py) — units + differential.

Differential oracle: a pure-Python trail enumerator (DFS, distinct
edges — openCypher relationship isomorphism) over random digraphs;
the engine's QPP expansion must produce exactly the same multiset of
(a-group, r-group, b-group) rows.
"""

from __future__ import annotations

import random
from collections import Counter

import pytest

from pycypher_nmetl_spark import CypherEngine, GraphCatalog


@pytest.fixture(scope="module")
def line_eng(spark):
    # Alice -KNOWS-> Bob -KNOWS-> Carol
    cat = GraphCatalog(spark)
    cat.register_nodes(
        "Person",
        spark.createDataFrame(
            [(1, "Alice", 30), (2, "Bob", 25), (3, "Carol", 27)],
            "id long, name string, age long",
        ),
    )
    cat.register_edges(
        "KNOWS",
        spark.createDataFrame([(10, 1, 2), (11, 2, 3)], "id long, src long, dst long"),
        "Person",
        "Person",
    )
    return CypherEngine(cat)


@pytest.fixture(scope="module")
def cycle_eng(spark):
    # 1 <-> 2 (two directed edges)
    cat = GraphCatalog(spark)
    cat.register_nodes(
        "P", spark.createDataFrame([(1, "a", 5), (2, "b", 9)], "id long, name string, w long")
    )
    cat.register_edges(
        "E",
        spark.createDataFrame([(10, 1, 2), (11, 2, 1)], "id long, src long, dst long"),
        "P",
        "P",
    )
    return CypherEngine(cat)


# --------------------------------------------------------------------- #
# units
# --------------------------------------------------------------------- #
def test_count_over_range(line_eng):
    rows = line_eng.run(
        "MATCH ((a:Person)-[:KNOWS]->(b:Person)){1,2} RETURN count(*) AS c"
    )
    assert rows[0].c == 3


def test_group_variables_are_rep_ordered_arrays(line_eng):
    rows = line_eng.run(
        "MATCH ((a:Person)-[r:KNOWS]->(b:Person)){1,2} "
        "RETURN a, r, b ORDER BY size(r), a[0]"
    )
    got = [(r.a, r.r, r.b) for r in rows]
    assert got == [
        ([1], [10], [2]),
        ([2], [11], [3]),
        ([1, 2], [10, 11], [2, 3]),
    ]


def test_anchored_exact_reps(line_eng):
    rows = line_eng.run(
        "MATCH (x:Person)((a)-[:KNOWS]->(b)){2}(y:Person) "
        "RETURN x.name AS xs, y.name AS ys"
    )
    assert [(r.xs, r.ys) for r in rows] == [("Alice", "Carol")]


def test_plus_quantifier_from_anchor(line_eng):
    rows = line_eng.run(
        "MATCH (x:Person {name:'Alice'})((a)-[:KNOWS]->(b))+(y) "
        "RETURN y.name AS yn ORDER BY yn"
    )
    assert [r.yn for r in rows] == ["Bob", "Carol"]


def test_zero_reps_bind_boundary_nodes_equal(line_eng):
    rows = line_eng.run(
        "MATCH (x:Person)((a)-[:KNOWS]->(b)){0,1}(y) "
        "RETURN x.name AS xs, y.name AS ys ORDER BY xs, ys"
    )
    assert [(r.xs, r.ys) for r in rows] == [
        ("Alice", "Alice"),
        ("Alice", "Bob"),
        ("Bob", "Bob"),
        ("Bob", "Carol"),
        ("Carol", "Carol"),
    ]


def test_zero_reps_group_arrays_empty(line_eng):
    rows = line_eng.run(
        "MATCH (x:Person {name:'Carol'})((a)-[r:KNOWS]->(b)){0,1}(y) "
        "RETURN r"
    )
    assert [r.r for r in rows] == [[]]


def test_trail_semantics_no_edge_reuse(cycle_eng):
    rows = cycle_eng.run("MATCH ((a:P)-[:E]->(b:P)){1,3} RETURN count(*) AS c")
    # k=1: 2 paths; k=2: both two-edge cycles; k=3: would reuse an edge
    assert rows[0].c == 4


def test_inline_where_applies_per_repetition(cycle_eng):
    rows = cycle_eng.run(
        "MATCH ((a:P WHERE a.w > 4)-[:E]->(b:P WHERE b.w > 8)){1} "
        "RETURN count(*) AS c"
    )
    assert rows[0].c == 1


def test_props_inside_qpp(cycle_eng):
    rows = cycle_eng.run(
        "MATCH ((a:P {name:'b'})-[:E]->(b)){1} RETURN count(*) AS c"
    )
    assert rows[0].c == 1


def test_undirected_inside_qpp(cycle_eng):
    rows = cycle_eng.run("MATCH ((a:P)-[:E]-(b:P)){1} RETURN count(*) AS c")
    assert rows[0].c == 4


def test_rel_uniqueness_against_other_match_patterns(cycle_eng):
    # the group rel array participates in per-MATCH uniqueness
    rows = cycle_eng.run(
        "MATCH (x:P)-[e:E]->(y:P), ((a)-[r:E]->(b)){1} RETURN count(*) AS c"
    )
    # 2 choices of e, and r must be the OTHER edge -> 2
    assert rows[0].c == 2


def test_boundary_merges_labels_and_filters(line_eng):
    # interior nodes must satisfy both b:Person of rep j and a:Person of
    # rep j+1 plus the inline age filter per repetition
    rows = line_eng.run(
        "MATCH ((a:Person WHERE a.age >= 25)-[:KNOWS]->(b:Person)){2} "
        "RETURN count(*) AS c"
    )
    assert rows[0].c == 1


def test_qpp_inside_exists_correlated(line_eng):
    rows = line_eng.run(
        "MATCH (n:Person) WHERE EXISTS { (n)((a)-[:KNOWS]->(b)){2}(m) } "
        "RETURN n.name AS nm"
    )
    assert [r.nm for r in rows] == ["Alice"]


def test_multi_element_inner_chain(line_eng):
    rows = line_eng.run(
        "MATCH ((a:Person)-[:KNOWS]->(b:Person)-[:KNOWS]->(c:Person)){1} "
        "RETURN a, b, c"
    )
    assert [(r.a, r.b, r.c) for r in rows] == [([1], [2], [3])]


def test_optional_match_with_qpp(line_eng):
    rows = line_eng.run(
        "MATCH (n:Person {name:'Carol'}) "
        "OPTIONAL MATCH (n)((a)-[:KNOWS]->(b)){1,2}(m) "
        "RETURN n.name AS nm, m.name AS mm"
    )
    assert [(r.nm, r.mm) for r in rows] == [("Carol", None)]


# --------------------------------------------------------------------- #
# guards
# --------------------------------------------------------------------- #
def test_nested_qpp_raises(line_eng):
    with pytest.raises(NotImplementedError, match="nested"):
        line_eng.run("MATCH (((a)-[:KNOWS]->(b)){1}(c)){1,2} RETURN 1 AS x")


def test_varlength_inside_qpp_raises(line_eng):
    with pytest.raises(NotImplementedError, match="var-length"):
        line_eng.run("MATCH ((a)-[:KNOWS*1..2]->(b)){1,2} RETURN 1 AS x")


def test_path_var_over_qpp_raises(line_eng):
    with pytest.raises(NotImplementedError, match="path variable"):
        line_eng.run("MATCH p = (x:Person)((a)-[:KNOWS]->(b)){1,2}(y) RETURN p")


def test_create_rejects_qpp(line_eng):
    from pycypher_nmetl_spark.cypher.tokenizer import CypherSyntaxError

    with pytest.raises(CypherSyntaxError, match="not allowed"):
        line_eng.run("CREATE ((a)-[:T]->(b)){1,2}")


def test_mixing_quantifier_bounds_validated(line_eng):
    from pycypher_nmetl_spark.cypher.tokenizer import CypherSyntaxError

    with pytest.raises(CypherSyntaxError, match="max < min"):
        line_eng.run("MATCH ((a)-[:KNOWS]->(b)){3,1} RETURN 1 AS x")


# --------------------------------------------------------------------- #
# differential vs pure-Python trail enumeration
# --------------------------------------------------------------------- #
def _trails(nodes, edges, lo, hi):
    """All trails (distinct-edge paths) with lo..hi edges.
    edges: list of (eid, src, dst). Yields (node_seq, edge_seq)."""
    out = []
    adj: dict[int, list[tuple[int, int]]] = {}
    for eid, s, d in edges:
        adj.setdefault(s, []).append((eid, d))

    def dfs(node_seq, edge_seq):
        if lo <= len(edge_seq) <= hi:
            out.append((tuple(node_seq), tuple(edge_seq)))
        if len(edge_seq) == hi:
            return
        for eid, nxt in adj.get(node_seq[-1], ()):
            if eid in edge_seq:
                continue
            dfs(node_seq + [nxt], edge_seq + [eid])

    for n in nodes:
        dfs([n], [])
    return out


def test_differential_vs_python_trail_enumeration(spark):
    rng = random.Random(1202)
    for trial in range(6):
        n = rng.randint(3, 6)
        nodes = list(range(1, n + 1))
        m = rng.randint(2, min(10, n * (n - 1)))
        pairs = set()
        while len(pairs) < m:
            s, d = rng.choice(nodes), rng.choice(nodes)
            if s != d:
                pairs.add((s, d))
        edges = [(100 + i, s, d) for i, (s, d) in enumerate(sorted(pairs))]
        lo = rng.randint(1, 2)
        hi = rng.randint(lo, 3)

        cat = GraphCatalog(spark)
        cat.register_nodes(
            "N", spark.createDataFrame([(i,) for i in nodes], "id long")
        )
        cat.register_edges(
            "E",
            spark.createDataFrame(edges, "id long, src long, dst long"),
            "N",
            "N",
        )
        eng = CypherEngine(cat)
        rows = eng.run(
            f"MATCH ((a:N)-[r:E]->(b:N)){{{lo},{hi}}} RETURN a, r, b"
        )
        got = Counter(
            (tuple(r.a), tuple(r.r), tuple(r.b)) for r in rows
        )
        want = Counter(
            (ns[:-1], es, ns[1:]) for ns, es in _trails(nodes, edges, lo, hi)
        )
        assert got == want, f"trial {trial}: lo={lo} hi={hi} edges={edges}"


def test_group_var_rebinding_outer_singleton_raises(line_eng):
    with pytest.raises(ValueError, match="group variables cannot re-bind"):
        line_eng.run(
            "MATCH (a:Person) MATCH ((a)-[:KNOWS]->(b)){1,2} RETURN a"
        )


def test_group_var_colliding_with_anchor_raises(line_eng):
    with pytest.raises(ValueError, match="group variables cannot re-bind"):
        line_eng.run("MATCH (a:Person)((a)-[:KNOWS]->(b)){1} RETURN a")
