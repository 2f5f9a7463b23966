"""Extended mutation matrix (reference semantics:
tests/test_set_operations_comprehensive.py, test_merge_*).
All Spark-side re-implementation; expected values hand-derived.
"""

import pytest

# Slow tier (VERDICT r12 #1): bulk campaign — deselected by default,
# runs under SPARK_GRAFT_FULL_SUITE=1 / -m slow.
pytestmark = pytest.mark.slow



def test_set_computed_from_own_property(golden, run):
    golden.execute("MATCH (n:Person) SET n.age = n.age + 1")
    assert run("MATCH (n:Person {name:'Alice'}) RETURN n.age AS a") == [(31,)]


def test_set_arithmetic_and_percentage(golden, run):
    golden.execute("MATCH (n:Person {name:'Alice'}) SET n.bonus = n.salary * 0.1")
    assert run("MATCH (n:Person {name:'Alice'}) RETURN n.bonus AS b") == [(10.0,)]


def test_set_string_concatenation(golden, run):
    golden.execute("MATCH (n:Person {name:'Bob'}) SET n.tag = n.name + '-' + n.dept")
    assert run("MATCH (n:Person {name:'Bob'}) RETURN n.tag AS t") == [("Bob-Sales",)]


def test_set_conditional_expression(golden, run):
    golden.execute(
        "MATCH (n:Person) SET n.level = CASE WHEN n.age >= 30 THEN 'senior' "
        "ELSE 'junior' END"
    )
    assert run(
        "MATCH (n:Person) RETURN n.name AS name, n.level AS level"
    ) == [
        ("Alice", "senior"), ("Bob", "junior"),
        ("Carol", "senior"), ("Dave", "junior"),
    ]


def test_set_with_coalesce(golden, run):
    # Dave's salary is null
    golden.execute("MATCH (n:Person) SET n.salary = coalesce(n.salary, 0.0)")
    assert run("MATCH (n:Person {name:'Dave'}) RETURN n.salary AS s") == [(0.0,)]


def test_set_multiple_labels(golden, run):
    golden.execute("MATCH (n:Person {name:'Alice'}) SET n:Eng:Lead")
    assert run("MATCH (n:Eng) RETURN n.name AS x") == [("Alice",)]
    assert run("MATCH (n:Lead) RETURN n.name AS x") == [("Alice",)]


def test_set_on_multiple_matched_rows_same_entity(golden, run):
    # Alice appears twice via WORKS_AT edges — SET must write once, not twice
    golden.execute(
        "MATCH (n:Person {name:'Alice'})-[:WORKS_AT]->(:Company) "
        "SET n.age = n.age + 1"
    )
    assert run("MATCH (n:Person {name:'Alice'}) RETURN n.age AS a") == [(31,)]


def test_set_property_to_null_removes(golden, run):
    golden.execute("MATCH (n:Person {name:'Alice'}) SET n.age = null")
    assert run("MATCH (n:Person {name:'Alice'}) RETURN n.age AS a") == [(None,)]


def test_merge_on_create_vs_on_match_both_present(golden, run):
    golden.execute(
        "MERGE (n:Person {name: 'Alice'}) "
        "ON CREATE SET n.status = 'new' ON MATCH SET n.status = 'seen'"
    )
    golden.execute(
        "MERGE (n:Person {name: 'Newbie'}) "
        "ON CREATE SET n.status = 'new' ON MATCH SET n.status = 'seen'"
    )
    assert run(
        "MATCH (n:Person) WHERE n.status IS NOT NULL "
        "RETURN n.name AS n, n.status AS s"
    ) == [("Alice", "seen"), ("Newbie", "new")]


def test_merge_with_unwind_dedupes_keys(golden, run):
    golden.execute(
        "UNWIND ['X', 'X', 'Y'] AS t MERGE (c:City {name: t})"
    )
    assert run("MATCH (c:City) RETURN count(*) AS c") == [(2,)]


def test_create_node_then_edge_same_query(golden, run):
    golden.execute(
        "MATCH (a:Person {name:'Alice'}) "
        "CREATE (b:Person {id: 90, name: 'Kid'}) CREATE (a)-[:KNOWS]->(b)"
    )
    assert run(
        "MATCH (:Person {name:'Alice'})-[:KNOWS]->(b:Person {name:'Kid'}) "
        "RETURN count(*) AS c"
    ) == [(1,)]


def test_delete_then_recreate_same_query_chain(golden, run):
    golden.execute("MATCH (n:Person {name:'Dave'}) DETACH DELETE n")
    golden.execute("CREATE (:Person {id: 91, name: 'Dave', age: 1})")
    assert run("MATCH (n:Person {name:'Dave'}) RETURN n.age AS a") == [(1,)]


def test_remove_label(golden, run):
    golden.execute("MATCH (n:Person) WHERE n.age > 29 SET n:Senior")
    golden.execute("MATCH (n:Person {name:'Alice'}) REMOVE n:Senior")
    assert run("MATCH (n:Senior) RETURN n.name AS x") == [("Carol",)]


def test_mutation_visible_in_same_transaction(run):
    # CREATE then MATCH inside one query sees the created node
    assert run(
        "CREATE (n:Widget {id: 1, v: 10}) WITH n MATCH (m:Widget) "
        "RETURN m.v AS v"
    ) == [(10,)]


def test_foreach_set(golden, run):
    golden.execute(
        "MATCH (n:Person) WITH collect(n) AS people "
        "FOREACH (p IN people | SET p.seen = true)"
    )
    assert run(
        "MATCH (n:Person) WHERE n.seen RETURN count(*) AS c"
    ) == [(4,)]
