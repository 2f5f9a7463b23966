"""FK-collapse fast-path semantics (round-5 ADVICE fixes).

The FK-collapsed hop (compiler/patterns.py:_try_fk_collapse) must agree
with the generic bindings ⋈ edges ⋈ nodes path for every supported
pattern shape, including:

1. An anonymous, label-less endpoint WITH an inline props map —
   previously took the bare-id branch, never joined the endpoint node
   table, and the trailing props filter compared NULL → silently empty.
2. NULL / dangling fk values — previously kept with a phantom node
   binding; the generic path's inner join drops them.

Reference semantics: a relationship pattern only matches when both
endpoint entities exist (reference: packages/pycypher/src/pycypher/
query_engine.py match semantics).
"""

from __future__ import annotations

import pytest

from pycypher_nmetl_spark import CypherEngine, GraphCatalog


@pytest.fixture()
def fkgraph(spark):
    """Customer --FROM_NATION--> Nation where the edge table is a pure
    projection of Customer.(id, nationkey), registered fk-collapsed.

    Customer 3 has a NULL nationkey; customer 4 has a dangling one (99
    is not a Nation id). Neither may produce a match.
    """
    from pyspark.sql import functions as F

    cat = GraphCatalog(spark)
    customer = spark.createDataFrame(
        [
            (1, "Alice", 10),
            (2, "Bob", 11),
            (3, "NoNation", None),
            (4, "Dangling", 99),
            (5, "Carl", 10),
        ],
        "id long, name string, nationkey long",
    )
    cat.register_nodes("Customer", customer)
    cat.register_nodes(
        "Nation",
        spark.createDataFrame(
            [(10, "GERMANY"), (11, "FRANCE")], "id long, name string"
        ),
    )
    cat.register_edges(
        "FROM_NATION",
        customer.select(
            F.col("id").alias("src"), F.col("nationkey").alias("dst")
        ),
        src_label="Customer",
        dst_label="Nation",
        fk_collapse=("Customer", "src", "nationkey"),
    )
    return CypherEngine(cat)


def rows(df):
    return sorted(tuple(r) for r in df.collect())


def test_anonymous_endpoint_with_inline_props(fkgraph):
    out = fkgraph.execute(
        "MATCH (c:Customer)-[:FROM_NATION]->({name:'GERMANY'}) "
        "RETURN c.name AS n"
    )
    assert rows(out) == [("Alice",), ("Carl",)]


def test_anonymous_endpoint_null_fk_dropped(fkgraph):
    out = fkgraph.execute(
        "MATCH (c:Customer)-[:FROM_NATION]->() RETURN c.name AS n"
    )
    assert rows(out) == [("Alice",), ("Bob",), ("Carl",)]


def test_anonymous_endpoint_count_matches_named(fkgraph):
    anon = fkgraph.execute(
        "MATCH (:Customer)-[:FROM_NATION]->() RETURN count(*) AS c"
    )
    named = fkgraph.execute(
        "MATCH (:Customer)-[:FROM_NATION]->(n:Nation) RETURN count(*) AS c"
    )
    assert rows(anon) == rows(named) == [(3,)]


def test_named_endpoint_props_still_work(fkgraph):
    out = fkgraph.execute(
        "MATCH (c:Customer)-[:FROM_NATION]->(n:Nation {name:'FRANCE'}) "
        "RETURN c.name AS n"
    )
    assert rows(out) == [("Bob",)]


def test_generic_path_agrees(fkgraph):
    # rel.props forces the generic (non-collapsed) path; results must
    # be identical to the collapsed anonymous-with-props query above.
    generic = fkgraph.execute(
        "MATCH (c:Customer)-[r:FROM_NATION]->(x) WHERE x.name = 'GERMANY' "
        "RETURN c.name AS n"
    )
    collapsed = fkgraph.execute(
        "MATCH (c:Customer)-[:FROM_NATION]->({name:'GERMANY'}) "
        "RETURN c.name AS n"
    )
    assert rows(generic) == rows(collapsed) == [("Alice",), ("Carl",)]


def test_reverse_direction_owner_on_next(fkgraph):
    # Nation <- Customer traversed from the Nation side: owner (Customer)
    # is the *next* node — exercises the owner_on_prev=False branch.
    out = fkgraph.execute(
        "MATCH (n:Nation {name:'GERMANY'})<-[:FROM_NATION]-(c) "
        "RETURN c.name AS nm"
    )
    assert rows(out) == [("Alice",), ("Carl",)]
