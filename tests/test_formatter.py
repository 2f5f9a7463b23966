"""Formatter round-trip: format(parse(q)) must re-parse and re-format to
a fixed point (reference: query_formatter.py canonicalization)."""

import pytest

from pycypher_nmetl_spark.cypher.formatter import format_query
from pycypher_nmetl_spark.cypher.parser import parse

QUERIES = [
    "MATCH (n:Person) WHERE n.age > 30 RETURN n.name AS name ORDER BY name LIMIT 5",
    "MATCH (a:Person)-[r:KNOWS*1..3]->(b:Person) RETURN a.name AS a, length(r) AS l",
    "OPTIONAL MATCH (n:Person)-[:WORKS_AT]->(c:Company) RETURN n.name AS n, c.cname AS c",
    "MATCH (n:Person) WITH n.dept AS d, count(*) AS c WHERE c > 1 RETURN d, c",
    "UNWIND [1,2,3] AS x RETURN x * 2 AS y",
    "CREATE (n:Person {name: 'Eve', age: 22})-[:KNOWS {since: 2024}]->(m:Person)",
    "MATCH (n:Person) SET n.age = n.age + 1, n:Senior REMOVE n.tmp",
    "MERGE (n:City {name: 'Rome'}) ON CREATE SET n.new = true ON MATCH SET n.seen = true",
    "MATCH (n:Person) DETACH DELETE n",
    "FOREACH (i IN [1,2] | CREATE (:Tag {v: i}))",
    "CALL db.labels() YIELD label RETURN label",
    "MATCH (n:Person) WHERE EXISTS { (n)-[:KNOWS]->(:Person) } RETURN count(*) AS c",
    "RETURN CASE WHEN 1 < 2 THEN 'a' ELSE 'b' END AS r, [x IN range(1,3) | x] AS l",
    "RETURN reduce(acc = 0, x IN [1,2] | acc + x) AS s, all(y IN [1] WHERE y > 0) AS q",
    "MATCH (n:Person) RETURN n{.name, .age} AS m, n['dept'] AS d",
    "MATCH p = shortestPath((a:N)-[:E*]->(b:N)) RETURN length(p) AS l",
    "MATCH (n) RETURN DISTINCT n.name AS x SKIP 1 LIMIT 2",
    "MATCH (a:X) RETURN a.v AS v UNION ALL MATCH (b:Y) RETURN b.v AS v",
]


@pytest.mark.parametrize("q", QUERIES)
def test_format_round_trip(q):
    once = format_query(parse(q))
    twice = format_query(parse(once))
    assert once == twice
