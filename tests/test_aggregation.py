"""Aggregation semantics: implicit GROUP BY, DISTINCT, null handling.

Reference: aggregation_evaluator.py:32-560, aggregation_planner.py.
"""


def test_implicit_group_by(run):
    assert run(
        "MATCH (n:Person) RETURN n.dept AS dept, count(*) AS cnt"
    ) == [("Engineering", 2), ("Sales", 2)]


def test_count_ignores_nulls(run):
    # Dave's salary is null: count(prop) skips, count(*) doesn't
    assert run(
        "MATCH (n:Person) RETURN count(n.salary) AS c, count(*) AS all"
    ) == [(3, 4)]


def test_sum_avg_min_max(run):
    assert run(
        "MATCH (n:Person) RETURN sum(n.salary) AS s, avg(n.salary) AS a, "
        "min(n.age) AS mn, max(n.age) AS mx"
    ) == [(300.0, 100.0, 25, 35)]


def test_count_distinct(run):
    assert run("MATCH (n:Person) RETURN count(DISTINCT n.dept) AS d") == [(2,)]


def test_collect(golden):
    out = golden.execute(
        "MATCH (n:Person) RETURN n.dept AS dept, collect(n.name) AS names"
    ).collect()
    got = {r["dept"]: sorted(r["names"]) for r in out}
    assert got == {
        "Engineering": ["Alice", "Carol"],
        "Sales": ["Bob", "Dave"],
    }


def test_collect_skips_nulls(golden):
    out = golden.execute("MATCH (n:Person) RETURN collect(n.salary) AS s").collect()
    assert sorted(out[0]["s"]) == [80.0, 100.0, 120.0]


def test_stdev(golden):
    import statistics

    out = golden.execute("MATCH (n:Person) RETURN stdev(n.age) AS sd").collect()
    assert abs(out[0]["sd"] - statistics.stdev([30, 25, 35, 28])) < 1e-9


def test_percentiles(golden):
    out = golden.execute(
        "MATCH (n:Person) RETURN percentileCont(n.age, 0.5) AS c, "
        "percentileDisc(n.age, 0.5) AS d"
    ).collect()
    assert out[0]["c"] == 29.0  # linear interpolation of 25,28,30,35
    assert out[0]["d"] == 28  # lowest value with cumulative >= 0.5


def test_aggregate_in_expression(run):
    assert run("MATCH (n:Person) RETURN count(*) * 2 AS c") == [(8,)]


def test_order_by_aggregate(golden):
    out = golden.execute(
        "MATCH (n:Person)-[:KNOWS]->(m:Person) "
        "RETURN n.name AS name, count(*) AS c ORDER BY count(*) DESC, name"
    ).collect()
    assert [(r["name"], r["c"]) for r in out] == [("Alice", 2), ("Bob", 1)]


def test_grouped_avg_with_node_key(run):
    # bare node var as grouping key keeps its properties available
    assert run(
        "MATCH (c:Company) OPTIONAL MATCH (p:Person)-[:WORKS_AT]->(c) "
        "WITH c, count(p) AS emp RETURN c.cname AS cname, emp"
    ) == [("Acme", 2), ("Globex", 1)]


def test_global_aggregation_empty_match(run):
    assert run(
        "MATCH (n:Person) WHERE n.age > 100 RETURN count(*) AS c"
    ) == [(0,)]


def test_approx_percentile_close_to_exact(golden, run):
    # round-4 scale opt-in: GK-sketch percentile; on a tiny group with
    # default accuracy it is exact
    rows = run(
        "MATCH (p:Person) RETURN percentileDisc(p.age, 0.5) AS exact, "
        "approxPercentile(p.age, 0.5) AS approx, "
        "approxPercentileCont(p.age, 0.5, 1000) AS approx_acc"
    )
    exact, approx, approx_acc = rows[0]
    assert approx == exact == approx_acc == 28


def test_percentile_auto_approx_above_threshold(spark, tmp_path):
    """Round-5: percentileCont/Disc switch to the GK sketch when the
    input row estimate exceeds engine.percentile_exact_max_rows; stay
    exact below (the default 10M ceiling)."""
    from pycypher_nmetl_spark import CypherEngine, GraphCatalog

    p = str(tmp_path / "v.parquet")
    spark.createDataFrame(
        [(i, float(i)) for i in range(1, 1002)], "id long, v double"
    ).write.parquet(p)

    def build(**kw):
        cat = GraphCatalog(spark)
        cat.register_nodes("V", spark.read.parquet(p))
        return CypherEngine(cat, **kw)

    q = (
        "MATCH (n:V) RETURN percentileCont(n.v, 0.5) AS c, "
        "percentileDisc(n.v, 0.5) AS d"
    )
    exact = build().execute(q).collect()[0]
    assert exact["c"] == 501.0 and exact["d"] == 501.0
    approx = build(percentile_exact_max_rows=1).execute(q).collect()[0]
    # sketch at accuracy 10k is exact for 1001 rows
    assert abs(approx["c"] - 501.0) <= 1.0
    assert abs(approx["d"] - 501.0) <= 1.0
    # None disables the auto switch entirely
    off = build(percentile_exact_max_rows=None).execute(q).collect()[0]
    assert off["c"] == 501.0
