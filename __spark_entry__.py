"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` smoke-runs the flagship query at sf0.001;
``queries()`` exposes each implemented operator (SURVEY.md §2) as a
(spark, sf_dir) -> DataFrame callable; ``oracle_sql()`` provides the
DuckDB-equivalent SQL over the raw parquet views. Column names are
aliased identically on both sides (driver hash compares sorted-by-name
columns).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

_CATALOGS: dict = {}


def _engine(spark: SparkSession, sf_dir: str):
    from pycypher_nmetl_spark import CypherEngine, GraphCatalog

    key = (id(spark), sf_dir)
    if key not in _CATALOGS:
        _CATALOGS[key] = CypherEngine(GraphCatalog.from_tpch(spark, sf_dir))
    return _CATALOGS[key]


def _cypher(query: str, params: dict | None = None):
    def run(spark: SparkSession, sf_dir: str) -> DataFrame:
        return _engine(spark, sf_dir).execute(query, params)

    return run


# --------------------------------------------------------------------- #
_CYPHER_QUERIES: dict[str, str] = {
    # §2.1/2.2 scans, filters, projections
    "simple_scan": (
        "MATCH (c:Customer) RETURN c.name AS name, c.mktsegment AS mktsegment, "
        "c.acctbal AS acctbal"
    ),
    "filtered_scan": (
        "MATCH (c:Customer) WHERE c.mktsegment = 'BUILDING' AND c.acctbal > 1000.0 "
        "RETURN c.name AS name, c.acctbal AS acctbal"
    ),
    # §2.7 sort / limit
    "order_limit": (
        "MATCH (c:Customer) RETURN c.name AS name, c.acctbal AS acctbal "
        "ORDER BY acctbal DESC, name LIMIT 10"
    ),
    # §2.3/2.4 joins & hops
    "single_hop": (
        "MATCH (c:Customer)-[:FROM_NATION]->(n:Nation) "
        "RETURN c.name AS cust, n.name AS nation"
    ),
    "two_hop_filter": (
        "MATCH (c:Customer)-[:FROM_NATION]->(n:Nation)-[:IN_REGION]->(r:Region) "
        "WHERE r.name = 'ASIA' "
        "RETURN n.name AS nation, count(*) AS cust_cnt"
    ),
    # §2.5 aggregation over edge properties (TPC-H Q1 shape)
    "agg_pricing_summary": (
        "MATCH (:Order)-[l:CONTAINS]->(:Part) WHERE l.shipdate.year <= 1997 "
        "RETURN l.returnflag AS rf, l.linestatus AS ls, "
        "round(sum(l.quantity), 2) AS sum_qty, "
        "round(sum(l.extendedprice), 2) AS sum_base, "
        "round(avg(l.discount), 4) AS avg_disc, count(*) AS cnt"
    ),
    # §2.3 OPTIONAL MATCH (left join) + count(x) null semantics
    "optional_hop_count": (
        "MATCH (c:Customer) OPTIONAL MATCH (c)-[:PLACED]->(o:Order) "
        "RETURN c.name AS cust, count(o) AS n_orders"
    ),
    # §2.9 CASE
    "case_buckets": (
        "MATCH (p:Part) RETURN CASE WHEN p.size < 10 THEN 'small' "
        "WHEN p.size < 30 THEN 'medium' ELSE 'large' END AS bucket, "
        "count(*) AS cnt"
    ),
    # §2.8 string functions + predicate
    "string_fns": (
        "MATCH (p:Part) WHERE p.name CONTAINS 'a' "
        "RETURN toUpper(left(p.name, 5)) AS prefix, size(p.name) AS len, "
        "count(*) AS cnt"
    ),
    # §2.7 DISTINCT
    "distinct_segments": "MATCH (c:Customer) RETURN DISTINCT c.mktsegment AS seg",
    # §2.7 UNION
    "union_names": (
        "MATCH (n:Nation) RETURN n.name AS name "
        "UNION MATCH (r:Region) RETURN r.name AS name"
    ),
    # §2.10 UNWIND + correlated match
    "unwind_match": (
        "UNWIND [1, 5, 10, 25] AS s MATCH (p:Part) WHERE p.size = s "
        "RETURN s AS s, count(*) AS cnt"
    ),
    # §2.9 EXISTS subquery (anti form)
    "exists_anti": (
        "MATCH (c:Customer) WHERE NOT EXISTS { (c)-[:PLACED]->(:Order) } "
        "RETURN c.name AS name"
    ),
    # §2.10 WITH + implicit group-by + trailing WHERE (HAVING)
    "with_having": (
        "MATCH (c:Customer)-[:PLACED]->(o:Order) "
        "WITH c.name AS cust, round(sum(o.totalprice), 2) AS total "
        "WHERE total > 1500000.0 RETURN cust, total"
    ),
    # §2.8 math functions
    "math_fns": (
        "MATCH (s:Supplier) RETURN s.name AS name, "
        "round(sqrt(abs(s.acctbal)), 3) AS v, sign(s.acctbal) AS sg"
    ),
    # §2.9 list ops: reduce / comprehension / size
    "list_ops": (
        "RETURN reduce(acc = 0, x IN [1,2,3,4] | acc + x) AS total, "
        "join([x IN range(1,6) WHERE x % 2 = 0 | toString(x)], ',') AS evens, "
        "size([1,2,3]) AS n"
    ),
    # §2.4 variable-length paths over the NEXT_LINE chain
    "varlength_path": (
        "MATCH (a:Lineitem)-[:NEXT_LINE*1..3]->(b:Lineitem) "
        "WHERE a.linenumber = 1 RETURN count(*) AS paths"
    ),
    # §2.4 shortestPath
    "shortest_path": (
        "MATCH p = shortestPath((a:Lineitem)-[:NEXT_LINE*]->(b:Lineitem)) "
        "WHERE a.linenumber = 1 AND b.linenumber = 4 "
        "RETURN length(p) AS hops, count(*) AS cnt"
    ),
    # events table: scan + aggregate
    "events_by_type": (
        "MATCH (e:Event) RETURN e.event_type AS etype, count(*) AS cnt, "
        "round(sum(e.value), 2) AS total"
    ),
    # §2.5 percentiles & stddev
    "stats_fns": (
        "MATCH (c:Customer) RETURN c.mktsegment AS seg, "
        "round(stdev(c.acctbal), 3) AS sd, "
        "round(percentileCont(c.acctbal, 0.5), 3) AS median"
    ),
    # parameterized comparison
    "param_filter": (
        "MATCH (o:Order) WHERE o.totalprice > $min AND o.orderstatus = $st "
        "RETURN count(*) AS cnt"
    ),
}

_PARAMS: dict[str, dict] = {
    "param_filter": {"min": 200000.0, "st": "F"},
}

_ORACLE: dict[str, str] = {
    "simple_scan": (
        "SELECT c_name AS name, c_mktsegment AS mktsegment, c_acctbal AS acctbal "
        "FROM customer"
    ),
    "filtered_scan": (
        "SELECT c_name AS name, c_acctbal AS acctbal FROM customer "
        "WHERE c_mktsegment = 'BUILDING' AND c_acctbal > 1000.0"
    ),
    "order_limit": (
        "SELECT c_name AS name, c_acctbal AS acctbal FROM customer "
        "ORDER BY acctbal DESC, name LIMIT 10"
    ),
    "single_hop": (
        "SELECT c_name AS cust, n_name AS nation FROM customer "
        "JOIN nation ON c_nationkey = n_nationkey"
    ),
    "two_hop_filter": (
        "SELECT n_name AS nation, count(*) AS cust_cnt FROM customer "
        "JOIN nation ON c_nationkey = n_nationkey "
        "JOIN region ON n_regionkey = r_regionkey "
        "WHERE r_name = 'ASIA' GROUP BY n_name"
    ),
    "agg_pricing_summary": (
        "SELECT l_returnflag AS rf, l_linestatus AS ls, "
        "round(sum(l_quantity), 2) AS sum_qty, "
        "round(sum(l_extendedprice), 2) AS sum_base, "
        "round(avg(l_discount), 4) AS avg_disc, count(*) AS cnt "
        "FROM lineitem WHERE EXTRACT(year FROM l_shipdate) <= 1997 "
        "GROUP BY l_returnflag, l_linestatus"
    ),
    "optional_hop_count": (
        "SELECT c_name AS cust, count(o_orderkey) AS n_orders FROM customer "
        "LEFT JOIN orders ON o_custkey = c_custkey GROUP BY c_name"
    ),
    "case_buckets": (
        "SELECT CASE WHEN p_size < 10 THEN 'small' WHEN p_size < 30 THEN 'medium' "
        "ELSE 'large' END AS bucket, count(*) AS cnt FROM part GROUP BY 1"
    ),
    "string_fns": (
        "SELECT upper(left(p_name, 5)) AS prefix, length(p_name) AS len, "
        "count(*) AS cnt FROM part WHERE contains(p_name, 'a') GROUP BY 1, 2"
    ),
    "distinct_segments": "SELECT DISTINCT c_mktsegment AS seg FROM customer",
    "union_names": (
        "SELECT n_name AS name FROM nation UNION SELECT r_name AS name FROM region"
    ),
    "unwind_match": (
        "SELECT s AS s, count(*) AS cnt FROM (VALUES (1),(5),(10),(25)) t(s) "
        "JOIN part ON p_size = s GROUP BY s"
    ),
    "exists_anti": (
        "SELECT c_name AS name FROM customer WHERE NOT EXISTS "
        "(SELECT 1 FROM orders WHERE o_custkey = c_custkey)"
    ),
    "with_having": (
        "SELECT c_name AS cust, round(sum(o_totalprice), 2) AS total "
        "FROM customer JOIN orders ON o_custkey = c_custkey "
        "GROUP BY c_name HAVING round(sum(o_totalprice), 2) > 1500000.0"
    ),
    "math_fns": (
        "SELECT s_name AS name, round(sqrt(abs(s_acctbal)), 3) AS v, "
        "sign(s_acctbal) AS sg FROM supplier"
    ),
    "list_ops": "SELECT 10 AS total, '2,4,6' AS evens, 3 AS n",
    "varlength_path": (
        "WITH RECURSIVE pairs AS ("
        "  SELECT DISTINCT l_orderkey AS ok, l_linenumber AS ln FROM lineitem"
        "), chain(ok, ln, depth) AS ("
        "  SELECT ok, ln, 0 FROM pairs WHERE ln = 1 "
        "  UNION ALL "
        "  SELECT c.ok, p.ln, c.depth + 1 FROM chain c "
        "  JOIN pairs p ON p.ok = c.ok AND p.ln = c.ln + 1 "
        "  WHERE c.depth < 3"
        ") SELECT count(*) AS paths FROM chain WHERE depth >= 1"
    ),
    "shortest_path": (
        "SELECT 3 AS hops, count(*) AS cnt FROM ("
        "  SELECT l_orderkey FROM ("
        "    SELECT DISTINCT l_orderkey, l_linenumber FROM lineitem "
        "    WHERE l_linenumber BETWEEN 1 AND 4"
        "  ) GROUP BY l_orderkey HAVING count(*) = 4"
        ") HAVING count(*) > 0"
    ),
    "events_by_type": (
        "SELECT event_type AS etype, count(*) AS cnt, round(sum(value), 2) AS total "
        "FROM events GROUP BY event_type"
    ),
    "stats_fns": (
        "SELECT c_mktsegment AS seg, round(stddev_samp(c_acctbal), 3) AS sd, "
        "round(quantile_cont(c_acctbal, 0.5), 3) AS median "
        "FROM customer GROUP BY c_mktsegment"
    ),
    "param_filter": (
        "SELECT count(*) AS cnt FROM orders "
        "WHERE o_totalprice > 200000.0 AND o_orderstatus = 'F'"
    ),
}


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return _cypher(_CYPHER_QUERIES["two_hop_filter"])(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    out: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
    for name, q in _CYPHER_QUERIES.items():
        out[name] = _cypher(q, _PARAMS.get(name))
    return out


def oracle_sql() -> dict[str, str]:
    return dict(_ORACLE)
