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

# Gate-swap protocol (VERDICT r12 #8): the driver records at most 50
# gates, so adding a new operator gate retires an old one.  A retirement
# is a roster rotation, not lost coverage — every retired surface names
# the gates/tests that still exercise it.  Machine-readable so a
# `queries_dropped` entry in any PERF comparison is explainable from the
# repo alone.
RETIRED_GATES: dict[str, str] = {
    "union_names": (
        "retired r11 for call_union_branches; plain top-level UNION stays "
        "covered by the union differential fuzzer, TCK union rows, and "
        "undirected_reverse_hops (UNION ALL)"
    ),
    "math_fns": (
        "retired r11 for asof_join_latest; round/sqrt/abs/sign + int "
        "truncation/% stay covered by TCK math rows, the expression "
        "differential fuzzer, and rounds in agg_pricing_summary/"
        "stats_percentiles"
    ),
    "events_by_type": (
        "retired r11 for llm_decontaminate; implicit groupBy+count+"
        "round(sum()) stays covered by agg_pricing_summary, with_having "
        "and the aggregation fuzzer; Event reads by the streaming gates"
    ),
    "distinct_segments": (
        "retired r12 for qpp_reach; bare DISTINCT projection stays "
        "covered by call_union_branches/undirected_reverse_hops dedup, "
        "TCK distinct rows and the read-query fuzzers"
    ),
    "optional_anti": (
        "retired r10 (absorbed into optional_hop_count's CASE + "
        "exists_anti's anti-join shape)"
    ),
    "regex_in_concat_hash": (
        "retired r11 for range_join_windows; =~ covered by TCK regex "
        "rows + string fuzzer, IN by param_in_cross_type, concat by "
        "collect_quantifier, md5/sha256 by the llm_* md5 oracles"
    ),
}


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
    # §2.3 OPTIONAL MATCH (left join) + count(x) null semantics +
    # IS NULL on an entity variable (absorbed optional_anti under the
    # 50-gate cap — its WITH+trailing-WHERE surface stays covered by
    # with_having, its anti-join shape by exists_anti; the per-row
    # o IS NULL test lives on here inside the CASE)
    "optional_hop_count": (
        "MATCH (c:Customer) OPTIONAL MATCH (c)-[:PLACED]->(o:Order) "
        "RETURN c.name AS cust, count(o) AS n_orders, "
        "sum(CASE WHEN o IS NULL THEN 1 ELSE 0 END) AS null_rows"
    ),
    # §2.10 CALL { } subquery: per-invoking-row ORDER BY + LIMIT (the
    # top-k-per-group shape) — compiles to one row_number window, no
    # per-row execution
    "call_subquery_topk": (
        "MATCH (c:Customer) CALL { WITH c MATCH (c)-[:PLACED]->(o:Order) "
        "RETURN o.totalprice AS top_price ORDER BY o.totalprice DESC, "
        "o.orderkey LIMIT 2 } RETURN c.custkey AS custkey, top_price"
    ),
    # §2.9 CASE + §2.8 string fns + CONTAINS predicate in one grouped
    # projection (merged case_buckets + string_fns: the driver records at
    # most 50 gates in queries() order, so overlapping gates are combined
    # to keep every operator inside the recorded set)
    "case_string_fns": (
        "MATCH (p:Part) RETURN CASE WHEN p.size < 10 THEN 'small' "
        "WHEN p.size < 30 THEN 'medium' ELSE 'large' END AS bucket, "
        "toUpper(left(p.name, 5)) AS prefix, size(p.name) AS len, "
        "p.name CONTAINS 'a' AS has_a, count(*) AS cnt"
    ),
    # §2.7 DISTINCT
    # (distinct_segments retired under the 50-gate cap in favor of
    # qpp_reach: bare DISTINCT projection stays covered by the dedup in
    # call_union_branches/undirected_reverse_hops UNION gates, the TCK
    # distinct rows and the read-query fuzzers.)
    # §2.4 GQL quantified path pattern (round 12, compiler/qpp.py):
    # union-of-fixed-repetition expansion over the NEXT_LINE chain; the
    # SQL oracle is the SAME desugaring written by hand (UNION ALL of
    # 1-hop and 2-hop joins), so it pins the expansion semantics
    "qpp_reach": (
        "MATCH (s:Lineitem)((a)-[r:NEXT_LINE]->(b)){1,2}(t:Lineitem) "
        "WHERE s.linenumber = 1 "
        "RETURN size(r) AS hops, count(*) AS cnt"
    ),
    # §2.7 UNION + §2.10 CALL { } — UNION [not-ALL] between subquery
    # branches with per-branch imports (round 11; replaces the plain
    # top-level union_names gate under the 50-gate cap — that surface
    # stays covered by the union differential fuzzer, TCK union rows,
    # and _union_result's column checks)
    "call_union_branches": (
        "MATCH (r:Region) CALL { WITH r MATCH (n:Nation)-[:IN_REGION]->(r) "
        "RETURN n.name AS name UNION WITH r RETURN r.name AS name } "
        "RETURN r.regionkey AS rk, name"
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
    # §2.10 CALL procedure + YIELD (catalog introspection; deterministic
    # for the fixed from_tpch graph, so a literal VALUES oracle works)
    "call_db_labels": (
        "CALL db.labels() YIELD label RETURN label ORDER BY label"
    ),
    # (math_fns retired under the 50-gate cap in favor of
    # asof_join_latest: its surface — round/sqrt/abs/sign scalar fns,
    # Cypher int/int truncation and % — is covered by the TCK math rows
    # (round-half-away, float/negative modulo, precedence corners), the
    # expression differential fuzzer vs DuckDB, and the rounds that
    # remain inside agg_pricing_summary / stats_percentiles.)
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
    # (events_by_type retired under the 50-gate cap in favor of
    # llm_decontaminate: its surface — implicit groupBy + count +
    # round(sum()) — is covered by agg_pricing_summary, with_having and
    # the aggregation fuzzer; batch Event-entity reads stay covered by
    # the streaming gates' static sides.)
    # §2.5 percentiles & stddev
    # §2.5 stdev + percentileCont/Disc + string min/max per segment
    # (merged stats_fns + disc_and_string_minmax under the 50-gate cap)
    "stats_percentiles": (
        "MATCH (c:Customer) RETURN c.mktsegment AS seg, "
        "round(stdev(c.acctbal), 3) AS sd, "
        "round(percentileCont(c.acctbal, 0.5), 3) AS median, "
        "round(percentileDisc(c.acctbal, 0.25), 2) AS q1, "
        "min(c.name) AS first_name, max(c.name) AS last_name"
    ),
    # parameterized comparison
    "param_filter": (
        "MATCH (o:Order) WHERE o.totalprice > $min AND o.orderstatus = $st "
        "RETURN count(*) AS cnt"
    ),
    # temporal extraction (.year/.month) + date.truncate + grouping
    # (merged orders_by_month + temporal_truncate under the 50-gate cap)
    "temporal_month_truncate": (
        "MATCH (o:Order) WHERE o.orderdate.year = 1997 "
        "RETURN o.orderdate.month AS mo, "
        "date.truncate('quarter', o.orderdate) AS qtr, count(*) AS cnt, "
        "round(sum(o.totalprice), 2) AS total"
    ),
    # quantifier over a collected list + reduce/comprehension/range
    # scalars in the same projection (absorbed list_ops under the
    # 50-gate cap)
    "collect_quantifier": (
        "MATCH (c:Customer)-[:PLACED]->(o:Order) "
        "WITH c.name AS cust, collect(o.totalprice) AS prices "
        "RETURN cust, size(prices) AS n, "
        "all(p IN prices WHERE p > 0.0) AS all_positive, "
        "reduce(acc = 0, x IN [1,2,3,4] | acc + x) AS rtotal, "
        "join([x IN range(1,6) WHERE x % 2 = 0 | toString(x)], ',') AS evens "
        "ORDER BY n DESC, cust LIMIT 20"
    ),
    # (regex_in_concat_hash retired under the 50-gate cap in favor of
    # range_join_windows: `=~` full-string regex stays covered by the
    # TCK regex rows + string differential fuzzer, IN-list by
    # param_in_cross_type, `+` concat by collect_quantifier's join()/
    # toString() and the TCK concat rows, md5/sha256 by the minhash md5
    # bit-parity oracle in llm_* gates and unit tests.)
    # §2.9 pattern comprehension -> correlated collect_list
    "pattern_comprehension": (
        "MATCH (n:Nation) RETURN n.name AS nation, "
        "join([x IN sort([(c:Customer)-[:FROM_NATION]->(n) | c.custkey]) "
        "| toString(x)], ',') AS custs"
    ),
    # §2.10 CALL + iterative graph algorithm (hash-min label propagation)
    "algo_connected_components": (
        "CALL graph.connectedComponents('NEXT_LINE') YIELD id, component "
        "RETURN id AS id, component AS component"
    ),
    # §2.10 CALL + n-way-join triangle counting (chains have none)
    "algo_triangle_count": (
        "CALL graph.triangleCount('NEXT_LINE') YIELD id, triangles "
        "RETURN id AS id, triangles AS triangles"
    ),
    # §2.10 CALL + PageRank (iterative; rows-only check — no SQL analogue)
    "algo_pagerank": (
        "CALL graph.pageRank('FROM_NATION') YIELD id, rank "
        "RETURN id AS id, round(rank, 6) AS rank ORDER BY rank DESC, id LIMIT 10"
    ),
    # round-5 regression gates: anonymous FK-collapsed endpoint WITH an
    # inline props map (the ADVICE-high silent-empty-result shape)
    "fk_props_endpoint": (
        "MATCH (c:Customer)-[:FROM_NATION]->({name: 'NATION_3'}) "
        "RETURN c.name AS name"
    ),
    # parameterized IN with cross-type elements: Cypher says 1 IN ['1'] is
    # false ('5' must not match integer sizes) but 2.0 = 2 numerically
    "param_in_cross_type": (
        "MATCH (p:Part) WHERE p.size IN $sizes "
        "RETURN p.size AS size, count(*) AS cnt"
    ),
    # both endpoints anonymous-unlabeled: label inference from registered
    # relationship endpoints + raw-id joins guarded by label space
    "anon_both_ends": (
        "MATCH (x)-[:IN_REGION]->(y) "
        "RETURN y.name AS region, count(*) AS nations"
    ),
    # undirected relationship from the target side UNION ALL a
    # right-to-left arrow with source-side filter (merged undirected_hop
    # + reverse_hop under the 50-gate cap; also exercises UNION ALL —
    # call_union_branches covers the deduplicating UNION)
    "undirected_reverse_hops": (
        "MATCH (r:Region)-[:IN_REGION]-(n) "
        "RETURN r.name AS name, count(*) AS cnt "
        "UNION ALL "
        "MATCH (n:Nation)<-[:FROM_NATION]-(c:Customer) WHERE c.acctbal < 0.0 "
        "RETURN n.name AS name, count(*) AS cnt"
    ),
}

_PARAMS: dict[str, dict] = {
    "param_filter": {"min": 200000.0, "st": "F"},
    "param_in_cross_type": {"sizes": [1, "5", 10, 2.0]},
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
        "SELECT c_name AS cust, count(o_orderkey) AS n_orders, "
        "CAST(sum(CASE WHEN o_orderkey IS NULL THEN 1 ELSE 0 END) AS BIGINT) "
        "AS null_rows FROM customer "
        "LEFT JOIN orders ON o_custkey = c_custkey GROUP BY c_name"
    ),
    "call_subquery_topk": (
        "SELECT c_custkey AS custkey, o_totalprice AS top_price FROM ("
        "SELECT c.c_custkey, o.o_totalprice, row_number() OVER ("
        "PARTITION BY c.c_custkey ORDER BY o.o_totalprice DESC, o.o_orderkey"
        ") AS rn FROM customer c JOIN orders o ON o.o_custkey = c.c_custkey"
        ") WHERE rn <= 2"
    ),
    "case_string_fns": (
        "SELECT CASE WHEN p_size < 10 THEN 'small' WHEN p_size < 30 THEN 'medium' "
        "ELSE 'large' END AS bucket, upper(left(p_name, 5)) AS prefix, "
        "length(p_name) AS len, contains(p_name, 'a') AS has_a, "
        "count(*) AS cnt FROM part GROUP BY 1, 2, 3, 4"
    ),
    "qpp_reach": (
        "WITH pairs AS ("
        "  SELECT DISTINCT l_orderkey AS ok, l_linenumber AS ln FROM lineitem"
        ") SELECT hops, count(*) AS cnt FROM ("
        "  SELECT 1 AS hops FROM pairs a "
        "  JOIN pairs b ON b.ok = a.ok AND b.ln = a.ln + 1 WHERE a.ln = 1 "
        "  UNION ALL "
        "  SELECT 2 FROM pairs a "
        "  JOIN pairs b ON b.ok = a.ok AND b.ln = a.ln + 1 "
        "  JOIN pairs c ON c.ok = b.ok AND c.ln = b.ln + 1 WHERE a.ln = 1"
        ") GROUP BY hops"
    ),
    "call_union_branches": (
        "SELECT rk, name FROM ("
        "SELECT r_regionkey AS rk, n_name AS name FROM region "
        "JOIN nation ON n_regionkey = r_regionkey "
        "UNION "
        "SELECT r_regionkey AS rk, r_name AS name FROM region)"
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
    "call_db_labels": (
        "SELECT * FROM (VALUES ('Customer'), ('Document'), ('Embedding'), "
        "('Event'), ('Lineitem'), ('Nation'), ('Order'), ('Part'), "
        "('Region'), ('Supplier')) AS t(label) ORDER BY label"
    ),
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
    "stats_percentiles": (
        "SELECT c_mktsegment AS seg, round(stddev_samp(c_acctbal), 3) AS sd, "
        "round(quantile_cont(c_acctbal, 0.5), 3) AS median, "
        "round(quantile_disc(c_acctbal, 0.25), 2) AS q1, "
        "min(c_name) AS first_name, max(c_name) AS last_name "
        "FROM customer GROUP BY c_mktsegment"
    ),
    "param_filter": (
        "SELECT count(*) AS cnt FROM orders "
        "WHERE o_totalprice > 200000.0 AND o_orderstatus = 'F'"
    ),
    "temporal_month_truncate": (
        "SELECT EXTRACT(month FROM o_orderdate) AS mo, "
        "date_trunc('quarter', o_orderdate)::DATE AS qtr, count(*) AS cnt, "
        "round(sum(o_totalprice), 2) AS total FROM orders "
        "WHERE EXTRACT(year FROM o_orderdate) = 1997 GROUP BY 1, 2"
    ),
    "collect_quantifier": (
        "SELECT c_name AS cust, count(*) AS n, "
        "bool_and(o_totalprice > 0.0) AS all_positive, "
        "10 AS rtotal, '2,4,6' AS evens "
        "FROM customer JOIN orders ON o_custkey = c_custkey "
        "GROUP BY c_name ORDER BY n DESC, cust LIMIT 20"
    ),
    "pattern_comprehension": (
        "SELECT n_name AS nation, "
        "array_to_string(list_sort(coalesce(list(c_custkey) "
        "FILTER (c_custkey IS NOT NULL), []::BIGINT[])), ',') AS custs "
        "FROM nation LEFT JOIN customer ON c_nationkey = n_nationkey "
        "GROUP BY n_name"
    ),
    # NEXT_LINE chain graph: components are maximal runs of consecutive
    # linenumbers within an order (gaps-and-islands), component = min id
    "algo_connected_components": (
        "WITH d AS (SELECT DISTINCT l_orderkey AS k, l_linenumber AS ln FROM lineitem), "
        "g AS (SELECT k, ln, ln - row_number() OVER (PARTITION BY k ORDER BY ln) AS grp FROM d), "
        "s AS (SELECT k, ln, count(*) OVER (PARTITION BY k, grp) AS run_len, "
        "min(ln) OVER (PARTITION BY k, grp) AS run_min FROM g) "
        "SELECT k*10+ln AS id, k*10+run_min AS component FROM s WHERE run_len >= 2"
    ),
    # chains contain no triangles: every chain node has triangles = 0
    "algo_triangle_count": (
        "WITH d AS (SELECT DISTINCT l_orderkey AS k, l_linenumber AS ln FROM lineitem), "
        "g AS (SELECT k, ln, ln - row_number() OVER (PARTITION BY k ORDER BY ln) AS grp FROM d), "
        "s AS (SELECT k, ln, count(*) OVER (PARTITION BY k, grp) AS run_len FROM g) "
        "SELECT k*10+ln AS id, 0 AS triangles FROM s WHERE run_len >= 2"
    ),
    "fk_props_endpoint": (
        "SELECT c_name AS name FROM customer "
        "JOIN nation ON c_nationkey = n_nationkey WHERE n_name = 'NATION_3'"
    ),
    # Cypher IN element rules: '5' never equals an integer size; 2.0 = 2
    "param_in_cross_type": (
        "SELECT p_size AS size, count(*) AS cnt FROM part "
        "WHERE p_size IN (1, 2, 10) GROUP BY p_size"
    ),
    "anon_both_ends": (
        "SELECT r_name AS region, count(*) AS nations FROM nation "
        "JOIN region ON n_regionkey = r_regionkey GROUP BY r_name"
    ),
    "undirected_reverse_hops": (
        "SELECT r_name AS name, count(*) AS cnt FROM nation "
        "JOIN region ON n_regionkey = r_regionkey GROUP BY r_name "
        "UNION ALL "
        "SELECT n_name AS name, count(*) AS cnt FROM customer "
        "JOIN nation ON c_nationkey = n_nationkey "
        "WHERE c_acctbal < 0.0 GROUP BY n_name"
    ),
}


def _pagerank_oracle_sql(damping: float = 0.85, iterations: int = 10) -> str:
    """Unrolled power-iteration PageRank over the FROM_NATION edge list,
    replicating algorithms.pagerank exactly: rank0 = 1/n, each round
    contribs = sum(rank/out_deg) per dst, dangling mass (1 - flowed)/n
    redistributed uniformly, rank = (1-d)/n + d*(in + dangling).
    Chained CTEs (one c/f/r triple per iteration) instead of a recursive
    CTE so the SQL stays portable; float divergence vs Spark's summation
    order is absorbed by the round(rank, 6) on both sides. c/r are
    MATERIALIZED: f_i and r_i both consume c_i, so inlined CTEs would
    re-evaluate the whole chain exponentially (measured: >5 min inlined
    vs 0.1 s materialized at sf0.01)."""
    base = f"(1.0 - {damping})"
    ctes = [
        "edges AS (SELECT c_custkey AS src, c_nationkey AS dst FROM customer)",
        "nodes AS (SELECT src AS id FROM edges UNION SELECT dst FROM edges)",
        "p AS (SELECT CAST(count(*) AS DOUBLE) AS n FROM nodes)",
        "deg AS (SELECT src, count(*) AS deg FROM edges GROUP BY src)",
        "r0 AS (SELECT id, 1.0 / (SELECT n FROM p) AS rank FROM nodes)",
    ]
    for i in range(1, iterations + 1):
        ctes.append(
            f"c{i} AS MATERIALIZED (SELECT e.dst AS id, sum(r.rank / d.deg) AS _in "
            f"FROM edges e JOIN r{i-1} r ON e.src = r.id "
            f"JOIN deg d ON e.src = d.src GROUP BY e.dst)"
        )
        ctes.append(
            f"f{i} AS (SELECT coalesce(sum(_in), 0.0) AS fl FROM c{i})"
        )
        ctes.append(
            f"r{i} AS MATERIALIZED (SELECT n.id, {base} / (SELECT n FROM p) + {damping} * "
            f"(coalesce(c._in, 0.0) + (1.0 - (SELECT fl FROM f{i})) / (SELECT n FROM p)) "
            f"AS rank FROM nodes n LEFT JOIN c{i} c ON n.id = c.id)"
        )
    return (
        "WITH " + ", ".join(ctes)
        + f" SELECT id, round(rank, 6) AS rank FROM r{iterations} "
        "ORDER BY rank DESC, id LIMIT 10"
    )


_ORACLE["algo_pagerank"] = _pagerank_oracle_sql()


# --------------------------------------------------------------------- #
# Mutation path (§2.10) and Structured Streaming (§2.11) in the gate
# --------------------------------------------------------------------- #
def _q_mutation_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CREATE -> DELETE -> SET -> read-back on a throwaway catalog.

    Uses a fresh engine (not the shared cache) so the mutation never
    leaks into other gate queries.
    """
    from pycypher_nmetl_spark import CypherEngine, GraphCatalog

    eng = CypherEngine(GraphCatalog.from_tpch(spark, sf_dir))
    eng.execute(
        "MATCH (c:Customer) WHERE c.acctbal < 0.0 "
        "CREATE (:Debtor {ckey: c.custkey, bal: c.acctbal})"
    )
    eng.execute("MATCH (d:Debtor) WHERE d.bal > -10.0 DELETE d")
    eng.execute("MATCH (d:Debtor) SET d.absbal = -d.bal")
    return eng.execute(
        "MATCH (d:Debtor) RETURN count(*) AS n, round(sum(d.absbal), 2) AS total"
    )


def _q_merge_on_match(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MERGE hitting both branches (ON MATCH for an existing node key,
    ON CREATE for a fresh one) on a throwaway catalog, then read back.

    Reference semantics: mutation_engine.py merge_node — the props map is
    the match key; ON MATCH/ON CREATE SET apply exclusively.
    """
    from pycypher_nmetl_spark import CypherEngine, GraphCatalog

    eng = CypherEngine(GraphCatalog.from_tpch(spark, sf_dir))
    eng.execute(
        "MERGE (n:Nation {name: 'NATION_3'}) "
        "ON MATCH SET n.seen = 1 ON CREATE SET n.seen = 0"
    )
    eng.execute(
        "MERGE (n:Nation {name: 'NATION_99X'}) "
        "ON MATCH SET n.seen = 1 ON CREATE SET n.seen = 0"
    )
    return eng.execute(
        "MATCH (n:Nation) WHERE n.seen IS NOT NULL "
        "RETURN n.name AS name, n.seen AS seen"
    )


_STREAM_SEQ = [0]


def _events_stream(spark: SparkSession, sf_dir: str):
    """(streaming df, event-time Column) over events.parquet."""
    from pyspark.sql import functions as F

    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    schema = spark.read.parquet(f"{sf_dir}/events.parquet").schema
    sdf = (
        spark.readStream.schema(schema)
        .option("pathGlobFilter", "events.parquet")
        .parquet(sf_dir)
    )
    if dict((f.name, f.dataType.simpleString()) for f in schema.fields).get(
        "ts"
    ) == "bigint":
        ev_ts = F.timestamp_micros((F.col("ts") / 1000).cast("long"))
    else:
        ev_ts = F.col("ts").cast("timestamp")
    return sdf, ev_ts


def _run_stream(agg, name_prefix: str, mode: str = "complete"):
    _STREAM_SEQ[0] += 1
    name = f"{name_prefix}_{_STREAM_SEQ[0]}"
    q = (
        agg.writeStream.format("memory")
        .queryName(name)
        .outputMode(mode)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    return name


def _q_stream_session_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming gap-merged session windows per user (library operator
    streaming/windows.py session_window_agg; reference windows.py:137-176).
    Oracle: islands-style gap merge in SQL — sessions break when the gap
    to the previous event is >= 30 minutes; Spark's session end is
    last-event + gap."""
    from pyspark.sql import functions as F

    from pycypher_nmetl_spark.streaming.windows import session_window_agg

    sdf, ev_ts = _events_stream(spark, sf_dir)
    agg = session_window_agg(
        sdf.withColumn("ev_ts", ev_ts),
        "ev_ts",
        "30 minutes",
        {
            "cnt": F.count(F.lit(1)),
            "total": F.round(F.sum("value"), 2),
        },
        keys=["user_id"],
        watermark="1 hour",
    ).select(
        "session_start", "session_end", F.col("user_id").alias("uid"),
        "cnt", "total",
    )
    name = _run_stream(agg, "gate_stream_sess")
    return spark.sql(
        f"SELECT session_start, session_end, uid, cnt, total FROM {name}"
    )


def _q_stream_static_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-static enrichment join (library StreamPipeline.join_static;
    reference: StreamTableJoin, joins.py:19-205): events stream joined to
    the customer dimension snapshot, aggregated per market segment."""
    from pyspark.sql import functions as F

    from pycypher_nmetl_spark.streaming.core import StreamPipeline

    sdf, ev_ts = _events_stream(spark, sf_dir)
    customers = spark.read.parquet(f"{sf_dir}/customer.parquet").select(
        F.col("c_custkey").alias("user_id"), F.col("c_mktsegment").alias("seg")
    )
    pipe = StreamPipeline(sdf.withColumn("ev_ts", ev_ts)).join_static(
        customers, on=["user_id"], how="inner"
    )
    agg = (
        pipe.df.groupBy("seg")
        .agg(F.count(F.lit(1)).alias("cnt"), F.round(F.sum("value"), 2).alias("total"))
    )
    name = _run_stream(agg, "gate_stream_join")
    return spark.sql(f"SELECT seg, cnt, total FROM {name}")


def _q_stream_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """File-source stream over events.parquet: watermark + 1-day tumbling
    window aggregation, availableNow trigger, memory sink."""
    from pyspark.sql import functions as F

    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    schema = spark.read.parquet(f"{sf_dir}/events.parquet").schema
    # the file source requires a directory: stream the sf dir with a glob
    sdf = (
        spark.readStream.schema(schema)
        .option("pathGlobFilter", "events.parquet")
        .parquet(sf_dir)
    )
    # ts precision depends on how the dataset was written: TIMESTAMP(NANOS)
    # arrives as long under nanosAsLong, micros as a native timestamp
    if dict((f.name, f.dataType.simpleString()) for f in schema.fields).get(
        "ts"
    ) == "bigint":
        ev_ts = F.timestamp_micros((F.col("ts") / 1000).cast("long"))
    else:
        ev_ts = F.col("ts").cast("timestamp")
    agg = (
        sdf.withColumn("ev_ts", ev_ts)
        .withWatermark("ev_ts", "1 hour")
        .groupBy(F.window("ev_ts", "1 day").alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("cnt"), F.round(F.sum("value"), 2).alias("total"))
        .select(
            F.col("w.start").cast("date").alias("day"),
            F.col("event_type").alias("etype"),
            "cnt",
            "total",
        )
    )
    _STREAM_SEQ[0] += 1
    name = f"gate_stream_win_{_STREAM_SEQ[0]}"
    q = (
        agg.writeStream.format("memory")
        .queryName(name)
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    return spark.sql(f"SELECT day, etype, cnt, total FROM {name}")


# --------------------------------------------------------------------- #
# LLM-pipeline operators (SURVEY.md §7.2 M8) over documents/embeddings
# --------------------------------------------------------------------- #
def _docs(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/documents.parquet")


def _embs(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/embeddings.parquet")


def _q_dsir_weights(spark, sf_dir):
    # DSIR importance weights (Xie et al. 2023): hashed unigram+bigram
    # bucket features, add-1-smoothed target/raw distributions, per-doc
    # log importance weight. md5 bucketing for bit-exact DuckDB parity;
    # target = doc_id % 7 == 0 subset, raw = the rest.
    from pyspark.sql import functions as F

    from pycypher_nmetl_spark.llmops.dsir import dsir_log_ratios, dsir_weights

    d = _docs(spark, sf_dir)
    target = d.filter(F.col("doc_id") % 7 == 0)
    raw = d.filter(F.col("doc_id") % 7 != 0)
    ratios = dsir_log_ratios(target, raw, "text", buckets=1000, hash_fn="md5")
    w = dsir_weights(raw, "doc_id", "text", ratios, buckets=1000, hash_fn="md5")
    return w.select("doc_id", "n_features", F.round("logw", 4).alias("logw"))


def _q_ngram_lm(spark, sf_dir):
    # CCNet-style perplexity filter (stupid-backoff bigram LM): train on
    # the doc_id % 3 != 0 subset so the backoff/OOV branches actually
    # fire when scoring the full corpus; oracle re-implements the whole
    # count-join-backoff arithmetic in SQL. (Replaces llm_dedup_exact
    # under the 50-gate cap: that two-aggregate surface is covered by
    # test_llmops + the exact-substring gates' window hashing.)
    from pyspark.sql import functions as F

    from pycypher_nmetl_spark.llmops import add_lm_perplexity

    d = _docs(spark, sf_dir)
    out = add_lm_perplexity(
        d.select("doc_id", "text"),
        "text",
        n=2,
        train_df=d.filter(F.col("doc_id") % 3 != 0),
    )
    return out.select(
        "doc_id",
        "n_scored",
        F.round("lm_avg_logprob", 6).alias("lm_avg_logprob"),
        F.round("ppl", 4).alias("ppl"),
    )


def _q_ngram_jaccard(spark, sf_dir):
    from pyspark.sql import functions as F

    from pycypher_nmetl_spark.llmops import ngram_jaccard_pairs

    out = ngram_jaccard_pairs(_docs(spark, sf_dir), "doc_id", "text", k=3, threshold=0.7)
    return out.select("id1", "id2", F.round("jaccard", 4).alias("jaccard"))


def _q_minhash_lsh(spark, sf_dir):
    from pyspark.sql import functions as F

    from pycypher_nmetl_spark.llmops import minhash_lsh_pairs

    out = minhash_lsh_pairs(
        _docs(spark, sf_dir), "doc_id", "text", k=3, num_perm=32, bands=16,
        threshold=0.7,
    )
    return out.select("id1", "id2", F.round("jaccard", 4).alias("jaccard"))


def _q_text_quality(spark, sf_dir):
    # merged llm_token_count + llm_text_quality under the 50-gate cap
    # (round 9): both are pure column expressions over documents, and the
    # combined projection exercises add_token_count AND add_quality.
    from pycypher_nmetl_spark.llmops import add_quality, add_token_count

    d = add_quality(add_token_count(_docs(spark, sf_dir), "text"), "text")
    return d.select(
        "doc_id", "n_tokens", "n_tokens_bpe_est", "mean_token_len",
        "stopword_ratio", "quality_score",
    )


def _q_lang_fingerprint(spark, sf_dir):
    # merged llm_lang_id + llm_fingerprint under the 50-gate cap (round
    # 9): per-doc rows exercise BOTH the charset language heuristic and
    # the sorted-vocabulary md5 fingerprint.
    from pycypher_nmetl_spark.llmops import add_fingerprint, add_lang_id

    d = add_fingerprint(add_lang_id(_docs(spark, sf_dir), "text"), "text")
    return d.select("doc_id", "lang_pred", "fingerprint")


def _q_exact_substring_pairs(spark, sf_dir):
    # Lee et al. 2021 ExactSubstr, pair surface: docs sharing >= 1 exact
    # 10-token window (window joined on xxhash64; oracle joins on the
    # window string itself — equality of strings == equality of hashes)
    from pycypher_nmetl_spark.llmops import exact_substring_pairs

    return exact_substring_pairs(_docs(spark, sf_dir), "doc_id", "text", window=10)


def _q_exact_substring_cut(spark, sf_dir):
    # full ExactSubstr roundtrip: duplicated-window detection -> span
    # merge (gaps-and-islands) -> token-level cut; the returned text is
    # compared byte-for-byte against the SQL re-implementation
    from pycypher_nmetl_spark.llmops import exact_substring_dedup

    out = exact_substring_dedup(_docs(spark, sf_dir), "doc_id", "text", window=10)
    return out.select("doc_id", "text")


def _q_embedding_topk(spark, sf_dir):
    from pyspark.sql import functions as F

    from pycypher_nmetl_spark.llmops import brute_force_topk

    e = _embs(spark, sf_dir)
    query = e.filter(F.col("vec_id") == 0).select("embedding").first()[0]
    out = brute_force_topk(
        e.filter(F.col("vec_id") != 0), "embedding", list(query), k=10, id_col="vec_id"
    )
    return out.select("vec_id", F.round("cosine", 6).alias("cosine"))


def _q_embedding_neardup(spark, sf_dir):
    # exercises the DEFAULT banded-LSH path (32 bands x 4 bits, seed 42)
    # and stays green against the exact all-pairs SQL oracle: candidate
    # precision is exact, and recall on this fixed dataset is 1.0
    # (pinned by tests/test_llmops.py)
    from pyspark.sql import functions as F

    from pycypher_nmetl_spark.llmops import near_dup_pairs

    out = near_dup_pairs(_embs(spark, sf_dir), "embedding", threshold=0.45, id_col="vec_id")
    return out.select("id1", "id2", F.round("cosine", 6).alias("cosine"))


def _q_simhash_buckets(spark, sf_dir):
    # hash_fn="md5" so the fingerprint is bit-for-bit reproducible in the
    # DuckDB oracle (('0x'||substr(md5(tok),1,15))::BIGINT); the default
    # xxhash64 fast path is covered by tests/test_llmops.py.
    from pycypher_nmetl_spark.llmops import simhash_buckets

    return simhash_buckets(_docs(spark, sf_dir), "doc_id", "text", hash_fn="md5")


def _q_ivf_topk(spark, sf_dir):
    # ANN scale path: driver k-means on a sample, broadcast-argmin cluster
    # assignment (narrow map, no shuffle), then scan only the nprobe
    # nearest clusters. Approximate by design -> rows-only gate; recall
    # vs brute force is asserted in tests/test_llmops.py.
    from pyspark.sql import functions as F

    from pycypher_nmetl_spark.llmops import ivf_build, ivf_topk

    e = _embs(spark, sf_dir)
    query = e.filter(F.col("vec_id") == 0).select("embedding").first()[0]
    assigned, cents = ivf_build(
        e.filter(F.col("vec_id") != 0), "embedding", n_clusters=8, id_col="vec_id"
    )
    out = ivf_topk(assigned, cents, "embedding", list(query), k=10, nprobe=4, id_col="vec_id")
    return out.select("vec_id", F.round("cosine", 6).alias("cosine"))



def _mm_media():
    """Deterministic synthetic media for the multimodal gate: the synth
    builders' parameters ARE the oracle (dims/duration are literals in
    the SQL below, independent of the decoder implementation)."""
    from pycypher_nmetl_spark.llmops.multimodal import (
        synth_bmp, synth_gif, synth_jpeg, synth_png, synth_wav,
    )

    return [
        (1, "image", synth_png(101, 77), "image/png"),
        (2, "image", synth_gif(320, 200), "image/gif"),
        (3, "image", synth_bmp(64, 48), "image/bmp"),
        (4, "image", synth_jpeg(1920, 1080), "image/jpeg"),
        (5, "audio", synth_wav(8000, 16000), "audio/wav"),
    ]


def _q_multimodal(spark, sf_dir):
    # real header-parse decoders (PNG/GIF/BMP/JPEG dims, stdlib-wave
    # audio) over Arrow-batched mapInPandas; one unioned feature frame
    from pyspark.sql import functions as F

    from pycypher_nmetl_spark.llmops.multimodal import (
        MEDIA_SCHEMA, extract_audio_features, extract_image_features,
    )

    rows = [(i, k, bytearray(b), m, {}) for i, k, b, m in _mm_media()]
    media = spark.createDataFrame(rows, MEDIA_SCHEMA)
    img = extract_image_features(media).select(
        "media_id",
        F.col("width").cast("long").alias("width"),
        F.col("height").cast("long").alias("height"),
        F.lit(None).cast("long").alias("duration_ms"),
        F.lit(None).cast("long").alias("sample_rate"),
        "n_bytes",
        "content_hash",
    )
    aud = extract_audio_features(media).select(
        "media_id",
        F.lit(None).cast("long").alias("width"),
        F.lit(None).cast("long").alias("height"),
        "duration_ms",
        F.col("sample_rate").cast("long").alias("sample_rate"),
        "n_bytes",
        "content_hash",
    )
    return img.unionByName(aud)


def _mm_oracle_sql() -> str:
    import hashlib

    vals = []
    dims = {1: (101, 77), 2: (320, 200), 3: (64, 48), 4: (1920, 1080)}
    for i, kind, b, _m in _mm_media():
        h = hashlib.md5(b).hexdigest()
        if kind == "image":
            w, ht = dims[i]
            vals.append(f"({i}, {w}, {ht}, NULL, NULL, {len(b)}, '{h}')")
        else:  # 8000 frames at 16 kHz -> 500 ms
            vals.append(f"({i}, NULL, NULL, 500, 16000, {len(b)}, '{h}')")
    return (
        "SELECT * FROM (VALUES " + ", ".join(vals) + ") AS t(media_id, "
        "width, height, duration_ms, sample_rate, n_bytes, content_hash)"
    )


def _q_decontaminate(spark, sf_dir):
    from pyspark.sql import functions as F

    from pycypher_nmetl_spark.llmops import contamination_pairs

    docs = _docs(spark, sf_dir)
    eval_df = docs.filter(F.col("doc_id") % 97 == 0)
    train = docs.filter(F.col("doc_id") % 97 != 0)
    out = contamination_pairs(train, eval_df, n=3, min_contamination=0.02)
    return out.select(
        "train_id",
        "eval_id",
        "shared",
        "eval_ngrams",
        F.round("contamination", 4).alias("contamination"),
    )


_LLMOPS_QUERIES = {
    "llm_ngram_lm": _q_ngram_lm,
    "llm_dsir_weights": _q_dsir_weights,
    "llm_decontaminate": _q_decontaminate,
    "llm_ngram_jaccard_pairs": _q_ngram_jaccard,
    "llm_minhash_lsh_pairs": _q_minhash_lsh,
    "llm_text_quality": _q_text_quality,
    "llm_lang_fingerprint": _q_lang_fingerprint,
    "llm_exact_substring_pairs": _q_exact_substring_pairs,
    "llm_exact_substring_cut": _q_exact_substring_cut,
    "llm_embedding_topk": _q_embedding_topk,
    "llm_embedding_neardup": _q_embedding_neardup,
    "llm_simhash_buckets": _q_simhash_buckets,
    "llm_ivf_topk": _q_ivf_topk,
    "llm_multimodal": _q_multimodal,
}

_JACCARD_PAIRS_SQL = (
    "WITH toks AS (SELECT doc_id, regexp_split_to_array(trim(text), '\\s+') AS t "
    "FROM documents), "
    "sh AS (SELECT doc_id, list_distinct([array_to_string(t[i:i+2], ' ') "
    "FOR i IN range(1, len(t) - 1)]) AS s FROM toks), "
    "ex AS (SELECT doc_id, unnest(s) AS g, len(s) AS n FROM sh), "
    "pairs AS (SELECT a.doc_id AS id1, b.doc_id AS id2, count(*) AS shared, "
    "any_value(a.n) AS na, any_value(b.n) AS nb FROM ex a "
    "JOIN ex b ON a.g = b.g AND a.doc_id < b.doc_id GROUP BY a.doc_id, b.doc_id) "
    "SELECT id1, id2, round(shared / (na + nb - shared), 4) AS jaccard "
    "FROM pairs WHERE shared / (na + nb - shared) >= 0.7"
)

# shared sliding-window CTE for the ExactSubstr oracles (window=10):
# the oracle keys on the literal 10-token substring where Spark keys on
# its xxhash64 — string equality and hash equality define the same
# duplicate set (2^-64 collision odds aside).
_SUBSTR_WINS_SQL = (
    "WITH toks AS (SELECT doc_id, regexp_split_to_array(trim(text), '\\s+') AS t "
    "FROM documents), "
    "wins AS (SELECT doc_id, unnest(generate_series(1, greatest(len(t) - 9, 0))) "
    "AS pos, t FROM toks), "
    "wh AS (SELECT doc_id, pos, array_to_string(t[pos:pos+9], ' ') AS win FROM wins)"
)

_LLMOPS_ORACLE = {
    "llm_multimodal": _mm_oracle_sql(),
    # full SQL re-implementation of stupid-backoff bigram scoring:
    # training counts from the doc_id % 3 != 0 subset, per-position
    # CASE over (bigram hit -> c2/c_ctx | backoff -> 0.4 * smoothed
    # unigram | position 1 -> smoothed unigram), add-one floor over
    # (total + vocab), avg log10 per doc, ppl = 10^-avg. Empty docs
    # surface as null scores through the trailing LEFT JOIN exactly
    # like the Spark side's left join back to the corpus.
    # full SQL re-implementation of DSIR weighting: md5 bucket of every
    # unigram+bigram mod 1000, add-1-smoothed bucket distributions for
    # the target (doc_id % 7 = 0) and raw (rest) corpora, per-doc
    # sum(count_b * (ln p_t[b] - ln q_r[b])). Raw docs with no tokens
    # come back (0, 0.0) in both engines.
    "llm_dsir_weights": (
        "WITH toks AS (SELECT doc_id, list_filter("
        "regexp_split_to_array(trim(text), '\\s+'), x -> x <> '') AS t "
        "FROM documents), "
        "grams AS (SELECT doc_id, unnest(t || "
        "[array_to_string(t[i:i+1], ' ') FOR i IN range(1, len(t))]) AS g "
        "FROM toks), "
        "db AS (SELECT doc_id, "
        "('0x' || substr(md5(g), 1, 15))::BIGINT % 1000 AS bucket FROM grams), "
        "tc AS (SELECT bucket, count(*) AS c FROM db "
        "WHERE doc_id % 7 = 0 GROUP BY bucket), "
        "rc AS (SELECT bucket, count(*) AS c FROM db "
        "WHERE doc_id % 7 <> 0 GROUP BY bucket), "
        "tot AS (SELECT (SELECT sum(c) FROM tc) AS tt, "
        "(SELECT sum(c) FROM rc) AS rt), "
        "ratio AS (SELECT coalesce(tc.bucket, rc.bucket) AS bucket, "
        "ln((coalesce(tc.c, 0) + 1.0) / (tot.tt + 1000.0)) "
        "- ln((coalesce(rc.c, 0) + 1.0) / (tot.rt + 1000.0)) AS lr "
        "FROM tc FULL OUTER JOIN rc ON tc.bucket = rc.bucket CROSS JOIN tot), "
        "w AS (SELECT db.doc_id, count(*) AS n_features, "
        "round(sum(ratio.lr), 4) AS logw FROM db "
        "JOIN ratio ON db.bucket = ratio.bucket "
        "WHERE db.doc_id % 7 <> 0 GROUP BY db.doc_id) "
        "SELECT d.doc_id, coalesce(w.n_features, 0) AS n_features, "
        "coalesce(w.logw, 0.0) AS logw FROM documents d "
        "LEFT JOIN w ON d.doc_id = w.doc_id WHERE d.doc_id % 7 <> 0"
    ),
    "llm_ngram_lm": (
        "WITH toks AS (SELECT doc_id, list_filter("
        "regexp_split_to_array(trim(text), '\\s+'), x -> x <> '') AS t "
        "FROM documents), "
        "tr AS (SELECT t FROM toks WHERE doc_id % 3 <> 0), "
        "uni AS (SELECT w, count(*) AS c FROM "
        "(SELECT unnest(t) AS w FROM tr) GROUP BY w), "
        "big AS (SELECT g, count(*) AS c FROM "
        "(SELECT array_to_string(t[i:i+1], ' ') AS g FROM "
        "(SELECT t, unnest(generate_series(1, len(t) - 1)) AS i FROM tr)) "
        "GROUP BY g), "
        "tot AS (SELECT sum(c) AS total, count(*) AS vocab FROM uni), "
        "pos AS (SELECT doc_id, t, "
        "unnest(generate_series(1, len(t))) AS p FROM toks), "
        "scored AS (SELECT pos.doc_id, CASE "
        "WHEN pos.p >= 2 AND b.c IS NOT NULL AND u2.c IS NOT NULL "
        "THEN b.c * 1.0 / u2.c "
        "WHEN pos.p >= 2 "
        "THEN 0.4 * (coalesce(u.c, 0) + 1) / (tot.total + tot.vocab) "
        "ELSE (coalesce(u.c, 0) + 1) * 1.0 / (tot.total + tot.vocab) END AS s "
        "FROM pos "
        "LEFT JOIN uni u ON u.w = pos.t[pos.p] "
        "LEFT JOIN uni u2 ON pos.p >= 2 AND u2.w = pos.t[pos.p - 1] "
        "LEFT JOIN big b ON pos.p >= 2 "
        "AND b.g = array_to_string(pos.t[pos.p - 1:pos.p], ' ') "
        "CROSS JOIN tot), "
        "agg AS (SELECT doc_id, count(*) AS n_scored, "
        "round(avg(log10(s)), 6) AS lm_avg_logprob, "
        "round(pow(10, -avg(log10(s))), 4) AS ppl FROM scored GROUP BY doc_id) "
        "SELECT d.doc_id, a.n_scored, a.lm_avg_logprob, a.ppl "
        "FROM documents d LEFT JOIN agg a ON d.doc_id = a.doc_id"
    ),
    "llm_ngram_jaccard_pairs": _JACCARD_PAIRS_SQL,
    "llm_minhash_lsh_pairs": _JACCARD_PAIRS_SQL,  # verified LSH = exact set
    "llm_decontaminate": (
        "WITH ev0 AS (SELECT doc_id, text FROM documents WHERE doc_id % 97 = 0), "
        "tr0 AS (SELECT doc_id, text FROM documents WHERE doc_id % 97 <> 0), "
        "evt AS (SELECT doc_id, list_distinct([array_to_string(t[i:i+2], ' ') "
        "FOR i IN range(1, len(t) - 1)]) AS s FROM "
        "(SELECT doc_id, regexp_split_to_array(trim(text), '\\s+') AS t FROM ev0)), "
        "trt AS (SELECT doc_id, list_distinct([array_to_string(t[i:i+2], ' ') "
        "FOR i IN range(1, len(t) - 1)]) AS s FROM "
        "(SELECT doc_id, regexp_split_to_array(trim(text), '\\s+') AS t FROM tr0)), "
        "evx AS (SELECT doc_id, unnest(s) AS g, len(s) AS n FROM evt), "
        "trx AS (SELECT doc_id, unnest(s) AS g FROM trt) "
        "SELECT t.doc_id AS train_id, e.doc_id AS eval_id, count(*) AS shared, "
        "any_value(e.n) AS eval_ngrams, "
        "round(count(*) / any_value(e.n), 4) AS contamination "
        "FROM trx t JOIN evx e ON t.g = e.g GROUP BY t.doc_id, e.doc_id "
        "HAVING count(*) / any_value(e.n) >= 0.02"
    ),
    "llm_text_quality": (
        "WITH toks AS (SELECT doc_id, text, "
        "regexp_split_to_array(trim(text), '\\s+') AS t FROM documents), "
        "q AS (SELECT doc_id, text, len(t) AS n_tokens, "
        "round(list_sum(list_transform(t, x -> length(x))) / greatest(len(t), 1), 4) "
        "AS mean_token_len, "
        "round(len(list_intersect(t, ['the','a','of','and','to','in','is','it'])) "
        "/ greatest(len(t), 1), 4) AS stopword_ratio, "
        "round(length(regexp_replace(text, '[^.,;:!?''\"()]', '', 'g')) "
        "/ greatest(length(text), 1), 4) AS punct_ratio FROM toks) "
        "SELECT doc_id, n_tokens, "
        "CAST(ceil(length(text) / 4.0) AS BIGINT) AS n_tokens_bpe_est, "
        "mean_token_len, stopword_ratio, "
        "round(least(n_tokens / 100.0, 1.0) * 0.5 + (1.0 - punct_ratio) * 0.3 "
        "+ least(stopword_ratio * 5.0, 1.0) * 0.2, 4) AS quality_score FROM q"
    ),
    "llm_lang_fingerprint": (
        "SELECT doc_id, CASE WHEN regexp_matches(text, '[一-鿿]') THEN 'zh' "
        "WHEN regexp_matches(text, '[Ѐ-ӿ]') THEN 'ru' "
        "WHEN regexp_matches(text, '[äöüß]') THEN 'de' "
        "WHEN regexp_matches(text, '[éèêàçîô]') THEN 'fr' "
        "WHEN regexp_matches(text, '[ñ¿¡áí]') THEN 'es' ELSE 'en' END AS lang_pred, "
        "md5(array_to_string(list_sort(list_distinct("
        "regexp_split_to_array(trim(lower(text)), '\\s+'))), ' ')) AS fingerprint "
        "FROM documents"
    ),
    "llm_exact_substring_pairs": (
        _SUBSTR_WINS_SQL
        + ", dw AS (SELECT DISTINCT doc_id, win FROM wh), "
        "dup AS (SELECT doc_id, win FROM (SELECT doc_id, win, "
        "count(*) OVER (PARTITION BY win) AS c FROM dw) "
        "WHERE c >= 2 AND c <= 1000) "
        "SELECT a.doc_id AS id1, b.doc_id AS id2, count(*) AS n_windows "
        "FROM dup a JOIN dup b ON a.win = b.win AND a.doc_id < b.doc_id "
        "GROUP BY 1, 2"
    ),
    "llm_exact_substring_cut": (
        _SUBSTR_WINS_SQL
        + ", dup AS (SELECT doc_id, pos FROM (SELECT doc_id, pos, "
        "count(*) OVER (PARTITION BY win) AS c FROM wh) WHERE c >= 2), "
        "isl AS (SELECT doc_id, pos, sum(CASE WHEN prev IS NULL OR "
        "pos - prev > 10 THEN 1 ELSE 0 END) OVER (PARTITION BY doc_id "
        "ORDER BY pos) AS g FROM (SELECT doc_id, pos, lag(pos) OVER "
        "(PARTITION BY doc_id ORDER BY pos) AS prev FROM dup)), "
        "spans AS (SELECT doc_id, min(pos) AS s, max(pos) + 9 AS e "
        "FROM isl GROUP BY doc_id, g), "
        "tokpos AS (SELECT doc_id, unnest(t) AS tok, "
        "unnest(generate_series(1, len(t))) AS pos FROM toks), "
        "kept AS (SELECT tp.doc_id, tp.pos, tp.tok FROM tokpos tp "
        "WHERE NOT EXISTS (SELECT 1 FROM spans s WHERE s.doc_id = tp.doc_id "
        "AND tp.pos BETWEEN s.s AND s.e)), "
        "rebuilt AS (SELECT doc_id, string_agg(tok, ' ' ORDER BY pos) AS nt "
        "FROM kept GROUP BY doc_id) "
        "SELECT d.doc_id, CASE WHEN sp.doc_id IS NULL THEN d.text "
        "ELSE coalesce(r.nt, '') END AS text FROM documents d "
        "LEFT JOIN (SELECT DISTINCT doc_id FROM spans) sp ON d.doc_id = sp.doc_id "
        "LEFT JOIN rebuilt r ON d.doc_id = r.doc_id"
    ),
    "llm_embedding_topk": (
        "SELECT b.vec_id AS vec_id, round(list_cosine_similarity("
        "CAST(a.embedding AS DOUBLE[]), CAST(b.embedding AS DOUBLE[])), 6) AS cosine "
        "FROM embeddings a JOIN embeddings b ON a.vec_id = 0 AND b.vec_id <> 0 "
        "ORDER BY cosine DESC, vec_id LIMIT 10"
    ),
    # Literal oracle generated by tools/gen_ivf_oracle.py — an
    # independent numpy reimplementation of the IVF spec (seed-42
    # k-means, 8 clusters, 10 iters, nprobe=4, top-10 by cosine) run on
    # the fixed sf0.01 embeddings the gate always uses. Regenerate with:
    #   python tools/gen_ivf_oracle.py /root/testdata/sf0.01
    "llm_ivf_topk": (
        "SELECT CAST(vec_id AS BIGINT) AS vec_id, "
        "CAST(cosine AS DOUBLE) AS cosine FROM (VALUES "
        "(365, 0.369994), (334, 0.362722), (387, 0.331139), "
        "(423, 0.296934), (7, 0.292842), (190, 0.281795), "
        "(464, 0.276628), (388, 0.276301), (323, 0.256455), "
        "(344, 0.252487)) AS t(vec_id, cosine)"
    ),
    # SimHash reproduced in pure SQL: same tokens (whitespace split of
    # trim), same 60-bit md5-derived token hash, same strict-majority
    # bit vote as llmops.dedup.simhash(bits=16, prefix_bits=8).
    "llm_simhash_buckets": (
        "WITH toks AS (SELECT doc_id, list_distinct("
        "regexp_split_to_array(trim(text), '\\s+')) AS t FROM documents), "
        "hs AS (SELECT doc_id, list_transform(t, x -> "
        "CAST(('0x' || substr(md5(x), 1, 15)) AS BIGINT)) AS h FROM toks), "
        "sh AS (SELECT doc_id, CAST(coalesce(list_sum("
        "[CASE WHEN list_sum(list_transform(h, v -> "
        "CASE WHEN (v >> j) & 1 = 1 THEN 1 ELSE -1 END)) > 0 "
        "THEN 1 << j ELSE 0 END FOR j IN range(0, 16)]), 0) AS BIGINT) "
        "AS simhash FROM hs) "
        "SELECT doc_id AS id, simhash, "
        "CAST(simhash >> 8 AS BIGINT) AS bucket FROM sh"
    ),
    "llm_embedding_neardup": (
        "SELECT a.vec_id AS id1, b.vec_id AS id2, round(list_cosine_similarity("
        "CAST(a.embedding AS DOUBLE[]), CAST(b.embedding AS DOUBLE[])), 6) AS cosine "
        "FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id "
        "WHERE list_cosine_similarity(CAST(a.embedding AS DOUBLE[]), "
        "CAST(b.embedding AS DOUBLE[])) >= 0.45"
    ),
}


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return _cypher(_CYPHER_QUERIES["two_hop_filter"])(spark, "/root/testdata/sf0.001")


# --------------------------------------------------------------------- #
# Temporal joins (round 10): operators Spark lacks natively
# --------------------------------------------------------------------- #
def _q_asof_join_latest(spark, sf_dir):
    """Latest error at-or-before each click, per user — asof_join's
    union-window compilation (1 exchange, 0 joins; plan-pinned in
    tests/test_temporal_joins.py). Oracle: DuckDB's native ASOF JOIN."""
    from pyspark.sql import functions as F

    from pycypher_nmetl_spark.temporal_joins import asof_join

    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    clicks = ev.filter(F.col("event_type") == "click").select(
        "event_id", "ts", "user_id"
    )
    errors = ev.filter(F.col("event_type") == "error").select(
        "ts", "user_id",
        F.col("event_id").alias("err_id"),
        F.col("value").alias("err_value"),
    )
    out = asof_join(clicks, errors, on="ts", by="user_id")
    return out.select("event_id", "err_id", F.round("err_value", 2).alias("err_value"))


def _q_range_join_windows(spark, sf_dir):
    """Clicks falling inside [view, view+30min) windows per user —
    range_join's bin-bucketed equi-join (no BroadcastNestedLoopJoin;
    plan-pinned). Oracle: plain SQL BETWEEN join."""
    from pyspark.sql import functions as F

    from pycypher_nmetl_spark.temporal_joins import range_join

    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    clicks = ev.filter(F.col("event_type") == "click").select(
        "event_id", "ts", "user_id"
    )
    windows = ev.filter(F.col("event_type") == "view").select(
        "user_id",
        F.col("ts").alias("w_start"),
        (F.col("ts") + F.expr("INTERVAL 30 MINUTES")).alias("w_end"),
        F.col("event_id").alias("w_id"),
    )
    out = range_join(clicks, windows, "ts", "w_start", "w_end", by="user_id")
    return out.select("event_id", "w_id")


_EXTRA_QUERIES = {
    "mutation_roundtrip": _q_mutation_roundtrip,
    "merge_on_match": _q_merge_on_match,
    "stream_window_agg": _q_stream_window,
    "stream_session_window": _q_stream_session_window,
    "stream_static_join": _q_stream_static_join,
    "asof_join_latest": _q_asof_join_latest,
    "range_join_windows": _q_range_join_windows,
}

_EXTRA_ORACLE = {
    "merge_on_match": (
        "SELECT n_name AS name, CAST(1 AS BIGINT) AS seen FROM nation "
        "WHERE n_name = 'NATION_3' "
        "UNION ALL SELECT 'NATION_99X' AS name, CAST(0 AS BIGINT) AS seen"
    ),
    "mutation_roundtrip": (
        "SELECT count(*) AS n, round(sum(-c_acctbal), 2) AS total "
        "FROM customer WHERE c_acctbal <= -10.0"
    ),
    "stream_window_agg": (
        "SELECT date_trunc('day', ts)::DATE AS day, event_type AS etype, "
        "count(*) AS cnt, round(sum(value), 2) AS total FROM events GROUP BY 1, 2"
    ),
    # islands-style gap merge: a session breaks when the gap to the
    # previous event is >= 30 min; Spark session end = last event + gap
    "stream_session_window": (
        "WITH t AS ("
        "  SELECT user_id, ts, value,"
        "         CASE WHEN lag(ts) OVER (PARTITION BY user_id ORDER BY ts) IS NULL"
        "              OR ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts)"
        "                 >= INTERVAL 30 MINUTE"
        "              THEN 1 ELSE 0 END AS brk"
        "  FROM events), "
        "s AS (SELECT *, sum(brk) OVER (PARTITION BY user_id ORDER BY ts"
        "      ROWS UNBOUNDED PRECEDING) AS sid FROM t) "
        "SELECT min(ts) AS session_start, max(ts) + INTERVAL 30 MINUTE AS session_end,"
        "       user_id AS uid, count(*) AS cnt, round(sum(value), 2) AS total "
        "FROM s GROUP BY user_id, sid"
    ),
    "stream_static_join": (
        "SELECT c.c_mktsegment AS seg, count(*) AS cnt,"
        "       round(sum(e.value), 2) AS total "
        "FROM events e JOIN customer c ON e.user_id = c.c_custkey "
        "GROUP BY 1"
    ),
    "asof_join_latest": (
        "WITH clicks AS (SELECT event_id, ts, user_id FROM events "
        "                WHERE event_type = 'click'), "
        "     errors AS (SELECT ts, user_id, event_id AS err_id, "
        "                       value AS err_value FROM events "
        "                WHERE event_type = 'error') "
        "SELECT c.event_id, e.err_id, round(e.err_value, 2) AS err_value "
        "FROM clicks c ASOF LEFT JOIN errors e "
        "  ON c.user_id = e.user_id AND c.ts >= e.ts"
    ),
    "range_join_windows": (
        "WITH clicks AS (SELECT event_id, ts, user_id FROM events "
        "                WHERE event_type = 'click'), "
        "     win AS (SELECT user_id, ts AS w_start, "
        "                    ts + INTERVAL 30 MINUTE AS w_end, "
        "                    event_id AS w_id FROM events "
        "             WHERE event_type = 'view') "
        "SELECT c.event_id, w.w_id FROM clicks c JOIN win w "
        "  ON c.user_id = w.user_id AND c.ts BETWEEN w.w_start AND w.w_end"
    ),
}


# The driver records at most 50 gates in queries() iteration order
# (round 5 silently dropped entries 51-56), so the total is kept at
# exactly 50 and the gates with unique coverage — mutations, streaming,
# multimodal — are pinned near the front as insurance against any
# tighter future cap.
_GATE_PRIORITY = [
    "simple_scan",
    "filtered_scan",
    "order_limit",
    "single_hop",
    "two_hop_filter",
    "agg_pricing_summary",
    "varlength_path",
    "shortest_path",
    "optional_hop_count",
    "mutation_roundtrip",
    "merge_on_match",
    "stream_window_agg",
    "stream_session_window",
    "stream_static_join",
    "llm_multimodal",
]


def _ordered(full: dict) -> dict:
    out = {k: full[k] for k in _GATE_PRIORITY if k in full}
    out.update({k: v for k, v in full.items() if k not in out})
    return out


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    out: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
    for name, q in _CYPHER_QUERIES.items():
        out[name] = _cypher(q, _PARAMS.get(name))
    out.update(_LLMOPS_QUERIES)
    out.update(_EXTRA_QUERIES)
    if len(out) > 50:  # not assert: -O would strip it silently
        raise RuntimeError(f"driver records only 50 gates; got {len(out)}")
    return _ordered(out)


def oracle_sql() -> dict[str, str]:
    return _ordered({**_ORACLE, **_LLMOPS_ORACLE, **_EXTRA_ORACLE})
