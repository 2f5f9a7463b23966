"""Regression tests for the round-1 ADVICE findings.

1. MERGE of a relationship between pre-bound nodes must create the edge
   when it is missing (probe on a pattern-introduced variable).
2. Mutations on an unlabeled variable must not write through to other
   labels' entities that share the id value (per-label id spaces).
3. DELETE (without DETACH) of a node that still has relationships must
   raise (openCypher; reference mutation engine enforces it).
4. shortestPath with a lower bound > 1 must return the shortest
   *qualifying* path even when a shorter path exists.
5. A UNION query's mutations are atomic: a failing branch rolls back
   earlier branches.
"""

from __future__ import annotations

import pytest


# --------------------------------------------------------------------- #
# 1. MERGE relationship between pre-bound nodes
# --------------------------------------------------------------------- #
def test_merge_creates_missing_relationship(golden, run):
    golden.execute(
        "MATCH (a:Person {name:'Carol'}), (b:Person {name:'Dave'}) "
        "MERGE (a)-[r:KNOWS]->(b) ON CREATE SET r.since = 2031"
    )
    assert run(
        "MATCH (:Person {name:'Carol'})-[r:KNOWS]->(b:Person) "
        "RETURN b.name AS n, r.since AS s"
    ) == [("Dave", 2031)]


def test_merge_relationship_is_idempotent_when_missing_then_present(golden, run):
    q = (
        "MATCH (a:Person {name:'Carol'}), (b:Person {name:'Dave'}) "
        "MERGE (a)-[r:KNOWS]->(b) ON CREATE SET r.since = 2031"
    )
    golden.execute(q)
    golden.execute(q)  # second run must match, not duplicate
    assert run(
        "MATCH (:Person {name:'Carol'})-[r:KNOWS]->(:Person {name:'Dave'}) "
        "RETURN count(*) AS c"
    ) == [(1,)]


# --------------------------------------------------------------------- #
# 2. per-label id spaces: no cross-label write-through
# --------------------------------------------------------------------- #
def test_unlabeled_set_does_not_corrupt_same_id_other_label(golden, run):
    # City id 1 collides with Person id 1 (Alice)
    golden.execute("CREATE (:City {id: 1, name: 'Metropolis'})")
    golden.execute("MATCH (n) WHERE n.name = 'Alice' SET n.flag = 1")
    assert run("MATCH (p:Person {name:'Alice'}) RETURN p.flag AS f") == [(1,)]
    # the same-id City row must be untouched
    assert run("MATCH (c:City) RETURN c.flag AS f") == [(None,)]


def test_unlabeled_delete_only_removes_matching_label(golden, run):
    golden.execute("CREATE (:City {id: 4, name: 'Gotham'})")
    # Dave (Person id 4) has no relationships; City 4 shares the id
    golden.execute("MATCH (n) WHERE n.name = 'Dave' DELETE n")
    assert run("MATCH (p:Person) RETURN count(*) AS c") == [(3,)]
    assert run("MATCH (c:City) RETURN c.name AS n") == [("Gotham",)]


def test_foreach_over_collected_nodes_updates_only_their_label(golden, run):
    golden.execute("CREATE (:City {id: 2, name: 'Springfield'})")
    golden.execute(
        "MATCH (p:Person) WITH collect(p) AS ps "
        "FOREACH (x IN ps | SET x.tag = 7)"
    )
    assert run(
        "MATCH (p:Person) WHERE p.tag = 7 RETURN count(*) AS c"
    ) == [(4,)]
    assert run("MATCH (c:City) RETURN c.tag AS t") == [(None,)]


def test_foreach_over_unlabeled_collect_raises_when_ambiguous(golden, run):
    # round-4: collect over an UNLABELED scan yields bare ids with no
    # label info; with >1 node label in the catalog a mutation through
    # them cannot be resolved to one table — must refuse, not corrupt
    golden.execute("CREATE (:City {id: 1, name: 'Metropolis'})")
    with pytest.raises(ValueError, match="only unique per table"):
        golden.execute(
            "MATCH (n) WHERE n.name = 'Alice' WITH collect(n) AS ns "
            "FOREACH (x IN ns | SET x.tag = 9)"
        )
    # transaction rolled back: neither table gained a tag column value
    assert run("MATCH (p:Person {name:'Alice'}) RETURN p.tag AS t") == [(None,)]
    assert run("MATCH (c:City) RETURN c.tag AS t") == [(None,)]


def test_foreach_over_unlabeled_collect_ok_with_single_label(spark):
    # a one-label catalog has no ambiguity: bare ids resolve uniquely
    from pycypher_nmetl_spark import CypherEngine, GraphCatalog

    cat = GraphCatalog(spark)
    cat.register_nodes(
        "Only", spark.createDataFrame([(1, "a"), (2, "b")], "id long, v string")
    )
    eng = CypherEngine(cat)
    eng.execute("MATCH (n) WITH collect(n) AS ns FOREACH (x IN ns | SET x.tag = 1)")
    got = eng.execute("MATCH (n:Only) WHERE n.tag = 1 RETURN count(*) AS c")
    assert got.collect()[0][0] == 2


# --------------------------------------------------------------------- #
# 3. DELETE of a connected node must raise without DETACH
# --------------------------------------------------------------------- #
def test_delete_connected_node_raises(golden, run):
    with pytest.raises(ValueError, match="DETACH"):
        golden.execute("MATCH (n:Person {name:'Alice'}) DELETE n")
    # nothing was deleted (transaction rolled back)
    assert run("MATCH (p:Person) RETURN count(*) AS c") == [(4,)]


def test_detach_delete_connected_node_ok(golden, run):
    golden.execute("MATCH (n:Person {name:'Alice'}) DETACH DELETE n")
    assert run("MATCH (p:Person) RETURN count(*) AS c") == [(3,)]
    assert run(
        "MATCH (:Person)-[r:KNOWS]->(:Person) RETURN count(*) AS c"
    ) == [(1,)]


# --------------------------------------------------------------------- #
# 4. shortestPath lower bound > 1
# --------------------------------------------------------------------- #
def test_shortest_path_with_min_hops_beyond_direct_edge(golden, run):
    # Alice-KNOWS->Carol directly (1 hop) AND Alice->Bob->Carol (2 hops):
    # with a 2.. lower bound the 2-hop path must be found, not pruned
    assert run(
        "MATCH p = shortestPath((a:Person {name:'Alice'})-[:KNOWS*2..3]->"
        "(b:Person {name:'Carol'})) RETURN length(p) AS l"
    ) == [(2,)]


def test_var_length_lower_bound_unaffected(golden, run):
    # plain var-length (non-shortest) already enumerated; sanity-check
    assert run(
        "MATCH (a:Person {name:'Alice'})-[:KNOWS*2..2]->(b:Person) "
        "RETURN b.name AS n"
    ) == [("Carol",)]


# --------------------------------------------------------------------- #
# 5. UNION mutation atomicity
# --------------------------------------------------------------------- #
def test_union_mutations_roll_back_together(golden):
    # round-9: the failing branch is an unknown FUNCTION — an unknown
    # label now legally matches zero rows (openCypher, TCK
    # unknown-label-returns-empty) instead of raising
    with pytest.raises(Exception):
        golden.execute(
            "CREATE (:Tmp {x: 1}) RETURN 1 AS v "
            "UNION MATCH (n:Person) RETURN noSuchFn(n.age) AS v"
        )
    # branch 1's CREATE must not have been committed
    assert not golden.catalog.has_label("Tmp")


def test_union_mutations_commit_together(golden, run):
    golden.execute(
        "CREATE (:Tmp {x: 1}) RETURN 1 AS v "
        "UNION ALL CREATE (:Tmp {x: 2}) RETURN 2 AS v"
    )
    assert run("MATCH (t:Tmp) RETURN count(*) AS c") == [(2,)]


# --------------------------------------------------------------------- #
# round-3 ADVICE: DELETE order-independence (end-of-clause semantics)
# --------------------------------------------------------------------- #
def test_delete_node_and_rel_any_order(golden, run):
    # `DELETE n, r` (node listed first) must succeed when r covers n's
    # relationships — Neo4j applies deletions at end of clause.
    golden.execute(
        "MATCH (n:Person {name:'Bob'})-[r]-() DELETE n, r"
    )
    assert run("MATCH (p:Person) RETURN count(*) AS c") == [(3,)]
    assert run("MATCH (:Person)-[r:KNOWS]->(:Person) RETURN count(*) AS c") == [(1,)]


def test_delete_rel_then_node_still_works(golden, run):
    golden.execute("MATCH (n:Person {name:'Bob'})-[r]-() DELETE r, n")
    assert run("MATCH (p:Person) RETURN count(*) AS c") == [(3,)]


def test_delete_node_with_uncovered_rels_still_raises(golden):
    # deleting only one of Bob's relationship vars must still raise
    with pytest.raises(ValueError, match="DETACH"):
        golden.execute(
            "MATCH (n:Person {name:'Alice'})-[r:KNOWS]->() DELETE n, r"
        )  # Alice also has WORKS_AT edges not covered by r


# --------------------------------------------------------------------- #
# round-3/4 ADVICE: incompatible array/array comparison follows Neo4j's
# lexicographic ternary semantics — size mismatch decides equality as
# false; touching an incomparable element pair yields null; only empty
# prefixes decide orderings.
# --------------------------------------------------------------------- #
def test_array_vs_incompatible_array_size_mismatch_is_false(golden, run):
    golden.execute("CREATE (:Box {id: 1, nums: [1, 2, 3]})")
    assert run(
        "MATCH (b:Box) RETURN b.nums = ['a', 'b'] AS eq"
    ) == [(False,)]


def test_array_vs_incompatible_array_same_size_is_null(golden, run):
    golden.execute("CREATE (:Box {id: 1, nums: [1, 2, 3]})")
    assert run(
        "MATCH (b:Box) RETURN b.nums = ['a', 'b', 'c'] AS eq"
    ) == [(None,)]


def test_array_vs_incompatible_array_neq_and_order(golden, run):
    golden.execute("CREATE (:Box {id: 1, nums: [1, 2, 3]})")
    assert run(
        "MATCH (b:Box) RETURN b.nums <> ['a', 'b'] AS ne, "
        "b.nums < ['a'] AS lt, b.nums >= ['a'] AS ge"
    ) == [(True, None, None)]


def test_array_vs_compatible_numeric_array_coerces(golden, run):
    # int vs float element kinds statically coerce -> native comparison,
    # no analyzer probe, correct value semantics
    golden.execute("CREATE (:Box {id: 1, nums: [1, 2, 3]})")
    assert run(
        "MATCH (b:Box) RETURN b.nums = [1.0, 2.0, 3.0] AS eq"
    ) == [(True,)]


def test_array_vs_compatible_array_literal_compares(golden, run):
    golden.execute("CREATE (:Box {id: 1, nums: [1, 2, 3]})")
    assert run("MATCH (b:Box) RETURN b.nums = [1, 2, 3] AS eq") == [(True,)]


# --------------------------------------------------------------------- #
# round-4: cross-type scalar comparison follows Neo4j / the reference's
# pandas evaluator — '1' = 1 is false (never Spark's implicit cast),
# orderings across value types are null, null still propagates
# --------------------------------------------------------------------- #
def test_cross_type_scalar_equality_is_false(golden, run):
    assert run(
        "MATCH (p:Person {name:'Alice'}) "
        "RETURN '1' = 1 AS a, 1 = '1' AS b, true = 1 AS c, "
        "p.name = 30 AS d, p.age = '30' AS e"
    ) == [(False, False, False, False, False)]


def test_cross_type_scalar_inequality_and_order(golden, run):
    assert run(
        "MATCH (p:Person {name:'Alice'}) "
        "RETURN '1' <> 1 AS ne, '1' < 1 AS lt, p.age >= 'x' AS ge"
    ) == [(True, None, None)]


def test_cross_type_null_still_propagates(golden, run):
    # Dave's salary is null: null vs string -> null, not false
    assert run(
        "MATCH (p:Person {name:'Dave'}) RETURN p.salary = 'x' AS eq"
    ) == [(None,)]


def test_in_list_cross_type_semantics(golden, run):
    # IN uses the same cross-type rules as `=`: '1' never equals 1
    assert run(
        "MATCH (p:Person {name:'Alice'}) "
        "RETURN 1 IN ['1'] AS a, '1' IN [1, 2] AS b, 1 IN ['1', 1] AS c, "
        "2 IN ['2', null] AS d, null IN [] AS e, p.age IN ['30'] AS f"
    ) == [(False, False, True, None, False, False)]


def test_in_list_param_item_cross_type(golden):
    """Round-5 ADVICE fix: `$p IN [...]` keeps cross-type rules even
    when the item's static kind isn't tracked — never Spark's implicit
    cast ('1' = 1 must stay false for params too)."""
    def run_p(q, params):
        return [tuple(r) for r in golden.execute(q, params).collect()]

    q = "MATCH (p:Person {name:'Alice'}) RETURN $x IN ['1', '2'] AS a"
    assert run_p(q, {"x": 1}) == [(False,)]
    assert run_p(q, {"x": "1"}) == [(True,)]
    q2 = "MATCH (p:Person {name:'Alice'}) RETURN $x IN [1, 2] AS a"
    assert run_p(q2, {"x": "1"}) == [(False,)]
    assert run_p(q2, {"x": 1}) == [(True,)]
    assert run_p(q2, {"x": 1.0}) == [(True,)]   # int/float coerce


def test_in_list_inside_lambda_cross_type(golden, run):
    """Round-5 ADVICE fix: IN with a literal list inside a lambda
    (list comprehension / quantifier) uses a runtime typeof guard, so
    cross-type elements never match via implicit cast."""
    # (the iterated list itself must be homogeneous — Spark arrays
    # coerce mixed literals at construction; that's a representation
    # limit of list literals, not of IN)
    assert run(
        "RETURN [x IN ['1', '2'] WHERE x IN [1, '2']] AS a"
    ) == [((["2"]),)]
    assert run(
        "RETURN [x IN [1, 2, 3] WHERE x IN [2, '3']] AS a"
    ) == [(([2],))]
    assert run(
        "RETURN any(x IN ['1'] WHERE x IN [1]) AS a"
    ) == [(False,)]
    # null semantics preserved under the runtime guard
    assert run(
        "RETURN [x IN [1, 2] WHERE x IN [9, null]] AS a"
    ) == [(([]),)]


def test_in_list_unknown_schema_kind_probed(spark):
    """Items whose kind comes only from the analyzed plan (not the
    tracked schema) are probed driver-side: cross-type stays false."""
    from pycypher_nmetl_spark import CypherEngine, GraphCatalog

    cat = GraphCatalog(spark)
    cat.register_nodes(
        "T", spark.createDataFrame([(1, "7")], "id long, code string")
    )
    eng = CypherEngine(cat)
    out = [
        tuple(r)
        for r in eng.execute(
            "MATCH (t:T) RETURN t.code IN [7] AS a, t.code IN ['7'] AS b, "
            "(t.id + 0) IN ['1'] AS c"
        ).collect()
    ]
    assert out == [(False, True, False)]


def test_param_in_list_cross_type(spark):
    """$p IN with a concrete param list follows the same element rules as
    a literal list: '5' never equals integer 5, 2.0 = 2 numerically
    (round-5 fix: previously fell through to array_contains over a
    type-coerced literal array)."""
    from pycypher_nmetl_spark import CypherEngine, GraphCatalog

    cat = GraphCatalog(spark)
    cat.register_nodes(
        "T", spark.createDataFrame([(1, 2), (2, 5), (3, 10)], "id long, v long")
    )
    eng = CypherEngine(cat)
    rows = [
        tuple(r)
        for r in eng.execute(
            "MATCH (t:T) WHERE t.v IN $vals RETURN t.v AS v ORDER BY v",
            {"vals": [1, "5", 10, 2.0]},
        ).collect()
    ]
    assert rows == [(2,), (10,)]
    # all-cross-type list: false for non-null items, and null item -> null
    rows = [
        tuple(r)
        for r in eng.execute(
            "MATCH (t:T) RETURN t.v IN $vals AS hit, t.missing IN $vals AS m "
            "ORDER BY t.v",
            {"vals": ["a", "b"]},
        ).collect()
    ]
    assert rows == [(False, None), (False, None), (False, None)]
    # empty param list is false even for null items (openCypher)
    rows = [
        tuple(r)
        for r in eng.execute(
            "MATCH (t:T) WHERE t.id = 1 RETURN t.missing IN $vals AS e",
            {"vals": []},
        ).collect()
    ]
    assert rows == [(False,)]


# --------------------------------------------------------------------- #
# round-5 ADVICE: nested run(timeout_s=...) must not clear the outer
# deadline marker (depth counter, not a boolean)
# --------------------------------------------------------------------- #
def test_nested_timed_run_keeps_outer_deadline_marker(golden):
    q = "MATCH (p:Person) RETURN count(*) AS c"
    # simulate an outer timed run in progress on this thread
    golden._deadline_active.depth = 1
    try:
        assert golden.run(q, timeout_s=30.0)[0][0] == 4
        # the inner run's finally must restore, not clear, the marker
        assert golden._deadline_active.depth == 1
        # with the outer deadline still active, a cache hit must be
        # re-wrapped (never the stored Dataset, whose job group the
        # outer deadline cannot cancel)
        first = golden.execute(q)
        second = golden.execute(q)
        assert second is not first
    finally:
        golden._deadline_active.depth = 0
    # outside any deadline the stored object is served as-is
    third = golden.execute(q)
    assert golden.execute(q) is third


# --------------------------------------------------------------------- #
# round-5 ADVICE: discarded garbage stats estimates are audited
# --------------------------------------------------------------------- #
def test_cross_join_guard_logs_discarded_estimate(golden, monkeypatch):
    import logging

    from pycypher_nmetl_spark import audit, guards

    monkeypatch.setattr(guards, "plan_size_bytes", lambda df: 1e16)
    records = []

    class _Capture(logging.Handler):
        def emit(self, record):
            records.append(record.getMessage())

    audit.enable_audit_log(_Capture())
    try:
        df = golden.execute("MATCH (p:Person) RETURN p.name AS n")
        # both sides report garbage stats -> guard stands down, no raise
        guards.check_cross_join(df, df, max_product_bytes=1.0)
    finally:
        audit.disable_audit_log()
    assert any("cross_join_guard" in r and "estimate_discarded" in r for r in records)


# --------------------------------------------------------------------- #
# round-5 ADVICE: bench_scaling with only an output path still defaults
# to the 10x replica
# --------------------------------------------------------------------- #
def test_bench_scaling_arg_default():
    import sys
    sys.path.insert(0, "tools")
    from bench_scaling import parse_args

    assert parse_args([]) == ([10], [], "SCALING.json")
    assert parse_args(["SCALING2.json"]) == ([10], [], "SCALING2.json")
    assert parse_args(["10", "30", "gen10"]) == ([10, 30], [10], "SCALING.json")
    assert parse_args(["gen10", "OUT.json"]) == ([], [10], "OUT.json")


# --------------------------------------------------------------------- #
# round-6 ADVICE regressions
# --------------------------------------------------------------------- #
def test_int_div_exact_beyond_double_mantissa(golden, run):
    """9007199254740993 = 2^53 + 1 is not representable as a double; the
    old try_divide round-trip returned 2^53. Integer division must stay
    in 64-bit arithmetic (round-6 ADVICE, compiler/exprs.py _int_div)."""
    assert run("RETURN 9007199254740993 / 1 AS x") == [(9007199254740993,)]
    assert run("RETURN 9007199254740994 / 2 AS x") == [(4503599627370497,)]
    assert run("RETURN -9007199254740993 / 1 AS x") == [(-9007199254740993,)]
    # zero divisor and truncation semantics unchanged
    assert run("RETURN 9007199254740993 / 0 AS x") == [(None,)]
    assert run("RETURN -9007199254740995 / 2 AS x") == [(-4503599627370497,)]


def test_near_dup_band_bits_extreme_thresholds(spark):
    """threshold=1.0 made the band-bits auto-tune divide by log(1.0)=0;
    threshold<=-1 hit log(0). Both must degrade to the clamp bounds
    (round-6 ADVICE, llmops/similarity.py)."""
    from pycypher_nmetl_spark.llmops.similarity import near_dup_pairs

    df = spark.createDataFrame(
        [(1, [1.0, 0.0]), (2, [1.0, 0.0]), (3, [0.0, 1.0])],
        "id long, embedding array<double>",
    )
    out = near_dup_pairs(df, "embedding", threshold=1.0)
    assert {(r.id1, r.id2) for r in out.collect()} == {(1, 2)}
    low = near_dup_pairs(df, "embedding", threshold=-1.0)
    assert len(low.collect()) == 3  # every pair passes cosine >= -1


def test_pack_sequences_flushes_incrementally(spark):
    """pack_sequences must not buffer every closed bin until the end of
    the partition (round-6 ADVICE, llmops/export.py). Verified by
    packing one partition large enough to cross the flush threshold and
    checking the result is still a correct, complete packing."""
    from pycypher_nmetl_spark.llmops.export import pack_sequences

    n = 9000  # > flush_at=4096 closed bins with max_tokens == doc len
    df = spark.range(n).select(
        F_col("id").cast("string").alias("doc_id"),
        F_lit(10).alias("n_tok"),
    ).coalesce(1)
    packed = pack_sequences(df, "doc_id", "n_tok", max_tokens=10).collect()
    assert len(packed) == n  # every doc is a singleton bin
    assert sorted(int(r["doc_ids"][0]) for r in packed) == list(range(n))


def test_queries_gate_cap_is_runtime_error():
    """The 50-gate cap must survive python -O (round-6 ADVICE:
    bare assert is stripped under optimization)."""
    import ast, pathlib

    src = pathlib.Path("__spark_entry__.py").read_text()
    tree = ast.parse(src)
    fn = next(
        n for n in ast.walk(tree)
        if isinstance(n, ast.FunctionDef) and n.name == "queries"
    )
    has_raise = any(isinstance(n, ast.Raise) for n in ast.walk(fn))
    has_assert = any(isinstance(n, ast.Assert) for n in ast.walk(fn))
    assert has_raise and not has_assert


from pyspark.sql.functions import col as F_col, lit as F_lit  # noqa: E402


def test_year_boundary_truncate_collectable(run):
    """Round-7 fuzzer-found red test (VERDICT r7 #1): millennium/century
    truncation of years <= 1000 floors to year 1 (reference x001
    convention, temporal_functions.py:472-482), and the result must
    survive collect(). With TimestampType the internal value
    -62135596800s crashed datetime.fromtimestamp ("year 0 is out of
    range"); datetime()/localdatetime() now compile to TIMESTAMP_NTZ,
    whose fromInternal is epoch+timedelta arithmetic."""
    import datetime as _dt

    out = run(
        "RETURN datetime.truncate('millennium', datetime('0999-06-15T00:00:00')) AS a, "
        "datetime.truncate('century', datetime('0099-12-31T23:59:59')) AS b, "
        "localdatetime.truncate('millennium', localdatetime('1000-01-01T00:00:00')) AS c, "
        "date.truncate('millennium', date('0999-06-15')) AS d"
    )
    y1 = _dt.datetime(1, 1, 1)
    assert out == [(y1, y1, y1, _dt.date(1, 1, 1))]


def test_datetime_compiles_to_ntz(golden):
    """The physical type choice itself: datetime()/localdatetime()/
    truncate results are TIMESTAMP_NTZ, so any year-1-adjacent value in
    any query shape stays collectable and DuckDB's naive TIMESTAMP
    oracle compares exactly."""
    from pyspark.sql import types as T

    df = golden.execute(
        "RETURN datetime('2020-01-01T00:00:00') AS a, "
        "datetime.truncate('hour', datetime('2020-01-01T05:30:00')) AS b, "
        "localdatetime() AS c"
    )
    for f in df.schema.fields:
        assert isinstance(f.dataType, T.TimestampNTZType), f


def test_explicit_id_guard_is_broadcast_semi(golden):
    """VERDICT r7 #2: the explicit-id uniqueness probe must not shuffle
    the label table — it broadcasts the tiny new-id frame and left-semi
    scans `existing` map-side. Assert the physical plan has the
    broadcast semi join and no shuffle exchange / sort-merge join."""
    from pycypher_nmetl_spark.compiler.mutations import _explicit_id_clashes

    cat = golden.catalog
    new_ids = golden.spark.createDataFrame([(999,)], "_new_id long")
    plan = _explicit_id_clashes(cat.nodes("Person"), new_ids)._jdf \
        .queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan and "LeftSemi" in plan, plan
    assert "SortMergeJoin" not in plan, plan
    assert "hashpartitioning" not in plan, plan


# --------------------------------------------------------------------- #
# round-9 ADVICE fixes
# --------------------------------------------------------------------- #
def test_datetime_preserves_explicit_offset(run):
    """Round-8 ADVICE (medium): datetime() on a zone-bearing string must
    be instant-preserving — '2020-01-01T00:00:00+05:00' is the UTC
    instant 2019-12-31T19:00 (reference datetime.fromisoformat keeps
    tzinfo); the plain to_timestamp_ntz path silently dropped the
    offset. Naive strings still parse as wall-clock."""
    import datetime as _dt

    out = run(
        "RETURN datetime('2020-01-01T00:00:00+05:00') AS zoned, "
        "datetime('2020-01-01T00:00:00Z') AS utc, "
        "datetime('2020-06-01T12:00:00-0230') AS west, "
        "datetime('2020-01-01T00:00:00') AS naive, "
        "datetime('2020-01-01') AS date_only"
    )
    assert out == [(
        _dt.datetime(2019, 12, 31, 19, 0),
        _dt.datetime(2020, 1, 1, 0, 0),
        _dt.datetime(2020, 6, 1, 14, 30),
        _dt.datetime(2020, 1, 1, 0, 0),
        _dt.datetime(2020, 1, 1, 0, 0),  # date-only: -01 is NOT an offset
    )]


def test_empty_radix_literals_raise_syntax_error():
    """Round-8 ADVICE (low): '0x' / '0o' with no digits raised a raw
    ValueError from int(); both now raise a positioned syntax error."""
    import pytest as _pytest

    from pycypher_nmetl_spark.cypher.tokenizer import (
        CypherSyntaxError,
        tokenize,
    )

    for bad in ("RETURN 0x", "RETURN 0o", "RETURN 0o8 + 1", "RETURN 0xg"):
        with _pytest.raises(CypherSyntaxError):
            tokenize(bad)
    # valid radix literals keep working
    toks = tokenize("RETURN 0xff + 0o17")
    assert [t.value for t in toks if t.kind == "INT"] == ["255", "15"]


def test_near_dup_rejects_too_many_bands(spark):
    """Round-8 ADVICE (low): shiftleft(1L, band) wraps mod 64, so the
    packed survival bitmask silently aliases bands > 64 — reject loudly."""
    import pytest as _pytest

    from pycypher_nmetl_spark.llmops.similarity import near_dup_pairs

    df = spark.createDataFrame(
        [(1, [1.0, 0.0]), (2, [0.9, 0.1])], "id long, emb array<double>"
    )
    with _pytest.raises(ValueError, match="64 bands"):
        near_dup_pairs(df, "emb", bands=65)
    with _pytest.raises(ValueError, match="band_bits"):
        near_dup_pairs(df, "emb", bands=8, band_bits=31)


def test_undirected_endpoints_stored_orientation(golden):
    """Round-8 ADVICE (low): startNode()/endNode() on (a)-[r]-(b) must
    return the STORED endpoints (openCypher), not pattern-traversal
    order. KNOWS edge 100 is stored 1->2: matching it from either side
    must report startNode=Alice, endNode=Bob."""
    df = golden.execute(
        "MATCH (a:Person)-[r:KNOWS]-(b:Person) WHERE a.name = 'Bob' AND b.name = 'Alice' "
        "RETURN startNode(r).name AS s, endNode(r).name AS e, "
        "startNode(r) AS sid, endNode(r) AS eid"
    )
    assert [tuple(r) for r in df.collect()] == [("Alice", "Bob", 1, 2)]
    # forward traversal unchanged
    df2 = golden.execute(
        "MATCH (a:Person)-[r:KNOWS]-(b:Person) WHERE a.name = 'Alice' AND b.name = 'Bob' "
        "RETURN startNode(r).name AS s, endNode(r).name AS e"
    )
    assert [tuple(r) for r in df2.collect()] == [("Alice", "Bob")]


def test_explicit_id_guard_broadcast_size_gated(golden):
    """Round-8 verdict nit #1: the clash probe must not broadcast a
    pathologically large new-id batch (driver OOM). Assert the hint
    itself (analyzed plan), not the physical join — AQE auto-broadcasts
    tiny frames regardless of the hint."""
    from pycypher_nmetl_spark.compiler.mutations import (
        _BROADCAST_ID_LIMIT, _explicit_id_clashes,
    )

    cat = golden.catalog
    new_ids = golden.spark.createDataFrame([(999,)], "_new_id long")

    def analyzed(n):
        df = _explicit_id_clashes(cat.nodes("Person"), new_ids, n_new=n)
        return df._jdf.queryExecution().analyzed().toString()

    assert "ResolvedHint" in analyzed(_BROADCAST_ID_LIMIT)  # boundary: hinted
    assert "ResolvedHint" not in analyzed(_BROADCAST_ID_LIMIT + 1)  # gated
    assert "ResolvedHint" in analyzed(None)  # unknown size keeps old behavior


def test_shared_scan_benefit_ignores_join_named_columns(golden):
    """Round-8 verdict nit #2: `"Join" in plan.toString()` misclassified
    a scan over a column literally named JoinDate as a join prefix
    (always-share). The tree walk must cost-model such scan-only
    prefixes and still detect real joins."""
    spark = golden.spark
    df = spark.createDataFrame(
        [(1, "2020-01-01")], "id long, JoinDate string"
    ).filter("id > 0")
    assert not golden._plan_has_join(
        df._jdf.queryExecution().optimizedPlan()
    )
    speedup, p_bytes, i_bytes = golden._shared_scan_benefit(df, members=3)
    assert speedup != float("inf")  # cost-modeled, not auto-shared
    assert p_bytes > 0 and i_bytes > 0

    joined = df.join(
        spark.createDataFrame([(1, "x")], "id long, v string"), "id"
    )
    assert golden._plan_has_join(joined._jdf.queryExecution().optimizedPlan())
    assert golden._shared_scan_benefit(joined, members=3)[0] == float("inf")


# --------------------------------------------------------------------- #
# round-10 advice fixes: CALL { } empty-aggregate identities + carry key
# --------------------------------------------------------------------- #
def test_call_subquery_empty_agg_sum_collect(golden):
    """Round-9 advice (medium): a pure-aggregate subquery over ZERO inner
    rows must follow Neo4j's empty-aggregate identities — sum -> 0 and
    collect -> [] (not null), count -> 0, while avg stays null."""
    df = golden.execute(
        "MATCH (n:Person) CALL { WITH n MATCH (n)-[:KNOWS]->(m) "
        "RETURN sum(m.age) AS s, collect(m.name) AS c, "
        "count(m) AS k, avg(m.age) AS a } "
        "RETURN n.name AS name, s, c, k, a"
    )
    got = {r["name"]: (r["s"], sorted(r["c"]), r["k"], r["a"]) for r in df.collect()}
    assert got["Carol"] == (0, [], 0, None)  # no outgoing KNOWS
    assert got["Dave"] == (0, [], 0, None)
    assert got["Alice"] == (60, ["Bob", "Carol"], 2, 30.0)


def test_call_subquery_deterministic_carry_key_no_checkpoint(golden):
    """Round-9 advice (low): the carry key is a deterministic struct of
    the imported columns, so the plan has no localCheckpoint RDD scan and
    no monotonically_increasing_id (checkpoint = non-reliable blocks +
    eager materialization)."""
    df = golden.execute(
        "MATCH (n:Person) CALL { WITH n RETURN n.age * 2 AS d } "
        "RETURN n.name AS name, d"
    )
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "Checkpoint" not in plan
    assert "monotonically" not in plan


def test_call_subquery_duplicate_invoking_rows(golden):
    """Deduping invocation classes on the deterministic key must NOT
    collapse duplicate invoking rows: each duplicate still gets the full
    per-invocation result set."""
    df = golden.execute(
        "UNWIND [25, 25, 30] AS cap CALL { WITH cap MATCH (m:Person) "
        "WHERE m.age <= cap RETURN m.name AS nm } RETURN cap, nm"
    )
    got = sorted((r["cap"], r["nm"]) for r in df.collect())
    assert got == [(25, "Bob"), (25, "Bob"), (30, "Alice"), (30, "Bob"),
                   (30, "Dave")]


def test_call_subquery_map_import_canonical_key(golden):
    """A map-typed import is serialized to a canonical sorted-entries
    array inside the carry key (round-11): correct answers AND no
    localCheckpoint / synthetic-id fallback in the plan."""
    df = golden.execute(
        "MATCH (n:Person) WITH n.name AS name, properties(n) AS p "
        "CALL { WITH p RETURN size(keys(p)) AS k } RETURN name, k"
    )
    got = {r["name"]: r["k"] for r in df.collect()}
    assert set(got) == {"Alice", "Bob", "Carol", "Dave"}
    assert all(v >= 3 for v in got.values())
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "monotonically" not in plan
    assert golden._last_subquery_path == "struct-key"


def test_call_subquery_nondeterministic_outer_frame(golden):
    """Round-10 advice (medium): a rand() column in the OUTER frame made
    the struct carry key mismatch across the two evaluations of the
    re-join (null/wrong subquery results). The compiler must detect the
    non-determinism and take the checkpointed-id path."""
    df = golden.execute(
        "MATCH (n:Person) WITH n, rand() AS lucky "
        "CALL { WITH n MATCH (n)-[:KNOWS]->(m) RETURN count(m) AS k } "
        "RETURN n.name AS name, lucky, k"
    )
    rows = df.collect()
    got = {r["name"]: r["k"] for r in rows}
    # the pure-agg left join must see MATCHING keys: k is the true count,
    # never null / 0-for-everyone
    assert got == {"Alice": 2, "Bob": 1, "Carol": 0, "Dave": 0}
    assert all(r["lucky"] is not None for r in rows)
    assert golden._last_subquery_path == "checkpoint"  # fallback taken


def test_call_subquery_nondeterministic_body_per_row(golden):
    """A non-deterministic BODY evaluates once per invoking row (Neo4j),
    not once per deduped invocation class: duplicate invoking rows get
    independent rand() draws."""
    df = golden.execute(
        "UNWIND [1, 1, 1, 1, 1, 1, 1, 1] AS x "
        "CALL { WITH x RETURN rand() AS r } RETURN x, r"
    )
    vals = [r["r"] for r in df.collect()]
    assert len(vals) == 8
    # 8 independent uniform draws collide with probability ~0
    assert len(set(vals)) > 1


def test_call_subquery_uncorrelated_single_evaluation(golden):
    """An uncorrelated CALL { } is one invocation class — constant key,
    inner frame deduped to a single row — and fans its result out to
    every invoking row."""
    df = golden.execute(
        "MATCH (n:Person) CALL { MATCH (m:Person) RETURN count(m) AS total } "
        "RETURN n.name AS name, total"
    )
    got = sorted((r["name"], r["total"]) for r in df.collect())
    assert got == [("Alice", 4), ("Bob", 4), ("Carol", 4), ("Dave", 4)]
