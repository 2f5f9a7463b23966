"""Per-query profiler (reference: query_profiler.py; round-7).

engine.profile(cypher) must return per-clause compile wall time, fused
execute time, the result row count, Catalyst's row/size estimates and
the formatted physical plan, plus heuristic recommendations — and the
REPL surfaces it as :profile <query>.
"""

from __future__ import annotations

import pytest


def test_profile_basic_read(golden):
    rep = golden.profile(
        "MATCH (n:Person) WHERE n.age > 26 RETURN n.name AS name ORDER BY name"
    )
    assert rep.row_count == 3  # Alice, Carol, Dave
    assert rep.total_time_ms > 0
    assert rep.parse_time_ms >= 0 and rep.execute_time_ms > 0
    # clause loop instrumented: Match + Projection compile timings
    assert set(rep.clause_timings) == {"Match", "Projection"}
    assert all(ms >= 0 for ms in rep.clause_timings.values())
    assert rep.hotspot in rep.clause_timings
    # physical plan excerpt present and formatted
    assert "== Physical Plan ==" in rep.physical_plan
    # Catalyst size estimate is always defined for a real plan
    assert rep.estimated_bytes is not None and rep.estimated_bytes > 0


def test_profile_report_str_format(golden):
    rep = golden.profile("MATCH (n:Person) RETURN count(*) AS c")
    s = str(rep)
    assert "Query Profile:" in s
    assert "Clause compile breakdown:" in s
    assert "Physical plan:" in s
    assert "execute=" in s


def test_profile_recommends_limit_for_large_results(spark):
    from pycypher_nmetl_spark import CypherEngine, GraphCatalog

    cat = GraphCatalog(spark)
    cat.register_nodes(
        "Row", spark.range(20_000).selectExpr("id", "id AS v")
    )
    eng = CypherEngine(cat)
    rep = eng.profile("MATCH (n:Row) RETURN n.v AS v")
    assert rep.row_count == 20_000
    assert any("LIMIT" in r for r in rep.recommendations)


def test_profile_flags_cartesian_plan(golden):
    rep = golden.profile(
        "MATCH (a:Person), (b:Company) RETURN a.name AS a, b.cname AS b"
    )
    assert rep.row_count == 8  # 4 x 2
    assert any("cartesian" in r.lower() or "nested-loop" in r.lower()
               for r in rep.recommendations)


def test_profile_history_and_summary(golden):
    golden.profile("MATCH (n:Person) RETURN count(*) AS c")
    golden.profile("MATCH (n:Company) RETURN count(*) AS c")
    summary = golden._profiler.metrics_summary()
    assert summary["query_count"] >= 2
    assert summary["clause_timings"].get("Match", 0) > 0
    assert summary["total_ms"] > 0


def test_profile_mutation_query(golden):
    rep = golden.profile("CREATE (:ProfTag {v: 1})")
    # mutation-only queries return an empty frame: no plan, zero rows
    assert rep.row_count == 0
    assert rep.clause_timings.get("Create") is not None


def test_repl_profile_command(monkeypatch, capsys, tmp_path):
    """:profile in the REPL prints a report (CLI-level test)."""
    import pycypher_nmetl_spark.cli as cli

    lines = iter([":profile RETURN 1 AS one", ":quit"])
    monkeypatch.setattr("builtins.input", lambda *_: next(lines))
    assert cli._repl(None) == 0
    out = capsys.readouterr().out
    assert "Query Profile:" in out
    assert "Clause compile breakdown:" in out


def test_profile_cache_hit_does_not_report_stale_clauses(spark):
    """A result-cache hit skips the clause loop; the profile must not
    attribute the PREVIOUS query's clause timings to this query."""
    from pycypher_nmetl_spark import CypherEngine, GraphCatalog
    from pycypher_nmetl_spark.profiler import QueryProfiler

    cat = GraphCatalog(spark)
    cat.register_nodes(
        "P", spark.createDataFrame([(1, 5)], "id long, v long")
    )
    eng = CypherEngine(cat)  # cache on
    prof = QueryProfiler(eng)
    q = "MATCH (p:P) RETURN p.v AS v"
    first = prof.profile(q)
    assert first.clause_timings  # cold run has a clause breakdown
    eng.execute("MATCH (p:P) RETURN count(*) AS c")  # different report
    hit = prof.profile(q)  # cache hit: no clause loop ran
    assert hit.clause_timings == {}
    assert hit.hotspot is None
    assert hit.row_count == 1
