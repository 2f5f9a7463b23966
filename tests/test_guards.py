"""Safety rails: cross-join ceiling + per-query deadline (guards.py).

Reference parity: config.py MAX_CROSS_JOIN_ROWS and timeout_handler.py.
"""

from __future__ import annotations

import pytest

from pycypher_nmetl_spark import CypherEngine, GraphCatalog
from pycypher_nmetl_spark.guards import CrossJoinGuardError, QueryTimeout


@pytest.fixture(scope="module")
def tpch(spark):
    return GraphCatalog.from_tpch(spark, "/root/testdata/sf0.01")


def test_runaway_cartesian_refused_at_compile_time(tpch):
    eng = CypherEngine(tpch, max_cross_join_product_bytes=1e6)
    with pytest.raises(CrossJoinGuardError, match="cartesian"):
        eng.execute("MATCH (a:Customer), (b:Order) RETURN count(*) AS c")


def test_small_cartesian_allowed_under_default_ceiling(tpch):
    eng = CypherEngine(tpch)
    assert eng.execute(
        "MATCH (a:Nation), (b:Region) RETURN count(*) AS c"
    ).collect()[0]["c"] == 125


def test_ceiling_disabled_with_none(tpch):
    eng = CypherEngine(tpch, max_cross_join_product_bytes=None)
    # compiles without the guard firing (do not collect the cartesian)
    df = eng.execute("MATCH (a:Customer), (b:Order) RETURN count(*) AS c")
    assert df.columns == ["c"]


def test_slow_query_cancelled_at_deadline(tpch):
    eng = CypherEngine(tpch, max_cross_join_product_bytes=None)
    with pytest.raises(QueryTimeout, match="deadline"):
        eng.run(
            "MATCH (a:Customer), (b:Order), (c:Part) RETURN count(*) AS c",
            timeout_s=2,
        )


def test_fast_query_unaffected_by_deadline(tpch):
    eng = CypherEngine(tpch, query_timeout_s=120)
    rows = eng.run("MATCH (n:Nation) RETURN count(*) AS c")
    assert rows[0]["c"] == 25


def test_rate_limiter_token_bucket_deterministic():
    from pycypher_nmetl_spark.guards import RateLimiter, RateLimitExceeded

    now = [0.0]
    slept = []
    rl = RateLimiter(rate=2.0, burst=2, clock=lambda: now[0],
                     sleep=lambda s: (slept.append(s), now.__setitem__(0, now[0] + s)))
    rl.acquire()
    rl.acquire()  # burst exhausted
    with pytest.raises(RateLimitExceeded, match="rate limit"):
        rl.acquire()
    now[0] += 0.5  # one token refilled (2/s)
    rl.acquire()
    # blocking path: waits for the refill instead of raising
    rl.acquire(wait_s=1.0)
    assert slept and slept[-1] <= 0.5


def test_engine_rate_limit_rejects_burst(tpch):
    from pycypher_nmetl_spark.guards import RateLimitExceeded

    eng = CypherEngine(tpch, cache_results=False, rate_limit_qps=1.0)
    eng.execute("MATCH (n:Region) RETURN count(*) AS c")
    with pytest.raises(RateLimitExceeded):
        eng.execute("MATCH (n:Nation) RETURN count(*) AS c")


def test_audit_log_records_and_metrics(tpch, caplog):
    import json
    import logging

    from pycypher_nmetl_spark import audit

    audit.enable_audit_log(handler=logging.NullHandler())
    try:
        eng = CypherEngine(tpch, cache_results=False)
        with caplog.at_level(logging.INFO, logger="pycypher_nmetl_spark.audit"):
            eng.run("MATCH (n:Region) RETURN count(*) AS c", {"p": "secret"})
            with pytest.raises(Exception):
                # unknown function fails at compile (unknown LABELS now
                # conformantly match zero rows — round-9 TCK fix)
                eng.execute("RETURN nosuchfunction(1) AS x")
        records = [json.loads(r.message) for r in caplog.records]
        events = {(r["event"], r["status"]) for r in records}
        assert ("compile", "ok") in events and ("run", "ok") in events
        assert ("compile", "error") in events
        run_rec = next(r for r in records if r["event"] == "run")
        assert run_rec["rows"] == 1
        # parameter VALUES are never logged
        assert run_rec.get("parameter_keys") == ["p"]
        assert "secret" not in caplog.text
        assert eng.metrics.counters["queries_failed"] == 1
        assert eng.metrics.counters["queries_compiled"] >= 1
    finally:
        audit.disable_audit_log()


# --------------------------------------------------------------------- #
# round-4: pre-execution complexity ceiling (reference query_complexity.py)
# --------------------------------------------------------------------- #
def test_complexity_rejects_pathological_cross_join(spark):
    from pycypher_nmetl_spark import CypherEngine, GraphCatalog
    from pycypher_nmetl_spark.guards import QueryComplexityError

    cat = GraphCatalog(spark)
    # coalesce(1): a chained cartesian multiplies PARTITION counts
    # (32^5 tasks would hang the unguarded control query below — the
    # very pathology the ceiling exists to refuse)
    cat.register_nodes(
        "X",
        spark.createDataFrame([(1, "a")], "id long, v string").coalesce(1),
        row_estimate=100_000,
    )
    eng = CypherEngine(cat)
    with pytest.raises(QueryComplexityError, match="max_complexity"):
        # 100k^5 = 1e25 estimated rows — refused before any job starts
        eng.execute(
            "MATCH (a:X) MATCH (b:X) MATCH (c:X) MATCH (d:X) MATCH (e:X) "
            "RETURN count(*) AS c"
        )
    # a sane query on the same engine still runs
    assert eng.execute("MATCH (a:X) RETURN count(*) AS c").collect()[0][0] == 1
    # ceiling is configurable / removable
    eng2 = CypherEngine(cat, max_complexity=None)
    assert (
        eng2.execute(
            "MATCH (a:X) MATCH (b:X) MATCH (c:X) MATCH (d:X) MATCH (e:X) "
            "RETURN count(*) AS c"
        ).collect()[0][0]
        == 1
    )


def test_complexity_estimator_shapes(spark):
    from pycypher_nmetl_spark import CypherEngine, GraphCatalog
    from pycypher_nmetl_spark.cypher.parser import parse
    from pycypher_nmetl_spark.guards import estimate_query_complexity

    cat = GraphCatalog(spark)
    cat.register_nodes(
        "P", spark.createDataFrame([(1,)], "id long"), row_estimate=1000
    )
    cat.register_edges(
        "E",
        spark.createDataFrame([(1, 1, 1)], "id long, src long, dst long"),
        src_label="P", dst_label="P",
    )
    cat._meta[("e", "E")].row_estimate = 5000  # degree 5
    CypherEngine(cat)
    scan = estimate_query_complexity(cat, parse("MATCH (a:P) RETURN a.id AS i"))
    hop = estimate_query_complexity(
        cat, parse("MATCH (a:P)-[:E]->(b:P) RETURN a.id AS i")
    )
    var8 = estimate_query_complexity(
        cat, parse("MATCH (a:P)-[:E*1..8]->(b:P) RETURN a.id AS i")
    )
    closure = estimate_query_complexity(
        cat, parse("MATCH (a:P)-[:E]->(b:P)-[:E]->(a) RETURN a.id AS i")
    )
    assert scan == 1000
    assert hop == pytest.approx(5000)        # 1000 * degree 5
    assert var8 == pytest.approx(1000 * 5**8)
    assert closure == pytest.approx(25)      # two hops / closure filter


def test_shortest_path_estimate_linear_not_exponential(spark):
    """Round-5 ADVICE fix: shortestPath executes as frontier BFS
    (cost ~ edges x hops), so the estimator must not apply the
    degree**hops full-enumeration term — deep shortestPath on
    high-degree graphs was falsely refused."""
    import pytest as _pt

    from pycypher_nmetl_spark import CypherEngine, GraphCatalog
    from pycypher_nmetl_spark.cypher.parser import parse
    from pycypher_nmetl_spark.guards import estimate_query_complexity

    cat = GraphCatalog(spark)
    cat.register_nodes(
        "P", spark.createDataFrame([(1,)], "id long"), row_estimate=1000
    )
    cat.register_edges(
        "E",
        spark.createDataFrame([(1, 1, 1)], "id long, src long, dst long"),
        src_label="P", dst_label="P",
    )
    cat._meta[("e", "E")].row_estimate = 5000  # degree 5
    CypherEngine(cat)
    sp = estimate_query_complexity(
        cat,
        parse("MATCH p = shortestPath((a:P)-[:E*1..8]->(b:P)) RETURN length(p) AS l"),
    )
    enum = estimate_query_complexity(
        cat, parse("MATCH (a:P)-[:E*1..8]->(b:P) RETURN a.id AS i")
    )
    assert sp == _pt.approx(1000 * 5 * 8)  # scan x degree x hops, linear
    assert enum == _pt.approx(1000 * 5**8)
    assert sp < enum / 1e3


def test_row_estimate_invalidated_on_commit(spark, tmp_path):
    """Round-5 ADVICE fix: derived row estimates are epoch-keyed and
    re-derived after a mutation commit; user-pinned ones persist.

    Uses a parquet-backed table: createDataFrame plans are RDD-backed
    in Spark 4 and report the unknown-size sentinel, so only file scans
    yield a derived estimate in the first place."""
    from pycypher_nmetl_spark import CypherEngine, GraphCatalog
    from pycypher_nmetl_spark.guards import _rows_estimate

    p = str(tmp_path / "q.parquet")
    spark.createDataFrame([(i,) for i in range(5)], "id long").write.parquet(p)
    cat = GraphCatalog(spark)
    cat.register_nodes("Q", spark.read.parquet(p))
    cat.register_nodes(
        "Pinned", spark.createDataFrame([(1,)], "id long"), row_estimate=777
    )
    eng = CypherEngine(cat)
    first = _rows_estimate(cat, "n", "Q")
    assert first is not None
    meta = cat._meta[("n", "Q")]
    assert meta.row_estimate_epoch == cat.data_epoch
    # poison the cache, then commit a mutation: the stale value must be
    # re-derived (not returned verbatim) at the new epoch
    meta.row_estimate = 123456
    eng.execute("CREATE (:Q {id: 100})")
    after = _rows_estimate(cat, "n", "Q")
    assert after != 123456
    assert meta.row_estimate_epoch == cat.data_epoch
    # pinned estimates survive commits untouched
    assert _rows_estimate(cat, "n", "Pinned") == 777.0
