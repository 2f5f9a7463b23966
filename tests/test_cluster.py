"""Multi-engine coordinator (reference: cluster.py ClusterCoordinator /
LocalWorker / routers / health — local implementations, same semantics:
routing + health aggregation, errors carry worker context, no implicit
failover)."""

from __future__ import annotations

import pytest

from pycypher_nmetl_spark.cluster import (
    ClusterCoordinator, HashRouter, LeastLoadedRouter, LocalWorker,
    RoundRobinRouter, WorkerExecutionError, WorkerStatus,
)


@pytest.fixture()
def coord(spark):
    """Two replica engines over the same tables, one coordinator."""
    from pycypher_nmetl_spark import CypherEngine, GraphCatalog

    def mk_engine():
        cat = GraphCatalog(spark)
        cat.register_nodes(
            "P",
            spark.createDataFrame([(1, "a"), (2, "b")], "id long, name string"),
        )
        return CypherEngine(cat)

    c = ClusterCoordinator()
    c.register_worker(LocalWorker("w1", mk_engine()))
    c.register_worker(LocalWorker("w2", mk_engine()))
    return c


def test_round_robin_rotates_and_counts(coord):
    q = "MATCH (p:P) RETURN count(*) AS c"
    for _ in range(4):
        rows = coord.execute_query(q)
        assert rows[0]["c"] == 2
    health = coord.cluster_health()
    assert health.total_queries == 4 and health.total_errors == 0
    per_worker = {h.worker_id: h.queries_executed for h in health.worker_health}
    assert per_worker == {"w1": 2, "w2": 2}
    assert health.avg_latency_ms > 0


def test_draining_worker_receives_no_queries(coord):
    w1 = coord._workers["w1"]
    w1.status = WorkerStatus.DRAINING
    for _ in range(3):
        coord.execute_query("MATCH (p:P) RETURN p.name AS n")
    health = coord.cluster_health()
    per_worker = {h.worker_id: h.queries_executed for h in health.worker_health}
    assert per_worker["w1"] == 0 and per_worker["w2"] == 3


def test_error_carries_worker_context(coord):
    # unknown procedures still raise at execution (unknown LABELS now
    # conformantly match zero rows — TCK round-9 fix — so they no
    # longer exercise the error path)
    with pytest.raises(WorkerExecutionError) as e:
        coord.execute_query("CALL no.such.proc() YIELD x RETURN x")
    assert e.value.worker_id in ("w1", "w2")
    health = coord.cluster_health()
    assert health.total_errors == 1
    assert 0 < health.cluster_error_rate < 1 or health.total_queries == 0


def test_hash_router_is_sticky(coord):
    coord.router = HashRouter()
    q = "MATCH (p:P) RETURN p.name AS n ORDER BY n"
    for _ in range(3):
        coord.execute_query(q)
    per_worker = {
        h.worker_id: h.queries_executed
        for h in coord.cluster_health().worker_health
    }
    assert sorted(per_worker.values()) == [0, 3]  # all on one worker


def test_least_loaded_router_prefers_idle(coord):
    coord.router = LeastLoadedRouter()
    # equal load -> deterministic tie-break on worker id
    w = coord.router.select_worker(coord._active_workers(), "q")
    assert w.worker_id == "w1"


def test_register_duplicate_and_no_workers():
    c = ClusterCoordinator()
    with pytest.raises(RuntimeError, match="no active workers"):
        c.execute_query("RETURN 1")
    class Dummy:
        worker_id = "d"
        status = WorkerStatus.ACTIVE
    c.register_worker(Dummy())
    with pytest.raises(ValueError, match="already registered"):
        c.register_worker(Dummy())
    c.deregister_worker("d")
    assert c.worker_count == 0
