"""Multi-engine coordination scaffolding (reference: cluster.py:1-545 —
ClusterCoordinator / Worker protocol / QueryRouter strategies / health).

What this is on Spark: *intra*-query distribution is Spark's job — one
CypherEngine already fans a single query out to every executor. What
the coordinator adds is the layer ABOVE that: routing queries across N
engine instances — replicas of one catalog for tenant/workload
isolation, or per-tenant graphs — with pluggable routing, per-worker
health counters, and an aggregate cluster view. Like the reference,
this module ships interfaces plus local implementations (workers in
this process, e.g. several engines over one local SparkSession); a
production deployment points each worker at its own Spark cluster or
Spark Connect endpoint, which changes the transport, not this logic.

    coord = ClusterCoordinator(router=LeastLoadedRouter())
    coord.register_worker(LocalWorker("w1", engine1))
    coord.register_worker(LocalWorker("w2", engine2))
    df = coord.execute_query("MATCH (p:Person) RETURN p.name AS name")
    health = coord.cluster_health()
"""

from __future__ import annotations

import threading
import time
from dataclasses import dataclass, field
from enum import Enum
from typing import Any, Protocol, runtime_checkable


class WorkerStatus(Enum):
    ACTIVE = "active"
    DRAINING = "draining"  # finishes in-flight queries, receives no new ones
    UNAVAILABLE = "unavailable"


class WorkerExecutionError(RuntimeError):
    """A query failed on a specific worker (reference: exceptions)."""

    def __init__(self, worker_id: str, query_snippet: str, elapsed_ms: float):
        self.worker_id = worker_id
        self.query_snippet = query_snippet
        self.elapsed_ms = elapsed_ms
        super().__init__(
            f"query failed on worker {worker_id!r} after {elapsed_ms:.1f}ms: "
            f"{query_snippet}"
        )


@dataclass(frozen=True)
class WorkerHealth:
    worker_id: str
    status: WorkerStatus
    queries_executed: int
    errors: int
    avg_latency_ms: float
    last_heartbeat: float
    active_queries: int


@dataclass(frozen=True)
class ClusterHealth:
    total_workers: int
    active_workers: int
    unavailable_workers: int
    total_queries: int
    total_errors: int
    cluster_error_rate: float
    avg_latency_ms: float
    worker_health: list[WorkerHealth]


@runtime_checkable
class Worker(Protocol):
    @property
    def worker_id(self) -> str: ...

    @property
    def status(self) -> WorkerStatus: ...

    def execute_query(self, query: str, *, parameters: dict[str, Any] | None = None): ...

    def health_check(self) -> WorkerHealth: ...


class LocalWorker:
    """One engine instance in this process (reference: LocalWorker
    wrapping a Star; here wrapping a CypherEngine). Thread-safe counters;
    the engine itself serializes writes on its catalog lock."""

    def __init__(self, worker_id: str, engine: Any):
        self._worker_id = worker_id
        self._engine = engine
        self._status = WorkerStatus.ACTIVE
        self._lock = threading.Lock()
        self._queries_executed = 0
        self._errors = 0
        self._total_latency_ms = 0.0
        self._active_queries = 0
        self._last_heartbeat = time.monotonic()

    @property
    def worker_id(self) -> str:
        return self._worker_id

    @property
    def status(self) -> WorkerStatus:
        return self._status

    @status.setter
    def status(self, value: WorkerStatus) -> None:
        self._status = value

    @property
    def engine(self) -> Any:
        return self._engine

    def execute_query(self, query: str, *, parameters: dict[str, Any] | None = None):
        with self._lock:
            self._active_queries += 1
        t0 = time.perf_counter()
        try:
            # run() collects under the engine's deadline/rate guards; the
            # routed surface returns rows because load accounting needs
            # the query to have actually executed on THIS worker (a lazy
            # DataFrame would bill the work to whoever collects later)
            rows = self._engine.run(query, parameters)
            elapsed_ms = (time.perf_counter() - t0) * 1000.0
            with self._lock:
                self._queries_executed += 1
                self._total_latency_ms += elapsed_ms
                self._last_heartbeat = time.monotonic()
            return rows
        except Exception as exc:
            elapsed_ms = (time.perf_counter() - t0) * 1000.0
            with self._lock:
                self._errors += 1
            raise WorkerExecutionError(
                worker_id=self._worker_id,
                query_snippet=query[:80],
                elapsed_ms=elapsed_ms,
            ) from exc
        finally:
            with self._lock:
                self._active_queries -= 1

    def health_check(self) -> WorkerHealth:
        with self._lock:
            total = self._queries_executed
            return WorkerHealth(
                worker_id=self._worker_id,
                status=self._status,
                queries_executed=total,
                errors=self._errors,
                avg_latency_ms=self._total_latency_ms / total if total else 0.0,
                last_heartbeat=self._last_heartbeat,
                active_queries=self._active_queries,
            )


# --------------------------------------------------------------------- #
# routing strategies (reference: QueryRouter protocol + implementations)
# --------------------------------------------------------------------- #
@runtime_checkable
class QueryRouter(Protocol):
    def select_worker(self, workers: list[Worker], query: str) -> Worker: ...


class RoundRobinRouter:
    def __init__(self) -> None:
        self._next = 0
        self._lock = threading.Lock()

    def select_worker(self, workers: list[Worker], query: str) -> Worker:
        if not workers:
            raise RuntimeError("no active workers registered")
        with self._lock:
            worker = workers[self._next % len(workers)]
            self._next += 1
        return worker


class LeastLoadedRouter:
    """Fewest in-flight queries wins; ties break by worker id for
    determinism."""

    def select_worker(self, workers: list[Worker], query: str) -> Worker:
        if not workers:
            raise RuntimeError("no active workers registered")
        return min(
            workers,
            key=lambda w: (w.health_check().active_queries, w.worker_id),
        )


class HashRouter:
    """Same query text -> same worker: maximizes each worker's result-
    cache hit rate (the engine caches compiled plans per query string)."""

    def select_worker(self, workers: list[Worker], query: str) -> Worker:
        if not workers:
            raise RuntimeError("no active workers registered")
        import hashlib

        h = int.from_bytes(
            hashlib.sha256(query.encode("utf-8")).digest()[:8], "big"
        )
        return sorted(workers, key=lambda w: w.worker_id)[h % len(workers)]


# --------------------------------------------------------------------- #
# coordinator
# --------------------------------------------------------------------- #
@dataclass
class ClusterCoordinator:
    """Registers workers, routes queries, aggregates health
    (reference: cluster.py ClusterCoordinator; same no-failover
    semantics — a WorkerExecutionError propagates with worker context,
    retry policy belongs to the caller)."""

    router: QueryRouter = field(default_factory=RoundRobinRouter)

    def __post_init__(self) -> None:
        self._workers: dict[str, Worker] = {}
        self._lock = threading.Lock()

    def register_worker(self, worker: Worker) -> None:
        with self._lock:
            if worker.worker_id in self._workers:
                raise ValueError(f"worker {worker.worker_id!r} already registered")
            self._workers[worker.worker_id] = worker

    def deregister_worker(self, worker_id: str) -> None:
        with self._lock:
            self._workers.pop(worker_id, None)

    def _active_workers(self) -> list[Worker]:
        return [
            w for w in self._workers.values()
            if w.status is WorkerStatus.ACTIVE
        ]

    def execute_query(self, query: str, *, parameters: dict[str, Any] | None = None):
        with self._lock:
            active = self._active_workers()
        worker = self.router.select_worker(active, query)
        return worker.execute_query(query, parameters=parameters)

    def cluster_health(self) -> ClusterHealth:
        with self._lock:
            workers = list(self._workers.values())
        healths = [w.health_check() for w in workers]
        total_queries = sum(h.queries_executed for h in healths)
        total_errors = sum(h.errors for h in healths)
        total_ops = total_queries + total_errors
        weighted = sum(h.avg_latency_ms * h.queries_executed for h in healths)
        return ClusterHealth(
            total_workers=len(healths),
            active_workers=sum(
                1 for h in healths if h.status is WorkerStatus.ACTIVE
            ),
            unavailable_workers=sum(
                1 for h in healths if h.status is WorkerStatus.UNAVAILABLE
            ),
            total_queries=total_queries,
            total_errors=total_errors,
            cluster_error_rate=total_errors / total_ops if total_ops else 0.0,
            avg_latency_ms=weighted / total_queries if total_queries else 0.0,
            worker_health=healths,
        )

    @property
    def worker_count(self) -> int:
        with self._lock:
            return len(self._workers)
