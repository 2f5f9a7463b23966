"""Error-resilience under sustained error load.

Reference parity: tests/load_testing/test_error_resilience.py — the
system must stay consistent and keep producing correct results through
mixed valid/invalid query streams, repeated unknown-label errors, and
concurrent errors + mutations. Where the reference only guarantees
"count did not drop" for concurrent CREATEs (its execute_query is not
thread-safe for mutations), this engine serializes mutation commits on
the catalog write lock, so the stronger invariant (every CREATE lands)
is asserted.
"""

from __future__ import annotations

import concurrent.futures
import threading

import pytest

from pycypher_nmetl_spark.cypher.tokenizer import CypherSyntaxError

N = 200

BAD_QUERIES = [
    "MATCH (",
    "RETURN ???",
    "MATCH (n:Person WHERE",
    "CREAT (:Person {name: 'x'})",
    "MATCH (n) RETRUN n",
]


@pytest.fixture(scope="module")
def rig(spark):
    from pycypher_nmetl_spark import CypherEngine, GraphCatalog

    cat = GraphCatalog(spark)
    cat.register_nodes(
        "Person",
        spark.createDataFrame(
            [(i, f"Person_{i}", 20 + (i % 60)) for i in range(1, N + 1)],
            "id long, name string, age long",
        ),
    )
    return CypherEngine(cat)


def _count(eng) -> int:
    return eng.execute("MATCH (p:Person) RETURN count(p) AS cnt").collect()[0][
        "cnt"
    ]


def test_alternating_valid_invalid_queries(rig):
    for i in range(25):
        rows = rig.execute(
            f"MATCH (p:Person) WHERE p.age = {20 + i} RETURN p.name AS name"
        ).collect()
        assert all(r["name"].startswith("Person_") for r in rows)
        with pytest.raises(CypherSyntaxError):
            rig.execute("MATCH (broken syntax")
    assert _count(rig) == N


def test_many_syntax_errors_dont_leak_state(rig):
    for _ in range(20):
        for q in BAD_QUERIES:
            with pytest.raises(Exception):
                rig.execute(q)
    assert _count(rig) == N


def test_unknown_label_matches_zero_rows_repeatedly(rig):
    # round-9 TCK conformance: an unknown read label matches zero rows
    # (openCypher semantics) instead of raising; 30 such queries must
    # not perturb valid-label reads
    for _ in range(30):
        assert rig.execute("MATCH (d:Dinosaur) RETURN d.name AS n").collect() == []
    assert _count(rig) == N


def test_error_messages_deterministic(rig):
    unknown, syntax = set(), set()
    for _ in range(25):
        try:
            rig.execute("RETURN nosuchfunction(1) AS x")
        except Exception as e:  # unknown function — any stable error type
            unknown.add(str(e))
        try:
            rig.execute("MATCH (broken")
        except CypherSyntaxError as e:
            syntax.add(str(e))
    assert len(unknown) == 1
    assert len(syntax) == 1


def test_concurrent_mixed_queries(rig):
    errors: list[Exception] = []
    lock = threading.Lock()

    def run_valid(idx: int) -> None:
        try:
            rows = rig.execute(
                f"MATCH (p:Person) WHERE p.age = {20 + (idx % 60)} "
                "RETURN p.name AS name"
            ).collect()
            assert rows, f"age bucket {20 + (idx % 60)} unexpectedly empty"
        except Exception as e:  # noqa: BLE001
            with lock:
                errors.append(e)

    def run_invalid() -> None:
        try:
            rig.execute("MATCH (broken")
        except Exception:  # noqa: BLE001,S110
            pass  # expected

    with concurrent.futures.ThreadPoolExecutor(max_workers=4) as pool:
        futures = []
        for i in range(12):
            futures.append(pool.submit(run_valid, i))
            futures.append(pool.submit(run_invalid))
        concurrent.futures.wait(futures)
    assert not errors, f"valid queries failed: {errors}"


def test_concurrent_creates_with_errors(spark):
    # separate engine: this test mutates
    from pycypher_nmetl_spark import CypherEngine, GraphCatalog

    cat = GraphCatalog(spark)
    cat.register_nodes(
        "Person",
        spark.createDataFrame(
            [(i, f"P_{i}") for i in range(1, 21)], "id long, name string"
        ),
    )
    eng = CypherEngine(cat)
    initial = _count(eng)
    errors: list[Exception] = []
    lock = threading.Lock()

    def create_person(idx: int) -> None:
        try:
            eng.execute(f"CREATE (:Person {{name: 'New_{idx}', age: {idx}}})")
        except Exception as e:  # noqa: BLE001
            with lock:
                errors.append(e)

    def bad_query() -> None:
        try:
            eng.execute("INVALID SYNTAX HERE")
        except Exception:  # noqa: BLE001,S110
            pass

    with concurrent.futures.ThreadPoolExecutor(max_workers=4) as pool:
        futures = []
        for i in range(8):
            futures.append(pool.submit(create_person, i))
            futures.append(pool.submit(bad_query))
        concurrent.futures.wait(futures)

    assert not errors, f"CREATEs failed: {errors}"
    # stronger than reference: the write lock serializes commits, so all
    # 8 CREATEs must land (reference only asserts count did not drop)
    assert _count(eng) == initial + 8


def test_recovery_after_timeout(spark):
    """A timed-out query must not poison the engine: the next queries
    (including on the same tables) run normally. Reference parity:
    test_resource_exhaustion.py test_recovery_after_timeout /
    test_sequential_timeouts_no_resource_leak."""
    from pycypher_nmetl_spark import CypherEngine, GraphCatalog
    from pycypher_nmetl_spark.guards import QueryTimeout

    # sf0.01: the 3-way cartesian (1.5e4 x 1.5e4 x 2e3 rows) reliably
    # exceeds a 2 s deadline; at sf0.001 it can finish inside it
    cat = GraphCatalog.from_tpch(spark, "/root/testdata/sf0.01")
    eng = CypherEngine(cat, max_cross_join_product_bytes=None)
    for _ in range(3):
        with pytest.raises(QueryTimeout):
            eng.run(
                "MATCH (a:Customer), (b:Order), (c:Part) "
                "RETURN count(*) AS c",
                timeout_s=2,
            )
        rows = eng.run("MATCH (n:Nation) RETURN count(*) AS c")
        assert rows[0]["c"] == 25


def test_cached_query_usable_after_timeout(spark):
    """A deadline-cancelled query served from the result cache must not
    stay poisoned: Spark 4 pins a Dataset's first action's job group, so
    serving the stored object would re-raise SPARK_JOB_CANCELLED forever
    (and a new deadline could not cancel it). The cache serves a fresh
    wrapper per hit."""
    from pycypher_nmetl_spark import CypherEngine, GraphCatalog
    from pycypher_nmetl_spark.guards import QueryTimeout

    cat = GraphCatalog.from_tpch(spark, "/root/testdata/sf0.01")
    eng = CypherEngine(cat, max_cross_join_product_bytes=None)  # cache ON
    q = "MATCH (a:Customer), (b:Order), (c:Part) RETURN count(*) AS c"
    with pytest.raises(QueryTimeout):
        eng.run(q, timeout_s=2)
    # the same (cached) query must time out CLEANLY again — not leak a
    # raw Py4J SPARK_JOB_CANCELLED from the first cancellation
    with pytest.raises(QueryTimeout):
        eng.run(q, timeout_s=2)
    # and unrelated queries keep working
    assert eng.run("MATCH (n:Nation) RETURN count(*) AS c")[0]["c"] == 25
