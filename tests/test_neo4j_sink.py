"""Mocked-driver Neo4j sink tests (reference: tests/test_neo4j_sink.py —
1,159 lines of fake-driver batching/retry/coercion coverage).

The fake driver records every session.run to disk (foreachPartition runs
in worker processes), so these exercise the REAL distributed write path
end-to-end: partitioning, batching, coercion, retries — no server.
"""

from __future__ import annotations

import datetime

import pytest

from pycypher_nmetl_spark.sinks.fake_neo4j import (
    read_recorded, recording_driver_factory,
)
from pycypher_nmetl_spark.sinks.neo4j import (
    build_edge_merge_cypher, build_node_merge_cypher,
    write_edges_to_neo4j, write_nodes_to_neo4j,
)


@pytest.fixture()
def record_dir(tmp_path):
    d = tmp_path / "rec"
    d.mkdir()
    return str(d)


def test_node_write_batches_and_preserves_rows(spark, record_dir):
    df = spark.range(2500).selectExpr(
        "id", "concat('name_', id) AS name", "CAST(id AS DOUBLE) AS score"
    ).repartition(2)
    write_nodes_to_neo4j(
        df, "Person", "bolt://fake", ("u", "p"),
        batch_size=1000, driver_factory=recording_driver_factory(record_dir),
    )
    calls = read_recorded(record_dir)
    # 2500 rows over 2 partitions at batch_size 1000 -> >= 3 run calls,
    # none over the batch size
    assert len(calls) >= 3
    assert all(len(c["rows"]) <= 1000 for c in calls)
    rows = [r for c in calls for r in c["rows"]]
    assert len(rows) == 2500
    assert all(c["cypher"] == build_node_merge_cypher("Person", "id", ["name", "score"])
               for c in calls)
    by_id = {r["id"]: r for r in rows}
    assert by_id[7]["props"] == {"name": "name_7", "score": 7.0}


def test_edge_write_shapes_src_dst(spark, record_dir):
    df = spark.createDataFrame(
        [(1, 2, 2015), (2, 3, 2020)], "src long, dst long, since long"
    )
    write_edges_to_neo4j(
        df, "KNOWS", "Person", "Person", "bolt://fake", ("u", "p"),
        driver_factory=recording_driver_factory(record_dir),
    )
    rows = [r for c in read_recorded(record_dir) for r in c["rows"]]
    assert sorted((r["src"], r["dst"], r["props"]["since"]) for r in rows) == [
        (1, 2, 2015), (2, 3, 2020),
    ]
    assert read_recorded(record_dir)[0]["cypher"] == build_edge_merge_cypher(
        "KNOWS", "Person", "Person"
    )


def test_value_coercion_through_the_distributed_path(spark, record_dir):
    df = spark.createDataFrame(
        [(1, float("nan"), datetime.date(2024, 1, 2), bytearray(b"ab"), ["x", None])],
        "id long, f double, d date, b binary, lst array<string>",
    )
    write_nodes_to_neo4j(
        df, "Thing", "bolt://fake", ("u", "p"),
        driver_factory=recording_driver_factory(record_dir),
    )
    [row] = [r for c in read_recorded(record_dir) for r in c["rows"]]
    props = row["props"]
    assert "f" not in props  # NaN -> None -> dropped from props
    assert props["d"] == "2024-01-02"  # ISO-coerced
    assert props["lst"] == ["x", None]
    # bytes survive JSON via the fake's encoding only as a list; the
    # coercion itself produced bytes (bytearray -> bytes) before that
    assert "b" in props


def test_transient_failure_retried(spark, record_dir):
    # first run call fails once; the sink's retry loop must absorb it
    with open(f"{record_dir}/_failures", "w") as f:
        f.write("1")
    df = spark.createDataFrame([(1, "a")], "id long, name string").coalesce(1)
    write_nodes_to_neo4j(
        df, "Person", "bolt://fake", ("u", "p"),
        max_retries=3, driver_factory=recording_driver_factory(record_dir),
    )
    rows = [r for c in read_recorded(record_dir) for r in c["rows"]]
    assert [r["id"] for r in rows] == [1]


def test_retries_exhausted_raises(spark, record_dir):
    with open(f"{record_dir}/_failures", "w") as f:
        f.write("99")
    df = spark.createDataFrame([(1, "a")], "id long, name string").coalesce(1)
    with pytest.raises(Exception, match="injected transient failure"):
        write_nodes_to_neo4j(
            df, "Person", "bolt://fake", ("u", "p"),
            max_retries=2, driver_factory=recording_driver_factory(record_dir),
        )
    assert read_recorded(record_dir) == []


def test_identifier_validation():
    with pytest.raises(ValueError, match="identifier"):
        build_node_merge_cypher("Person) DETACH DELETE (n", "id", [])
    with pytest.raises(ValueError, match="identifier"):
        build_edge_merge_cypher("KNOWS", "Person", "x-y")
