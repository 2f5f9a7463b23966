"""A file-recording stand-in for the neo4j driver.

Implements the slice of the driver protocol the sink uses
(``GraphDatabase.driver(uri, auth) -> driver.session() -> session.run``)
without a server. Every ``run`` call appends one JSON line
``{"cypher": ..., "rows": [...]}`` to a fresh file in ``record_dir`` —
file-based because ``foreachPartition`` executes in Python worker
processes, so in-memory mocks never make it back to the test process.

Uses: the mocked-driver sink test suite (reference parity:
tests/test_neo4j_sink.py drives the real sink code against a fake
driver), and a dry-run backend for users who want to inspect the exact
UNWIND batches a write would send.

Failure injection: seed ``record_dir/_failures`` with an integer N and
the first N ``run`` calls raise, exercising the sink's retry loop.
"""

from __future__ import annotations

import json
import os
import uuid


class FakeSession:
    def __init__(self, record_dir: str):
        self.record_dir = record_dir

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        return False

    def run(self, cypher: str, **params) -> None:
        marker = os.path.join(self.record_dir, "_failures")
        if os.path.exists(marker):
            with open(marker) as f:
                remaining = int(f.read().strip() or 0)
            if remaining > 0:
                with open(marker, "w") as f:
                    f.write(str(remaining - 1))
                raise RuntimeError("injected transient failure")
        path = os.path.join(self.record_dir, f"run-{uuid.uuid4().hex}.json")
        with open(path, "w") as f:
            json.dump(
                {"cypher": cypher, "rows": params.get("rows", [])},
                f,
                default=lambda o: o.hex() if isinstance(o, (bytes, bytearray)) else str(o),
            )


class FakeDriver:
    def __init__(self, record_dir: str):
        self.record_dir = record_dir

    def session(self) -> FakeSession:
        return FakeSession(self.record_dir)

    def close(self) -> None:
        pass


def recording_driver_factory(record_dir: str):
    """driver_factory for write_nodes_to_neo4j/write_edges_to_neo4j.

    Returns a picklable callable (module-level closure via partial-free
    class) shipping cleanly to Spark workers.
    """
    return _Factory(record_dir)


class _Factory:
    def __init__(self, record_dir: str):
        self.record_dir = record_dir

    def __call__(self, uri: str, auth) -> FakeDriver:
        return FakeDriver(self.record_dir)


def read_recorded(record_dir: str) -> list[dict]:
    """All recorded run calls, one dict per call (order unspecified —
    partitions write concurrently)."""
    out = []
    for name in sorted(os.listdir(record_dir)):
        if name.startswith("run-"):
            with open(os.path.join(record_dir, name)) as f:
                out.append(json.load(f))
    return out
