"""Neo4j sink: distributed batched UNWIND-MERGE writes.

Reference semantics: sinks/neo4j.py:332-388 (merge-Cypher builders),
520-753 (batching, coercion, retries). Spark-first re-expression: each
partition opens one driver session and streams its rows in UNWIND
batches — `df.foreachPartition`, so the write scales with the cluster
and never collects to the Spark driver.

The neo4j driver is not installed in this environment; imports are
gated so everything else works without it, and the Cypher-building
logic is pure (unit-testable without a server).
"""

from __future__ import annotations

import re
from typing import Any

from pyspark.sql import DataFrame

_IDENT_RE = re.compile(r"^[A-Za-z_][A-Za-z0-9_]*$")


def _check_ident(name: str) -> str:
    """Label/type/property names are interpolated into Cypher text —
    validate them (reference: sinks/neo4j.py identifier validation)."""
    if not _IDENT_RE.match(name):
        raise ValueError(f"invalid Neo4j identifier: {name!r}")
    return name


def build_node_merge_cypher(label: str, id_key: str, prop_keys: list[str]) -> str:
    """Batched node upsert (reference: sinks/neo4j.py:332-360)."""
    _check_ident(label)
    _check_ident(id_key)
    for k in prop_keys:
        _check_ident(k)
    return (
        f"UNWIND $rows AS row "
        f"MERGE (n:{label} {{{id_key}: row.{id_key}}}) "
        f"SET n += row.props"
    )


def build_edge_merge_cypher(
    rel_type: str, src_label: str, dst_label: str, id_key: str = "id"
) -> str:
    """Batched relationship upsert (reference: sinks/neo4j.py:361-388)."""
    _check_ident(rel_type)
    _check_ident(src_label)
    _check_ident(dst_label)
    return (
        f"UNWIND $rows AS row "
        f"MATCH (s:{src_label} {{{id_key}: row.src}}) "
        f"MATCH (t:{dst_label} {{{id_key}: row.dst}}) "
        f"MERGE (s)-[r:{rel_type}]->(t) "
        f"SET r += row.props"
    )


def coerce_value(v: Any) -> Any:
    """Neo4j-safe value coercion (reference: sinks/neo4j.py:520-580)."""
    import datetime
    import math

    if isinstance(v, float) and math.isnan(v):
        return None
    if isinstance(v, (datetime.datetime, datetime.date)):
        return v.isoformat()
    if isinstance(v, bytearray):
        return bytes(v)
    if isinstance(v, dict):
        return {k: coerce_value(x) for k, x in v.items()}
    if isinstance(v, list):
        return [coerce_value(x) for x in v]
    return v


def _default_driver_factory(uri, auth):
    from neo4j import GraphDatabase  # gated: only needed on executors

    return GraphDatabase.driver(uri, auth=auth)


def _write_partition(
    rows_iter, uri, auth, cypher, id_cols, batch_size, max_retries,
    driver_factory=None,
):
    factory = driver_factory or _default_driver_factory
    driver = factory(uri, auth)
    try:
        with driver.session() as session:
            batch: list[dict] = []

            def flush():
                if not batch:
                    return
                for attempt in range(max_retries):
                    try:
                        session.run(cypher, rows=batch)
                        break
                    except Exception:  # noqa: BLE001
                        if attempt == max_retries - 1:
                            raise
                batch.clear()

            for row in rows_iter:
                d = row.asDict(recursive=True)
                out = {k: coerce_value(d[k]) for k in id_cols if k in d}
                # coerce BEFORE the null filter so NaN (-> None) is
                # dropped like a null instead of erasing the property
                props = {
                    k: coerce_value(v) for k, v in d.items() if k not in id_cols
                }
                out["props"] = {k: v for k, v in props.items() if v is not None}
                batch.append(out)
                if len(batch) >= batch_size:
                    flush()
            flush()
    finally:
        driver.close()


def write_nodes_to_neo4j(
    df: DataFrame,
    label: str,
    uri: str,
    auth: tuple[str, str],
    id_col: str = "id",
    batch_size: int = 1000,
    max_retries: int = 3,
    driver_factory=None,
) -> None:
    """Upsert a node DataFrame: one Neo4j session per Spark partition,
    UNWIND-MERGE batches of `batch_size` rows.

    driver_factory(uri, auth) -> driver overrides the real neo4j import
    (tests use sinks.fake_neo4j; a connection-pooling wrapper fits too).
    """
    props = [c for c in df.columns if c != id_col]
    cypher = build_node_merge_cypher(label, id_col, props)
    df.foreachPartition(
        lambda it: _write_partition(
            it, uri, auth, cypher, [id_col], batch_size, max_retries,
            driver_factory,
        )
    )


def write_edges_to_neo4j(
    df: DataFrame,
    rel_type: str,
    src_label: str,
    dst_label: str,
    uri: str,
    auth: tuple[str, str],
    batch_size: int = 1000,
    max_retries: int = 3,
    driver_factory=None,
) -> None:
    cypher = build_edge_merge_cypher(rel_type, src_label, dst_label)
    df.foreachPartition(
        lambda it: _write_partition(
            it, uri, auth, cypher, ["src", "dst"], batch_size, max_retries,
            driver_factory,
        )
    )
