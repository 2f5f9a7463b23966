"""Pipeline runner: sources -> catalog -> dependency-ordered queries ->
outputs (reference: cli/pipeline.py:653-913, multi_query_analyzer.py).
"""

from __future__ import annotations

import importlib
from dataclasses import dataclass, field
from typing import Any

from pyspark.sql import DataFrame, SparkSession

from pycypher_nmetl_spark.catalog import GraphCatalog
from pycypher_nmetl_spark.compiler.astutil import walk
from pycypher_nmetl_spark.cypher.ast_nodes import (
    Create, Match, Merge, NodePattern, Query, RelPattern, SetClause, UnionQuery,
)
from pycypher_nmetl_spark.cypher.parser import parse
from pycypher_nmetl_spark.engine import CypherEngine
from pycypher_nmetl_spark.pipeline.config import PipelineConfig, QuerySpec
from pycypher_nmetl_spark.pipeline.sources import read_source
from pycypher_nmetl_spark.pipeline.writer import write_output


def produces_consumes(cypher: str) -> tuple[set[str], set[str]]:
    """Entity labels a query produces (CREATE/MERGE/SET :Label) and
    consumes (MATCH patterns) — reference: multi_query_analyzer.py:1-395."""
    ast = parse(cypher)
    queries = ast.branches if isinstance(ast, UnionQuery) else [ast]
    produced: set[str] = set()
    consumed: set[str] = set()
    for q in queries:
        for clause in q.clauses:
            targets = []
            if isinstance(clause, (Create, Match)):
                bucket = produced if isinstance(clause, Create) else consumed
                targets = clause.paths
            elif isinstance(clause, Merge):
                bucket = produced
                targets = [clause.path]
                # MERGE also reads the labels it matches
                for n in walk(clause.path):
                    if isinstance(n, NodePattern):
                        consumed.update(n.labels)
                    if isinstance(n, RelPattern):
                        consumed.update(n.types)
            elif isinstance(clause, SetClause):
                for item in clause.items:
                    produced.update(item.labels)
                continue
            else:
                continue
            for n in walk(targets):
                if isinstance(n, NodePattern):
                    bucket.update(n.labels)
                if isinstance(n, RelPattern):
                    bucket.update(n.types)
    return produced, consumed


def order_queries(queries: list[QuerySpec]) -> list[QuerySpec]:
    """Topological order by produces/consumes + explicit depends_on;
    stable (keeps config order among independent queries)."""
    info = {q.id: produces_consumes(q.cypher) for q in queries}
    deps: dict[str, set[str]] = {q.id: set(q.depends_on) for q in queries}
    for q in queries:
        _, consumed = info[q.id]
        for other in queries:
            if other.id == q.id:
                continue
            produced, _ = info[other.id]
            if consumed & produced:
                deps[q.id].add(other.id)

    ordered: list[QuerySpec] = []
    done: set[str] = set()
    pending = list(queries)
    while pending:
        progress = False
        for q in list(pending):
            if deps[q.id] <= done:
                ordered.append(q)
                done.add(q.id)
                pending.remove(q)
                progress = True
        if not progress:
            # dependency cycle: fall back to config order for the rest
            ordered.extend(pending)
            break
    return ordered


def load_functions(engine: CypherEngine, specs) -> None:
    """Import user modules and register their callables as Cypher
    functions (reference: cli/pipeline.py:133-226). A module may expose
    `register(engine)` for full control; otherwise listed names (or all
    public callables for a wildcard) are wrapped as Column functions."""
    from pyspark.sql import functions as F

    for spec in specs:
        mod = importlib.import_module(spec.module)
        if hasattr(mod, "register"):
            mod.register(engine)
            continue
        names = spec.names or [n for n in dir(mod) if not n.startswith("_")]
        for name in names:
            fn = getattr(mod, name)
            if not callable(fn):
                continue
            engine.register_function(
                name, lambda cc, args, fn=fn: fn(*[cc.col(a) for a in args])
            )


@dataclass
class PipelineResult:
    results: dict[str, DataFrame] = field(default_factory=dict)
    written: dict[str, str] = field(default_factory=dict)
    errors: dict[str, Exception] = field(default_factory=dict)
    order: list[str] = field(default_factory=list)


def build_catalog(spark: SparkSession, config: PipelineConfig) -> GraphCatalog:
    cat = GraphCatalog(spark)
    for src in config.entities:
        df = read_source(
            spark, src.uri, src.format, src.schema_hints, src.query, src.options
        )
        cat.register_nodes(src.entity_type, df, id_col=src.id_col or "id")
    for src in config.relationships:
        df = read_source(
            spark, src.uri, src.format, src.schema_hints, src.query, src.options
        )
        cat.register_edges(
            src.relationship_type,
            df,
            id_col=src.id_col or "id",
            src_col=src.source_col,
            dst_col=src.target_col,
            src_label=src.source_label,
            dst_label=src.target_label,
        )
    return cat


def run_pipeline(
    spark: SparkSession,
    config: PipelineConfig,
    parameters: dict[str, Any] | None = None,
) -> PipelineResult:
    errors = config.validate()
    if errors:
        raise ValueError("invalid pipeline config: " + "; ".join(errors))

    cat = build_catalog(spark, config)
    engine = CypherEngine(cat)
    load_functions(engine, config.functions)

    outputs = {o.query_id: o for o in config.outputs}
    result = PipelineResult()
    shared = {}
    if config.share_scans:
        # writes happen inside the loop, so a shared persisted prefix
        # pays off immediately: the first member's write warms it, the
        # rest read it (no-op for batches with mutations)
        shared = engine._plan_shared_scans(config.queries, parameters or {})
    try:
        for q in order_queries(config.queries):
            result.order.append(q.id)
            try:
                df = engine.execute(q.cypher, parameters, _prefix=shared.get(q.id))
                result.results[q.id] = df
                out = outputs.get(q.id)
                if out is not None:
                    write_output(df, out.uri, out.format, out.mode, out.options)
                    result.written[q.id] = out.uri
            except Exception as e:  # noqa: BLE001
                if config.on_error == "fail":
                    raise
                result.errors[q.id] = e
    finally:
        if config.share_scans:
            engine.release_shared_scans()
    return result
