"""Built-in procedures (reference: relational_models.py:150-279).

A procedure is ``fn(engine, arg_columns) -> DataFrame``; CALL cross-joins
its rows into the bindings. Built-ins are catalog introspection — tiny
driver-side DataFrames.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import types as T


def _db_labels(engine, args) -> DataFrame:
    return engine.spark.createDataFrame(
        [(l,) for l in engine.catalog.labels()],
        T.StructType([T.StructField("label", T.StringType())]),
    )


def _db_relationship_types(engine, args) -> DataFrame:
    return engine.spark.createDataFrame(
        [(t,) for t in engine.catalog.rel_types()],
        T.StructType([T.StructField("relationshipType", T.StringType())]),
    )


def _db_property_keys(engine, args) -> DataFrame:
    return engine.spark.createDataFrame(
        [(k,) for k in engine.catalog.property_keys()],
        T.StructType([T.StructField("propertyKey", T.StringType())]),
    )


def _graph_pagerank(engine, args) -> DataFrame:
    from pycypher_nmetl_spark.algorithms import proc_pagerank

    return proc_pagerank(engine, args)


def _graph_components(engine, args) -> DataFrame:
    from pycypher_nmetl_spark.algorithms import proc_connected_components

    return proc_connected_components(engine, args)


def _graph_triangles(engine, args) -> DataFrame:
    from pycypher_nmetl_spark.algorithms import proc_triangle_count

    return proc_triangle_count(engine, args)


def _llm_procedures():
    from pycypher_nmetl_spark.llmops.procs import LLM_PROCEDURES

    return LLM_PROCEDURES


BUILTIN_PROCEDURES = {
    "db.labels": _db_labels,
    "db.relationshiptypes": _db_relationship_types,
    "db.propertykeys": _db_property_keys,
    "graph.pagerank": _graph_pagerank,
    "graph.connectedcomponents": _graph_components,
    "graph.trianglecount": _graph_triangles,
    **_llm_procedures(),
}
