"""Generic AST walking / structural keys for the compiler."""

from __future__ import annotations

import dataclasses
from typing import Any, Iterator

from pycypher_nmetl_spark.cypher.ast_nodes import CountStar, Expr, FuncCall
from pycypher_nmetl_spark.functions.scalar import AGGREGATE_FUNCTIONS


def walk(node: Any) -> Iterator[Any]:
    """Yield node and all dataclass descendants (pre-order)."""
    if dataclasses.is_dataclass(node) and not isinstance(node, type):
        yield node
        for f in dataclasses.fields(node):
            yield from walk(getattr(node, f.name))
    elif isinstance(node, (list, tuple)):
        for item in node:
            yield from walk(item)


def ast_key(node: Any) -> Any:
    """Structural (hashable) key for an AST node — used to match the same
    aggregate expression appearing in both RETURN items and ORDER BY."""
    if dataclasses.is_dataclass(node) and not isinstance(node, type):
        return (
            type(node).__name__,
            tuple(ast_key(getattr(node, f.name)) for f in dataclasses.fields(node)),
        )
    if isinstance(node, (list, tuple)):
        return tuple(ast_key(x) for x in node)
    return node


def find_aggregates(expr: Expr) -> list[Expr]:
    """All aggregate-function call nodes in an expression tree.

    min/max over a *literal list* are the scalar array-min/max variants
    (reference: scalar_function_evaluator.py:474-515), not aggregates.
    """
    from pycypher_nmetl_spark.cypher.ast_nodes import ListLit

    out = []
    for n in walk(expr):
        if isinstance(n, CountStar):
            out.append(n)
        elif isinstance(n, FuncCall) and n.name in AGGREGATE_FUNCTIONS:
            if (
                n.name in ("min", "max")
                and len(n.args) == 1
                and isinstance(n.args[0], ListLit)
            ):
                continue
            out.append(n)
    return out


def contains_aggregate(expr: Expr) -> bool:
    return bool(find_aggregates(expr))
