"""Cypher frontend: tokenizer -> Pratt parser -> typed AST.

Replaces the reference's Lark Earley grammar + Pydantic AST
(reference: packages/pycypher/src/pycypher/grammar_parser.py,
ast_models/) with a dependency-free hand-written recursive-descent /
Pratt parser. Parse results are LRU-cached by query text, matching the
reference's AST cache (ast_converter.py:186-271).
"""

from pycypher_nmetl_spark.cypher.parser import parse

__all__ = ["parse"]
