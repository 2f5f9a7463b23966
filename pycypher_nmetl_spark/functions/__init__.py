"""Scalar & aggregate function registries (SURVEY.md §2.8 inventory)."""

from pycypher_nmetl_spark.functions.scalar import AGGREGATE_FUNCTIONS, SCALAR_FUNCTIONS

__all__ = ["SCALAR_FUNCTIONS", "AGGREGATE_FUNCTIONS"]
