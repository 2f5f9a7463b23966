"""Cypher -> DataFrame compiler.

Each clause appends lazy transformations to a Bindings (DataFrame whose
columns are Cypher variables); one Spark action happens per RETURN.
This replaces the reference's per-clause interpreted BindingFrame loop
(reference: packages/pycypher/src/pycypher/clause_executor.py:469-587)
with a compiler, so Catalyst sees the whole query plan at once and can
push filters/prune columns/reorder joins globally.
"""
