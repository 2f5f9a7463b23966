"""PySpark-native analytics engine with the query & data-processing
capabilities of zacernst/pycypher-nmetl, re-expressed Spark-first.

Public API:

    from pycypher_nmetl_spark import GraphCatalog, CypherEngine

    catalog = GraphCatalog(spark)
    catalog.register_nodes("Person", df)          # df has an `id` column
    catalog.register_edges("KNOWS", edges_df)     # id, src, dst (+ props)
    engine = CypherEngine(catalog)
    result_df = engine.execute("MATCH (n:Person) WHERE n.age > 30 RETURN n.name")

Design (see SURVEY.md §7): Cypher string -> hand-written Pratt parser ->
typed AST -> driver-side compiler that appends lazy DataFrame
transformations -> one Spark action per RETURN. The "BindingFrame" IR of
the reference (reference: packages/pycypher/src/pycypher/binding_frame.py:249-297)
becomes a plain DataFrame whose columns are Cypher variables (`n` = id,
`n__prop` = property carried from the scan); Catalyst column pruning makes
carrying properties free, which replaces the reference's ID-keyed property
lookup machinery entirely.
"""

from pycypher_nmetl_spark.catalog import GraphCatalog
from pycypher_nmetl_spark.engine import CypherEngine
from pycypher_nmetl_spark.session import get_spark

__all__ = ["GraphCatalog", "CypherEngine", "get_spark"]

__version__ = "0.1.0"
