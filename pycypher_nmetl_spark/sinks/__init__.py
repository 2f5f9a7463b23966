from pycypher_nmetl_spark.sinks.neo4j import write_edges_to_neo4j, write_nodes_to_neo4j

__all__ = ["write_nodes_to_neo4j", "write_edges_to_neo4j"]
