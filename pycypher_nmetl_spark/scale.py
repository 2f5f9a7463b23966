"""Physical-layout utilities for cluster scale.

At 100 TB the dominant cost of pattern matching is the shuffle on every
node⋈edge join. Two standard Spark remedies, packaged for the graph
catalog:

  * **bucketed persistence** — write node tables bucketed by `id` and
    edge tables bucketed by `src` (or `dst`) with the same bucket count;
    Spark's bucketed-scan metadata then satisfies the join's hash
    requirement from disk layout, eliminating the shuffle entirely on
    the (node.id == edge.src) side of every hop;
  * **salted aggregation** — two-phase groupBy for skewed keys (partial
    per (key, salt), then final per key), complementing AQE's skew-join
    splitting which only covers joins.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from pycypher_nmetl_spark.catalog import GraphCatalog


def _drop_stale_location(spark: SparkSession, name: str) -> None:
    """Drop a pre-existing table AND its orphaned warehouse directory.

    The embedded metastore is per-session while ``spark-warehouse/`` is
    on-disk, so a managed-table location can outlive its metastore entry;
    ``saveAsTable`` then fails with LOCATION_ALREADY_EXISTS even under
    mode("overwrite").
    """
    spark.sql(f"DROP TABLE IF EXISTS {name}")
    import shutil
    from urllib.parse import urlparse

    warehouse = urlparse(spark.conf.get("spark.sql.warehouse.dir")).path
    shutil.rmtree(f"{warehouse.rstrip('/')}/{name}", ignore_errors=True)


def save_catalog_bucketed(
    cat: GraphCatalog,
    prefix: str,
    buckets: int = 32,
) -> list[str]:
    """Persist every catalog table as a bucketed managed table.

    Node tables bucket+sort by ``id``; edge tables by ``src``. Returns
    the created table names (``<prefix>_nodes_<label>`` /
    ``<prefix>_edges_<type>``, lowercased by the metastore).
    """
    created: list[str] = []
    for label in cat.labels():
        name = f"{prefix}_nodes_{label}".lower()
        _drop_stale_location(cat.spark, name)
        (
            cat.nodes(label)
            .write.mode("overwrite")
            .bucketBy(buckets, "id")
            .sortBy("id")
            .saveAsTable(name)
        )
        created.append(name)
    for rtype in cat.rel_types():
        name = f"{prefix}_edges_{rtype}".lower()
        _drop_stale_location(cat.spark, name)
        (
            cat.edges(rtype)
            .write.mode("overwrite")
            .bucketBy(buckets, "src")
            .sortBy("src")
            .saveAsTable(name)
        )
        created.append(name)
    return created


def load_catalog_bucketed(
    spark: SparkSession,
    prefix: str,
    labels: list[str],
    rel_types: list[str] | dict[str, tuple[str | None, str | None]],
) -> GraphCatalog:
    """Re-register a bucketed catalog; pattern joins on (id == src) can
    then use the bucket layout instead of shuffling."""
    cat = GraphCatalog(spark)
    for label in labels:
        cat.register_nodes(label, spark.table(f"{prefix}_nodes_{label}".lower()))
    if isinstance(rel_types, dict):
        items = rel_types.items()
    else:
        items = [(t, (None, None)) for t in rel_types]
    for rtype, (src_l, dst_l) in items:
        cat.register_edges(
            rtype,
            spark.table(f"{prefix}_edges_{rtype}".lower()),
            src_label=src_l,
            dst_label=dst_l,
        )
    return cat


def salted_agg(
    df: DataFrame,
    keys: list[str],
    aggs: dict[str, tuple[str, Column]],
    salt_buckets: int = 16,
) -> DataFrame:
    """Two-phase aggregation for skewed grouping keys.

    ``aggs`` maps output name -> (combiner, partial Column) where
    combiner is 'sum' | 'min' | 'max' (the re-aggregation applied to the
    per-salt partials). count() is expressed as ('sum', F.count(...)).

    The salt is derived from the ROW CONTENT (xxhash64 over every
    column), never from rand(): a rand-derived shuffle key is only
    deterministic per (partition, row-index), so a fetch-failure retry
    that re-runs part of the map stage with reordered input re-draws
    salts and the partial aggregation double-counts or drops rows
    (SPARK-38388 — the optimization guide's §2.5 hazard). Identical
    rows collapsing onto one salt skews nothing that matters: partials
    stay correct and a duplicate-heavy key still spreads across buckets
    by content.
    """
    salted = df.withColumn(
        "_salt",
        F.pmod(
            F.xxhash64(*[F.col(c) for c in df.columns], F.lit(42)),
            F.lit(salt_buckets),
        ).cast("int"),
    )
    partial = salted.groupBy(*keys, "_salt").agg(
        *[c.alias(f"_p_{n}") for n, (_, c) in aggs.items()]
    )
    combiners = {"sum": F.sum, "min": F.min, "max": F.max}
    final = partial.groupBy(*keys).agg(
        *[
            combiners[comb](F.col(f"_p_{n}")).alias(n)
            for n, (comb, _) in aggs.items()
        ]
    )
    return final
