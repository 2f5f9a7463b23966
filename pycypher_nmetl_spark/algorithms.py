"""Distributed graph algorithms over the catalog's edge tables.

Beyond-reference extensions (the reference has a procedure registry but
no graph algorithms); exposed both as a Python API and as Cypher
procedures (CALL graph.pagerank('KNOWS') YIELD id, rank).

All three are the classic DataFrame-iteration formulations (same shape
GraphX/GraphFrames use): per-iteration equi-joins + aggregations, with
``localCheckpoint`` per round to truncate lineage. On a cluster the
edge DataFrame would be pre-partitioned by src so every iteration
shuffles only the (small) message side.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _shuffle_parts(df: DataFrame) -> int:
    """The session's shuffle-partition setting (scale-adaptive, not a
    local constant), degrading gracefully where it is non-numeric."""
    try:
        return int(df.sparkSession.conf.get("spark.sql.shuffle.partitions"))
    except ValueError:  # e.g. "auto" on managed deployments
        try:
            return df.sparkSession.sparkContext.defaultParallelism
        except Exception:  # Spark Connect sessions expose no sparkContext
            return 200


def _part_by(df: DataFrame, key: str) -> DataFrame:
    """Hash-partition + sort ``df`` on ``key`` and cache it, eagerly.

    The iterative algorithms join their (big) adjacency frame against a
    (small) per-node state frame once per round; doing the partition and
    sort once and letting every round's sort-merge join reuse them turns
    the per-iteration cost from O(E) shuffle+sort into an O(V) shuffle
    of the state side only. Partition count follows the session's
    shuffle-partitions setting (scale-adaptive, not a local constant).
    Callers unpersist before returning."""
    n = _shuffle_parts(df)
    out = df.repartition(n, F.col(key)).sortWithinPartitions(key).persist()
    out.count()  # materialize so iteration plans see the cached layout
    return out


def pagerank(
    edges: DataFrame,
    damping: float = 0.85,
    iterations: int = 10,
) -> DataFrame:
    """PageRank over an (src, dst) edge DataFrame -> (id, rank).

    Power iteration: rank = (1-d)/N + d * sum(rank_in / out_degree).
    Dangling nodes' mass is redistributed uniformly each round.
    """
    # node set cached partitioned+sorted on id like the adjacency: the
    # per-iteration rank rebuild left-joins nodes against contribs
    # (already hash-partitioned on id by its groupBy), so neither side
    # of that join re-shuffles inside the loop
    nodes = _part_by(
        edges.select(F.col("src").alias("id"))
        .unionByName(edges.select(F.col("dst").alias("id")))
        .dropDuplicates(),
        "id",
    )
    # try/finally: an exception (or interrupt) inside the iteration loop
    # must not leak the cached frames into the shared session's cache
    # manager for its whole lifetime (ADVICE r12)
    adj = None
    try:
        n = nodes.count()
        # Degree-annotated adjacency, hash-partitioned + sorted on src and
        # cached ONCE. Each iteration's checkpoint used to re-plan the whole
        # lazy subtree — a full edge scan, the out-degree groupBy shuffle,
        # and an edge-side join shuffle PER ITERATION. A cached plan's
        # partitioning/ordering survive into consumers (AQE may not change
        # them: canChangeCachedPlanOutputPartitioning=false default), unlike
        # localCheckpoint under AQE, so every iteration's join arrives
        # pre-partitioned and pre-sorted and shuffles only the rank side —
        # the Pregel/GraphFrames shape the module docstring promises.
        # Working-set cache for the loop only (unpersisted before return),
        # not a cross-run result cache.
        out_deg = edges.groupBy("src").agg(F.count(F.lit(1)).alias("_deg"))
        adj = _part_by(edges.select("src", "dst").join(out_deg, on="src"), "src")
        ranks = nodes.withColumn("rank", F.lit(1.0 / n))
        base = (1.0 - damping) / n
        for _ in range(iterations):
            contribs = (
                adj.join(ranks, adj["src"] == ranks["id"])
                .select(F.col("dst").alias("id"), (F.col("rank") / F.col("_deg")).alias("_c"))
                .groupBy("id")
                .agg(F.sum("_c").alias("_in"))
            )
            # dangling mass = 1 - sum of mass that flowed through edges.
            # Folded into the plan as a broadcast 1-row aggregate instead of a
            # driver-side first(): one job per iteration (the checkpoint), not
            # two, and contribs is computed once, not twice.
            flowed = contribs.agg(
                F.coalesce(F.sum("_in"), F.lit(0.0)).alias("_fl")
            )
            ranks = (
                nodes.join(contribs, on="id", how="left")
                .crossJoin(F.broadcast(flowed))
                .select(
                    "id",
                    (
                        F.lit(base)
                        + F.lit(damping)
                        * (
                            F.coalesce(F.col("_in"), F.lit(0.0))
                            + (F.lit(1.0) - F.col("_fl")) / F.lit(float(n))
                        )
                    ).alias("rank"),
                )
                .localCheckpoint()
            )
        return ranks  # a materialized checkpoint; caches released below
    finally:
        if adj is not None:
            adj.unpersist()
        nodes.unpersist()


def connected_components(edges: DataFrame, max_iterations: int = 20) -> DataFrame:
    """Undirected connected components -> (id, component) where component
    is the minimum node id in the component (hash-min label propagation)."""
    sym = edges.select("src", "dst").unionByName(
        edges.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    )
    comp = (
        sym.select(F.col("src").alias("id"))
        .dropDuplicates()
        .withColumn("component", F.col("id"))
        .localCheckpoint()
    )
    # Symmetrized adjacency, hash-partitioned + sorted on src and cached
    # ONCE (each iteration's checkpoint otherwise re-scans AND
    # re-shuffles the whole edge table; see _part_by). try/finally so an
    # exception inside the loop cannot leak the cache (ADVICE r12).
    adj = _part_by(sym, "src")
    try:
        for _ in range(max_iterations):
            # every node proposes its component to its neighbours; keep the min
            msgs = (
                adj.join(comp, adj["src"] == comp["id"])
                .select(F.col("dst").alias("id"), F.col("component"))
                .groupBy("id")
                .agg(F.min("component").alias("_new"))
            )
            updated = (
                comp.join(msgs, on="id", how="left")
                .select(
                    "id",
                    F.least(F.col("component"), F.coalesce(F.col("_new"), F.col("component"))).alias(
                        "component"
                    ),
                    (F.coalesce(F.col("_new"), F.col("component")) < F.col("component")).alias(
                        "_changed"
                    ),
                )
                .localCheckpoint()
            )
            changed = updated.filter(F.col("_changed")).limit(1).count()
            comp = updated.drop("_changed")
            if changed == 0:
                break
        return comp  # a materialized checkpoint; cache released below
    finally:
        adj.unpersist()


def triangle_count(edges: DataFrame) -> DataFrame:
    """Per-node triangle counts -> (id, triangles) on the undirected,
    de-duplicated graph. Canonical-orientation join (each undirected edge
    kept once as lo<hi) so every triangle is built exactly once — the
    standard n-way-join formulation (no WCOJ; SURVEY.md §2.3 note).

    Round-13 note: the cached-partitioned-adjacency treatment the
    ITERATIVE siblings got in r12 was implemented here in two variants
    (persist+eager result checkpoint; lazy shared repartition exchange)
    and MEASURED SLOWER both times, at sf0.1 and at the genuine 10x
    (persist variant 1.59->2.01 s / 3.0->3.3 s; lazy variant
    1.39->1.72 s / 2.9->3.7 s): a single-pass operator cannot amortize
    the extra materialization, and the self-join sides broadcast at
    these sizes, so a hash-partitioned layout saves no exchange that
    ReuseExchange was paying. The localCheckpoint-once shape below is
    the measured optimum (guide §1: switch back when the "ideal" plan
    loses empirically). Do not re-apply without fresh measurements.
    """
    und = (
        edges.select(
            F.least("src", "dst").alias("a"), F.greatest("src", "dst").alias("b")
        )
        .filter(F.col("a") != F.col("b"))
        .dropDuplicates()
        .localCheckpoint()
    )
    e1 = und.alias("e1")
    e2 = und.alias("e2")
    e3 = und.alias("e3")
    tris = (
        e1.join(e2, F.col("e1.b") == F.col("e2.a"))
        .join(
            e3,
            (F.col("e3.a") == F.col("e1.a")) & (F.col("e3.b") == F.col("e2.b")),
        )
        .select(
            F.col("e1.a").alias("x"), F.col("e1.b").alias("y"), F.col("e2.b").alias("z")
        )
    )
    per_node = (
        tris.select(F.explode(F.array("x", "y", "z")).alias("id"))
        .groupBy("id")
        .agg(F.count(F.lit(1)).alias("triangles"))
    )
    nodes = (
        und.select(F.col("a").alias("id"))
        .unionByName(und.select(F.col("b").alias("id")))
        .dropDuplicates()
    )
    return nodes.join(per_node, on="id", how="left").select(
        "id", F.coalesce("triangles", F.lit(0)).alias("triangles")
    )


# ------------------------------------------------------------------ #
# procedure wrappers: CALL graph.pagerank('KNOWS') YIELD id, rank
# ------------------------------------------------------------------ #
def _edges_for(engine, args) -> DataFrame:
    rel_types = engine.catalog.rel_types()
    if args:
        # literal/parameter args arrive as plain Python values from
        # CALL compilation (engine._compile_call)
        name = args[0] if isinstance(args[0], str) else None
        if name is not None and not engine.catalog.has_rel_type(name):
            raise KeyError(
                f"unknown relationship type {name!r}; known: {rel_types}"
            )
        if name:
            return engine.catalog.edges(name)
    out = None
    for t in rel_types:
        df = engine.catalog.edges(t).select("src", "dst")
        out = df if out is None else out.unionByName(df)
    if out is None:
        raise ValueError("catalog has no relationship tables")
    return out


def proc_pagerank(engine, args) -> DataFrame:
    return pagerank(_edges_for(engine, args))


def proc_connected_components(engine, args) -> DataFrame:
    return connected_components(_edges_for(engine, args))


def proc_triangle_count(engine, args) -> DataFrame:
    return triangle_count(_edges_for(engine, args))
