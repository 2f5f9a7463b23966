"""Mutation matrix: CREATE / SET / REMOVE / DELETE / MERGE / FOREACH.

Reference: mutation_engine.py + tests/test_set_operations_comprehensive.py
(semantics only; all Spark-side re-implementation).
"""


def test_create_node(golden, run):
    golden.execute("CREATE (:Person {id: 50, name: 'Eve', age: 22})")
    assert run("MATCH (n:Person {name:'Eve'}) RETURN n.age AS age") == [(22,)]
    assert run("MATCH (n:Person) RETURN count(*) AS c") == [(5,)]


def test_create_allocates_distinct_ids(golden):
    golden.execute("UNWIND [1,2,3] AS i CREATE (:Tag {v: i})")
    out = golden.execute("MATCH (t:Tag) RETURN id(t) AS i").collect()
    ids = [r["i"] for r in out]
    assert len(set(ids)) == 3


def test_create_edge_between_matched(golden, run):
    golden.execute(
        "MATCH (a:Person {name:'Carol'}), (b:Person {name:'Dave'}) "
        "CREATE (a)-[:KNOWS {since: 2024}]->(b)"
    )
    assert run(
        "MATCH (:Person {name:'Carol'})-[r:KNOWS]->(b:Person) "
        "RETURN b.name AS b, r.since AS s"
    ) == [("Dave", 2024)]


def test_create_full_path(golden, run):
    golden.execute("CREATE (:City {name:'Rome'})-[:IN]->(:Country {name:'Italy'})")
    assert run(
        "MATCH (c:City)-[:IN]->(k:Country) RETURN c.name AS c, k.name AS k"
    ) == [("Rome", "Italy")]


def test_set_property(golden, run):
    golden.execute("MATCH (n:Person {name:'Bob'}) SET n.age = 26")
    assert run("MATCH (n:Person {name:'Bob'}) RETURN n.age AS age") == [(26,)]


def test_set_new_property_column(golden, run):
    golden.execute("MATCH (n:Person {name:'Bob'}) SET n.nickname = 'Bobby'")
    assert run(
        "MATCH (n:Person) WHERE n.nickname IS NOT NULL RETURN n.name AS name"
    ) == [("Bob",)]


def test_set_plus_equals_map(golden, run):
    golden.execute("MATCH (n:Person {name:'Bob'}) SET n += {age: 99, extra: 'x'}")
    assert run(
        "MATCH (n:Person {name:'Bob'}) RETURN n.age AS age, n.extra AS e, n.dept AS d"
    ) == [(99, "x", "Sales")]


def test_set_replace_map(golden, run):
    golden.execute("MATCH (n:Person {name:'Bob'}) SET n = {name: 'Bob', age: 1}")
    assert run(
        "MATCH (n:Person {name:'Bob'}) RETURN n.age AS age, n.dept AS dept"
    ) == [(1, None)]


def test_set_label(golden, run):
    golden.execute("MATCH (n:Person) WHERE n.age > 29 SET n:Senior")
    assert run("MATCH (n:Senior) RETURN n.name AS name") == [("Alice",), ("Carol",)]


def test_remove_property(golden, run):
    golden.execute("MATCH (n:Person {name:'Alice'}) REMOVE n.age")
    assert run("MATCH (n:Person {name:'Alice'}) RETURN n.age AS age") == [(None,)]


def test_delete_node(golden, run):
    golden.execute("MATCH (n:Person {name:'Dave'}) DELETE n")
    assert run("MATCH (n:Person) RETURN count(*) AS c") == [(3,)]


def test_detach_delete_removes_edges(golden, run):
    golden.execute("MATCH (n:Person {name:'Bob'}) DETACH DELETE n")
    assert run(
        "MATCH (a:Person)-[:KNOWS]->(b:Person) RETURN a.name AS a, b.name AS b"
    ) == [("Alice", "Carol")]


def test_delete_relationship(golden, run):
    golden.execute("MATCH (:Person)-[r:KNOWS]->(:Person) WHERE r.since = 2015 DELETE r")
    assert run("MATCH (:Person)-[r:KNOWS]->(:Person) RETURN count(*) AS c") == [(2,)]


def test_merge_matches_existing(golden, run):
    golden.execute("MERGE (n:Person {name: 'Alice'}) ON MATCH SET n.seen = 1 ON CREATE SET n.seen = 2")
    assert run("MATCH (n:Person {name:'Alice'}) RETURN n.seen AS s") == [(1,)]
    assert run("MATCH (n:Person) RETURN count(*) AS c") == [(4,)]


def test_merge_creates_missing(golden, run):
    golden.execute("MERGE (n:Person {name: 'Zed'}) ON CREATE SET n.age = 1")
    assert run("MATCH (n:Person {name:'Zed'}) RETURN n.age AS age") == [(1,)]
    assert run("MATCH (n:Person) RETURN count(*) AS c") == [(5,)]


def test_merge_is_idempotent(golden, run):
    golden.execute("MERGE (c:City {name: 'Berlin'})")
    golden.execute("MERGE (c:City {name: 'Berlin'})")
    assert run("MATCH (c:City) RETURN count(*) AS c") == [(1,)]


def test_merge_relationship(golden, run):
    q = (
        "MATCH (a:Person {name:'Alice'}), (b:Person {name:'Bob'}) "
        "MERGE (a)-[r:KNOWS]->(b) ON CREATE SET r.since = 2030"
    )
    golden.execute(q)
    # edge existed (since 2015): ON CREATE must not fire, no duplicate
    assert run(
        "MATCH (:Person {name:'Alice'})-[r:KNOWS]->(:Person {name:'Bob'}) "
        "RETURN count(*) AS c, min(r.since) AS s"
    ) == [(1, 2015)]


def test_foreach_create(golden, run):
    golden.execute("FOREACH (i IN [1,2,3] | CREATE (:Item {n: i}))")
    assert run("MATCH (i:Item) RETURN count(*) AS c") == [(3,)]


def test_unwind_create(golden, run):
    golden.execute("UNWIND ['x','y'] AS v CREATE (:Thing {name: v})")
    assert run("MATCH (t:Thing) RETURN t.name AS n") == [("x",), ("y",)]


def test_create_then_return(run):
    assert run("CREATE (n:Robot {name: 'R2'}) RETURN n.name AS name") == [("R2",)]


def test_rollback_on_error(golden, run):
    import pytest

    with pytest.raises(Exception):
        golden.execute("MATCH (n:Person) SET n.age = bogusfn(n.age)")
    # failed mutation must not leak partial state
    assert run("MATCH (n:Person {name:'Alice'}) RETURN n.age AS age") == [(30,)]


# --------------------------------------------------------------------- #
# round-4: durable commit — parquet snapshot + crash-consistent reload
# --------------------------------------------------------------------- #
def test_durable_commit_kill_and_reload(spark, tmp_path):
    from pycypher_nmetl_spark import CypherEngine, GraphCatalog

    store = str(tmp_path / "store")
    cat = GraphCatalog(spark)
    cat.register_nodes(
        "Person",
        spark.createDataFrame([(1, "Alice"), (2, "Bob")], "id long, name string"),
    )
    cat.register_edges(
        "KNOWS",
        spark.createDataFrame([(100, 1, 2)], "id long, src long, dst long"),
        src_label="Person", dst_label="Person",
    )
    eng = CypherEngine(cat, durable_path=store)
    eng.execute("CREATE (:Person {id: 3, name: 'Carol'})")
    eng.execute("MATCH (p:Person {name: 'Alice'}) SET p.vip = true")

    # "kill": drop every in-memory object and reload from the snapshot
    cat2 = GraphCatalog.load_durable(spark, store)
    eng2 = CypherEngine(cat2)
    assert eng2.execute(
        "MATCH (p:Person) RETURN count(*) AS c"
    ).collect()[0][0] == 3
    assert eng2.execute(
        "MATCH (p:Person {name: 'Alice'}) RETURN p.vip AS v"
    ).collect()[0][0] is True
    assert eng2.execute(
        "MATCH (:Person)-[r:KNOWS]->(:Person) RETURN count(*) AS c"
    ).collect()[0][0] == 1


def test_durable_crash_mid_write_keeps_previous_version(spark, tmp_path):
    import json
    import os

    from pycypher_nmetl_spark import GraphCatalog

    store = str(tmp_path / "store")
    cat = GraphCatalog(spark)
    cat.register_nodes(
        "Only", spark.createDataFrame([(1, "a")], "id long, v string")
    )
    v1 = cat.save_durable(store)
    # simulate a crash mid-write of the NEXT version: tables partially
    # written, manifest absent, _CURRENT never flipped
    os.makedirs(os.path.join(store, "v2", "nodes_Only"), exist_ok=True)
    cat2 = GraphCatalog.load_durable(spark, store)
    assert cat2.nodes("Only").count() == 1
    with open(os.path.join(store, v1, "manifest.json")) as f:
        assert json.load(f)["version"] == v1


def test_durable_versions_pruned(spark, tmp_path):
    import os

    from pycypher_nmetl_spark import GraphCatalog

    store = str(tmp_path / "store")
    cat = GraphCatalog(spark)
    cat.register_nodes(
        "Only", spark.createDataFrame([(1, "a")], "id long, v string")
    )
    for _ in range(4):
        cat.save_durable(store, keep=2)
    versions = sorted(d for d in os.listdir(store) if d.startswith("v"))
    assert versions == ["v3", "v4"]
    assert open(os.path.join(store, "_CURRENT")).read() == "v4"


def test_durable_reload_survives_pruning(spark, tmp_path):
    """Round-5 ADVICE fix: a catalog built via load_durable holds lazy
    plans over the loaded version's files; subsequent durable commits
    must not prune that version out from under them (previously →
    FileNotFoundException after two commits at keep=2)."""
    from pycypher_nmetl_spark import CypherEngine, GraphCatalog

    store = str(tmp_path / "store")
    cat = GraphCatalog(spark)
    cat.register_nodes(
        "Person",
        spark.createDataFrame([(1, "Alice"), (2, "Bob")], "id long, name string"),
    )
    cat.save_durable(store)  # v1

    cat2 = GraphCatalog.load_durable(spark, store)  # plans scan v1
    eng2 = CypherEngine(cat2, durable_path=store)
    # two durable commits at keep=2 prune v1; the unmutated Person
    # table must still be queryable afterwards
    eng2.execute("CREATE (:Person {id: 3, name: 'Carol'})")  # v2
    eng2.execute("CREATE (:Person {id: 4, name: 'Dave'})")   # v3, prunes v1
    import os

    versions = sorted(d for d in os.listdir(store) if d.startswith("v"))
    assert "v1" not in versions
    assert eng2.execute(
        "MATCH (p:Person) RETURN count(*) AS c"
    ).collect()[0][0] == 4


def test_create_auto_id_runs_no_extra_jobs(golden):
    """Auto-id CREATE advances the id base from block arithmetic, not an
    agg(max).collect() — exactly the jobs for the localCheckpoint and
    none after (round-6 verdict item 4). The CREATE runs inside a
    dedicated job group so the count is immune to the statusTracker's
    retained-jobs eviction (global before/after deltas go wrong once the
    session has run > spark.ui.retainedJobs jobs — full-suite flake)."""
    sc = golden.spark.sparkContext

    tracker = sc.statusTracker()
    golden.execute("CREATE (:JobProbe {v: 1})")  # warm the path
    sc.setJobGroup("create-job-probe", "auto-id CREATE job audit")
    try:
        golden.execute("CREATE (:JobProbe {v: 2})")
    finally:
        sc.setJobGroup(None, None)
    jobs = len(tracker.getJobIdsForGroup("create-job-probe") or [])
    # localCheckpoint materialization is the ONLY action an auto-id
    # CREATE runs; the old implementation added a dedicated agg(max)
    # job on top (measured: 2 before the fix, 1 after)
    assert jobs == 1, f"CREATE ran {jobs} jobs; expected exactly 1 (no agg(max) job)"


def test_create_ids_distinct_across_statements_without_agg(golden):
    golden.execute("UNWIND range(1, 5) AS i CREATE (:Probe2 {v: i})")
    golden.execute("UNWIND range(6, 9) AS i CREATE (:Probe2 {v: i})")
    out = golden.execute("MATCH (p:Probe2) RETURN id(p) AS i").collect()
    ids = [r["i"] for r in out]
    assert len(ids) == 9 and len(set(ids)) == 9


# ------------------------------------------------------------------ #
# id-uniqueness invariant (fuzzer-found round-7): the id property IS
# the node identity — a second node with an existing id would silently
# corrupt every downstream join/grouping, so creation rejects it.

def test_create_duplicate_explicit_id_raises(golden):
    import pytest

    golden.execute("CREATE (:Person {id: 900, name: 'Zoe'})")
    with pytest.raises(Exception, match="identity|unique"):
        golden.execute("CREATE (:Person {id: 900, name: 'Other'})")
    # the failed CREATE must not have committed anything
    out = golden.execute(
        "MATCH (n:Person {id: 900}) RETURN n.name AS n"
    ).collect()
    assert [r["n"] for r in out] == ["Zoe"]


def test_merge_create_path_duplicate_id_raises(golden):
    import pytest

    golden.execute("MATCH (n:Person {name: 'Alice'}) SET n.name = 'Renamed'")
    alice_id = golden.execute(
        "MATCH (n:Person {name: 'Renamed'}) RETURN id(n) AS i"
    ).collect()[0]["i"]
    # merge key no longer matches (renamed) -> create path -> would mint
    # a second node with Alice's identity
    with pytest.raises(Exception, match="identity|unique"):
        golden.execute(
            f"MERGE (n:Person {{id: {alice_id}, name: 'Alice'}}) "
            "ON CREATE SET n.age = 1"
        )


def test_create_same_id_fanout_raises(golden):
    import pytest

    # one literal id over a 3-row binding frame = 3 identical new ids
    with pytest.raises(Exception, match="multiple new rows"):
        golden.execute(
            "UNWIND [1, 2, 3] AS i CREATE (:Gadget {id: 42, v: i})"
        )


def test_durable_bucketed_roundtrip_shuffle_free_hop(spark, tmp_path):
    """Round-9: save_durable(buckets=N) writes nodes bucketed by id and
    edges by src; after load_durable the hop join (edges.src = nodes.id)
    must compile with NO Exchange on either side (broadcast disabled to
    force the sort-merge path the bucketing optimizes)."""
    from pycypher_nmetl_spark import CypherEngine, GraphCatalog

    store = str(tmp_path / "store")
    cat = GraphCatalog(spark)
    cat.register_nodes(
        "Person",
        spark.createDataFrame(
            [(i, f"p{i}") for i in range(50)], "id long, name string"
        ),
    )
    cat.register_edges(
        "KNOWS",
        spark.createDataFrame(
            [(1000 + i, i, (i + 1) % 50) for i in range(50)],
            "id long, src long, dst long",
        ),
        src_label="Person", dst_label="Person",
    )
    v = cat.save_durable(store, buckets=4)
    cat2 = GraphCatalog.load_durable(spark, store)

    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = cat2.edges("KNOWS").join(
            cat2.nodes("Person"),
            cat2.edges("KNOWS")["src"] == cat2.nodes("Person")["id"],
        )
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "SortMergeJoin" in plan, plan
        assert "Exchange" not in plan, plan  # bucketing removed both shuffles
        assert joined.count() == 50

        # data correctness through the engine over the reloaded catalog
        eng = CypherEngine(cat2)
        got = eng.execute(
            "MATCH (a:Person)-[:KNOWS]->(b:Person) RETURN count(*) AS c"
        ).collect()[0][0]
        assert got == 50
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)

    # a second save on the reloaded catalog rotates versions and drops
    # the old metastore entries without breaking the frames
    cat2.set_nodes("Person", cat2.nodes("Person"))
    v2 = cat2.save_durable(store, keep=1, buckets=4)
    assert v2 != v
    assert cat2.nodes("Person").count() == 50


def test_durable_bucketed_survives_fresh_session_metastore(spark, tmp_path):
    """The default in-memory metastore forgets table definitions across
    sessions; load_durable must re-issue the CLUSTERED BY DDL. Simulate
    a fresh session by dropping the tables before reloading."""
    from pycypher_nmetl_spark import GraphCatalog

    store = str(tmp_path / "store")
    cat = GraphCatalog(spark)
    cat.register_nodes(
        "Only", spark.createDataFrame([(i, i * 2) for i in range(20)], "id long, v long")
    )
    cat.save_durable(store, buckets=4)
    for t in spark.catalog.listTables():
        if t.name.startswith("durable_"):
            spark.sql(f"DROP TABLE IF EXISTS {t.name}")
    cat2 = GraphCatalog.load_durable(spark, store)
    assert cat2.nodes("Only").count() == 20
    # the re-declared table still carries the bucket spec
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        j = cat2.nodes("Only").alias("a").join(
            cat2.nodes("Only").alias("b"), "id"
        )
        plan = j._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan, plan
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
