"""Result cache: LRU + TTL + epoch invalidation (reference: result_cache.py)."""

from pycypher_nmetl_spark import CypherEngine, GraphCatalog
from pycypher_nmetl_spark.cache import ResultCache, cache_key


def test_cache_hit_and_epoch_invalidation(spark):
    cat = GraphCatalog(spark)
    cat.register_nodes("P", spark.createDataFrame([(1, "a")], "id long, name string"))
    eng = CypherEngine(cat)
    df1 = eng.execute("MATCH (n:P) RETURN n.name AS name")
    df2 = eng.execute("MATCH (n:P) RETURN n.name AS name")
    # a hit serves a fresh select("*") wrapper (never the stored object —
    # a once-cancelled Dataset would stay poisoned), so identity is NOT
    # expected; the hit counter and identical results are the contract
    assert eng.cache.hits == 1
    assert df2.collect() == df1.collect()
    eng.execute("CREATE (:P {id: 2, name: 'b'})")
    df3 = eng.execute("MATCH (n:P) RETURN n.name AS name")
    assert eng.cache.hits == 1  # epoch bumped by the committed mutation
    assert df3.count() == 2


def test_nondeterministic_not_cached():
    assert cache_key("RETURN rand() AS r", None) is None
    assert cache_key("RETURN randomUUID() AS u", None) is None
    assert cache_key("RETURN 1 AS x", None) is not None


def test_params_distinguish_entries():
    assert cache_key("RETURN $x AS x", {"x": 1}) != cache_key("RETURN $x AS x", {"x": 2})


def test_lru_eviction_and_ttl():
    c = ResultCache(max_entries=2, ttl_seconds=1000)
    c.put(("a",), 1, 0)
    c.put(("b",), 2, 0)
    c.put(("c",), 3, 0)  # evicts ("a",)
    assert c.get(("a",), 0) is None
    assert c.get(("b",), 0) == 2
    assert c.get(("b",), 1) is None  # wrong epoch
