"""Engine API surface: validate, pandas UDFs, job groups, execute_many."""

import pandas as pd
import pytest
from pyspark.sql import types as T


def test_validate_ok(golden):
    assert golden.validate("MATCH (n:Person) RETURN n.name AS x") == []


def test_validate_syntax_error(golden):
    errs = golden.validate("MATCH (n:Person RETURN n")
    assert len(errs) == 1 and errs[0].startswith("syntax:")


def test_validate_unknown_label(golden):
    errs = golden.validate("MATCH (n:Nope) RETURN n")
    assert len(errs) == 1 and "Nope" in errs[0]


def test_validate_undefined_variable(golden):
    errs = golden.validate("MATCH (n:Person) RETURN m.name AS x")
    assert len(errs) == 1 and "'m'" in errs[0]


def test_validate_mutation_rolls_back(golden, run):
    assert golden.validate("CREATE (:Person {id: 77, name: 'Ghost'})") == []
    assert run("MATCH (n:Person) RETURN count(*) AS c") == [(4,)]


def test_register_pandas_function(golden):
    golden.register_pandas_function(
        "slugify",
        lambda s: s.str.lower().str.replace(" ", "-"),
        T.StringType(),
    )
    out = golden.execute("RETURN slugify('Hello World') AS s").collect()
    assert out[0]["s"] == "hello-world"


def test_job_group_context(golden):
    with golden.job_group("test-group"):
        out = golden.execute("MATCH (n:Person) RETURN count(*) AS c").collect()
    assert out[0]["c"] == 4
    golden.cancel("test-group")  # no-op after completion, must not raise


def test_execute_many_orders_dependencies(golden):
    results = golden.execute_many(
        [
            "MATCH (s:Tagged) RETURN count(*) AS c",
            "MATCH (n:Person) WHERE n.age > 26 SET n:Tagged",
        ]
    )
    assert results[0].collect()[0]["c"] == 3


def test_compile_report(golden):
    golden.execute("MATCH (n:Person) WHERE n.age > 1 RETURN n.name AS x")
    names = [c for c, _ in golden.last_compile_report]
    assert names == ["Match", "Projection"]


def test_health_server(golden):
    import json as _json
    import urllib.request

    from pycypher_nmetl_spark.health import HealthServer

    srv = HealthServer(golden).start()
    try:
        with urllib.request.urlopen(f"http://127.0.0.1:{srv.port}/health") as r:
            body = _json.loads(r.read())
        assert body["status"] == "ok" and body["labels"] == 2
        with urllib.request.urlopen(f"http://127.0.0.1:{srv.port}/metrics") as r:
            text = r.read().decode()
        assert "result_cache_hits" in text and "catalog_labels 2" in text
    finally:
        srv.stop()


def test_query_http_endpoint(golden):
    import json as _json
    import urllib.error
    import urllib.request

    from pycypher_nmetl_spark.health import HealthServer

    srv = HealthServer(golden).start()

    def post(payload, expect_error=False):
        req = urllib.request.Request(
            f"http://127.0.0.1:{srv.port}/query",
            data=_json.dumps(payload).encode(),
            headers={"Content-Type": "application/json"},
            method="POST",
        )
        try:
            with urllib.request.urlopen(req) as r:
                return r.status, _json.loads(r.read())
        except urllib.error.HTTPError as e:
            return e.code, _json.loads(e.read())

    try:
        code, doc = post({
            "cypher": "MATCH (p:Person) RETURN p.name AS name ORDER BY name",
        })
        assert code == 200
        assert doc["columns"] == ["name"]
        assert [r[0] for r in doc["rows"]] == ["Alice", "Bob", "Carol", "Dave"]

        code, doc = post({
            "cypher": "MATCH (p:Person) RETURN p.name AS n ORDER BY n",
            "limit": 2,
        })
        assert code == 200 and len(doc["rows"]) == 2

        # mutations rejected by default on the HTTP surface
        code, doc = post({"cypher": "CREATE (:Person {id: 99})"})
        assert code == 403 and "disabled" in doc["error"]

        # errors come back as JSON, not a dead connection
        code, doc = post({"cypher": "MATCH (x RETURN"})
        assert code == 400 and "error" in doc
        code, doc = post({"nope": 1})
        assert code == 400
    finally:
        srv.stop()


def test_query_http_endpoint_mutations_opt_in(golden):
    import json as _json
    import urllib.request

    from pycypher_nmetl_spark.health import HealthServer

    srv = HealthServer(golden, allow_mutations=True).start()
    try:
        req = urllib.request.Request(
            f"http://127.0.0.1:{srv.port}/query",
            data=_json.dumps({"cypher": "CREATE (:Person {id: 99, name: 'Zed'})"}).encode(),
            method="POST",
        )
        with urllib.request.urlopen(req) as r:
            assert r.status == 200
        assert (
            golden.execute(
                "MATCH (p:Person {name: 'Zed'}) RETURN count(*) AS c"
            ).collect()[0]["c"] == 1
        )
    finally:
        srv.stop()
