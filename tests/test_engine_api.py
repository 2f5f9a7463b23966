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
