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
