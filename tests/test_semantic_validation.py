"""Pre-execution semantic validation (reference: semantic_validator.py,
tests/test_semantic_validator.py + test_semantic_validator_fixes.py).

Mirrors the reference's test cases: undefined-variable detection with
defined-variable listing and did-you-mean hints, WITH scope shadowing,
CREATE/MERGE/UNWIND variable definition, mixed-aggregation warnings,
ORDER BY alias resolution, syntax-error wrapping — plus the repo's
aggregation-in-WHERE error and the no-Spark-job guarantee for invalid
queries.
"""

from __future__ import annotations

import pytest

from pycypher_nmetl_spark.semantic import (
    ErrorSeverity, SemanticValidationError, SemanticValidator, VariableScope,
    validate_query,
)


def errors_of(findings):
    return [f for f in findings if f.severity is ErrorSeverity.ERROR]


def warnings_of(findings):
    return [f for f in findings if f.severity is ErrorSeverity.WARNING]


# ===================================================================== #
# VariableScope unit tests (reference TestVariableScope)
# ===================================================================== #
def test_define_and_check_variable():
    s = VariableScope()
    s.define("n")
    assert s.is_defined("n") and not s.is_defined("m")


def test_nested_scopes():
    parent = VariableScope()
    parent.define("a")
    child = parent.create_child_scope()
    child.define("b")
    assert child.is_defined("a") and child.is_defined("b")
    assert not parent.is_defined("b")


def test_undefined_variables():
    s = VariableScope()
    s.define("n")
    s.use("n")
    s.use("m")
    assert s.get_undefined_vars() == {"m"}


# ===================================================================== #
# Undefined variable detection (reference TestUndefinedVariables)
# ===================================================================== #
def test_simple_undefined_variable():
    errs = errors_of(validate_query("MATCH (n:Person) RETURN m"))
    assert errs and any("'m'" in e.message and "not defined" in e.message for e in errs)


def test_all_variables_defined():
    assert errors_of(validate_query("MATCH (n:Person) RETURN n")) == []


def test_multiple_undefined_variables():
    msgs = [e.message for e in errors_of(validate_query("MATCH (n:Person) RETURN m, k, p"))]
    for var in ("'m'", "'k'", "'p'"):
        assert any(var in m for m in msgs)


def test_undefined_in_where_clause():
    errs = errors_of(validate_query("MATCH (n:Person) WHERE m.age > 30 RETURN n"))
    assert any("'m'" in e.message for e in errs)


def test_relationship_variable_defined():
    assert errors_of(validate_query("MATCH (a)-[r:KNOWS]->(b) RETURN a, r, b")) == []


def test_undefined_relationship_variable():
    errs = errors_of(validate_query("MATCH (a)-[:KNOWS]->(b) RETURN r"))
    assert any("'r'" in e.message for e in errs)


def test_error_lists_defined_variables_and_hint():
    errs = errors_of(validate_query("MATCH (node1:Person) RETURN node2"))
    assert len(errs) == 1
    msg = errs[0].message
    assert "Defined variables: node1" in msg
    assert "Did you mean 'node1'?" in msg  # close-match hint


# ===================================================================== #
# WITH clause scoping (reference TestWithClauseScope)
# ===================================================================== #
def test_with_clause_introduces_new_scope():
    assert errors_of(validate_query(
        "MATCH (n:Person) WITH n.name AS name RETURN name")) == []


def test_with_clause_shadows_variables():
    errs = errors_of(validate_query("MATCH (n) WITH n AS m RETURN n"))
    assert any("'n'" in e.message for e in errs)


def test_with_clause_multiple_variables():
    assert errors_of(validate_query(
        "MATCH (a)-[r]->(b) WITH a, b, r.since AS s RETURN a, b, s")) == []


def test_with_clause_passthrough_variable():
    assert errors_of(validate_query("MATCH (n) WITH n RETURN n")) == []


# ===================================================================== #
# CREATE / MERGE / UNWIND definitions (reference TestCreateMergeUnwind)
# ===================================================================== #
def test_create_defines_variables():
    assert errors_of(validate_query("CREATE (n:Person {name: 'X'}) RETURN n")) == []


def test_merge_defines_variables():
    assert errors_of(validate_query("MERGE (n:Person {name: 'X'}) RETURN n")) == []


def test_create_multiple_nodes():
    assert errors_of(validate_query("CREATE (a:X), (b:Y) RETURN a, b")) == []


def test_create_with_relationship():
    assert errors_of(validate_query(
        "MATCH (a:Person), (b:Person) CREATE (a)-[r:KNOWS]->(b) RETURN r")) == []


def test_unwind_defines_variable():
    assert errors_of(validate_query("UNWIND [1, 2, 3] AS x RETURN x")) == []


def test_unwind_with_match():
    assert errors_of(validate_query(
        "MATCH (n:Person) UNWIND n.tags AS tag RETURN n, tag")) == []


def test_multiple_unwind_clauses():
    assert errors_of(validate_query(
        "UNWIND [1, 2] AS a UNWIND [3, 4] AS b RETURN a, b")) == []


# ===================================================================== #
# Aggregation rules (reference TestAggregationRules)
# ===================================================================== #
def test_pure_aggregation_is_valid():
    f = validate_query("MATCH (n:Person) RETURN count(n)")
    assert errors_of(f) == [] and warnings_of(f) == []


def test_mixed_aggregation_warning():
    w = warnings_of(validate_query("MATCH (n:Person) RETURN n.dept, count(n)"))
    assert any("implicit grouping" in x.message for x in w)


def test_multiple_aggregations_valid():
    f = validate_query("MATCH (n:Person) RETURN count(n), avg(n.age), max(n.age)")
    assert errors_of(f) == [] and warnings_of(f) == []


@pytest.mark.parametrize("fn", ["stdev", "stdevp", "percentileCont", "percentileDisc"])
def test_statistical_fns_recognised_as_aggregation(fn):
    arg = "n.age" if fn.startswith("stdev") else "n.age, 0.5"
    w = warnings_of(validate_query(f"MATCH (n:Person) RETURN n.dept, {fn}({arg})"))
    assert any("implicit grouping" in x.message for x in w)


def test_aggregation_in_where_is_error():
    errs = errors_of(validate_query("MATCH (n:Person) WHERE count(n) > 1 RETURN n"))
    assert any("Invalid use of aggregating function count()" in e.message for e in errs)


def test_aggregation_in_with_where_is_error():
    errs = errors_of(validate_query(
        "MATCH (n:Person) WITH n WHERE sum(n.age) > 10 RETURN n"))
    assert any("sum()" in e.message for e in errs)


def test_aggregated_alias_in_with_where_is_fine():
    assert errors_of(validate_query(
        "MATCH (n:Person) WITH n.dept AS d, count(*) AS c WHERE c > 1 RETURN d, c")) == []


# ===================================================================== #
# Complex queries (reference TestComplexQueries)
# ===================================================================== #
def test_complex_valid_query():
    assert errors_of(validate_query(
        "MATCH (a:Person)-[r:KNOWS]->(b:Person) WHERE a.age > 25 "
        "WITH a, count(b) AS friends WHERE friends > 1 "
        "RETURN a.name, friends ORDER BY friends DESC")) == []


def test_complex_query_with_error():
    errs = errors_of(validate_query(
        "MATCH (a:Person)-[:KNOWS]->(b) WITH a.name AS name RETURN name, b"))
    assert any("'b'" in e.message for e in errs)


def test_multiple_match_clauses():
    assert errors_of(validate_query(
        "MATCH (a:Person) MATCH (b:Company) RETURN a, b")) == []


def test_create_then_match():
    assert errors_of(validate_query(
        "CREATE (a:Person {name: 'X'}) WITH a MATCH (b:Person) RETURN a, b")) == []


# ===================================================================== #
# Edge cases (reference TestEdgeCases + _fixes)
# ===================================================================== #
def test_anonymous_node_pattern():
    assert errors_of(validate_query("MATCH (:Person)-[:KNOWS]->(n) RETURN n")) == []


def test_return_star():
    assert errors_of(validate_query("MATCH (n:Person) RETURN *")) == []


def test_property_in_where():
    assert errors_of(validate_query(
        "MATCH (n:Person) WHERE n.age > 30 AND n.name STARTS WITH 'A' RETURN n")) == []


def test_match_with_property_predicate_no_false_positive():
    assert errors_of(validate_query(
        "MATCH (n:Person {name: 'Alice', age: 30}) RETURN n")) == []


def test_order_by_return_alias_no_error():
    assert errors_of(validate_query(
        "MATCH (n:Person) RETURN n.name AS name ORDER BY name")) == []


def test_order_by_multiple_aliases():
    assert errors_of(validate_query(
        "MATCH (n) RETURN n.name AS a, n.age AS b ORDER BY a ASC, b DESC")) == []


def test_order_by_input_variable_no_error():
    assert errors_of(validate_query(
        "MATCH (n:Person) RETURN n.name AS name ORDER BY n.age")) == []


def test_order_by_undefined_is_error():
    errs = errors_of(validate_query(
        "MATCH (n:Person) RETURN n.name AS name ORDER BY zz.age"))
    assert any("'zz'" in e.message for e in errs)


def test_comprehension_binders_not_undefined():
    assert errors_of(validate_query(
        "MATCH (n) RETURN [x IN [1,2] WHERE x > 1 | x * 2] AS l, "
        "reduce(acc = 0, y IN [1,2] | acc + y) AS r, "
        "all(z IN [1,2] WHERE z > 0) AS q")) == []


def test_comprehension_leaking_var_is_error():
    errs = errors_of(validate_query("MATCH (n) RETURN [x IN [1,2] | x] AS l, x"))
    assert any("'x'" in e.message for e in errs)


def test_pattern_comprehension_binds_inner_vars():
    assert errors_of(validate_query(
        "MATCH (a:Person) RETURN [(a)-[:KNOWS]->(b) | b.name] AS names")) == []


def test_exists_subpattern_binds_inner_vars():
    assert errors_of(validate_query(
        "MATCH (n) WHERE exists((n)-[:KNOWS]->(:Person)) RETURN n")) == []


def test_map_projection_uses_var():
    errs = errors_of(validate_query("MATCH (n) RETURN q{.name} AS m"))
    assert any("'q'" in e.message for e in errs)


def test_foreach_scope_does_not_leak():
    errs = errors_of(validate_query(
        "MATCH (n) FOREACH (x IN [1,2] | SET n.v = x) RETURN x"))
    assert any("'x'" in e.message for e in errs)


def test_call_yield_defines_variables():
    assert errors_of(validate_query("CALL db.labels() YIELD label RETURN label")) == []


def test_unknown_function_warning_with_hint():
    # the tokenizer lowercases function names, so the finding reports
    # the canonical lower-case form with the close-match hint
    w = warnings_of(validate_query("MATCH (n) RETURN toUper(n.name) AS x"))
    assert any("touper" in x.message and "Did you mean 'toupper'?" in x.message
               for x in w)


def test_union_branches_validated_independently():
    errs = errors_of(validate_query(
        "MATCH (n:Person) RETURN n.name AS x UNION MATCH (m:Company) RETURN q AS x"))
    assert any("'q'" in e.message for e in errs)


# ===================================================================== #
# validate_query wrapper (reference TestValidateQueryFunction)
# ===================================================================== #
def test_validate_query_with_error():
    assert len(errors_of(validate_query("MATCH (n) RETURN undefined_var"))) > 0


def test_validate_query_valid():
    assert errors_of(validate_query("MATCH (n:Person) RETURN n.name")) == []


def test_validate_query_syntax_error():
    errs = validate_query("MATCH (n:Person RETURN n")  # missing paren
    assert len(errs) == 1 and errs[0].message.startswith("Syntax error:")
    assert errs[0].severity is ErrorSeverity.ERROR


def test_validation_error_str_format():
    from pycypher_nmetl_spark.semantic import ValidationError

    e = ValidationError(ErrorSeverity.ERROR, "boom", line=3, column=7)
    assert str(e) == "Line 3:7 - ERROR: boom"
    assert str(ValidationError(ErrorSeverity.WARNING, "hm")) == "WARNING: hm"


# ===================================================================== #
# Engine integration: errors raise BEFORE any Spark job
# ===================================================================== #
def test_engine_raises_semantic_error(golden):
    with pytest.raises(SemanticValidationError, match="Variable 'm'"):
        golden.execute("MATCH (n:Person) RETURN m")


def test_engine_exposes_warnings(golden):
    golden.execute("MATCH (n:Person) RETURN n.dept AS d, count(*) AS c")
    assert any("implicit grouping" in str(w)
               for w in golden.last_validation_warnings)


def test_invalid_query_launches_no_spark_job(golden):
    sc = golden.spark.sparkContext
    tracker = sc.statusTracker()
    before = len(tracker.getJobIdsForGroup(None) or [])
    for q in (
        "MATCH (n:Person) RETURN nope",
        "MATCH (n:Person) WHERE max(n.age) > 1 RETURN n",
        "MATCH (n) WITH n AS m RETURN n",
    ):
        with pytest.raises(SemanticValidationError):
            golden.execute(q)
    after = len(tracker.getJobIdsForGroup(None) or [])
    assert after == before, "invalid queries must not launch Spark jobs"


def test_custom_registered_function_not_warned(golden):
    from pyspark.sql import functions as F

    golden.register_function("myfn", lambda cc, args: F.upper(cc.col(args[0])))
    golden.execute("MATCH (n:Person) RETURN myfn(n.name) AS x")
    assert not any("Unknown function" in str(w)
                   for w in golden.last_validation_warnings)
