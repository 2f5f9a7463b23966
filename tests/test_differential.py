"""Property-based differential testing: random expressions evaluated by
the Spark engine must match DuckDB evaluating the translated SQL.

This is the reference's backend-equivalence oracle strategy
(SURVEY.md §5: test_backend_equivalence_comprehensive.py) applied to
expression semantics: one generator produces each expression in BOTH
Cypher and DuckDB SQL, encoding the documented semantic differences
(Cypher integer `/` truncates toward zero; `^` is float pow; `+` on
strings concatenates).
"""

from __future__ import annotations

import math

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

# Slow tier (VERDICT r12 #1): bulk campaign — deselected by default,
# runs under SPARK_GRAFT_FULL_SUITE=1 / -m slow.
pytestmark = pytest.mark.slow



class E:
    """Expression as (cypher_text, sql_text, kind) with kind in
    {'int','float','str','bool'}."""

    def __init__(self, cy: str, sql: str, kind: str):
        self.cy, self.sql, self.kind = cy, sql, kind


@st.composite
def exprs(draw, depth: int = 0) -> E:
    if depth >= 3:
        choice = "leaf"
    else:
        choice = draw(
            st.sampled_from(["leaf", "leaf", "arith", "cmp", "case", "fn", "bool"])
        )
    if choice == "leaf":
        which = draw(st.sampled_from(["int", "float", "str", "bool", "null_int"]))
        if which == "int":
            v = draw(st.integers(min_value=-1000, max_value=1000))
            return E(str(v), str(v), "int")
        if which == "float":
            v = draw(
                st.floats(
                    min_value=-1000, max_value=1000,
                    allow_nan=False, allow_infinity=False,
                )
            )
            s = repr(round(v, 6))
            return E(s, s, "float")
        if which == "str":
            v = draw(st.text(alphabet="abcXYZ 09", min_size=0, max_size=8))
            quoted = "'" + v.replace("'", "''") + "'"
            return E(quoted, quoted, "str")
        if which == "bool":
            v = draw(st.booleans())
            return E(str(v).lower(), str(v).lower(), "bool")
        return E("null", "NULL", "int")
    if choice == "arith":
        a = draw(exprs(depth + 1))
        b = draw(exprs(depth + 1))
        if a.kind == "str" or b.kind == "str":
            # `+` concatenates; any other operator on strings is skipped.
            # float->string rendering is formatter-defined and diverges
            # (Spark/Neo4j '1.0E-5' vs DuckDB '1e-05'), so only compare
            # int/str concatenation
            if a.kind == "float" or b.kind == "float":
                return a if a.kind == "str" else b
            return E(
                f"({a.cy} + {b.cy})",
                f"(CAST({a.sql} AS VARCHAR) || CAST({b.sql} AS VARCHAR))",
                "str",
            )
        op = draw(st.sampled_from(["+", "-", "*", "/", "%"]))
        if a.kind == "bool" or b.kind == "bool":
            return a
        if op == "/":
            if a.kind == "int" and b.kind == "int":
                # Cypher: trunc-toward-zero integer division; /0 raises in
                # both engines, so guard with nullIf on both sides
                return E(
                    f"({a.cy} / nullIf({b.cy}, 0))",
                    f"CASE WHEN ({b.sql}) = 0 THEN NULL ELSE "
                    f"CAST(TRUNC(CAST({a.sql} AS DOUBLE) / ({b.sql})) AS BIGINT) END",
                    "int",
                )
            return E(
                f"({a.cy} / nullIf({b.cy}, 0))",
                f"(CAST({a.sql} AS DOUBLE) / nullif({b.sql}, 0))",
                "float",
            )
        if op == "%":
            if not (a.kind == "int" and b.kind == "int"):
                return a
            return E(
                f"({a.cy} % nullIf({b.cy}, 0))",
                f"({a.sql} % nullif({b.sql}, 0))",
                "int",
            )
        kind = "float" if "float" in (a.kind, b.kind) else "int"
        return E(f"({a.cy} {op} {b.cy})", f"({a.sql} {op} {b.sql})", kind)
    if choice == "cmp":
        a = draw(exprs(depth + 1))
        b = draw(exprs(depth + 1))
        numeric = ("int", "float")
        comparable = (a.kind == b.kind) or (a.kind in numeric and b.kind in numeric)
        if not comparable:
            return E(f"({a.cy} IS NULL)", f"({a.sql} IS NULL)", "bool")
        op = draw(st.sampled_from(["=", "<>", "<", "<=", ">", ">="]))
        sql_op = "!=" if op == "<>" else op
        return E(f"({a.cy} {op} {b.cy})", f"({a.sql} {sql_op} {b.sql})", "bool")
    if choice == "bool":
        a = draw(exprs(depth + 1))
        b = draw(exprs(depth + 1))
        if a.kind != "bool" or b.kind != "bool":
            return E(f"({a.cy} IS NOT NULL)", f"({a.sql} IS NOT NULL)", "bool")
        op = draw(st.sampled_from(["AND", "OR"]))
        return E(f"({a.cy} {op} {b.cy})", f"({a.sql} {op} {b.sql})", "bool")
    if choice == "case":
        c = draw(exprs(depth + 1))
        t = draw(exprs(depth + 1))
        cond = (
            E(f"({c.cy} IS NULL)", f"({c.sql} IS NULL)", "bool")
            if c.kind != "bool"
            else c
        )
        return E(
            f"(CASE WHEN {cond.cy} THEN {t.cy} ELSE {t.cy} END)",
            f"(CASE WHEN {cond.sql} THEN {t.sql} ELSE {t.sql} END)",
            t.kind,
        )
    # fn
    a = draw(exprs(depth + 1))
    if a.kind == "str":
        fn = draw(st.sampled_from(["toUpper", "toLower", "trim", "reverse", "size"]))
        sql = {
            "toUpper": f"upper({a.sql})", "toLower": f"lower({a.sql})",
            "trim": f"trim({a.sql})", "reverse": f"reverse({a.sql})",
            "size": f"length({a.sql})",
        }[fn]
        return E(f"{fn}({a.cy})", sql, "int" if fn == "size" else "str")
    if a.kind in ("int", "float"):
        fn = draw(st.sampled_from(["abs", "sign", "coalesce"]))
        if fn == "coalesce":
            return E(f"coalesce({a.cy}, 0)", f"coalesce({a.sql}, 0)", a.kind)
        if fn == "sign":
            return E(f"sign({a.cy})", f"CAST(sign({a.sql}) AS BIGINT)", "int")
        return E(f"{fn}({a.cy})", f"{fn}({a.sql})", a.kind)
    return a


def _norm(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return float(f"{v:.9g}")
    if isinstance(v, str):
        # negative-zero rendering is formatter-dependent (Spark/Neo4j emit
        # "-0.0" in string contexts, DuckDB emits "0.0"); canonicalize
        return v.replace("-0.0", "0.0")
    try:
        import decimal

        if isinstance(v, decimal.Decimal):
            return float(f"{float(v):.9g}")
    except Exception:  # noqa: BLE001
        pass
    return v


@settings(
    max_examples=30,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.data_too_large],
)
@given(st.lists(exprs(), min_size=1, max_size=6))
def test_expressions_match_duckdb(spark_and_duck, batch):
    spark_engine, duck = spark_and_duck
    cy = ", ".join(f"{e.cy} AS x{i}" for i, e in enumerate(batch))
    sql = ", ".join(f"{e.sql} AS x{i}" for i, e in enumerate(batch))
    got = spark_engine.execute(f"RETURN {cy}").collect()[0]
    want = duck.execute(f"SELECT {sql}").fetchone()
    for i in range(len(batch)):
        g, w = _norm(got[i]), _norm(want[i])
        if isinstance(g, float) and isinstance(w, float):
            assert g == pytest.approx(w, rel=1e-9, abs=1e-9), batch[i].cy
        else:
            assert g == w, f"{batch[i].cy}: spark={g!r} duckdb={w!r}"


@pytest.fixture(scope="module")
def spark_and_duck(spark):
    import duckdb

    from pycypher_nmetl_spark import CypherEngine, GraphCatalog

    cat = GraphCatalog(spark)
    cat.register_nodes("X", spark.createDataFrame([(1,)], "id long"))
    return CypherEngine(cat), duckdb.connect()
