"""Dynamic (mixed-type) value encoding — differential fuzz + units.

openCypher global sort order reference implemented in plain Python; the
engine's dynval struct encoding (compiler/dynval.py) must agree on
min/max aggregate orderability for random heterogeneous literal lists,
and on ORDER BY positions probed one slice at a time (a mixed OUTPUT
column is undecodable by design, so positions are observed through
SKIP/LIMIT windows whose single value decodes).
"""

from __future__ import annotations

import math
import random

import pytest

from pycypher_nmetl_spark import CypherEngine, GraphCatalog

RANK = {str: 10, bool: 20, int: 30, float: 30}


def _key(v):
    """openCypher ascending global sort order key (scalars subset)."""
    r = RANK[type(v)]
    if r == 30:
        return (30, float(v), "")
    if r == 20:
        return (20, 1.0 if v else 0.0, "")
    return (10, 0.0, v)


def _cy(v) -> str:
    if v is None:
        return "null"
    if isinstance(v, bool):
        return "true" if v else "false"
    if isinstance(v, str):
        return "'" + v + "'"
    if isinstance(v, float):
        return repr(v)
    return str(v)


@pytest.fixture(scope="module")
def eng(spark):
    cat = GraphCatalog(spark)
    cat.register_nodes(
        "P", spark.createDataFrame([(1,)], "id long")
    )
    return CypherEngine(cat)


def _gen_value(rng: random.Random):
    k = rng.randrange(5)
    if k == 0:
        return rng.randint(-50, 50)
    if k == 1:
        return round(rng.uniform(-50, 50), 3)
    if k == 2:
        return rng.choice(["", "a", "b", "zz", "Ab", "0", "10"])
    if k == 3:
        return rng.choice([True, False])
    return None


def test_minmax_differential_vs_python_reference(eng):
    rng = random.Random(1101)
    for trial in range(40):
        vals = [_gen_value(rng) for _ in range(rng.randint(1, 8))]
        non_null = [v for v in vals if v is not None]
        kinds = {
            "num" if isinstance(v, (int, float)) and not isinstance(v, bool)
            else type(v).__name__
            for v in non_null
        }
        if len(kinds) < 2:
            continue  # homogeneous lists take the native path
        lit = "[" + ", ".join(_cy(v) for v in vals) + "]"
        row = eng.execute(
            f"UNWIND {lit} AS x RETURN min(x) AS mn, max(x) AS mx"
        ).collect()[0]
        want_mn = min(non_null, key=_key)
        want_mx = max(non_null, key=_key)

        def same(got, want):
            if isinstance(want, bool) or isinstance(got, bool):
                return got is want
            if isinstance(want, (int, float)):
                return (
                    isinstance(got, (int, float))
                    and math.isclose(float(got), float(want))
                )
            return got == want

        assert same(row["mn"], want_mn), (trial, vals, row["mn"], want_mn)
        assert same(row["mx"], want_mx), (trial, vals, row["mx"], want_mx)


def test_order_by_positions_differential(eng):
    rng = random.Random(2026)
    for _ in range(6):
        vals = [
            v for v in (_gen_value(rng) for _ in range(6)) if v is not None
        ]
        kinds = {
            "num" if isinstance(v, (int, float)) and not isinstance(v, bool)
            else type(v).__name__
            for v in vals
        }
        if len(kinds) < 2:
            vals += ["pad", 7]  # force heterogeneity
        lit = "[" + ", ".join(_cy(v) for v in vals) + "]"
        expect = sorted(vals, key=_key)
        for i, want in enumerate(expect):
            got = eng.execute(
                f"UNWIND {lit} AS x WITH x ORDER BY x SKIP {i} LIMIT 1 "
                "RETURN x AS v"
            ).collect()[0]["v"]
            if isinstance(want, bool) or isinstance(got, bool):
                assert got is want, (vals, i, got, want)
            elif isinstance(want, (int, float)):
                assert math.isclose(float(got), float(want)), (vals, i, got)
            else:
                assert got == want, (vals, i, got, want)


def test_encode_decode_units(spark):
    from pyspark.sql import functions as F

    from pycypher_nmetl_spark.compiler.dynval import (
        DYN_TYPE, RANK_BOOL, RANK_NUMBER, RANK_STRING, decoded, encode_py,
        is_dyn,
    )

    assert is_dyn(DYN_TYPE)
    df = spark.range(1).select(
        encode_py("a").alias("s"),
        encode_py(True).alias("b"),
        encode_py(2).alias("i"),
        encode_py(2.5).alias("f"),
        encode_py(None).alias("n"),
    )
    row = df.select(
        decoded(F.col("s"), {RANK_STRING}, True).alias("s"),
        decoded(F.col("b"), {RANK_BOOL}, True).alias("b"),
        decoded(F.col("i"), {RANK_NUMBER}, True).alias("i"),
        decoded(F.col("f"), {RANK_NUMBER}, False).alias("f"),
        decoded(F.col("n"), set(), True).alias("n"),
    ).collect()[0]
    assert (row["s"], row["b"], row["i"], row["f"], row["n"]) == (
        "a", True, 2, 2.5, None,
    )
    with pytest.raises(NotImplementedError, match="multiple types"):
        decoded(F.col("s"), {RANK_STRING, RANK_NUMBER}, True)
    # 1 and 1.0 encode identically (cross-numeric equality)
    eq = spark.range(1).select(
        (encode_py(1) == encode_py(1.0)).alias("e")
    ).collect()[0]["e"]
    assert eq is True


def test_homogeneous_lists_stay_native(eng):
    """The hot path must not pay the encoding: a mono-typed literal list
    compiles to a plain Spark array (no __cyr struct in the plan)."""
    df = eng.execute("UNWIND [3, 1, 2] AS x RETURN min(x) AS m")
    assert "__cyr" not in df._jdf.queryExecution().analyzed().toString()
    assert df.collect()[0]["m"] == 1


def test_tostring_over_dynamic_values(eng):
    """toString() rank-dispatches over dynamic values, giving users the
    documented escape hatch for projecting a mixed column."""
    rows = eng.execute(
        "UNWIND [1, 'a', true, 2.5, null] AS x WITH x ORDER BY x "
        "RETURN collect(toString(x)) AS out"
    ).collect()
    # global order: 'a' < true < 1 < 2.5; null dropped by collect
    assert rows[0]["out"] == ["a", "true", "1", "2.5"]
    # native inputs keep the plain cast path
    r = eng.execute(
        "RETURN toString(42) AS a, toString('s') AS b, toString(2.5) AS c"
    ).collect()[0]
    assert (r["a"], r["b"], r["c"]) == ("42", "s", "2.5")


def test_heterogeneous_param_list(eng):
    """A mixed-type list PARAMETER gets the same dynamic encoding as a
    mixed literal: min/max follow global order; homogeneous params keep
    the native path."""
    rows = eng.execute(
        "UNWIND $vals AS x RETURN min(x) AS mn, max(x) AS mx",
        {"vals": [3, "b", True, 1.5]},
    ).collect()
    assert (rows[0]["mn"], rows[0]["mx"]) == ("b", 3)
    rows = eng.execute(
        "RETURN 2 IN $vals AS a, 'b' IN $vals AS b",
        {"vals": [3, "b", 2.0]},
    ).collect()
    assert (rows[0]["a"], rows[0]["b"]) == (True, True)
    # homogeneous param list: native array, native min
    rows = eng.execute(
        "UNWIND $vals AS x RETURN min(x) AS mn", {"vals": [3, 1, 2]}
    ).collect()
    assert rows[0]["mn"] == 1


def test_collect_over_dynamic_decodes(eng):
    """collect() over a dynamic column yields array<dyn>; the RETURN-
    time decode handles array columns too (single runtime rank decodes
    element-wise, mixed raises)."""
    rows = eng.execute(
        "UNWIND [3, 'a', 1] AS x WITH x WHERE x <> 'a' "
        "RETURN collect(x) AS xs"
    ).collect()
    assert sorted(rows[0]["xs"]) == [1, 3]
    rows = eng.execute(
        "UNWIND [1, 'a', 2.5] AS x WITH x WHERE x > 0 "
        "RETURN collect(x) AS xs"
    ).collect()
    assert rows[0]["xs"] == [1.0, 2.5]
    with pytest.raises(NotImplementedError, match="multiple types"):
        eng.execute("UNWIND [3, 'a'] AS x RETURN collect(x) AS xs")


def test_tostring_in_lambda_over_mixed_literal(eng):
    """Code-review r11: toString inside a list comprehension over a
    dyn-encoded literal must decode, not print the struct encoding."""
    rows = eng.execute(
        "RETURN [x IN [1, 'a', true] | toString(x)] AS s"
    ).collect()
    assert rows[0]["s"] == ["1", "a", "true"]


def test_decode_handles_dotted_output_name(eng):
    """Code-review r11: an unaliased dotted output (m.a) holding a
    dynamic value must decode — F.col would parse the dot as a field
    access."""
    rows = eng.execute(
        "UNWIND [1, 'a'] AS x WITH x WHERE x = 1 "
        "WITH {a: x} AS m RETURN m.a"
    ).collect()
    assert [tuple(r) for r in rows] == [(1,)]


def test_simple_case_over_dynamic_operand(eng):
    """Simple CASE routes its operand equality through the comparison
    machinery: a dynamic operand encodes (no analysis crash), and a
    cross-type WHEN is false rather than an error."""
    rows = eng.execute(
        "UNWIND [1, 'a'] AS x RETURN "
        "CASE x WHEN 1 THEN 'one' ELSE 'other' END AS c ORDER BY c"
    ).collect()
    assert [r["c"] for r in rows] == ["one", "other"]
    r = eng.execute(
        "RETURN CASE 'a' WHEN 1 THEN 'num' WHEN 'a' THEN 'str' END AS c"
    ).collect()[0]
    assert r["c"] == "str"
