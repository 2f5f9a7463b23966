"""Dynamic LIST values — openCypher global orderability over columns
mixing lists with scalars (and lists with conflicting element types).

Reference parity: the reference's pandas engine evaluates per-row Python
objects, so ``UNWIND [[1,2],'a'] AS x ORDER BY x`` works implicitly
(comparison_evaluator.py); here lists encode into the dyn struct's
``__cya`` slot (compiler/dynval.py) and Spark's NATIVE array-of-struct
comparison provides the element-wise list order, JVM-side.

The differential oracle is a pure-Python implementation of the
openCypher ascending global sort order (CIP comparability/orderability):
LIST < DATE-TIMES < STRING < BOOLEAN < NUMBER < null, lists element-wise
with null elements LAST and shorter-prefix first.
"""

from __future__ import annotations

import random

import pytest

from pycypher_nmetl_spark import CypherEngine, GraphCatalog

# ---------------------------------------------------------------------- #
# pure-Python global-order model (scalars + temporals + one-level lists)
# openCypher ascending: LIST(2) < LOCALDATETIME(5) < DATE(6) <
# STRING(10) < BOOLEAN(20) < NUMBER(30) < null(99)
# (engine-constructed datetimes are LOCAL values — scalar.py stores NTZ)
# ---------------------------------------------------------------------- #
import datetime as _dt


def _rank(v) -> int:
    if isinstance(v, bool):
        return 20
    if isinstance(v, (int, float)):
        return 30
    if isinstance(v, str):
        return 10
    if isinstance(v, _dt.datetime):
        return 5
    if isinstance(v, _dt.date):
        return 6
    raise TypeError(type(v))


def _scalar_key(v):
    r = _rank(v)
    if r == 30:
        return (30, float(v), "")
    if r == 20:
        return (20, 1.0 if v else 0.0, "")
    if r == 10:
        return (10, 0.0, v)
    if r == 5:
        return (5, v.timestamp(), "")
    return (6, _dt.datetime(v.year, v.month, v.day).timestamp(), "")


def _elem_key(v):
    if v is None:
        return (99, 0.0, "")
    return _scalar_key(v)


def _key(v):
    """Sort key; position 1 only compares within one rank, where shapes
    agree (scalars carry a (num, str) pair, lists a tuple of elem keys)."""
    if isinstance(v, list):
        return (2, tuple(_elem_key(e) for e in v))
    r, a, b = _scalar_key(v)
    return (r, (a, b))


def _cy(v) -> str:
    if v is None:
        return "null"
    if isinstance(v, bool):
        return "true" if v else "false"
    if isinstance(v, str):
        return "'" + v + "'"
    if isinstance(v, float):
        return repr(v)
    if isinstance(v, list):
        return "[" + ", ".join(_cy(e) for e in v) + "]"
    if isinstance(v, _dt.datetime):
        return f"localdatetime('{v.isoformat()}')"
    if isinstance(v, _dt.date):
        return f"date('{v.isoformat()}')"
    return str(v)


@pytest.fixture(scope="module")
def eng(spark):
    cat = GraphCatalog(spark)
    cat.register_nodes("P", spark.createDataFrame([(1,)], "id long"))
    return CypherEngine(cat)


def _gen_scalar(rng: random.Random):
    k = rng.randrange(6)
    if k == 0:
        return rng.randint(-9, 9)
    if k == 1:
        return round(rng.uniform(-9, 9), 2)
    if k == 2:
        return rng.choice(["", "a", "b", "zz", "0"])
    if k == 3:
        return _dt.date(2020, rng.randint(1, 12), rng.randint(1, 28))
    if k == 4:
        return _dt.datetime(2020, 1, 1, rng.randint(0, 23), rng.randint(0, 59))
    return rng.choice([True, False])


def _gen_value(rng: random.Random):
    k = rng.randrange(6)
    if k <= 1:  # list (incl. empty / null elements)
        n = rng.randint(0, 3)
        return [
            None if rng.random() < 0.2 else _gen_scalar(rng)
            for _ in range(n)
        ]
    if k == 5:
        return None
    return _gen_scalar(rng)


# ---------------------------------------------------------------------- #
# differential: full ORDER BY sequence vs the Python model (run()
# decodes mixed columns per-row, so positions are observed directly)
# ---------------------------------------------------------------------- #
def test_order_by_differential_vs_python_model(eng):
    rng = random.Random(1201)
    for trial in range(30):
        vals = [_gen_value(rng) for _ in range(rng.randint(2, 8))]
        kinds = {
            "list" if isinstance(v, list) else type(v).__name__
            for v in vals
            if v is not None
        }
        if len(kinds) < 2:
            continue  # homogeneous: native path, covered elsewhere
        q = f"UNWIND {_cy(vals)} AS x RETURN x ORDER BY x"
        got = [r.x for r in eng.run(q)]
        nn = sorted((v for v in vals if v is not None), key=_key)
        want = nn + [None] * (len(vals) - len(nn))
        assert got == want, f"trial {trial}: {q}\n got {got}\nwant {want}"


def test_min_max_over_mixed_with_lists(eng):
    rows = eng.run("UNWIND [[1,2],'a',3,[0]] AS x RETURN min(x) AS mn, max(x) AS mx")
    assert rows[0].mn == [0] and rows[0].mx == 3


# ---------------------------------------------------------------------- #
# ordering units
# ---------------------------------------------------------------------- #
def test_list_order_units(eng):
    got = [
        r.x
        for r in eng.run(
            "UNWIND [[1,2],'a',3,[1,null],[1,99],true,[1,'x'],[],2.5] AS x "
            "RETURN x ORDER BY x"
        )
    ]
    # element-wise: 'x' (rank 10) < 2 (rank 30) < null elem (last);
    # [] is the shortest prefix of everything
    assert got == [[], [1, "x"], [1, 2], [1, 99], [1, None], "a", True, 2.5, 3]


def test_lists_only_conflicting_elements(eng):
    got = [
        r.x
        for r in eng.run(
            "UNWIND [[1,2],[1,'a'],[1,99]] AS x RETURN x ORDER BY x"
        )
    ]
    assert got == [[1, "a"], [1, 2], [1, 99]]


def test_homogeneous_lists_stay_native(eng):
    df = eng.execute("UNWIND [[1,2],[3,4]] AS x RETURN x")
    from pyspark.sql import types as T

    dt = df.schema["x"].dataType
    assert isinstance(dt, T.ArrayType) and isinstance(
        dt.elementType, T.IntegralType
    )


def test_numeric_widening_lists_stay_native(eng):
    df = eng.execute("UNWIND [[1,2],[3.5]] AS x RETURN x")
    from pyspark.sql import types as T

    dt = df.schema["x"].dataType
    assert isinstance(dt, T.ArrayType) and isinstance(
        dt.elementType, T.DoubleType
    )


# ---------------------------------------------------------------------- #
# comparison / IN semantics
# ---------------------------------------------------------------------- #
def test_eq_filter_picks_list(eng):
    rows = eng.run(
        "UNWIND [[1,2],[3,4],'a'] AS x WITH x WHERE x = [1,2] RETURN x"
    )
    assert [r.x for r in rows] == [[1, 2]]


def test_eq_numeric_coercion_inside_list(eng):
    rows = eng.run(
        "UNWIND [[1,2],'a'] AS x WITH x WHERE x = [1.0, 2.0] RETURN x"
    )
    assert [r.x for r in rows] == [[1, 2]]


def test_cross_rank_ordering_is_null(eng):
    rows = eng.run(
        "UNWIND [[1,2],'a'] AS x RETURN x < 'zzz' AS lt ORDER BY lt"
    )
    # list < string is incomparable -> null; 'a' < 'zzz' -> true
    assert sorted((r.lt for r in rows), key=lambda v: (v is None, v)) == [
        True,
        None,
    ]


def test_in_with_list_items(eng):
    rows = eng.run(
        "RETURN [1,2] IN [[1,2],'a'] AS hit, [9] IN [[1,2],'a'] AS miss"
    )
    assert rows[0].hit is True and rows[0].miss is False


def test_tostring_lambda_over_mixed_with_list(eng):
    rows = eng.run("RETURN [x IN [[1,2],'a'] | toString(x)] AS s")
    # toString over a LIST value is undefined in Cypher -> null
    assert rows[0].s == [None, "a"]


# ---------------------------------------------------------------------- #
# params / decode paths
# ---------------------------------------------------------------------- #
def test_param_mixing_lists_and_scalars(eng):
    rows = eng.run(
        "UNWIND $p AS x RETURN x ORDER BY x",
        {"p": [[1, 2], "a", 3, [1, None]]},
    )
    assert [r.x for r in rows] == [[1, 2], [1, None], "a", 3]


def test_uniform_list_decode_is_typed(eng):
    # after filtering away the scalar, remaining values are all lists of
    # ints: execute() decodes to a plain typed array column
    df = eng.execute(
        "UNWIND [[1,2],'a',[3]] AS x WITH x WHERE NOT x = 'a' RETURN x"
    )
    from pyspark.sql import types as T

    dt = df.schema["x"].dataType
    assert isinstance(dt, T.ArrayType) and not isinstance(
        dt.elementType, T.StructType
    )
    assert sorted(r.x for r in df.collect()) == [[1, 2], [3]]


def test_mixed_element_lists_decode_per_row(eng):
    rows = eng.run(
        "UNWIND [[1,'a'],[2],'s'] AS x WITH x WHERE NOT x = 's' RETURN x "
        "ORDER BY x"
    )
    assert [r.x for r in rows] == [[1, "a"], [2]]


def test_execute_raises_on_truly_mixed(eng):
    with pytest.raises(NotImplementedError, match="mono-typed"):
        eng.execute("UNWIND [[1,2],'a'] AS x RETURN x").collect()


def test_nested_deeper_is_a_clear_error(eng):
    with pytest.raises(Exception, match="deeper nesting|not orderable"):
        eng.run("UNWIND [[[1]],'a'] AS x RETURN x")


def test_null_only_list_elements(eng):
    rows = eng.run("UNWIND [[null],'a'] AS x RETURN x ORDER BY x")
    assert [r.x for r in rows] == [[None], "a"]


def test_valuetype_rank_dispatches_over_dyn(eng):
    rows = eng.run(
        "UNWIND [[1,2],'a',3,2.5,true,date('2020-01-01'),"
        "localdatetime('2020-01-01T00:00:00'),null] AS x "
        "RETURN valueType(x) AS t"
    )
    assert [r.t for r in rows] == [
        "LIST", "STRING", "INTEGER", "FLOAT", "BOOLEAN", "DATE",
        "LOCAL DATETIME", "NULL",
    ]
