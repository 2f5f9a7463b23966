"""Dynamic (mixed-type) scalar values for openCypher orderability.

Spark columns are mono-typed; Cypher values are not — ``UNWIND [1, 'a']``
is legal, and ``min``/``max``/``ORDER BY`` over the result follow the
openCypher *global sort order* (ascending: … STRING < BOOLEAN < NUMBER,
with null largest). The reference engine gets this for free from its
per-row Python evaluator (reference: comparison_evaluator.py — raw
Python objects); a Spark-first engine needs an explicit encoding.

Heterogeneous SCALAR values are encoded as a tagged struct::

    struct<__cyr int, __cys string, __cyb boolean, __cyd double>

whose field order makes Spark's native lexicographic struct comparison
EXACTLY the openCypher global sort order — so ``ORDER BY``, ``min``,
``max`` and window sorts work with zero extra machinery, JVM-side, in
whole-stage codegen. The rank field ``__cyr`` doubles as the marker by
which the compiler recognises dynamic columns.

Comparability vs orderability (openCypher CIP): equality across value
types is FALSE (native struct equality gives this — different ranks
never match), while ``<``/``<=``/``>``/``>=`` across value types is
NULL — :func:`dyn_order_cmp` guards the native struct comparison with a
same-rank check.

Scope: strings, booleans, numbers, and null. Numbers normalize to
DOUBLE (so ``1`` and ``1.0`` encode identically, matching Cypher's
cross-numeric equality; longs beyond 2^53 lose precision — documented
divergence). Lists/maps/entities/temporals inside a heterogeneous list
keep today's native-array behavior. Dynamic columns are decoded back to
plain Spark types at RETURN time (engine._decode_dyn_outputs) when all
runtime values share one rank; truly mixed OUTPUT columns raise — a
DataFrame column cannot hold two types.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql import types as T

# openCypher ascending global sort order (CIP comparability/orderability):
# … < STRING < BOOLEAN < NUMBER < null. Gaps allow later insertions
# (temporals sort before strings in the full spec).
RANK_STRING = 10
RANK_BOOL = 20
RANK_NUMBER = 30

_MARKER = "__cyr"

DYN_TYPE = T.StructType(
    [
        T.StructField(_MARKER, T.IntegerType()),
        T.StructField("__cys", T.StringType()),
        T.StructField("__cyb", T.BooleanType()),
        T.StructField("__cyd", T.DoubleType()),
    ]
)

#: static kinds (compiler/exprs.py vocabulary) encodable as dynamic
ENCODABLE_KINDS = frozenset({"string", "bool", "int", "float", "null"})


def is_dyn(dt: T.DataType) -> bool:
    """True when ``dt`` is the dynamic-value struct."""
    return (
        isinstance(dt, T.StructType)
        and len(dt.fields) > 0
        and dt.fields[0].name == _MARKER
    )


def _pack(rank, s, b, d) -> Column:
    return F.struct(
        rank.alias(_MARKER),
        s.alias("__cys"),
        b.alias("__cyb"),
        d.alias("__cyd"),
    )


_NULL_S = F.lit(None).cast("string")
_NULL_B = F.lit(None).cast("boolean")
_NULL_D = F.lit(None).cast("double")


def encode_kind(col: Column, kind: str) -> Column | None:
    """Encode a mono-typed column of static ``kind`` as a dynamic value
    (null in -> null struct out). None when the kind is not encodable."""
    if kind == "string":
        enc = _pack(F.lit(RANK_STRING), col, _NULL_B, _NULL_D)
    elif kind == "bool":
        enc = _pack(F.lit(RANK_BOOL), _NULL_S, col, _NULL_D)
    elif kind in ("int", "float"):
        enc = _pack(F.lit(RANK_NUMBER), _NULL_S, _NULL_B, col.cast("double"))
    elif kind == "null":
        return F.lit(None).cast(DYN_TYPE)
    elif kind == "dyn":
        return col
    else:
        return None
    return F.when(col.isNotNull(), enc)


def encode_py(v) -> Column | None:
    """Encode a Python literal as a dynamic value (for IN-list probes)."""
    if v is None:
        return F.lit(None).cast(DYN_TYPE)
    if isinstance(v, bool):
        return _pack(F.lit(RANK_BOOL), _NULL_S, F.lit(v), _NULL_D)
    if isinstance(v, str):
        return _pack(F.lit(RANK_STRING), F.lit(v), _NULL_B, _NULL_D)
    if isinstance(v, (int, float)):
        return _pack(F.lit(RANK_NUMBER), _NULL_S, _NULL_B, F.lit(float(v)))
    return None


def dyn_order_cmp(op: str, left: Column, right: Column) -> Column:
    """``<``/``<=``/``>``/``>=`` between two dynamic values: typed
    comparison within one rank, NULL across ranks (openCypher
    comparability), null-propagating."""
    ops = {
        "<": lambda a, b: a < b,
        "<=": lambda a, b: a <= b,
        ">": lambda a, b: a > b,
        ">=": lambda a, b: a >= b,
    }
    same = left[_MARKER] == right[_MARKER]  # null-propagating
    return F.when(same, ops[op](left, right))


def dyn_to_string(col: Column) -> Column:
    """toString() over a dynamic value: rank-dispatched formatting
    (strings pass through, booleans print true/false, numbers print
    without a trailing .0 when integral — ints lose their int-ness in
    the double-normalized encoding, so 2.0 also prints '2'; documented
    divergence). Null in -> null out."""
    d = col["__cyd"]
    as_long = d.try_cast("long")
    num = F.when(
        (d == F.floor(d)) & as_long.isNotNull(), as_long.cast("string")
    ).otherwise(d.cast("string"))
    return (
        F.when(col[_MARKER] == RANK_STRING, col["__cys"])
        .when(
            col[_MARKER] == RANK_BOOL,
            F.when(col["__cyb"], F.lit("true")).otherwise(F.lit("false")),
        )
        .when(col[_MARKER] == RANK_NUMBER, num)
    )


def decoded(col: Column, ranks: set[int], integral: bool) -> Column:
    """The plain-typed column for a dynamic column whose runtime values
    all carry one rank (``ranks`` observed, nulls excluded)."""
    if not ranks:
        return F.lit(None)
    if ranks == {RANK_STRING}:
        return col["__cys"]
    if ranks == {RANK_BOOL}:
        return col["__cyb"]
    if ranks == {RANK_NUMBER}:
        d = col["__cyd"]
        return d.cast("long") if integral else d
    raise NotImplementedError(
        "result column holds values of multiple types "
        f"(ranks {sorted(ranks)}); a DataFrame column is mono-typed — "
        "project a single type (e.g. toString(...)) before RETURN"
    )
