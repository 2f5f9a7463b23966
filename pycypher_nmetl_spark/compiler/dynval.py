"""Dynamic (mixed-type) scalar values for openCypher orderability.

Spark columns are mono-typed; Cypher values are not — ``UNWIND [1, 'a']``
is legal, and ``min``/``max``/``ORDER BY`` over the result follow the
openCypher *global sort order* (ascending: … STRING < BOOLEAN < NUMBER,
with null largest). The reference engine gets this for free from its
per-row Python evaluator (reference: comparison_evaluator.py — raw
Python objects); a Spark-first engine needs an explicit encoding.

Heterogeneous values are encoded as a tagged struct::

    struct<__cyr int, __cys string, __cyb boolean,
           __cyd double, __cyl long, __cyt timestamp,
           __cya array<struct<…same scalar slots…>>>

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

Scope: strings, booleans, numbers, temporals (date / datetime), and
null. Numbers normalize to DOUBLE in ``__cyd`` plus an exact-long
CORRECTION in ``__cyl`` (``v - long(double(v))``, 0 for floats): two
numbers compare equal iff numerically equal — including longs beyond
2^53, whose double images collapse — and the (double, correction) pair
orders exactly like the real values because round-to-nearest is
monotone. The only blind spot is |v| within ~2^10 of 2^63, where the
double image saturates past the long range (the correction is clamped
to match Spark's saturating double->long cast). Temporals store in
``__cyt`` (dates cast to midnight timestamps; rank disambiguates
decode). datetime (TimestampType / tz-aware Python values) and
localdatetime (TimestampNTZType / naive Python values) carry distinct
ranks, giving the spec's DATETIME < LOCALDATETIME order; both share the
``__cyt`` slot (NTZ casts are instant-preserving under the engine's UTC
session, and the rank disambiguates decode).

LIST values encode into ``__cya`` (rank ``RANK_LIST``; null elements as
a ``RANK_NULL`` sentinel struct so they sort LAST element-wise): Spark's
native array ordering over the element structs — element-wise, shorter
list first on a common prefix — is exactly openCypher list
orderability, still JVM-side. Nesting is ONE level (Spark schemas
cannot recurse): a mixed list whose list-elements themselves contain
lists or maps is rejected with a clear error. ``=`` between encoded
lists follows equivalence semantics for inner nulls ([1,null]=[1,null]
is true, as in DISTINCT/grouping), a documented divergence from the
ternary ``=`` operator. Maps/entities keep native behavior. Dynamic
columns are decoded back to plain Spark
types at RETURN time (engine._decode_dyn_outputs) when all runtime
values share one rank; truly mixed OUTPUT columns decode per-row to
Python objects at action time (engine.run/collect) and raise only for
callers who demand a typed DataFrame.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql import types as T

# openCypher ascending global sort order (CIP comparability/orderability):
# … LIST < DATETIME < LOCALDATETIME < DATE < STRING < BOOLEAN < NUMBER
# < null. Gaps allow later insertions (maps/entities/paths sort around
# lists in the full spec).
RANK_LIST = 2
RANK_DATETIME = 4
RANK_LOCALDATETIME = 5
RANK_DATE = 6
RANK_STRING = 10
RANK_BOOL = 20
RANK_NUMBER = 30
#: inner-element null sentinel — a LIST element that is Cypher null.
#: openCypher orders null LAST among element comparisons ([1,null] >
#: [1,99]); Spark orders a null struct FIRST inside array comparison,
#: so null elements encode as a real struct with the largest rank.
RANK_NULL = 99

_MARKER = "__cyr"

#: element struct for values INSIDE an encoded list: the same scalar
#: slots, no nested array (one level of list nesting is encodable —
#: Spark schemas cannot recurse)
DYN_ELEM_TYPE = T.StructType(
    [
        T.StructField(_MARKER, T.IntegerType()),
        T.StructField("__cys", T.StringType()),
        T.StructField("__cyb", T.BooleanType()),
        T.StructField("__cyd", T.DoubleType()),
        T.StructField("__cyl", T.LongType()),
        T.StructField("__cyt", T.TimestampType()),
    ]
)

# __cya holds LIST values (rank RANK_LIST; scalar slots null). It is
# the LAST field on purpose: Spark's native struct comparison falls
# through the equal rank and the all-null scalar slots to the array,
# and Spark's array ordering — element-wise, shorter-first on a common
# prefix — over DYN_ELEM_TYPE elements IS openCypher list orderability.
DYN_TYPE = T.StructType(
    list(DYN_ELEM_TYPE.fields)
    + [T.StructField("__cya", T.ArrayType(DYN_ELEM_TYPE))]
)

#: static kinds (compiler/exprs.py vocabulary) encodable as dynamic
ENCODABLE_KINDS = frozenset(
    {
        "string", "bool", "int", "float", "null", "date", "timestamp",
        "timestampntz",
    }
)

_LONG_MAX = (1 << 63) - 1
_LONG_MIN = -(1 << 63)


def is_dyn(dt: T.DataType) -> bool:
    """True when ``dt`` is the dynamic-value struct."""
    return (
        isinstance(dt, T.StructType)
        and len(dt.fields) > 0
        and dt.fields[0].name == _MARKER
    )


def _pack(rank, s, b, d, l=None, t=None, a=None) -> Column:
    return F.struct(
        rank.alias(_MARKER),
        s.alias("__cys"),
        b.alias("__cyb"),
        d.alias("__cyd"),
        (l if l is not None else _NULL_L).alias("__cyl"),
        (t if t is not None else _NULL_T).alias("__cyt"),
        (a if a is not None else _NULL_A).alias("__cya"),
    )


def _pack_elem(rank, s, b, d, l=None, t=None) -> Column:
    return F.struct(
        rank.alias(_MARKER),
        s.alias("__cys"),
        b.alias("__cyb"),
        d.alias("__cyd"),
        (l if l is not None else _NULL_L).alias("__cyl"),
        (t if t is not None else _NULL_T).alias("__cyt"),
    )


_NULL_S = F.lit(None).cast("string")
_NULL_B = F.lit(None).cast("boolean")
_NULL_D = F.lit(None).cast("double")
_NULL_L = F.lit(None).cast("long")
_NULL_T = F.lit(None).cast("timestamp")
_NULL_A = F.lit(None).cast(T.ArrayType(DYN_ELEM_TYPE))


def _num_pack(d: Column, corr: Column) -> Column:
    return _pack(F.lit(RANK_NUMBER), _NULL_S, _NULL_B, d, l=corr)


def encode_kind(col: Column, kind: str) -> Column | None:
    """Encode a mono-typed column of static ``kind`` as a dynamic value
    (null in -> null struct out). None when the kind is not encodable."""
    if kind == "string":
        enc = _pack(F.lit(RANK_STRING), col, _NULL_B, _NULL_D)
    elif kind == "bool":
        enc = _pack(F.lit(RANK_BOOL), _NULL_S, col, _NULL_D)
    elif kind == "int":
        # exact-long correction: double->long cast saturates at the long
        # range (matches the Python-side clamp in encode_py)
        d = col.cast("double")
        enc = _num_pack(d, col.cast("long") - d.cast("long"))
    elif kind == "float":
        enc = _num_pack(col.cast("double"), F.lit(0).cast("long"))
    elif kind == "date":
        enc = _pack(
            F.lit(RANK_DATE), _NULL_S, _NULL_B, _NULL_D,
            t=col.cast("timestamp"),
        )
    elif kind == "timestamp":
        enc = _pack(
            F.lit(RANK_DATETIME), _NULL_S, _NULL_B, _NULL_D,
            t=col.cast("timestamp"),
        )
    elif kind == "timestampntz":
        # localdatetime: its own rank (DATETIME < LOCALDATETIME in the
        # global order); the NTZ->TZ cast is instant-preserving under
        # the engine's UTC session and the rank disambiguates decode
        enc = _pack(
            F.lit(RANK_LOCALDATETIME), _NULL_S, _NULL_B, _NULL_D,
            t=col.cast("timestamp"),
        )
    elif kind == "null":
        return F.lit(None).cast(DYN_TYPE)
    elif kind == "dyn":
        return col
    else:
        return None
    return F.when(col.isNotNull(), enc)


_NULL_ELEM = F.struct(
    F.lit(RANK_NULL).alias(_MARKER),
    _NULL_S.alias("__cys"),
    _NULL_B.alias("__cyb"),
    _NULL_D.alias("__cyd"),
    _NULL_L.alias("__cyl"),
    _NULL_T.alias("__cyt"),
)


def elem_encode(col: Column, kind: str) -> Column | None:
    """Encode one LIST ELEMENT of static ``kind`` as a DYN_ELEM struct.
    Cypher-null elements become the RANK_NULL sentinel (null sorts last
    among elements; a Spark-null struct would sort first). ``kind`` may
    be 'dyn' — a scalar dyn value loses its (always-null) ``__cya`` slot;
    list-ranked dyn elements cannot reach here (nesting is one level,
    enforced by the compiler's encodability check)."""
    if kind == "dyn":
        enc = F.struct(
            col[_MARKER].alias(_MARKER),
            col["__cys"].alias("__cys"),
            col["__cyb"].alias("__cyb"),
            col["__cyd"].alias("__cyd"),
            col["__cyl"].alias("__cyl"),
            col["__cyt"].alias("__cyt"),
        )
    elif kind == "string":
        enc = _pack_elem(F.lit(RANK_STRING), col, _NULL_B, _NULL_D)
    elif kind == "bool":
        enc = _pack_elem(F.lit(RANK_BOOL), _NULL_S, col, _NULL_D)
    elif kind == "int":
        d = col.cast("double")
        enc = _pack_elem(
            F.lit(RANK_NUMBER), _NULL_S, _NULL_B, d,
            l=col.cast("long") - d.cast("long"),
        )
    elif kind == "float":
        enc = _pack_elem(
            F.lit(RANK_NUMBER), _NULL_S, _NULL_B, col.cast("double"),
            l=F.lit(0).cast("long"),
        )
    elif kind == "date":
        enc = _pack_elem(
            F.lit(RANK_DATE), _NULL_S, _NULL_B, _NULL_D,
            t=col.cast("timestamp"),
        )
    elif kind == "timestamp":
        enc = _pack_elem(
            F.lit(RANK_DATETIME), _NULL_S, _NULL_B, _NULL_D,
            t=col.cast("timestamp"),
        )
    elif kind == "timestampntz":
        enc = _pack_elem(
            F.lit(RANK_LOCALDATETIME), _NULL_S, _NULL_B, _NULL_D,
            t=col.cast("timestamp"),
        )
    elif kind == "null":
        return _NULL_ELEM
    else:
        return None
    return F.when(col.isNotNull(), enc).otherwise(_NULL_ELEM)


def encode_array(col: Column, elem_kind: str) -> Column | None:
    """Encode an ``array<scalar>`` / ``array<dyn>`` column as a dynamic
    LIST value (null in -> null struct out). None when the element kind
    is not encodable (nested lists, maps, entities — nesting is one
    level because Spark schemas cannot recurse)."""
    if elem_kind == "null":
        # array<void> (e.g. [null, null]): every element is the sentinel
        enc = _pack(
            F.lit(RANK_LIST), _NULL_S, _NULL_B, _NULL_D,
            a=F.transform(col, lambda _x: _NULL_ELEM),
        )
        return F.when(col.isNotNull(), enc)
    if elem_kind not in ENCODABLE_KINDS and elem_kind != "dyn":
        return None
    enc = _pack(
        F.lit(RANK_LIST), _NULL_S, _NULL_B, _NULL_D,
        a=F.transform(col, lambda x: elem_encode(x, elem_kind)),
    )
    return F.when(col.isNotNull(), enc)


def encode_py(v) -> Column | None:
    """Encode a Python literal as a dynamic value (for IN-list probes)."""
    import datetime as _dt

    if v is None:
        return F.lit(None).cast(DYN_TYPE)
    if isinstance(v, bool):
        return _pack(F.lit(RANK_BOOL), _NULL_S, F.lit(v), _NULL_D)
    if isinstance(v, str):
        return _pack(F.lit(RANK_STRING), F.lit(v), _NULL_B, _NULL_D)
    if isinstance(v, int):
        # mirror encode_kind's saturating correction exactly (Python's
        # int(float(v)) does NOT saturate — clamp to the long range)
        t = max(min(int(float(v)), _LONG_MAX), _LONG_MIN)
        return _num_pack(F.lit(float(v)), F.lit(v - t).cast("long"))
    if isinstance(v, float):
        return _num_pack(F.lit(v), F.lit(0).cast("long"))
    if isinstance(v, _dt.datetime):
        # naive Python datetimes are LOCALDATETIME values (the Neo4j
        # driver mapping); aware ones are zoned DATETIMEs
        rank = RANK_DATETIME if v.tzinfo is not None else RANK_LOCALDATETIME
        return _pack(
            F.lit(rank), _NULL_S, _NULL_B, _NULL_D,
            t=F.lit(v).cast("timestamp"),
        )
    if isinstance(v, _dt.date):
        return _pack(
            F.lit(RANK_DATE), _NULL_S, _NULL_B, _NULL_D,
            t=F.lit(v).cast("timestamp"),
        )
    if isinstance(v, (list, tuple)):
        elems = [_elem_encode_py(x) for x in v]
        if any(e is None for e in elems):
            return None  # nested list / map element: one level only
        return _pack(
            F.lit(RANK_LIST), _NULL_S, _NULL_B, _NULL_D,
            a=F.array(*elems).cast(T.ArrayType(DYN_ELEM_TYPE)),
        )
    return None


def _elem_encode_py(v) -> Column | None:
    """Python literal -> DYN_ELEM struct (None = not an encodable
    element: lists/maps — nesting is one level)."""
    import datetime as _dt

    if v is None:
        return _NULL_ELEM
    if isinstance(v, bool):
        return _pack_elem(F.lit(RANK_BOOL), _NULL_S, F.lit(v), _NULL_D)
    if isinstance(v, str):
        return _pack_elem(F.lit(RANK_STRING), F.lit(v), _NULL_B, _NULL_D)
    if isinstance(v, int):
        t = max(min(int(float(v)), _LONG_MAX), _LONG_MIN)
        return _pack_elem(
            F.lit(RANK_NUMBER), _NULL_S, _NULL_B, F.lit(float(v)),
            l=F.lit(v - t).cast("long"),
        )
    if isinstance(v, float):
        return _pack_elem(
            F.lit(RANK_NUMBER), _NULL_S, _NULL_B, F.lit(v),
            l=F.lit(0).cast("long"),
        )
    if isinstance(v, _dt.datetime):
        rank = RANK_DATETIME if v.tzinfo is not None else RANK_LOCALDATETIME
        return _pack_elem(
            F.lit(rank), _NULL_S, _NULL_B, _NULL_D,
            t=F.lit(v).cast("timestamp"),
        )
    if isinstance(v, _dt.date):
        return _pack_elem(
            F.lit(RANK_DATE), _NULL_S, _NULL_B, _NULL_D,
            t=F.lit(v).cast("timestamp"),
        )
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
    divergence; temporals use the native string cast, matching the
    engine's plain toString). Null in -> null out."""
    d = col["__cyd"]
    as_long = d.try_cast("long")
    num = F.when(
        (d == F.floor(d)) & as_long.isNotNull(),
        (as_long + F.coalesce(col["__cyl"], F.lit(0))).cast("string"),
    ).otherwise(d.cast("string"))
    return (
        F.when(col[_MARKER] == RANK_STRING, col["__cys"])
        .when(
            col[_MARKER] == RANK_BOOL,
            F.when(col["__cyb"], F.lit("true")).otherwise(F.lit("false")),
        )
        .when(col[_MARKER] == RANK_NUMBER, num)
        .when(col[_MARKER] == RANK_DATE, col["__cyt"].cast("date").cast("string"))
        .when(col[_MARKER] == RANK_DATETIME, col["__cyt"].cast("string"))
        .when(
            col[_MARKER] == RANK_LOCALDATETIME,
            col["__cyt"].cast("timestamp_ntz").cast("string"),
        )
    )


def decoded(
    col: Column,
    ranks: set[int],
    integral: bool,
    elem_ranks: set[int] | None = None,
    elem_integral: bool = True,
) -> Column:
    """The plain-typed column for a dynamic column whose runtime values
    all carry one rank (``ranks`` observed, nulls excluded). A LIST
    column additionally needs the observed ELEMENT ranks (RANK_NULL
    excluded) to decode to a typed array; mixed-element lists raise like
    mixed scalar columns (the action-time per-row path handles them)."""
    if not ranks:
        return F.lit(None)
    if ranks == {RANK_STRING}:
        return col["__cys"]
    if ranks == {RANK_BOOL}:
        return col["__cyb"]
    if ranks == {RANK_NUMBER}:
        d = col["__cyd"]
        if integral:
            # exact long: double image + stored correction
            return d.cast("long") + F.coalesce(col["__cyl"], F.lit(0))
        return d
    if ranks == {RANK_DATE}:
        return col["__cyt"].cast("date")
    if ranks == {RANK_DATETIME}:
        return col["__cyt"]
    if ranks == {RANK_LOCALDATETIME}:
        return col["__cyt"].cast("timestamp_ntz")
    if ranks == {RANK_LIST}:
        if elem_ranks is None:
            # caller did not scan element ranks (e.g. array<dyn> decode
            # of collect() output) — punt to the per-row action path
            raise NotImplementedError(
                "list-valued dynamic column requires element-rank "
                "observation to decode; collect()/run() decode per-row"
            )
        er = {r for r in elem_ranks if r != RANK_NULL}
        if len(er) > 1:
            raise NotImplementedError(
                "result column holds lists with elements of multiple "
                f"types (element ranks {sorted(er)}); a DataFrame array "
                "column is mono-typed — collect()/run() decode these "
                "per-row"
            )
        # uniform-element lists decode element-wise via the scalar rule;
        # the RANK_NULL sentinel decodes back to null
        return F.transform(
            col["__cya"],
            lambda e: F.when(
                e[_MARKER] != RANK_NULL,
                decoded(e, er, elem_integral) if er else F.lit(None),
            ),
        )
    raise NotImplementedError(
        "result column holds values of multiple types "
        f"(ranks {sorted(ranks)}); a DataFrame column is mono-typed — "
        "project a single type (e.g. toString(...)) before RETURN"
    )


#: rank -> dyn struct field + Python decoder, for per-row decoding of
#: truly mixed output columns at action time (engine.run/collect)
def decode_py(row_struct):
    """Decode one dyn struct (a pyspark Row or None) to its Python value.

    Numbers come back as int when the double image is integral and a
    correction is stored (exact even beyond 2^53), else float; the
    int/float split at whole floats mirrors `decoded`'s column-level
    integral heuristic applied per value (documented divergence: a
    float-typed 2.0 decodes as 2)."""
    if row_struct is None:
        return None
    rank = row_struct[0]
    if rank == RANK_STRING:
        return row_struct[1]
    if rank == RANK_BOOL:
        return row_struct[2]
    if rank == RANK_NUMBER:
        d = row_struct[3]
        if d is None:
            return None
        corr = row_struct[4] or 0
        if abs(d) < 2**63 and d == int(d):
            return int(d) + corr
        return d
    if rank == RANK_DATE:
        t = row_struct[5]
        return t.date() if t is not None else None
    if rank in (RANK_DATETIME, RANK_LOCALDATETIME):
        # Spark hands both back as naive Python datetimes (session-tz
        # wall clock); the rank records which value type it was
        return row_struct[5]
    if rank == RANK_LIST:
        arr = row_struct[6] if len(row_struct) > 6 else None
        if arr is None:
            return None
        # elements are DYN_ELEM structs; the RANK_NULL sentinel is a
        # Cypher null element
        return [
            None if (e is None or e[0] == RANK_NULL) else decode_py(e)
            for e in arr
        ]
    return None
