"""Cypher scalar function registry -> pyspark.sql.functions builders.

Inventory per SURVEY.md §2.8 (reference:
packages/pycypher/src/pycypher/scalar_functions/__init__.py:190-1083).
Every function stays JVM-side (built-in functions / expr compositions);
only `normalize` needs a pandas UDF, gated lazily.

Registry entry signature: fn(cc, args_ast) -> Column, where ``cc`` is the
ExprCompiler (gives access to .col(ast), .bindings, .lit helpers).
Cypher semantics preserved explicitly where Spark differs:
  * substring/indexOf/charAt are 0-based (Spark is 1-based);
  * toInteger('3.7') truncates via double, never errors (try_cast);
  * range(a, b) is inclusive;
  * list index via try_element_at so out-of-bounds -> null (ANSI-safe).
"""

from __future__ import annotations

import math

from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql import types as T

SCALAR_FUNCTIONS: dict[str, object] = {}

# Aggregates are handled by the projection planner, not here; this set is
# the detection list (reference: aggregation_evaluator.py:163-196).
AGGREGATE_FUNCTIONS = {
    "count", "sum", "avg", "min", "max", "collect", "stdev", "stdevp",
    "percentilecont", "percentiledisc", "approxcountdistinct",
    "approxpercentile", "approxpercentilecont", "approxpercentiledisc",
}


def register(name: str):
    def deco(fn):
        SCALAR_FUNCTIONS[name.lower()] = fn
        return fn

    return deco


def simple(name: str, builder, min_args: int = 1, max_args: int | None = None):
    """Register a function that only needs its compiled arg Columns."""
    mx = min_args if max_args is None else max_args

    def fn(cc, args):
        if not (min_args <= len(args) <= mx):
            raise ValueError(f"{name}() takes {min_args}..{mx} args, got {len(args)}")
        return builder(*[cc.col(a) for a in args])

    SCALAR_FUNCTIONS[name.lower()] = fn
    return fn


# ---------------------------------------------------------------------- #
# string functions
# ---------------------------------------------------------------------- #
simple("toUpper", F.upper)
simple("upper", F.upper)
simple("toLower", F.lower)
simple("lower", F.lower)
simple("trim", F.trim)
simple("ltrim", F.ltrim)
simple("rtrim", F.rtrim)
simple("reverse", F.reverse)  # works for strings and arrays
simple("left", lambda s, n: F.substring(s, 1, n), 2, 2)
simple("right", lambda s, n: s.substr(F.length(s) - n + 1, n), 2, 2)
simple("replace", F.replace, 3, 3)
@register("split")
def _split_fn(cc, args):
    """split(s, delim) — reference parity (extended_string_functions.py
    _split -> pandas str.split): a literal 1-char delimiter splits
    LITERALLY (split('a.b', '.') -> ['a','b'], not regex-everything),
    longer delimiters are regexes. Non-literal delimiter expressions
    keep Spark's regex semantics (documented)."""
    import re as _re

    from pycypher_nmetl_spark.cypher.ast_nodes import Literal

    if len(args) != 2:
        raise ValueError(f"split() takes 2 args, got {len(args)}")
    s = cc.col(args[0])
    d = args[1]
    if isinstance(d, Literal) and isinstance(d.value, str) and len(d.value) == 1:
        return F.split(s, _re.escape(d.value))
    return F.split(s, cc.col(d))


def _join_fn(cc, args):
    from pycypher_nmetl_spark.cypher.ast_nodes import Literal

    arr = cc.col(args[0])
    if len(args) == 1:
        return F.array_join(arr, "")
    if isinstance(args[1], Literal):
        return F.array_join(arr, str(args[1].value))
    sep = cc.col(args[1])  # dynamic separator: left fold
    rest = F.slice(arr, 2, F.greatest(F.size(arr) - 1, F.lit(0)))
    return F.when(F.size(arr) == 0, F.lit("")).otherwise(
        F.aggregate(
            rest,
            F.element_at(arr, 1).cast("string"),
            lambda acc, x: F.concat(acc, sep, x.cast("string")),
        )
    )


SCALAR_FUNCTIONS["join"] = _join_fn
simple("lpad", lambda s, n, p=None: F.lpad(s, n, p if p is not None else " "), 2, 3)
simple("rpad", lambda s, n, p=None: F.rpad(s, n, p if p is not None else " "), 2, 3)
simple("repeat", F.repeat, 2, 2)
simple("btrim", lambda s, t=None: F.btrim(s, t) if t is not None else F.btrim(s), 1, 2)
simple("char", lambda c: F.char(c), 1, 1)
simple("charCodeAt", lambda s, i=None: F.ascii(F.substring(s, (i if i is not None else F.lit(0)) + F.lit(1), 1)), 1, 2)
simple("charAt", lambda s, i: F.substring(s, i + F.lit(1), 1), 2, 2)
simple("startsWith", lambda s, p: s.startswith(p), 2, 2)
simple("endsWith", lambda s, p: s.endswith(p), 2, 2)
simple("contains", lambda s, p: s.contains(p), 2, 2)
simple("byteSize", F.octet_length)
simple("toStringOrNull", lambda x: x.try_cast("string"))


@register("length")
def _length(cc, args):
    # length(path) -> hop count; length(string) -> chars; length(list) -> size
    from pycypher_nmetl_spark.cypher.ast_nodes import Var

    if len(args) == 1 and isinstance(args[0], Var):
        info = cc.bindings.vars.get(args[0].name)
        if info and info.kind == "path":
            return F.col(f"{args[0].name}__length")
    col = cc.col(args[0])
    dt = cc.bindings.dtype(col)
    if isinstance(dt, T.ArrayType):
        return F.size(col)
    return F.length(col)


@register("nodes")
def _nodes_fn(cc, args):
    """nodes(path) -> list of the path's node ids, traversal order.
    Compile-time array of the bound node-id columns; variable-length
    paths never materialize interior nodes, so they raise."""
    from pycypher_nmetl_spark.cypher.ast_nodes import Var

    if len(args) == 1 and isinstance(args[0], Var):
        info = cc.bindings.vars.get(args[0].name)
        if info and info.kind == "path":
            if info.path_dropped:
                raise ValueError(
                    "nodes(): the path's pattern variables did not survive "
                    "an aggregating/DISTINCT WITH; project the node "
                    "variables through the WITH alongside the path"
                )
            if not info.path_nodes:
                raise ValueError(
                    "nodes() over a variable-length path is not supported "
                    "(interior nodes are never materialized); use "
                    "length(p) or the relationship collection variable"
                )
            missing = [
                v for v in info.path_nodes if v not in cc.bindings.df.columns
            ]
            if missing:
                raise ValueError(
                    f"nodes(): endpoint variable(s) {missing} were collapsed "
                    "out of the plan; name and reference them in the pattern"
                )
            return F.array(*[F.col(v) for v in info.path_nodes])
    raise ValueError("nodes() takes a bound path variable")


@register("relationships")
def _relationships_fn(cc, args):
    """relationships(path) -> list of the path's relationship ids.
    Fixed segments contribute singleton arrays, variable-length
    segments contribute their already-bound edge-id arrays; one
    concat, all JVM-side."""
    from pycypher_nmetl_spark.cypher.ast_nodes import Var

    if len(args) == 1 and isinstance(args[0], Var):
        info = cc.bindings.vars.get(args[0].name)
        if info and info.kind == "path":
            if info.path_dropped:
                raise ValueError(
                    "relationships(): the path's pattern variables did not "
                    "survive an aggregating/DISTINCT WITH; project the "
                    "relationship variables through the WITH alongside the "
                    "path"
                )
            if not info.path_rels:
                return F.array().cast("array<long>")
            parts = []
            for rv in info.path_rels:
                col = F.col(rv)
                dt = cc.bindings.dtype(col)
                parts.append(col if isinstance(dt, T.ArrayType) else F.array(col))
            return parts[0] if len(parts) == 1 else F.concat(*parts)
    raise ValueError("relationships() takes a bound path variable")


@register("size")
def _size(cc, args):
    col = cc.col(args[0])
    dt = cc.bindings.dtype(col)
    if isinstance(dt, (T.ArrayType, T.MapType)):
        return F.size(col)
    return F.length(col)


@register("substring")
def _substring(cc, args):
    s = cc.col(args[0])
    start = cc.col(args[1]) + F.lit(1)  # Cypher 0-based
    if len(args) > 2:
        return F.substring(s, start, cc.col(args[2]))
    return F.substring(s, start, F.lit(2147483647))


@register("indexOf")
def _index_of(cc, args):
    s, sub = cc.col(args[0]), cc.col(args[1])
    return F.instr(s, sub) - F.lit(1)  # 0-based, -1 when absent


@register("isEmpty")
def _is_empty(cc, args):
    col = cc.col(args[0])
    dt = cc.bindings.dtype(col)
    if isinstance(dt, (T.ArrayType, T.MapType)):
        return F.size(col) == 0
    return F.length(col) == 0


@register("normalize")
def _normalize(cc, args):
    import pandas as pd  # noqa: F401

    form_ast = args[1] if len(args) > 1 else None
    form = "NFC"
    from pycypher_nmetl_spark.cypher.ast_nodes import Literal

    if isinstance(form_ast, Literal):
        form = str(form_ast.value)

    @F.pandas_udf(T.StringType())
    def _norm(s):
        import unicodedata

        return s.map(lambda v: unicodedata.normalize(form, v) if v is not None else None)

    return _norm(cc.col(args[0]))


# ---------------------------------------------------------------------- #
# math functions (reference: scalar_functions/math_functions.py)
# ---------------------------------------------------------------------- #
simple("abs", F.abs)
simple("ceil", F.ceil)
simple("floor", F.floor)
simple("sign", lambda x: F.signum(x).cast("long"))  # Cypher sign() is INTEGER
simple("sqrt", F.sqrt)
simple("cbrt", F.cbrt)
simple("exp", F.exp)
simple("log", F.log)
simple("log10", F.log10)
simple("log2", F.log2)
simple("sin", F.sin)
simple("cos", F.cos)
simple("tan", F.tan)
simple("cot", F.cot)
simple("asin", F.asin)
simple("acos", F.acos)
simple("atan", F.atan)
simple("atan2", F.atan2, 2, 2)
simple("sinh", F.sinh)
simple("cosh", F.cosh)
simple("tanh", F.tanh)
simple("degrees", F.degrees)
simple("radians", F.radians)
simple("hypot", F.hypot, 2, 2)
simple("fmod", lambda a, b: a % b, 2, 2)
simple("pow", F.pow, 2, 2)
simple("bitAnd", lambda a, b: a.bitwiseAND(b), 2, 2)
simple("bitOr", lambda a, b: a.bitwiseOR(b), 2, 2)
simple("bitXor", lambda a, b: a.bitwiseXOR(b), 2, 2)
simple("bitNot", F.bitwise_not)
simple("bitShiftLeft", F.shiftleft, 2, 2)
simple("bitShiftRight", F.shiftright, 2, 2)
simple(
    "haversin",
    lambda x: (F.lit(1.0) - F.cos(x)) / F.lit(2.0),
)
simple("isNaN", F.isnan)


@register("pi")
def _pi(cc, args):
    return F.lit(math.pi)


@register("e")
def _e(cc, args):
    return F.lit(math.e)


@register("rand")
def _rand(cc, args):
    return F.rand()


@register("gcd")
def _gcd(cc, args):
    a, b = cc.col(args[0]).cast("long"), cc.col(args[1]).cast("long")
    # Euclid unrolled via expr: Spark lacks gcd; 64 iterations cover int64
    x, y = F.abs(a), F.abs(b)
    for _ in range(63):
        x, y = F.when(y == 0, x).otherwise(y), F.when(y == 0, F.lit(0)).otherwise(x % y)
    return x


@register("lcm")
def _lcm(cc, args):
    a, b = cc.col(args[0]).cast("long"), cc.col(args[1]).cast("long")
    g = SCALAR_FUNCTIONS["gcd"](cc, args)
    return F.when((a == 0) | (b == 0), F.lit(0)).otherwise(F.abs(a * b) / g).cast("long")


@register("round")
def _round(cc, args):
    from pycypher_nmetl_spark.cypher.ast_nodes import Literal

    x = cc.col(args[0])
    if len(args) == 1:
        return F.round(x, 0)
    prec = cc.col(args[1])
    mode = args[2].value if len(args) > 2 and isinstance(args[2], Literal) else "HALF_UP"
    s = F.pow(F.lit(10.0), prec)
    ax = F.abs(x) * s
    sg = F.when(x < 0, F.lit(-1.0)).otherwise(F.lit(1.0))
    if mode == "HALF_UP":
        return sg * F.floor(ax + 0.5) / s
    if mode == "HALF_DOWN":
        return sg * F.ceil(ax - 0.5) / s
    if mode == "HALF_EVEN":
        from pycypher_nmetl_spark.cypher.ast_nodes import Literal as _L

        if isinstance(args[1], _L):
            return F.bround(x, int(args[1].value))
        return F.bround(x * s) / s
    if mode == "UP":
        return sg * F.ceil(ax) / s
    if mode == "DOWN":
        return sg * F.floor(ax) / s
    if mode == "CEILING":
        return F.ceil(x * s) / s
    if mode == "FLOOR":
        return F.floor(x * s) / s
    raise ValueError(f"unknown rounding mode {mode!r}")


# ---------------------------------------------------------------------- #
# list functions (reference: scalar_functions/list_functions.py)
# ---------------------------------------------------------------------- #
simple("head", lambda xs: F.try_element_at(xs, F.lit(1)))
simple("last", lambda xs: F.try_element_at(xs, F.lit(-1)))
simple("tail", lambda xs: F.slice(xs, 2, F.greatest(F.size(xs) - 1, F.lit(0))))
simple("sort", F.sort_array)
simple("flatten", F.flatten)
simple("toStringList", lambda xs: F.transform(xs, lambda x: x.try_cast("string")))
simple("toIntegerList", lambda xs: F.transform(xs, lambda x: x.try_cast("double").cast("long")))
simple("toFloatList", lambda xs: F.transform(xs, lambda x: x.try_cast("double")))
simple("toBooleanList", lambda xs: F.transform(xs, lambda x: x.try_cast("boolean")))


@register("range")
def _range(cc, args):
    start, end = cc.col(args[0]).cast("long"), cc.col(args[1]).cast("long")
    step = cc.col(args[2]).cast("long") if len(args) > 2 else F.lit(1).cast("long")
    # Cypher range() returns [] when the step points away from the end
    # (range(3, 2) -> []); Spark's sequence() throws on such boundaries.
    empty = F.array().cast("array<long>")
    return (
        F.when((step > 0) & (start > end), empty)
        .when((step < 0) & (start < end), empty)
        .otherwise(F.sequence(start, end, step))
    )


@register("toList")
def _to_list(cc, args):
    col = cc.col(args[0])
    dt = cc.bindings.dtype(col)
    if isinstance(dt, T.ArrayType):
        return col
    return F.array(col)


# ---------------------------------------------------------------------- #
# conversion functions (reference: scalar_functions/conversion_functions.py)
# ---------------------------------------------------------------------- #
def _to_integer(x: Column) -> Column:
    return x.try_cast("double").cast("long")


@register("toString")
def _to_string_fn(cc, args):
    """toString(x): native string cast, except dynamic (mixed-type)
    values which rank-dispatch through dyn_to_string — a struct cast
    would print the encoding, not the value. Static kinds decide for
    free; only an unknown kind pays one analyzer probe."""
    if len(args) != 1:
        raise ValueError(f"toString() takes 1 arg, got {len(args)}")
    c = cc.col(args[0])
    from pycypher_nmetl_spark.compiler.dynval import dyn_to_string, is_dyn
    from pycypher_nmetl_spark.cypher.ast_nodes import Var as _Var

    if cc.lambda_vars:
        # inside a lambda the frame can't be probed; the tracked lambda
        # kind decides (a dyn-encoded list's elements report 'dyn')
        k = None
        if isinstance(args[0], _Var):
            k = cc.lambda_kinds.get(args[0].name)
        return dyn_to_string(c) if k == "dyn" else c.cast("string")
    k = cc._static_kind(args[0])
    if k == "dyn":
        return dyn_to_string(c)
    if k is None:
        try:
            if is_dyn(cc.bindings.dtype(c)):
                return dyn_to_string(c)
        except Exception:  # noqa: BLE001 — unanalyzable: native cast
            pass
    return c.cast("string")
simple("toInteger", _to_integer)
simple("toIntegerOrNull", _to_integer)
simple("toFloat", lambda x: x.try_cast("double"))
simple("toFloatOrNull", lambda x: x.try_cast("double"))
simple("toBoolean", lambda x: x.try_cast("boolean"))
simple("toBooleanOrNull", lambda x: x.try_cast("boolean"))
# reference aliases (scalar_functions/__init__.py:253-310)
simple("str", lambda x: x.cast("string"))
simple("int", _to_integer)
simple("float", lambda x: x.try_cast("double"))
simple("bool", lambda x: x.try_cast("boolean"))
SCALAR_FUNCTIONS["len"] = SCALAR_FUNCTIONS["size"]


# ---------------------------------------------------------------------- #
# temporal functions (reference: scalar_functions/temporal_functions.py)
# ---------------------------------------------------------------------- #
@register("date")
def _date(cc, args):
    if not args:
        return F.current_date()
    return cc.col(args[0]).cast("date")


# an explicit zone suffix (Z / +05:00 / -0800 / +05) can only follow a
# time-of-day component, so requiring `T<h>:<m>` before the suffix keeps
# date-only strings like '2020-01-01' (which end in `-01`) naive.
_ZONED_INPUT_RE = r"[Tt ]\d{1,2}:\d{2}.*(?:[Zz]|[+-]\d{2}(?::?\d{2})?)$"


def _parse_ntz(cc, arg):
    """Parse a datetime argument to TIMESTAMP_NTZ, instant-preserving.

    Naive strings parse as wall-clock via to_timestamp_ntz. Strings with
    an explicit offset/zone suffix go through to_timestamp (which honors
    the offset) and cast to NTZ under the pinned UTC session zone — so
    datetime('2020-01-01T00:00:00+05:00') yields the UTC instant
    2019-12-31T19:00, matching the reference's datetime.fromisoformat
    semantics (reference temporal_functions.py), not a silent
    offset-drop. Non-string inputs (already temporal) convert directly.
    """
    col = cc.col(arg)
    dt = cc.bindings.dtype(col)
    if dt is not None and not isinstance(dt, T.StringType):
        return F.to_timestamp_ntz(col)
    s = col.cast("string")
    return F.when(
        s.rlike(_ZONED_INPUT_RE), F.to_timestamp(s).cast("timestamp_ntz")
    ).otherwise(F.to_timestamp_ntz(s))


@register("datetime")
def _datetime(cc, args):
    """datetime() compiles to TIMESTAMP_NTZ, not TIMESTAMP: NTZ's
    fromInternal is epoch+timedelta arithmetic, so year-1 values (the
    millennium/century truncate floor, reference x001 convention)
    survive collect(); TimestampType's datetime.fromtimestamp raises
    "year 0 is out of range" there. DuckDB's naive TIMESTAMP oracle
    matches NTZ exactly, and the sessions pin timeZone=UTC so the
    current-time no-arg forms agree across both types.

    Documented divergence: because storage is NTZ, zone-bearing inputs
    are normalized to their UTC instant (instant-preserving — see
    _parse_ntz) and valueType() reports LOCAL DATETIME rather than
    ZONED DATETIME for the result.
    """
    if not args:
        return F.localtimestamp()
    return _parse_ntz(cc, args[0])


@register("localdatetime")
def _localdatetime(cc, args):
    if not args:
        return F.localtimestamp()
    return _parse_ntz(cc, args[0])


@register("localdate")
def _localdate(cc, args):
    if not args:
        return F.current_date()
    return cc.col(args[0]).cast("date")


@register("localtime")
def _localtime(cc, args):
    if not args:
        return F.date_format(F.localtimestamp(), "HH:mm:ss.SSS")
    return F.date_format(F.to_timestamp_ntz(cc.col(args[0])), "HH:mm:ss.SSS")


@register("timestamp")
def _timestamp(cc, args):
    return (F.unix_timestamp(F.current_timestamp()) * 1000).cast("long")


@register("now")
def _now(cc, args):
    """now() — epoch-ms alias for timestamp()
    (reference: scalar_functions/__init__.py:252-260)."""
    return _timestamp(cc, args)


_DATE_TRUNC_UNITS = {
    "millennium", "century", "decade", "year", "quarter", "month", "week", "day",
}
_DATETIME_TRUNC_UNITS = _DATE_TRUNC_UNITS | {"hour", "minute", "second"}


def _epoch_start_date(unit: str, d):
    """Start-of-era date for the multi-year units (reference
    temporal_functions.py:472-482: Neo4j's millennium containing 2024
    starts at 2001, the century at 2001, the decade at 2020)."""
    y = F.extract(F.lit("year"), d).cast("long")
    if unit == "decade":
        start = y - (y % 10)
    elif unit == "century":
        start = F.floor((y - 1) / 100).cast("long") * 100 + 1
    else:  # millennium
        start = F.floor((y - 1) / 1000).cast("long") * 1000 + 1
    return F.make_date(start.cast("int"), F.lit(1), F.lit(1))


@register("date.truncate")
def _date_truncate(cc, args):
    from pycypher_nmetl_spark.cypher.ast_nodes import Literal

    unit = (args[0].value if isinstance(args[0], Literal) else "day").lower()
    if unit not in _DATE_TRUNC_UNITS:
        raise ValueError(
            f"Unknown truncation unit for date.truncate: {unit!r}. "
            f"Valid units: {sorted(_DATE_TRUNC_UNITS)}"
        )
    d = cc.col(args[1]).cast("date")
    if unit in ("millennium", "century", "decade"):
        return F.when(d.isNull(), F.lit(None).cast("date")).otherwise(
            _epoch_start_date(unit, d)
        )
    if unit == "day":
        return d  # no-op for plain dates (Spark's trunc lacks 'day')
    return F.trunc(d, unit)


@register("datetime.truncate")
def _datetime_truncate(cc, args):
    from pycypher_nmetl_spark.cypher.ast_nodes import Literal

    unit = (args[0].value if isinstance(args[0], Literal) else "day").lower()
    if unit not in _DATETIME_TRUNC_UNITS:
        raise ValueError(
            f"Unknown truncation unit for datetime.truncate: {unit!r}. "
            f"Valid units: {sorted(_DATETIME_TRUNC_UNITS)}"
        )
    # TIMESTAMP_NTZ throughout (see _datetime): date_trunc silently
    # returns zoned TIMESTAMP even for NTZ input, so cast the result
    # back — identity under the pinned UTC session zone, and the only
    # way start-of-era values (year 1) stay collectable.
    ts = _parse_ntz(cc, args[1])
    if unit in ("millennium", "century", "decade"):
        return F.when(ts.isNull(), F.lit(None).cast("timestamp_ntz")).otherwise(
            _epoch_start_date(unit, ts).cast("timestamp_ntz")
        )
    return F.date_trunc(unit, ts).cast("timestamp_ntz")


@register("localdatetime.truncate")
def _localdatetime_truncate(cc, args):
    """Same truncation semantics as datetime.truncate — timestamps here
    are zone-naive (reference temporal_functions.py registers an
    identical _truncate_datetime for both names)."""
    return _datetime_truncate(cc, args)


@register("duration")
def _duration(cc, args):
    """duration('P1Y2M3DT4H5M6S') or duration({days: 1, hours: 2}).

    Durations compile to Spark intervals via make_interval (SURVEY.md
    §1.2: CalendarIntervalType / make_interval for durations).
    """
    import re

    from pycypher_nmetl_spark.cypher.ast_nodes import Literal, MapLit

    zero = F.lit(0)
    parts = dict.fromkeys(
        ("years", "months", "weeks", "days", "hours", "minutes", "seconds"), zero
    )
    has_calendar_part = False
    a = args[0]
    if isinstance(a, Literal) and isinstance(a.value, str):
        m = re.fullmatch(
            r"P(?:(\d+(?:\.\d+)?)Y)?(?:(\d+(?:\.\d+)?)M)?(?:(\d+(?:\.\d+)?)W)?"
            r"(?:(\d+(?:\.\d+)?)D)?"
            r"(?:T(?:(\d+(?:\.\d+)?)H)?(?:(\d+(?:\.\d+)?)M)?(?:(\d+(?:\.\d+)?)S)?)?",
            a.value,
        )
        if not m:
            raise ValueError(f"bad ISO-8601 duration {a.value!r}")
        for key, grp in zip(
            ("years", "months", "weeks", "days", "hours", "minutes", "seconds"),
            m.groups(),
        ):
            if grp is not None:
                parts[key] = F.lit(float(grp))
                if key in ("years", "months"):
                    has_calendar_part = True
    elif isinstance(a, MapLit):
        for key, expr in a.pairs:
            if key not in parts:
                raise ValueError(f"unknown duration component {key!r}")
            parts[key] = cc.col(expr)
            if key in ("years", "months"):
                has_calendar_part = True
    else:
        raise ValueError("duration() needs an ISO string literal or a map")
    if not has_calendar_part:
        # day-time-only durations use DayTimeIntervalType, which pyspark
        # can deserialize (timedelta); CalendarIntervalType can't be
        # collected, only used in arithmetic
        return F.make_dt_interval(
            (parts["days"] + parts["weeks"] * 7).cast("int"),
            parts["hours"].cast("int"),
            parts["minutes"].cast("int"),
            parts["seconds"].cast("decimal(18,6)"),
        )
    return F.make_interval(
        parts["years"].cast("int"), parts["months"].cast("int"),
        parts["weeks"].cast("int"), parts["days"].cast("int"),
        parts["hours"].cast("int"), parts["minutes"].cast("int"),
        parts["seconds"].cast("decimal(18,6)"),
    )


@register("duration.between")
def _duration_between(cc, args):
    a, b = cc.col(args[0]).cast("timestamp"), cc.col(args[1]).cast("timestamp")
    secs = b.cast("double") - a.cast("double")
    return F.make_dt_interval(
        F.lit(0), F.lit(0), F.lit(0), secs.cast("decimal(18,6)")
    )


# ---------------------------------------------------------------------- #
# utility functions (reference: scalar_functions/utility_functions.py)
# ---------------------------------------------------------------------- #
@register("coalesce")
def _coalesce(cc, args):
    return F.coalesce(*[cc.col(a) for a in args])


simple("nullIf", F.nullif, 2, 2)
simple("isInfinite", lambda x: F.abs(x) == F.lit(float("inf")))
simple("isFinite", lambda x: ~(F.isnan(x) | (F.abs(x) == F.lit(float("inf")))))


@register("infinity")
def _infinity(cc, args):
    return F.lit(float("inf"))


@register("randomUUID")
def _random_uuid(cc, args):
    return F.uuid()


@register("exists")
def _exists_prop(cc, args):
    return cc.col(args[0]).isNotNull()


@register("id")
def _id(cc, args):
    return cc.col(args[0])  # entity vars compile to their id column


@register("elementId")
def _element_id(cc, args):
    return cc.col(args[0]).cast("string")


# ---------------------------------------------------------------------- #
# type predicates (reference: scalar_functions/__init__.py:591-895)
# ---------------------------------------------------------------------- #
def _type_pred(match_types):
    def fn(cc, args):
        col = cc.col(args[0])
        dt = cc.bindings.dtype(col)
        hit = isinstance(dt, match_types)
        return F.when(col.isNull(), F.lit(None).cast("boolean")).otherwise(F.lit(hit))

    return fn


SCALAR_FUNCTIONS["isstring"] = _type_pred(T.StringType)
SCALAR_FUNCTIONS["isinteger"] = _type_pred((T.LongType, T.IntegerType, T.ShortType, T.ByteType))
SCALAR_FUNCTIONS["isfloat"] = _type_pred((T.DoubleType, T.FloatType))
SCALAR_FUNCTIONS["isboolean"] = _type_pred(T.BooleanType)
SCALAR_FUNCTIONS["islist"] = _type_pred(T.ArrayType)
SCALAR_FUNCTIONS["ismap"] = _type_pred((T.MapType, T.StructType))


@register("valueType")
def _value_type(cc, args):
    col = cc.col(args[0])
    dt = cc.bindings.dtype(col)
    from pycypher_nmetl_spark.compiler.dynval import (
        RANK_BOOL, RANK_DATE, RANK_DATETIME, RANK_LIST, RANK_LOCALDATETIME,
        RANK_NUMBER, RANK_STRING, is_dyn,
    )

    if dt is not None and is_dyn(dt):
        # dynamic (mixed-type) value: rank-dispatch per row. INTEGER vs
        # FLOAT uses the integral heuristic (the double-normalized
        # encoding erases the static split — same rule decode applies).
        d = col["__cyd"]
        return (
            F.when(col.isNull(), F.lit("NULL"))
            .when(col["__cyr"] == RANK_STRING, F.lit("STRING"))
            .when(col["__cyr"] == RANK_BOOL, F.lit("BOOLEAN"))
            .when(
                col["__cyr"] == RANK_NUMBER,
                F.when(d == F.floor(d), F.lit("INTEGER")).otherwise(
                    F.lit("FLOAT")
                ),
            )
            .when(col["__cyr"] == RANK_DATE, F.lit("DATE"))
            .when(col["__cyr"] == RANK_DATETIME, F.lit("ZONED DATETIME"))
            .when(
                col["__cyr"] == RANK_LOCALDATETIME, F.lit("LOCAL DATETIME")
            )
            .when(col["__cyr"] == RANK_LIST, F.lit("LIST"))
        )
    name = {
        T.StringType: "STRING", T.LongType: "INTEGER", T.IntegerType: "INTEGER",
        T.DoubleType: "FLOAT", T.FloatType: "FLOAT", T.BooleanType: "BOOLEAN",
        T.DateType: "DATE", T.TimestampType: "ZONED DATETIME",
        T.TimestampNTZType: "LOCAL DATETIME",
    }.get(type(dt))
    if name is None:
        if isinstance(dt, T.ArrayType):
            name = "LIST"
        elif isinstance(dt, (T.MapType, T.StructType)):
            name = "MAP"
        else:
            name = dt.simpleString().upper()
    return F.when(col.isNull(), F.lit("NULL")).otherwise(F.lit(name))


# ---------------------------------------------------------------------- #
# hash / encoding (reference: scalar_functions/__init__.py:897-1009)
# ---------------------------------------------------------------------- #
simple("md5", lambda x: F.md5(x.cast("string")))
simple("sha1", lambda x: F.sha1(x.cast("string")))
simple("sha256", lambda x: F.sha2(x.cast("string"), 256))
simple("encodeBase64", lambda x: F.base64(x.cast("binary")))
simple("decodeBase64", lambda x: F.unbase64(x).cast("string"))


# ---------------------------------------------------------------------- #
# map / entity functions (reference: scalar_functions/__init__.py:1011-1083)
# ---------------------------------------------------------------------- #
@register("keys")
def _keys(cc, args):
    from pycypher_nmetl_spark.cypher.ast_nodes import Var

    if isinstance(args[0], Var):
        info = cc.bindings.vars.get(args[0].name)
        if info and info.kind in ("node", "rel"):
            var = args[0].name
            props = cc.bindings.prop_columns(var)
            names = [c[len(var) + 2 :] for c in props]
            pairs = [
                F.when(F.col(c).isNotNull(), F.lit(nm)) for c, nm in zip(props, names)
            ]
            if not pairs:
                return F.array().cast("array<string>")
            return F.filter(F.array(*pairs), lambda x: x.isNotNull())
    col = cc.col(args[0])
    dt = cc.bindings.dtype(col)
    if isinstance(dt, T.StructType):
        return F.array(*[F.lit(f.name) for f in dt.fields])
    return F.map_keys(col)


@register("values")
def _values(cc, args):
    col = cc.col(args[0])
    dt = cc.bindings.dtype(col)
    if isinstance(dt, T.StructType):
        return F.array(*[col.getField(f.name).cast("string") for f in dt.fields])
    return F.map_values(col)


@register("properties")
def _properties(cc, args):
    """properties(n) -> struct of the entity's property columns.

    Documented divergence: Neo4j returns a MAP that omits null-valued
    properties per row; a Spark struct is fixed-shape, so absent
    properties surface as null FIELDS instead (a null-filtered map
    would have to coerce mixed-type property values to one type —
    lossy). keys(n) DOES skip nulls, matching Neo4j."""
    from pycypher_nmetl_spark.cypher.ast_nodes import Var

    if isinstance(args[0], Var):
        info = cc.bindings.vars.get(args[0].name)
        if info and info.kind in ("node", "rel"):
            var = args[0].name
            props = cc.bindings.prop_columns(var)
            return F.struct(
                *[F.col(c).alias(c[len(var) + 2 :]) for c in sorted(props)]
            )
    return cc.col(args[0])


# ---------------------------------------------------------------------- #
# graph-entity functions (SURVEY.md §2.4)
# ---------------------------------------------------------------------- #
@register("labels")
def _labels(cc, args):
    from pycypher_nmetl_spark.cypher.ast_nodes import Var

    if not isinstance(args[0], Var):
        raise ValueError("labels() expects a node variable")
    var = args[0].name
    info = cc.bindings.vars.get(var)
    label_col = f"{var}__label"
    if label_col in cc.bindings.df.columns:
        return F.array(F.col(label_col))
    if info and info.labels:
        return F.array(*[F.lit(l) for l in info.labels])
    return F.array().cast("array<string>")


@register("type")
def _type(cc, args):
    from pycypher_nmetl_spark.cypher.ast_nodes import Var

    if not isinstance(args[0], Var):
        raise ValueError("type() expects a relationship variable")
    var = args[0].name
    type_col = f"{var}__type"
    if type_col in cc.bindings.df.columns:
        return F.col(type_col)
    info = cc.bindings.vars.get(var)
    if info and info.labels:
        return F.lit(info.labels[0])
    return F.lit(None).cast("string")


def _endpoint_id(cc, var: str, which: str) -> Column:
    """Stored-orientation endpoint id. Undirected traversals union a
    src/dst-swapped copy of the edge table; the per-row `__sw` flag
    (compiler/patterns.py _expand) marks swapped rows, where the
    traversal-side `__src` column actually carries the stored dst."""
    src, dst = F.col(f"{var}__src"), F.col(f"{var}__dst")
    fwd, rev = (src, dst) if which == "start" else (dst, src)
    sw = f"{var}____sw"
    if sw in cc.bindings.df.columns:
        return F.when(F.col(sw), rev).otherwise(fwd)
    return fwd


@register("startNode")
def _start_node(cc, args):
    return _endpoint_id(cc, args[0].name, "start")


@register("endNode")
def _end_node(cc, args):
    return _endpoint_id(cc, args[0].name, "end")
