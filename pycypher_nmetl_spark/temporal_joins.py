"""Temporal join operators Spark lacks natively: as-of join and range
(interval) join.

Reference parity: the reference engine exposes event-stream lookups only
through per-row Python callbacks over its event tables (reference:
packages/nmetl/src/nmetl/session.py trigger pipeline); these two
operators are the set-based, distributed equivalents a 100 TB event
store actually needs.

Scale design:

* ``asof_join`` — the classic "most recent right row at or before each
  left row" — is NOT compiled to a join at all.  Both sides are tagged
  and unioned, the right payload is packed into ONE struct column, and
  a single ``last(ignorenulls)`` window partitioned by the ``by`` keys
  carries the latest right payload onto each left row.  One exchange
  (hash by the ``by`` keys), one sort, zero join fan-out, constant
  memory per partition — immune to the O(|left| x |right|) blow-up a
  naive ``l.ts >= r.ts`` theta-join produces, and to per-key skew in
  the right side (a hot key costs one sorted scan, not a quadratic
  bucket).

* ``range_join`` — "left point falls inside right interval" — buckets
  time into fixed-width bins: each right interval explodes to every bin
  it overlaps, each left point lands in exactly one bin, and the match
  becomes an equi-join on (by, bin) followed by the exact containment
  filter.  Each matched pair meets in exactly one bin (the left row's),
  so no dedup pass is needed.  Join work is |left| + sum(interval_span /
  bin_width) instead of the cross-join Catalyst plans for inequality
  predicates (BroadcastNestedLoopJoin).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.window import Window

__all__ = ["asof_join", "range_join"]

_DIRECTIONS = ("backward", "forward", "nearest")


def _ordinal(df: DataFrame, col: str) -> Column:
    """The time column as an orderable/differencable long: microseconds
    for timestamps, days for dates, pass-through for numerics."""
    dt = df.schema[col].dataType
    c = F.col(col)
    if isinstance(dt, T.TimestampNTZType):
        # unix_micros only accepts TIMESTAMP; under this engine's UTC
        # session the NTZ->TZ cast is instant-preserving wall clock
        return F.unix_micros(c.cast("timestamp"))
    if isinstance(dt, T.TimestampType):
        return F.unix_micros(c)
    if isinstance(dt, T.DateType):
        return F.datediff(c, F.lit("1970-01-01")).cast("long")
    if isinstance(dt, T.NumericType):
        return c
    raise TypeError(f"asof/range time column {col!r} has unsupported type {dt}")


def _tolerance_units(dt: T.DataType, tolerance: float) -> float:
    """Tolerance in the ordinal's units (micros for ts, days for date)."""
    if isinstance(dt, (T.TimestampType, T.TimestampNTZType)):
        return tolerance * 1_000_000.0  # seconds -> micros
    return tolerance


def _one_direction(
    unioned: DataFrame,
    by: list[str],
    descending: bool,
    payload: str,
    ord_col: str,
    side_col: str,
) -> DataFrame:
    """Carry the latest right payload onto every row, scanning the union
    in one direction. At equal timestamps the right row sorts BEFORE the
    left row so the match is inclusive (l.ts >= r.ts / <=)."""
    ordc = F.col(ord_col).desc() if descending else F.col(ord_col).asc()
    w = (
        Window.partitionBy(*[F.col(c) for c in by])
        .orderBy(ordc, F.col(side_col).asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return unioned.withColumn(payload, F.last(payload, ignorenulls=True).over(w))


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    by: str | list[str] | None = None,
    direction: str = "backward",
    tolerance: float | None = None,
    right_cols: list[str] | None = None,
    suffix: str = "_r",
    how: str = "left",
) -> DataFrame:
    """As-of join: for every left row, attach the single right row whose
    ``on`` value is the nearest at-or-before it (``backward``, default),
    at-or-after it (``forward``), or closest in either direction
    (``nearest``), within the same ``by`` group.

    Parameters
    ----------
    on : time/ordering column name, present in BOTH frames (timestamp,
        date, or numeric).
    by : equality key column(s); the partitioning of the ONE exchange
        this operator performs. ``None`` means a single global ordered
        scan — correct, but serialized; always pass ``by`` at scale.
    tolerance : maximum allowed |left.on - right.on|, in SECONDS for
        timestamp columns / days for dates / same units for numerics;
        matches farther away than this resolve to null (or drop the
        row under ``how='inner'``).
    right_cols : right columns to attach (default: all except ``on``
        and the ``by`` keys). Attached as ``<col><suffix>`` whenever
        the name collides with a left column, verbatim otherwise; the
        right ``on`` value always rides along as ``<on><suffix>``.
    how : ``'left'`` keeps unmatched left rows (null payload),
        ``'inner'`` drops them.
    """
    if direction not in _DIRECTIONS:
        raise ValueError(f"direction must be one of {_DIRECTIONS}, got {direction!r}")
    if how not in ("left", "inner"):
        raise ValueError(f"how must be 'left' or 'inner', got {how!r}")
    by = [by] if isinstance(by, str) else list(by or [])
    for c in [on, *by]:
        if c not in left.columns:
            raise ValueError(f"asof_join: column {c!r} missing from left")
        if c not in right.columns:
            raise ValueError(f"asof_join: column {c!r} missing from right")
    if right_cols is None:
        right_cols = [c for c in right.columns if c != on and c not in by]
    missing = [c for c in right_cols if c not in right.columns]
    if missing:
        raise ValueError(f"asof_join: right_cols {missing} missing from right")
    reserved = [
        c for c in {*left.columns, *right.columns} if c.startswith("__asof_")
    ]
    if reserved:
        raise ValueError(
            f"asof_join: column name(s) {sorted(reserved)} collide with "
            "reserved internal names (prefix '__asof_'); rename them first"
        )

    out_names = {}
    for c in right_cols:
        out_names[c] = c + suffix if c in left.columns else c
    on_r = on + suffix
    emitted = [*left.columns, on_r, *out_names.values()]
    dupes = sorted({c for c in emitted if emitted.count(c) > 1})
    if dupes:
        raise ValueError(
            f"asof_join: output column collision {dupes}; rename the "
            f"right columns or pass a different suffix than {suffix!r}"
        )

    pay, side, ordn = "__asof_pay", "__asof_side", "__asof_ord"
    l_ord = _ordinal(left, on)
    r_ord = _ordinal(right, on)
    # pack the right payload (+ the right timestamp, needed for the
    # tolerance check and exposed as <on><suffix>) into one struct so a
    # single last() window call carries everything
    r_struct = F.struct(
        r_ord.alias("__t"), *[F.col(c).alias(c) for c in right_cols]
    )
    l_side = left.select(
        *[F.col(c) for c in left.columns],
        l_ord.alias(ordn),
        F.lit(1).alias(side),
        F.lit(None).cast(
            right.select(r_struct.alias(pay)).schema[0].dataType
        ).alias(pay),
    )
    r_side = right.select(
        *[F.lit(None).cast(left.schema[c].dataType).alias(c) for c in left.columns
          if c not in by and c != on],
        *[F.col(c) for c in by],
        F.col(on),
        r_ord.alias(ordn),
        F.lit(0).alias(side),
        r_struct.alias(pay),
    )
    unioned = l_side.unionByName(r_side)

    if direction == "backward":
        carried = _one_direction(unioned, by, False, pay, ordn, side)
    elif direction == "forward":
        carried = _one_direction(unioned, by, True, pay, ordn, side)
    else:  # nearest: carry both ways in the SAME window partitioning
        # (two Window operators, one exchange — they share the partition
        # keys, so Catalyst reuses the exchange and adds one extra sort)
        back, fwd = pay + "_b", pay + "_f"
        carried = unioned.withColumn(back, F.col(pay)).withColumn(fwd, F.col(pay))
        carried = _one_direction(carried, by, False, back, ordn, side)
        carried = _one_direction(carried, by, True, fwd, ordn, side)
        d_b = F.abs(F.col(ordn) - F.col(back)["__t"])
        d_f = F.abs(F.col(ordn) - F.col(fwd)["__t"])
        carried = carried.withColumn(
            pay,
            F.when(F.col(back).isNull(), F.col(fwd))
            .when(F.col(fwd).isNull(), F.col(back))
            # tie -> backward, pandas merge_asof convention
            .when(d_f < d_b, F.col(fwd))
            .otherwise(F.col(back)),
        ).drop(back, fwd)

    out = carried.filter(F.col(side) == 1)
    if tolerance is not None:
        tol = _tolerance_units(left.schema[on].dataType, tolerance)
        out = out.withColumn(
            pay,
            F.when(
                F.abs(F.col(ordn) - F.col(pay)["__t"]) <= F.lit(tol), F.col(pay)
            ),
        )
    if how == "inner":
        out = out.filter(F.col(pay).isNotNull())

    ord_dt = left.schema[on].dataType
    r_t = F.col(pay)["__t"]
    if isinstance(ord_dt, (T.TimestampType, T.TimestampNTZType)):
        r_on = F.timestamp_micros(r_t.cast("long")).cast(ord_dt)
    elif isinstance(ord_dt, T.DateType):
        r_on = F.date_add(F.lit("1970-01-01").cast("date"), r_t.cast("int"))
    else:
        r_on = r_t.cast(ord_dt)
    return out.select(
        *[F.col(c) for c in left.columns],
        r_on.alias(on_r),
        *[F.col(pay)[c].alias(out_names[c]) for c in right_cols],
    )


def range_join(
    left: DataFrame,
    right: DataFrame,
    left_on: str,
    right_start: str,
    right_end: str,
    by: str | list[str] | None = None,
    bin_width: float | None = None,
    how: str = "inner",
) -> DataFrame:
    """Interval join: pair every left row with every right row whose
    ``[right_start, right_end]`` interval contains ``left_on`` (both
    ends inclusive), matching ``by`` keys when given.

    ``bin_width`` (seconds for timestamps, days for dates, plain units
    for numerics) sets the bucketing granularity: right intervals
    explode into every bin they overlap, left points land in one bin,
    and the match is an equi-join on (by, bin) + exact filter — the
    scale path Catalyst cannot plan for inequality predicates (it falls
    back to a nested-loop join). Default: the 90th percentile interval
    span (one approxQuantile job over right), so a typical interval
    explodes to ~1-2 bins. ``how='left'`` keeps unmatched left rows.
    """
    if how not in ("left", "inner"):
        raise ValueError(f"how must be 'left' or 'inner', got {how!r}")
    by = [by] if isinstance(by, str) else list(by or [])
    for c in [left_on, *by]:
        if c not in left.columns:
            raise ValueError(f"range_join: column {c!r} missing from left")
    for c in [right_start, right_end, *by]:
        if c not in right.columns:
            raise ValueError(f"range_join: column {c!r} missing from right")
    overlap = set(left.columns) & set(right.columns) - set(by)
    if overlap:
        raise ValueError(
            f"range_join: overlapping non-key columns {sorted(overlap)}; "
            "rename one side first"
        )
    reserved = [
        c
        for c in {*left.columns, *right.columns}
        if c == "__bin" or c.startswith("__rj")
    ]
    if reserved:
        raise ValueError(
            f"range_join: column name(s) {sorted(reserved)} collide with "
            "reserved internal names ('__bin' / '__rj*'); rename them first"
        )

    l_ord = _ordinal(left, left_on)
    rs_ord = _ordinal(right, right_start)
    re_ord = _ordinal(right, right_end)

    if bin_width is None:
        width = _auto_bin_width(
            right, left.schema[left_on].dataType, rs_ord, re_ord
        )
    else:
        width = float(_tolerance_units(left.schema[left_on].dataType, bin_width))
        if width <= 0:
            raise ValueError(f"bin_width must be positive, got {bin_width}")
    w = F.lit(width)

    lbin = F.floor(l_ord / w)
    l_df = left.withColumn("__bin", lbin)
    # invalid (start > end) intervals must go BEFORE the explode:
    # Spark's sequence() counts DOWN for start > end and would mint
    # bins the interval never covers
    r_df = right.filter(rs_ord <= re_ord).withColumn(
        "__bin",
        F.explode(F.sequence(F.floor(rs_ord / w), F.floor(re_ord / w))),
    )

    # right-side join keys get unambiguous names: both sides often
    # derive from the SAME source frame (self-range-joins), where
    # l_df[c] == r_df[c] carries identical expression ids and only
    # Spark's fragile self-join disambiguation heuristic saves it
    for c in [*by, "__bin"]:
        r_df = r_df.withColumnRenamed(c, f"__rj_{c}")
    cond = F.col("__bin") == F.col("__rj___bin")
    for c in by:
        cond = cond & (F.col(c) == F.col(f"__rj_{c}"))
    joined = l_df.join(r_df, cond, "inner")
    joined = joined.filter(
        (_ordinal_on(joined, left_on) >= _ordinal_on(joined, right_start))
        & (_ordinal_on(joined, left_on) <= _ordinal_on(joined, right_end))
    )
    out_cols = [F.col(c) for c in left.columns] + [
        F.col(c) for c in right.columns if c not in by
    ]
    matched = joined.select(*out_cols)
    if how == "inner":
        return matched
    # left outer: left rows with no exact-containment match (including
    # rows whose bin collided but every candidate failed the filter).
    # The anti-join must be NULL-SAFE: a matched left row carrying a null
    # payload value never equals itself under `=`, so a plain column-list
    # anti-join would re-emit it with an all-null right side.
    matched_keys = matched.select(
        *[F.col(c).alias(f"__rjk_{c}") for c in left.columns]
    ).dropDuplicates()
    anti_cond = None
    for c in left.columns:
        eq = F.col(c).eqNullSafe(F.col(f"__rjk_{c}"))
        anti_cond = eq if anti_cond is None else anti_cond & eq
    lonely2 = left.join(matched_keys, anti_cond, "left_anti")
    null_right = [
        F.lit(None).cast(right.schema[c].dataType).alias(c)
        for c in right.columns
        if c not in by
    ]
    return matched.unionByName(
        lonely2.select(*[F.col(c) for c in left.columns], *null_right)
    )


def _auto_bin_width(
    right: DataFrame, left_dt: T.DataType, rs_ord: Column, re_ord: Column
) -> float:
    """Default range_join bin width: the 90th-percentile right interval
    span (so a typical interval explodes to ~1-2 bins), floored so the
    bucketing never degenerates.

    The floor is TYPE-AWARE: temporal ordinals are integral (micros for
    timestamps, days for dates) so 1 unit is the finest representable
    bin; numeric domains can be arbitrarily scaled (e.g. [0, 1]-
    normalized scores), where an absolute 1.0 floor would collapse the
    whole domain into one bin (quadratic join work). Numerics instead
    floor RELATIVE to the observed right-domain extent (~4096 bins max),
    keeping both per-interval fan-out and global bin count bounded.
    """
    import math

    # one job: 90th-pct span + domain extent (extent feeds the floor)
    row = right.agg(
        F.percentile_approx(
            (re_ord - rs_ord).cast("double"), F.lit(0.9)
        ).alias("_q"),
        F.min(rs_ord.cast("double")).alias("_lo"),
        F.max(re_ord.cast("double")).alias("_hi"),
    ).first()
    width = float(row["_q"]) if row["_q"] is not None else 0.0
    if isinstance(left_dt, (T.TimestampType, T.TimestampNTZType, T.DateType)):
        floor_w = 1.0
    else:
        span = (
            float(row["_hi"]) - float(row["_lo"])
            if row["_lo"] is not None and row["_hi"] is not None
            else 0.0
        )
        floor_w = span / 4096.0 if span > 0 else 1.0
    if not math.isfinite(width) or width < floor_w:
        width = floor_w
    return width


def _ordinal_on(df: DataFrame, col: str) -> Column:
    """_ordinal against a specific (aliased) frame's column reference."""
    dt = df.schema[col].dataType
    c = df[col]
    if isinstance(dt, T.TimestampNTZType):
        return F.unix_micros(c.cast("timestamp"))
    if isinstance(dt, T.TimestampType):
        return F.unix_micros(c)
    if isinstance(dt, T.DateType):
        return F.datediff(c, F.lit("1970-01-01")).cast("long")
    return c
