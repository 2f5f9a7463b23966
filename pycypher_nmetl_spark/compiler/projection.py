"""WITH / RETURN compiler: projection, implicit group-by, modifiers.

Cypher aggregation is implicit GROUP BY (reference:
aggregation_planner.py:74-157,245-): any RETURN/WITH item containing an
aggregate makes all non-aggregate items the grouping keys. The compiler:

  1. materializes pattern sub-expressions (EXISTS / pattern comprehension)
     into hidden columns;
  2. computes grouping-key expressions into internal columns ``_k<i>``;
  3. runs ONE ``groupBy(keys).agg(...)`` computing every distinct
     aggregate sub-expression into ``_a<i>`` (shared between RETURN items
     and ORDER BY via a structural ast-key map — Spark's partial
     aggregation makes this a single map-side-combined shuffle);
  4. compiles each item expression on the aggregated frame (aggregates
     resolve to their ``_a<i>`` columns);
  5. applies DISTINCT → ORDER BY → SKIP → LIMIT → trailing WHERE in
     Cypher's order (projection_planner.py:124-412).

ORDER BY may reference output aliases or pre-projection variables;
we keep both visible while sorting and select the outputs last, so the
sort+limit still fuses into TakeOrderedAndProject.
"""

from __future__ import annotations

from typing import TYPE_CHECKING

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from pycypher_nmetl_spark.compiler.astutil import ast_key, contains_aggregate, find_aggregates
from pycypher_nmetl_spark.compiler.bindings import Bindings, VarInfo, fresh_name, pcol
from pycypher_nmetl_spark.compiler.exprs import ExprCompiler
from pycypher_nmetl_spark.compiler.patterns import materialize_subpatterns
from pycypher_nmetl_spark.cypher.ast_nodes import (
    CountStar, FuncCall, Projection, ReturnItem, Var,
)

if TYPE_CHECKING:
    from pycypher_nmetl_spark.engine import CypherEngine


def _compile_aggregate(node, cc: ExprCompiler, approx_percentiles: bool = False) -> Column:
    """One aggregate AST node -> Spark aggregate Column.

    Reference semantics: aggregation_evaluator.py:32-196 — all aggregates
    ignore nulls; count(*) counts rows. With ``approx_percentiles``
    (input estimated above engine.percentile_exact_max_rows),
    percentileCont/Disc compile to the GK sketch instead of the exact
    whole-group sort — bounded executor memory at corpus scale.
    """
    if isinstance(node, CountStar):
        return F.count(F.lit(1))
    assert isinstance(node, FuncCall)
    name = node.name
    if name == "count":
        arg = cc.col(node.args[0])
        return F.count_distinct(arg) if node.distinct else F.count(arg)
    arg = cc.col(node.args[0])
    if name == "sum":
        # Neo4j: sum over zero non-null inputs is 0, never null (the
        # reference's pandas sum(skipna=True) agrees); Spark's SUM
        # returns null there, so fold the null away. coalesce picks the
        # wider common type, preserving long sums as long.
        s = F.sum_distinct(arg) if node.distinct else F.sum(arg)
        return F.coalesce(s, F.lit(0))
    if name == "avg":
        if node.distinct:
            return F.sum_distinct(arg) / F.count_distinct(arg)
        return F.avg(arg)
    if name == "min":
        return F.min(arg)
    if name == "max":
        return F.max(arg)
    if name == "collect":
        # openCypher: collect() drops nulls; Spark collect_list does too.
        return F.collect_set(arg) if node.distinct else F.collect_list(arg)
    if name == "stdev":
        return F.stddev_samp(arg)
    if name == "stdevp":
        return F.stddev_pop(arg)
    if name == "percentilecont":
        if approx_percentiles:
            return F.approx_percentile(arg, cc.col(node.args[1]), F.lit(10_000))
        return F.percentile(arg, cc.col(node.args[1]))
    if name == "approxcountdistinct":
        # HLL-sketch distinct count — the scale extension the reference
        # lacks (SURVEY.md §2.5 approximate aggregates)
        return F.approx_count_distinct(arg)
    if name == "percentiledisc":
        if approx_percentiles:
            # GK sketch returns an actual element of the group, which is
            # exactly percentileDisc's contract (within sketch error)
            return F.approx_percentile(arg, cc.col(node.args[1]), F.lit(10_000))
        # exact lower-interpolation percentile: smallest element whose
        # cumulative fraction >= p (aggregation_evaluator.py:95-134)
        p = cc.col(node.args[1])
        xs = F.sort_array(F.collect_list(arg))
        idx = F.greatest(F.lit(1), F.ceil(p * F.size(xs)).cast("int"))
        return F.element_at(xs, idx)
    if name in ("approxpercentile", "approxpercentilecont",
                "approxpercentiledisc"):
        # scale opt-in: exact percentiles sort/collect the whole group —
        # at 100 TB use the GK-sketch instead (bounded memory, one pass).
        # Optional third arg = accuracy (higher = tighter, default 10000).
        acc = (
            cc.col(node.args[2]) if len(node.args) > 2 else F.lit(10_000)
        )
        return F.approx_percentile(arg, cc.col(node.args[1]), acc)
    raise NotImplementedError(f"aggregate {name}()")


def compile_projection(
    engine: "CypherEngine", bindings: Bindings, proj: Projection, params: dict
) -> tuple[Bindings, DataFrame | None]:
    """Compile WITH or RETURN.

    Returns (new_bindings, result_df). result_df is non-None iff RETURN.
    """
    items = list(proj.items)
    if proj.star:
        star_items = [
            ReturnItem(Var(v), v, v)
            for v in sorted(bindings.vars)
            if not bindings.vars[v].anon
        ]
        items = star_items + items

    # CALL { } carry keys (engine._compile_call_subquery): always
    # projected through, always part of implicit grouping / DISTINCT —
    # that is exactly what gives subqueries their per-invoking-row
    # semantics in a single relational plan
    carry = [v for v in bindings.vars if v.startswith("__cq")]
    for v in carry:
        if not any(isinstance(it.expr, Var) and it.expr.name == v for it in items):
            items.append(ReturnItem(Var(v), v, v))

    # pattern-shaped sub-expressions -> hidden columns first
    all_exprs = [it.expr for it in items] + [o.expr for o in proj.order_by]
    if proj.where is not None:
        all_exprs.append(proj.where)
    bindings, subst = materialize_subpatterns(engine, bindings, all_exprs, params)

    out_names = [it.alias or it.text for it in items]
    if len(set(out_names)) != len(out_names):
        raise ValueError(f"duplicate column names in projection: {out_names}")

    has_agg = any(contains_aggregate(it.expr) for it in items) or any(
        contains_aggregate(o.expr) for o in proj.order_by
    )

    if has_agg:
        new_b, internal = _aggregate_projection(
            engine, bindings, items, proj, params, subst
        )
    else:
        new_b, internal = _plain_projection(engine, bindings, items, proj, params, subst)

    # ---- modifiers, in Cypher's order ---------------------------------- #
    df = new_b.df

    if proj.distinct:
        df = df.select(*internal.values()).dropDuplicates()
        new_b = Bindings(df, new_b.vars)

    in_carry_window = bool(carry) and (
        proj.skip is not None or proj.limit is not None
    )
    if proj.order_by and not in_carry_window:
        # inside the carry-window path the ORDER BY lives in the window
        # spec — a global orderBy here would add a redundant full sort +
        # range-partition exchange under the per-key row_number
        df = _apply_order(engine, new_b, proj, params, internal)

    cc = ExprCompiler(Bindings(df, new_b.vars), params, subst, engine.functions)
    if in_carry_window:
        # SKIP/LIMIT inside CALL { }: per invoking row, not global — a
        # row_number window partitioned by the carry keys (top-k-per-row,
        # the classic Spark shape; no global sort, no collect)
        from pyspark.sql.window import Window

        w = Window.partitionBy(*[F.col(internal[v]) for v in carry])
        if proj.order_by:
            nb2 = Bindings(df, new_b.vars)
            if hasattr(new_b, "_agg_map"):
                nb2._agg_map = new_b._agg_map
            w = w.orderBy(*_sort_cols(engine, nb2, proj, params, internal))
        else:
            w = w.orderBy(F.monotonically_increasing_id())
        lo = int(_const(cc, proj.skip)) if proj.skip is not None else 0
        df = df.withColumn("__cq_rn", F.row_number().over(w)).filter(
            F.col("__cq_rn") > lo
        )
        if proj.limit is not None:
            df = df.filter(F.col("__cq_rn") <= lo + int(_const(cc, proj.limit)))
        df = df.drop("__cq_rn")
    else:
        if proj.skip is not None:
            df = df.offset(int(_const(cc, proj.skip)))
        if proj.limit is not None:
            df = df.limit(int(_const(cc, proj.limit)))

    # ---- finalize ------------------------------------------------------- #
    if proj.is_return:
        result = df.select(
            *[F.col(internal[name]).alias(name) for name in out_names]
        )
        return new_b, result

    # WITH: rescope — keep only projected vars, rename to aliases
    keep_cols: list[Column] = []
    vars_: dict[str, VarInfo] = {}
    # old var -> new alias, for every var projected straight through —
    # path_nodes/path_rels/src_var/dst_var metadata references other
    # variables by name and must be remapped to the post-WITH names
    var_renames = {
        it.expr.name: (it.alias or it.text)
        for it in items
        if isinstance(it.expr, Var) and it.expr.name in new_b.vars
    }

    def _carry_ref(v: str, name: str, tag: str, i: int) -> str | None:
        """Resolve a metadata-referenced variable through the rescope:
        renamed if it survives the WITH; otherwise its id column is
        carried as a hidden satellite of the owning variable (so
        `MATCH p=... WITH p RETURN nodes(p)` works even when the
        pattern's node vars were not themselves projected)."""
        if v in var_renames:
            return var_renames[v]
        if v in df.columns:
            hidden = f"{name}__{tag}{i}"
            keep_cols.append(F.col(v).alias(hidden))
            return hidden
        return None

    for it, name in zip(items, out_names):
        icol = internal[name]
        if isinstance(it.expr, Var) and it.expr.name in new_b.vars:
            src = it.expr.name
            info = new_b.vars[src]
            keep_cols.append(F.col(icol).alias(name))
            # carry satellite columns under the new name
            for c in new_b.var_columns(src):
                if c != src and c in df.columns:
                    keep_cols.append(F.col(c).alias(name + c[len(src):]))
            if info.kind == "path":
                pn = tuple(
                    r for i, v in enumerate(info.path_nodes)
                    if (r := _carry_ref(v, name, "pn", i)) is not None
                )
                pr = tuple(
                    r for i, v in enumerate(info.path_rels)
                    if (r := _carry_ref(v, name, "pr", i)) is not None
                )
                # a partially-resolvable list is useless (wrong arity
                # beats a clean error) — drop to empty and flag it so
                # the path functions raise a precise error
                dropped = info.path_dropped
                if len(pn) != len(info.path_nodes):
                    pn, dropped = (), True
                if len(pr) != len(info.path_rels):
                    pr, dropped = (), True
                vars_[name] = VarInfo(
                    info.kind, info.labels, anon=info.anon,
                    path_nodes=pn, path_rels=pr, path_dropped=dropped,
                )
            elif info.kind == "rel":
                vars_[name] = VarInfo(
                    info.kind, info.labels, anon=info.anon,
                    src_var=var_renames.get(info.src_var),
                    dst_var=var_renames.get(info.dst_var),
                )
            else:
                vars_[name] = VarInfo(
                    info.kind, info.labels, anon=info.anon,
                    elem_kind=info.elem_kind,
                )
        else:
            keep_cols.append(F.col(icol).alias(name))
            # the projection step may have recorded richer info (e.g.
            # collect(n) remembers its element kind/labels) under the
            # output name — keep it through the rescope
            prev = new_b.vars.get(name)
            vars_[name] = (
                prev if prev is not None and prev.kind == "value" else VarInfo("value")
            )
    out = Bindings(df.select(*keep_cols), vars_)

    if proj.where is not None:
        # same residual-WHERE machinery as compile_match: bare (NOT)
        # EXISTS conjuncts become left_semi/left_anti joins (no distinct
        # Exchange), everything else filters through the flag columns
        from pycypher_nmetl_spark.compiler.patterns import (
            _split_conjuncts, apply_residual_where,
        )

        out = apply_residual_where(
            engine, out, _split_conjuncts(proj.where), params
        )
    return out, None


def _const(cc: ExprCompiler, expr) -> int:
    """SKIP/LIMIT operand: literal, parameter, or any constant expression
    (openCypher allows e.g. `LIMIT 2 + 1` / `LIMIT toInteger($n * 2)`).
    Constant expressions fold driver-side with one single-row eval —
    they reference no query variables by definition, so compiling over
    a unit frame is sound; variable references fail there and raise."""
    from pycypher_nmetl_spark.cypher.ast_nodes import Literal, Param

    if isinstance(expr, Literal):
        return expr.value
    if isinstance(expr, Param):
        return cc.params[expr.name]
    try:
        spark = cc.bindings.df.sparkSession
        unit = Bindings(spark.range(1).drop("id"), {})
        col = ExprCompiler(unit, cc.params).col(expr)
        value = unit.df.select(col.alias("_v")).collect()[0][0]
    except Exception:
        raise ValueError(
            "SKIP/LIMIT must be a constant expression (no variable references)"
        ) from None
    if value is None or not isinstance(value, int):
        raise ValueError(f"SKIP/LIMIT must evaluate to an integer, got {value!r}")
    if value < 0:
        raise ValueError(f"SKIP/LIMIT must be non-negative, got {value}")
    return value


# ------------------------------------------------------------------------- #
def _plain_projection(
    engine, bindings: Bindings, items, proj, params, subst
) -> tuple[Bindings, dict[str, str]]:
    """No aggregates: append item columns, keep originals visible for ORDER BY."""
    cc = ExprCompiler(bindings, params, subst, engine.functions)
    internal: dict[str, str] = {}
    df = bindings.df
    new_cols: dict[str, Column] = {}
    vars_ = dict(bindings.vars)
    for it in items:
        name = it.alias or it.text
        if isinstance(it.expr, Var) and it.expr.name in bindings.vars:
            v = it.expr.name
            if bindings.vars[v].kind == "path":
                # a path var has no base column; its value is the hop
                # count (column conventions in bindings.py)
                internal[name] = pcol(v, "length")
            else:
                internal[name] = v
            continue
        icol = fresh_name("_prj")
        new_cols[icol] = cc.col(it.expr)
        internal[name] = icol
    if new_cols:
        df = df.withColumns(new_cols)
    # map output aliases into scope for ORDER BY (Cypher allows both)
    for it in items:
        name = it.alias or it.text
        if name not in vars_:
            vars_[name] = VarInfo("value")
    b = Bindings(df, vars_)
    # alias columns must be addressable by output name for ORDER BY
    for it in items:
        name = it.alias or it.text
        icol = internal[name]
        if icol != name and name not in b.df.columns and name.isidentifier():
            b = b.with_df(b.df.withColumn(name, F.col(icol)))
            internal[name] = name
    return b, internal


def _aggregate_projection(
    engine, bindings: Bindings, items, proj, params, subst
) -> tuple[Bindings, dict[str, str]]:
    cc = ExprCompiler(bindings, params, subst, engine.functions)

    # 1. grouping keys = items without aggregates
    key_items = [it for it in items if not contains_aggregate(it.expr)]
    group_cols: list[str] = []
    df = bindings.df
    key_internal: dict[str, str] = {}  # out name -> internal col
    vars_: dict[str, VarInfo] = {}
    carry: list[str] = []  # satellite columns grouped alongside bare vars
    for it in key_items:
        name = it.alias or it.text
        if isinstance(it.expr, Var) and it.expr.name in bindings.vars:
            v = it.expr.name
            if bindings.vars[v].kind == "path":
                # no base column — group by the satellites (p__length,
                # carried below) and expose the hop count as the value
                key_internal[name] = pcol(v, "length")
            else:
                group_cols.append(v)
                key_internal[name] = v
            vars_[v] = bindings.vars[v]
            # satellites are functionally dependent on the id — grouping by
            # them too keeps properties available after aggregation with
            # identical group granularity.
            carry.extend(c for c in bindings.var_columns(v) if c != v)
        else:
            icol = fresh_name("_k")
            df = df.withColumn(icol, cc.col(it.expr))
            group_cols.append(icol)
            key_internal[name] = icol

    # 2. every distinct aggregate sub-expression -> one agg column
    agg_nodes: dict = {}
    for it in items:
        for node in find_aggregates(it.expr):
            agg_nodes.setdefault(ast_key(node), node)
    for o in proj.order_by:
        for node in find_aggregates(o.expr):
            agg_nodes.setdefault(ast_key(node), node)

    cc2 = ExprCompiler(Bindings(df, bindings.vars), params, subst, engine.functions)
    # percentile regime: exact below the configured input-row estimate,
    # GK sketch above (only probe the plan when a percentile is present)
    approx_pct = False
    ceiling = getattr(engine, "percentile_exact_max_rows", None)
    if ceiling is not None and any(
        isinstance(n, FuncCall) and n.name in ("percentilecont", "percentiledisc")
        for n in agg_nodes.values()
    ):
        from pycypher_nmetl_spark.guards import plan_size_bytes

        size = plan_size_bytes(df)
        approx_pct = size is not None and (size / 100.0) > ceiling
    agg_map: dict = {}
    agg_exprs: list[Column] = []
    for k, node in agg_nodes.items():
        icol = fresh_name("_a")
        agg_exprs.append(_compile_aggregate(node, cc2, approx_pct).alias(icol))
        agg_map[k] = icol

    if group_cols or carry:
        gdf = df.groupBy(*group_cols, *dict.fromkeys(carry)).agg(*agg_exprs)
    else:
        gdf = df.agg(*agg_exprs)

    # 3. compile item expressions on the aggregated frame
    agg_b = Bindings(gdf, vars_)
    cc3 = ExprCompiler(agg_b, params, subst, engine.functions, agg_map)
    internal: dict[str, str] = {}
    new_cols: dict[str, Column] = {}
    for it in items:
        name = it.alias or it.text
        if name in key_internal:
            internal[name] = key_internal[name]
            continue
        icol = fresh_name("_prj")
        new_cols[icol] = cc3.col(it.expr)
        internal[name] = icol
    if new_cols:
        gdf = gdf.withColumns(new_cols)

    out_vars = dict(vars_)
    for it in items:
        name = it.alias or it.text
        info = VarInfo("value")
        # collect(n) of an entity var: remember what the list elements are
        # (ids of nodes/rels of these labels) so FOREACH-over-the-list
        # mutations can resolve the right tables (ids are per-label)
        e = it.expr
        if (
            isinstance(e, FuncCall)
            and e.name.lower() == "collect"
            and len(e.args) == 1
            and isinstance(e.args[0], Var)
        ):
            src = bindings.vars.get(e.args[0].name)
            if src is not None and src.kind in ("node", "rel"):
                info = VarInfo("value", src.labels, elem_kind=src.kind)
        out_vars.setdefault(name, info)
    b = Bindings(gdf, out_vars)
    for name, icol in list(internal.items()):
        if icol != name and name not in b.df.columns and name.isidentifier():
            b = b.with_df(b.df.withColumn(name, F.col(icol)))
            internal[name] = name
    b._agg_map = agg_map  # ORDER BY reuses precomputed aggregates
    return b, internal


def _sort_cols(engine, b: Bindings, proj, params, internal) -> list[Column]:
    agg_map = getattr(b, "_agg_map", {})
    cc = ExprCompiler(b, params, {}, engine.functions, agg_map)
    sort_cols = []
    for o in proj.order_by:
        # output alias takes priority (Cypher: ORDER BY may use aliases)
        if isinstance(o.expr, Var) and o.expr.name in internal:
            c = F.col(internal[o.expr.name])
        else:
            c = cc.col(o.expr)
        if o.ascending:
            c = c.asc_nulls_first() if o.nulls == "FIRST" else c.asc_nulls_last()
        else:
            c = c.desc_nulls_last() if o.nulls == "LAST" else c.desc_nulls_first()
        sort_cols.append(c)
    return sort_cols


def _apply_order(engine, b: Bindings, proj, params, internal) -> DataFrame:
    return b.df.orderBy(*_sort_cols(engine, b, proj, params, internal))
