"""Cypher pretty-printer: AST -> canonical text
(reference: query_formatter.py — one clause per line, canonical casing).
"""

from __future__ import annotations

from pycypher_nmetl_spark.cypher.ast_nodes import (
    BinOp, BoolOp, CallProc, CallSubquery, CaseExpr, Cmp, CountStar,
    Create, Delete,
    ExistsSub, Foreach, FuncCall, Index, InList, IsNull, LabelPred,
    ListComp, ListLit, Literal, MapLit, MapProjection, Match, Merge,
    NodePattern, Not, OrderItem, Param, PathPattern, PatternComp,
    PatternPred, Projection, Prop, Quantifier, Query, Reduce, RelPattern,
    Remove, SetClause, SetItem, Slice, StringPred, UnaryOp, UnionQuery,
    Unwind, Var,
)


def format_query(ast: Query | UnionQuery) -> str:
    if isinstance(ast, UnionQuery):
        parts = [format_query(ast.branches[0])]
        for all_, branch in zip(ast.alls, ast.branches[1:]):
            parts.append("UNION ALL" if all_ else "UNION")
            parts.append(format_query(branch))
        return "\n".join(parts)
    return "\n".join(_clause(c) for c in ast.clauses)


def _clause(c) -> str:
    if isinstance(c, Match):
        head = "OPTIONAL MATCH " if c.optional else "MATCH "
        out = head + ", ".join(_path(p) for p in c.paths)
        if c.where is not None:
            out += "\nWHERE " + _e(c.where)
        return out
    if isinstance(c, Projection):
        head = "RETURN" if c.is_return else "WITH"
        if c.distinct:
            head += " DISTINCT"
        items = []
        if c.star:
            items.append("*")
        items += [
            _e(it.expr) + (f" AS {it.alias}" if it.alias else "") for it in c.items
        ]
        out = f"{head} " + ", ".join(items)
        if c.order_by:
            out += "\nORDER BY " + ", ".join(_order(o) for o in c.order_by)
        if c.skip is not None:
            out += f"\nSKIP {_e(c.skip)}"
        if c.limit is not None:
            out += f"\nLIMIT {_e(c.limit)}"
        if c.where is not None:
            out += "\nWHERE " + _e(c.where)
        return out
    if isinstance(c, Unwind):
        return f"UNWIND {_e(c.expr)} AS {c.var}"
    if isinstance(c, Create):
        return "CREATE " + ", ".join(_path(p) for p in c.paths)
    if isinstance(c, SetClause):
        return "SET " + ", ".join(_set_item(i) for i in c.items)
    if isinstance(c, Remove):
        items = []
        for i in c.items:
            if i.kind == "prop":
                items.append(_e(i.target))
            else:
                items.append(_e(i.target) + "".join(f":{l}" for l in i.labels))
        return "REMOVE " + ", ".join(items)
    if isinstance(c, Delete):
        head = "DETACH DELETE" if c.detach else "DELETE"
        return f"{head} " + ", ".join(_e(x) for x in c.exprs)
    if isinstance(c, Merge):
        out = "MERGE " + _path(c.path)
        if c.on_create:
            out += "\nON CREATE SET " + ", ".join(_set_item(i) for i in c.on_create)
        if c.on_match:
            out += "\nON MATCH SET " + ", ".join(_set_item(i) for i in c.on_match)
        return out
    if isinstance(c, Foreach):
        inner = " ".join(_clause(x) for x in c.clauses)
        return f"FOREACH ({c.var} IN {_e(c.collection)} | {inner})"
    if isinstance(c, CallProc):
        out = f"CALL {c.name}(" + ", ".join(_e(a) for a in c.args) + ")"
        if c.yields:
            out += " YIELD " + ", ".join(
                f + (f" AS {a}" if a else "") for f, a in c.yields
            )
        return out
    if isinstance(c, CallSubquery):
        inner = []
        if c.has_import_with:
            inner.append("WITH " + ", ".join(c.imports))
        inner.extend(_clause(sc) for sc in c.clauses)
        body = "\n".join("  " + line for cl in inner for line in cl.split("\n"))
        return "CALL {\n" + body + "\n}"
    raise NotImplementedError(type(c).__name__)


def _set_item(i: SetItem) -> str:
    if i.kind == "prop":
        return f"{_e(i.target)} = {_e(i.value)}"
    if i.kind == "map_add":
        return f"{_e(i.target)} += {_e(i.value)}"
    if i.kind == "map_replace":
        return f"{_e(i.target)} = {_e(i.value)}"
    if i.kind == "labels":
        return _e(i.target) + "".join(f":{l}" for l in i.labels)
    if i.kind == "dynamic":
        return f"{_e(i.target)}[{_e(i.key_expr)}] = {_e(i.value)}"
    raise NotImplementedError(i.kind)


def _quantifier(lo: int, hi: int) -> str:
    if (lo, hi) == (1, -1):
        return "+"
    if (lo, hi) == (0, -1):
        return "*"
    if hi == -1:
        return f"{{{lo},}}"
    if lo == hi:
        return f"{{{lo}}}"
    return f"{{{lo},{hi}}}"


def _path(p: PathPattern) -> str:
    body = _path_elements(p.elements)
    if p.shortest:
        fn = "shortestPath" if p.shortest == "shortest" else "allShortestPaths"
        body = f"{fn}({body})"
    return f"{p.var} = {body}" if p.var else body


def _path_elements(elements: list) -> str:
    body = ""
    for el in elements:
        if not isinstance(el, (NodePattern, RelPattern)):
            # GQL quantified path pattern
            body += f"({_path_elements(el.elements)})" + _quantifier(
                el.min_reps, el.max_reps
            )
        elif isinstance(el, NodePattern):
            inner = el.var or ""
            inner += "".join(f":{l}" for l in el.labels)
            if el.props:
                inner += (" " if inner else "") + _e(el.props)
            if el.where is not None:
                inner += (" " if inner else "") + f"WHERE {_e(el.where)}"
            body += f"({inner})"
        else:
            inner = el.var or ""
            if el.types:
                inner += ":" + "|".join(el.types)
            if el.varlength:
                inner += "*"
                if el.min_hops is not None:
                    inner += str(el.min_hops)
                if el.max_hops is not None and el.max_hops != el.min_hops:
                    inner += f"..{el.max_hops}"
            if el.props:
                inner += " " + _e(el.props)
            arrow = f"-[{inner}]-" if inner else "--"
            if el.direction == "R":
                body += arrow + ">"
            elif el.direction == "L":
                body += "<" + arrow
            else:
                body += arrow
    return body


def _order(o: OrderItem) -> str:
    out = _e(o.expr)
    if not o.ascending:
        out += " DESC"
    if o.nulls:
        out += f" NULLS {o.nulls}"
    return out


def _e(e) -> str:  # noqa: C901
    if isinstance(e, Literal):
        if e.value is None:
            return "null"
        if isinstance(e.value, bool):
            return str(e.value).lower()
        if isinstance(e.value, str):
            return "'" + e.value.replace("'", "\\'") + "'"
        return repr(e.value)
    if isinstance(e, Var):
        return e.name
    if isinstance(e, Param):
        return f"${e.name}"
    if isinstance(e, Prop):
        return f"{_e(e.target)}.{e.key}"
    if isinstance(e, CountStar):
        return "count(*)"
    if isinstance(e, FuncCall):
        d = "DISTINCT " if e.distinct else ""
        return f"{e.name}({d}" + ", ".join(_e(a) for a in e.args) + ")"
    if isinstance(e, BinOp):
        return f"({_e(e.left)} {e.op} {_e(e.right)})"
    if isinstance(e, UnaryOp):
        return f"{e.op}{_e(e.operand)}"
    if isinstance(e, Cmp):
        out = _e(e.first)
        for op, rhs in e.rest:
            out += f" {op} {_e(rhs)}"
        return f"({out})"
    if isinstance(e, BoolOp):
        return "(" + f" {e.op} ".join(_e(x) for x in e.operands) + ")"
    if isinstance(e, Not):
        return f"NOT {_e(e.operand)}"
    if isinstance(e, IsNull):
        return f"{_e(e.operand)} IS {'NOT ' if e.negated else ''}NULL"
    if isinstance(e, StringPred):
        kw = {
            "STARTS_WITH": "STARTS WITH", "ENDS_WITH": "ENDS WITH",
            "CONTAINS": "CONTAINS", "REGEX": "=~",
        }[e.kind]
        return f"({_e(e.left)} {kw} {_e(e.right)})"
    if isinstance(e, InList):
        return f"({_e(e.item)} IN {_e(e.collection)})"
    if isinstance(e, ListLit):
        return "[" + ", ".join(_e(x) for x in e.items) + "]"
    if isinstance(e, MapLit):
        return "{" + ", ".join(f"{k}: {_e(v)}" for k, v in e.pairs) + "}"
    if isinstance(e, Index):
        return f"{_e(e.target)}[{_e(e.index)}]"
    if isinstance(e, Slice):
        lo = _e(e.lo) if e.lo is not None else ""
        hi = _e(e.hi) if e.hi is not None else ""
        return f"{_e(e.target)}[{lo}..{hi}]"
    if isinstance(e, CaseExpr):
        out = "CASE"
        if e.operand is not None:
            out += f" {_e(e.operand)}"
        for w, t in e.whens:
            out += f" WHEN {_e(w)} THEN {_e(t)}"
        if e.default is not None:
            out += f" ELSE {_e(e.default)}"
        return out + " END"
    if isinstance(e, ListComp):
        out = f"[{e.var} IN {_e(e.collection)}"
        if e.where is not None:
            out += f" WHERE {_e(e.where)}"
        if e.projection is not None:
            out += f" | {_e(e.projection)}"
        return out + "]"
    if isinstance(e, Quantifier):
        out = f"{e.kind.lower()}({e.var} IN {_e(e.collection)}"
        if e.where is not None:
            out += f" WHERE {_e(e.where)}"
        return out + ")"
    if isinstance(e, Reduce):
        return (
            f"reduce({e.acc} = {_e(e.init)}, {e.var} IN {_e(e.collection)}"
            f" | {_e(e.body)})"
        )
    if isinstance(e, LabelPred):
        return e.var + "".join(f":{l}" for l in e.labels)
    if isinstance(e, PatternPred):
        return ("NOT " if e.negated else "") + _path(e.path)
    if isinstance(e, ExistsSub):
        return "EXISTS { " + ", ".join(_path(p) for p in e.paths) + (
            f" WHERE {_e(e.where)}" if e.where is not None else ""
        ) + " }"
    if isinstance(e, PatternComp):
        out = f"[{_path(e.path)}"
        if e.where is not None:
            out += f" WHERE {_e(e.where)}"
        return out + f" | {_e(e.projection)}]"
    if isinstance(e, MapProjection):
        items = []
        for kind, payload in e.items:
            if kind == "prop":
                items.append(f".{payload}")
            elif kind == "var":
                items.append(payload)
            elif kind == "expr":
                items.append(f"{payload[0]}: {_e(payload[1])}")
            elif kind == "all":
                items.append(".*")
        return e.var + "{" + ", ".join(items) + "}"
    raise NotImplementedError(type(e).__name__)
