"""Hand-written recursive-descent / Pratt parser for openCypher.

Covers the clause & expression surface inventoried in SURVEY.md §2 / §3
(reference grammar: packages/pycypher/src/pycypher/grammar.bnf, 1701
lines). Keywords are soft (contextual), so names like `count`, `size`,
`contains` still work as identifiers.
"""

from __future__ import annotations

from functools import lru_cache

from pycypher_nmetl_spark.cypher.ast_nodes import (
    BinOp, BoolOp, CallProc, CallSubquery, CaseExpr, Clause, Cmp,
    CountStar, Create,
    Delete, ExistsSub, Expr, Foreach, FuncCall, Index, InList, IsNull,
    LabelPred, ListComp, ListLit, Literal, MapLit, MapProjection, Match,
    Merge, NodePattern, Not, OrderItem, Param, PathPattern, PatternComp,
    PatternPred, Projection, Prop, QuantPathPattern, Quantifier, Query,
    Reduce, RelPattern,
    Remove, RemoveItem, ReturnItem, SetClause, SetItem, Slice, StringPred,
    UnaryOp, UnionQuery, Unwind, Var,
)
from pycypher_nmetl_spark.cypher.tokenizer import CypherSyntaxError, Token, tokenize

_CMP_OPS = {"=", "<>", "<", "<=", ">", ">="}
_CLAUSE_STARTERS = {
    "MATCH", "OPTIONAL", "WITH", "RETURN", "UNWIND", "CREATE", "SET",
    "REMOVE", "DELETE", "DETACH", "MERGE", "FOREACH", "CALL", "UNION",
}


class Parser:
    def __init__(self, text: str):
        self.text = text
        self.toks = tokenize(text)
        self.i = 0

    # ------------------------------------------------------------------ #
    # token helpers
    # ------------------------------------------------------------------ #
    def peek(self, k: int = 0) -> Token:
        return self.toks[min(self.i + k, len(self.toks) - 1)]

    def advance(self) -> Token:
        tok = self.toks[self.i]
        if tok.kind != "EOF":
            self.i += 1
        return tok

    def at_sym(self, *syms: str, k: int = 0) -> bool:
        t = self.peek(k)
        return t.kind == "SYM" and t.value in syms

    def eat_sym(self, *syms: str) -> bool:
        if self.at_sym(*syms):
            self.advance()
            return True
        return False

    def expect_sym(self, sym: str) -> Token:
        if not self.at_sym(sym):
            self.err(f"expected {sym!r}, got {self.peek().value!r}")
        return self.advance()

    def at_kw(self, *words: str, k: int = 0) -> bool:
        t = self.peek(k)
        return t.kind == "NAME" and t.upper in words

    def eat_kw(self, *words: str) -> bool:
        if self.at_kw(*words):
            self.advance()
            return True
        return False

    def expect_kw(self, word: str) -> None:
        if not self.eat_kw(word):
            self.err(f"expected {word}, got {self.peek().value!r}")

    def expect_name(self) -> str:
        t = self.peek()
        if t.kind != "NAME":
            self.err(f"expected identifier, got {t.value!r}")
        return self.advance().value

    def err(self, message: str):
        raise CypherSyntaxError(message, self.text, self.peek().pos)

    def checkpoint(self) -> int:
        return self.i

    def restore(self, cp: int) -> None:
        self.i = cp

    # ------------------------------------------------------------------ #
    # entry
    # ------------------------------------------------------------------ #
    def parse(self) -> Query | UnionQuery:
        branches = [self.parse_single_query()]
        alls: list[bool] = []
        while self.at_kw("UNION"):
            self.advance()
            alls.append(self.eat_kw("ALL"))
            branches.append(self.parse_single_query())
        self.eat_sym(";")
        if self.peek().kind != "EOF":
            self.err(f"unexpected trailing input {self.peek().value!r}")
        if len(branches) == 1:
            return branches[0]
        if any(alls) and not all(alls):
            # openCypher (and Neo4j) reject a query mixing the two forms
            # rather than silently picking one dedup behavior
            self.err("invalid combination of UNION and UNION ALL")
        return UnionQuery(branches, alls)

    def parse_single_query(self) -> Query:
        clauses: list[Clause] = []
        while True:
            t = self.peek()
            if t.kind == "EOF" or (t.kind == "SYM" and t.value == ";"):
                break
            if self.at_kw("UNION"):
                break
            clauses.append(self.parse_clause())
        if not clauses:
            self.err("empty query")
        return Query(clauses)

    # ------------------------------------------------------------------ #
    # clauses
    # ------------------------------------------------------------------ #
    def parse_clause(self) -> Clause:
        if self.at_kw("OPTIONAL"):
            self.advance()
            self.expect_kw("MATCH")
            return self.parse_match(optional=True)
        if self.eat_kw("MATCH"):
            return self.parse_match(optional=False)
        if self.eat_kw("WITH"):
            return self.parse_projection(is_return=False)
        if self.eat_kw("RETURN"):
            return self.parse_projection(is_return=True)
        if self.eat_kw("UNWIND"):
            expr = self.parse_expr()
            self.expect_kw("AS")
            return Unwind(expr, self.expect_name())
        if self.eat_kw("CREATE"):
            paths = [self.parse_path_pattern()]
            while self.eat_sym(","):
                paths.append(self.parse_path_pattern())
            self._reject_inline_where(paths, "CREATE")
            return Create(paths)
        if self.eat_kw("SET"):
            return SetClause(self.parse_set_items())
        if self.eat_kw("REMOVE"):
            items = [self.parse_remove_item()]
            while self.eat_sym(","):
                items.append(self.parse_remove_item())
            return Remove(items)
        if self.at_kw("DETACH") or self.at_kw("DELETE"):
            detach = self.eat_kw("DETACH")
            self.expect_kw("DELETE")
            exprs = [self.parse_expr()]
            while self.eat_sym(","):
                exprs.append(self.parse_expr())
            return Delete(exprs, detach=detach)
        if self.eat_kw("MERGE"):
            path = self.parse_path_pattern()
            self._reject_inline_where([path], "MERGE")
            on_create: list[SetItem] = []
            on_match: list[SetItem] = []
            while self.at_kw("ON"):
                self.advance()
                if self.eat_kw("CREATE"):
                    self.expect_kw("SET")
                    on_create.extend(self.parse_set_items())
                elif self.eat_kw("MATCH"):
                    self.expect_kw("SET")
                    on_match.extend(self.parse_set_items())
                else:
                    self.err("expected CREATE or MATCH after ON")
            return Merge(path, on_create, on_match)
        if self.eat_kw("FOREACH"):
            self.expect_sym("(")
            var = self.expect_name()
            self.expect_kw("IN")
            coll = self.parse_expr()
            self.expect_sym("|")
            inner: list[Clause] = []
            while not self.at_sym(")"):
                inner.append(self.parse_clause())
            self.expect_sym(")")
            return Foreach(var, coll, inner)
        if self.eat_kw("CALL"):
            if self.at_sym("{"):
                return self.parse_call_subquery()
            name = self.expect_name()
            while self.eat_sym("."):
                name += "." + self.expect_name()
            args: list[Expr] = []
            if self.eat_sym("("):
                if not self.at_sym(")"):
                    args.append(self.parse_expr())
                    while self.eat_sym(","):
                        args.append(self.parse_expr())
                self.expect_sym(")")
            yields: list[tuple[str, str | None]] = []
            where = None
            if self.eat_kw("YIELD"):
                while True:
                    fname = self.expect_name()
                    alias = self.expect_name() if self.eat_kw("AS") else None
                    yields.append((fname, alias))
                    if not self.eat_sym(","):
                        break
                if self.eat_kw("WHERE"):
                    where = self.parse_expr()
            return CallProc(name, args, yields, where)
        self.err(f"expected a clause, got {self.peek().value!r}")

    def parse_call_subquery(self) -> CallSubquery:
        """CALL { [WITH var[, var]*] clause* RETURN ... } — the importing
        WITH (Neo4j 4.x rules) must list PLAIN variables, first. UNION
        [ALL] between branches is allowed; each branch carries its OWN
        importing WITH (Neo4j post-union-processing idiom)."""
        self.expect_sym("{")
        branches = [self._parse_subquery_branch()]
        alls: list[bool] = []
        while self.at_kw("UNION"):
            self.advance()
            alls.append(self.eat_kw("ALL"))
            branches.append(self._parse_subquery_branch())
        self.expect_sym("}")
        if len(branches) == 1:
            return branches[0]
        if any(alls) and not all(alls):
            # same rule as top-level UNION: mixing the two forms is a
            # syntax error, never a silent dedup
            self.err("invalid combination of UNION and UNION ALL")
        return CallSubquery(
            [], (), False, branches=branches, alls=tuple(alls)
        )

    def _parse_subquery_branch(self) -> CallSubquery:
        """One CALL { } branch: optional importing WITH + clauses, up to
        '}' or a UNION separator."""
        imports: tuple[str, ...] = ()
        has_import_with = False
        # importing WITH: only if the branch starts with WITH of plain
        # vars (no aliases/expressions/modifiers) — peek-parse it
        if self.at_kw("WITH"):
            save = self.i
            self.advance()
            names: list[str] = []
            ok = True
            while True:
                if self.peek().kind != "NAME":
                    ok = False
                    break
                names.append(self.advance().value)
                if not self.eat_sym(","):
                    break
            # a plain-var WITH followed by another clause (not AS/ORDER/
            # WHERE/...) is an importing WITH; anything else rewinds and
            # parses as a normal projection inside the subquery
            if ok and not (
                self.at_kw("AS") or self.at_kw("ORDER") or self.at_kw("WHERE")
                or self.at_kw("LIMIT") or self.at_kw("SKIP")
                or self.at_kw("DISTINCT")
            ):
                imports = tuple(names)
                has_import_with = True
            else:
                self.i = save
        clauses: list[Clause] = []
        while not self.at_sym("}") and not self.at_kw("UNION"):
            if self.peek().kind == "EOF":
                self.err("unterminated CALL { subquery")
            clauses.append(self.parse_clause())
        if not clauses:
            self.err("empty CALL { } subquery")
        return CallSubquery(clauses, imports, has_import_with)

    def _reject_inline_where(self, paths, clause: str) -> None:
        for p in paths:
            for e in p.elements:
                if isinstance(e, NodePattern) and e.where is not None:
                    self.err(f"WHERE is not allowed inside a {clause} pattern")
                if isinstance(e, QuantPathPattern):
                    self.err(
                        f"a quantified path pattern is not allowed in {clause}"
                    )

    def parse_match(self, optional: bool) -> Match:
        paths = [self.parse_path_pattern()]
        while self.eat_sym(","):
            paths.append(self.parse_path_pattern())
        where = self.parse_expr() if self.eat_kw("WHERE") else None
        # hoist inline node-pattern predicates into the clause WHERE
        # (identical semantics; reuses the per-var pushdown machinery)
        inline = []
        for p in paths:
            for e in p.elements:
                if isinstance(e, NodePattern) and e.where is not None:
                    inline.append(e.where)
                    e.where = None  # hoisted — avoid double-apply on reformat
        if inline:
            conj = inline + ([where] if where is not None else [])
            where = conj[0] if len(conj) == 1 else BoolOp("AND", conj)
        return Match(paths, optional=optional, where=where)

    def parse_projection(self, is_return: bool) -> Projection:
        distinct = self.eat_kw("DISTINCT")
        star = False
        items: list[ReturnItem] = []
        if self.at_sym("*"):
            self.advance()
            star = True
            while self.eat_sym(","):
                items.append(self.parse_return_item())
        else:
            items.append(self.parse_return_item())
            while self.eat_sym(","):
                items.append(self.parse_return_item())
        order_by: list[OrderItem] = []
        if self.at_kw("ORDER"):
            self.advance()
            self.expect_kw("BY")
            while True:
                expr = self.parse_expr()
                asc = True
                if self.eat_kw("ASC", "ASCENDING"):
                    asc = True
                elif self.eat_kw("DESC", "DESCENDING"):
                    asc = False
                nulls = None
                if self.eat_kw("NULLS"):
                    nulls = "FIRST" if self.eat_kw("FIRST") else ("LAST" if self.eat_kw("LAST") else None)
                    if nulls is None:
                        self.err("expected FIRST or LAST after NULLS")
                order_by.append(OrderItem(expr, asc, nulls))
                if not self.eat_sym(","):
                    break
        skip = self.parse_expr() if self.eat_kw("SKIP", "OFFSET") else None
        limit = self.parse_expr() if self.eat_kw("LIMIT") else None
        where = None
        if not is_return and self.eat_kw("WHERE"):
            where = self.parse_expr()
        return Projection(
            items, star=star, distinct=distinct, order_by=order_by,
            skip=skip, limit=limit, where=where, is_return=is_return,
        )

    def parse_return_item(self) -> ReturnItem:
        start = self.peek().pos
        expr = self.parse_expr()
        end = self.peek().pos
        text = self.text[start:end].strip().rstrip(",").strip()
        alias = None
        if self.eat_kw("AS"):
            alias = self.expect_name()
        return ReturnItem(expr, alias, text)

    def parse_set_items(self) -> list[SetItem]:
        items = [self.parse_set_item()]
        while self.eat_sym(","):
            items.append(self.parse_set_item())
        return items

    def parse_set_item(self) -> SetItem:
        # forms: n.p = e | n += map | n = map | n:Label | n[expr] = e
        name = self.expect_name()
        if self.at_sym(":"):
            labels = []
            while self.eat_sym(":"):
                labels.append(self.expect_name())
            return SetItem("labels", Var(name), labels=labels)
        if self.eat_sym("."):
            key = self.expect_name()
            while self.eat_sym("."):
                key += "." + self.expect_name()
            self.expect_sym("=")
            return SetItem("prop", Prop(Var(name), key), value=self.parse_expr())
        if self.eat_sym("["):
            key_expr = self.parse_expr()
            self.expect_sym("]")
            self.expect_sym("=")
            return SetItem("dynamic", Var(name), value=self.parse_expr(), key_expr=key_expr)
        if self.eat_sym("+="):
            return SetItem("map_add", Var(name), value=self.parse_expr())
        if self.eat_sym("="):
            return SetItem("map_replace", Var(name), value=self.parse_expr())
        self.err("malformed SET item")

    def parse_remove_item(self) -> RemoveItem:
        name = self.expect_name()
        if self.at_sym(":"):
            labels = []
            while self.eat_sym(":"):
                labels.append(self.expect_name())
            return RemoveItem("labels", Var(name), labels=labels)
        self.expect_sym(".")
        key = self.expect_name()
        return RemoveItem("prop", Prop(Var(name), key))

    # ------------------------------------------------------------------ #
    # patterns
    # ------------------------------------------------------------------ #
    def parse_path_pattern(self) -> PathPattern:
        var = None
        if self.peek().kind == "NAME" and self.at_sym("=", k=1) and not self.at_kw(
            "SHORTESTPATH", "ALLSHORTESTPATHS"
        ):
            var = self.advance().value
            self.advance()  # '='
        shortest = None
        if self.at_kw("SHORTESTPATH", "ALLSHORTESTPATHS"):
            shortest = "shortest" if self.advance().upper == "SHORTESTPATH" else "allshortest"
            self.expect_sym("(")
            inner = self.parse_path_elements()
            self.expect_sym(")")
            return PathPattern(inner, var=var, shortest=shortest)
        return PathPattern(
            self.parse_path_elements(allow_plain_paren_first=True),
            var=var,
            shortest=None,
        )

    def parse_path_elements(self, allow_plain_paren_first: bool = False) -> list:
        # first element: node pattern, quantified parenthesized path
        # (GQL QPP), or — at the top of a path only — a plain
        # parenthesized path p = ((a)-[..]->(b)) whose elements splice in
        if allow_plain_paren_first and self.at_sym("(") and self.at_sym("(", k=1):
            self.advance()
            inner = self.parse_path_elements()
            self.expect_sym(")")
            q = self._parse_quantifier()
            elements: list = (
                inner if q is None else [QuantPathPattern(inner, q[0], q[1])]
            )
        else:
            elements = [self._parse_path_element()]
        while True:
            if self.at_sym("-", "<-"):
                elements.append(self.parse_rel_pattern())
                elements.append(self._parse_path_element())
            elif self.at_sym("(") and (
                self.at_sym("(", k=1)
                or isinstance(elements[-1], QuantPathPattern)
            ):
                # juxtaposition: a quantified pattern next to a node
                # pattern or another quantified pattern — the boundary
                # nodes are the same node (GQL path concatenation)
                elements.append(self._parse_path_element())
            else:
                return elements

    def _parse_path_element(self):
        """One path element: a node pattern, or a parenthesized path
        pattern with a quantifier (GQL QPP)."""
        if self.at_sym("(") and self.at_sym("(", k=1):
            self.advance()
            inner = self.parse_path_elements()
            self.expect_sym(")")
            q = self._parse_quantifier()
            if q is None:
                self.err(
                    "a parenthesized path pattern element requires a "
                    "quantifier ({m,n}, {n}, + or *)"
                )
            return QuantPathPattern(inner, q[0], q[1])
        return self.parse_node_pattern()

    def _parse_quantifier(self) -> tuple[int, int] | None:
        """GQL pattern quantifier after a parenthesized path: + | * |
        {n} | {m,n} | {m,} | {,n}. None when no quantifier follows."""
        if self.eat_sym("+"):
            return (1, -1)  # -1 = unbounded (capped by the compiler)
        if self.eat_sym("*"):
            return (0, -1)
        if not self.at_sym("{"):
            return None
        self.advance()
        lo = None
        if self.peek().kind == "INT":
            lo = int(self.advance().value)
        if self.eat_sym(","):
            hi = -1
            if self.peek().kind == "INT":
                hi = int(self.advance().value)
        else:
            if lo is None:
                self.err("empty path-pattern quantifier {}")
            hi = lo  # {n} = exactly n
        self.expect_sym("}")
        lo = lo if lo is not None else 0
        if hi != -1 and hi < lo:
            self.err(f"invalid quantifier {{{lo},{hi}}}: max < min")
        return (lo, hi)

    def parse_node_pattern(self) -> NodePattern:
        self.expect_sym("(")
        var = None
        labels: list[str] = []
        props = None
        if self.peek().kind == "NAME" and not self.at_sym(":", k=1) and not self.at_sym(
            ")", k=1
        ) and not self.at_sym("{", k=1):
            # e.g. (n) handled below; this branch unreachable, kept for clarity
            pass
        if self.peek().kind == "NAME":
            var = self.advance().value
        while self.eat_sym(":"):
            labels.append(self.expect_name())
        if self.at_sym("{"):
            props = self.parse_map_literal()
        elif self.peek().kind == "PARAM":
            # (n:Label $props) — parameter property map (openCypher)
            props = Param(self.advance().value)
        where = None
        if self.at_kw("WHERE"):
            # Neo4j-5 inline predicate: (n:Label {p: v} WHERE expr)
            self.advance()
            where = self.parse_expr()
        self.expect_sym(")")
        return NodePattern(var, labels, props, where)

    def parse_rel_pattern(self) -> RelPattern:
        direction = "U"
        if self.eat_sym("<-"):
            direction = "L"
        else:
            self.expect_sym("-")
        var = None
        types: list[str] = []
        props = None
        varlength = False
        min_hops = max_hops = None
        if self.eat_sym("["):
            if self.peek().kind == "NAME" and not self.at_sym(":", k=0):
                var = self.advance().value
            while self.eat_sym(":"):
                types.append(self.expect_name())
                while self.eat_sym("|"):
                    self.eat_sym(":")
                    types.append(self.expect_name())
            if self.eat_sym("*"):
                varlength = True
                if self.peek().kind == "INT":
                    min_hops = int(self.advance().value)
                if self.eat_sym(".."):
                    if self.peek().kind == "INT":
                        max_hops = int(self.advance().value)
                elif min_hops is not None:
                    max_hops = min_hops  # [*2] = exactly 2
            if self.at_sym("{"):
                props = self.parse_map_literal()
            elif self.peek().kind == "PARAM":
                props = Param(self.advance().value)
            self.expect_sym("]")
            if self.eat_sym("->"):
                if direction == "L":
                    self.err("pattern cannot have arrows on both ends")
                direction = "R"
            else:
                self.expect_sym("-")
        else:
            # -- / --> / <--
            if self.eat_sym("->"):
                if direction == "L":
                    self.err("pattern cannot have arrows on both ends")
                direction = "R"
            else:
                self.expect_sym("-")
        return RelPattern(var, types, direction, min_hops, max_hops, varlength, props)

    # ------------------------------------------------------------------ #
    # expressions (Pratt, precedence climbing)
    # ------------------------------------------------------------------ #
    def parse_expr(self) -> Expr:
        return self.parse_or()

    def parse_or(self) -> Expr:
        left = self.parse_xor()
        if self.at_kw("OR"):
            ops = [left]
            while self.eat_kw("OR"):
                ops.append(self.parse_xor())
            return BoolOp("OR", ops)
        return left

    def parse_xor(self) -> Expr:
        left = self.parse_and()
        if self.at_kw("XOR"):
            ops = [left]
            while self.eat_kw("XOR"):
                ops.append(self.parse_and())
            return BoolOp("XOR", ops)
        return left

    def parse_and(self) -> Expr:
        left = self.parse_not()
        if self.at_kw("AND"):
            ops = [left]
            while self.eat_kw("AND"):
                ops.append(self.parse_not())
            return BoolOp("AND", ops)
        return left

    def parse_not(self) -> Expr:
        if self.eat_kw("NOT"):
            return Not(self.parse_not())
        return self.parse_comparison()

    def parse_comparison(self) -> Expr:
        left = self.parse_addsub()
        # chained comparisons
        if self.at_sym(*_CMP_OPS):
            rest = []
            while self.at_sym(*_CMP_OPS):
                op = self.advance().value
                rest.append((op, self.parse_addsub()))
            left = Cmp(left, rest)
        # predicate suffixes (IN / IS NULL / STARTS WITH / ...)
        while True:
            if self.at_kw("IN"):
                self.advance()
                left = InList(left, self.parse_addsub())
            elif self.at_kw("IS"):
                self.advance()
                negated = self.eat_kw("NOT")
                self.expect_kw("NULL")
                left = IsNull(left, negated=negated)
            elif self.at_kw("STARTS"):
                self.advance()
                self.expect_kw("WITH")
                left = StringPred("STARTS_WITH", left, self.parse_addsub())
            elif self.at_kw("ENDS"):
                self.advance()
                self.expect_kw("WITH")
                left = StringPred("ENDS_WITH", left, self.parse_addsub())
            elif self.at_kw("CONTAINS") and not self.at_sym("(", k=1):
                self.advance()
                left = StringPred("CONTAINS", left, self.parse_addsub())
            elif self.at_sym("=~"):
                self.advance()
                left = StringPred("REGEX", left, self.parse_addsub())
            else:
                break
        return left

    def parse_addsub(self) -> Expr:
        left = self.parse_muldiv()
        while self.at_sym("+", "-"):
            op = self.advance().value
            left = BinOp(op, left, self.parse_muldiv())
        return left

    def parse_muldiv(self) -> Expr:
        left = self.parse_power()
        while self.at_sym("*", "/", "%"):
            op = self.advance().value
            left = BinOp(op, left, self.parse_power())
        return left

    def parse_power(self) -> Expr:
        left = self.parse_unary()
        if self.at_sym("^"):
            self.advance()
            return BinOp("^", left, self.parse_power())  # right-assoc
        return left

    def parse_unary(self) -> Expr:
        if self.at_sym("-"):
            self.advance()
            return UnaryOp("-", self.parse_unary())
        if self.at_sym("+"):
            self.advance()
            return UnaryOp("+", self.parse_unary())
        return self.parse_postfix()

    def parse_postfix(self) -> Expr:
        expr = self.parse_atom()
        while True:
            if self.at_sym("."):
                # property access — but not `1.` (handled by tokenizer as float)
                self.advance()
                key = self.expect_name()
                expr = Prop(expr, key)
            elif self.at_sym("["):
                self.advance()
                lo = None if self.at_sym("..") else self.parse_expr()
                if self.eat_sym(".."):
                    hi = None if self.at_sym("]") else self.parse_expr()
                    expr = Slice(expr, lo, hi)
                else:
                    expr = Index(expr, lo)
                self.expect_sym("]")
            elif (
                self.at_sym(":")
                and isinstance(expr, Var)
                and self.peek(1).kind == "NAME"
            ):
                labels = []
                while self.eat_sym(":"):
                    labels.append(self.expect_name())
                expr = LabelPred(expr.name, labels)
            elif self.at_sym("{") and isinstance(expr, Var):
                expr = self.parse_map_projection(expr.name)
            else:
                return expr

    # ---------------------------------------------------------------- #
    def parse_atom(self) -> Expr:
        t = self.peek()
        if t.kind == "INT":
            self.advance()
            return Literal(int(t.value))
        if t.kind == "FLOAT":
            self.advance()
            return Literal(float(t.value))
        if t.kind == "STRING":
            self.advance()
            return Literal(t.value)
        if t.kind == "PARAM":
            self.advance()
            return Param(t.value)
        if self.at_sym("["):
            return self.parse_bracket_atom()
        if self.at_sym("{"):
            return self.parse_map_literal()
        if self.at_sym("("):
            return self.parse_paren_atom()
        if t.kind == "NAME":
            up = t.upper
            if up == "TRUE":
                self.advance()
                return Literal(True)
            if up == "FALSE":
                self.advance()
                return Literal(False)
            if up == "NULL":
                self.advance()
                return Literal(None)
            if up == "CASE":
                return self.parse_case()
            if up in ("ALL", "ANY", "NONE", "SINGLE") and self.at_sym("(", k=1):
                cp = self.checkpoint()
                self.advance()
                self.advance()  # '('
                if self.peek().kind == "NAME" and self.at_kw("IN", k=1):
                    var = self.expect_name()
                    self.expect_kw("IN")
                    coll = self.parse_expr()
                    where = self.parse_expr() if self.eat_kw("WHERE") else None
                    self.expect_sym(")")
                    return Quantifier(up, var, coll, where)
                self.restore(cp)
                # fall through: treat as function call
            if up == "REDUCE" and self.at_sym("(", k=1):
                self.advance()
                self.expect_sym("(")
                acc = self.expect_name()
                self.expect_sym("=")
                init = self.parse_expr()
                self.expect_sym(",")
                var = self.expect_name()
                self.expect_kw("IN")
                coll = self.parse_expr()
                self.expect_sym("|")
                body = self.parse_expr()
                self.expect_sym(")")
                return Reduce(acc, init, var, coll, body)
            if up == "EXISTS" and self.at_sym("{", k=1):
                self.advance()
                self.expect_sym("{")
                self.eat_kw("MATCH")
                paths = [self.parse_path_pattern()]
                while self.eat_sym(","):
                    paths.append(self.parse_path_pattern())
                where = self.parse_expr() if self.eat_kw("WHERE") else None
                self.expect_sym("}")
                return ExistsSub(paths, where)
            if up == "EXISTS" and self.at_sym("(", k=1) and self.at_sym("(", k=2):
                cp = self.checkpoint()
                self.advance()
                self.expect_sym("(")
                try:
                    path = self.parse_path_pattern()
                    self.expect_sym(")")
                    return ExistsSub([path], None)
                except CypherSyntaxError:
                    self.restore(cp)
            if up == "COUNT" and self.at_sym("(", k=1) and self.at_sym("*", k=2):
                self.advance()
                self.advance()
                self.advance()
                self.expect_sym(")")
                return CountStar()
            # function call (possibly namespaced)?
            cp = self.checkpoint()
            name = self.advance().value
            while self.at_sym(".") and self.peek(1).kind == "NAME" and self.at_sym("(", k=2):
                self.advance()
                name += "." + self.advance().value
            if self.at_sym("("):
                self.advance()
                distinct = self.eat_kw("DISTINCT")
                args: list[Expr] = []
                if not self.at_sym(")"):
                    args.append(self.parse_expr())
                    while self.eat_sym(","):
                        args.append(self.parse_expr())
                self.expect_sym(")")
                return FuncCall(name.lower(), args, distinct=distinct)
            self.restore(cp)
            self.advance()
            return Var(t.value)
        self.err(f"unexpected token {t.value!r}")

    def parse_paren_atom(self) -> Expr:
        """'(' — either a parenthesized expression or a bare pattern predicate."""
        cp = self.checkpoint()
        # try pattern predicate: (n)-[:X]->(m) ...
        try:
            path = self.parse_path_pattern()
            if len(path.elements) > 1:
                return PatternPred(path)
        except CypherSyntaxError:
            pass
        self.restore(cp)
        self.expect_sym("(")
        expr = self.parse_expr()
        self.expect_sym(")")
        return expr

    def parse_bracket_atom(self) -> Expr:
        """'[' — list literal, list comprehension, or pattern comprehension."""
        cp = self.checkpoint()
        self.expect_sym("[")
        # pattern comprehension: [(a)-[]->(b) WHERE p | proj]
        if self.at_sym("(") or (self.peek().kind == "NAME" and self.at_sym("=", k=1)):
            try:
                path = self.parse_path_pattern()
                if len(path.elements) > 1 or self.at_kw("WHERE") or self.at_sym("|"):
                    where = self.parse_expr() if self.eat_kw("WHERE") else None
                    self.expect_sym("|")
                    proj = self.parse_expr()
                    self.expect_sym("]")
                    return PatternComp(path, where, proj)
            except CypherSyntaxError:
                pass
            self.restore(cp)
            self.expect_sym("[")
        # list comprehension: [x IN xs WHERE p | e]
        if self.peek().kind == "NAME" and self.at_kw("IN", k=1):
            var = self.expect_name()
            self.expect_kw("IN")
            coll = self.parse_expr()
            where = self.parse_expr() if self.eat_kw("WHERE") else None
            proj = None
            if self.eat_sym("|"):
                proj = self.parse_expr()
            self.expect_sym("]")
            return ListComp(var, coll, where, proj)
        items: list[Expr] = []
        if not self.at_sym("]"):
            items.append(self.parse_expr())
            while self.eat_sym(","):
                items.append(self.parse_expr())
        self.expect_sym("]")
        return ListLit(items)

    def parse_map_literal(self) -> MapLit:
        self.expect_sym("{")
        pairs: list[tuple[str, Expr]] = []
        if not self.at_sym("}"):
            while True:
                t = self.peek()
                if t.kind in ("NAME", "STRING"):
                    key = self.advance().value
                else:
                    self.err("expected map key")
                self.expect_sym(":")
                pairs.append((key, self.parse_expr()))
                if not self.eat_sym(","):
                    break
        self.expect_sym("}")
        return MapLit(pairs)

    def parse_map_projection(self, var: str) -> MapProjection:
        self.expect_sym("{")
        items: list[tuple[str, object]] = []
        if not self.at_sym("}"):
            while True:
                if self.eat_sym("."):
                    if self.eat_sym("*"):
                        items.append(("all", None))
                    else:
                        items.append(("prop", self.expect_name()))
                elif self.peek().kind == "NAME" and self.at_sym(":", k=1):
                    key = self.advance().value
                    self.advance()
                    items.append(("expr", (key, self.parse_expr())))
                else:
                    items.append(("var", self.expect_name()))
                if not self.eat_sym(","):
                    break
        self.expect_sym("}")
        return MapProjection(var, items)

    def parse_case(self) -> CaseExpr:
        self.expect_kw("CASE")
        operand = None
        if not self.at_kw("WHEN"):
            operand = self.parse_expr()
        whens: list[tuple[Expr, Expr]] = []
        while self.eat_kw("WHEN"):
            cond = self.parse_expr()
            self.expect_kw("THEN")
            whens.append((cond, self.parse_expr()))
        default = self.parse_expr() if self.eat_kw("ELSE") else None
        self.expect_kw("END")
        if not whens:
            self.err("CASE requires at least one WHEN")
        return CaseExpr(operand, whens, default)


@lru_cache(maxsize=512)
def parse(text: str) -> Query | UnionQuery:
    """Parse with an LRU cache, mirroring the reference's AST cache
    (reference: ast_converter.py:186-271, LRU-512).

    Pathologically nested input (thousands of open parens/brackets)
    exhausts the recursive-descent stack; surface that as a positioned
    syntax error, never a raw RecursionError."""
    try:
        return Parser(text).parse()
    except RecursionError:
        raise CypherSyntaxError(
            "query too deeply nested", text, 0
        ) from None
