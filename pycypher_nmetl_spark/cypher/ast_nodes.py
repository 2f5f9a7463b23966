"""Typed Cypher AST (dataclasses).

Mirrors the semantic surface of the reference's Pydantic models
(reference: packages/pycypher/src/pycypher/ast_models/expressions.py,
clauses.py) without the Pydantic dependency.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any, Optional


class Expr:
    pass


@dataclass
class Literal(Expr):
    value: Any  # int | float | str | bool | None


@dataclass
class ListLit(Expr):
    items: list[Expr]


@dataclass
class MapLit(Expr):
    pairs: list[tuple[str, Expr]]


@dataclass
class Param(Expr):
    name: str


@dataclass
class Var(Expr):
    name: str


@dataclass
class Prop(Expr):
    target: Expr
    key: str


@dataclass
class FuncCall(Expr):
    name: str          # lowercased; may be namespaced ("duration.between")
    args: list[Expr]
    distinct: bool = False


@dataclass
class CountStar(Expr):
    pass


@dataclass
class BinOp(Expr):
    op: str  # + - * / % ^
    left: Expr
    right: Expr


@dataclass
class UnaryOp(Expr):
    op: str  # - +
    operand: Expr


@dataclass
class Cmp(Expr):
    """Chained comparison: a < b <= c  ==  (a<b) AND (b<=c)."""

    first: Expr
    rest: list[tuple[str, Expr]]  # op in {=, <>, <, <=, >, >=}


@dataclass
class BoolOp(Expr):
    op: str  # AND OR XOR
    operands: list[Expr]


@dataclass
class Not(Expr):
    operand: Expr


@dataclass
class IsNull(Expr):
    operand: Expr
    negated: bool = False


@dataclass
class StringPred(Expr):
    kind: str  # STARTS_WITH ENDS_WITH CONTAINS REGEX
    left: Expr
    right: Expr


@dataclass
class InList(Expr):
    item: Expr
    collection: Expr


@dataclass
class Index(Expr):
    target: Expr
    index: Expr


@dataclass
class Slice(Expr):
    target: Expr
    lo: Optional[Expr]
    hi: Optional[Expr]


@dataclass
class CaseExpr(Expr):
    operand: Optional[Expr]  # simple CASE when not None
    whens: list[tuple[Expr, Expr]]
    default: Optional[Expr]


@dataclass
class ListComp(Expr):
    """[x IN xs WHERE pred | proj]"""

    var: str
    collection: Expr
    where: Optional[Expr]
    projection: Optional[Expr]


@dataclass
class Quantifier(Expr):
    kind: str  # ALL ANY NONE SINGLE
    var: str
    collection: Expr
    where: Optional[Expr]


@dataclass
class Reduce(Expr):
    acc: str
    init: Expr
    var: str
    collection: Expr
    body: Expr


@dataclass
class LabelPred(Expr):
    """n:Person[:Extra...] used as a predicate."""

    var: str
    labels: list[str]


@dataclass
class PatternPred(Expr):
    """Bare pattern as predicate: WHERE (n)-[:KNOWS]->(:Person)"""

    path: "PathPattern"
    negated: bool = False


@dataclass
class ExistsSub(Expr):
    """EXISTS { MATCH ... } or exists((n)-[]->())"""

    paths: list["PathPattern"]
    where: Optional[Expr] = None


@dataclass
class PatternComp(Expr):
    """[(a)-[r]->(b) WHERE p | proj]"""

    path: "PathPattern"
    where: Optional[Expr]
    projection: Expr


@dataclass
class MapProjection(Expr):
    """m{.k, var, key: expr, .*}"""

    var: str
    items: list[tuple[str, Any]]  # (kind, payload): prop/var/expr/all


# ---------------------------------------------------------------------- #
# patterns
# ---------------------------------------------------------------------- #
@dataclass
class NodePattern:
    var: Optional[str]
    labels: list[str]
    props: Optional[MapLit]
    # Neo4j-5 inline predicate `(n:L WHERE n.x > 1)` — hoisted by the
    # parser into the enclosing MATCH's WHERE (same semantics)
    where: Optional[Expr] = None
    # compiler-internal (never set by the parser): the node's binding is
    # consumed as a bare id only — no property/label-column reads follow
    # — so the hop compiler may bind it from the edge endpoint column
    # and skip the node-table join when the edge's registered endpoint
    # label already proves the label constraint (the same edge-implies-
    # endpoint footing the var-length hop table stands on)
    id_only: bool = False


@dataclass
class RelPattern:
    var: Optional[str]
    types: list[str]
    direction: str  # 'R' (->), 'L' (<-), 'U' (undirected)
    min_hops: Optional[int] = None  # None,None => fixed single hop
    max_hops: Optional[int] = None
    varlength: bool = False
    props: Optional[MapLit] = None


@dataclass
class QuantPathPattern:
    """GQL quantified path pattern element: ((a)-[r:T]->(b)){m,n}.

    Appears inside PathPattern.elements between (optional) outer node
    patterns; `elements` is the inner NodePattern/RelPattern chain.
    Desugared by compiler/qpp.py into a union of fixed-repetition
    expansions (beyond-reference: the reference grammar has no QPP)."""

    elements: list  # inner NodePattern/RelPattern alternating chain
    min_reps: int
    max_reps: int


@dataclass
class PathPattern:
    elements: list  # NodePattern, RelPattern alternating (+ QuantPathPattern)
    var: Optional[str] = None  # p = (a)-[..]->(b)
    shortest: Optional[str] = None  # 'shortest' | 'allshortest'


# ---------------------------------------------------------------------- #
# clauses
# ---------------------------------------------------------------------- #
class Clause:
    pass


@dataclass
class Match(Clause):
    paths: list[PathPattern]
    optional: bool = False
    where: Optional[Expr] = None


@dataclass
class ReturnItem:
    expr: Expr
    alias: Optional[str]
    text: str  # raw source text, Cypher's default column name


@dataclass
class OrderItem:
    expr: Expr
    ascending: bool = True
    nulls: Optional[str] = None  # 'FIRST' | 'LAST'


@dataclass
class Projection(Clause):
    """WITH or RETURN."""

    items: list[ReturnItem]
    star: bool = False
    distinct: bool = False
    order_by: list[OrderItem] = field(default_factory=list)
    skip: Optional[Expr] = None
    limit: Optional[Expr] = None
    where: Optional[Expr] = None  # trailing WHERE (WITH only)
    is_return: bool = False


@dataclass
class Unwind(Clause):
    expr: Expr
    var: str


@dataclass
class Create(Clause):
    paths: list[PathPattern]


@dataclass
class SetItem:
    kind: str  # 'prop' | 'map_add' | 'map_replace' | 'labels' | 'dynamic'
    target: Expr  # Var or Prop
    value: Optional[Expr] = None
    labels: list[str] = field(default_factory=list)
    key_expr: Optional[Expr] = None  # dynamic n[key] = v


@dataclass
class SetClause(Clause):
    items: list[SetItem]


@dataclass
class RemoveItem:
    kind: str  # 'prop' | 'labels'
    target: Expr
    labels: list[str] = field(default_factory=list)


@dataclass
class Remove(Clause):
    items: list[RemoveItem]


@dataclass
class Delete(Clause):
    exprs: list[Expr]
    detach: bool = False


@dataclass
class Merge(Clause):
    path: PathPattern
    on_create: list[SetItem] = field(default_factory=list)
    on_match: list[SetItem] = field(default_factory=list)


@dataclass
class Foreach(Clause):
    var: str
    collection: Expr
    clauses: list[Clause]


@dataclass
class CallProc(Clause):
    name: str
    args: list[Expr]
    yields: list[tuple[str, Optional[str]]]  # (field, alias)
    where: Optional[Expr] = None


@dataclass
class CallSubquery(Clause):
    """CALL { [WITH imports] ... RETURN items } — executed per incoming
    row with only the imported variables in scope; the result rows join
    back onto the invoking rows.

    UNION [ALL] inside the braces parses to ``branches`` (one
    CallSubquery per branch, each with its OWN importing WITH) plus
    ``alls``; ``clauses``/``imports`` are then unused on the parent."""
    clauses: list[Clause]
    imports: tuple[str, ...] = ()    # importing WITH variables (may be empty)
    has_import_with: bool = False    # distinguishes `WITH a` from no WITH
    branches: Optional[list["CallSubquery"]] = None  # UNION inside { }
    alls: tuple[bool, ...] = ()      # len = branches-1; True => UNION ALL


@dataclass
class Query:
    clauses: list[Clause]


@dataclass
class UnionQuery:
    branches: list[Query]
    alls: list[bool]  # len = branches-1; True => UNION ALL
