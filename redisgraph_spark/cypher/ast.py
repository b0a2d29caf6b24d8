"""AST for the supported openCypher subset.

Scope mirrors the reference's whitelist
(``/root/reference/src/ast/cypher_whitelist.c:25-140``): MATCH / OPTIONAL
MATCH / WHERE / CREATE / MERGE / SET / DELETE / WITH / UNWIND / CALL /
RETURN / ORDER BY / SKIP / LIMIT / UNION, expressions including
comprehensions, CASE, shortestPath. (FOREACH / REMOVE / LOAD CSV are
outside the whitelist there too.)

Plain dataclasses — IR #2 of our pipeline (parse → AST → pattern graph →
DataFrame), replacing the reference's libcypher-parser AST + annotations
(``src/ast/ast.c:530``).
"""

from __future__ import annotations

from dataclasses import dataclass, field


# --------------------------------------------------------------- expressions
@dataclass
class Expr:
    pass


@dataclass
class Literal(Expr):
    value: object  # int | float | str | bool | None


@dataclass
class ListLiteral(Expr):
    items: list[Expr]


@dataclass
class MapLiteral(Expr):
    items: list[tuple[str, Expr]]


@dataclass
class Parameter(Expr):
    name: str


@dataclass
class Variable(Expr):
    name: str


@dataclass
class Property(Expr):
    subject: Expr
    key: str


@dataclass
class PatternComprehension(Expr):
    """``[p = (a)-[:R]->(b) WHERE pred | proj]`` — matches the pattern
    per input row (outer variables stay bound) and collects the
    projection into a list; no match yields []."""
    path: "PatternPath"
    where: Expr | None
    proj: Expr


@dataclass
class LabelPred(Expr):
    """Label-predicate expression ``expr:Label1:Label2`` (openCypher
    Graph5): true iff a node carries ALL the labels; on a relationship
    it tests the type; null subject yields null."""
    subject: Expr
    labels: list[str]


@dataclass
class Subscript(Expr):
    subject: Expr
    index: Expr


@dataclass
class Slice(Expr):
    subject: Expr
    start: Expr | None
    end: Expr | None


@dataclass
class Unary(Expr):
    op: str  # '-', '+', 'NOT'
    operand: Expr


@dataclass
class Binary(Expr):
    op: str  # + - * / % ^ = <> < <= > >= AND OR XOR
    left: Expr
    right: Expr


@dataclass
class Comparison(Expr):
    """Chained comparison ``a < b <= c`` → conjunct of pairs."""
    first: Expr
    rest: list[tuple[str, Expr]]


@dataclass
class IsNull(Expr):
    operand: Expr
    negated: bool


@dataclass
class In(Expr):
    needle: Expr
    haystack: Expr


@dataclass
class StringOp(Expr):
    op: str  # 'STARTS WITH' | 'ENDS WITH' | 'CONTAINS' | '=~'
    left: Expr
    right: Expr


@dataclass
class FuncCall(Expr):
    name: str  # lowercased
    args: list[Expr]
    distinct: bool = False


@dataclass
class CountStar(Expr):
    pass


@dataclass
class CaseExpr(Expr):
    test: Expr | None  # simple CASE has a test expr; searched CASE: None
    whens: list[tuple[Expr, Expr]]
    default: Expr | None


@dataclass
class ListComprehension(Expr):
    var: str
    source: Expr
    where: Expr | None
    projection: Expr | None


@dataclass
class Quantifier(Expr):
    kind: str  # any | all | none | single
    var: str
    source: Expr
    where: Expr


@dataclass
class Reduce(Expr):
    acc: str
    init: Expr
    var: str
    source: Expr
    expr: Expr


@dataclass
class MapProjection(Expr):
    """``n {.a, .*, k: expr}`` — projected map over an entity."""
    var: str
    items: list[tuple[str, "Expr | None"]]  # (key, None=.key | expr)
    star: bool = False


@dataclass
class PatternPredicate(Expr):
    """``WHERE (a)-[:R]->(b)`` — existence test, compiled to a semi-join
    (reference rewrites these to (Anti)SemiApply:
    ``src/execution_plan/execution_plan_build/reduce_to_apply.c:64-110``)."""
    pattern: "PatternPath"


@dataclass
class ShortestPathExpr(Expr):
    pattern: "PatternPath"
    all_paths: bool = False  # allShortestPaths


# ------------------------------------------------------------------ patterns
@dataclass
class NodePattern:
    var: str | None
    labels: list[str]
    props: list[tuple[str, Expr]]
    has_props: bool = False   # a `{...}` was written, even if empty —
    #                           `CREATE (n {})` of a bound var is a
    #                           redeclaration (openCypher Create1[17])


@dataclass
class RelPattern:
    var: str | None
    types: list[str]
    direction: str  # 'out' | 'in' | 'both'
    props: list[tuple[str, Expr]]
    min_hops: int | None = None   # None ⇒ fixed single hop
    max_hops: int | None = None   # for var-len; None with min set ⇒ unbounded


@dataclass
class PatternPath:
    var: str | None  # path variable: p = (a)-[..]->(b)
    elements: list[object]  # alternating NodePattern / RelPattern
    shortest: str | None = None  # None | 'single' | 'all'


# ------------------------------------------------------------------- clauses
@dataclass
class Clause:
    pass


@dataclass
class MatchClause(Clause):
    paths: list[PatternPath]
    optional: bool
    where: Expr | None


@dataclass
class UnwindClause(Clause):
    expr: Expr
    alias: str


@dataclass
class ProjectionItem:
    expr: Expr
    alias: str | None
    # raw source text of the expression — unaliased projections name
    # their column by it (the reference names columns by the expression
    # text, resultset column headers)
    text: str | None = None


@dataclass
class OrderItem:
    expr: Expr
    ascending: bool


@dataclass
class WithClause(Clause):
    items: list[ProjectionItem]
    star: bool
    distinct: bool
    order_by: list[OrderItem]
    skip: Expr | None
    limit: Expr | None
    where: Expr | None


@dataclass
class ReturnClause(Clause):
    items: list[ProjectionItem]
    star: bool
    distinct: bool
    order_by: list[OrderItem]
    skip: Expr | None
    limit: Expr | None


@dataclass
class CreateClause(Clause):
    paths: list[PatternPath]


@dataclass
class IndexDDL(Clause):
    """``CREATE INDEX ON :Label(prop[, …])`` / ``DROP INDEX ON
    :Label(prop)`` — reference AST nodes CREATE/DROP_NODE_PROPS_INDEX
    (``src/ast/cypher_whitelist.c:37-38``)."""
    create: bool
    label: str
    props: list[str]


@dataclass
class MergeClause(Clause):
    path: PatternPath
    on_match: list["SetItem"]
    on_create: list["SetItem"]


@dataclass
class SetItem:
    target: Expr        # Property(var, key) or Variable
    value: Expr
    op: str = "="       # '=' | '+='


@dataclass
class LabelItem:
    """``SET n:Label1:Label2`` / ``REMOVE n:Label`` item."""
    var: str
    labels: list[str]


@dataclass
class SetClause(Clause):
    items: list[object]  # SetItem | LabelItem


@dataclass
class RemoveClause(Clause):
    items: list[object]  # Property (→ SET NULL) | LabelItem


@dataclass
class DeleteClause(Clause):
    exprs: list[Expr]
    detach: bool


@dataclass
class CallClause(Clause):
    proc: str
    args: list[Expr]
    yields: list[tuple[str, str | None]]  # (column, alias)
    where: Expr | None
    implicit: bool = False   # `CALL proc` without parens — arguments
    #                          come from the query parameters by name


# -------------------------------------------------------------------- query
@dataclass
class SingleQuery:
    clauses: list[Clause] = field(default_factory=list)


@dataclass
class Query:
    """Top level: one or more SingleQuery combined by UNION [ALL]."""
    parts: list[SingleQuery] = field(default_factory=list)
    union_all: list[bool] = field(default_factory=list)  # len = parts-1
