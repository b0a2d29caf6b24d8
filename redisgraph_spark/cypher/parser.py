"""Recursive-descent parser for the supported openCypher subset.

Grammar scope = the reference's AST whitelist
(``/root/reference/src/ast/cypher_whitelist.c:25-140``); operator
precedence follows the openCypher grammar (Or > Xor > And > Not >
Comparison/string-list-null > AddSub > MulDivMod > Pow > Unary > postfix).
Semantic validations corresponding to
``/root/reference/src/ast/ast_validations.c`` live in the planner.
"""

from __future__ import annotations

from redisgraph_spark.cypher import ast as A
from redisgraph_spark.cypher.tokenizer import Token, tokenize

_COMPARE_OPS = {"=", "<>", "!=", "<", "<=", ">", ">="}


class Parser:
    def __init__(self, text: str) -> None:
        self.text = text
        self.tokens = tokenize(text)
        self.i = 0

    # ------------------------------------------------------------- utilities
    @property
    def tok(self) -> Token:
        return self.tokens[self.i]

    def peek(self, k: int = 1) -> Token:
        j = min(self.i + k, len(self.tokens) - 1)
        return self.tokens[j]

    def advance(self) -> Token:
        t = self.tokens[self.i]
        if t.kind != "eof":
            self.i += 1
        return t

    def at_kw(self, *kws: str) -> bool:
        return self.tok.kind == "kw" and \
            str(self.tok.value).lower() in kws

    def at_op(self, *ops: str) -> bool:
        return self.tok.kind == "op" and self.tok.value in ops

    def eat_kw(self, kw: str) -> None:
        if not self.at_kw(kw):
            raise SyntaxError(f"Expected {kw.upper()!r}, got {self.tok!r}")
        self.advance()

    def eat_op(self, op: str) -> None:
        if not self.at_op(op):
            raise SyntaxError(f"Expected {op!r}, got {self.tok!r}")
        self.advance()

    def opt_kw(self, *kws: str) -> bool:
        if self.at_kw(*kws):
            self.advance()
            return True
        return False

    def opt_op(self, op: str) -> bool:
        if self.at_op(op):
            self.advance()
            return True
        return False

    def _at_name(self, k: int, word: str) -> bool:
        t = self.tok if k == 0 else self.peek(k)
        return t.kind == "name" and str(t.value).lower() == word

    def name(self) -> str:
        # A keyword is a legal identifier in most positions (e.g. a label
        # named `order` or a property called `count`).
        if self.tok.kind in ("name", "kw"):
            return str(self.advance().value)
        raise SyntaxError(f"Expected identifier, got {self.tok!r}")

    # ----------------------------------------------------------------- query
    def parse_query(self) -> A.Query:
        parts = [self.parse_single_query()]
        union_all: list[bool] = []
        while self.at_kw("union"):
            self.advance()
            union_all.append(self.opt_kw("all"))
            parts.append(self.parse_single_query())
        if self.tok.kind != "eof":
            raise SyntaxError(f"Unexpected trailing input: {self.tok!r}")
        return A.Query(parts, union_all)

    def parse_single_query(self) -> A.SingleQuery:
        clauses: list[A.Clause] = []
        while True:
            if self.at_kw("match"):
                clauses.append(self.parse_match(optional=False))
            elif self.at_kw("optional"):
                self.advance()
                clauses.append(self.parse_match(optional=True))
            elif self.at_kw("unwind"):
                clauses.append(self.parse_unwind())
            elif self.at_kw("with"):
                clauses.append(self.parse_with())
            elif self.at_kw("return"):
                clauses.append(self.parse_return())
            elif self.at_kw("create"):
                if self._at_name(1, "index") and \
                        self.peek(2).kind == "kw" and \
                        str(self.peek(2).value).lower() == "on":
                    clauses.append(self.parse_index_ddl(create=True))
                else:
                    clauses.append(self.parse_create())
            elif self._at_name(0, "drop") and self._at_name(1, "index"):
                clauses.append(self.parse_index_ddl(create=False))
            elif self.at_kw("merge"):
                clauses.append(self.parse_merge())
            elif self.at_kw("set"):
                clauses.append(self.parse_set())
            elif self.at_kw("remove"):
                clauses.append(self.parse_remove())
            elif self.at_kw("delete"):
                clauses.append(self.parse_delete(detach=False))
            elif self.at_kw("detach"):
                self.advance()
                clauses.append(self.parse_delete(detach=True))
            elif self.at_kw("call"):
                clauses.append(self.parse_call())
            else:
                break
        if not clauses:
            raise SyntaxError(f"Expected a clause, got {self.tok!r}")
        return A.SingleQuery(clauses)

    # --------------------------------------------------------------- clauses
    def parse_match(self, optional: bool) -> A.MatchClause:
        self.eat_kw("match")
        paths = [self.parse_pattern_path()]
        while self.opt_op(","):
            paths.append(self.parse_pattern_path())
        where = None
        if self.opt_kw("where"):
            where = self.parse_expr()
        return A.MatchClause(paths, optional, where)

    def parse_unwind(self) -> A.UnwindClause:
        self.eat_kw("unwind")
        expr = self.parse_expr()
        self.eat_kw("as")
        return A.UnwindClause(expr, self.name())

    def _projection_tail(self):
        order_by: list[A.OrderItem] = []
        skip = limit = None
        if self.at_kw("order"):
            self.advance()
            self.eat_kw("by")
            while True:
                e = self.parse_expr()
                asc = True
                if self.opt_kw("desc", "descending"):
                    asc = False
                else:
                    self.opt_kw("asc", "ascending")
                order_by.append(A.OrderItem(e, asc))
                if not self.opt_op(","):
                    break
        if self.opt_kw("skip"):
            skip = self.parse_expr()
        if self.opt_kw("limit"):
            limit = self.parse_expr()
        return order_by, skip, limit

    def _projection_items(self):
        star = False
        items: list[A.ProjectionItem] = []
        if self.at_op("*"):
            self.advance()
            star = True
            if not self.opt_op(","):
                return items, star
        while True:
            start = self.tok.pos
            expr = self.parse_expr()
            raw = self.text[start:self.tok.pos].strip()
            alias = None
            if self.opt_kw("as"):
                alias = self.name()
            items.append(A.ProjectionItem(expr, alias, raw or None))
            if not self.opt_op(","):
                break
        return items, star

    def parse_with(self) -> A.WithClause:
        self.eat_kw("with")
        distinct = self.opt_kw("distinct")
        items, star = self._projection_items()
        for it in items:
            if it.alias is None and not isinstance(it.expr, A.Variable):
                # NoExpressionAlias: WITH requires AS for non-variables
                raise SyntaxError(
                    "Expression in WITH must be aliased (use AS)")
        order_by, skip, limit = self._projection_tail()
        where = self.parse_expr() if self.opt_kw("where") else None
        return A.WithClause(items, star, distinct, order_by, skip, limit,
                            where)

    def parse_return(self) -> A.ReturnClause:
        self.eat_kw("return")
        distinct = self.opt_kw("distinct")
        items, star = self._projection_items()
        order_by, skip, limit = self._projection_tail()
        return A.ReturnClause(items, star, distinct, order_by, skip, limit)

    def parse_create(self) -> A.CreateClause:
        self.eat_kw("create")
        paths = [self.parse_pattern_path()]
        while self.opt_op(","):
            paths.append(self.parse_pattern_path())
        return A.CreateClause(paths)

    def parse_index_ddl(self, create: bool) -> A.IndexDDL:
        """``CREATE INDEX ON :Label(prop[, …])`` / ``DROP INDEX ON
        :Label(prop)`` (reference grammar: CREATE/DROP_NODE_PROPS_INDEX,
        ``src/ast/cypher_whitelist.c:37-38``)."""
        self.advance()            # CREATE kw / DROP name
        self.advance()            # INDEX
        self.eat_kw("on")
        self.eat_op(":")
        label = self.name()
        self.eat_op("(")
        props = [self.name()]
        while self.opt_op(","):
            props.append(self.name())
        self.eat_op(")")
        return A.IndexDDL(create=create, label=label, props=props)

    def parse_merge(self) -> A.MergeClause:
        self.eat_kw("merge")
        path = self.parse_pattern_path()
        on_match: list[A.SetItem] = []
        on_create: list[A.SetItem] = []
        while self.at_kw("on"):
            self.advance()
            if self.opt_kw("match"):
                self.eat_kw("set")
                on_match.extend(self._set_items())
            else:
                self.eat_kw("create")
                self.eat_kw("set")
                on_create.extend(self._set_items())
        return A.MergeClause(path, on_match, on_create)

    def _set_items(self) -> list[A.SetItem]:
        items = []
        while True:
            target = self.parse_postfix()
            if isinstance(target, A.LabelPred):
                # postfix parsing folds `n:Foo:Bar` (with or without
                # whitespace before the colon, Set3[5-7]) into a
                # LabelPred — in SET position that IS the label item
                if not isinstance(target.subject, A.Variable):
                    raise SyntaxError("SET :Label requires a variable")
                items.append(A.LabelItem(target.subject.name,
                                         list(target.labels)))
                if not self.opt_op(","):
                    break
                continue
            if self.opt_op("+"):
                self.eat_op("=")
                op = "+="
            else:
                self.eat_op("=")
                op = "="
            items.append(A.SetItem(target, self.parse_expr(), op))
            if not self.opt_op(","):
                break
        return items

    def parse_set(self) -> A.SetClause:
        self.eat_kw("set")
        return A.SetClause(self._set_items())

    def parse_remove(self) -> A.RemoveClause:
        """``REMOVE n.prop`` / ``REMOVE n:Label`` (extension beyond the
        reference's documented whitelist — it only offers SET p = NULL)."""
        self.eat_kw("remove")
        items: list[object] = []
        while True:
            target = self.parse_postfix()
            if isinstance(target, A.LabelPred):
                if not isinstance(target.subject, A.Variable):
                    raise SyntaxError("REMOVE :Label requires a variable")
                items.append(A.LabelItem(target.subject.name,
                                         list(target.labels)))
            elif isinstance(target, A.Property):
                items.append(target)
            else:
                raise SyntaxError("REMOVE expects n.prop or n:Label")
            if not self.opt_op(","):
                break
        return A.RemoveClause(items)

    def parse_delete(self, detach: bool) -> A.DeleteClause:
        self.eat_kw("delete")
        exprs = [self.parse_expr()]
        while self.opt_op(","):
            exprs.append(self.parse_expr())
        return A.DeleteClause(exprs, detach)

    def parse_call(self) -> A.CallClause:
        self.eat_kw("call")
        proc = self.name()
        while self.opt_op("."):
            proc += "." + self.name()
        args: list[A.Expr] = []
        implicit = True
        if self.at_op("("):
            # `CALL proc` without parens = implicit arguments (values
            # come from the query parameters, openCypher Call1/2)
            implicit = False
            self.eat_op("(")
            if not self.at_op(")"):
                args.append(self.parse_expr())
                while self.opt_op(","):
                    args.append(self.parse_expr())
            self.eat_op(")")
        yields: list[tuple[str, str | None]] = []
        where = None
        if self.opt_kw("yield"):
            while True:
                col = self.name()
                alias = self.name() if self.opt_kw("as") else None
                yields.append((col, alias))
                if not self.opt_op(","):
                    break
            if self.opt_kw("where"):
                where = self.parse_expr()
        return A.CallClause(proc.lower(), args, yields, where, implicit)

    # -------------------------------------------------------------- patterns
    def parse_pattern_path(self) -> A.PatternPath:
        var = None
        nxt2 = self.peek(2)
        # keyword-named path variables parse like everywhere else
        # (`MATCH order = (a)-[]->(b)`)
        if (self.tok.kind in ("name", "kw") and self.peek().kind == "op"
                and self.peek().value == "="
                and ((nxt2.kind == "op" and nxt2.value == "(")
                     or (nxt2.kind == "name" and str(nxt2.value).lower()
                         in ("shortestpath", "allshortestpaths")))):
            var = self.name()
            self.eat_op("=")
        shortest = None
        if (self.tok.kind == "name"
                and str(self.tok.value).lower() in ("shortestpath",
                                                    "allshortestpaths")
                and self.peek().kind == "op" and self.peek().value == "("):
            shortest = ("all" if str(self.tok.value).lower()
                        == "allshortestpaths" else "single")
            self.advance()
            self.eat_op("(")
            inner = self.parse_pattern_path()
            self.eat_op(")")
            return A.PatternPath(var, inner.elements, shortest)
        elements: list[object] = [self.parse_node_pattern()]
        while self.at_op("-", "<-"):
            elements.append(self.parse_rel_pattern())
            elements.append(self.parse_node_pattern())
        return A.PatternPath(var, elements, shortest)

    def parse_node_pattern(self) -> A.NodePattern:
        self.eat_op("(")
        var = None
        labels: list[str] = []
        props: list[tuple[str, A.Expr]] = []
        if self.tok.kind in ("name", "kw"):
            # (kind name/kw is mutually exclusive with op-kind ')' ':'
            # '{' — no further guards needed)
            var = self.name()
        while self.opt_op(":"):
            labels.append(self.name())
        has_props = False
        if self.at_op("{"):
            has_props = True
            props = self.parse_map_entries()
        self.eat_op(")")
        return A.NodePattern(var, labels, props, has_props)

    def parse_rel_pattern(self) -> A.RelPattern:
        if self.at_op("<-"):
            left = "in"
            self.advance()
        else:
            self.eat_op("-")
            left = None
        var = None
        types: list[str] = []
        props: list[tuple[str, A.Expr]] = []
        min_hops = max_hops = None
        if self.opt_op("["):
            if (self.tok.kind in ("name", "kw") and not self.at_op(":")
                    and not self.at_op("*") and not self.at_op("{")
                    and not self.at_op("]")):
                var = self.name()
            if self.opt_op(":"):
                types.append(self.name())
                while self.opt_op("|"):
                    self.opt_op(":")
                    types.append(self.name())
            if self.opt_op("*"):
                min_hops = 1
                max_hops = None
                if self.tok.kind == "int":
                    min_hops = int(self.advance().value)
                    max_hops = min_hops
                if self.opt_op(".."):
                    max_hops = None
                    if self.tok.kind == "int":
                        max_hops = int(self.advance().value)
            if self.at_op("{"):
                props = self.parse_map_entries()
            self.eat_op("]")
        # closing arrow
        if self.at_op("->"):
            self.advance()
            right = "out"
        else:
            self.eat_op("-")
            right = None
        if left == "in" and right == "out":
            direction = "both"
        elif left == "in":
            direction = "in"
        elif right == "out":
            direction = "out"
        else:
            direction = "both"
        return A.RelPattern(var, types, direction, props, min_hops, max_hops)

    def parse_map_entries(self) -> list[tuple[str, A.Expr]]:
        self.eat_op("{")
        items: list[tuple[str, A.Expr]] = []
        if not self.at_op("}"):
            while True:
                key = self.name()
                self.eat_op(":")
                items.append((key, self.parse_expr()))
                if not self.opt_op(","):
                    break
        self.eat_op("}")
        return items

    # ----------------------------------------------------------- expressions
    def parse_expr(self) -> A.Expr:
        return self.parse_or()

    def parse_or(self) -> A.Expr:
        left = self.parse_xor()
        while self.at_kw("or"):
            self.advance()
            left = A.Binary("OR", left, self.parse_xor())
        return left

    def parse_xor(self) -> A.Expr:
        left = self.parse_and()
        while self.at_kw("xor"):
            self.advance()
            left = A.Binary("XOR", left, self.parse_and())
        return left

    def parse_and(self) -> A.Expr:
        left = self.parse_not()
        while self.at_kw("and"):
            self.advance()
            left = A.Binary("AND", left, self.parse_not())
        return left

    def parse_not(self) -> A.Expr:
        if self.at_kw("not"):
            self.advance()
            return A.Unary("NOT", self.parse_not())
        return self.parse_comparison()

    def parse_comparison(self) -> A.Expr:
        left = self.parse_string_list_null(self.parse_add_sub())
        rest: list[tuple[str, A.Expr]] = []
        while self.at_op(*_COMPARE_OPS):
            op = str(self.advance().value)
            if op == "!=":
                op = "<>"
            right = self.parse_string_list_null(self.parse_add_sub())
            rest.append((op, right))
        if not rest:
            return left
        return A.Comparison(left, rest)

    def parse_string_list_null(self, left: A.Expr) -> A.Expr:
        while True:
            if self.at_kw("in"):
                self.advance()
                left = A.In(left, self.parse_add_sub())
            elif self.at_kw("starts"):
                self.advance()
                # 'WITH' here is the keyword reused as an operator word
                self.eat_kw("with")
                left = A.StringOp("STARTS WITH", left, self.parse_add_sub())
            elif self.at_kw("ends"):
                self.advance()
                self.eat_kw("with")
                left = A.StringOp("ENDS WITH", left, self.parse_add_sub())
            elif self.at_kw("contains"):
                self.advance()
                left = A.StringOp("CONTAINS", left, self.parse_add_sub())
            elif self.at_op("=~"):
                self.advance()
                left = A.StringOp("=~", left, self.parse_add_sub())
            elif self.at_kw("is"):
                self.advance()
                negated = self.opt_kw("not")
                self.eat_kw("null")
                left = A.IsNull(left, negated)
            else:
                return left

    def parse_add_sub(self) -> A.Expr:
        left = self.parse_mul()
        while self.at_op("+", "-"):
            op = str(self.advance().value)
            left = A.Binary(op, left, self.parse_mul())
        return left

    def parse_mul(self) -> A.Expr:
        left = self.parse_pow()
        while self.at_op("*", "/", "%"):
            op = str(self.advance().value)
            left = A.Binary(op, left, self.parse_pow())
        return left

    def parse_pow(self) -> A.Expr:
        left = self.parse_unary()
        if self.at_op("^"):
            self.advance()
            return A.Binary("^", left, self.parse_pow())  # right-assoc
        return left

    def parse_unary(self) -> A.Expr:
        if self.at_op("-"):
            self.advance()
            inner = self.parse_unary()
            # fold into the literal so INT64_MIN (-9223372036854775808,
            # whose positive form overflows int64) survives
            if isinstance(inner, A.Literal) and \
                    isinstance(inner.value, (int, float)) and \
                    not isinstance(inner.value, bool):
                return A.Literal(-inner.value)
            return A.Unary("-", inner)
        if self.at_op("+"):
            self.advance()
            return self.parse_unary()
        return self.parse_postfix()

    def parse_postfix(self) -> A.Expr:
        expr = self.parse_atom()
        while True:
            if self.at_op("."):
                self.advance()
                expr = A.Property(expr, self.name())
            elif self.at_op(":"):
                # label-predicate expression expr:Label1:Label2
                # (colon is unambiguous in expression position — map
                # keys and pattern labels are consumed by their own
                # parsers before expression parsing sees them)
                labels = []
                while self.opt_op(":"):
                    labels.append(self.name())
                expr = A.LabelPred(expr, labels)
            elif self.at_op("["):
                self.advance()
                if self.at_op(".."):  # x[..end]
                    self.advance()
                    end = None if self.at_op("]") else self.parse_expr()
                    self.eat_op("]")
                    expr = A.Slice(expr, None, end)
                    continue
                first = self.parse_expr()
                if self.opt_op(".."):
                    end = None if self.at_op("]") else self.parse_expr()
                    self.eat_op("]")
                    expr = A.Slice(expr, first, end)
                else:
                    self.eat_op("]")
                    expr = A.Subscript(expr, first)
            else:
                return expr

    # ------------------------------------------------------------------ atom
    def _try_pattern_predicate(self) -> A.Expr | None:
        """Disambiguate ``(a)-[:R]->(b)`` (pattern predicate) from a
        parenthesized expression; backtracks on failure."""
        save = self.i
        try:
            path = self.parse_pattern_path()
        except SyntaxError:
            self.i = save
            return None
        if len(path.elements) < 3 and path.shortest is None:
            self.i = save
            return None
        if path.shortest is not None:
            return A.ShortestPathExpr(path, path.shortest == "all")
        return A.PatternPredicate(path)

    def parse_atom(self) -> A.Expr:
        t = self.tok
        if t.kind == "int" or t.kind == "float" or t.kind == "string":
            self.advance()
            return A.Literal(t.value)
        if t.kind == "param":
            self.advance()
            return A.Parameter(str(t.value))
        if t.kind == "kw":
            kwv = str(t.value).lower()
            if kwv == "null":
                self.advance()
                return A.Literal(None)
            if kwv == "true":
                self.advance()
                return A.Literal(True)
            if kwv == "false":
                self.advance()
                return A.Literal(False)
            if kwv == "count" and self.peek().value == "(":
                self.advance()
                self.eat_op("(")
                if self.at_op("*"):
                    self.advance()
                    self.eat_op(")")
                    return A.CountStar()
                distinct = self.opt_kw("distinct")
                arg = self.parse_expr()
                self.eat_op(")")
                return A.FuncCall("count", [arg], distinct)
            if kwv == "case":
                return self.parse_case()
            if kwv == "exists" and self.peek().value == "(":
                self.advance()
                self.eat_op("(")
                pat = self._try_pattern_predicate()
                if pat is not None:
                    self.eat_op(")")
                    return pat
                inner = self.parse_expr()
                self.eat_op(")")
                return A.FuncCall("exists", [inner])
            if kwv in ("any", "all", "none", "single") \
                    and self.peek().value == "(":
                kind = kwv
                self.advance()
                self.eat_op("(")
                var = self.name()
                self.eat_kw("in")
                source = self.parse_expr()
                self.eat_kw("where")
                where = self.parse_expr()
                self.eat_op(")")
                return A.Quantifier(kind, var, source, where)
            if kwv == "reduce" and self.peek().value == "(":
                self.advance()
                self.eat_op("(")
                acc = self.name()
                self.eat_op("=")
                init = self.parse_expr()
                self.eat_op(",")
                var = self.name()
                self.eat_kw("in")
                source = self.parse_expr()
                self.eat_op("|")
                expr = self.parse_expr()
                self.eat_op(")")
                return A.Reduce(acc, init, var, source, expr)
            # keywords usable as bare variable names fall through
            if self.peek().value == "(" and self.peek().kind == "op":
                name = str(self.advance().value)
                return self._call(name)
            self.advance()
            return A.Variable(str(t.value))
        if t.kind == "name":
            if (str(t.value).lower() in ("shortestpath", "allshortestpaths")
                    and self.peek().value == "("):
                pat = self._try_pattern_predicate()
                if pat is not None:
                    return pat
            if self.peek().kind == "op" and self.peek().value == "(":
                name = str(self.advance().value)
                return self._call(name)
            if self.peek().kind == "op" and self.peek().value == "." \
                    and self.peek(2).kind == "name" \
                    and self.peek(3).kind == "op" \
                    and self.peek(3).value == "(":
                # namespaced function call: date.truncate(...),
                # duration.between(...) — only when the dotted name is
                # directly applied; `x.prop` stays a Property access
                first = str(self.advance().value)
                self.advance()  # '.'
                second = str(self.advance().value)
                return self._call(f"{first}.{second}")
            self.advance()
            if self.at_op("{"):
                return self.parse_map_projection(str(t.value))
            return A.Variable(str(t.value))
        if t.kind == "op" and t.value == "[":
            return self.parse_list_or_comprehension()
        if t.kind == "op" and t.value == "{":
            return A.MapLiteral(self.parse_map_entries())
        if t.kind == "op" and t.value == "(":
            pat = self._try_pattern_predicate()
            if pat is not None:
                return pat
            self.eat_op("(")
            inner = self.parse_expr()
            self.eat_op(")")
            return inner
        raise SyntaxError(f"Unexpected token {t!r}")

    def _call(self, name: str) -> A.Expr:
        # function names may be namespaced: db.labels() in expressions is
        # not supported (CALL covers it); dotted names arise via postfix.
        self.eat_op("(")
        distinct = self.opt_kw("distinct")
        args: list[A.Expr] = []
        if not self.at_op(")"):
            args.append(self.parse_expr())
            while self.opt_op(","):
                args.append(self.parse_expr())
        self.eat_op(")")
        return A.FuncCall(name.lower(), args, distinct)

    def parse_map_projection(self, var: str) -> A.Expr:
        self.eat_op("{")
        items: list[tuple[str, A.Expr | None]] = []
        star = False
        if not self.at_op("}"):
            while True:
                if self.opt_op("."):
                    if self.opt_op("*"):
                        star = True
                    else:
                        items.append((self.name(), None))
                else:
                    key = self.name()
                    if self.opt_op(":"):
                        items.append((key, self.parse_expr()))
                    else:
                        items.append((key, A.Variable(key)))
                if not self.opt_op(","):
                    break
        self.eat_op("}")
        return A.MapProjection(var, items, star)

    def parse_case(self) -> A.Expr:
        self.eat_kw("case")
        test = None
        if not self.at_kw("when"):
            test = self.parse_expr()
        whens: list[tuple[A.Expr, A.Expr]] = []
        while self.opt_kw("when"):
            cond = self.parse_expr()
            self.eat_kw("then")
            whens.append((cond, self.parse_expr()))
        default = None
        if self.opt_kw("else"):
            default = self.parse_expr()
        self.eat_kw("end")
        return A.CaseExpr(test, whens, default)

    def parse_list_or_comprehension(self) -> A.Expr:
        self.eat_op("[")
        if self.at_op("]"):
            self.advance()
            return A.ListLiteral([])
        # pattern comprehension: [p = (a)-[:R]->(b) WHERE pred | proj]
        # — disambiguated from a list literal by attempting the pattern
        # parse and requiring the `|` projection; backtracks otherwise
        # (`[(a)]` and `[(1+2)]` stay list literals)
        nxt = self.peek()
        if (self.tok.kind == "op" and self.tok.value == "(") or \
                (self.tok.kind in ("name", "kw") and nxt.kind == "op"
                 and nxt.value == "="):
            save = self.i
            try:
                path = self.parse_pattern_path()
                if len(path.elements) >= 3 and path.shortest is None:
                    where = self.parse_expr() if self.opt_kw("where") \
                        else None
                    self.eat_op("|")
                    proj = self.parse_expr()
                    self.eat_op("]")
                    return A.PatternComprehension(path, where, proj)
                self.i = save
            except SyntaxError:
                self.i = save
        # lookahead for comprehension: name IN ... — keyword-named
        # variables are legal identifiers here like everywhere else
        # (`[end IN [1,2] | end + 1]`), except the literal keywords,
        # which start membership tests (`[null IN [1], ...]`)
        if ((self.tok.kind == "name"
             or (self.tok.kind == "kw"
                 and str(self.tok.value).lower()
                 not in ("null", "true", "false")))
                and self.peek().kind == "kw"
                and str(self.peek().value).lower() == "in"):
            var = self.name()
            self.eat_kw("in")
            source = self.parse_expr()
            where = None
            proj = None
            if self.opt_kw("where"):
                where = self.parse_expr()
            if self.opt_op("|"):
                proj = self.parse_expr()
            self.eat_op("]")
            return A.ListComprehension(var, source, where, proj)
        items = [self.parse_expr()]
        while self.opt_op(","):
            items.append(self.parse_expr())
        self.eat_op("]")
        return A.ListLiteral(items)


def parse(text: str) -> A.Query:
    return Parser(text).parse_query()
