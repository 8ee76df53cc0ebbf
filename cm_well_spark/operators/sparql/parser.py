"""Minimal SPARQL parser — the subset the reference supports (J4/J5).

The reference evaluates SELECT and CONSTRUCT only (everything else is
rejected: SpHandler.scala:630-631 `if (!(query.isSelectType ||
query.isConstructType)) throw new Exception("This query type is not
supported.")` — the same error text is raised here and contract-pinned
by tests/test_sparql.py), over full Jena ARQ pattern syntax
(SpHandler.evaluateSparql:598-670; whole-graph engine
JenaArqExtensions.scala:375-519). This hand-rolled recursive-descent
parser covers BGPs with FILTER / OPTIONAL / UNION / MINUS / BIND /
VALUES / FILTER [NOT] EXISTS / nested sub-SELECTs, sequence and bounded
one-or-more property paths plus `p?` and negated property sets, the
common builtin function library, SPARQL 1.1 aggregates (incl.
GROUP_CONCAT and SAMPLE), GROUP BY / HAVING / ORDER BY / LIMIT /
OFFSET / DISTINCT — and rejects the rest
with explicit errors, mirroring the reference's error contract
(SparqlTests.scala:89 pins "fully unbound pattern" rejection — enforced
at compile time in compiler.py).

Grammar (informal):
    query    := prefix* (select | construct)
    prefix   := 'PREFIX' pname ':' '<' iri '>'
    select   := 'SELECT' 'DISTINCT'? ('*' | proj+) 'WHERE'? group modifiers
    proj     := var | '(' AGGFN '(' ['DISTINCT'] (var|'*') [';' 'SEPARATOR' '=' str] ')' 'AS' var ')'
    construct:= 'CONSTRUCT' '{' template '}' 'WHERE' group modifiers
    group    := '{' (triple | filter | optional | minus | bind | values
                     | union-block | group | subselect)* '}'
    subselect:= '{' 'SELECT' ... '}'     -- nested sub-query, joins into
                                            the enclosing group
    optional := 'OPTIONAL' group         minus := 'MINUS' group
    bind     := 'BIND' '(' expr 'AS' var ')'
    values   := 'VALUES' (var | '(' var+ ')') '{' row* '}'
    union    := group 'UNION' group ('UNION' group)*
    path     := elem ('/' elem)* ('+'|'*'|'?')?  -- predicate position only;
                elem := '!'? '^'? iri ('|' '^'? iri)*  ('^' binds tighter
                than '|'; '!' negates the whole alternation set, forward
                predicates only);
                '+'/'*' iterate to fixpoint (unbounded, like ARQ, capped
                by the 10k intermediate limit; '*' adds identity,
                '?' is zero-or-one)
    filter   := 'FILTER' ('(' expr ')' | ['NOT'] 'EXISTS' group)
    expr     := value ops over: STR LANG STRLEN UCASE LCASE ABS CEIL FLOOR
                ROUND CONCAT; boolean: REGEX CONTAINS STRSTARTS STRENDS BOUND
    modifiers:= ('GROUP' 'BY' var+)? ('HAVING' '(' expr ')')?
                ('ORDER' 'BY' ...)? ('LIMIT' n)? ('OFFSET' n)?
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field


class SparqlParseError(ValueError):
    pass


@dataclass(frozen=True)
class Var:
    name: str


@dataclass(frozen=True)
class Iri:
    value: str


@dataclass(frozen=True)
class Literal:
    value: str
    dtype: str | None = None  # 'number', an xsd type iri, or None
    lang: str | None = None  # language tag from "..."@tag


Term = Var | Iri | Literal


@dataclass(frozen=True)
class TriplePattern:
    s: Term
    p: Term
    o: Term


@dataclass(frozen=True)
class Filter:
    op: str  # '=', '!=', '<', '<=', '>', '>=', 'regex', '&&', '||', '!'
    args: tuple


@dataclass(frozen=True)
class AggExpr:
    """SPARQL 1.1 aggregate projection: (FN(?v | expr) AS ?alias)."""

    fn: str  # count | sum | avg | min | max | group_concat | sample
    var: object | None  # Var, an expression (Func tree), or None = COUNT(*)
    alias: str
    distinct: bool = False
    sep: str = " "  # GROUP_CONCAT separator


@dataclass(frozen=True)
class ExprProj:
    """Non-aggregate projection expression: SELECT (expr AS ?alias)."""

    expr: object  # Term | Func tree
    alias: str


@dataclass(frozen=True)
class Func:
    """Builtin function application inside FILTER / BIND expressions."""

    fn: str  # str | lang | strlen | ucase | lcase | abs | ceil | floor | round | concat
    args: tuple


@dataclass(frozen=True)
class PathElem:
    """One step of a property path: alternation of (predicate, inverse)
    alternatives — `^` binds tighter than `|`, so `^p1|p2` is
    (object->subject via p1) OR (subject->object via p2). `neg` marks a
    negated property set `!(p1|p2)` — match any predicate NOT in the set
    (forward predicates only)."""

    preds: tuple  # tuple[(Iri, inverse: bool), ...]
    neg: bool = False


@dataclass(frozen=True)
class PathPattern:
    """Property-path pattern: s elem1/elem2/... o, each elem `[!][^]p(|p)*`,
    with optional trailing `+`/`*`/`?` (bounded one-or-more /
    zero-or-more / zero-or-one, single-elem only)."""

    s: Term
    parts: tuple  # tuple[PathElem, ...]
    o: Term
    plus: bool = False
    star: bool = False
    opt: bool = False  # zero-or-one `p?`


@dataclass
class Group:
    """A basic graph pattern group: triples + filters + optionals + unions
    + minuses + binds + values + property paths."""

    triples: list = field(default_factory=list)
    filters: list = field(default_factory=list)
    optionals: list = field(default_factory=list)  # list[Group]
    unions: list = field(default_factory=list)  # list[list[Group]] (branches)
    minuses: list = field(default_factory=list)  # list[Group]
    binds: list = field(default_factory=list)  # list[(Var, expr)]
    values: list = field(default_factory=list)  # list[(list[Var], list[tuple])]
    paths: list = field(default_factory=list)  # list[PathPattern]
    exists: list = field(default_factory=list)  # list[(Group, negated: bool)]
    subqueries: list = field(default_factory=list)  # list[Query]
    graphs: list = field(default_factory=list)  # list[(Iri | Var, Group)]


@dataclass
class Query:
    form: str  # 'select' | 'construct'
    variables: list  # [Var | AggExpr] or [] for *
    distinct: bool
    where: Group
    template: list = field(default_factory=list)  # construct triples
    order_by: list = field(default_factory=list)  # [(Var, desc: bool)]
    limit: int | None = None
    offset: int | None = None
    prefixes: dict = field(default_factory=dict)
    group_by: list = field(default_factory=list)  # [Var]
    having: list = field(default_factory=list)  # [Filter] over agg aliases
    from_default: list = field(default_factory=list)  # FROM <g> graph iris
    from_named: list = field(default_factory=list)  # FROM NAMED <g> iris


_TOKEN = re.compile(
    r"""\s*(?:
      (?P<comment>\#[^\n]*)
    | (?P<iri><[^>\s]*>)
    | (?P<var>[?$][A-Za-z_][\w]*)
    | (?P<string>"(?:[^"\\]|\\.)*")
    | (?P<langtag>@[A-Za-z][A-Za-z0-9\-]*)
    | (?P<number>[+-]?\d+(?:\.\d+)?)
    | (?P<pname>[A-Za-z_][\w\-]*:[\w\-./#%]*)
    | (?P<kw>[A-Za-z_][\w]*)
    | (?P<punct>\{|\}|\(|\)|\[|\]|\.|;|,|\*|=|!=|<=|>=|<|>|&&|\|\||!|:|/|\+|-|\||\^|\?)
    )""",
    re.VERBOSE,
)


def _tokenize(s: str) -> list[str]:
    toks, i = [], 0
    while i < len(s):
        m = _TOKEN.match(s, i)
        if not m:
            if s[i:].strip() == "":
                break
            raise SparqlParseError(f"lexical error at {s[i:i+20]!r}")
        i = m.end()
        if m.lastgroup != "comment":
            toks.append(m.group(0).strip())
    return toks


class _P:
    def __init__(self, toks: list[str], prefixes: dict):
        self.t = toks
        self.i = 0
        self.prefixes = prefixes
        self.bn = 0  # fresh blank-node counter
        self.allow_agg = False  # True only inside HAVING expressions
        self.hv = 0  # hidden having-aggregate alias counter

    def peek(self, k=0) -> str:
        return self.t[self.i + k] if self.i + k < len(self.t) else ""

    def next(self) -> str:
        tok = self.peek()
        self.i += 1
        return tok

    def expect(self, tok: str):
        got = self.next()
        if got.upper() != tok.upper():
            raise SparqlParseError(f"expected {tok!r}, got {got!r}")

    def kw(self, word: str) -> bool:
        if self.peek().upper() == word.upper():
            self.i += 1
            return True
        return False

    # ---- terms ----

    def term(self) -> Term:
        tok = self.peek()
        if tok.startswith("?") or tok.startswith("$"):
            self.next()
            return Var(tok[1:])
        if tok.startswith("<"):
            self.next()
            return Iri(tok[1:-1])
        if tok.startswith('"'):
            self.next()
            lit = tok[1:-1].encode().decode("unicode_escape")
            if self.peek().startswith("@"):
                return Literal(lit, lang=self.next()[1:])
            if self.peek() == "^" and self.peek(1) == "^":
                self.next()
                self.next()
                dt = self.term()
                if not isinstance(dt, Iri):
                    raise SparqlParseError("datatype of a typed literal must be an IRI")
                local = dt.value.rsplit("#", 1)[-1].rsplit("/", 1)[-1]
                if local in ("int", "integer", "long", "short", "byte", "float", "double",
                             "decimal", "nonNegativeInteger", "positiveInteger"):
                    return Literal(lit, dtype="number")
                if local == "string":
                    return Literal(lit)
                return Literal(lit, dtype=dt.value)
            return Literal(lit)
        if re.fullmatch(r"[+-]?\d+(?:\.\d+)?", tok):
            self.next()
            return Literal(tok, dtype="number")
        if tok == "a":
            self.next()
            return Iri("http://www.w3.org/1999/02/22-rdf-syntax-ns#type")
        if ":" in tok:
            self.next()
            pfx, local = tok.split(":", 1)
            if pfx not in self.prefixes:
                raise SparqlParseError(f"unknown prefix: {pfx}")
            return Iri(self.prefixes[pfx] + local)
        raise SparqlParseError(f"expected term, got {tok!r}")

    def blank_node(self, g) -> Var:
        """`[ p1 o1 ; p2 o2 ]` blank-node property list (SPARQL 1.1
        §4.1.4): a fresh internal variable whose property triples join
        into the enclosing group. Blank nodes are non-projectable — the
        `__bn` prefix keeps them out of SELECT * while _join still
        equi-joins on them."""
        self.expect("[")
        self.bn += 1
        v = Var(f"__bn{self.bn}")
        if self.peek() == "]":
            self.next()
            return v
        while True:
            pred = self.term()
            while True:
                o = self.blank_node(g) if self.peek() == "[" else self.term()
                g.triples.append(TriplePattern(v, pred, o))
                if self.peek() == ",":
                    self.next()
                    continue
                break
            if self.peek() == ";":
                self.next()
                if self.peek() == "]":
                    break
                continue
            break
        self.expect("]")
        return v

    # ---- group graph pattern ----

    def group(self) -> Group:
        self.expect("{")
        g = Group()
        if self.peek().upper() == "SELECT":
            # GroupGraphPattern ::= '{' ( SubSelect | GroupGraphPatternSub )
            # '}' — a DIRECT SubSelect body (the GRAPH ?g { SELECT ... }
            # form); the `{ { SELECT ... } }` nesting is handled below
            self.expect("SELECT")
            sq = _parse_select(self, dict(self.prefixes))
            self.expect("}")
            g.subqueries.append(sq)
            return g
        while True:
            tok = self.peek()
            if tok == "}":
                self.next()
                return g
            if tok == "":
                raise SparqlParseError("unterminated group")
            up = tok.upper()
            if up == "FILTER":
                self.next()
                # FILTER [NOT] EXISTS { ... } — pattern-existence filters
                # compile to semi/anti joins, not boolean Columns, so they
                # live on the group, separate from value filters
                neg = False
                if self.peek().upper() == "NOT" and self.peek(1).upper() == "EXISTS":
                    self.next()
                    self.next()
                    neg = True
                elif self.peek().upper() == "EXISTS" and self.peek(1) == "{":
                    self.next()
                else:
                    g.filters.append(self.filter_expr())
                    continue
                g.exists.append((self.group(), neg))
                continue
            if up == "OPTIONAL":
                self.next()
                g.optionals.append(self.group())
                continue
            if up == "GRAPH":
                # GRAPH <iri>/{?g} { ... } — named-graph scoping (SPARQL 1.1
                # §13.3). The reference's `_sp` path evaluates this through
                # Jena ARQ over the fetched quad dataset; the whole-graph
                # engine unions graphs (JenaArqExtensions.scala:361-364).
                self.next()
                gt = self.term()
                if not isinstance(gt, (Var, Iri)):
                    raise SparqlParseError("GRAPH needs an IRI or a variable")
                g.graphs.append((gt, self.group()))
                continue
            if up == "MINUS":
                self.next()
                g.minuses.append(self.group())
                continue
            if up == "BIND":
                self.next()
                self.expect("(")
                e = self.arith_expr()
                self.expect("AS")
                v = self.term()
                if not isinstance(v, Var):
                    raise SparqlParseError("BIND target must be a variable")
                self.expect(")")
                g.binds.append((v, e))
                continue
            if up == "VALUES":
                self.next()
                g.values.append(self.values_block())
                continue
            if tok == "{" and self.peek(1).upper() == "SELECT":
                # nested sub-SELECT: parse the full query form, join its
                # projected solution into the enclosing group (SPARQL 1.1
                # §12; evaluated bottom-up)
                self.next()
                self.expect("SELECT")
                sq = _parse_select(self, dict(self.prefixes))
                self.expect("}")
                g.subqueries.append(sq)
                continue
            if tok == "{":
                # either a UNION chain or a plain nested group
                first = self.group()
                if self.peek().upper() == "UNION":
                    branches = [first]
                    while self.kw("UNION"):
                        branches.append(self.group())
                    g.unions.append(branches)
                else:
                    # plain nested group: merge (every pattern kind — a
                    # dropped member here silently changes semantics)
                    g.triples.extend(first.triples)
                    g.filters.extend(first.filters)
                    g.optionals.extend(first.optionals)
                    g.unions.extend(first.unions)
                    g.minuses.extend(first.minuses)
                    g.binds.extend(first.binds)
                    g.values.extend(first.values)
                    g.paths.extend(first.paths)
                    g.exists.extend(first.exists)
                    g.subqueries.extend(first.subqueries)
                    g.graphs.extend(first.graphs)
                continue
            # triple pattern (with ; and , continuations; predicate may be
            # a property path — sequence '/', inverse '^', alternatives
            # '|', closures '+'/'*'/'?'); subject may be a blank-node
            # property list
            if tok == "[":
                s = self.blank_node(g)
                if self.peek() in ("}", "."):
                    # `[ p o ] .` — the property list IS the whole pattern
                    if self.peek() == ".":
                        self.next()
                    continue
            else:
                s = self.term()
            while True:

                def path_alt():
                    inv = self.peek() == "^"
                    if inv:
                        self.next()
                    return self.term(), inv

                def path_elem():
                    neg = False
                    if self.peek() == "!":
                        self.next()
                        neg = True
                    if neg and self.peek() == "(":
                        self.next()
                        alts = [path_alt()]
                        while self.peek() == "|":
                            self.next()
                            alts.append(path_alt())
                        self.expect(")")
                    else:
                        alts = [path_alt()]
                        while self.peek() == "|":
                            self.next()
                            alts.append(path_alt())
                    if neg and any(inv for _, inv in alts):
                        raise SparqlParseError("negated property sets support forward predicates only")
                    return PathElem(tuple(alts), neg)

                def path_seq():
                    seq = [path_elem()]
                    while self.peek() == "/":
                        self.next()
                        seq.append(path_elem())
                    return seq

                # `( seq )` groups a sequence so a closure op applies to
                # the WHOLE chain — ARQ's (p1/p2)+ (negated sets `!(...)`
                # are consumed inside path_elem, so a bare '(' here is
                # unambiguously a path group)
                grouped = self.peek() == "("
                if grouped:
                    self.next()
                    parts = path_seq()
                    self.expect(")")
                else:
                    parts = path_seq()
                first = parts[0]
                p = first.preds[0][0]  # plain-predicate fallback for non-paths
                plus = star = opt = False
                if self.peek() == "+":
                    self.next()
                    plus = True
                elif self.peek() == "?":
                    self.next()
                    opt = True
                elif self.peek() == "*" and (grouped or len(parts) > 1):
                    # only consume '*' as a path op when we're clearly in a
                    # path; a bare `?s p * ?o` would be a grammar error
                    self.next()
                    star = True
                elif self.peek() == "*" and (len(first.preds) > 1 or first.preds[0][1] or not isinstance(p, Var)):
                    self.next()
                    star = True
                if (plus or star or opt) and len(parts) > 1 and not grouped:
                    # SPARQL precedence: in `a/b+` the op binds to `b`
                    # alone; parenthesize `(a/b)+` for a sequence closure
                    raise SparqlParseError(
                        "'+'/'*'/'?' applies to a single path element — group the sequence as (p1/p2)+ to close over the chain"
                    )
                is_path = (
                    grouped
                    or plus
                    or star
                    or opt
                    or len(parts) > 1
                    or len(first.preds) > 1
                    or first.preds[0][1]
                    or first.neg
                )
                if is_path and any(
                    isinstance(x, Var) for elem in parts for x, _ in elem.preds
                ):
                    raise SparqlParseError("property-path predicates must be IRIs")
                while True:
                    o = self.blank_node(g) if self.peek() == "[" else self.term()
                    if is_path:
                        g.paths.append(PathPattern(s, tuple(parts), o, plus, star, opt))
                    else:
                        g.triples.append(TriplePattern(s, p, o))
                    if self.peek() == ",":
                        self.next()
                        continue
                    break
                if self.peek() == ";":
                    self.next()
                    if self.peek() in ("}", "."):
                        break
                    continue
                break
            if self.peek() == ".":
                self.next()

    # ---- VALUES ----

    def values_block(self):
        vars_: list[Var] = []
        if self.peek() == "(":
            self.next()
            while self.peek() != ")":
                v = self.term()
                if not isinstance(v, Var):
                    raise SparqlParseError("VALUES header must list variables")
                vars_.append(v)
            self.next()
        else:
            v = self.term()
            if not isinstance(v, Var):
                raise SparqlParseError("VALUES header must list variables")
            vars_.append(v)
        self.expect("{")
        rows: list[tuple] = []
        while self.peek() != "}":
            if self.peek() == "(":
                self.next()
                row = []
                while self.peek() != ")":
                    row.append(self._values_cell())
                self.next()
            else:
                row = [self._values_cell()]
            if len(row) != len(vars_):
                raise SparqlParseError("VALUES row arity mismatch")
            rows.append(tuple(row))
        self.next()
        return vars_, rows

    def _values_cell(self):
        if self.peek().upper() == "UNDEF":
            self.next()
            return None  # wildcard: matches any binding (compiled null-safe)
        t = self.term()
        if isinstance(t, Var):
            raise SparqlParseError("VALUES cells must be constants")
        return t.value

    # ---- FILTER expressions ----

    def filter_expr(self) -> Filter:
        self.expect("(")
        e = self.or_expr()
        self.expect(")")
        return e

    def or_expr(self) -> Filter:
        left = self.and_expr()
        while self.peek() == "||":
            self.next()
            left = Filter("||", (left, self.and_expr()))
        return left

    def and_expr(self) -> Filter:
        left = self.unary_expr()
        while self.peek() == "&&":
            self.next()
            left = Filter("&&", (left, self.unary_expr()))
        return left

    VALUE_FNS = (
        "STR", "LANG", "STRLEN", "UCASE", "LCASE", "ABS", "CEIL", "FLOOR", "ROUND", "CONCAT",
        "STRBEFORE", "STRAFTER", "SUBSTR", "REPLACE", "COALESCE",
        "MD5", "SHA1", "SHA256", "ENCODE_FOR_URI",
        "YEAR", "MONTH", "DAY", "HOURS", "MINUTES", "SECONDS", "TZ",
        "DATATYPE", "IRI", "URI",
        "NOW", "UUID", "STRUUID", "RAND",
    )
    BOOL_FNS = (
        "CONTAINS", "STRSTARTS", "STRENDS", "BOUND", "LANGMATCHES",
        "ISIRI", "ISURI", "ISLITERAL", "ISNUMERIC", "ISBLANK", "SAMETERM",
    )

    AGG_FNS = ("COUNT", "SUM", "AVG", "MIN", "MAX", "GROUP_CONCAT", "SAMPLE")

    def value_expr(self):
        """A value expression: a term or a builtin function application."""
        tok = self.peek().upper()
        if self.allow_agg and tok in self.AGG_FNS and self.peek(1) == "(":
            # aggregate call inside HAVING (SPARQL 1.1 §11.2): carried as
            # an AggExpr node with a hidden alias; the compiler projects
            # it into the aggregation and rewrites the filter to the alias
            fn = self.next().lower()
            self.expect("(")
            distinct = self.kw("DISTINCT")
            if self.peek() == "*":
                self.next()
                v = None
            else:
                v = self.arith_expr()
            self.expect(")")
            self.hv += 1
            return AggExpr(fn, v, f"__hav{self.hv}", distinct)
        if tok == "IF" and self.peek(1) == "(":
            # IF(boolean-expr, then-value, else-value)
            self.next()
            self.expect("(")
            cond = self.or_expr()
            self.expect(",")
            then_v = self.arith_expr()
            self.expect(",")
            else_v = self.arith_expr()
            self.expect(")")
            return Func("if", (cond, then_v, else_v))
        if tok in self.VALUE_FNS and self.peek(1) == "(":
            fn = self.next().lower()
            self.expect("(")
            args = []
            if self.peek() != ")":
                args.append(self.arith_expr())
                while self.peek() == ",":
                    self.next()
                    args.append(self.arith_expr())
            self.expect(")")
            # only the §17.4.5 nondeterministic builtins are nullary;
            # catching STR() etc. here keeps the error a parse error,
            # not an IndexError inside the compiler
            if not args and fn not in ("now", "uuid", "struuid", "rand"):
                raise SparqlParseError(f"{fn.upper()}() needs at least one argument")
            return Func(fn, tuple(args))
        raw = self.peek()
        if (
            self.peek(1) == "("
            and tok not in self.BOOL_FNS
            and tok not in self.AGG_FNS
            and tok not in ("EXISTS", "NOT", "IF")
        ):
            # Custom function application — the Jena FunctionRegistry arc
            # (reference: SpHandler.scala:525-548 hot-compiles jar/scala
            # functions into Jena's registry). The head may be a full IRI
            # (<jar:pkg.Cls#fn>), a prefixed name, or a bare identifier;
            # the LOCAL name resolves against session-registered Spark
            # UDFs at compile time (Func carries it as "udf:<name>").
            name = None
            if raw.startswith("<") and raw.endswith(">"):
                iri = raw[1:-1]
                if iri.startswith("http://www.w3.org/2001/XMLSchema#"):
                    # SPARQL 1.1 §17.5 XSD constructor: xsd:integer(?x) etc.
                    name = "xsd$" + iri.rsplit("#", 1)[-1]
                else:
                    name = re.split(r"[#/.]", iri)[-1]
            elif re.fullmatch(r"[A-Za-z_][A-Za-z0-9_]*:[A-Za-z_][A-Za-z0-9_]*", raw):
                pfx, local = raw.split(":", 1)
                if pfx not in self.prefixes:
                    raise SparqlParseError(f"unknown prefix: {pfx}")
                if self.prefixes[pfx] == "http://www.w3.org/2001/XMLSchema#":
                    name = "xsd$" + local
                else:
                    name = local
            elif re.fullmatch(r"[A-Za-z_][A-Za-z0-9_]*", raw):
                name = raw
            if name is not None:
                self.next()
                self.expect("(")
                args = []
                if self.peek() != ")":
                    args.append(self.arith_expr())
                    while self.peek() == ",":
                        self.next()
                        args.append(self.arith_expr())
                self.expect(")")
                return Func("udf:" + name, tuple(args))
        if self.peek() == "(":
            # parenthesized sub-expression inside a value context
            self.next()
            e = self.arith_expr()
            self.expect(")")
            return e
        return self.term()

    # ---- arithmetic (SPARQL 1.1 §17.3 numeric expressions) ----

    def mul_expr(self):
        left = self.value_expr()
        while self.peek() in ("*", "/"):
            op = self.next()
            left = Func(op, (left, self.value_expr()))
        return left

    def arith_expr(self):
        left = self.mul_expr()
        while True:
            tok = self.peek()
            if tok in ("+", "-"):
                self.next()
                left = Func(tok, (left, self.mul_expr()))
            elif re.fullmatch(r"[+-]\d+(?:\.\d+)?", tok):
                # "?a+1" lexes the sign into the number token: re-split
                self.next()
                left = Func(tok[0], (left, Literal(tok[1:], dtype="number")))
            else:
                return left

    def unary_expr(self) -> Filter:
        if self.peek() == "!":
            self.next()
            return Filter("!", (self.unary_expr(),))
        up = self.peek().upper()
        if self.peek() == "(" and up not in self.VALUE_FNS:
            self.next()
            e = self.or_expr()
            self.expect(")")
            return e
        if up == "REGEX":
            self.next()
            self.expect("(")
            v = self.arith_expr()
            self.expect(",")
            pat = self.term()
            flags = None
            if self.peek() == ",":
                self.next()
                flags = self.term()
            self.expect(")")
            return Filter("regex", (v, pat, flags))
        if up in self.BOOL_FNS and self.peek(1) == "(":
            fn = self.next().lower()
            self.expect("(")
            args = [self.arith_expr()]
            while self.peek() == ",":
                self.next()
                args.append(self.arith_expr())
            self.expect(")")
            return Filter(fn, tuple(args))
        left = self.arith_expr()
        if self.peek().upper() in ("IN", "NOT"):
            # ?x [NOT] IN (v1, v2, ...) — SPARQL 1.1 §17.4.1.9
            negated = self.kw("NOT")
            self.expect("IN")
            self.expect("(")
            vals = []
            while self.peek() != ")":
                v = self.term()
                if isinstance(v, Var):
                    raise SparqlParseError("IN list items must be constants")
                vals.append(v)
                if self.peek() == ",":
                    self.next()
            self.next()
            return Filter("not_in" if negated else "in", (left, tuple(vals)))
        op = self.next()
        if op not in ("=", "!=", "<", "<=", ">", ">="):
            raise SparqlParseError(f"unsupported FILTER operator {op!r}")
        right = self.arith_expr()
        return Filter(op, (left, right))


def _parse_modifiers(p: _P, q_out: Query) -> None:
    """GROUP BY / HAVING / ORDER BY / LIMIT / OFFSET — shared by the
    top-level query and nested sub-SELECTs (which carry their own
    modifiers inside the braces, SPARQL 1.1 §12)."""
    if p.kw("GROUP"):
        p.expect("BY")
        while True:
            tok = p.peek()
            if tok.startswith(("?", "$")):
                q_out.group_by.append(Var(p.next()[1:]))
            elif tok == "(":
                # GROUP BY (expr AS ?alias) — computed group key (§11.1)
                p.next()
                e = p.arith_expr()
                p.expect("AS")
                v = p.term()
                if not isinstance(v, Var):
                    raise SparqlParseError("GROUP BY expression needs 'AS ?var'")
                p.expect(")")
                q_out.group_by.append(ExprProj(e, v.name))
            else:
                break
        if not q_out.group_by:
            raise SparqlParseError("GROUP BY needs at least one variable")
    while p.kw("HAVING"):
        # HAVING over projected aggregate aliases OR inline aggregate
        # calls — HAVING (COUNT(*) > 5) (SPARQL 1.1 §11.2)
        p.allow_agg = True
        try:
            q_out.having.append(p.filter_expr())
        finally:
            p.allow_agg = False
    if p.kw("ORDER"):
        p.expect("BY")
        while True:
            tok = p.peek()
            if tok.upper() in ("ASC", "DESC") and p.peek(1) == "(":
                desc = tok.upper() == "DESC"
                p.next()
                p.expect("(")
                # full value expression allowed: ORDER BY DESC(STRLEN(?n))
                v = p.arith_expr()
                p.expect(")")
                q_out.order_by.append((v, desc))
            elif tok.startswith(("?", "$")):
                q_out.order_by.append((Var(p.next()[1:]), False))
            else:
                break
    if p.kw("LIMIT"):
        q_out.limit = int(p.next())
    if p.kw("OFFSET"):
        q_out.offset = int(p.next())


def _parse_select(p: _P, prefixes: dict) -> Query:
    """Parse a SELECT form, the SELECT keyword already consumed. Used for
    both the top-level query and `{ SELECT ... }` subqueries."""
    distinct = p.kw("DISTINCT")
    variables: list = []
    if p.peek() == "*":
        p.next()
    else:
        while True:
            tok = p.peek()
            if tok.startswith(("?", "$")):
                variables.append(Var(p.next()[1:]))
            elif tok == "(" and p.peek(1).lower() not in (
                "count", "sum", "avg", "min", "max", "group_concat", "sample"
            ):
                # (expr AS ?alias) — non-aggregate projection expression
                p.next()
                e = p.arith_expr()
                p.expect("AS")
                av = p.term()
                if not isinstance(av, Var):
                    raise SparqlParseError("projection expression needs 'AS ?var'")
                p.expect(")")
                variables.append(ExprProj(e, av.name))
            elif tok == "(":
                # (AGGFN([DISTINCT] ?v | expr | * [; SEPARATOR="s"]) AS ?alias)
                p.next()
                fn = p.next().lower()
                p.expect("(")
                agg_distinct = p.kw("DISTINCT")
                if p.peek() == "*":
                    p.next()
                    v = None
                else:
                    v = p.arith_expr()
                sep = " "
                if p.peek() == ";":
                    p.next()
                    p.expect("SEPARATOR")
                    p.expect("=")
                    sep_tok = p.next()
                    if not sep_tok.startswith('"'):
                        raise SparqlParseError("SEPARATOR needs a string literal")
                    sep = sep_tok[1:-1].encode().decode("unicode_escape")
                p.expect(")")
                p.expect("AS")
                av = p.term()
                if not isinstance(av, Var):
                    raise SparqlParseError("aggregate needs 'AS ?var'")
                p.expect(")")
                variables.append(AggExpr(fn, v, av.name, agg_distinct, sep))
            else:
                break
        if not variables:
            raise SparqlParseError("SELECT needs '*' or variables")
    from_default, from_named = _parse_dataset_clauses(p)
    p.kw("WHERE")
    where = p.group()
    q_out = Query(
        "select", variables, distinct, where, prefixes=prefixes,
        from_default=from_default, from_named=from_named,
    )
    _parse_modifiers(p, q_out)
    return q_out


def _parse_dataset_clauses(p: _P) -> tuple[list, list]:
    """FROM <g> / FROM NAMED <g> dataset clauses (SPARQL 1.1 §13.2)."""
    from_default: list[str] = []
    from_named: list[str] = []
    while p.kw("FROM"):
        named = p.kw("NAMED")
        t = p.term()
        if not isinstance(t, Iri):
            raise SparqlParseError("FROM needs an IRI")
        (from_named if named else from_default).append(t.value)
    return from_default, from_named


def parse_sparql(q: str) -> Query:
    toks = _tokenize(q)
    prefixes: dict[str, str] = {}
    p = _P(toks, prefixes)
    while p.kw("PREFIX"):
        pname = p.next()
        if pname.endswith(":"):
            pfx = pname[:-1]
        elif ":" in pname:
            pfx = pname.split(":", 1)[0]
        else:
            pfx = pname
            p.expect(":")
        iri = p.next()
        if not iri.startswith("<"):
            raise SparqlParseError(f"expected IRI after PREFIX, got {iri!r}")
        prefixes[pfx] = iri[1:-1]
    if p.kw("SELECT"):
        q_out = _parse_select(p, prefixes)
    elif p.kw("CONSTRUCT"):
        if p.peek().upper() in ("WHERE", "FROM"):
            # CONSTRUCT WHERE { ... } shorthand (SPARQL 1.1 §10.2.2): the
            # template IS the pattern's plain triples
            from_default, from_named = _parse_dataset_clauses(p)
            p.expect("WHERE")
            where = p.group()
            q_out = Query(
                "construct", [], False, where,
                template=list(where.triples), prefixes=prefixes,
                from_default=from_default, from_named=from_named,
            )
            _parse_modifiers(p, q_out)
            if p.peek():
                raise SparqlParseError(f"unexpected trailing token {p.peek()!r}")
            return q_out
        p.expect("{")
        template = []
        while p.peek() != "}":
            s = p.term()
            pr = p.term()
            o = p.term()
            template.append(TriplePattern(s, pr, o))
            if p.peek() == ".":
                p.next()
        p.expect("}")
        from_default, from_named = _parse_dataset_clauses(p)
        p.expect("WHERE")
        where = p.group()
        q_out = Query(
            "construct", [], False, where, template=template, prefixes=prefixes,
            from_default=from_default, from_named=from_named,
        )
        _parse_modifiers(p, q_out)
    else:
        # same contract as the reference: only SELECT/CONSTRUCT evaluate
        raise SparqlParseError(
            # exact reference error text (SpHandler.scala:630-631), with the
            # accepted forms appended as a hint
            "This query type is not supported. "
            "(Query Type must be either SELECT or CONSTRUCT)"
        )
    if p.peek():
        raise SparqlParseError(f"unexpected trailing token {p.peek()!r}")
    return q_out
