"""Minimal SPARQL parser — the subset the reference supports (J4/J5).

The reference evaluates SELECT and CONSTRUCT only (everything else is
rejected: SpHandler.scala:630-631 "Query Type must be either SELECT or
CONSTRUCT"), over BGPs with FILTER / OPTIONAL / UNION, ORDER BY, LIMIT,
OFFSET, DISTINCT (SpHandler.evaluateSparql:598-670; whole-graph engine
JenaArqExtensions.scala:375-519). This hand-rolled recursive-descent
parser covers exactly that subset and rejects the rest with explicit
errors, mirroring the reference's error contract (SparqlTests.scala:89
pins "fully unbound pattern" rejection — enforced at compile time in
compiler.py).

Grammar (informal):
    query    := prefix* (select | construct)
    prefix   := 'PREFIX' pname ':' '<' iri '>'
    select   := 'SELECT' 'DISTINCT'? ('*' | var+) 'WHERE'? group modifiers
    construct:= 'CONSTRUCT' '{' template '}' 'WHERE' group modifiers
    group    := '{' (triple | filter | optional | union-block | group)* '}'
    optional := 'OPTIONAL' group
    union    := group 'UNION' group ('UNION' group)*
    filter   := 'FILTER' '(' expr ')'   -- comparison / regex / logical
    modifiers:= ('ORDER' 'BY' ('ASC'|'DESC'|var)+)? ('LIMIT' n)? ('OFFSET' n)?
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
    dtype: str | None = None  # xsd type iri or None


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
    """SPARQL 1.1 aggregate projection: (FN(?v) AS ?alias)."""

    fn: str  # count | sum | avg | min | max
    var: Var | None  # None = COUNT(*)
    alias: str
    distinct: bool = False


@dataclass
class Group:
    """A basic graph pattern group: triples + filters + optionals + unions."""

    triples: list = field(default_factory=list)
    filters: list = field(default_factory=list)
    optionals: list = field(default_factory=list)  # list[Group]
    unions: list = field(default_factory=list)  # list[list[Group]] (branches)


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


_TOKEN = re.compile(
    r"""\s*(?:
      (?P<comment>\#[^\n]*)
    | (?P<iri><[^>\s]*>)
    | (?P<var>[?$][A-Za-z_][\w]*)
    | (?P<string>"(?:[^"\\]|\\.)*")
    | (?P<number>[+-]?\d+(?:\.\d+)?)
    | (?P<pname>[A-Za-z_][\w\-]*:[\w\-./#%]*)
    | (?P<kw>[A-Za-z_][\w]*)
    | (?P<punct>\{|\}|\(|\)|\.|;|,|\*|=|!=|<=|>=|<|>|&&|\|\||!|:)
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
            dtype = None
            if self.peek() == "^^" or (self.peek() == "^" and self.peek(1) == "^"):
                raise SparqlParseError("typed literal syntax '^^' not supported; use plain literals")
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

    # ---- group graph pattern ----

    def group(self) -> Group:
        self.expect("{")
        g = Group()
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
                g.filters.append(self.filter_expr())
                continue
            if up == "OPTIONAL":
                self.next()
                g.optionals.append(self.group())
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
                    # plain nested group: merge
                    g.triples.extend(first.triples)
                    g.filters.extend(first.filters)
                    g.optionals.extend(first.optionals)
                    g.unions.extend(first.unions)
                continue
            # triple pattern (with ; and , continuations)
            s = self.term()
            while True:
                p = self.term()
                while True:
                    o = self.term()
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

    def unary_expr(self) -> Filter:
        if self.peek() == "!":
            self.next()
            return Filter("!", (self.unary_expr(),))
        if self.peek() == "(":
            self.next()
            e = self.or_expr()
            self.expect(")")
            return e
        if self.peek().upper() == "REGEX":
            self.next()
            self.expect("(")
            v = self.term()
            self.expect(",")
            pat = self.term()
            flags = None
            if self.peek() == ",":
                self.next()
                flags = self.term()
            self.expect(")")
            return Filter("regex", (v, pat, flags))
        left = self.term()
        op = self.next()
        if op not in ("=", "!=", "<", "<=", ">", ">="):
            raise SparqlParseError(f"unsupported FILTER operator {op!r}")
        right = self.term()
        return Filter(op, (left, right))


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
        distinct = p.kw("DISTINCT")
        variables: list = []
        if p.peek() == "*":
            p.next()
        else:
            while True:
                tok = p.peek()
                if tok.startswith(("?", "$")):
                    variables.append(Var(p.next()[1:]))
                elif tok == "(":
                    # (AGGFN([DISTINCT] ?v | *) AS ?alias)
                    p.next()
                    fn = p.next().lower()
                    if fn not in ("count", "sum", "avg", "min", "max"):
                        raise SparqlParseError(f"unsupported aggregate {fn!r}")
                    p.expect("(")
                    agg_distinct = p.kw("DISTINCT")
                    if p.peek() == "*":
                        p.next()
                        v = None
                    else:
                        v = Var(p.next()[1:])
                    p.expect(")")
                    p.expect("AS")
                    alias = p.next()[1:]
                    p.expect(")")
                    variables.append(AggExpr(fn, v, alias, agg_distinct))
                else:
                    break
            if not variables:
                raise SparqlParseError("SELECT needs '*' or variables")
        p.kw("WHERE")
        where = p.group()
        q_out = Query("select", variables, distinct, where, prefixes=prefixes)
    elif p.kw("CONSTRUCT"):
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
        p.expect("WHERE")
        where = p.group()
        q_out = Query("construct", [], False, where, template=template, prefixes=prefixes)
    else:
        # same contract as the reference: only SELECT/CONSTRUCT evaluate
        raise SparqlParseError("Query Type must be either SELECT or CONSTRUCT")
    # solution modifiers
    if p.kw("GROUP"):
        p.expect("BY")
        while p.peek().startswith(("?", "$")):
            q_out.group_by.append(Var(p.next()[1:]))
        if not q_out.group_by:
            raise SparqlParseError("GROUP BY needs at least one variable")
    if p.kw("ORDER"):
        p.expect("BY")
        while True:
            tok = p.peek()
            if tok.upper() in ("ASC", "DESC"):
                desc = tok.upper() == "DESC"
                p.next()
                p.expect("(")
                v = p.term()
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
    if p.peek():
        raise SparqlParseError(f"unexpected trailing token {p.peek()!r}")
    return q_out
