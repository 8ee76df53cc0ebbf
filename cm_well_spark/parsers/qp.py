"""qp field-filter grammar (F1) — parser + AST.

Grammar re-expressed from the reference's combinator parser
(cmwell-ws/app/Parsers.scala:511-552 `BaseFieldFilterParser`,
:597-633 `FieldFilterParser`) and filter ADT
(cmwell-fts/src/main/scala/cmwell/fts/FTSService.scala:1809-1930):

    qp            := fieldFilter (',' fieldFilter)*        -- one bool level
    fieldFilter   := fieldOp? ( '[' qp ']' | single )
    single        := fieldName valueOp value?
    fieldOp       := '-' (MustNot) | '*' (Should) | ε (Must)
    valueOp       := '::' Equals | ':' Contains | '>>' Gte | '>' Gt
                   | '<<' Lte | '<' Lt | '~' Like
    fieldName     := [\\w+\\-*.$]+
    value         := '$' dollar-escaped '$' | [^:<>$,\\]][^,\\]]*  | ε (exists)

A value of None (empty) means field-existence test (Parsers.scala valueParser
is optional; ES side compiles to existsQuery, FTSService.scala:911-917).
`system.quad::<uri>` is the quad filter (Parsers.scala:615-624).
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field

MUST = "must"
SHOULD = "should"
MUSTNOT = "mustnot"

CONTAINS = "contains"
EQUALS = "equals"
GT = "gt"
GTE = "gte"
LT = "lt"
LTE = "lte"
LIKE = "like"


@dataclass(frozen=True)
class SingleFieldFilter:
    field_op: str
    value_op: str
    name: str
    value: str | None


@dataclass(frozen=True)
class MultiFieldFilter:
    field_op: str
    filters: tuple = field(default_factory=tuple)


FieldFilter = SingleFieldFilter | MultiFieldFilter


class QpParseError(ValueError):
    pass


_FIELD_RE = re.compile(r"[\w+\-*.$]+")
_UNESCAPED_VALUE_RE = re.compile(r"[^:<>$,\]][^,\]]*")
_DOLLARS_RE = re.compile(r"\$((?:\$\$|[^$])+)\$")
# longest-match first, as in the reference's alternation ("::" before ":")
_VALUE_OPS = [("::", EQUALS), (":", CONTAINS), (">>", GTE), (">", GT), ("<<", LTE), ("<", LT), ("~", LIKE)]


class _P:
    def __init__(self, s: str):
        self.s = s
        self.i = 0

    def eof(self) -> bool:
        return self.i >= len(self.s)

    def peek(self) -> str:
        return self.s[self.i] if self.i < len(self.s) else ""

    def fail(self, msg: str):
        raise QpParseError(f"{msg} at offset {self.i} in qp: {self.s!r}")

    def field_op(self) -> str:
        c = self.peek()
        if c == "-":
            self.i += 1
            return MUSTNOT
        if c == "*":
            self.i += 1
            return SHOULD
        return MUST

    def filters(self) -> list[FieldFilter]:
        out = [self.one()]
        while self.peek() == ",":
            self.i += 1
            out.append(self.one())
        return out

    def one(self) -> FieldFilter:
        fo = self.field_op()
        if self.peek() == "[":
            self.i += 1
            inner = self.filters()
            if self.peek() != "]":
                self.fail("expected ']'")
            self.i += 1
            return MultiFieldFilter(fo, tuple(inner))
        return self.single(fo)

    def single(self, fo: str) -> SingleFieldFilter:
        m = _FIELD_RE.match(self.s, self.i)
        if not m:
            self.fail("expected field name")
        name = m.group(0)
        self.i = m.end()
        vo = None
        for tok, op in _VALUE_OPS:
            if self.s.startswith(tok, self.i):
                vo = op
                self.i += len(tok)
                break
        if vo is None:
            self.fail("expected value operator (one of :: : >> > << < ~)")
        value: str | None = None
        dm = _DOLLARS_RE.match(self.s, self.i)
        if dm:
            value = dm.group(1).replace("$$", "$")
            self.i = dm.end()
        else:
            um = _UNESCAPED_VALUE_RE.match(self.s, self.i)
            if um:
                value = um.group(0)
                self.i = um.end()
        return SingleFieldFilter(fo, vo, name, value)


def parse_qp(qp: str) -> FieldFilter:
    """Parse a qp string into a FieldFilter tree.

    A single top-level filter stays bare; multiple top-level filters wrap in
    an implicit Must group (reference `unwrappedFieldFilters`,
    Parsers.scala:608-611)."""
    if not qp:
        raise QpParseError("qp param must not be empty")
    p = _P(qp)
    fs = p.filters()
    if not p.eof():
        p.fail("trailing input")
    if len(fs) == 1:
        return fs[0]
    return MultiFieldFilter(MUST, tuple(fs))
