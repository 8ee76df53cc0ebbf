"""xg / yg / gqp traversal grammars (J1-J3) — parsers + ASTs.

Re-expressed from the reference's parsers:
  xg   ExpandGraphParser, cmwell-ws/app/Parsers.scala:429-465
       xg={expander}{>expander}* — expander is `_` (all fields), a digit
       1-9 (that many `_` levels), or a comma list of field names; each
       item takes an optional `[qp]` filter on the expanded-to infotons.
  yg   PathGraphExpansionParser, Parsers.scala:479-509
       chained segments: `>fields` expand-in (forward deref) and
       `<fields` expand-up (reverse: who points at me); `|` unions
       alternative paths; per-segment `[qp]` filters.
  gqp  same grammar as yg (getGQPs, Parsers.scala:501) — applied as a
       result-set FILTER, not an expansion (wsutil gqpFilter:751-849).

Pinned by the reference's doctests: "x>yyy>abc,xyz" -> 3 levels;
"2" == "_>_"; digit+levels concatenation "2>a.b".
"""

from __future__ import annotations

import re
from dataclasses import dataclass

from cm_well_spark.parsers.qp import FieldFilter, QpParseError, _P as _QpP


class ExpansionParseError(ValueError):
    pass


@dataclass(frozen=True)
class FilteredField:
    """One field selector with optional qp filter on the target infotons.
    field=None means the `_` joker (every field)."""

    field: str | None
    qp: FieldFilter | None = None


@dataclass(frozen=True)
class LevelExpansion:
    fields: tuple[FilteredField, ...]


@dataclass(frozen=True)
class ExpandIn:  # '>' forward dereference
    fields: tuple[FilteredField, ...]


@dataclass(frozen=True)
class ExpandUp:  # '<' reverse join
    fields: tuple[FilteredField, ...]


@dataclass(frozen=True)
class PathExpansion:
    segments: tuple


@dataclass(frozen=True)
class PathsExpansion:
    paths: tuple[PathExpansion, ...]


_FIELD_RE = re.compile(r"[\w+\-*.$]+")


class _P:
    def __init__(self, s: str):
        self.s = s
        self.i = 0

    def eof(self):
        return self.i >= len(self.s)

    def peek(self):
        return self.s[self.i] if self.i < len(self.s) else ""

    def fail(self, msg):
        raise ExpansionParseError(f"{msg} at offset {self.i} in: {self.s!r}")

    def opt_filter(self) -> FieldFilter | None:
        """`[qp]` — reuse the qp parser for the bracketed filter body."""
        if self.peek() != "[":
            return None
        self.i += 1
        qp = _QpP(self.s)
        qp.i = self.i
        filters = qp.filters()
        self.i = qp.i
        if self.peek() != "]":
            self.fail("expected ']'")
        self.i += 1
        from cm_well_spark.parsers.qp import MUST, MultiFieldFilter

        return filters[0] if len(filters) == 1 else MultiFieldFilter(MUST, tuple(filters))

    def filtered_field(self) -> FilteredField:
        if self.peek() == "_":
            self.i += 1
            return FilteredField(None, self.opt_filter())
        m = _FIELD_RE.match(self.s, self.i)
        if not m:
            self.fail("expected field name, '_' or digit")
        self.i = m.end()
        return FilteredField(m.group(0), self.opt_filter())

    def filtered_fields(self) -> tuple[FilteredField, ...]:
        out = [self.filtered_field()]
        while self.peek() == ",":
            self.i += 1
            out.append(self.filtered_field())
        return tuple(out)


def parse_xg(xg: str) -> list[LevelExpansion]:
    """xg="" means one joker level (getLevelsExpansionFunctions empty case)."""
    if not xg:
        return [LevelExpansion((FilteredField(None, None),))]
    p = _P(xg)
    levels: list[LevelExpansion] = []
    # optional leading digit = that many joker levels
    if p.peek().isdigit():
        if p.peek() == "0":
            p.fail("digit must be 1-9")
        n = int(p.peek())
        p.i += 1
        f = p.opt_filter()
        levels.extend(LevelExpansion((FilteredField(None, f),)) for _ in range(n))
        if p.eof():
            return levels
        if p.peek() != ">":
            p.fail("expected '>'")
        p.i += 1
    while True:
        if p.peek() == "_":
            p.i += 1
            levels.append(LevelExpansion((FilteredField(None, p.opt_filter()),)))
        else:
            levels.append(LevelExpansion(p.filtered_fields()))
        if p.peek() == ">":
            p.i += 1
            continue
        break
    if not p.eof():
        p.fail("trailing input")
    return levels


def _parse_paths(s: str, api: str) -> PathsExpansion:
    if not s:
        raise ExpansionParseError(f"{api} empty input")
    p = _P(s)
    paths = []
    while True:
        segments = []
        while p.peek() in ("<", ">"):
            c = p.peek()
            p.i += 1
            ff = p.filtered_fields()
            segments.append(ExpandUp(ff) if c == "<" else ExpandIn(ff))
        paths.append(PathExpansion(tuple(segments)))
        if p.peek() == "|":
            p.i += 1
            continue
        break
    if not p.eof():
        p.fail("trailing input")
    return PathsExpansion(tuple(paths))


def parse_yg(yg: str) -> PathsExpansion:
    return _parse_paths(yg, "yg")


def parse_gqp(gqp: str) -> PathsExpansion:
    return _parse_paths(gqp, "gqp")
