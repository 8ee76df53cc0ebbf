"""ap aggregation grammar (§2.4) — parser + AST.

Re-expressed from the reference's AggregationsFiltersParser
(cmwell-ws/app/Parsers.scala:157-275) and domain ADT
(cmwell-domain/src/main/scala/cmwell/domain/AggregationFilter.scala:38-79):

    ap      := agg ('~' agg)*
    agg     := 'type:term' name? rawField size? subs?
             | 'type:stats' name? rawField
             | 'type:hist' name? rawField interval? minDocCount? extMin? extMax? subs?
             | 'type:sig'  name? rawField backgroundTerm? minDocCount? size? subs?
             | 'type:card' name? rawField precisionThreshold?
    name    := ',name:' literal
    rawField:= ',field' ('::'|':') fieldname     -- '::' exact, ':' analyzed
    subs    := '<' ap '>'                        -- nested sub-aggregations
    backgroundTerm := ',backgroundTerm:' key '*' value

Defaults follow the reference: term size 10, hist interval 5,
minDocCount 0, sig size 10.
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field as dfield


class ApParseError(ValueError):
    pass


@dataclass(frozen=True)
class AggField:
    name: str
    exact: bool  # True = '::' NonAnalyzedField, False = ':' AnalyzedField


@dataclass(frozen=True)
class TermAgg:
    field: AggField
    name: str = "TermAggregation"
    size: int = 10
    subs: tuple = ()


@dataclass(frozen=True)
class StatsAgg:
    field: AggField
    name: str = "StatsAggregation"


@dataclass(frozen=True)
class HistAgg:
    field: AggField
    name: str = "HistogramAggregation"
    interval: int = 5
    min_doc_count: int = 0
    ext_min: float | None = None
    ext_max: float | None = None
    subs: tuple = ()


@dataclass(frozen=True)
class SigAgg:
    field: AggField
    name: str = "SignificantTermsAggregation"
    background_term: tuple[str, str] | None = None
    min_doc_count: int = 0
    size: int = 10
    subs: tuple = ()


@dataclass(frozen=True)
class CardAgg:
    field: AggField
    name: str = "CardinalityAggregation"
    precision_threshold: int | None = None


AggFilter = TermAgg | StatsAgg | HistAgg | SigAgg | CardAgg

_SLITERAL = r"(?:[\p{L}\p{Sc}0-9/.@ &_\-]+)"
# python re has no \p{L}; use a practical equivalent
_LIT_RE = re.compile(r"[^,<>~*]+")
_NUM_RE = re.compile(r"\d+")
_DBL_RE = re.compile(r"[0-9]*\.?[0-9]+")
_FIELD_RE = re.compile(r"[\w+\-*.$]+")


class _P:
    def __init__(self, s: str):
        self.s = s
        self.i = 0

    def eof(self):
        return self.i >= len(self.s)

    def fail(self, msg):
        raise ApParseError(f"{msg} at offset {self.i} in ap: {self.s!r}")

    def lit(self, tok: str) -> bool:
        if self.s.startswith(tok, self.i):
            self.i += len(tok)
            return True
        return False

    def rx(self, rx: re.Pattern, what: str) -> str:
        m = rx.match(self.s, self.i)
        if not m:
            self.fail(f"expected {what}")
        self.i = m.end()
        return m.group(0)

    def opt_name(self) -> str | None:
        if self.lit(",name:"):
            return self.rx(_LIT_RE, "name literal")
        return None

    def raw_field(self) -> AggField:
        if not self.lit(",field"):
            self.fail("expected ',field'")
        if self.lit("::"):
            exact = True
        elif self.lit(":"):
            exact = False
        else:
            self.fail("expected ':' or '::' after field")
        return AggField(self.rx(_FIELD_RE, "field name"), exact)

    def opt_int(self, key: str) -> int | None:
        if self.lit(f",{key}:"):
            return int(self.rx(_NUM_RE, "integer"))
        return None

    def opt_dbl(self, key: str) -> float | None:
        if self.lit(f",{key}:"):
            return float(self.rx(_DBL_RE, "number"))
        return None

    def subs(self) -> tuple:
        if self.lit("<"):
            inner = self.aggs()
            if not self.lit(">"):
                self.fail("expected '>'")
            return tuple(inner)
        return ()

    def aggs(self) -> list[AggFilter]:
        out = [self.agg()]
        while self.lit("~"):
            out.append(self.agg())
        return out

    def agg(self) -> AggFilter:
        if not self.lit("type:"):
            self.fail("expected 'type:'")
        if self.lit("term"):
            name = self.opt_name() or "TermAggregation"
            f = self.raw_field()
            size = self.opt_int("size")
            return TermAgg(f, name, size if size is not None else 10, self.subs())
        if self.lit("stats"):
            name = self.opt_name() or "StatsAggregation"
            return StatsAgg(self.raw_field(), name)
        if self.lit("hist"):
            name = self.opt_name() or "HistogramAggregation"
            f = self.raw_field()
            interval = self.opt_int("interval")
            mdc = self.opt_int("minDocCount")
            ext_min = self.opt_dbl("extMin")
            ext_max = self.opt_dbl("extMax")
            return HistAgg(
                f,
                name,
                interval if interval is not None else 5,
                mdc if mdc is not None else 0,
                ext_min,
                ext_max,
                self.subs(),
            )
        if self.lit("sig"):
            name = self.opt_name() or "SignificantTermsAggregation"
            f = self.raw_field()
            bg = None
            if self.lit(",backgroundTerm:"):
                k = self.rx(_LIT_RE, "background key")
                if not self.lit("*"):
                    self.fail("expected '*' in backgroundTerm")
                v = self.rx(_LIT_RE, "background value")
                bg = (k, v)
            mdc = self.opt_int("minDocCount")
            size = self.opt_int("size")
            return SigAgg(f, name, bg, mdc if mdc is not None else 0, size if size is not None else 10, self.subs())
        if self.lit("card"):
            name = self.opt_name() or "CardinalityAggregation"
            f = self.raw_field()
            pt = self.opt_int("precisionThreshold")
            return CardAgg(f, name, pt)
        self.fail("unknown aggregation type (term|stats|hist|sig|card)")


def parse_ap(ap: str | None) -> list[AggFilter]:
    if not ap:
        raise ApParseError("'ap' parameter is required for aggregation operation")
    p = _P(ap)
    out = p.aggs()
    if not p.eof():
        p.fail("trailing input")
    return out
