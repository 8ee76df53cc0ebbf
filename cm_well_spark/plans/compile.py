"""FieldFilter AST -> Catalyst Column expression (F2).

Mirrors the reference's filter->index compilation
(FTSService.applyFiltersToRequest / applyFieldFilter, FTSService.scala:840-933):

  Contains            -> matchPhraseQuery on the analyzed field
                         => token-phrase containment after simple analysis
                            (lowercase, non-alnum -> space) — documented
                            divergence from Lucene's analyzer, SURVEY §7.
  Equals              -> termQuery on the `.%exact` keyword subfield
                         => exact string equality on the lexical form.
  Gt/Gte/Lt/Lte       -> typed rangeQuery => compare typed shadow (num/ts)
                         when the query literal parses, else lexicographic.
  Like                -> fuzzyQuery => levenshtein with ES AUTO fuzziness
                         (0 edits for len<3, 1 for 3-5, 2 for >5).
  (no value)          -> existsQuery => fields map has non-empty entry.

Bool combination follows ES `bool` semantics exactly: AND of musts, AND NOT
of mustNots, and `should` clauses are REQUIRED (OR'd) only when the level has
no must clauses (ES minimum_should_match default) — the reference relies on
this (SURVEY §2.2 F1). The in-memory SoftBoolean re-filter
(FTSService.scala:1841-1915) matches this for the cases it supports.

Everything compiles to pure `pyspark.sql.functions` expressions over the
doc-table schema — JVM-side, codegen-friendly, no Python UDFs.
"""

from __future__ import annotations

import contextlib
from datetime import datetime, timezone

from pyspark.sql import Column
from pyspark.sql import functions as F

from cm_well_spark.parsers.qp import (
    CONTAINS,
    EQUALS,
    GT,
    GTE,
    LIKE,
    LT,
    LTE,
    MUST,
    MUSTNOT,
    SHOULD,
    FieldFilter,
    MultiFieldFilter,
    SingleFieldFilter,
)

# system.* field keys -> top-level doc-table columns (the reference stores
# these under the `system.` object in ES, indices_template_new.json).
SYSTEM_COLUMNS = {
    "system.path": "path",
    "system.parent": "parent",
    "system.uuid": "uuid",
    "system.kind": "kind",
    "system.dc": "dc",
    "system.lastModified": "last_modified",
    "system.lastModifiedBy": "last_modified_by",
    "system.indexTime": "index_time",
    "system.protocol": "protocol",
    "content.mimeType": "mime_type",
    "link.to": "link_to",
}


def analyze_expr(c: Column, analyzer: str | None = None) -> Column:
    """The engine's text "analyzer" for `:` Contains / scoring.

    Modes (default `simple`, or set CMW_ANALYZER):
      simple    lowercase + collapse non-alphanumerics to single spaces —
                the documented, oracle-pinned default (divergence table
                in SURVEY §7.3 / tests/test_analyzer_contract.py).
      uax29ish  Lucene StandardAnalyzer's UAX#29 word break, positional
                (r11 — VERDICT r10 item 8): a single apostrophe survives
                only BETWEEN letters (WB6/WB7 MidLetter: o'brien, dog's;
                3'4 splits), a single period only letter.letter or
                digit.digit (WB6/7 + WB11/12 MidNumLet: b.com, 3.14;
                a.3 splits), `@` always breaks (StandardAnalyzer is NOT
                the UAX29URLEmail tokenizer: a@b.com -> a, b.com);
                underscores join (ExtendNumLet) and are stripped at
                token edges; Han and Hiragana characters emit UNIGRAM
                tokens while Katakana runs stay single tokens
                (StandardTokenizer's IDEOGRAPHIC/HIRAGANA vs KATAKANA
                types). Remaining divergence: `simple` mode CJK, edge
                ExtendNumLet (Lucene keeps `_x_` whole; we strip), and
                exact Lucene relevance scores."""
    import os

    mode = analyzer or os.environ.get("CMW_ANALYZER", "simple")
    if mode == "simple":
        return F.trim(F.regexp_replace(F.lower(c), r"[^\p{L}\p{N}]+", " "))
    if mode == "uax29ish":
        kept = F.regexp_replace(F.lower(c), r"[^\p{L}\p{N}'._]+", " ")
        # positional mid-char rules (UAX#29 single-mid-between-alnums):
        # runs of mids always break; ' must sit between letters; . must
        # sit letter.letter or digit.digit
        kept = F.regexp_replace(kept, r"['.]{2,}", " ")
        kept = F.regexp_replace(kept, r"(?<!\p{L})'|'(?!\p{L})", " ")
        kept = F.regexp_replace(
            kept,
            r"(?<=\p{L})\.(?=\p{N})|(?<=\p{N})\.(?=\p{L})|(?<![\p{L}\p{N}])\.|\.(?![\p{L}\p{N}])",
            " ",
        )
        # strip remaining kept punctuation at token EDGES (underscore
        # clusters; ExtendNumLet is mid-word only in this mode)
        edge_stripped = F.regexp_replace(kept, r"(?:(?<=\s)|^)['._]+|['._]+(?=\s|$)", "")
        # CJK: Han ideographs and Hiragana tokenize as unigrams (Lucene
        # StandardTokenizer IDEOGRAPHIC/HIRAGANA token types); Katakana
        # runs stay whole (KATAKANA type spans the run)
        cjk_split = F.regexp_replace(edge_stripped, r"([\p{IsHan}\p{InHiragana}])", " $1 ")
        return F.trim(F.regexp_replace(cjk_split, r"\s+", " "))
    raise ValueError(f"unknown analyzer {mode!r} (know: simple, uax29ish)")


@contextlib.contextmanager
def analyzer_mode(mode: str):
    """Scope the analyzer for plans BUILT inside the block. The mode is
    resolved at Column-construction time on the driver (analyze_expr
    reads it while the plan is being assembled), so this selects the
    analyzer per-plan without mutating executor state or leaking into
    later plans."""
    import os

    prev = os.environ.get("CMW_ANALYZER")
    os.environ["CMW_ANALYZER"] = mode
    try:
        yield
    finally:
        if prev is None:
            os.environ.pop("CMW_ANALYZER", None)
        else:
            os.environ["CMW_ANALYZER"] = prev


def _fuzz(term: str) -> int:
    # ES AUTO fuzziness buckets
    n = len(term)
    return 0 if n < 3 else (1 if n <= 5 else 2)


def _parse_literal(value: str):
    """Classify the query literal once at compile time (the reference
    dispatches on the indexed field's mapped type; we dispatch on the
    literal, which matches for well-formed queries)."""
    try:
        return ("num", float(value))
    except ValueError:
        pass
    for fmt in ("%Y-%m-%dT%H:%M:%S.%fZ", "%Y-%m-%dT%H:%M:%SZ", "%Y-%m-%dT%H:%M:%S", "%Y-%m-%d"):
        try:
            return ("ts", datetime.strptime(value, fmt).replace(tzinfo=timezone.utc))
        except ValueError:
            continue
    return ("str", value)


def _range_pred(vo: str, value: str):
    kind, lit = _parse_literal(value)
    ops = {GT: "__gt__", GTE: "__ge__", LT: "__lt__", LTE: "__le__"}
    op = ops[vo]

    def pred(v: Column) -> Column:
        if kind == "num":
            return getattr(v["num"], op)(F.lit(lit))
        if kind == "ts":
            return getattr(v["ts"], op)(F.lit(lit.replace(tzinfo=None)))
        return getattr(v["value"], op)(F.lit(lit))

    return pred


def _value_pred(vo: str, value: str):
    """Predicate over ONE field-value struct."""
    if vo == EQUALS:
        return lambda v: v["value"] == F.lit(value)
    if vo == CONTAINS:
        needle = F.concat(F.lit(" "), analyze_expr(F.lit(value)), F.lit(" "))
        return lambda v: F.contains(F.concat(F.lit(" "), analyze_expr(v["value"]), F.lit(" ")), needle)
    if vo == LIKE:
        # Lucene fuzzyQuery parity (FTSService.scala:905-910): the query
        # term matches if ANY analyzed token of the value is within the
        # AUTO edit distance — `name~widgt` matches "large widget". The
        # query term itself is lowercased but NOT analyzed (FuzzyQuery
        # bypasses analysis in Lucene too).
        k = _fuzz(value)
        needle = F.lit(value.lower())
        return lambda v: F.exists(
            F.split(analyze_expr(v["value"]), " "),
            lambda tok: F.levenshtein(tok, needle) <= F.lit(k),
        )
    return _range_pred(vo, value)


def _system_pred(ff: SingleFieldFilter) -> Column:
    col = F.col(SYSTEM_COLUMNS[ff.name])
    if ff.value is None:
        return col.isNotNull()
    v = ff.value
    if ff.name == "system.indexTime":
        lit = F.lit(int(v))
    elif ff.name == "system.lastModified":
        kind, parsed = _parse_literal(v)
        lit = F.lit(parsed.replace(tzinfo=None) if kind == "ts" else v)
    else:
        lit = F.lit(v)
    return {
        EQUALS: col == lit,
        CONTAINS: col.contains(lit),
        GT: col > lit,
        GTE: col >= lit,
        LT: col < lit,
        LTE: col <= lit,
        LIKE: F.levenshtein(F.lower(col), F.lower(lit)) <= F.lit(_fuzz(v)),
    }[ff.value_op]


def _single_match(ff: SingleFieldFilter) -> Column:
    """Match column for one field predicate (ignoring its field_op, which
    the enclosing bool level consumes)."""
    name = ff.name
    # type-mangle prefix ("X$name", Infoton.scala:527-537 / in-memory
    # unmangling FTSService.scala:1860): a mangled name restricts the
    # match to values of THAT type — the compile-side half of F9 type-set
    # expansion (RawFieldFilter.scala:103-148); unmangled names match any
    # type, so the expansion to a Should-group of mangled variants is
    # semantics-preserving
    vtype_code = None
    if len(name) > 2 and name[1] == "$":
        vtype_code = name[0]
        name = name[2:]
    if name == "system.quad":
        # quad filter (F8): any value of any field tagged with this graph
        if ff.value is None:
            return F.exists(
                F.map_values("fields"), lambda vs: F.exists(vs, lambda v: v["quad"].isNotNull())
            )
        return F.exists(
            F.map_values("fields"), lambda vs: F.exists(vs, lambda v: v["quad"] == F.lit(ff.value))
        )
    if name in SYSTEM_COLUMNS:
        return _system_pred(ff)
    vals = F.col("fields").getItem(name)
    if vtype_code is not None:
        vals = F.filter(vals, _vtype_pred(vtype_code))
    if ff.value is None:
        return vals.isNotNull() & (F.size(vals) > 0)
    pred = _value_pred(ff.value_op, ff.value)
    # multi-valued semantics: the field matches if ANY value matches
    # (fields are value sets; ES indexes each value)
    return F.coalesce(F.exists(vals, pred), F.lit(False))


def _vtype_pred(code: str):
    # int/long and float/double collapse pairwise in this engine's typed
    # struct, like the reference's in-memory unmangling treats them
    group = {"i": ("i", "l"), "l": ("i", "l"), "f": ("f", "w"), "w": ("f", "w")}.get(code, (code,))
    return lambda v: v["vtype"].isin(*group)


def compile_filter(ff: FieldFilter) -> Column:
    """Compile a FieldFilter tree to one boolean Column."""
    if isinstance(ff, SingleFieldFilter):
        # bare single filter at top level: its own op forms a 1-clause level
        return _bool_level([ff])
    return _bool_level(list(ff.filters))


def _bool_level(filters: list[FieldFilter]) -> Column:
    musts, shoulds, must_nots = [], [], []
    for f in filters:
        c = _match(f)
        if f.field_op == MUSTNOT:
            must_nots.append(c)
        elif f.field_op == SHOULD:
            shoulds.append(c)
        else:
            musts.append(c)
    expr = F.lit(True)
    for c in musts:
        expr = expr & c
    for c in must_nots:
        expr = expr & ~c
    if shoulds and not musts:
        ored = shoulds[0]
        for c in shoulds[1:]:
            ored = ored | c
        expr = expr & ored
    return expr


def _match(f: FieldFilter) -> Column:
    if isinstance(f, SingleFieldFilter):
        return _single_match(f)
    return _bool_level(list(f.filters))
