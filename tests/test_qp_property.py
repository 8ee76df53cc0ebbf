"""Property tests for the qp grammar: every generated AST round-trips
through rendering + parsing (the reference pins its grammar with doctests;
hypothesis covers the space between them)."""

from hypothesis import given, settings, strategies as st

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
    MultiFieldFilter,
    SingleFieldFilter,
    parse_qp,
)

_FIELD = st.from_regex(r"[A-Za-z][A-Za-z0-9_.]{0,8}", fullmatch=True)
_OPS = {EQUALS: "::", CONTAINS: ":", GT: ">", GTE: ">>", LT: "<", LTE: "<<", LIKE: "~"}
_FOS = {MUST: "", SHOULD: "*", MUSTNOT: "-"}
# unescaped values: no leading :<>$ and no , or ] anywhere
_VALUE = st.from_regex(r"[A-Za-z0-9 _./@&+-][A-Za-z0-9 _./@&+:<>-]{0,10}", fullmatch=True)


@st.composite
def _single(draw):
    fo = draw(st.sampled_from([MUST, SHOULD, MUSTNOT]))
    vo = draw(st.sampled_from(list(_OPS)))
    name = draw(_FIELD)
    value = draw(st.one_of(st.none(), _VALUE))
    return SingleFieldFilter(fo, vo, name, value)


@st.composite
def _tree(draw, depth=0):
    if depth >= 2 or draw(st.booleans()):
        return draw(_single())
    fo = draw(st.sampled_from([MUST, SHOULD, MUSTNOT]))
    children = draw(st.lists(_tree(depth=depth + 1), min_size=1, max_size=3))
    return MultiFieldFilter(fo, tuple(children))


def _render(ff) -> str:
    if isinstance(ff, SingleFieldFilter):
        v = ff.value
        if v is None:
            body = ""
        elif v and v[0] not in ':<>$' and "," not in v and "]" not in v:
            body = v
        else:
            body = "$" + (v or "").replace("$", "$$") + "$"
        return f"{_FOS[ff.field_op]}{ff.name}{_OPS[ff.value_op]}{body}"
    inner = ",".join(_render(f) for f in ff.filters)
    return f"{_FOS[ff.field_op]}[{inner}]"


def _normalize(ff):
    """Parsing strips the implicit top-level wrapper for single filters."""
    return ff


@given(_tree())
@settings(max_examples=300, deadline=None)
def test_qp_roundtrip(ff):
    rendered = _render(ff)
    parsed = parse_qp(rendered)
    # a top-level Must group of one parses to the bare inner filter when
    # rendered without brackets; rendering always brackets groups, so the
    # parse must reproduce the tree exactly
    assert parsed == ff, f"{rendered!r}: {parsed} != {ff}"


@given(st.text(alphabet="abc:,[]$*<>~-", max_size=16))
@settings(max_examples=300, deadline=None)
def test_qp_never_crashes_unexpectedly(s):
    from cm_well_spark.parsers.qp import QpParseError

    try:
        parse_qp(s)
    except QpParseError:
        pass  # rejection is fine; any other exception type is a bug
