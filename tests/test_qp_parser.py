import pytest

from cm_well_spark.parsers.qp import (
    CONTAINS,
    EQUALS,
    GT,
    GTE,
    LIKE,
    LT,
    MUST,
    MUSTNOT,
    SHOULD,
    MultiFieldFilter,
    QpParseError,
    SingleFieldFilter,
    parse_qp,
)


def test_single_equals():
    # doctest pin from reference Parsers.scala: system.quad::<uri> parses to
    # Must/Equals
    ff = parse_qp("system.quad::http://data.example.com/2-667823")
    assert ff == SingleFieldFilter(MUST, EQUALS, "system.quad", "http://data.example.com/2-667823")


def test_ops():
    assert parse_qp("a:b").value_op == CONTAINS
    assert parse_qp("a::b").value_op == EQUALS
    assert parse_qp("a>5").value_op == GT
    assert parse_qp("a>>5").value_op == GTE
    assert parse_qp("a<5").value_op == LT
    assert parse_qp("a~xyz").value_op == LIKE


def test_field_ops_and_list():
    ff = parse_qp("x::1,-y::2,*z::3")
    assert isinstance(ff, MultiFieldFilter) and ff.field_op == MUST
    ops = [f.field_op for f in ff.filters]
    assert ops == [MUST, MUSTNOT, SHOULD]


def test_existence():
    ff = parse_qp("alt.wgs84:")
    assert ff.value is None and ff.value_op == CONTAINS


def test_nested_group():
    ff = parse_qp("a::1,[*b::2,*c::3]")
    assert isinstance(ff.filters[1], MultiFieldFilter)
    inner = ff.filters[1]
    assert [f.field_op for f in inner.filters] == [SHOULD, SHOULD]


def test_dollar_escape():
    # reference doctest: x:$~,~:z$ -> Contains "~,~:z"
    ff = parse_qp("x:$~,~:z$")
    assert ff == SingleFieldFilter(MUST, CONTAINS, "x", "~,~:z")


def test_dollar_double_escape():
    ff = parse_qp("x:$foo$$bar$")
    assert ff.value == "foo$bar"


def test_bogus_rejected():
    # reference doctest: "x:,:z" fails
    with pytest.raises(QpParseError):
        parse_qp("x:,:z")
    with pytest.raises(QpParseError):
        parse_qp("")
