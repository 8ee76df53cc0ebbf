from pyspark.sql import functions as F

from cm_well_spark.operators.search import search
from cm_well_spark.operators.traversal import expand_out, expand_paths, gqp_filter
from cm_well_spark.parsers.expansion import (
    ExpandIn,
    ExpandUp,
    ExpansionParseError,
    parse_xg,
    parse_yg,
)
import pytest


# -- parser pins (reference doctests, Parsers.scala:396-425) ---------------


def test_xg_doctest_levels():
    fs = parse_xg("x>yyy>abc,xyz")
    assert len(fs) == 3
    assert [f.field for f in fs[2].fields] == ["abc", "xyz"]


def test_xg_digit_equals_underscores():
    assert parse_xg("2") == parse_xg("_>_")


def test_xg_digit_then_levels():
    fs = parse_xg("2>ofRegion")
    assert len(fs) == 3 and fs[2].fields[0].field == "ofRegion"


def test_xg_empty_is_one_joker():
    fs = parse_xg("")
    assert len(fs) == 1 and fs[0].fields[0].field is None


def test_xg_filter():
    fs = parse_xg("byCustomer[mktsegment::BUILDING]")
    assert fs[0].fields[0].qp is not None


def test_yg_segments():
    pe = parse_yg("<byCustomer>inNation")
    segs = pe.paths[0].segments
    assert isinstance(segs[0], ExpandUp) and isinstance(segs[1], ExpandIn)


def test_yg_alternation():
    pe = parse_yg(">a|<b")
    assert len(pe.paths) == 2


def test_yg_empty_rejected():
    with pytest.raises(ExpansionParseError):
        parse_yg("")


# -- xg execution ----------------------------------------------------------


def test_xg_one_level(infotons, spark, sf_dir):
    seeds = search(infotons, qp="rdfType::Nation", length=None)
    out = expand_out(infotons, seeds, "ofRegion")
    # 25 nations + their 5 regions
    assert out.count() == 30


def test_xg_two_levels_chained(infotons):
    seeds = search(infotons, qp="rdfType::Customer,custkey<11", length=None)
    out = expand_out(infotons, seeds, "inNation>ofRegion")
    kinds = {r["k"]: r["c"] for r in out.select(F.element_at(F.col("fields").getItem("rdfType"), 1)["value"].alias("k")).groupBy(F.col("k")).agg(F.count("*").alias("c")).collect()}
    assert kinds["Customer"] == 11  # custkeys 0..10
    assert kinds.get("Nation", 0) >= 1 and kinds.get("Region", 0) >= 1


def test_xg_joker_expands_all_refs(infotons):
    seeds = search(infotons, qp="rdfType::Lineitem,orderkey::1", length=None)
    out = expand_out(infotons, seeds, "_")
    types = {
        r["k"]
        for r in out.select(F.element_at(F.col("fields").getItem("rdfType"), 1)["value"].alias("k")).distinct().collect()
    }
    # lineitems point at orders, parts, suppliers
    assert {"Lineitem", "Order", "Part", "Supplier"} <= types


def test_xg_level_filter(infotons):
    seeds = search(infotons, qp="rdfType::Orders", length=None)
    seeds = search(infotons, qp="rdfType::Order,orderkey<100", length=None)
    out = expand_out(infotons, seeds, "byCustomer[mktsegment::BUILDING]")
    cust = out.where(F.element_at(F.col("fields").getItem("rdfType"), 1)["value"] == "Customer")
    segs = {r["s"] for r in cust.select(F.element_at(F.col("fields").getItem("mktsegment"), 1)["value"].alias("s")).collect()}
    assert segs <= {"BUILDING"}


def test_xg_ghost_skip(infotons):
    # events reference /users/* which are never written (ghosts): expansion
    # silently continues with zero added rows (J7)
    seeds = search(infotons, qp="rdfType::Event", length=None)
    n_seeds = seeds.count()
    out = expand_out(infotons, seeds, "byUser")
    assert out.count() == n_seeds


# -- yg execution ----------------------------------------------------------


def test_yg_reverse_then_forward(infotons, triples, spark, sf_dir):
    from cm_well_spark.sources import tables as tbl

    # nation 3 <- customers pointing at it
    seeds = search(infotons, qp="rdfType::Nation,nationkey::3", length=None)
    out = expand_paths(infotons, triples, seeds, "<inNation")
    raw_c = tbl.load_table(spark, sf_dir, "customer").where(F.col("c_nationkey") == 3).count()
    raw_s = tbl.load_table(spark, sf_dir, "supplier").where(F.col("s_nationkey") == 3).count()
    assert out.count() == 1 + raw_c + raw_s


def test_yg_reverse_field_restricted(infotons, triples, spark, sf_dir):
    from cm_well_spark.sources import tables as tbl

    seeds = search(infotons, qp="rdfType::Nation,nationkey::3", length=None)
    out = expand_paths(infotons, triples, seeds, "<inNation[rdfType::Customer]")
    raw_c = tbl.load_table(spark, sf_dir, "customer").where(F.col("c_nationkey") == 3).count()
    assert out.count() == 1 + raw_c


def test_yg_chain_keeps_whole_path(infotons, triples):
    seeds = search(infotons, qp="rdfType::Region,regionkey::1", length=None)
    out = expand_paths(infotons, triples, seeds, "<ofRegion<inNation[rdfType::Supplier]")
    types = {
        r["k"]
        for r in out.select(F.element_at(F.col("fields").getItem("rdfType"), 1)["value"].alias("k")).distinct().collect()
    }
    assert types == {"Region", "Nation", "Supplier"} or types == {"Region", "Nation"}


# -- gqp execution ---------------------------------------------------------


def test_gqp_filters_without_adding(infotons, triples, spark, sf_dir):
    from cm_well_spark.sources import tables as tbl

    orders = search(infotons, qp="rdfType::Order", length=None)
    kept = gqp_filter(infotons, triples, orders, ">byCustomer[mktsegment::BUILDING]")
    raw = tbl.load_table(spark, sf_dir, "orders")
    cust = tbl.load_table(spark, sf_dir, "customer").where(F.col("c_mktsegment") == "BUILDING")
    expected = raw.join(cust, raw.o_custkey == cust.c_custkey, "left_semi").count()
    assert kept.count() == expected
    # pure filter: no non-Order rows added
    types = {
        r["k"]
        for r in kept.select(F.element_at(F.col("fields").getItem("rdfType"), 1)["value"].alias("k")).distinct().collect()
    }
    assert types == {"Order"}


def test_gqp_two_hop(infotons, triples, spark, sf_dir):
    from cm_well_spark.sources import tables as tbl

    orders = search(infotons, qp="rdfType::Order", length=None)
    kept = gqp_filter(infotons, triples, orders, ">byCustomer>inNation[nationkey::3]")
    raw_o = tbl.load_table(spark, sf_dir, "orders")
    raw_c = tbl.load_table(spark, sf_dir, "customer").where(F.col("c_nationkey") == 3)
    expected = raw_o.join(raw_c, raw_o.o_custkey == raw_c.c_custkey, "left_semi").count()
    assert kept.count() == expected


def test_gqp_reverse_hop(infotons, triples, spark, sf_dir):
    from cm_well_spark.sources import tables as tbl

    # nations that have at least one supplier
    nations = search(infotons, qp="rdfType::Nation", length=None)
    kept = gqp_filter(infotons, triples, nations, "<inNation[rdfType::Supplier]")
    raw_s = tbl.load_table(spark, sf_dir, "supplier")
    expected = raw_s.select("s_nationkey").distinct().count()
    assert kept.count() == expected
