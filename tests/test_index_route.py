"""Index-accelerated search equals the doc-side plan on every qp shape."""

import pytest
from pyspark.sql import functions as F

from cm_well_spark.operators.search import search

QPS = [
    "rdfType::Customer,mktsegment::BUILDING",
    "rdfType::Customer,acctbal>5000",
    "rdfType::Customer,-mktsegment::BUILDING",
    "rdfType::Customer,[*mktsegment::BUILDING,*mktsegment::MACHINERY]",
    "[*rdfType::Nation,*rdfType::Region]",
    "acctbal:",
    "name:widget",
    "rdfType::Region,name~EVROPE",
    "system.quad::/graphs/src7",
    "rdfType::Lineitem,shipdate>>1995-01-01,shipdate<1996-01-01",
    "-noSuchField::x,rdfType::Region",
    "rdfType::Part,[*size>40,*brand::Brand#13]",
    "system.path::/tpch/region/0",
]


@pytest.mark.parametrize("qp", QPS)
def test_index_route_equals_doc_route(infotons, triples, qp):
    doc_side = {r["path"] for r in search(infotons, qp=qp, length=None).select("path").collect()}
    idx_side = {
        r["path"]
        for r in search(infotons, qp=qp, length=None, triples=triples).select("path").collect()
    }
    assert idx_side == doc_side, f"qp={qp!r}: index={len(idx_side)} doc={len(doc_side)}"


def test_index_route_sorted_page(infotons, triples):
    a = [r["path"] for r in search(infotons, qp="rdfType::Customer", sort_by="-acctbal", length=10).collect()]
    b = [
        r["path"]
        for r in search(infotons, qp="rdfType::Customer", sort_by="-acctbal", length=10, triples=triples).collect()
    ]
    assert a == b
